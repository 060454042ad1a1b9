"""Property-based tests (hypothesis) for the pure shared functions —
the splitter and hashing rules gate triple parity, so they get the
widest input coverage.
"""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from context_aware_rag_spark.functions import hashing
from context_aware_rag_spark.functions.extractor import rule_based_extract
from context_aware_rag_spark.functions.splitter import split_text

# runs of "\n" arise naturally, giving both "\n" and "\n\n" separators
text_strategy = st.text(
    alphabet=list("abcdefgh XYZ.!?,:;'\"()[]\n\t"),
    min_size=0,
    max_size=2000,
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_splitter_chunks_are_substrings(text):
    for chunk in split_text(text):
        assert chunk in text or chunk in text.strip()


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_splitter_respects_size_when_splittable(text):
    chunks = split_text(text, chunk_size=100, chunk_overlap=10)
    for c in chunks:
        # a chunk may exceed the budget only if it contains no separator
        # to recurse into (langchain keeps unsplittable runs whole)
        assert len(c) <= 100 or "\n" not in c


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_splitter_deterministic_and_loses_no_content(text):
    a = split_text(text)
    b = split_text(text)
    assert a == b
    # no chunk is empty, and total stripped content is preserved in order
    assert all(c for c in a)
    remaining = text
    for c in a:
        idx = remaining.find(c)
        assert idx >= 0, "chunks must appear in order without reordering"
        # allow overlap: advance at least one char per chunk
        remaining = remaining[max(idx, 1) :] if len(a) > 1 else remaining


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=300), st.text(min_size=1, max_size=40))
def test_chunk_id_matches_reference_formula(text, conv):
    assert hashing.chunk_id_py(text, conv) == hashlib.sha1(
        (text + conv).encode()
    ).hexdigest()


@settings(max_examples=100, deadline=None)
@given(
    st.text(min_size=1, max_size=60),
    st.sampled_from(["Person", "Vehicle", "", "`Person`", "Entity"]),
    st.text(min_size=1, max_size=30),
)
def test_entity_id_type_fallback(surface, typ, conv):
    got = hashing.entity_id_py(surface, typ, conv)
    expected_type = typ if typ else "Entity"
    assert got == hashlib.sha1(
        f"_{expected_type}_{surface}_{conv}".encode()
    ).hexdigest()


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_extractor_total_and_deterministic(text):
    out1 = rule_based_extract(text)
    out2 = rule_based_extract(text)
    assert out1 == out2
    for t in out1:
        assert t.relation == t.relation.upper()
