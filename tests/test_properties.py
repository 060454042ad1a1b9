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


# ---------------------------------------------------------------------------
# round 2: json repair + global index properties
# ---------------------------------------------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.text(max_size=40),
)
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=10), children, max_size=5),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(_json_values)
def test_repair_json_valid_roundtrip(obj):
    """Lenient parse of VALID json must be exactly json.loads."""
    import json as _json

    from context_aware_rag_spark.functions.jsonrepair import repair_json

    s = _json.dumps(obj)
    assert repair_json(s) == obj


@settings(max_examples=100, deadline=None)
@given(_json_values)
def test_repair_json_fenced_roundtrip(obj):
    import json as _json

    from context_aware_rag_spark.functions.jsonrepair import repair_json

    s = "prefix prose\n```json\n" + _json.dumps(obj) + "\n```\ntrailing"
    got = repair_json(s)
    if isinstance(obj, (dict, list)):  # scalar payloads have no {/[ anchor
        assert got == obj


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1, max_size=300, unique_by=lambda t: t[1],
    ),
    st.integers(1, 7),
)
def test_global_index_property(spark, rows, partitions):
    """global_index == row_number() OVER (ORDER BY ts, event_id) for any
    input and any partition count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from context_aware_rag_spark.operators.skew import global_index

    df = spark.createDataFrame(rows, ["ts", "event_id"]).repartition(3)
    w = Window.orderBy("ts", "event_id")
    want = {
        (r["event_id"], r["doc_index"])
        for r in df.select(
            "event_id", F.row_number().over(w).cast("long").alias("doc_index")
        ).collect()
    }
    got = {
        (r["event_id"], r["doc_index"])
        for r in global_index(df, ["ts", "event_id"], partitions=partitions)
        .select("event_id", "doc_index")
        .collect()
    }
    assert got == want
