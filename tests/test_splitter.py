"""Splitter unit tests: determinism, size bounds, coverage invariants."""

import numpy as np
import pytest

from context_aware_rag_spark.functions.splitter import split_text
from context_aware_rag_spark.sources.transcripts import turn_text


def coverage_check(text: str, chunks: list[str]) -> None:
    """Every chunk is a substring; chunks appear in order, contiguous or
    overlapping up to whitespace dropped at boundaries (strip_whitespace
    semantics); the last chunk reaches the end modulo whitespace."""
    search_from = 0
    last_end = 0
    for c in chunks:
        idx = text.find(c, search_from)
        if idx < 0:
            # overlap means a chunk can start BEFORE the previous search
            # frontier; retry from the last chunk's start
            idx = text.find(c)
        assert idx >= 0, f"chunk not a substring: {c[:50]!r}"
        # gap between previous chunk end and this chunk start must be whitespace
        if idx > last_end:
            assert text[last_end:idx].strip() == "", (
                f"non-whitespace gap {text[last_end:idx]!r}"
            )
        last_end = max(last_end, idx + len(c))
        search_from = idx + 1
    assert text[last_end:].strip() == "", "tail not covered"


def test_short_text_single_chunk():
    assert split_text("Alice met Bob.") == ["Alice met Bob."]


def test_empty_and_whitespace():
    assert split_text("") == []
    assert split_text("\n\n\n") == []


def test_oversize_line_stays_whole():
    # no newline separators to recurse into -> oversize chunk kept whole
    s = "x" * 1200
    assert split_text(s) == [s]


def test_newline_split_and_overlap():
    lines = [f"Line {i} with some padding text here." for i in range(40)]
    text = "\n".join(lines)
    chunks = split_text(text, chunk_size=120, chunk_overlap=30)
    assert all(len(c) <= 120 for c in chunks)
    assert len(chunks) > 5
    coverage_check(text, chunks)


def test_paragraph_then_line_recursion():
    paras = ["\n".join(f"p{p} line {i} lorem ipsum dolor" for i in range(30))
             for p in range(3)]
    text = "\n\n".join(paras)
    chunks = split_text(text, chunk_size=200, chunk_overlap=10)
    assert all(len(c) <= 200 for c in chunks)
    coverage_check(text, chunks)


def test_determinism():
    text = "\n".join(f"line {i}" * (i % 7 + 1) for i in range(100))
    assert split_text(text) == split_text(text)


@pytest.mark.parametrize("conv,turn", [(0, 0), (3, 5), (7, 100), (11, 2)])
def test_generated_turns_cover(conv, turn):
    text = turn_text(conv, turn)
    if text == ".":
        return
    chunks = split_text(text)
    coverage_check(text, chunks)
    if len(text) < 500 and "\n" not in text:
        assert chunks == [text.strip()]
