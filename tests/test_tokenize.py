"""Tokenize-and-pack (operators/tokenize.py)."""

import pytest

from context_aware_rag_spark.functions.bpe import bpe_encode, bpe_token_count
from context_aware_rag_spark.operators import tokenize
from context_aware_rag_spark.oracle.precompute import tokenize_and_pack_py

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, ""),                                   # zero tokens
    (2, "alpha beta gamma delta " * 20),       # spans several examples
    (3, "short"),
    (4, "numbers 123 and punctuation, too! 456?"),
]


def _run(spark, docs, L):
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    return sorted(
        (r.example_id, r.n_tokens, r.tokens_csv)
        for r in tokenize.tokenize_and_pack(df, max_tokens=L).collect()
    )


def test_encode_consistent_with_count():
    for _, text in DOCS:
        assert len(bpe_encode(text)) == bpe_token_count(text)


@pytest.mark.parametrize("L", [7, 64])
def test_matches_python(spark, L):
    assert _run(spark, DOCS, L) == tokenize_and_pack_py(DOCS, L)


def test_exact_shapes_and_stream_identity(spark):
    L = 16
    got = _run(spark, DOCS, L)
    # every example except the final partial is exactly L tokens
    assert all(n == L for _, n, _ in got[:-1])
    assert 1 <= got[-1][1] <= L
    # reassembled stream == the docs' concatenated encodings in id order
    stream = [t for _, n, csv in got for t in map(int, csv.split(","))]
    want = [t for _, text in sorted(DOCS) for t in bpe_encode(text)]
    assert stream == want


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    a = sorted(
        map(tuple, tokenize.tokenize_and_pack(df.repartition(1), 9).collect())
    )
    b = sorted(
        map(tuple, tokenize.tokenize_and_pack(df.repartition(5), 9).collect())
    )
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    with pytest.raises(ValueError):
        tokenize.tokenize_and_pack(df, max_tokens=0)
