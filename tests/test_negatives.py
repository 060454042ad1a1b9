"""Negative sampling for KG-embedding training (operators/negatives.py)."""

import hashlib

import pytest

from context_aware_rag_spark.operators import negatives

TRIPLES = [
    ("alice", "knows", "bob"),
    ("bob", "knows", "carol"),
    ("carol", "works_at", "acme"),
    ("dave", "works_at", "acme"),
    ("alice", "works_at", "globex"),
]


def _df(spark, rows=TRIPLES, parts=None):
    df = spark.createDataFrame(rows, "src: string, rel: string, dst: string")
    return df.repartition(parts) if parts else df


def _expected(rows, k=2, sides=("src", "dst")):
    tri = sorted(set(rows))
    vocab = sorted({s for s, _, _ in tri} | {d for _, _, d in tri})
    n = len(vocab)
    true = set(tri)
    out = set()
    for s, r, d in tri:
        for side in sides:
            for j in range(k):
                key = "\x1f".join([side, s, r, d, str(j)])
                h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                neg = vocab[h % n]
                if side == "src":
                    if neg == s or (neg, r, d) in true:
                        continue
                else:
                    if neg == d or (s, r, neg) in true:
                        continue
                out.add((s, r, d, side, j, neg))
    return out


def test_matches_python_replication(spark):
    got = {
        (r.src, r.rel, r.dst, r.side, r.sample_idx, r.neg_entity)
        for r in negatives.negative_samples(_df(spark), k=3).collect()
    }
    assert got == _expected(TRIPLES, k=3)
    assert got  # non-degenerate fixture actually yields samples


def test_partitioning_invariance(spark):
    a = set(
        map(tuple, negatives.negative_samples(_df(spark, parts=1)).collect())
    )
    b = set(
        map(tuple, negatives.negative_samples(_df(spark, parts=7)).collect())
    )
    assert a == b


def test_filtered_protocol_complete_graph(spark):
    # complete single-relation digraph over 3 entities (incl. loops):
    # EVERY corruption is either degenerate or a true triple, so the
    # filtered protocol yields nothing
    ents = ["x", "y", "z"]
    rows = [(a, "r", b) for a in ents for b in ents]
    assert negatives.negative_samples(_df(spark, rows), k=4).count() == 0


def test_single_side(spark):
    got = negatives.negative_samples(_df(spark), k=2, sides=("dst",))
    rows = got.collect()
    assert rows and all(r.side == "dst" for r in rows)
    want = _expected(TRIPLES, k=2, sides=("dst",))
    assert {(r.src, r.rel, r.dst, r.side, r.sample_idx, r.neg_entity)
            for r in rows} == want


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        negatives.negative_samples(df, k=0)
    with pytest.raises(ValueError):
        negatives.negative_samples(df, sides=("head",))
    with pytest.raises(ValueError):
        negatives.negative_samples(df, sides=())


# ---------------------------------------------------------------------------
# mine_hard_negatives (BM25 hard negatives, DPR recipe)
# ---------------------------------------------------------------------------

class TestMineHardNegatives:
    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [(0, "apple banana cherry"),
             (1, "apple banana date"),
             (2, "apple banana cherry date"),
             (3, "unrelated words here"),
             (4, "banana cherry")],
            "doc_id: long, text: string",
        )
        queries = spark.createDataFrame(
            [(0, "apple banana cherry")], "query_id: long, query_text: string"
        )
        return docs, queries

    def test_gold_excluded_and_ranks_renumber(self, spark):
        from context_aware_rag_spark.operators.bm25 import bm25_topk
        from context_aware_rag_spark.operators.negatives import (
            mine_hard_negatives,
        )

        docs, queries = self._fixture(spark)
        gold = spark.createDataFrame([(0, 0)], "query_id: long, doc_id: long")
        negs = mine_hard_negatives(docs, queries, gold, k_neg=3).collect()
        got = [(r.doc_id, r.neg_rank) for r in sorted(negs, key=lambda r: r.neg_rank)]
        # equivalently: the full BM25 ranking with doc 0 removed,
        # ranks renumbered from 1
        full = bm25_topk(docs, queries, k=10).collect()
        expect = [r.doc_id for r in sorted(full, key=lambda r: r.rank)
                  if r.doc_id != 0][:3]
        assert [d for d, _ in got] == expect
        assert [rk for _, rk in got] == [1, 2, 3]
        # the gold doc never appears even though it scores highest
        assert 0 not in {d for d, _ in got}

    def test_multiple_gold_and_validation(self, spark):
        import pytest as _pytest

        from context_aware_rag_spark.operators.negatives import (
            mine_hard_negatives,
        )

        docs, queries = self._fixture(spark)
        gold = spark.createDataFrame(
            [(0, 0), (0, 2), (0, 2)], "query_id: long, doc_id: long"
        )
        negs = {r.doc_id for r in
                mine_hard_negatives(docs, queries, gold, k_neg=10).collect()}
        assert negs and not ({0, 2} & negs)
        with _pytest.raises(ValueError):
            mine_hard_negatives(docs, queries, gold, k_neg=0)
