"""Unit tests: ann.mmr_rerank — greedy semantics on hand-built
candidate sets (the precomputed-oracle twin is swept by
test_entry_contract)."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import ann


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, "query_id: long, vec_id: long, cosine: double,"
        " embedding: array<float>"
    )


class TestMmrRerank:
    def test_demotes_near_duplicate_of_first_pick(self, spark):
        # vec 2 is relevance runner-up but identical to pick 1;
        # vec 3 is slightly less relevant but orthogonal
        rows = [
            (0, 1, 0.99, [1.0, 0.0]),
            (0, 2, 0.98, [1.0, 0.0]),
            (0, 3, 0.90, [0.0, 1.0]),
        ]
        out = sorted(
            ann.mmr_rerank(_cands(spark, rows), k=3).collect(),
            key=lambda r: r.sel_rank,
        )
        assert [r.vec_id for r in out] == [1, 3, 2]
        # first pick carries no diversity penalty
        assert out[0].mmr_micro == round(0.7 * 0.99 * 1_000_000)
        # vec 2's second-round score pays the full 0.3 * cos(=1.0)
        assert out[2].mmr_micro <= round(
            (0.7 * 0.98 - 0.3 * 1.0) * 1_000_000
        )

    def test_lambda_100_is_pure_relevance(self, spark):
        rows = [
            (0, 1, 0.99, [1.0, 0.0]),
            (0, 2, 0.98, [1.0, 0.0]),
            (0, 3, 0.90, [0.0, 1.0]),
        ]
        out = sorted(
            ann.mmr_rerank(_cands(spark, rows), k=3, lambda_pct=100).collect(),
            key=lambda r: r.sel_rank,
        )
        assert [r.vec_id for r in out] == [1, 2, 3]

    def test_short_group_and_multiple_queries(self, spark):
        rows = [
            (0, 1, 0.9, [1.0, 0.0]),
            (1, 2, 0.8, [1.0, 0.0]),
            (1, 3, 0.7, [0.0, 1.0]),
        ]
        out = ann.mmr_rerank(_cands(spark, rows), k=5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        assert len(by_q[0]) == 1 and len(by_q[1]) == 2

    def test_tie_breaks_by_vec_id(self, spark):
        rows = [
            (0, 7, 0.5, [1.0, 0.0]),
            (0, 4, 0.5, [0.0, 1.0]),
        ]
        out = sorted(
            ann.mmr_rerank(_cands(spark, rows), k=2).collect(),
            key=lambda r: r.sel_rank,
        )
        assert [r.vec_id for r in out] == [4, 7]

    def test_validates_params(self, spark):
        df = _cands(spark, [(0, 1, 0.5, [1.0])])
        with pytest.raises(ValueError, match="k >= 1"):
            ann.mmr_rerank(df, k=0)
        with pytest.raises(ValueError, match="lambda_pct"):
            ann.mmr_rerank(df, lambda_pct=101)
