"""RRF fusion: hand-computed contributions, missing-doc convention,
weights, validation."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import fusion


def _leg(spark, rows):
    return spark.createDataFrame(rows, "query_id: long, doc_id: long, rank: int")


class TestRrfFuse:
    def test_hand_computed_two_legs(self, spark):
        a = _leg(spark, [(1, 10, 1), (1, 11, 2)])
        b = _leg(spark, [(1, 11, 1), (1, 12, 2)])
        out = {
            r["doc_id"]: (r["rrf_micro"], r["n_legs"], r["rank"])
            for r in fusion.rrf_fuse([a, b], rrf_k=60).collect()
        }
        c = lambda r: round(1000000.0 / (60 + r))
        # doc 11 appears in both legs -> wins
        assert out[11] == (c(2) + c(1), 2, 1)
        assert out[10] == (c(1), 1, 2)
        assert out[12] == (c(2), 1, 3)

    def test_tiebreak_ascending_id(self, spark):
        a = _leg(spark, [(1, 20, 1)])
        b = _leg(spark, [(1, 5, 1)])
        rows = fusion.rrf_fuse([a, b]).orderBy("rank").collect()
        assert [r["doc_id"] for r in rows] == [5, 20]

    def test_weights_scale_contributions(self, spark):
        a = _leg(spark, [(1, 10, 1)])
        b = _leg(spark, [(1, 11, 1)])
        out = {
            r["doc_id"]: r["rrf_micro"]
            for r in fusion.rrf_fuse([a, b], weights=[2.0, 1.0]).collect()
        }
        assert out[10] == round(2000000.0 / 61)
        assert out[11] == round(1000000.0 / 61)

    def test_topk_truncates(self, spark):
        a = _leg(spark, [(1, d, d) for d in range(1, 30)])
        assert fusion.rrf_fuse([a], topk=7).count() == 7

    def test_validation(self, spark):
        a = _leg(spark, [(1, 10, 1)])
        with pytest.raises(ValueError, match="at least one"):
            fusion.rrf_fuse([])
        with pytest.raises(ValueError, match="weights"):
            fusion.rrf_fuse([a], weights=[1.0, 2.0])

    def test_per_query_isolation(self, spark):
        a = _leg(spark, [(1, 10, 1), (2, 10, 3)])
        out = {
            (r["query_id"], r["doc_id"]): r["rrf_micro"]
            for r in fusion.rrf_fuse([a]).collect()
        }
        assert out[(1, 10)] == round(1000000.0 / 61)
        assert out[(2, 10)] == round(1000000.0 / 63)
