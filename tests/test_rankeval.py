"""Ranked-retrieval evaluation (trec_eval battery): hand-computed
fixtures, rank-contract guards, summary semantics."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from context_aware_rag_spark.operators import rankeval


def _run(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id string, rank int"
    )


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id string")


class TestHandComputed:
    def test_mixed_query_battery(self, spark):
        # q1: rel {a,c,e}, run [a,b,c,d] -> hits@3=2 (a@1, c@3)
        # q2: unjudged -> NULL metrics
        # q3: judged, never retrieved -> honest zeros
        run = _run(spark, [
            ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q1", "d", 4),
            ("q2", "x", 1), ("q2", "y", 2),
        ])
        qrels = _qrels(
            spark, [("q1", "a"), ("q1", "c"), ("q1", "e"), ("q3", "z")]
        )
        got = {
            r["query_id"]: tuple(r)[1:]
            for r in rankeval.ranking_metrics(run, qrels, k=3).collect()
        }
        # ap = (trunc(1e6*1/1) + trunc(1e6*2/3)) div 3 = 1666666 // 3
        assert got["q1"] == (3, 4, 2, 666666, 666666, 1_000_000, 555555)
        assert got["q2"] == (0, 2, None, None, None, None, None)
        assert got["q3"] == (1, 0, 0, 0, 0, 0, 0)

    def test_perfect_ranking_scores_unity(self, spark):
        run = _run(spark, [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)])
        qrels = _qrels(spark, [("q", "a"), ("q", "b"), ("q", "c")])
        row = rankeval.ranking_metrics(run, qrels, k=3).collect()[0]
        assert row["ap_ppm"] == 1_000_000
        assert row["p_at_k_ppm"] == 1_000_000
        assert row["r_at_k_ppm"] == 1_000_000
        assert row["rr_ppm"] == 1_000_000

    def test_cutoff_excludes_deep_hits(self, spark):
        # relevant doc at rank 5 with k=3: not a hit, rr=0, but still
        # scorable (zeros, not NULL)
        run = _run(spark, [
            ("q", "a", 1), ("q", "b", 2), ("q", "c", 3),
            ("q", "d", 4), ("q", "e", 5),
        ])
        qrels = _qrels(spark, [("q", "e")])
        row = rankeval.ranking_metrics(run, qrels, k=3).collect()[0]
        assert (row["hits_at_k"], row["rr_ppm"], row["ap_ppm"]) == (0, 0, 0)

    def test_duplicate_qrels_collapse(self, spark):
        run = _run(spark, [("q", "a", 1)])
        qrels = _qrels(spark, [("q", "a"), ("q", "a")])
        row = rankeval.ranking_metrics(run, qrels, k=1).collect()[0]
        assert row["n_rel"] == 1
        assert row["r_at_k_ppm"] == 1_000_000


class TestRankContract:
    def test_gapped_rank_raises(self, spark):
        run = _run(spark, [("q", "a", 1), ("q", "b", 3)])
        qrels = _qrels(spark, [("q", "a")])
        with pytest.raises(Exception, match="gap-free"):
            rankeval.ranking_metrics(run, qrels, k=2).collect()

    def test_duplicate_rank_raises(self, spark):
        run = _run(spark, [("q", "a", 1), ("q", "b", 1)])
        qrels = _qrels(spark, [("q", "a")])
        with pytest.raises(Exception, match="gap-free"):
            rankeval.ranking_metrics(run, qrels, k=2).collect()

    def test_zero_based_rank_raises(self, spark):
        run = _run(spark, [("q", "a", 0), ("q", "b", 1)])
        qrels = _qrels(spark, [("q", "a")])
        with pytest.raises(Exception, match="gap-free"):
            rankeval.ranking_metrics(run, qrels, k=2).collect()

    def test_k_validation(self, spark):
        run = _run(spark, [("q", "a", 1)])
        with pytest.raises(ValueError, match="k >= 1"):
            rankeval.ranking_metrics(run, _qrels(spark, [("q", "a")]), k=0)


class TestSummary:
    def test_means_exclude_unscorable(self, spark):
        run = _run(spark, [
            ("q1", "a", 1),          # judged, hit at 1
            ("q2", "x", 1),          # unjudged -> excluded entirely
        ])
        qrels = _qrels(spark, [("q1", "a"), ("q3", "z")])
        m = rankeval.ranking_metrics(run, qrels, k=1)
        s = rankeval.ranking_summary(m).collect()[0]
        # scorable = q1 (perfect) and q3 (all-zero); q2 excluded
        assert s["n_queries"] == 2
        assert s["map_ppm"] == 500_000
        assert s["mrr_ppm"] == 500_000

    def test_empty_scorable_set_is_null(self, spark):
        run = _run(spark, [("q2", "x", 1)])
        # zero qrels at all: no scorable queries
        m = rankeval.ranking_metrics(
            run,
            spark.createDataFrame([], "query_id string, doc_id string"),
            k=1,
        )
        s = rankeval.ranking_summary(m).collect()[0]
        assert s["n_queries"] == 0
        assert s["map_ppm"] is None


def _grun(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id string, rank int"
    )


def _gqrels(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id string, gain int"
    )


class TestNdcg:
    def test_discount_table(self):
        assert rankeval.discount_micro(1) == 1_000_000
        # 1e6 / log2(3) = 630929.75... -> trunc
        assert rankeval.discount_micro(2) == 630929
        assert rankeval.discount_micro(3) == 500_000
        with pytest.raises(ValueError):
            rankeval.discount_micro(0)

    def test_hand_computed(self, spark):
        # q: gains a=3, b=1, c=2 (judged), run ranks [b, a, d, c]
        # w = [1000000, 630929, 500000, 430676]
        # dcg  = 1*w1 + 3*w2 + 0 + 2*w4
        # idcg = 3*w1 + 2*w2 + 1*w3
        run = _grun(spark, [
            ("q", "b", 1), ("q", "a", 2), ("q", "d", 3), ("q", "c", 4),
        ])
        qrels = _gqrels(spark, [("q", "a", 3), ("q", "b", 1), ("q", "c", 2)])
        w = [rankeval.discount_micro(i) for i in range(1, 5)]
        dcg = 1 * w[0] + 3 * w[1] + 2 * w[3]
        idcg = 3 * w[0] + 2 * w[1] + 1 * w[2]
        row = rankeval.ndcg_metrics(run, qrels, k=4).collect()[0]
        assert row["dcg_micro"] == dcg
        assert row["idcg_micro"] == idcg
        assert row["ndcg_ppm"] == (dcg * 1_000_000) // idcg
        assert row["n_judged"] == 3

    def test_ideal_ranking_scores_unity(self, spark):
        run = _grun(spark, [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)])
        qrels = _gqrels(spark, [("q", "a", 5), ("q", "b", 3), ("q", "c", 1)])
        row = rankeval.ndcg_metrics(run, qrels, k=3).collect()[0]
        assert row["ndcg_ppm"] == 1_000_000

    def test_cutoff_excludes_late_gains(self, spark):
        # the only relevant doc sits at rank 3 > k=2 -> dcg 0, ndcg 0
        run = _grun(spark, [("q", "x", 1), ("q", "y", 2), ("q", "a", 3)])
        qrels = _gqrels(spark, [("q", "a", 2)])
        row = rankeval.ndcg_metrics(run, qrels, k=2).collect()[0]
        assert row["dcg_micro"] == 0
        assert row["ndcg_ppm"] == 0

    def test_null_vs_zero_semantics(self, spark):
        # qz: judged but all gain 0 -> IDCG 0 -> unscorable NULL
        # qu: run-only, unjudged -> NULL
        # qn: judged positively, no run rows -> honest zero
        run = _grun(spark, [
            ("qz", "a", 1), ("qu", "x", 1),
        ])
        qrels = _gqrels(
            spark, [("qz", "a", 0), ("qn", "b", 2)]
        )
        got = {
            r["query_id"]: (r["dcg_micro"], r["ndcg_ppm"])
            for r in rankeval.ndcg_metrics(run, qrels, k=2).collect()
        }
        assert got["qz"] == (0, None)
        assert got["qu"] == (None, None)
        assert got["qn"] == (0, 0)

    def test_duplicate_judgment_takes_max_gain(self, spark):
        run = _grun(spark, [("q", "a", 1), ("q", "b", 2)])
        qrels = _gqrels(
            spark, [("q", "a", 1), ("q", "a", 3), ("q", "b", 2)]
        )
        row = rankeval.ndcg_metrics(run, qrels, k=2).collect()[0]
        w = [rankeval.discount_micro(i) for i in range(1, 3)]
        assert row["n_judged"] == 2
        assert row["dcg_micro"] == 3 * w[0] + 2 * w[1]
        assert row["ndcg_ppm"] == 1_000_000

    def test_negative_gain_raises(self, spark):
        run = _grun(spark, [("q", "a", 1)])
        qrels = _gqrels(spark, [("q", "a", -1)])
        with pytest.raises(Exception, match="non-negative"):
            rankeval.ndcg_metrics(run, qrels, k=2).collect()

    def test_gapped_rank_raises(self, spark):
        run = _grun(spark, [("q", "a", 1), ("q", "b", 3)])
        qrels = _gqrels(spark, [("q", "a", 1)])
        with pytest.raises(Exception, match="gap-free"):
            rankeval.ndcg_metrics(run, qrels, k=2).collect()

    def test_bad_k_raises(self, spark):
        run = _grun(spark, [("q", "a", 1)])
        qrels = _gqrels(spark, [("q", "a", 1)])
        with pytest.raises(ValueError):
            rankeval.ndcg_metrics(run, qrels, k=0)
        with pytest.raises(ValueError):
            rankeval.ndcg_metrics(run, qrels, k=1001)
