"""ANN: brute-force exactness and IVF recall against it."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import ann


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _corpus_queries(emb):
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return corpus, queries


def test_bruteforce_self_query_rank1(spark, emb):
    from context_aware_rag_spark.operators.ann import cosine_topk_bruteforce

    corpus, _ = _corpus_queries(emb)
    q = corpus.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qid = q.collect()[0]["query_id"]
    top = cosine_topk_bruteforce(corpus, q, k=3).filter(F.col("rank") == 1).collect()
    assert top[0]["vec_id"] == qid
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-5)


def test_ivf_recall_vs_bruteforce(spark, emb):
    from context_aware_rag_spark.operators.ann import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    corpus, queries = _corpus_queries(emb)
    exact = cosine_topk_bruteforce(corpus, queries, k=10).collect()
    approx = cosine_topk_ivf(
        corpus, queries, k=10, n_clusters=16, nprobe=8
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # random 64-dim vectors are a worst case for IVF (no cluster
    # structure); nprobe=8/16 cells must still recover most of top-10
    assert mean_recall >= 0.5, recalls


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe == n_clusters probes every cell, so IVF must reproduce the
    exact brute-force result row-for-row — pins partitioning, scoring,
    and ranking correctness independent of centroid quality."""
    from context_aware_rag_spark.operators.ann import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    corpus, queries = _corpus_queries(emb)
    exact = {
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in cosine_topk_bruteforce(corpus, queries, k=10).collect()
    }
    full = {
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in cosine_topk_ivf(
            corpus, queries, k=10, n_clusters=8, nprobe=8
        ).collect()
    }
    assert full == exact


def test_ivf_deterministic_across_runs(spark, emb):
    from context_aware_rag_spark.operators.ann import cosine_topk_ivf

    corpus, queries = _corpus_queries(emb)
    a = sorted(
        tuple(r)
        for r in cosine_topk_ivf(corpus, queries, k=5, n_clusters=16, nprobe=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in cosine_topk_ivf(
            corpus.repartition(13), queries, k=5, n_clusters=16, nprobe=4
        ).collect()
    )
    assert a == b


class TestIVFPQ:
    @pytest.fixture(scope="class")
    def planted(self, spark):
        """8 well-separated clusters; queries sit near cluster centers."""
        rng = np.random.default_rng(11)
        dim, per = 32, 40
        centers = rng.normal(size=(8, dim)) * 4.0
        rows, queries = [], []
        vid = 100
        for c in range(8):
            for _ in range(per):
                v = centers[c] + rng.normal(size=dim) * 0.2
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        for c in range(5):
            v = centers[c] + rng.normal(size=dim) * 0.05
            queries.append((c, [float(x) for x in v]))
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        qdf = spark.createDataFrame(queries, "query_id long, embedding array<float>")
        return corpus, qdf

    def test_cluster_purity_on_planted_geometry(self, spark, planted):
        """PQ quantizes away WITHIN-cluster perturbations by design, so
        exact top-10 overlap is the wrong bar on a 40-member cluster of
        near-identical points; the scale-relevant guarantee is that the
        coarse probe + ADC ranking returns the query's TRUE cluster."""
        corpus, qdf = planted
        got = ann.cosine_topk_ivfpq(
            corpus, qdf, k=10, n_clusters=8, nprobe=2, m_sub=8, n_codes=32
        ).collect()
        assert len(got) == 50  # 5 queries x k=10
        # planted layout: cluster c owns ids [100+40c, 100+40(c+1))
        purity = sum(
            1 for r in got if (r.vec_id - 100) // 40 == r.query_id
        ) / len(got)
        assert purity >= 0.9, purity

    def test_matches_pure_python_replication(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        corpus = emb.filter(F.col("vec_id") >= 5)
        qdf = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = sorted(
            (r.query_id, r.vec_id, r.approx_score, r.rank)
            for r in ann.cosine_topk_ivfpq(
                corpus, qdf, k=10, n_clusters=8, nprobe=3, m_sub=8, n_codes=16
            ).collect()
        )
        from context_aware_rag_spark.oracle.precompute import ivfpq_topk_py

        vecs = sorted(
            (r.vec_id, list(r.embedding)) for r in emb.collect()
        )
        want = sorted(
            ivfpq_topk_py(vecs, k=10, n_clusters=8, nprobe=3, m_sub=8, n_codes=16)
        )
        assert got == want

    def test_rejects_indivisible_subvectors(self, spark, planted):
        corpus, qdf = planted
        with pytest.raises(ValueError):
            ann.cosine_topk_ivfpq(corpus, qdf, m_sub=5).collect()


def test_ivfpq_accepts_string_query_ids(spark):
    """The probe frame inherits the caller's query-id type — string
    ids must work end-to-end (regression: schema was hardcoded long)."""
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=32)]) for i in range(80)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(
        [("q-one", rows[0][1]), ("q-two", rows[5][1])],
        "query_id string, embedding array<float>",
    )
    got = ann.cosine_topk_ivfpq(
        corpus, qdf, k=3, n_clusters=4, nprobe=4, m_sub=8, n_codes=16
    ).collect()
    assert {r.query_id for r in got} == {"q-one", "q-two"}
    assert all(isinstance(r.query_id, str) for r in got)
