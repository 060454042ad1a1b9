"""ANN: brute-force exactness and IVF recall against it."""

import pytest
from pyspark.sql import functions as F


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
