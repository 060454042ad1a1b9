"""DSIR importance-resampling data selection (operators/dsir.py)."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import dsir
from context_aware_rag_spark.oracle import precompute


TEXTS = [
    "the cat sat on the mat near the door",
    "a dog ran across the wide green field today",
    "stock market prices rose sharply after the report",
    "the cat chased the dog around the mat",
    "quarterly earnings beat the market consensus estimate again",
    "cats and dogs are common household pets everywhere",
    "bond yields fell as the market digested the news",
    "",
]


def _df(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).withColumn("doc_id", F.col("doc_id").cast("long"))


def test_weights_match_python(spark):
    """dsir_weights == the pure-Python oracle arithmetic, doc for doc."""
    docs = _df(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    got = {
        r.doc_id: (r.n_grams, r.logw_micro)
        for r in dsir.dsir_weights(docs, target, n_buckets=256).collect()
    }
    py = precompute.dsir_select_py(
        list(enumerate(TEXTS)),
        [t for i, t in enumerate(TEXTS) if i % 2 == 0],
        k=len(TEXTS),
        n_buckets=256,
    )
    want = {doc_id: (ng, logw) for doc_id, ng, logw, _, _, _ in py}
    assert got == want


def test_select_matches_python_including_gumbel(spark):
    docs = _df(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    got = [
        (r.doc_id, r.n_grams, r.logw_micro, r.gumbel_micro, r.key_micro, r.rank)
        for r in dsir.dsir_select(docs, target, k=4, n_buckets=256)
        .orderBy("rank")
        .collect()
    ]
    want = precompute.dsir_select_py(
        list(enumerate(TEXTS)),
        [t for i, t in enumerate(TEXTS) if i % 2 == 0],
        k=4,
        n_buckets=256,
    )
    assert got == want


def test_target_like_docs_outweigh(spark):
    """Docs sharing the target's vocabulary carry higher logw than docs
    from a disjoint vocabulary (noise-free check: weights only)."""
    finance = [t for t in TEXTS if "market" in t]
    docs = _df(spark, TEXTS[:7])
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(finance)], ["doc_id", "text"]
    )
    w = {r.doc_id: r.logw_micro for r in dsir.dsir_weights(docs, target).collect()}
    finance_ids = {i for i, t in enumerate(TEXTS[:7]) if "market" in t}
    cat_ids = {i for i, t in enumerate(TEXTS[:7]) if "cat" in t}
    assert min(w[i] for i in finance_ids) > max(w[i] for i in cat_ids)


def test_select_temperature_matches_python(spark):
    # temperature=2.0 structurally produces exact .5 halves in
    # logw_micro/temperature: HALF_EVEN on both engines (F.bround /
    # Python round) or the selection sets drift apart
    docs = _df(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    got = [
        tuple(r)
        for r in dsir.dsir_select(
            docs, target, k=4, n_buckets=256, temperature=2.0
        ).orderBy("rank").collect()
    ]
    want = precompute.dsir_select_py(
        list(enumerate(TEXTS)),
        [t for i, t in enumerate(TEXTS) if i % 2 == 0],
        k=4,
        n_buckets=256,
        temperature=2.0,
    )
    assert got == want


def test_deterministic_across_runs(spark):
    docs = _df(spark)
    target = docs.filter(F.col("doc_id") % 3 == 0)
    a = dsir.dsir_select(docs, target, k=5, n_buckets=128).collect()
    b = dsir.dsir_select(docs, target, k=5, n_buckets=128).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_plan_jvm_only_and_broadcast_ratio(spark):
    docs = _df(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    plan = (
        dsir.dsir_weights(docs, target, n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_validation(spark):
    docs = _df(spark)
    with pytest.raises(ValueError):
        dsir.dsir_weights(docs, docs, n_buckets=1)
    with pytest.raises(ValueError):
        dsir.dsir_weights(docs, docs, alpha=0.0)
    with pytest.raises(ValueError):
        dsir.dsir_select(docs, docs, k=0)
    with pytest.raises(ValueError):
        dsir.dsir_select(docs, docs, k=1, temperature=0.0)
