"""Learned quality classifier (textmetrics.quality_classifier)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import textmetrics
from context_aware_rag_spark.oracle import precompute

SF_DIR = "/root/testdata/sf0.001"


def _scramble(text: str, seed: int) -> str:
    """Same corruption family the trainer used (word-salad resample +
    letter-scramble every third token)."""
    rng = random.Random(seed)
    words = text.split() or ["x"]
    out = []
    for i in range(len(words)):
        w = rng.choice(words)
        if i % 3 == 0 and len(w) > 2:
            w = "".join(rng.sample(list(w), len(w)))
        out.append(w)
    return " ".join(out)


@pytest.fixture(scope="module")
def corpus():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id LIMIT 40"
    ).fetchall()
    mixed = [(doc_id, text) for doc_id, text in rows]
    mixed += [(10000 + doc_id, _scramble(text, doc_id)) for doc_id, text in rows]
    return mixed


def test_matches_python_oracle(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    got = sorted(
        (r.doc_id, r.n_grams, r.dot_micro, r.logit, r.prob, r.keep)
        for r in textmetrics.quality_classifier(df).collect()
    )
    want = precompute.quality_classifier_py(corpus)
    assert got == want


def test_separates_clean_from_scrambled(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id: long, text: string")
    probs = {r.doc_id: r.prob for r in textmetrics.quality_classifier(df).collect()}
    clean = [p for i, p in probs.items() if i < 10000]
    garbage = [p for i, p in probs.items() if i >= 10000]
    # the vendored model was trained on exactly this corruption family:
    # averages must separate decisively, and most rows must flip keep
    assert sum(clean) / len(clean) > 0.5 > sum(garbage) / len(garbage)
    assert sum(1 for p in clean if p >= 0.5) >= 0.9 * len(clean)
    assert sum(1 for p in garbage if p < 0.5) >= 0.9 * len(garbage)


def test_plan_jvm_only_with_broadcast(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id: long, text: string",
    )
    plan = (
        textmetrics.quality_classifier(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_empty_text_emits_row(spark):
    # normalized "" still yields one empty-string unigram on both
    # engines — the doc scores rather than silently vanishing
    df = spark.createDataFrame([(7, "")], "doc_id: long, text: string")
    rows = textmetrics.quality_classifier(df).collect()
    assert len(rows) == 1 and rows[0].n_grams == 1
