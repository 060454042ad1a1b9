"""Distributed quality-classifier training (operators/clf_train.py):
bit-exact weight equality with the pure-Python oracle replication,
partitioning invariance (the integer-micro gradient discipline's whole
point), learning sanity on a planted clean-vs-garbage corpus, and
inference parity between apply_quality_weights and the vendored-weight
quality_classifier."""

import random

import pytest

from context_aware_rag_spark.operators import clf_train, textmetrics
from context_aware_rag_spark.oracle import precompute


def _corpus(n=40, seed=23):
    """Deterministic clean/garbage pairs: clean docs are structured
    word sequences (stable bigrams), garbage docs are shuffled salads
    of the same vocabulary (unigram-identical, bigram-destroyed)."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(40)]
    rows = []
    for i in range(n):
        start = rng.randrange(0, 30)
        words = [vocab[(start + j) % 40] for j in range(12)]
        rows.append((i, " ".join(words), 1.0))
        salad = [rng.choice(vocab) for _ in range(12)]
        rows.append((1000 + i, " ".join(salad), 0.0))
    return rows


def test_train_matches_python_oracle_bitexact(spark):
    rows = _corpus(n=25)
    df = spark.createDataFrame(rows, "doc_id: long, text: string, label: double")
    got = clf_train.train_quality_classifier(
        df, n_buckets=256, epochs=6, lr_ppm=2_000_000
    )
    want = precompute.train_quality_clf_py(
        rows, n_buckets=256, epochs=6, lr_ppm=2_000_000
    )
    want_w = [w for k, w in want if k >= 0]
    want_b = [w for k, w in want if k == -1][0]
    assert got["w_micro"] == want_w
    assert got["bias_micro"] == want_b
    assert got["n_docs"] == len(rows)


def test_train_partitioning_invariant(spark):
    rows = _corpus(n=20, seed=7)
    a = clf_train.train_quality_classifier(
        spark.createDataFrame(
            rows, "doc_id: long, text: string, label: double"
        ).repartition(1),
        n_buckets=128,
        epochs=4,
    )
    b = clf_train.train_quality_classifier(
        spark.createDataFrame(
            rows, "doc_id: long, text: string, label: double"
        ).repartition(13),
        n_buckets=128,
        epochs=4,
    )
    assert a["w_micro"] == b["w_micro"]
    assert a["bias_micro"] == b["bias_micro"]


def test_train_learns_clean_vs_garbage(spark):
    rows = _corpus(n=40)
    df = spark.createDataFrame(rows, "doc_id: long, text: string, label: double")
    model = clf_train.train_quality_classifier(df, n_buckets=512, epochs=25)
    scored = clf_train.apply_quality_weights(
        df, model["w_micro"], model["bias_micro"]
    )
    joined = {r.doc_id: r.keep for r in scored.collect()}
    labels = {i: y for i, _t, y in rows}
    acc = sum(
        1 for d, k in joined.items() if k == (labels[d] == 1.0)
    ) / len(joined)
    assert acc >= 0.9, acc


def test_apply_matches_vendored_inference(spark):
    from context_aware_rag_spark.functions import quality_clf_weights as qw

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "xqzj vvkw zzyy qqpp mmnn"),
         (3, "")],
        "doc_id: long, text: string",
    )
    a = sorted(
        tuple(r)
        for r in clf_train.apply_quality_weights(
            docs, qw.W_MICRO, qw.BIAS_MICRO, ns=qw.NS
        ).collect()
    )
    b = sorted(
        tuple(r) for r in textmetrics.quality_classifier(docs).collect()
    )
    # empty text is NOT absent: normalization yields one empty-string
    # unigram, identically on both paths
    assert a == b and len(a) == 3


def test_train_validation(spark):
    df = spark.createDataFrame(
        [(1, "a b c", 1.0)], "doc_id: long, text: string, label: double"
    )
    with pytest.raises(ValueError):
        clf_train.train_quality_classifier(df, epochs=0)
    with pytest.raises(ValueError):
        clf_train.train_quality_classifier(df, lr_ppm=0)
    # gram-less corpus: a 3-word doc contributes nothing at gram size 5
    short = spark.createDataFrame(
        [(1, "a b c", 1.0)], "doc_id: long, text: string, label: double"
    )
    with pytest.raises(ValueError, match="no trainable"):
        clf_train.train_quality_classifier(
            short, n_buckets=64, ns=(5,), epochs=1
        )
