"""Distributed training of the fastText-style quality classifier.

The INFERENCE side (textmetrics.quality_classifier) applies vendored
weights trained offline by tools/gen_quality_clf.py; this module trains
the same model shape (Joulin et al. 2016 "Bag of Tricks"; the
CCNet/LLaMA curated-vs-garbage quality filter) ON THE CLUSTER, so the
training corpus never has to fit one machine — the bpe_train.py
precedent applied to model fitting.

Determinism discipline (the PCA/bpe_train pattern): the model state is
INTEGER micro-units end to end. Per epoch every per-row gradient term
is floor-truncated to integer micro BEFORE the int64 sum, so the
gradient is exact and partitioning-independent; the driver update is
pure integer arithmetic (floor division). Floats exist only inside the
per-row sigmoid — a per-row scalar with a fixed operation order, so the
pure-Python oracle (oracle/precompute.train_quality_clf_py) reproduces
the entire training run bit-for-bit, epoch by epoch.

100 TB shape: features are computed ONCE (one corpus gram scan ->
(doc, bucket, cnt), checkpointed and pinned by doc id); each epoch is
one broadcast of the B_BUCKETS-row weight table + one doc-keyed agg
(the per-doc dot) + one bucket-keyed agg (the gradient, bounded at
B_BUCKETS rows), and ships exactly B_BUCKETS+1 longs to the driver.
Model state on the driver is O(B_BUCKETS) — the tall-skinny regime,
like PCA's dim^2 Gram. No Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def train_quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1024,
    ns: tuple = (1, 2),
    epochs: int = 20,
    lr_ppm: int = 2_000_000,
) -> dict:
    """Full-batch logistic regression on hashed normalized word n-gram
    MEAN bags: label ~ sigmoid(bias + mean_bag . w).

    ``docs`` needs (id_col, text_col, label_col) with labels in {0, 1}.
    Documents with zero normalized grams carry no signal and are
    excluded (they also score NULL at inference). Returns::

        {"w_micro": [int] * n_buckets, "bias_micro": int,
         "n_docs": int, "epochs": int}

    Exact per-epoch recurrence (Spark and the pure-Python oracle run
    the identical arithmetic):

        logit_i = b/1e6 + (dot_i / n_grams_i)/1e6        [dot exact int]
        g_i     = 1/(1 + exp(-logit_i)) - y_i
        G[k]    = sum_i floor(g_i * cnt_ik / n_grams_i * 1e6)  [int64]
        G_b     = sum_i floor(g_i * 1e6)                       [int64]
        w[k]   -= (lr_ppm * G[k]) // (1e6 * n_docs)      [floor div]
        b      -= (lr_ppm * G_b)  // (1e6 * n_docs)

    Driver actions: 3 up front (two stage checkpoints + the doc
    count), then 2 per epoch (the per-doc state checkpoint + the
    bounded B_BUCKETS+1-row gradient collect).
    """
    from .dsir import hashed_ngram_counts

    if epochs < 1:
        raise ValueError(f"need epochs >= 1, got {epochs}")
    if lr_ppm <= 0:
        raise ValueError(f"need lr_ppm > 0, got {lr_ppm}")
    spark = docs.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    counts = (
        hashed_ngram_counts(docs, id_col, text_col, n=ns, n_buckets=n_buckets)
        .repartition(parallelism, id_col)
        .localCheckpoint()
    )
    doc_info = (
        counts.groupBy(id_col)
        .agg(F.sum("cnt").cast("long").alias("n_grams"))
        .join(
            docs.select(
                F.col(id_col), F.col(label_col).cast("double").alias("y")
            ),
            id_col,
        )
        .localCheckpoint()
    )
    n_docs = doc_info.count()
    if n_docs == 0:
        raise ValueError("no trainable documents (all texts gram-less?)")
    w = [0] * n_buckets
    b = 0
    for _ in range(epochs):
        wdf = spark.createDataFrame(
            list(enumerate(int(x) for x in w)), "bucket: long, w_micro: long"
        )
        dots = (
            counts.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(
                F.sum(F.col("cnt") * F.col("w_micro"))
                .cast("long")
                .alias("dot_micro")
            )
        )
        logit = (
            F.lit(b) / F.lit(1000000.0)
            + (F.col("dot_micro") / F.col("n_grams")) / F.lit(1000000.0)
        )
        per_doc = (
            doc_info.join(dots, id_col)
            .select(
                F.col(id_col),
                "n_grams",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)) - F.col("y")
                ).alias("g"),
            )
            .localCheckpoint()  # used by both gradient branches below
        )
        grad_w = (
            counts.join(per_doc, id_col)
            .select(
                "bucket",
                F.floor(
                    F.col("g") * F.col("cnt") / F.col("n_grams")
                    * F.lit(1000000.0)
                ).alias("t"),
            )
            .groupBy("bucket")
            .agg(F.sum("t").cast("long").alias("gsum"))
        )
        grad_b = per_doc.select(
            F.lit(-1).cast("long").alias("bucket"),
            F.floor(F.col("g") * F.lit(1000000.0)).alias("t"),
        ).groupBy("bucket").agg(F.sum("t").cast("long").alias("gsum"))
        denom = MICRO * n_docs
        for r in grad_w.unionByName(grad_b).collect():
            if r["bucket"] == -1:
                b -= (lr_ppm * int(r["gsum"])) // denom
            else:
                w[r["bucket"]] -= (lr_ppm * int(r["gsum"])) // denom
    return {
        "w_micro": w,
        "bias_micro": b,
        "n_docs": n_docs,
        "epochs": epochs,
    }


def apply_quality_weights(
    docs: DataFrame,
    w_micro,
    bias_micro: int,
    ns: tuple = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score docs with an explicit weight vector — the inference twin
    of :func:`train_quality_classifier` (textmetrics.quality_classifier
    is this applied to the vendored weights). Returns (id_col, n_grams,
    dot_micro, logit, prob, keep); gram-less docs are absent.

    100 TB shape: the weight table is len(w_micro) rows broadcast once;
    the corpus pays one narrow gram scan + map-side-combined
    (doc, bucket) agg + one broadcast join. No Python UDF."""
    from .dedup import _norm_grams_col
    from .dsir import _gram_sizes

    spark = docs.sparkSession
    weights = spark.createDataFrame(
        list(enumerate(int(x) for x in w_micro)),
        "bucket: long, w_micro: long",
    )
    # occurrence-grain scoring (the dsir_weights shape): explode the
    # bucket stream straight into the broadcast weight join + one
    # map-side-combined doc agg — the (doc, bucket) pre-aggregation
    # was a corpus-gram-sized wide Exchange that bought nothing, since
    # count(1) == sum(cnt) and sum(w) == sum(cnt * w) exactly
    n_buckets = len(w_micro)
    occ = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                _norm_grams_col(text_col, _gram_sizes(ns)),
                lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)),
            )
        ).alias("bucket"),
    )
    logit = (
        F.lit(int(bias_micro)) / F.lit(1000000.0)
        + (F.col("dot_micro") / F.col("n_grams")) / F.lit(1000000.0)
    )
    return (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("w_micro").cast("long").alias("dot_micro"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "dot_micro",
            F.round(logit, 6).alias("logit"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob"),
            (logit >= 0).alias("keep"),
        )
    )
