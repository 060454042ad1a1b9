"""DSIR — data selection via importance resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a small high-quality
TARGET corpus: fit bag-of-hashed-n-gram models on both corpora, weight
every raw document by its target/raw log-likelihood ratio, then sample
without replacement via deterministic Gumbel-top-k. This is the
standard pretraining-data selection recipe ("Data Selection for
Language Models via Importance Resampling", NeurIPS 2023) and extends
the culling family (dedup / rule filters / LM perplexity) with its
fourth leg: distribution matching.

The reference engine has no data-selection stage; this is part of the
beyond-the-reference training-data pipeline surface.

Determinism discipline (same as operators/lm.py): the per-bucket
log-ratio is rounded to integer MICRO-NATS once, and a document's
log-weight is the exact integer dot product of its bucket counts with
those micro-nat ratios — order-independent on any partitioning. The
Gumbel perturbation derives from xxhash64(doc_id), so selection is a
pure function of the corpus, reproducible bit-for-bit by the
pure-Python oracle (oracle/precompute.dsir_select_py).

100 TB shape: bucket counts are map-side-combined groupBy aggs whose
shuffle key space is AT MOST ``n_buckets`` rows (the hash trick caps
feature cardinality no matter how large the corpus vocabulary grows);
the per-bucket ratio table is therefore bounded and BROADCAST, so the
raw corpus pays one narrow gram scan + one broadcast-hash join + one
map-side-combined sum — no wide shuffle keyed on anything larger than
``n_buckets``. Top-k selection plans as TakeOrderedAndProject, never a
global sort. No Python UDF anywhere — the whole plan is JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _gram_sizes, _norm_grams_col

# 2^53: doubles represent every integer below this exactly, so the
# uniform (h + 0.5) / 2^53 is bit-identical in any IEEE-754 engine.
_U_DENOM = 1 << 53


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: "int | tuple[int, ...] | list[int]" = (1, 2),
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document hashed bag-of-n-grams: (id_col, bucket, cnt).

    Grams are the shared normalized word n-grams (dedup._norm_grams_col
    — every OCCURRENCE counts, not distinct) hashed into
    ``pmod(xxhash64(gram), n_buckets)``. The hash trick bounds feature
    cardinality at ``n_buckets`` regardless of corpus vocabulary.
    """
    ns = _gram_sizes(n)
    if n_buckets < 2:
        raise ValueError(f"need n_buckets >= 2, got {n_buckets}")
    return (
        docs.select(
            F.col(id_col), F.explode(_norm_grams_col(text_col, ns)).alias("gram")
        )
        .select(
            F.col(id_col),
            F.pmod(F.xxhash64(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_totals(docs: DataFrame, text_col: str, ns, n_buckets: int) -> DataFrame:
    """Corpus-level bucket counts: (bucket, c) — at most n_buckets rows.

    The scan is bounded-coalesced first: with ``n_buckets`` keys,
    partial aggregation over many small input partitions emits
    near-distinct buckets per task (no combining), while fewer, fuller
    map tasks combine properly before the exchange (guide §2.2/§2.3,
    skew.coalesce_for_agg — measured 1.1 s -> 0.4 s on the 50k bench
    corpus's 256-partition checkpoint)."""
    from .skew import coalesce_for_agg

    return (
        coalesce_for_agg(docs)
        .select(F.explode(_norm_grams_col(text_col, ns)).alias("gram"))
        .select(F.pmod(F.xxhash64(F.col("gram")), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    n: "int | tuple[int, ...] | list[int]" = (1, 2),
    n_buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-raw-document importance log-weight: (id_col, n_grams, logw_micro).

    log w(doc) = sum over the doc's gram occurrences of
    ``log p_target(bucket) - log p_raw(bucket)`` with add-alpha
    smoothed bucket unigram models
    ``p_x(b) = (c_x[b] + alpha) / (T_x + alpha * n_buckets)``.

    The per-bucket log-ratio is rounded to integer micro-nats BEFORE
    the per-document dot product, so ``logw_micro`` is exact integer
    arithmetic (order-independent). Raw documents with no grams emit no
    row (they carry no evidence either way).
    """
    ns = _gram_sizes(n)
    if n_buckets < 2:
        raise ValueError(f"need n_buckets >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"need alpha > 0, got {alpha}")
    # ONE gram scan of the raw corpus, materialized as the per-doc
    # BUCKET ARRAY (narrow — ints, far smaller than the text): both
    # the corpus-level bucket totals and the per-doc scoring explode
    # from here. The previous shape pre-aggregated to (id, bucket,
    # cnt) — a corpus-gram-sized wide Exchange — before the broadcast
    # ratio join; the only per-doc facts needed downstream are
    # occurrence COUNT and the occurrence-sum of lr_micro, both of
    # which map-side-combine in the final doc-keyed agg, so the wide
    # (doc, bucket) shuffle bought nothing. Measured: 14.5 s -> ~4 s
    # on the 50k bench corpus (with the zip_with gram fix).
    # bounded-coalesced: the bucket-total agg below combines far
    # better over fewer, fuller partitions (see skew.coalesce_for_agg),
    # and the doc-keyed scoring agg is insensitive either way
    from .skew import coalesce_for_agg

    doc_buckets = coalesce_for_agg(
        raw.select(
            F.col(id_col),
            F.transform(
                _norm_grams_col(text_col, ns),
                lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)),
            ).alias("_bks"),
        )
    ).localCheckpoint()
    occ = doc_buckets.select(F.col(id_col), F.explode("_bks").alias("bucket"))
    # lazy checkpoints (r6 s3): both frames' consumers (the ratio join
    # and their single-row total aggregates) live inside the final
    # action's broadcast subtrees, so the eager form only serialized
    # two extra driver-blocking jobs; lazy keeps compute-once + plan
    # truncation (the knn-candidates precedent)
    raw_b = (
        occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tgt_b = _bucket_totals(
        target, target_text_col, ns, n_buckets
    ).localCheckpoint(eager=False)
    denom = F.lit(float(alpha)) * F.lit(n_buckets)
    # full outer on bucket: a bucket seen only on one side still gets a
    # smoothed ratio. Totals are single-row broadcasts.
    ratio = (
        raw_b.withColumnRenamed("c", "c_raw")
        .join(tgt_b.withColumnRenamed("c", "c_tgt"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("c_raw"), F.lit(0)).alias("c_raw"),
            F.coalesce(F.col("c_tgt"), F.lit(0)).alias("c_tgt"),
        )
        .crossJoin(
            F.broadcast(raw_b.agg(F.sum("c").alias("t_raw")))
        )
        .crossJoin(
            F.broadcast(tgt_b.agg(F.sum("c").alias("t_tgt")))
        )
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("c_tgt") + F.lit(float(alpha))) / (F.col("t_tgt") + denom))
                    - F.log((F.col("c_raw") + F.lit(float(alpha))) / (F.col("t_raw") + denom))
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    # occurrence-grain scoring: count(1) == the old sum(cnt) and
    # sum(lr_micro) == the old sum(cnt * lr_micro) — exact integers,
    # order-independent; every raw bucket is in ratio (full_outer), so
    # the inner join drops nothing
    return (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("lr_micro").cast("long").alias("logw_micro"),
        )
    )


def gumbel_micro_col(id_col) -> "F.Column":
    """Deterministic Gumbel(0,1) noise in integer micro-units, derived
    from xxhash64 of the id: u = (pmod(h, 2^53) + 0.5) / 2^53 is exact
    in doubles, g = -ln(-ln(u)). Reproducible by the pure-Python oracle
    (same xxh64, same libm ln)."""
    u = (F.pmod(F.xxhash64(id_col), F.lit(_U_DENOM)) + F.lit(0.5)) / F.lit(
        float(_U_DENOM)
    )
    return F.round(-F.log(-F.log(u)) * F.lit(1000000.0)).cast("long")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    n: "int | tuple[int, ...] | list[int]" = (1, 2),
    n_buckets: int = 4096,
    alpha: float = 0.5,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k importance resampling: the ``k`` raw documents with
    the largest ``logw/temperature + Gumbel(doc_id)`` — equivalent to
    sampling k docs without replacement with probability proportional
    to ``w^(1/temperature)`` (the Gumbel-max trick), but fully
    deterministic here because the noise is hash-derived.

    Returns (id_col, n_grams, logw_micro, gumbel_micro, key_micro,
    rank) for the selected k, rank 1 = first pick. Ties on key_micro
    (possible only through the integer rounding) break by ascending id.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"need temperature > 0, got {temperature}")
    w = dsir_weights(
        raw, target, id_col, text_col, target_text_col, n, n_buckets, alpha
    )
    keyed = w.select(
        "*",
        gumbel_micro_col(F.col(id_col)).alias("gumbel_micro"),
    ).select(
        "*",
        (
            # bround = HALF_EVEN, matching Python round() in the oracle:
            # logw_micro / temperature hits exact .5 values structurally
            # (any odd integer over 2.0), where HALF_UP F.round diverges
            F.bround(F.col("logw_micro") / F.lit(float(temperature))).cast("long")
            + F.col("gumbel_micro")
        ).alias("key_micro"),
    )
    win = Window.orderBy(F.col("key_micro").desc(), F.col(id_col).asc())
    # row_number over an unpartitioned window would single-task the
    # corpus; limit-after-sort plans as TakeOrderedAndProject instead,
    # and the rank is re-derived on the k survivors only.
    topk = (
        keyed.orderBy(F.col("key_micro").desc(), F.col(id_col).asc())
        .limit(int(k))
        .withColumn("rank", F.row_number().over(win).cast("int"))
    )
    return topk
