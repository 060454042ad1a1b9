"""Sequence packing: assign documents to fixed-token-budget training
bins (the "concat-and-chunk" packing a pretraining data pipeline runs
after dedup/filtering — each bin's documents are concatenated into one
training example of at most ``max_tokens`` tokens, modulo the final
document that crosses the boundary).

Semantics (deterministic): documents are taken in ``order_cols`` order;
``cum_before`` = sum of the token counts of all PRECEDING documents;
``bin_id = floor(cum_before / max_tokens)``; ``bin_offset = cum_before
% max_tokens``. A document whose tokens straddle a boundary belongs to
the bin it starts in (the trainer splits residuals; this operator plans
the layout).

Scale shape: a naive ``sum(...) OVER (ORDER BY ...)`` global cumulative
sum plans an Exchange SinglePartition — the W4 anti-pattern. This
reuses the two-phase discipline of :func:`skew.global_index`:
rangepartition + local running sum, then per-partition totals (a tiny
<= #partitions-row aggregate) turned into broadcast prefix offsets.
One fully-parallel shuffle, no single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    order_cols: list | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Add (cum_before, bin_id, bin_offset) to ``docs``.

    ``order_cols`` (default ["doc_id"]) must be a total order.
    Row-identical to ``sum() OVER (ORDER BY ...)`` (tested) but with no
    Exchange SinglePartition in the plan.
    """
    if max_tokens < 1:
        # with ANSI off, /0 and %0 yield silent null bin ids downstream
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    order_cols = order_cols or ["doc_id"]
    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranged = (
        docs.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.shiftrightunsigned(F.monotonically_increasing_id(), 33))
        .localCheckpoint()  # pin sampled range boundaries across jobs
    )
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(token_col).alias("_t"))
        .collect()
    )
    offsets, acc = [], 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += int(r["_t"] or 0)
    off_df = spark.createDataFrame(offsets, "_pid long, _poff long")
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "cum_before",
            (
                F.col("_poff")
                + F.coalesce(F.sum(token_col).over(w_local), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "bin_id", F.floor(F.col("cum_before") / max_tokens).cast("long")
        )
        .withColumn(
            "bin_offset", (F.col("cum_before") % max_tokens).cast("long")
        )
        .drop("_pid", "_poff")
    )
    return out


def bin_stats(packed: DataFrame, max_tokens: int, token_col: str = "n_tokens") -> DataFrame:
    """Per-bin fill statistics: docs per bin, tokens that START in the
    bin, fill ratio (straddling docs count toward their starting bin,
    mirroring pack_sequences semantics)."""
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_col).cast("long").alias("tokens_started"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("tokens_started") / F.lit(float(max_tokens)), 6),
        )
    )
