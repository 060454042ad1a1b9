"""Streaming Markov-transition metrics with cross-epoch stitching.

The batch operator (operators/seqmine.markov_transitions) needs every
consecutive within-sequence pair; a micro-batched stream cuts each
sequence at epoch boundaries, and the pair that SPANS the cut (last
token of the group in one epoch -> its first token in the next epoch
it appears in) belongs to no single epoch. The epoch discipline here
makes the stream exactly equal to the batch run over the concatenated
input:

- per epoch, OVERWRITE two partition tables — the within-epoch
  transition counts (SUM-mergeable, the cms_metrics shape) and a
  per-group BOUNDARY row (first/last token of the group in this
  epoch);
- at read time, boundary rows stitch by ordering each group's epochs
  (lag over epoch id): prev epoch's last -> this epoch's first is
  exactly the cut pair, added to the summed counts; totals and
  trunc-ppm probabilities are then the batch arithmetic.

Exactness contract: each group's events must arrive in event order
across epochs (monotone sources — the file-stream ingest discipline
shared by every streaming module here). Replay safety is the
per-epoch overwrite (SUM is not idempotent; a replayed epoch rewrites
identical rows in place and epochs are merged exactly once at read
time — the cms_metrics argument, pinned by the same test shape).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.seqmine import _seq_window


def markov_microbatch(
    batch_df: DataFrame,
    out_dir: str,
    epoch_id: int,
    group: str = "user_id",
    order_by: Sequence[str] = ("ts", "event_id"),
    token: str = "event_type",
) -> None:
    """Per-micro-batch body: within-epoch transition counts + the
    per-group boundary row, each overwritten into its epoch
    partition."""
    w = _seq_window(group, order_by)
    tok = F.col(token).cast("string")
    seq = batch_df.select(
        F.col(group).cast("string").alias("g"),
        tok.alias("tok"),
        F.lead(tok, 1).over(w).alias("nxt"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group)).alias("_n"),
    ).localCheckpoint()  # feeds both writes
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("from_token"), F.col("nxt").alias("to_token"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    bounds = (
        seq.filter((F.col("_rn") == 1) | (F.col("_rn") == F.col("_n")))
        .groupBy("g")
        .agg(
            F.min(F.struct("_rn", "tok"))["tok"].alias("first_token"),
            F.max(F.struct("_rn", "tok"))["tok"].alias("last_token"),
        )
    )
    trans.write.mode("overwrite").parquet(
        os.path.join(out_dir, "trans", f"epoch={epoch_id}")
    )
    bounds.write.mode("overwrite").parquet(
        os.path.join(out_dir, "bounds", f"epoch={epoch_id}")
    )


def read_merged_transitions(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """The exact batch markov_transitions table over everything
    ingested so far: summed within-epoch counts + stitched boundary
    pairs, then the batch ppm arithmetic."""
    tbase = os.path.join(out_dir, "trans")
    bbase = os.path.join(out_dir, "bounds")
    trans = (
        spark.read.option("basePath", tbase)
        .parquet(os.path.join(tbase, "epoch=*"))
        .drop("epoch")
    )
    bounds = spark.read.option("basePath", bbase).parquet(
        os.path.join(bbase, "epoch=*")
    )
    w = Window.partitionBy("g").orderBy(F.col("epoch").asc())
    cuts = (
        bounds.select(
            "g",
            F.lag("last_token").over(w).alias("from_token"),
            F.col("first_token").alias("to_token"),
        )
        .filter(F.col("from_token").isNotNull())
        .groupBy("from_token", "to_token")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    merged = (
        trans.unionByName(cuts)
        .groupBy("from_token", "to_token")
        .agg(F.sum("n_obs").alias("n_obs"))
    )
    totals = merged.groupBy("from_token").agg(
        F.sum("n_obs").alias("from_total")
    )
    return merged.join(totals, "from_token").select(
        "from_token",
        "to_token",
        "n_obs",
        "from_total",
        F.expr("n_obs * 1000000 div from_total").alias("p_ppm"),
    )


def start_streaming_markov(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    group: str = "user_id",
    order_by: Sequence[str] = ("ts", "event_id"),
    token: str = "event_type",
    schema: Optional[T.StructType] = None,
    checkpoint_dir: Optional[str] = None,
    max_files_per_trigger: int = 1,
):
    """File-source streaming Markov metrics; one file per trigger by
    default so multi-file inputs exercise real boundary stitching."""
    if schema is None:
        raise ValueError("schema is required for a file-source stream")
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch_id: markov_microbatch(
                df, out_dir, epoch_id, group=group, order_by=order_by,
                token=token,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
