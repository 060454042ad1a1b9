"""Streaming heavy-hitter metrics via mergeable Count-Min cells.

Same epoch discipline as :mod:`.hll_metrics`: each micro-batch writes
its own depth x width cell table to an ``epoch=<id>`` partition
(overwrite) and the reader SUM-merges all epochs on demand. One
difference matters: CMS merge is SUM, which — unlike HLL's max — is
NOT idempotent, so replay safety rests entirely on the per-epoch
OVERWRITE (a replayed epoch rewrites identical cells in place; it can
never be added twice because epochs are summed exactly once at read
time). That property is what the replay test pins.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators import sketches


def cms_microbatch(
    batch_df: DataFrame,
    out_dir: str,
    epoch_id: int,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> None:
    """Per-micro-batch body: this epoch's cells, overwritten into its
    epoch partition — at most depth * width rows per epoch."""
    cells = sketches.cms_build(batch_df, key_col, depth=depth, width=width)
    cells.write.mode("overwrite").parquet(
        os.path.join(out_dir, "cells", f"epoch={epoch_id}")
    )


def read_merged_cms(spark: SparkSession, out_dir: str) -> DataFrame:
    """SUM-merge of every epoch's cell table."""
    base = os.path.join(out_dir, "cells")
    all_cells = (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "epoch=*"))
        .drop("epoch")
    )
    return sketches.cms_merge(all_cells)


def merged_query(
    spark: SparkSession,
    out_dir: str,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Frequency estimates for ``keys`` over everything ingested so
    far (same depth/width as the writer — the caller's contract)."""
    return sketches.cms_query(
        read_merged_cms(spark, out_dir), keys, key_col, depth=depth,
        width=width,
    )


def start_streaming_cms(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    key_col: str,
    schema: Optional[T.StructType] = None,
    checkpoint_dir: Optional[str] = None,
    max_files_per_trigger: int = 1,
    depth: int = 4,
    width: int = 1024,
):
    """File-source streaming CMS metrics; one file per trigger by
    default so multi-file inputs exercise real multi-epoch merging."""
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
            lambda df, epoch_id: cms_microbatch(
                df, out_dir, epoch_id, key_col, depth=depth, width=width
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
