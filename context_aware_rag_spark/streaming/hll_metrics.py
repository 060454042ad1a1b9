"""Streaming distinct-count metrics via mergeable HLL registers.

The batch sketch (operators/sketches.py) becomes a streaming metric
with no extra machinery: every micro-batch writes ITS OWN register
table to an ``epoch=<id>`` partition (overwrite — a replayed epoch
rewrites the identical registers, and even a double-merge cannot
inflate the estimate because register merge is max), and the reader
max-merges all epochs on demand. Unlike the dedup ingests, no
prior-epoch read happens inside the batch body at all: the sketch is
a CRDT, so epochs are fully independent at write time and associativity
does the rest at read time — the cheapest possible exactly-once
contract.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators import sketches


def hll_microbatch(
    batch_df: DataFrame,
    out_dir: str,
    epoch_id: int,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> None:
    """Per-micro-batch body: compute this epoch's registers, overwrite
    its epoch partition. At most |groups| * 2^p tiny rows per epoch."""
    regs = sketches.hll_registers(batch_df, group_cols, value_col, p=p)
    regs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "registers", f"epoch={epoch_id}")
    )


def read_merged_registers(spark: SparkSession, out_dir: str) -> DataFrame:
    """Max-merge of every epoch's register table."""
    base = os.path.join(out_dir, "registers")
    all_regs = (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "epoch=*"))
        .drop("epoch")
    )
    return sketches.hll_merge(all_regs)


def merged_estimate(
    spark: SparkSession,
    out_dir: str,
    group_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """Cardinality estimate over everything ingested so far."""
    return sketches.hll_estimate(
        read_merged_registers(spark, out_dir), group_cols, p=p
    )


def start_streaming_hll(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    schema: Optional[T.StructType] = None,
    checkpoint_dir: Optional[str] = None,
    max_files_per_trigger: int = 1,
    p: int = 8,
):
    """File-source streaming HLL metrics; one file per trigger by
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
            lambda df, epoch_id: hll_microbatch(
                df, out_dir, epoch_id, group_cols, value_col, p=p
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
