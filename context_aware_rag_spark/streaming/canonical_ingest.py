"""Streaming INCREMENTAL entity canonicalization: every micro-batch of
new entity nodes folds into the accumulated canonical map via
``canonicalize.canonicalize_incremental``, so the alias map stays fresh
DURING ingest instead of waiting for the EP2 finalize barrier
(streaming/ingest.py's ``finalize_graph`` — the reference's own
semantics — recomputes it at the end; this module is the beyond-
reference continuous mode, same pattern as dedup_ingest vs the batch
dedup pass).

Exactly-once shape (the dedup_ingest contract): each epoch writes (a)
its node rows and (b) the DELTA of the canonical map — rows that are
new or changed vs the prior-epoch map — to ``epoch=<id>`` partition
dirs with overwrite. A replayed epoch reads strictly-prior epochs only,
so it recomputes the same delta byte-for-byte.

Resolution read (:func:`read_canonical_map`): canon ids are the MIN
node id of a component, and components only ever GROW as nodes arrive,
so a node's canon_id is MONOTONICALLY NON-INCREASING across epochs —
newest-wins resolution is therefore exactly ``min(canon_id) per
node_id``, one map-side-combined aggregation, no window. (Identity
rows are never stored — the map keeps the non-identity convention of
canonicalize_nodes — and a stored mapping can never revert to
identity, so no tombstones exist to resolve.)

At scale: per epoch the incremental pass pays banded-LSH candidates of
new reps x all reps (cost scales with the batch), the delta write is
bounded by new + re-canonized nodes, and the prior-map read is one
parquet scan pruned by the epoch partition column — on a real
deployment an Iceberg MERGE target, same contract.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize
from .epochs import read_prior_index

_NODE_SCHEMA = "node_id string, name string, type string"
_MAP_SCHEMA = "node_id string, canon_id string"


def canonical_microbatch(
    batch_df: DataFrame,
    out_dir: str,
    epoch_id: int,
    threshold: float = 0.9,
    embedding_dim: int = 64,
    blocking: str = "lsh",
) -> None:
    """Per-micro-batch body: fold this batch's (node_id, name, type)
    rows into the accumulated canonical map; write node rows + map
    delta, epoch-partitioned with overwrite."""
    spark = batch_df.sparkSession
    nodes = (
        batch_df.select("node_id", "name", "type")
        .dropDuplicates(["node_id"])
        .localCheckpoint()  # consumed by the fold AND the rows write
    )
    prior_nodes = read_prior_index(
        spark, out_dir, "canon_nodes", epoch_id, _NODE_SCHEMA,
        "canonicalization nodes",
    )
    prior_map = read_prior_index(
        spark, out_dir, "canon_map_delta", epoch_id, _MAP_SCHEMA,
        "canonical map",
    )
    # resolve the prior deltas to the latest map (min = newest, see
    # module docstring) before folding
    prior_resolved = prior_map.groupBy("node_id").agg(
        F.min("canon_id").alias("canon_id")
    )
    new_map = canonicalize.canonicalize_incremental(
        prior_nodes,
        prior_resolved,
        nodes,
        threshold=threshold,
        embedding_dim=embedding_dim,
        blocking=blocking,
    ).localCheckpoint()
    delta = new_map.exceptAll(prior_resolved)
    nodes.write.mode("overwrite").parquet(
        os.path.join(out_dir, "canon_nodes", f"epoch={epoch_id}")
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(out_dir, "canon_map_delta", f"epoch={epoch_id}")
    )


def read_canonical_map(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated canonical map (node_id, canon_id), non-identity
    rows only — min-resolution over every epoch's delta."""
    base = os.path.join(out_dir, "canon_map_delta")
    return (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "epoch=*"))
        .drop("epoch")
        .groupBy("node_id")
        .agg(F.min("canon_id").alias("canon_id"))
    )


def read_canonical_nodes(spark: SparkSession, out_dir: str) -> DataFrame:
    """All ingested node rows (epoch column dropped)."""
    base = os.path.join(out_dir, "canon_nodes")
    return (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "epoch=*"))
        .drop("epoch")
    )


def start_streaming_canonical(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    embedding_dim: int = 64,
    blocking: str = "lsh",
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """readStream over a parquet directory of (node_id, name, type)
    rows -> foreachBatch(canonical_microbatch). Returns the started
    StreamingQuery."""
    reader = (
        spark.readStream.schema(_NODE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1)
        .parquet(input_dir)
    )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        canonical_microbatch(
            batch_df, out_dir, epoch_id,
            threshold=threshold, embedding_dim=embedding_dim,
            blocking=blocking,
        )

    writer = reader.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
