"""Stage 3 — chunk linking and structural edges (W1-W3, J1-J2).

Reference semantics (base.py:362-476): chunks sorted by chunkIdx per
uuid; 1-based running ``position``; ``content_offset`` = prefix sum of
previous chunk lengths; first chunk gets FIRST_CHUNK from the document
node, each subsequent chunk a NEXT_CHUNK edge from its predecessor;
every chunk a PART_OF edge to its document; every mention a HAS_ENTITY
edge (base.py:511-540).

Spark shape: ONE window spec ``partitionBy(conv_id).orderBy(batch_id,
turn_idx, split_pos)`` shared by lag / row_number / running sum — a
single shuffle on conv_id serves all three. Long-conversation skew is
real here (the reference's sequential previous_chunk_id dependency
forces per-conv ordering); at cluster scale AQE skew handling does not
apply to window shuffles, so the mitigation is capacity-based: the
window state is O(1) per row (no full-partition buffering for
lag/row_number/running-sum with a bounded frame), and a 400k-chunk
conversation streams through a single task in seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_ORDER = ["batch_id", "turn_idx", "split_pos"]


def link_chunks(chunks: DataFrame) -> DataFrame:
    """Attach position / content_offset / prev_chunk_id / is_first."""
    w = Window.partitionBy("conv_id").orderBy(*CHUNK_ORDER)
    return (
        chunks.withColumn("position", F.row_number().over(w))
        .withColumn(
            "content_offset",
            F.coalesce(
                F.sum("length").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("prev_chunk_id", F.lag("chunk_id").over(w))
        .withColumn("is_first", F.col("position") == 1)
    )


def structural_edges(linked_chunks: DataFrame, mentions: DataFrame) -> DataFrame:
    """PART_OF + FIRST_CHUNK + NEXT_CHUNK + HAS_ENTITY edge rows.

    All four are projections/filters of already-shuffled inputs — no
    additional shuffle (the union is narrow).
    """
    part_of = linked_chunks.select(
        F.col("chunk_id").alias("src"),
        F.col("conv_id").alias("dst"),
        F.lit("PART_OF").alias("rel_type"),
        "conv_id",
    )
    first_chunk = (
        linked_chunks.filter(F.col("is_first"))
        .select(
            F.col("conv_id").alias("src"),
            F.col("chunk_id").alias("dst"),
            F.lit("FIRST_CHUNK").alias("rel_type"),
            "conv_id",
        )
    )
    next_chunk = (
        linked_chunks.filter(~F.col("is_first"))
        .select(
            F.col("prev_chunk_id").alias("src"),
            F.col("chunk_id").alias("dst"),
            F.lit("NEXT_CHUNK").alias("rel_type"),
            "conv_id",
        )
    )
    has_entity = mentions.select(
        F.col("chunk_id").alias("src"),
        F.col("node_id").alias("dst"),
        F.lit("HAS_ENTITY").alias("rel_type"),
        "conv_id",
    )
    return part_of.unionByName(first_chunk).unionByName(next_chunk).unionByName(
        has_entity
    )
