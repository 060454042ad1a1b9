"""Streaming maintenance of the J4 SIMILAR edge set (reference KNN
pass, neo4j_db.py:610-653): each micro-batch of embedded chunks folds
into an epoch-partitioned item + LSH-band index, and the epoch scores
exactly the NEW-involving candidate pairs; the read side applies the
SAME ranking + degree-gate code the batch operator uses.

Why index-incrementally, resolve-on-read: candidate GENERATION is
incremental by construction — banding is per item, and every unordered
candidate pair {a, b} contains at least one id that was new in exactly
one epoch, so scoring NEW x ALL (both directions) per epoch discovers
each ordered candidate pair exactly once, at epoch-sized x band-
selectivity cost (the same NEW x ALL discipline as the incremental
MinHash banding, dedup.py). The degree GATE is not incremental: the
reference's ``WHERE count{(c)-[:SIMILAR]-()} < 5`` makes every
acceptance depend on the full prefix of earlier sources, so a late
chunk can flip decisions arbitrarily far away. The correct unit of
recomputation is therefore the WHOLE ranking/gate — but over the
accumulated CANDIDATE index (already thresholded at min_score, volume
~ n * k), never over the corpus; the read side calls
``similarity.rank_and_gate``, the literal tail of the batch operator,
so stream == batch holds structurally and is pytest-proven
(tests/test_streaming_knn.py) against ``knn_similar_edges`` on the
concatenated input — including the collapse_identical default path,
whose edge set is output-identical by the batch operator's own tests.

Exactly-once shape (identical to the dedup/canonical/community/facts
ingests): a replayed epoch reads the same strictly-prior index,
recomputes the same new-item set, band rows, and scored candidates,
and overwrites the same ``epoch=<id>`` dirs byte-for-byte.

100 TB shape: per-epoch shuffles are keyed on (band, band_hash) — the
candidate join — and on chunk_id for the embedding re-join; both sides
of the band join prune to the bands of NEW items first, so the heavy
accumulated index is filtered before it shuffles. Scores are the same
Arrow ``_pair_dot`` rows as batch (bit-equal, order-free). The
read-side gate fixpoint runs on candidate-sized input with the batch
operator's own convergence bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _pair_dot,
    rank_and_gate,
    with_lsh_bands,
)
from .epochs import read_prior_index

_ITEM_SCHEMA = "chunk_id string, embedding array<float>"
_BAND_SCHEMA = "chunk_id string, band int, band_hash int"
_CAND_SCHEMA = "src string, dst string, score double"


def knn_microbatch(
    batch_df: DataFrame,
    out_dir: str,
    epoch_id: int,
    min_score: float = 0.8,
    dim: int = 64,
    bands: int = 32,
    bits_per_band: int = 12,
) -> None:
    """Per-micro-batch body: fold new (chunk_id, embedding) rows into
    the item/band index and score the NEW-involving candidate pairs.

    PRECONDITION: chunk_id unique across the stream for distinct
    texts (the engine's sha1 chunk ids are — a replayed or duplicated
    id is dropped here as already-indexed, the MERGE semantics)."""
    spark = batch_df.sparkSession
    batch = batch_df.select("chunk_id", "embedding").dropDuplicates(
        ["chunk_id"]
    )
    prior_items = read_prior_index(
        spark, out_dir, "items_new", epoch_id, _ITEM_SCHEMA, "knn item"
    )
    new_items = batch.join(
        prior_items.select("chunk_id"), "chunk_id", "left_anti"
    ).localCheckpoint()
    new_items.write.mode("overwrite").parquet(
        os.path.join(out_dir, "items_new", f"epoch={epoch_id}")
    )
    new_bands = (
        with_lsh_bands(new_items, dim, bands, bits_per_band)
        .select("chunk_id", "band", "band_hash")
        .localCheckpoint()
    )
    new_bands.write.mode("overwrite").parquet(
        os.path.join(out_dir, "bands_new", f"epoch={epoch_id}")
    )
    prior_bands = read_prior_index(
        spark, out_dir, "bands_new", epoch_id, _BAND_SCHEMA, "knn band"
    )
    all_bands = prior_bands.unionByName(new_bands)
    # ordered candidate pairs with >= 1 new endpoint, each discovered
    # in exactly one epoch: NEW x ALL plus OLD x NEW
    fwd = new_bands.alias("l").join(
        all_bands.alias("r"),
        on=[
            F.col("l.band") == F.col("r.band"),
            F.col("l.band_hash") == F.col("r.band_hash"),
            F.col("l.chunk_id") != F.col("r.chunk_id"),
        ],
    )
    bwd = prior_bands.alias("l").join(
        new_bands.alias("r"),
        on=[
            F.col("l.band") == F.col("r.band"),
            F.col("l.band_hash") == F.col("r.band_hash"),
            F.col("l.chunk_id") != F.col("r.chunk_id"),
        ],
    )
    pair = lambda j: j.select(  # noqa: E731
        F.col("l.chunk_id").alias("src"), F.col("r.chunk_id").alias("dst")
    )
    cand_ids = pair(fwd).unionByName(pair(bwd)).dropDuplicates(["src", "dst"])
    all_items = prior_items.unionByName(new_items)
    emb_src = all_items.select(
        F.col("chunk_id").alias("src"), F.col("embedding").alias("emb_a")
    )
    emb_dst = all_items.select(
        F.col("chunk_id").alias("dst"), F.col("embedding").alias("emb_b")
    )
    scored = (
        cand_ids.join(emb_src, "src")
        .join(emb_dst, "dst")
        .withColumn("score", _pair_dot(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("score") >= min_score)
        .select("src", "dst", "score")
    )
    scored.write.mode("overwrite").parquet(
        os.path.join(out_dir, "cand_new", f"epoch={epoch_id}")
    )


def start_streaming_knn(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_score: float = 0.8,
    dim: int = 64,
    bands: int = 32,
    bits_per_band: int = 12,
    available_now: bool = True,
    max_files_per_trigger: "int | None" = None,
):
    """readStream over a parquet directory of (chunk_id, embedding)
    rows -> foreachBatch(knn_microbatch). Returns the StreamingQuery."""
    reader = (
        spark.readStream.schema(_ITEM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1)
        .parquet(input_dir)
    )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        knn_microbatch(
            batch_df, out_dir, epoch_id, min_score=min_score, dim=dim,
            bands=bands, bits_per_band=bits_per_band,
        )

    writer = reader.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_candidates(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated scored candidate index (epoch column dropped)."""
    base = os.path.join(out_dir, "cand_new")
    return (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "epoch=*"))
        .select("src", "dst", "score")
    )


def read_similar_edges(
    spark: SparkSession,
    out_dir: str,
    top_k: int = 6,
    max_degree: "int | None" = 5,
    max_iter: "int | None" = None,
    stats: "dict | None" = None,
) -> DataFrame:
    """The maintained SIMILAR edge set: the batch operator's own
    ranking + degree-gate applied to the accumulated candidates —
    equal to ``knn_similar_edges`` over every chunk ingested so far."""
    return rank_and_gate(
        read_candidates(spark, out_dir),
        top_k=top_k,
        max_degree=max_degree,
        max_iter=max_iter,
        stats=stats,
    )
