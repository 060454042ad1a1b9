"""End-to-end KG construction pipeline with checkpointed, resumable stages.

Stage graph (SURVEY.md §7):

    transcripts → chunks → (triples, mentions) → linked_chunks
               → structural edges → [similarity pairs → canonical_map]
               → nodes / edges / triples

Every stage optionally checkpoints to ``workdir/<stage>/`` (parquet in
the sandbox; Iceberg ``writeTo(...).createOrReplace()`` on a real
catalog — same code path, different format string). A stage whose
``_SUCCESS`` marker exists is NOT recomputed on resume — the reference's
idempotent-MERGE property (neo4j_db.py:519-556) re-expressed as
write-once atomic table swaps.

Lineage: one row per (run, stage, partition) with input/output row
counts and wall time, appended to ``workdir/_lineage/`` — the analog of
the reference's graph_rag_metrics.json (rag_health.py:20-48), but
per-partition so stragglers and skew are visible.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import canonicalize, chunking, extraction, linking, materialize, similarity


@dataclass
class PipelineResult:
    chunks: DataFrame
    linked_chunks: DataFrame
    triples: DataFrame
    mentions: DataFrame
    edges: DataFrame
    nodes: DataFrame
    canonical_map: Optional[DataFrame] = None
    metrics: Dict[str, dict] = field(default_factory=dict)


class StageWriter:
    """Checkpoint + lineage bookkeeping for one pipeline run."""

    def __init__(self, spark: SparkSession, workdir: Optional[str], run_id: str):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id
        self.metrics: Dict[str, dict] = {}

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def materialize(self, stage: str, df_thunk: Callable[[], DataFrame]) -> DataFrame:
        """Compute-or-load a stage. Without a workdir, just build the plan
        (lazy, single-job execution at the end)."""
        if not self.workdir:
            return df_thunk()
        path = self._path(stage)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            self.metrics[stage] = {"resumed": True}
            return self.spark.read.parquet(path)
        t0 = time.monotonic()
        df = df_thunk()
        df.write.mode("overwrite").parquet(path)
        wall = time.monotonic() - t0
        out = self.spark.read.parquet(path)
        self._record_lineage(stage, out, wall)
        return out

    def _record_lineage(self, stage: str, df: DataFrame, wall_s: float) -> None:
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count(F.lit(1)).alias("out_rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("wall_s", F.lit(float(wall_s)))
        )
        per_part.write.mode("append").parquet(os.path.join(self.workdir, "_lineage"))
        total = per_part.agg(F.sum("out_rows")).collect()[0][0]
        self.metrics[stage] = {"rows": int(total or 0), "wall_s": wall_s}


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    workdir: Optional[str] = None,
    run_id: str = "run0",
) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    if cfg.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    w = StageWriter(spark, workdir, run_id)

    if cfg.chunking == "topic":
        chunk_fn = chunking.chunk_transcripts_topic
    elif cfg.chunking == "chars":
        chunk_fn = chunking.chunk_transcripts
    else:
        raise ValueError(f"unknown chunking strategy: {cfg.chunking!r}")
    chunks = w.materialize("chunks", lambda: chunk_fn(transcripts, cfg))

    def _extract() -> DataFrame:
        t, _ = extraction.extract_stage(chunks, cfg)
        return t

    triples = w.materialize("triples_raw", _extract)
    if not workdir and cfg.deduplicate_nodes:
        # lazy mode + dedup: canonicalization's iterative actions (CC
        # fixpoint, GEMM stage) would re-run the extraction UDF once per
        # job — pin the extraction output once (the workdir path gets
        # the same break from its stage table)
        triples = triples.localCheckpoint()
    mentions = w.materialize(
        "mentions", lambda: extraction.mentions_from_triples(triples)
    )
    if not workdir and cfg.deduplicate_nodes:
        # same break for the mention table: the dedup tail evaluates it
        # 2-4 times (canonicalize's node-vocabulary input + node_to_rep
        # re-scan, build_nodes, structural rewrite), and each
        # evaluation re-runs the endpoint explode + mention dedup
        # exchange; one vocabulary-sized cache pays for all of them
        mentions = mentions.localCheckpoint()
    return assemble_graph(w, cfg, chunks, triples, mentions, transcripts)


def assemble_graph(
    w: StageWriter,
    cfg: PipelineConfig,
    chunks: DataFrame,
    triples: DataFrame,
    mentions: DataFrame,
    transcripts: Optional[DataFrame] = None,
) -> PipelineResult:
    """Pipeline tail shared by batch (`run_pipeline`) and streaming
    finalize (`streaming.ingest.finalize_graph`): linking, structural
    edges, optional SIMILAR KNN pass, optional canonicalization, node /
    edge materialization. ``transcripts`` is only needed for the
    source_tools enrichment."""
    workdir = w.workdir

    def _link() -> DataFrame:
        if cfg.salted_linking:
            from ..operators.skew import link_chunks_salted

            return link_chunks_salted(chunks, block_turns=cfg.salt_block_turns)
        return linking.link_chunks(chunks)

    linked = w.materialize("linked_chunks", _link)
    structural = w.materialize(
        "structural_edges", lambda: linking.structural_edges(linked, mentions)
    )

    canonical_map = None
    similar = None
    if cfg.similar_edges:
        # EP2 step f — chunk-KNN SIMILAR edges (neo4j_db.py:610-653)
        def _similar() -> DataFrame:
            uniq = chunks.dropDuplicates(["chunk_id"]).select("chunk_id", "text")
            with_emb = similarity.with_text_embeddings(uniq, dim=cfg.embedding_dim)
            return similarity.knn_similar_edges(
                with_emb,
                id_col="chunk_id",
                min_score=cfg.knn_min_score,
                top_k=cfg.knn_top_k,
                bands=cfg.lsh_bands,
                bits_per_band=cfg.lsh_bits_per_band,
                dim=cfg.embedding_dim,
                max_degree=cfg.knn_max_degree,
            )

        similar = w.materialize("similar_edges", _similar)

    if cfg.deduplicate_nodes:
        canonical_map = w.materialize(
            "canonical_map",
            lambda: canonicalize.canonicalize_nodes(
                mentions.select("node_id", "name", "type").dropDuplicates(
                    ["node_id"]
                ),
                threshold=cfg.duplicate_score,
                embedding_dim=cfg.embedding_dim,
                n_blocks=cfg.gemm_blocks,
                blocking=cfg.canonicalize_blocking,
                lsh_bands=cfg.canon_lsh_bands,
                lsh_bits_per_band=cfg.canon_lsh_bits,
            ),
        )
        if workdir:
            # A11 — totalMerged metric (neo4j_db.py:1665-1684)
            counts = canonicalize.merged_counts(canonical_map).collect()[0].asDict()
            counts["resumed"] = bool(
                w.metrics.get("canonical_map", {}).get("resumed")
            )
            w.metrics["canonicalization"] = counts
        triples = w.materialize(
            "triples", lambda: canonicalize.rewrite_triples(triples, canonical_map)
        )
        structural = w.materialize(
            "structural_edges_canon",
            lambda: canonicalize.rewrite_edges(structural, canonical_map),
        )

    def _nodes() -> DataFrame:
        n = materialize.build_nodes(mentions, canonical_map)
        if cfg.node_source_tools:
            if transcripts is None:
                raise ValueError(
                    "node_source_tools=True requires the transcripts table "
                    "(streaming finalize_graph callers must pass one)"
                )
            n = materialize.with_source_tools(
                n, mentions, chunks, transcripts, canonical_map
            )
        return n

    nodes = w.materialize("nodes", _nodes)
    edges = w.materialize(
        "edges", lambda: materialize.build_edges(structural, triples, similar)
    )

    if workdir:
        with open(os.path.join(workdir, f"metrics_{w.run_id}.json"), "w") as f:
            json.dump(w.metrics, f, indent=2, default=str)

    return PipelineResult(
        chunks=chunks,
        linked_chunks=linked,
        triples=triples,
        mentions=mentions,
        edges=edges,
        nodes=nodes,
        canonical_map=canonical_map,
        metrics=w.metrics,
    )
