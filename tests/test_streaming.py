"""Streaming-mode equivalence: availableNow micro-batches produce the
same triples / chunks as the batch pipeline on the same corpus."""

import os

import pytest

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)
from context_aware_rag_spark.streaming.ingest import (
    finalize_ingestion,
    start_streaming_ingest,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(4)
    return rows, spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def test_streaming_matches_batch(spark, corpus, tmp_path_factory):
    rows, df = corpus
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    # several input files -> several micro-batches
    df.repartition(4).write.mode("overwrite").parquet(in_dir)

    q = start_streaming_ingest(spark, in_dir, out_dir, available_now=True)
    q.awaitTermination(240)

    from context_aware_rag_spark.streaming.ingest import read_stage

    stream_triples = {
        (r["conv_id"], r["subj_name"], r["pred"], r["obj_name"])
        for r in read_stage(spark, out_dir, "triples_raw").collect()
    }
    batch = run_pipeline(spark, df, PipelineConfig())
    batch_triples = {
        (r["conv_id"], r["subj_name"], r["pred"], r["obj_name"])
        for r in batch.triples.collect()
    }
    assert stream_triples == batch_triples

    linked = finalize_ingestion(spark, out_dir)
    batch_linked = {
        (r["conv_id"], r["chunk_id"], r["position"], r["content_offset"])
        for r in batch.linked_chunks.select(
            "conv_id", "chunk_id", "position", "content_offset"
        ).collect()
    }
    got = {
        (r["conv_id"], r["chunk_id"], r["position"], r["content_offset"])
        for r in linked.select(
            "conv_id", "chunk_id", "position", "content_offset"
        ).collect()
    }
    assert got == batch_linked


def test_finalize_graph_matches_batch(spark, corpus, tmp_path_factory):
    """The full streaming finalize barrier (linking + structural edges +
    gated KNN SIMILAR + canonicalization + node/edge tables) is
    set-identical to the batch pipeline over the same turns."""
    from context_aware_rag_spark.streaming.ingest import finalize_graph

    _, df = corpus
    in_dir = str(tmp_path_factory.mktemp("fg_in"))
    out_dir = str(tmp_path_factory.mktemp("fg_out"))
    df.repartition(3).write.mode("overwrite").parquet(in_dir)
    q = start_streaming_ingest(spark, in_dir, out_dir, available_now=True)
    q.awaitTermination(240)

    cfg = PipelineConfig(deduplicate_nodes=True, similar_edges=True)
    stream_res = finalize_graph(spark, out_dir, cfg)
    batch_res = run_pipeline(spark, df, cfg)

    def edge_set(res):
        return {
            (r["src"], r["dst"], r["rel_type"], r["conv_id"])
            for r in res.edges.collect()
        }

    def node_set(res):
        return {
            (r["node_id"], r["name"], r["type"], tuple(r["conv_ids"]))
            for r in res.nodes.collect()
        }

    assert edge_set(stream_res) == edge_set(batch_res)
    assert node_set(stream_res) == node_set(batch_res)
    cmap_s = {tuple(r) for r in stream_res.canonical_map.collect()}
    cmap_b = {tuple(r) for r in batch_res.canonical_map.collect()}
    assert cmap_s == cmap_b


def test_microbatch_replay_is_idempotent(spark, corpus, tmp_path_factory):
    """foreachBatch may replay an epoch after a failure; the epoch-keyed
    overwrite write must not duplicate rows."""
    from context_aware_rag_spark.streaming.ingest import (
        ingest_microbatch,
        read_stage,
    )

    _, df = corpus
    out = str(tmp_path_factory.mktemp("replay_out"))
    cfg = PipelineConfig()
    ingest_microbatch(df, cfg, out, epoch_id=0)
    first = read_stage(spark, out, "triples_raw").count()
    ingest_microbatch(df, cfg, out, epoch_id=0)  # replayed epoch
    assert read_stage(spark, out, "triples_raw").count() == first
    ingest_microbatch(df, cfg, out, epoch_id=1)  # genuinely new epoch
    assert read_stage(spark, out, "triples_raw").count() == 2 * first
