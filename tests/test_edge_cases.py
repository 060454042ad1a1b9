"""Degenerate-input hardening: empty corpora, single rows, and unicode
through every pipeline stage — the failure class that only shows up in
production partitions."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)


def test_pipeline_on_empty_corpus(spark, empty):
    res = run_pipeline(spark, empty, PipelineConfig())
    assert res.triples.count() == 0
    assert res.edges.count() == 0
    assert res.nodes.count() == 0


def test_pipeline_dedup_and_similar_on_empty(spark, empty):
    res = run_pipeline(
        spark, empty,
        PipelineConfig(deduplicate_nodes=True, similar_edges=True),
    )
    assert res.edges.count() == 0
    assert res.canonical_map.count() == 0


def test_pipeline_single_turn(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [("convX", 0, "user", "Alice met Bob at the office.", None,
          datetime(2024, 1, 1))],
        schema=TRANSCRIPT_SCHEMA,
    )
    res = run_pipeline(spark, df, PipelineConfig())
    assert res.chunks.count() == 1
    assert res.triples.count() >= 1
    linked = res.linked_chunks.collect()
    assert linked[0]["position"] == 1 and linked[0]["prev_chunk_id"] is None


def test_pipeline_unicode_and_only_empty_docs(spark):
    from datetime import datetime

    rows = [
        ("convU", 0, "user", ".", None, datetime(2024, 1, 1)),        # dropped
        ("convU", 1, "user", "héllo wörld — Alice visited Tokyo 日本語", None,
         datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    res = run_pipeline(spark, df, PipelineConfig())
    assert res.chunks.count() == 1  # "." filtered, unicode chunk survives
    text = res.chunks.collect()[0]["text"]
    assert "héllo" in text and "日本語" in text


def test_dedup_operators_on_empty(spark):
    from context_aware_rag_spark.operators import dedup

    df = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.exact_duplicates(df).count() == 0
    assert dedup.minhash_dedup(df).count() == 0
    assert dedup.simhash_near_dups(df).count() == 0
    assert dedup.ngram_jaccard_pairs(df).count() == 0


def test_global_index_on_empty(spark):
    from context_aware_rag_spark.operators.skew import global_index

    df = spark.createDataFrame([], "ts long, event_id string")
    assert global_index(df, ["ts", "event_id"]).count() == 0


def test_delete_on_empty_graph(spark):
    from context_aware_rag_spark.operators.delete import delete_documents

    nodes = spark.createDataFrame([], "node_id string, node_type string")
    edges = spark.createDataFrame([], "src string, dst string, rel_type string")
    docs = spark.createDataFrame([("d1",)], ["node_id"])
    res = delete_documents(nodes, edges, docs)
    assert res.nodes.count() == 0 and res.edges.count() == 0


def test_knn_on_single_item(spark):
    from context_aware_rag_spark.operators.similarity import (
        knn_similar_edges,
        with_text_embeddings,
    )

    df = with_text_embeddings(
        spark.createDataFrame([("c1", "only one chunk")], ["chunk_id", "text"])
    )
    assert knn_similar_edges(df).count() == 0


def test_assemble_context_no_entities(spark):
    """A retrieved doc whose chunks have no HAS_ENTITY edges still
    assembles (empty entity/relationship sections)."""
    from context_aware_rag_spark.operators.retrieval import assemble_context

    chunks = spark.createDataFrame(
        [("ck", "doc1", "bare text", [1.0, 0.0])],
        ["chunk_id", "conv_id", "text", "embedding"],
    )
    edges = spark.createDataFrame([], "src string, dst string, rel_type string")
    nodes = spark.createDataFrame([], "node_id string, name string, type string")
    out = assemble_context(chunks, edges, nodes, [1.0, 0.0], k=1, band=None).collect()
    assert len(out) == 1
    assert out[0]["text"] == (
        "Text Content:\nbare text\n----\nEntities:\n\n----\nRelationships:\n"
    )
    assert out[0]["n_entities"] == 0 and out[0]["n_rels"] == 0


def test_streaming_microbatch_all_dropped(spark, tmp_path_factory):
    """A micro-batch consisting solely of empty-doc bait must write
    empty stage tables, not crash (same Arrow dtype hazard as chunking)."""
    from datetime import datetime

    from context_aware_rag_spark.streaming.ingest import (
        ingest_microbatch,
        read_stage,
    )

    out = str(tmp_path_factory.mktemp("dropped_out"))
    rows = [("convD", i, "user", ".", None, datetime(2024, 1, 1)) for i in range(5)]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    ingest_microbatch(df, PipelineConfig(), out, epoch_id=0)
    assert read_stage(spark, out, "chunks").count() == 0
    assert read_stage(spark, out, "triples_raw").count() == 0

    # and a genuinely empty micro-batch (stream with no new files)
    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    ingest_microbatch(empty, PipelineConfig(), out, epoch_id=1)
    assert read_stage(spark, out, "chunks").count() == 0


def test_expand_hops_zero(spark):
    from context_aware_rag_spark.operators.retrieval import expand_hops

    edges = spark.createDataFrame(
        [("a", "b", "knows")], "src string, dst string, rel_type string"
    )
    seeds = spark.createDataFrame([("a",)], ["node_id"])
    out = expand_hops(edges, seeds, hops=0)
    assert out.count() == 0
    assert out.columns == ["src", "dst", "rel_type", "hop"]


def test_finalize_graph_requires_transcripts_for_tools(spark, tmp_path_factory):
    from datetime import datetime

    from context_aware_rag_spark.streaming.ingest import (
        finalize_graph,
        ingest_microbatch,
    )

    out = str(tmp_path_factory.mktemp("fg_tools"))
    rows = [("convT", 0, "user", "Alice met Bob.", "search",
             datetime(2024, 1, 1))]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    ingest_microbatch(df, PipelineConfig(), out, epoch_id=0)
    with pytest.raises(ValueError, match="node_source_tools"):
        finalize_graph(spark, out, PipelineConfig(node_source_tools=True))
    # passing the source table works
    res = finalize_graph(
        spark, out, PipelineConfig(node_source_tools=True), transcripts=df
    )
    tools = {t for r in res.nodes.collect() for t in r["source_tools"]}
    assert tools == {"search"}
