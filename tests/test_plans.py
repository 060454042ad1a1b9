"""Physical-plan regression tests: the optimizations PLANS.md claims
must stay in the executed plan (pushdown, pruning, shuffle counts)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_scan_pushdown_and_pruning(spark):
    from context_aware_rag_spark.plans.entry_queries import QUERIES

    plan = _plan(QUERIES["tpch_q1"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning reaches the scan: comment columns never read
    assert "l_comment" not in plan.split("ReadSchema")[-1]


def test_f3_time_filter_pushdown(spark):
    from context_aware_rag_spark.plans.entry_queries import QUERIES

    plan = _plan(QUERIES["f3_time_range_filter"](spark, SF_DIR))
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan


def test_kg_triples_has_no_shuffle(spark):
    """PLANS.md §1: chunk->extract->clean->hash at batch_size=1 is one
    fused map-only stage — zero exchanges."""
    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.operators.chunking import chunk_transcripts
    from context_aware_rag_spark.operators.extraction import extract_stage
    from context_aware_rag_spark.sources.transcripts import generate_transcripts

    tr = generate_transcripts(spark, 4)
    chunks = chunk_transcripts(tr, PipelineConfig())
    triples, _ = extract_stage(chunks, PipelineConfig())
    assert "Exchange" not in _plan(triples)


def test_link_chunks_single_window_exchange(spark):
    """PLANS.md §2: row_number + lag + running sum share ONE window spec
    -> exactly one Exchange hashpartitioning(conv_id...)."""
    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.operators.chunking import chunk_transcripts
    from context_aware_rag_spark.operators.linking import link_chunks
    from context_aware_rag_spark.sources.transcripts import generate_transcripts

    chunks = chunk_transcripts(generate_transcripts(spark, 4), PipelineConfig())
    plan = _plan(link_chunks(chunks))
    assert plan.count("Exchange hashpartitioning(conv_id") == 1
    assert plan.count("Window") == 1


def test_documents_projection_pruned(spark):
    """A 2-column projection must not scan all document columns."""
    from context_aware_rag_spark.operators.textmetrics import token_counts

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(token_counts(docs))
    read_schema = plan.split("ReadSchema:")[-1]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "source" not in read_schema  # unused metadata column pruned


def _formatted_plan(spark, df) -> str:
    jvm = spark.sparkContext._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _band_exchanges(plan: str) -> list:
    return [
        blk for blk in plan.split("\n\n")
        if ") Exchange" in blk and "hashpartitioning(" in blk and "band" in blk
    ]


def _exec_nodes(plan):
    """Walk a physical SparkPlan tree via py4j (children(), a Scala
    Seq). InMemoryTableScan is a leaf here, so a cached subtree's own
    exchanges are naturally excluded — exactly the point."""
    out = [plan]
    ch = plan.children()
    for i in range(ch.length()):
        out.extend(_exec_nodes(ch.apply(i)))
    return out


def test_pagerank_step_single_edge_shuffle(spark):
    """graph.pagerank pins the edge list on src via persist() (NOT
    localCheckpoint — AQE drops checkpoint partitioning); one iteration
    must then contain ZERO shuffles of the edge list itself and exactly
    ONE edge-count-sized exchange: the narrow (dst, share) combine.
    Asserted with broadcast joins disabled (the 100 TB shape, where
    neither side fits in memory) and AQE off for the step query so the
    executed plan is a plain walkable tree."""
    from context_aware_rag_spark.operators import graph

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 1) % 40}") for i in range(120)],
        ["src", "dst"],
    )
    pairs = graph._pin_pairs(edges, "src", "dst", deduped=False)
    state = graph._pagerank_state(pairs, "src", "dst")
    overrides = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        step = graph._pagerank_step(
            state, pairs, "src", "dst", 40, 150_000, 85
        )
        shuffles = [
            n.outputPartitioning().toString()
            for n in _exec_nodes(step._jdf.queryExecution().executedPlan())
            if n.getClass().getSimpleName() == "ShuffleExchangeExec"
        ]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        pairs.unpersist()
    on_src = [s for s in shuffles if "src" in s]
    on_dst = [s for s in shuffles if "dst" in s]
    assert not on_src, f"edge list re-shuffled: {shuffles}"
    assert len(on_dst) == 1, f"expected one (dst, share) combine: {shuffles}"
    # everything else is node-sized (the rank vector) or scalar (the
    # dangling-mass agg) — never the edge list
    assert len(shuffles) <= 4, shuffles


def test_lsh_banded_exchanges_exclude_embeddings(spark):
    """Narrow-shuffle discipline (VERDICT r2 item 4, generalized): every
    LSH-banded self-join — entity similarity pairs AND the chunk-KNN
    candidate join — must shuffle only (id[, type], band, band_hash);
    the dim-long embedding re-joins by id after pair dedup."""
    from context_aware_rag_spark.operators.similarity import (
        knn_similar_edges,
        similarity_pairs,
        with_entity_embeddings,
        with_text_embeddings,
    )

    nodes = spark.createDataFrame(
        [(f"n{i}", f"entity {i % 5}", "Person") for i in range(30)],
        ["node_id", "name", "type"],
    )
    pairs = similarity_pairs(
        with_entity_embeddings(nodes), threshold=0.9, blocking="lsh"
    )
    blocks = _band_exchanges(_formatted_plan(spark, pairs))
    assert blocks, "expected banded exchanges in the similarity_pairs plan"
    for blk in blocks:
        assert "embedding" not in blk, blk

    chunks = spark.createDataFrame(
        [(f"c{i}", f"chunk text {i % 7}") for i in range(30)],
        ["chunk_id", "text"],
    )
    ranked = knn_similar_edges(
        with_text_embeddings(chunks), max_degree=None
    )
    blocks = _band_exchanges(_formatted_plan(spark, ranked))
    assert blocks, "expected banded exchanges in the knn plan"
    for blk in blocks:
        assert "embedding" not in blk, blk


def test_topic_chunking_strategy_plugs_into_pipeline(spark):
    """cfg.chunking='topic' swaps the front-end under the same stage
    contract: chunk ids equal segmentation.topic_chunks' ids, the
    downstream stages run unchanged, and unknown strategies raise."""
    import pytest as _pytest

    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.operators import segmentation
    from context_aware_rag_spark.plans.pipeline import run_pipeline
    from context_aware_rag_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, 6)
    res = run_pipeline(spark, df, PipelineConfig(chunking="topic"))
    got = sorted(r.chunk_id for r in res.chunks.select("chunk_id").collect())
    want = sorted(
        r.chunk_id for r in segmentation.topic_chunks(df).collect()
    )
    assert got == want
    assert res.triples.count() > 0
    assert res.nodes.count() > 0
    # chunk schema contract: same columns as the chars front-end
    chars = run_pipeline(spark, df, PipelineConfig())
    assert set(res.chunks.columns) == set(chars.chunks.columns)
    with _pytest.raises(ValueError, match="chunking strategy"):
        run_pipeline(spark, df, PipelineConfig(chunking="sentences"))
