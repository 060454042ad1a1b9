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
