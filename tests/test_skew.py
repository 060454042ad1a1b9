"""Salted two-phase linking must be row-identical to the single-window
version, including on the 50x-long conversation in the corpus."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.operators.chunking import chunk_transcripts
from context_aware_rag_spark.operators.linking import link_chunks
from context_aware_rag_spark.operators.skew import link_chunks_salted
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)

COLS = ["conv_id", "chunk_id", "position", "content_offset", "prev_chunk_id", "is_first"]


@pytest.fixture(scope="module")
def chunks(spark):
    rows = generate_rows(10)  # includes conv 7, the 50x-long one
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    return chunk_transcripts(df, PipelineConfig()).localCheckpoint()


def _key(rows):
    return sorted(tuple(r[c] for c in COLS) for r in rows)


@pytest.mark.parametrize("block_turns", [7, 256, 8192])
def test_salted_equals_plain(spark, chunks, block_turns):
    plain = _key(link_chunks(chunks).select(*COLS).collect())
    salted = _key(
        link_chunks_salted(chunks, block_turns=block_turns).select(*COLS).collect()
    )
    assert salted == plain


def test_long_conv_present(chunks):
    per_conv = chunks.groupBy("conv_id").count().collect()
    counts = {r["conv_id"]: r["count"] for r in per_conv}
    assert max(counts.values()) > 15 * (sorted(counts.values())[len(counts) // 2])
