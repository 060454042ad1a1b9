"""source_tools property merge — the camera-list analog
(apoc.refactor.mergeNodes {camera_id: "combine"}, neo4j_db.py:1674).

The expected per-canonical-node tool set is recomputed independently in
Python from (mentions, chunks, transcripts, canonical_map) and compared
set-for-set, on both the plain and the deduplicated pipeline.
"""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(8)
    return rows, spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def _expected_tools(res, rows, canonical):
    tool_by_turn = {(r[0], r[1]): r[4] for r in rows if r[4] is not None}
    # a chunk_id can map to SEVERAL turns (same utterance recurring in a
    # conversation) — accumulate tools over all of them
    chunk_turns: dict[str, set] = {}
    for c in res.chunks.select("chunk_id", "conv_id", "turn_idx").collect():
        chunk_turns.setdefault(c["chunk_id"], set()).add(
            (c["conv_id"], c["turn_idx"])
        )
    cmap = {}
    if canonical is not None:
        cmap = {r["node_id"]: r["canon_id"] for r in canonical.collect()}
    want: dict[str, set] = {}
    for m in res.mentions.select("node_id", "chunk_id").collect():
        node = cmap.get(m["node_id"], m["node_id"])
        want.setdefault(node, set())
        for key in chunk_turns.get(m["chunk_id"], ()):
            tool = tool_by_turn.get(key)
            if tool is not None:
                want[node].add(tool)
    return want


@pytest.mark.parametrize("dedup", [False, True])
def test_source_tools_union(spark, corpus, dedup):
    rows, df = corpus
    cfg = PipelineConfig(deduplicate_nodes=dedup, node_source_tools=True)
    res = run_pipeline(spark, df, cfg)
    got = {
        r["node_id"]: set(r["source_tools"])
        for r in res.nodes.select("node_id", "source_tools").collect()
    }
    want = _expected_tools(res, rows, res.canonical_map)
    assert got == {k: want.get(k, set()) for k in got}
    # the corpus must actually exercise a non-trivial union somewhere
    assert any(len(v) >= 2 for v in got.values())


def test_union_across_merged_aliases(spark, corpus):
    """Deduplicated nodes' tool sets are supersets of (or equal to) the
    union of their member aliases' sets from the plain run."""
    _, df = corpus
    plain = run_pipeline(spark, df, PipelineConfig(node_source_tools=True))
    deduped = run_pipeline(
        spark, df, PipelineConfig(deduplicate_nodes=True, node_source_tools=True)
    )
    cmap = {
        r["node_id"]: r["canon_id"] for r in deduped.canonical_map.collect()
    }
    plain_tools = {
        r["node_id"]: set(r["source_tools"])
        for r in plain.nodes.select("node_id", "source_tools").collect()
    }
    merged_want: dict[str, set] = {}
    for node, tools in plain_tools.items():
        merged_want.setdefault(cmap.get(node, node), set()).update(tools)
    got = {
        r["node_id"]: set(r["source_tools"])
        for r in deduped.nodes.select("node_id", "source_tools").collect()
    }
    assert got == merged_want
