"""Per-document delete + orphan cleanup (reference
QUERY_TO_DELETE_UUID_GRAPH, constants.py:406-443).

Hand fixture pins the orphan rule (an entity/summary dies iff its last
surviving containment link dies); the pipeline integration test deletes
one conversation from a real KG build and checks set-level invariants.
"""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.operators.delete import (
    delete_conversations,
    delete_documents,
)
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)


@pytest.fixture(scope="module")
def fixture_kg(spark):
    # D1: chunks C1, C2.  D2: chunk C3.
    # E1 linked from C1 and C3 (shared) — survives deleting D1.
    # E2 linked from C2 only — orphaned by deleting D1.
    # S1 in-summary from C2 only — orphaned.  S2 from C3 — survives.
    nodes = spark.createDataFrame(
        [("D1", "Document"), ("D2", "Document"),
         ("C1", "Chunk"), ("C2", "Chunk"), ("C3", "Chunk"),
         ("E1", "Entity"), ("E2", "Entity"),
         ("S1", "Summary"), ("S2", "Summary")],
        ["node_id", "node_type"],
    )
    edges = spark.createDataFrame(
        [("C1", "D1", "PART_OF"), ("C2", "D1", "PART_OF"), ("C3", "D2", "PART_OF"),
         ("D1", "C1", "FIRST_CHUNK"), ("C1", "C2", "NEXT_CHUNK"),
         ("D2", "C3", "FIRST_CHUNK"),
         ("C1", "E1", "HAS_ENTITY"), ("C3", "E1", "HAS_ENTITY"),
         ("C2", "E2", "HAS_ENTITY"),
         ("C2", "S1", "IN_SUMMARY"), ("C3", "S2", "IN_SUMMARY"),
         ("E1", "E2", "KNOWS")],
        ["src", "dst", "rel_type"],
    )
    return nodes, edges


def test_orphan_rule(spark, fixture_kg):
    nodes, edges = fixture_kg
    docs = spark.createDataFrame([("D1",)], ["node_id"])
    res = delete_documents(nodes, edges, docs)
    deleted = {r["node_id"] for r in res.deleted_node_ids.collect()}
    assert deleted == {"D1", "C1", "C2", "E2", "S1"}
    surviving = {r["node_id"] for r in res.nodes.collect()}
    assert surviving == {"D2", "C3", "E1", "S2"}


def test_detach_delete_edges(spark, fixture_kg):
    nodes, edges = fixture_kg
    docs = spark.createDataFrame([("D1",)], ["node_id"])
    res = delete_documents(nodes, edges, docs)
    left = {(r["src"], r["dst"], r["rel_type"]) for r in res.edges.collect()}
    # every edge touching D1/C1/C2/E2/S1 is gone — incl. the KNOWS
    # predicate edge whose dst (E2) was orphaned
    assert left == {
        ("C3", "D2", "PART_OF"),
        ("D2", "C3", "FIRST_CHUNK"),
        ("C3", "E1", "HAS_ENTITY"),
        ("C3", "S2", "IN_SUMMARY"),
    }
    # column order preserved for downstream writers
    assert res.edges.columns == ["src", "dst", "rel_type"]


def test_delete_nothing_is_identity(spark, fixture_kg):
    nodes, edges = fixture_kg
    docs = spark.createDataFrame([("NOPE",)], ["node_id"])
    res = delete_documents(nodes, edges, docs)
    assert res.nodes.count() == nodes.count() - 0
    assert res.edges.count() == edges.count()
    # the bogus doc id itself is "deleted" (it matches nothing)
    assert {r["node_id"] for r in res.deleted_node_ids.collect()} == {"NOPE"}


def test_pipeline_conversation_delete(spark):
    rows = generate_rows(6)
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    res = run_pipeline(spark, df, PipelineConfig())
    target = "conv00002"
    out = delete_conversations(res.nodes, res.edges, [target])

    # 1. no surviving edge touches the conv's doc node or its chunks
    del_ids = {r["node_id"] for r in out.deleted_node_ids.collect()}
    assert target in del_ids
    for e in out.edges.collect():
        assert e["src"] not in del_ids and e["dst"] not in del_ids

    # 2. entities mentioned ONLY in the deleted conv are gone; entities
    #    also mentioned elsewhere survive
    ment = res.mentions.select("node_id", "conv_id").distinct().collect()
    only_target = {
        n for n in {m["node_id"] for m in ment}
        if {m["conv_id"] for m in ment if m["node_id"] == n} == {target}
    }
    shared = {
        n for n in {m["node_id"] for m in ment}
        if target in {m["conv_id"] for m in ment if m["node_id"] == n}
        and len({m["conv_id"] for m in ment if m["node_id"] == n}) > 1
    }
    surviving = {r["node_id"] for r in out.nodes.collect()}
    assert only_target.isdisjoint(surviving)
    assert shared <= surviving

    # 3. other conversations' edge sets are untouched
    before = {
        (e["src"], e["dst"], e["rel_type"])
        for e in res.edges.filter(F.col("conv_id") != target).collect()
        if e["rel_type"] in ("PART_OF", "FIRST_CHUNK", "NEXT_CHUNK")
    }
    after = {
        (e["src"], e["dst"], e["rel_type"])
        for e in out.edges.collect()
        if e["rel_type"] in ("PART_OF", "FIRST_CHUNK", "NEXT_CHUNK")
    }
    assert before == after
