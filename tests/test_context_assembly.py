"""EP3 context assembly + contextual compression goldens.

The hand fixture makes every stage hand-computable: 4-dim unit chunk
embeddings fix the vector top-k, the KG is three entities and two
predicate edges, and band gating is disabled (band=None) so the
expected assembled text is written out literally. Compression is
checked against the EmbeddingsFilter rule computed independently with
the same hash embedder.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.functions.embedder import hash_embed
from context_aware_rag_spark.functions.splitter import split_text
from context_aware_rag_spark.operators.retrieval import (
    assemble_context,
    compress_context,
)


@pytest.fixture(scope="module")
def tiny_kg(spark):
    chunks = spark.createDataFrame(
        [
            ("ck_a", "doc1", "alpha text", [1.0, 0.0, 0.0, 0.0]),
            ("ck_b", "doc2", "beta text", [0.8, 0.6, 0.0, 0.0]),
            ("ck_c", "doc1", "gamma text", [0.0, 0.0, 1.0, 0.0]),
        ],
        ["chunk_id", "conv_id", "text", "embedding"],
    )
    edges = spark.createDataFrame(
        [
            ("ck_a", "e1", "HAS_ENTITY", "doc1"),
            ("ck_b", "e2", "HAS_ENTITY", "doc2"),
            ("ck_c", "e3", "HAS_ENTITY", "doc1"),
            ("e1", "e3", "knows", "doc1"),
            ("e2", "e1", "works_with", "doc2"),
            ("ck_a", "doc1", "PART_OF", "doc1"),
        ],
        ["src", "dst", "rel_type", "conv_id"],
    )
    nodes = spark.createDataFrame(
        [("e1", "Ada", "Person"), ("e2", "Bob", "Person"),
         ("e3", "Lab", "Location")],
        ["node_id", "name", "type"],
    )
    return chunks, edges, nodes


def test_assembled_text_golden(tiny_kg):
    chunks, edges, nodes = tiny_kg
    # query [1,0,0,0]: cos(ck_a)=1.0, cos(ck_b)=0.8, cos(ck_c)=0.0
    # k=2 retrieves ck_a (doc1) and ck_b (doc2)
    out = {
        r["source"]: r
        for r in assemble_context(
            chunks, edges, nodes, [1.0, 0.0, 0.0, 0.0], k=2, hops=1, band=None
        ).collect()
    }
    assert set(out) == {"doc1", "doc2"}

    d1 = out["doc1"]
    # doc1: hit chunk ck_a -> entity e1; 1 hop: e1-knows->e3
    assert d1["text"] == (
        "Text Content:\nalpha text"
        "\n----\nEntities:\nLocation:Lab\nPerson:Ada"
        "\n----\nRelationships:\nPerson:Ada knows Location:Lab"
    )
    assert d1["score"] == 1.0
    assert d1["n_chunks"] == 1 and d1["n_entities"] == 2 and d1["n_rels"] == 1
    assert d1["length"] == len(d1["text"])

    d2 = out["doc2"]
    # doc2: hit chunk ck_b -> entity e2; 1 hop: e2-works_with->e1
    assert d2["text"] == (
        "Text Content:\nbeta text"
        "\n----\nEntities:\nPerson:Ada\nPerson:Bob"
        "\n----\nRelationships:\nPerson:Bob works_with Person:Ada"
    )
    assert d2["score"] == 0.8


def test_two_hop_and_chunk_ordering(tiny_kg, spark):
    chunks, edges, nodes = tiny_kg
    # query [0.6,0.8,0,0]: ck_a=0.6, ck_b=0.96, ck_c=0 -> k=3 retrieves
    # all; doc1 gets ck_a AND ck_c, ordered by score desc (ck_a first)
    out = {
        r["source"]: r
        for r in assemble_context(
            chunks, edges, nodes, [0.6, 0.8, 0.0, 0.0], k=3, hops=2, band=None
        ).collect()
    }
    d1 = out["doc1"]
    assert d1["text"].startswith("Text Content:\nalpha text\n----\ngamma text")
    # 2 hops from {e1, e3}: e1->e3 (hop1); frontier {e3} has no out-edges
    assert d1["n_rels"] == 1
    # doc2 at 2 hops: e2->e1 (hop1), then e1->e3 (hop2)
    assert out["doc2"]["n_rels"] == 2
    assert "Person:Ada knows Location:Lab" in out["doc2"]["text"]


def test_compression_matches_embedding_filter_rule(spark):
    # three paragraphs; the query IS paragraph two, so its piece must
    # survive; expected kept set computed independently via hash_embed
    paras = [
        "the first paragraph talks about nothing in particular at all",
        "orion borealis navigates the winter sky charts",
        "unrelated third block of filler content for the splitter",
    ]
    text = "\n\n".join(paras)
    ctx = spark.createDataFrame([("doc1", text)], ["source", "text"])
    qvec = hash_embed(["orion borealis navigates the winter sky charts"], dim=64)[0]

    pieces = split_text(text, chunk_size=60, chunk_overlap=10,
                        separators=["Text:", "\n\n", "\n", "\n-"])
    emb = hash_embed(pieces, dim=64)
    q = np.asarray(qvec) / np.linalg.norm(qvec)
    sims = emb @ q  # hash_embed returns unit vectors
    expected = [p for p, s in zip(pieces, sims) if s >= 0.10]
    assert any("orion" in p for p in expected)

    got = compress_context(
        ctx, [float(x) for x in qvec], similarity_threshold=0.10,
        chunk_size=60, chunk_overlap=10,
    ).collect()
    assert len(got) == 1
    row = got[0]
    assert row["compressed_text"] == "\n\n".join(expected)
    assert row["n_pieces_kept"] == len(expected)
    assert row["compressed_length"] <= len(text) + 2 * len(pieces)


def test_compression_drops_everything_below_threshold(spark):
    ctx = spark.createDataFrame(
        [("doc1", "aaa bbb ccc"), ("doc2", "ddd eee fff")], ["source", "text"]
    )
    qvec = hash_embed(["zzz yyy xxx"], dim=64)[0]
    out = compress_context(ctx, [float(x) for x in qvec],
                           similarity_threshold=0.999)
    # groupBy over zero kept pieces -> empty result (reference returns
    # no compressed docs when the filter removes all splits)
    assert out.count() == 0


def test_pipeline_ep3_deterministic(spark):
    """End-to-end over the synthetic corpus: assembled rows are stable
    across two runs (the driver hash relies on this)."""
    from context_aware_rag_spark.plans.entry_queries import EXTRA_QUERIES

    a = EXTRA_QUERIES["ep3_graph_vector_search"](spark, "/root/testdata/sf0.001")
    b = EXTRA_QUERIES["ep3_graph_vector_search"](spark, "/root/testdata/sf0.001")
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    assert len(ra) > 0
    for r in ra:
        assert r[1].startswith("Text Content:\n")
