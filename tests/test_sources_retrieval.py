"""S2 JSON source, S3 SRT source, EP3 retrieval path tests."""

import json

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.operators import retrieval, similarity
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.docs_json import read_dc_chunks, read_srt
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)


def test_read_dc_chunks(spark, tmp_path):
    rows = [
        {"streamId": "cam1", "chunkIdx": i, "file": "a.mp4",
         "start_pts": i * 10**9, "end_pts": (i + 1) * 10**9,
         "is_first": i == 0, "is_last": i == 2,
         "text": f"Alice met Bob in chunk {i}."}
        for i in range(3)
    ]
    p = tmp_path / "dc.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_dc_chunks(spark, str(p))
    got = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in df.collect())
    assert len(got) == 3
    assert got[0] == ("cam1", 0, "Alice met Bob in chunk 0.")
    assert df.schema["ts"].dataType.typeName() == "timestamp"


def test_read_srt(spark, tmp_path):
    srt = (
        "1\n00:00:01,000 --> 00:00:04,500\nHello there\n\n"
        "2\n00:01:00,250 --> 00:01:02,000\nSecond line\nwith continuation\n\n"
    )
    p = tmp_path / "sub.srt"
    p.write_text(srt)
    rows = {r["seq"]: r for r in read_srt(spark, str(p)).collect()}
    assert rows[1]["start_s"] == 1.0 and rows[1]["end_s"] == 4.5
    assert rows[1]["text"] == "Hello there"
    assert rows[2]["start_s"] == 60.25
    assert "continuation" in rows[2]["text"]


@pytest.fixture(scope="module")
def kg(spark):
    rows = generate_rows(6)
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    return run_pipeline(spark, df, PipelineConfig())


def test_graph_vector_search(spark, kg):
    chunks = kg.chunks.dropDuplicates(["chunk_id"]).select("chunk_id", "text")
    with_emb = similarity.with_text_embeddings(chunks)
    # query with an actual chunk's embedding -> that chunk must rank #1
    sample = with_emb.limit(1).collect()[0]
    hits = retrieval.topk_chunks_for_query(with_emb, list(sample["embedding"]), k=5)
    top = hits.orderBy(F.desc("chunk_score")).first()
    assert top["chunk_id"] == sample["chunk_id"]
    assert top["chunk_score"] == pytest.approx(1.0, abs=1e-4)

    ctx = retrieval.graph_vector_search(
        with_emb, kg.edges, list(sample["embedding"]), k=5, hops=2
    )
    rows = ctx.collect()
    assert rows, "expansion returned no context edges"
    assert {r["hop"] for r in rows} <= {1, 2}
    structural = {"PART_OF", "FIRST_CHUNK", "NEXT_CHUNK", "HAS_ENTITY", "SIMILAR"}
    assert all(r["rel_type"] not in structural for r in rows)


def test_band_gated_expansion(spark, kg):
    """With a similarity band vs the query, every expansion target's
    entity-embedding cosine to the query must lie inside the band."""
    import numpy as np

    from context_aware_rag_spark.functions.embedder import entity_embed
    from context_aware_rag_spark.operators.retrieval import expand_hops

    seeds = kg.nodes.select("node_id").limit(5)
    nodes = kg.nodes.select("node_id", "name")
    qvec = [float(x) for x in entity_embed(["Alice"])[0]]
    gated = expand_hops(
        kg.edges, seeds, hops=2, nodes=nodes, query_vec=qvec, band=(0.3, 0.9)
    )
    ungated = expand_hops(kg.edges, seeds, hops=2)
    g_rows, u_rows = gated.collect(), ungated.collect()
    assert len(g_rows) < len(u_rows), "band gate filtered nothing"
    name_of = {r["node_id"]: r["name"] for r in nodes.collect()}
    q = np.array(qvec)
    q = q / np.linalg.norm(q)
    for r in g_rows:
        v = entity_embed([name_of[r["dst"]]])[0]
        cos = float(q @ v)
        assert 0.3 <= cos < 0.9, (name_of[r["dst"]], cos)


def test_entities_for_chunks_ranking(spark, kg):
    some_chunks = kg.mentions.select("chunk_id").distinct().limit(10)
    hits = some_chunks.withColumn("chunk_score", F.lit(1.0))
    ents = retrieval.entities_for_chunks(kg.edges, hits, top_entities=5).collect()
    assert 0 < len(ents) <= 5
    counts = [r["num_chunks"] for r in ents]
    assert counts == sorted(counts, reverse=True)
