"""Every PipelineConfig knob must be live: timestamp_prefix,
enforce_allowed_nodes, similar_edges, shuffle_partitions."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.oracle.reference_oracle import run_oracle, triple_prf
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(4)
    return rows, spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


def test_timestamp_prefix_parity(spark, corpus):
    rows, df = corpus
    cfg = PipelineConfig(timestamp_prefix=True)
    res = run_pipeline(spark, df, cfg)
    oracle = run_oracle(rows, timestamp_prefix=True)
    got = {(r["conv_id"], r["chunk_id"]) for r in res.chunks.collect()}
    golden = {(c["conv_id"], c["chunk_id"]) for c in oracle.chunks}
    assert got == golden  # prefix participates in the hashed chunk text
    sample = res.chunks.filter(F.col("text").startswith("<")).first()
    assert sample is not None and sample["text"].startswith("<")
    # and it differs from the unprefixed run
    plain = {(r["conv_id"], r["chunk_id"])
             for r in run_pipeline(spark, df, PipelineConfig()).chunks.collect()}
    assert got != plain


def test_enforce_allowed_nodes(spark, corpus):
    rows, df = corpus
    allowed = ["Person", "Location"]
    cfg = PipelineConfig(enforce_allowed_nodes=True, allowed_nodes=allowed)
    res = run_pipeline(spark, df, cfg)
    types = {
        t for r in res.triples.select("subj_type", "obj_type").collect()
        for t in (r["subj_type"], r["obj_type"])
    }
    assert types and types <= set(allowed)
    oracle = run_oracle(rows, allowed_nodes=allowed)
    produced = [r.asDict() for r in res.triples.collect()]
    _, _, f1 = triple_prf(oracle.triples, produced)
    assert f1 == pytest.approx(1.0)


def test_similar_edges_emitted(spark, corpus):
    _, df = corpus
    cfg = PipelineConfig(similar_edges=True, knn_min_score=0.2, knn_top_k=3)
    res = run_pipeline(spark, df, cfg)
    sim = res.edges.filter(F.col("rel_type") == "SIMILAR")
    rows = sim.collect()
    assert rows, "SIMILAR edges missing"
    chunk_ids = {r["chunk_id"] for r in res.chunks.select("chunk_id").collect()}
    assert all(r["src"] in chunk_ids and r["dst"] in chunk_ids for r in rows)
    # top-k bound holds per source
    per_src = sim.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert per_src <= 3


def test_shuffle_partitions_applied(spark, corpus):
    _, df = corpus
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        run_pipeline(spark, df, PipelineConfig(shuffle_partitions=7))
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
