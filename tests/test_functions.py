"""Unit tests for extractor, embedder, hashing pure functions."""

import hashlib

import numpy as np

from context_aware_rag_spark.functions import hashing
from context_aware_rag_spark.functions.embedder import entity_embed, hash_embed
from context_aware_rag_spark.functions.extractor import (
    ENTITY_GROUPS,
    rule_based_extract,
)


def test_extract_simple_triple():
    out = rule_based_extract("Alice drives Red Truck.")
    assert out == [("Alice", "Person", "DRIVES", "Red Truck", "Vehicle")]


def test_extract_multi_sentence_and_alias():
    out = rule_based_extract("Bob Smith works at ACME Corp. Carol visited Tokyo.")
    assert ("Bob Smith", "Person", "WORKS_AT", "Acme Corp", "Object") in out
    assert ("Carol", "Person", "VISITED", "Tokyo", "Location") in out


def test_extract_longest_alias_wins():
    out = rule_based_extract("Alice Johnson met Bob.")
    assert out[0].head == "Alice Johnson"


def test_extract_no_relation_keyword():
    assert rule_based_extract("Alice and Bob.") == []


def test_extract_glitch_bait_backticks():
    out = rule_based_extract("Alice met Bob ~glitch~.")
    assert out[0].head_type == "`Person`"


def test_extract_blank_bait():
    out = rule_based_extract("Alice met Bob ~blank~.")
    tails = [t.tail for t in out]
    assert "  " in tails  # the blank-tail bait triple is present pre-cleaning


def test_chunk_id_byte_parity():
    text, conv = "some chunk text", "conv00001"
    assert hashing.chunk_id_py(text, conv) == hashlib.sha1(
        (text + conv).encode()
    ).hexdigest()


def test_entity_id_reference_formula():
    # base.py:186: sha1(f"{description}_{node_type}_{old_id}_{uuid}")
    got = hashing.entity_id_py("Alice", "Person", "conv1")
    assert got == hashlib.sha1("_Person_Alice_conv1".encode()).hexdigest()
    # blank type falls back to "Entity" (base.py:184)
    got2 = hashing.entity_id_py("Alice", "", "conv1")
    assert got2 == hashlib.sha1("_Entity_Alice_conv1".encode()).hexdigest()


def test_hash_embed_deterministic_unit():
    a = hash_embed(["hello", "world"])
    b = hash_embed(["hello", "world"])
    np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-6)
    assert abs(float(a[0] @ a[1])) < 0.5  # distinct texts not similar


def test_entity_embed_alias_geometry():
    # within-group cosine > 0.9; cross-group < 0.8 (FIXTURES.md §4)
    for key, (etype, aliases) in ENTITY_GROUPS.items():
        vecs = entity_embed(aliases)
        for i in range(len(aliases)):
            for j in range(i + 1, len(aliases)):
                assert float(vecs[i] @ vecs[j]) > 0.9, (key, aliases[i], aliases[j])
    reps = entity_embed([ENTITY_GROUPS[k][1][0] for k in ENTITY_GROUPS])
    n = len(reps)
    for i in range(n):
        for j in range(i + 1, n):
            assert float(reps[i] @ reps[j]) < 0.8


class TestHashingParityRegressions:
    def test_whitespace_type_kept_like_python(self, spark):
        """Reference fallback is Python truthiness: ' ' is truthy and
        must be kept, not replaced by 'Entity'."""
        from context_aware_rag_spark.functions.hashing import (
            entity_id_col,
            entity_id_py,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("Ada", " ", "c1"), ("Ada", "", "c1"), ("Ada", None, "c1")],
            ["s", "t", "c"],
        )
        got = [
            r["h"]
            for r in df.select(
                entity_id_col(F.col("s"), F.col("t"), F.col("c")).alias("h")
            ).collect()
        ]
        assert got[0] == entity_id_py("Ada", " ", "c1")
        assert got[1] == entity_id_py("Ada", "", "c1")  # '' -> Entity
        assert got[2] == entity_id_py("Ada", None, "c1")

    def test_null_fields_do_not_collide(self, spark):
        """concat_ws skipped NULLs, letting (NULL, x) and (x, NULL)
        share a hash; NULL must propagate instead."""
        from context_aware_rag_spark.functions.hashing import entity_id_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(None, "x"), ("x", None)], ["s", "c"]
        )
        got = [
            r["h"]
            for r in df.select(
                entity_id_col(F.col("s"), F.lit("T"), F.col("c")).alias("h")
            ).collect()
        ]
        assert got == [None, None]


def test_timestamp_prefix_python_rounding_parity(spark):
    """Chunk-id parity on FRACTIONAL timestamps: Java %.2f rounds 0.125
    HALF_UP to 0.13 while the reference's Python f-string gives 0.12 —
    the chunking path must match the oracle byte-for-byte."""
    from datetime import datetime, timezone

    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.operators.chunking import chunk_transcripts
    from context_aware_rag_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    ts = datetime(2024, 1, 1, 0, 0, 0, 125000)  # .125s — the tie case
    df = spark.createDataFrame(
        [("convF", 0, "user", "Alice met Bob.", None, ts)],
        schema=TRANSCRIPT_SCHEMA,
    )
    chunks = chunk_transcripts(df, PipelineConfig(timestamp_prefix=True)).collect()
    assert len(chunks) == 1
    epoch = ts.timestamp()
    want = f"<{epoch:.2f}> <{epoch:.2f}> Alice met Bob."
    assert chunks[0]["text"] == want
    from context_aware_rag_spark.functions.hashing import chunk_id_py

    assert chunks[0]["chunk_id"] == chunk_id_py(want, "convF")


class TestComposeEntityText:
    """C7 in isolation (neo4j_db.py:682: e.name + coalesce(' ' +
    e.description, '')) — was the one op verified only indirectly."""

    def test_with_and_without_description(self, spark):
        from context_aware_rag_spark.functions.text import compose_entity_text
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("ada", "a person"), ("bob", None), ("", "desc only")],
            ["name", "description"],
        )
        got = [
            r["t"]
            for r in df.select(
                compose_entity_text(F.col("name"), F.col("description")).alias("t")
            ).collect()
        ]
        # null description coalesces to '' (name alone, no trailing space)
        assert got == ["ada a person", "bob", " desc only"]
