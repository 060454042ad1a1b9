"""End-to-end parity: Spark pipeline vs reference-semantics oracle.

Checks (FIXTURES.md §5): triple P/R >= 0.95 (expected 1.0), chunk-id
byte parity, chunk-link shape, per-turn text invariant, mention and
structural-edge set equality.
"""

import pytest

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.oracle.reference_oracle import run_oracle, triple_prf
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)

N_CONVS = 12


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(N_CONVS)
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    return rows, df


@pytest.fixture(scope="module")
def oracle(corpus):
    rows, _ = corpus
    return run_oracle(rows)


@pytest.fixture(scope="module")
def result(spark, corpus):
    _, df = corpus
    return run_pipeline(spark, df, PipelineConfig())


def test_corpus_has_interesting_shape(corpus):
    rows, _ = corpus
    texts = [r[3] for r in rows]
    assert any(t == "." for t in texts), "empty-doc bait missing"
    assert any("~glitch~" in t for t in texts), "backtick bait missing"
    assert any("<think>" in t for t in texts), "think-tag bait missing"
    assert any(len(t) > 500 for t in texts), "multi-chunk turns missing"
    assert len(rows) > 1500  # includes one 50x-long conversation


def test_triple_parity(oracle, result):
    produced = [r.asDict() for r in result.triples.collect()]
    prec, rec, f1 = triple_prf(oracle.triples, produced)
    assert prec >= 0.95 and rec >= 0.95, (prec, rec)
    assert f1 == pytest.approx(1.0), (prec, rec, f1)


def test_chunk_id_byte_parity(oracle, result):
    golden = {(c["conv_id"], c["chunk_id"]) for c in oracle.chunks}
    got = {
        (r["conv_id"], r["chunk_id"])
        for r in result.chunks.select("conv_id", "chunk_id").collect()
    }
    assert got == golden


def test_chunk_link_shape(oracle, result):
    # duplicate chunk texts share a chunk_id (sha1 of text+conv), so
    # compare the full (id, position, offset, length) tuples as sets
    linked = result.linked_chunks.select(
        "conv_id", "chunk_id", "position", "content_offset", "length"
    ).collect()
    golden = {
        (c["conv_id"], c["chunk_id"], c["position"], c["content_offset"], c["length"])
        for c in oracle.chunks
    }
    got = {
        (r["conv_id"], r["chunk_id"], r["position"], r["content_offset"], r["length"])
        for r in linked
    }
    assert len(linked) == len(oracle.chunks)
    assert got == golden


def test_structural_edges_match(oracle, result):
    golden = {
        (e["src"], e["dst"], e["rel_type"])
        for e in oracle.edges
        if e["rel_type"] in ("PART_OF", "FIRST_CHUNK", "NEXT_CHUNK", "HAS_ENTITY")
    }
    got = {
        (r["src"], r["dst"], r["rel_type"])
        for r in result.edges.filter(
            result.edges.rel_type.isin(
                "PART_OF", "FIRST_CHUNK", "NEXT_CHUNK", "HAS_ENTITY"
            )
        ).collect()
    }
    assert got == golden


def test_one_first_chunk_per_conv(result):
    from pyspark.sql import functions as F

    counts = (
        result.edges.filter(F.col("rel_type") == "FIRST_CHUNK")
        .groupBy("conv_id").count().collect()
    )
    assert len(counts) == N_CONVS
    assert all(r["count"] == 1 for r in counts)


def test_chunk_positions_form_single_path(result):
    """Positions per conv are exactly 1..n with contiguous offsets — the
    occurrence-level equivalent of the NEXT_CHUNK single-path property
    (in id-space duplicate chunk texts share a sha1 and MERGE collapses
    them, matching the reference sink's semantics)."""
    from pyspark.sql import functions as F

    stats = (
        result.linked_chunks.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.min("position").alias("pmin"),
            F.max("position").alias("pmax"),
            F.countDistinct("position").alias("pdistinct"),
        )
        .collect()
    )
    assert len(stats) == N_CONVS
    for r in stats:
        assert r["pmin"] == 1 and r["pmax"] == r["n"] and r["pdistinct"] == r["n"]


def test_per_turn_text_invariant(corpus, result):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering:
    single-chunk turns reproduce the turn text exactly; multi-chunk turns
    cover it in order (split chunks are substrings covering the text)."""
    rows, _ = corpus
    turn_texts = {(r[0], r[1]): r[3] for r in rows}
    from collections import defaultdict

    by_turn = defaultdict(list)
    for r in result.chunks.select(
        "conv_id", "turn_idx", "split_pos", "text"
    ).collect():
        by_turn[(r["conv_id"], r["turn_idx"])].append((r["split_pos"], r["text"]))

    checked = 0
    for key, pieces in by_turn.items():
        original = turn_texts[key]
        pieces.sort()
        if len(pieces) == 1:
            assert pieces[0][1] == original.strip()
        else:
            last_end = 0
            for _, c in pieces:
                idx = original.find(c)
                assert idx >= 0
                assert original[last_end:idx].strip() == "" or idx <= last_end
                last_end = max(last_end, idx + len(c))
            assert original[last_end:].strip() == ""
        checked += 1
    dropped = sum(1 for t in turn_texts.values() if t == ".")
    assert checked == len(turn_texts) - dropped


def test_mentions_match(oracle, result):
    golden = {
        (m["conv_id"], m["chunk_id"], m["node_id"]) for m in oracle.mentions
    }
    got = {
        (r["conv_id"], r["chunk_id"], r["node_id"])
        for r in result.mentions.collect()
    }
    assert got == golden


def test_entity_ids_byte_parity(oracle, result):
    golden_ids = {m["node_id"] for m in oracle.mentions}
    got_ids = {r["node_id"] for r in result.mentions.select("node_id").collect()}
    assert got_ids == golden_ids
