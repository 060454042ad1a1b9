"""Summarization branch (A1/A2/A3/A6 + U4 stub + J3 + S6) and sinks."""

import os

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.operators.chunking import chunk_transcripts
from context_aware_rag_spark.operators.extraction import extract_stage
from context_aware_rag_spark.operators.summarize import (
    in_summary_edges,
    max_batch_index,
    summarize_batches,
)
from context_aware_rag_spark.sources.sinks import write_graph
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)

BATCH = 6


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(5)
    return rows, spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


@pytest.fixture(scope="module")
def summaries(spark, corpus):
    _, df = corpus
    return summarize_batches(df, batch_size=BATCH).localCheckpoint()


def test_batch_assembly_order_and_bounds(corpus, summaries):
    rows, _ = corpus
    # oracle: concat of non-"." texts in turn order per (conv, batch)
    from collections import defaultdict

    golden = defaultdict(list)
    bounds = {}
    for conv_id, turn_idx, _r, text, _t, ts in sorted(rows, key=lambda r: (r[0], r[1])):
        if text == ".":
            continue
        key = (conv_id, turn_idx // BATCH)
        golden[key].append(text)
        lo, hi = bounds.get(key, (ts, ts))
        bounds[key] = (min(lo, ts), max(hi, ts))
    got = {(r["conv_id"], r["batch_id"]): r for r in summaries.collect()}
    assert set(got) == set(golden)
    for key, texts in golden.items():
        expected = ("[SUM] " + " ".join(texts))[:406]
        assert got[key]["summary"] == expected, key
        # Spark returns naive datetimes in session TZ (UTC); strip tzinfo
        lo, hi = bounds[key]
        assert (got[key]["ts_min"], got[key]["ts_max"]) == (
            lo.replace(tzinfo=None), hi.replace(tzinfo=None),
        )
        assert got[key]["n_turns"] == len(texts)


def test_in_summary_edges_cover_all_chunks(spark, corpus, summaries):
    _, df = corpus
    chunks = chunk_transcripts(df, PipelineConfig())
    edges = in_summary_edges(summaries, chunks)
    # every chunk's turn belongs to exactly one batch -> has an IN_SUMMARY edge
    chunk_ids = {r["chunk_id"] for r in chunks.select("chunk_id").collect()}
    srcs = {r["src"] for r in edges.collect()}
    assert srcs == chunk_ids
    assert edges.count() == edges.dropDuplicates(["src", "dst"]).count()


def test_max_batch_index(summaries):
    mx = {r["conv_id"]: r["max_batch_id"] for r in max_batch_index(summaries).collect()}
    per_conv = {
        r["conv_id"]: r["m"]
        for r in summaries.groupBy("conv_id").agg(F.max("batch_id").alias("m")).collect()
    }
    assert mx == per_conv


def test_write_graph_parquet(spark, corpus, tmp_path):
    _, df = corpus
    chunks = chunk_transcripts(df, PipelineConfig())
    triples, mentions = extract_stage(chunks, PipelineConfig())
    from context_aware_rag_spark.operators.materialize import build_edges, build_nodes
    from context_aware_rag_spark.operators.linking import link_chunks, structural_edges

    nodes = build_nodes(mentions)
    edges = build_edges(structural_edges(link_chunks(chunks), mentions), triples)
    base = str(tmp_path / "graph")
    write_graph(nodes, edges, base)
    n2 = spark.read.parquet(os.path.join(base, "nodes"))
    e2 = spark.read.parquet(os.path.join(base, "edges"))
    assert n2.count() == nodes.count()
    assert e2.count() == edges.count()
    assert set(n2.columns) == set(nodes.columns)


def test_u2_extraction_bypass(spark, corpus):
    _, df = corpus
    cfg = PipelineConfig(extractor="null")
    chunks = chunk_transcripts(df, cfg)
    triples, mentions = extract_stage(chunks, cfg)
    assert triples.count() == 0 and mentions.count() == 0
    assert chunks.count() > 0


def test_u4_summarize_udf_pluggable(spark):
    """The U4 slot accepts any pandas UDF (production = LLM endpoint);
    injecting a custom one changes only the summary column."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from context_aware_rag_spark.operators.summarize import summarize_batches
    from context_aware_rag_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
        generate_rows,
    )

    @F.pandas_udf(T.StringType())
    def shout(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:
            yield s.fillna("").map(lambda t: "LLM<" + t[:10].upper() + ">")

    df = spark.createDataFrame(generate_rows(2), schema=TRANSCRIPT_SCHEMA)
    default = summarize_batches(df, batch_size=6)
    custom = summarize_batches(df, batch_size=6, summarize_udf=shout)
    d = {(r["conv_id"], r["batch_id"]): r for r in default.collect()}
    c = {(r["conv_id"], r["batch_id"]): r for r in custom.collect()}
    assert set(d) == set(c)
    for k in d:
        assert d[k]["summary"].startswith("[SUM] ")
        assert c[k]["summary"].startswith("LLM<")
        for col in ("ts_min", "ts_max", "n_turns"):
            assert d[k][col] == c[k][col]


class TestTreeAggRegressions:
    """Review findings on tree_summarize pinned as regressions."""

    def test_single_chunk_group_compositional(self, spark):
        """A single-chunk conv's summary must not depend on what other
        groups need reducing (it previously got truncated only when
        another group triggered a level)."""
        from context_aware_rag_spark.operators.treeagg import tree_summarize

        long_text = "x" * 800
        alone = spark.createDataFrame(
            [("A", 1, long_text)], ["conv_id", "position", "text"]
        )
        with_peer = spark.createDataFrame(
            [("A", 1, long_text), ("B", 1, "b one"), ("B", 2, "b two")],
            ["conv_id", "position", "text"],
        )
        s_alone = {r["conv_id"]: r["summary"] for r in tree_summarize(alone).collect()}
        s_peer = {r["conv_id"]: r["summary"] for r in tree_summarize(with_peer).collect()}
        assert s_alone["A"] == s_peer["A"] == long_text

    def test_sparse_positions_converge(self, spark):
        """Raw-timestamp positions (spread >> count) must converge in
        log2(group size) levels, not log2(position spread)."""
        from context_aware_rag_spark.operators.treeagg import tree_summarize

        rows = [("C", 1_700_000_000_000 + i * 1_800_000, f"t{i}") for i in range(5)]
        df = spark.createDataFrame(rows, ["conv_id", "position", "text"])
        out = tree_summarize(df, max_levels=4).collect()
        assert len(out) == 1
        assert out[0]["summary"] == "t0 t1 t2 t3 t4"
        assert out[0]["n_levels"] <= 3  # ceil(log2(5))

    def test_non_convergence_raises(self, spark):
        from context_aware_rag_spark.operators.treeagg import tree_summarize

        rows = [("C", i, f"t{i}") for i in range(9)]
        df = spark.createDataFrame(rows, ["conv_id", "position", "text"])
        with pytest.raises(RuntimeError, match="converge"):
            tree_summarize(df, max_levels=2)  # needs ceil(log2(9)) = 4

    def test_pluggable_combine(self, spark):
        from pyspark.sql import functions as F

        from context_aware_rag_spark.operators.treeagg import tree_summarize

        rows = [("C", 1, "aa"), ("C", 2, "bb"), ("C", 3, "cc")]
        df = spark.createDataFrame(rows, ["conv_id", "position", "text"])
        out = tree_summarize(
            df, combine=lambda texts: F.concat_ws("|", texts)
        ).collect()
        assert out[0]["summary"] == "aa|bb|cc"


class TestLLMSummarizer:
    """U4 closed: the fake-LLM structured-JSON summarization cycle
    (malform -> repair -> parse) must equal the direct stub path —
    content-losslessness is by construction, these tests prove it on
    adversarial content and on the real corpus."""

    def test_roundtrip_identity_all_modes(self):
        from context_aware_rag_spark.operators.summarize import (
            fake_llm_summary_response,
            llm_summary_roundtrip,
        )

        cases = [
            "plain words only",
            "with \"double quotes\" inside",       # blocks mode 1
            "with 'apostrophes' too",              # blocks mode 1
            "braces } and ] brackets",             # blocks mode 2
            'everything " \' } ] at once',
            "unicode – naïve café 日本語",
            "newline\nand\ttab",
            "",
            "a" * 600,
            "use ```code fences``` like this",     # blocks mode 0
            'fences ``` AND " quotes } braces',
        ]
        # force every eligible mode for every case by checking that the
        # picked response still round-trips exactly
        for content in cases:
            assert llm_summary_roundtrip(content) == content, content
            resp = fake_llm_summary_response(content)
            assert isinstance(resp, str) and resp

    def test_batch_parity_with_stub(self, spark, corpus):
        from context_aware_rag_spark.operators.summarize import llm_summarize_udf

        _, df = corpus
        stub = summarize_batches(df, batch_size=BATCH)
        llm = summarize_batches(
            df, batch_size=BATCH, summarize_udf=llm_summarize_udf(400)
        )
        a = {tuple(r) for r in stub.select("conv_id", "batch_id", "summary").collect()}
        b = {tuple(r) for r in llm.select("conv_id", "batch_id", "summary").collect()}
        assert a == b and a

    def test_tree_parity_with_default_combine(self, spark):
        from context_aware_rag_spark.operators.summarize import llm_tree_combine
        from context_aware_rag_spark.operators.treeagg import tree_summarize

        rows = [(f"c{g}", i, f"chunk {g}-{i} text segment")
                for g in range(4) for i in range(7)]
        df = spark.createDataFrame(rows, ["conv_id", "position", "text"])
        base = tree_summarize(df, cap=80)
        llm = tree_summarize(df, cap=80, combine=llm_tree_combine(80))
        a = {tuple(r) for r in base.collect()}
        b = {tuple(r) for r in llm.collect()}
        assert a == b and a


class TestSummaryRetriever:
    """Reference summary_retriever.py:72-105: range fetch -> ordered
    stuff -> summarization chain over the stitched context."""

    def test_range_fetch_stitch_and_summarize(self, spark, summaries):
        from context_aware_rag_spark.operators.summarize import retrieve_summary

        out = {r["conv_id"]: r for r in
               retrieve_summary(summaries, batch_lo=0, batch_hi=1).collect()}
        assert out
        src = {}
        for r in summaries.filter(F.col("batch_id") <= 1).collect():
            src.setdefault(r["conv_id"], []).append((r["batch_id"], r["summary"]))
        for conv, rows in src.items():
            ctx = " ".join(s for _, s in sorted(rows))
            expect = ("[SUM] " + ctx)[:406]
            assert out[conv]["summary"] == expect
            assert out[conv]["n_batches"] == len(rows)
            assert out[conv]["batch_lo"] == min(b for b, _ in rows)
            assert out[conv]["batch_hi"] == max(b for b, _ in rows)

    def test_conv_and_range_filters(self, spark, summaries):
        from context_aware_rag_spark.operators.summarize import retrieve_summary

        conv = summaries.select("conv_id").first()["conv_id"]
        rows = retrieve_summary(summaries, conv_id=conv).collect()
        assert len(rows) == 1 and rows[0]["conv_id"] == conv
        # out-of-range fetch returns nothing
        assert retrieve_summary(summaries, batch_lo=10**6).count() == 0
