"""Agentic planner retrieval (operators/planner.py + the scripted
fake-LLM in functions/plannerscript.py) vs the pure-Python replay
(oracle/precompute.planner_trace_table).

The parity test is the strong gate: the ENTIRE trace — plan texts,
every tool-result row, the observe→replan scalars threaded between
iterations — must match the sequential replica bit-for-bit.
"""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.functions import plannerscript as ps
from context_aware_rag_spark.operators import planner, similarity
from context_aware_rag_spark.oracle import precompute
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import generate_transcripts


# ---------------------------------------------------------------------------
# plannerscript: the reference execution_node parse path
# ---------------------------------------------------------------------------

class TestParsePlan:
    def test_query_split_fans_out(self):
        plan = (
            "<execute><tool>chunk_search</tool>"
            "<input><query>a;b</query><topk>3</topk></input></execute>"
        )
        calls = ps.parse_plan(plan)
        assert calls == [
            ("chunk_search", {"query": "a", "topk": "3"}),
            ("chunk_search", {"query": "b", "topk": "3"}),
        ]

    def test_unknown_tool_skipped(self):
        plan = (
            "<execute><tool>teleport</tool><input><query>x</query></input>"
            "</execute>"
            "<execute><tool>bfs</tool><input><node_id>n1</node_id></input>"
            "</execute>"
        )
        assert ps.parse_plan(plan) == [("bfs", {"node_id": "n1"})]

    def test_prose_with_xml_specials_survives_escaping(self):
        # free-text reasoning with raw &, <, ', " around the blocks —
        # the reference's escape→selective-unescape cycle must keep the
        # structural tags parseable (planner.py:275-334)
        plan = (
            "Alice & Bob said \"it's < 5 minutes\".\n"
            "<execute><tool>entity_search</tool>"
            "<input><query>Alice & Bob</query></input></execute>"
        )
        calls = ps.parse_plan(plan)
        assert calls == [("entity_search", {"query": "Alice & Bob"})]

    def test_thinking_complete_on_answer(self):
        assert ps.thinking_complete("<answer>done</answer>")
        assert not ps.thinking_complete("<execute>...</execute>")

    def test_scripted_loop_shape(self):
        p0 = ps.scripted_plan("q", 0)
        assert not ps.thinking_complete(p0)
        assert [t for t, _ in ps.parse_plan(p0)] == [
            "chunk_search", "chunk_search", "entity_search"
        ]
        obs = {"top_entity": "e1", "top_chunk": "c1",
               "top_chunk_epoch_s": 1000, "top_chunk_conv": "conv0"}
        p1 = ps.scripted_plan("q", 1, obs)
        calls = ps.parse_plan(p1)
        assert [t for t, _ in calls] == [
            "bfs", "next_chunk", "chunk_filter", "subtitle_search",
            "chunk_reader",
        ]
        assert calls[2][1]["range"] == "-2600.0:4600.0"
        obs["top_subtitle_start_s"] = 140
        p2 = ps.scripted_plan("q", 2, obs)
        calls2 = ps.parse_plan(p2)
        assert [t for t, _ in calls2] == ["subtitle_filter"]
        assert calls2[0][1]["range"] == "110.0:170.0"
        assert ps.thinking_complete(ps.scripted_plan("q", 3, obs))

    def test_uniform_sample_indices_reference_parity(self):
        # transcription vs the formula used engine-side; includes the
        # banker's half (T=6,k=3 -> 2.5 -> 2)
        assert ps.uniform_sample_indices(6, 3) == [0, 2, 5]
        assert ps.uniform_sample_indices(13, 4) == [0, 4, 8, 12]
        assert ps.uniform_sample_indices(5, 1) == [2]
        assert ps.uniform_sample_indices(3, 4) == [0, 1, 2]

    def test_fake_vlm_answer_roundtrip_exact(self):
        for text in ["Alice deployed the service", 'quote "x" inside',
                     "fence ``` inside", "brace } inside"]:
            ans = ps.fake_vlm_answer(text, "q?")
            clean = text[:80].replace("`", "")
            assert ans == f"Observed in frames: {clean} [re: q?]"

    def test_chunk_boundary_rounding(self):
        assert ps.round_down_to_chunk(153.0, 10.0) == 150.0
        assert ps.round_up_to_chunk(153.0, 10.0) == 160.0
        assert ps.round_up_to_chunk(150.0, 10.0) == 150.0


# ---------------------------------------------------------------------------
# full-loop parity: Spark trace == pure-Python replay, bit-for-bit
# ---------------------------------------------------------------------------

N_CONVS = 6


@pytest.fixture(scope="module")
def trace_inputs(spark):
    tr = generate_transcripts(spark, N_CONVS)
    res = run_pipeline(spark, tr, PipelineConfig())
    chunks = res.chunks.groupBy("chunk_id").agg(
        F.min("conv_id").alias("conv_id"),
        F.min("text").alias("text"),
        F.min("ts").alias("ts"),
    )
    with_emb = similarity.with_text_embeddings(chunks).localCheckpoint()
    subs = planner.subtitles_from_transcripts(tr).localCheckpoint()
    return (with_emb, res.edges.localCheckpoint(),
            res.nodes.localCheckpoint(), subs)


class TestPlannerParity:
    def test_trace_matches_oracle_exactly(self, spark, trace_inputs):
        with_emb, edges, nodes, subs = trace_inputs
        trace = planner.planner_retrieve(
            with_emb, edges, nodes, ps.DEFAULT_PLANNER_QUERY, subtitles=subs
        )
        got = sorted(tuple(r) for r in trace.collect())
        want = sorted(
            precompute.planner_trace_table(N_CONVS, ps.DEFAULT_PLANNER_QUERY)
        )
        assert len(got) == len(want)
        assert got == want

    def test_all_eight_tools_executed(self, spark, trace_inputs):
        with_emb, edges, nodes, subs = trace_inputs
        trace = planner.planner_retrieve(
            with_emb, edges, nodes, ps.DEFAULT_PLANNER_QUERY, subtitles=subs
        ).localCheckpoint()
        tools = {r["tool"] for r in trace.select("tool").distinct().collect()}
        assert tools == {"think", "chunk_search", "entity_search", "bfs",
                         "next_chunk", "chunk_filter", "subtitle_search",
                         "subtitle_filter", "chunk_reader"}
        # loop terminated via <answer>, not max_iterations
        finals = [
            r["detail"]
            for r in trace.filter(
                (F.col("tool") == "think") & (F.col("iteration") == 3)
            ).collect()
        ]
        assert len(finals) == 1 and "<answer>" in finals[0]

    def test_no_subtitle_track_skips_subtitle_tools(self, spark, trace_inputs):
        # the reference's non-subtitle prompt branch (planner.py:128-145)
        with_emb, edges, nodes, _subs = trace_inputs
        trace = planner.planner_retrieve(
            with_emb, edges, nodes, ps.DEFAULT_PLANNER_QUERY
        ).localCheckpoint()
        tools = {r["tool"] for r in trace.select("tool").distinct().collect()}
        assert "subtitle_search" not in tools
        assert "subtitle_filter" not in tools
        assert "chunk_reader" in tools  # visual read needs no subtitles

    def test_different_query_different_trace(self, spark, trace_inputs):
        with_emb, edges, nodes, subs = trace_inputs
        t1 = planner.planner_retrieve(
            with_emb, edges, nodes, ps.DEFAULT_PLANNER_QUERY, subtitles=subs
        )
        t2 = planner.planner_retrieve(
            with_emb, edges, nodes, "what is Bob Smith testing",
            subtitles=subs,
        )
        r1 = sorted(tuple(r) for r in t1.collect())
        r2 = sorted(tuple(r) for r in t2.collect())
        assert r1 != r2
        # but the oracle replays the second query identically too
        want = sorted(
            precompute.planner_trace_table(N_CONVS, "what is Bob Smith testing")
        )
        assert r2 == want


class TestEntitySearchPlan:
    def test_topk_plans_as_take_ordered_not_single_partition(
        self, spark, trace_inputs
    ):
        # the entity vocabulary is corpus-scale at 10^12 turns, so the
        # top-k must plan as TakeOrderedAndProject (map-side partial
        # top-k) with rank re-derived on the k survivors — never an
        # unpartitioned row_number over all scored nodes
        _with_emb, _edges, nodes, _subs = trace_inputs
        from context_aware_rag_spark.operators.similarity import (
            with_text_embeddings,
        )

        nemb = with_text_embeddings(
            nodes.select(
                "node_id",
                F.col("name"),
                F.col("type"),
                F.col("name").alias("text"),
            )
        ).drop("text")
        out = planner.tool_entity_search(nemb, "alice bob", 5)
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange SinglePartition" not in plan, plan


class TestFullRankingToolPlans:
    """The three tools that return a FULL ranking (no k) — BFS,
    SubtitleFilter, ChunkFilter — ride skew.global_rank (range shuffle
    + broadcast offsets): no unpartitioned row_number anywhere, so a
    hot entity / wide time range never funnels through one task."""

    def test_bfs_rank_is_single_partition_free(self, spark, trace_inputs):
        _with_emb, edges, _nodes, _subs = trace_inputs
        node = edges.select("src").first()["src"]
        out = planner.tool_bfs(edges, node)
        rows = out.collect()
        assert rows, "fixture node must have neighbors"
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        # ranks follow (rel_type, dir, result_id) exactly
        ordered = sorted(rows, key=lambda r: (r["detail"], r["result_id"]))
        assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, plan

    def test_subtitle_filter_rank_is_single_partition_free(
        self, spark, trace_inputs
    ):
        *_rest, subs = trace_inputs
        out = planner.tool_subtitle_filter(subs, "0:60")
        rows = out.collect()
        assert rows
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, plan

    def test_chunk_filter_rank_is_single_partition_free(
        self, spark, trace_inputs
    ):
        with_emb, *_rest = trace_inputs
        lo = with_emb.agg(
            F.min(F.unix_timestamp("ts").cast("long")).alias("lo")
        ).first()["lo"]
        out = planner.tool_chunk_filter(
            with_emb, f"{lo}:{lo + 3600}", camera_id=None
        )
        rows = out.collect()
        assert rows
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, plan
