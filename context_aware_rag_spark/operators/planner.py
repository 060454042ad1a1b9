"""Agentic planner retrieval — the reference's main Q&A mode
(retrieval/planner.py:1-601, planner_retrieval.py:1-315,
adv_graph_retrieval.py:1-404), re-expressed as a bounded driver loop
over distributed tool legs.

Reference loop: think (LLM emits an XML execution plan) → execute
(parse plan into tool calls) → tools (each a graph-db query) → think
again with the observations folded in, until the plan contains
``<answer>`` or max_iterations hits (planner.py:513-525). The LLM half
is deterministic here (functions/plannerscript.py — the same scripted
fake-LLM pattern as U1/U4); the tool half maps each reference tool onto
the engine's existing relational twins:

- ChunkSearch  (graph_search_tool.py:285-367): vector top-k over chunk
  embeddings — ann.cosine_topk_bruteforce (broadcast 1-row query side).
- EntitySearch (graph_search_tool.py:375-426): vector top-k over entity
  embeddings (A4's table + the band gate's cosine machinery).
- ChunkFilter  (graph_search_tool.py:199-275): time-range + camera
  filter, range widened outward to chunk_size boundaries
  (round_down/up_to_nearest_chunk_size) — the F3 filter shape,
  partition-prunable.
- BFS          (graph_search_tool.py:432-479): 1-hop neighbors of a
  node, both directions — one pruned edge-scan filter.
- NextChunk    (graph_search_tool.py:486-527): bounded NEXT_CHUNK walk
  — per-hop equi-join on the rel-type-pruned edge scan (W2's edges).
- SubtitleSearch (graph_search_tool.py:1207-1296): vector top-k over
  the subtitle track, each hit carrying its time range.
- SubtitleFilter (graph_search_tool.py:1300-1352): time-range
  containment over the subtitle track, chunk-boundary widened.
- ChunkReader  (graph_search_tool.py:634-810 + image_fetcher.py:
  222-320): uniform frame sample over the chunk's census plus the
  fake-VLM answer through the structured-JSON repair cycle (U4).

Output: the full deterministic TRACE — one row per thinking iteration
(the plan text) and one row per tool result — so the driver hash gates
the entire observe→replan loop, not just one leg.

100 TB shape: the loop itself is the reference's agent loop — a few
bounded iterations per question. Every tool leg is a distributed job
over the shared chunk/edge/node tables (query side broadcast or a
literal predicate; edge scans pruned by rel_type before any join).
Observations fed back into the planner are O(1) scalars (top entity
id, top chunk id + its timestamp) — two bounded collects per question,
never row data. Per-question work is independent, so a question batch
fans out embarrassingly.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import plannerscript as ps
from .ann import cosine_topk_bruteforce

TRACE_SCHEMA = (
    "iteration int, step int, tool string, arg string, rank int, "
    "result_id string, score double, detail string"
)


def _with_trace_meta(
    df: DataFrame, iteration: int, step: int, tool: str, arg: str
) -> DataFrame:
    """Attach the (iteration, step, tool, arg) trace columns and order
    the projection to TRACE_SCHEMA."""
    return df.select(
        F.lit(iteration).alias("iteration"),
        F.lit(step).alias("step"),
        F.lit(tool).alias("tool"),
        F.lit(arg).alias("arg"),
        F.col("rank").cast("int"),
        F.col("result_id").cast("string"),
        F.round(F.col("score"), 6).cast("double").alias("score"),
        F.col("detail").cast("string"),
    )


def tool_chunk_search(
    chunks_with_emb: DataFrame, query_text: str, topk: int
) -> DataFrame:
    """ChunkSearch: cosine top-k chunks for one query string."""
    from .similarity import with_text_embeddings

    spark = chunks_with_emb.sparkSession
    q = with_text_embeddings(
        spark.createDataFrame([(0, query_text)], ["query_id", "text"]),
        text_col="text",
    ).select("query_id", "embedding")
    hits = cosine_topk_bruteforce(
        chunks_with_emb, q, k=topk, id_col="chunk_id", vec_col="embedding"
    )
    meta = chunks_with_emb.select("chunk_id", "conv_id")
    return (
        hits.join(meta, "chunk_id")
        .select(
            "rank",
            F.col("chunk_id").alias("result_id"),
            F.col("cosine").alias("score"),
            F.col("conv_id").alias("detail"),
        )
    )


def tool_entity_search(
    nodes_with_emb: DataFrame, query_text: str, topk: int
) -> DataFrame:
    """EntitySearch: cosine top-k entities for one query string.

    ``nodes_with_emb`` needs (node_id, name, type, embedding); the
    label column mirrors assemble_context's "type:name" rendering."""
    from ..functions.embedder import hash_embed

    qvec = [float(x) for x in hash_embed([query_text], dim=64)[0]]
    emb = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(emb, F.array(*[F.lit(x) for x in qvec]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = F.sqrt(
        F.aggregate(emb, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    qn = sum(x * x for x in qvec) ** 0.5 or 1.0
    cos = dot / (norm * F.lit(qn))
    scored = nodes_with_emb.select(
        F.col("node_id").alias("result_id"),
        cos.alias("score"),
        F.concat_ws(":", F.coalesce(F.col("type"), F.lit("Entity")),
                    F.col("name")).alias("detail"),
    )
    # row_number over an unpartitioned window would single-task the
    # whole entity vocabulary (corpus-scale at 10^12 turns);
    # limit-after-sort plans as TakeOrderedAndProject (map-side partial
    # top-k, k-row driver merge) and the rank is re-derived on the k
    # survivors only — the dsir.py:219 discipline.
    w = Window.orderBy(F.desc("score"), F.asc("result_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("result_id"))
        .limit(int(topk))
        .withColumn("rank", F.row_number().over(w))
    )


def tool_bfs(edges: DataFrame, node_id: str) -> DataFrame:
    """BFS: distinct 1-hop connections of ``node_id``, both directions,
    ranked deterministically by (rel_type, direction, neighbor).

    The tool returns the FULL neighbor set ranked (no k), and a hot
    entity's degree is corpus-scale, so the rank rides the two-phase
    :func:`~.skew.global_rank` (range shuffle + broadcast offsets) —
    never an unpartitioned row_number over the hop set."""
    from .skew import global_rank

    out = edges.filter(F.col("src") == node_id).select(
        F.col("dst").alias("result_id"), "rel_type", F.lit("out").alias("dir")
    )
    inn = edges.filter(F.col("dst") == node_id).select(
        F.col("src").alias("result_id"), "rel_type", F.lit("in").alias("dir")
    )
    hop = out.unionByName(inn).distinct()
    ranked, _n = global_rank(
        hop, ["rel_type", "dir", "result_id"], rank_col="rank"
    )
    return ranked.select(
        "result_id",
        F.lit(None).cast("double").alias("score"),
        F.concat_ws(":", "rel_type", "dir").alias("detail"),
        F.col("rank").cast("int").alias("rank"),
    )


def tool_next_chunk(edges: DataFrame, chunk_id: str, hops: int) -> DataFrame:
    """NextChunk: follow NEXT_CHUNK edges ``hops`` times; rank = hop.
    Duplicate chunk ids (same text twice in one conv) legitimately fan
    the walk out, so each hop is the full successor set, deduped."""
    nxt = edges.filter(F.col("rel_type") == "NEXT_CHUNK").select(
        "src", "dst"
    ).localCheckpoint()
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(chunk_id,)], ["src"])
    out: Optional[DataFrame] = None
    for hop in range(1, max(hops, 0) + 1):
        step = (
            nxt.join(F.broadcast(frontier), "src")
            .select(F.col("dst").alias("result_id"))
            .distinct()
            .withColumn("rank", F.lit(hop))
        )
        out = step if out is None else out.unionByName(step)
        frontier = step.select(F.col("result_id").alias("src"))
    if out is None:
        return spark.createDataFrame([], "result_id string, rank int, score double, detail string")
    return out.select(
        "result_id",
        "rank",
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("string").alias("detail"),
    )


def subtitles_from_transcripts(transcripts: DataFrame) -> DataFrame:
    """Deterministic subtitle track derived from the transcript turns
    (the reference ingests SRT subtitles alongside chunks,
    base.py:627-726; here each turn is one subtitle line at its
    within-conversation offset — turns are 7 s apart by corpus
    construction, each line held 5 s). Integer seconds throughout so
    the trace's time strings are format-stable across engines."""
    return transcripts.select(
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")).alias(
            "sub_id"
        ),
        "conv_id",
        (F.col("turn_idx") * 7).cast("int").alias("start_s"),
        (F.col("turn_idx") * 7 + 5).cast("int").alias("end_s"),
        "text",
    )


def tool_subtitle_search(
    subs_with_emb: DataFrame, query_text: str, topk: int
) -> DataFrame:
    """SubtitleSearch (graph_search_tool.py:1207-1296): cosine top-k
    subtitle lines; detail carries the "start:end" range the reference
    workflow feeds into the follow-up time filter."""
    from .similarity import with_text_embeddings

    spark = subs_with_emb.sparkSession
    q = with_text_embeddings(
        spark.createDataFrame([(0, query_text)], ["query_id", "text"]),
        text_col="text",
    ).select("query_id", "embedding")
    hits = cosine_topk_bruteforce(
        subs_with_emb, q, k=topk, id_col="sub_id", vec_col="embedding"
    )
    meta = subs_with_emb.select(
        "sub_id", F.concat_ws(":", "start_s", "end_s").alias("detail")
    )
    return hits.join(meta, "sub_id").select(
        "rank",
        F.col("sub_id").alias("result_id"),
        F.col("cosine").alias("score"),
        "detail",
    )


def tool_subtitle_filter(
    subtitles: DataFrame, range_str: str, chunk_size_s: float = 10.0
) -> DataFrame:
    """SubtitleFilter (graph_search_tool.py:1290-1352): subtitle lines
    contained in [lo, hi] after outward widening to chunk boundaries
    (get_filtered_subtitles :1290-1297). Ranked by (start_s, sub_id)."""
    lo_s, hi_s = range_str.split(":")
    lo = int(ps.round_down_to_chunk(float(lo_s), chunk_size_s))
    hi = int(ps.round_up_to_chunk(float(hi_s), chunk_size_s))
    # the tool returns the FULL in-range set ranked (no k), and a wide
    # range over a long-running track is corpus-scale, so the rank
    # rides the two-phase global_rank — never an unpartitioned
    # row_number over the filter result
    from .skew import global_rank

    in_range = subtitles.filter(
        (F.col("start_s") >= lo) & (F.col("end_s") <= hi)
    ).select(
        F.col("sub_id").alias("result_id"),
        F.lit(None).cast("double").alias("score"),
        F.concat_ws(":", "start_s", "end_s").alias("detail"),
        "start_s",
    )
    ranked, _n = global_rank(
        in_range, ["start_s", "result_id"], rank_col="rank"
    )
    return ranked.select(
        "result_id", "score", "detail",
        F.col("rank").cast("int").alias("rank"),
    )


def tool_chunk_reader(
    chunks: DataFrame,
    chunk_id: str,
    query_text: str,
    num_frames: int = 3,
) -> DataFrame:
    """ChunkReader (graph_search_tool.py:634-810): fetch the chunk's
    frames (uniform sample over its census — plannerscript's
    transcription of image_fetcher.py:265-287, half-even index parity
    via exact integer arithmetic) and ask the VLM about them. Frame
    rows rank 1..k with "frame_<idx>" detail; the fake-VLM answer
    (structured-JSON malform→repair cycle, the U4 pattern) lands at
    rank 0."""
    from .vlmretrieval import _half_even_index

    one = chunks.filter(F.col("chunk_id") == chunk_id).select(
        "chunk_id", "text"
    )
    t = F.greatest(
        F.floor(F.length("text") / 40).cast("int"), F.lit(1)
    )
    k = int(num_frames)
    sampled = one.select(
        "chunk_id", "text", t.alias("_t"),
        F.posexplode(
            F.sequence(F.lit(0), F.least(F.lit(k), t) - 1)
        ).alias("_i", "_"),
    )
    if k == 1:
        frame_idx = (F.col("_t") / 2).cast("int")
    else:
        frame_idx = F.when(
            F.col("_t") > k,
            _half_even_index(
                F.col("_i").cast("long"), F.col("_t").cast("long"), k
            ),
        ).otherwise(F.col("_i").cast("int"))
    frame_rows = sampled.select(
        (F.col("_i") + 1).cast("int").alias("rank"),
        F.col("chunk_id").alias("result_id"),
        F.lit(None).cast("double").alias("score"),
        F.concat(F.lit("frame_"), frame_idx.cast("string")).alias("detail"),
    )

    @F.pandas_udf("string")
    def vlm_answer(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:  # Arrow-batched; the input is one chunk row
            yield s.map(lambda t: ps.fake_vlm_answer(t or "", query_text))

    answer_row = one.select(
        F.lit(0).alias("rank"),
        F.col("chunk_id").alias("result_id"),
        F.lit(None).cast("double").alias("score"),
        vlm_answer(F.col("text")).alias("detail"),
    )
    return answer_row.unionByName(frame_rows)


def tool_chunk_filter(
    chunks: DataFrame,
    range_str: str,
    camera_id: Optional[str],
    chunk_size_s: float = 10.0,
) -> DataFrame:
    """ChunkFilter: chunks whose timestamp falls in [lo, hi] after the
    reference's outward widening to chunk boundaries
    (graph_search_tool.py:137-152); camera == conv here. Ranked by
    (epoch, chunk_id)."""
    lo_s, hi_s = range_str.split(":")
    lo = ps.round_down_to_chunk(float(lo_s), chunk_size_s)
    hi = ps.round_up_to_chunk(float(hi_s), chunk_size_s)
    epoch = F.unix_timestamp(F.col("ts")).cast("long")
    cond = (epoch >= int(lo)) & (epoch <= int(hi))
    if camera_id:
        cond = cond & (F.col("conv_id") == camera_id)
    # camera_id is optional: without it the filter result is ALL
    # cameras in the window — corpus-scale — so the full ranking rides
    # the two-phase global_rank, never an unpartitioned row_number
    from .skew import global_rank

    in_range = (
        chunks.withColumn("epoch", epoch)
        .filter(cond)
        .select(
            F.col("chunk_id").alias("result_id"),
            F.lit(None).cast("double").alias("score"),
            F.col("epoch").cast("string").alias("detail"),
            "epoch",
        )
    )
    ranked, _n = global_rank(in_range, ["epoch", "result_id"], rank_col="rank")
    return ranked.select(
        "result_id", "score", "detail",
        F.col("rank").cast("int").alias("rank"),
    )


def planner_retrieve(
    chunks_with_emb: DataFrame,
    edges: DataFrame,
    nodes: DataFrame,
    query: str,
    max_iterations: int = 5,
    topk: int = 5,
    subtitles: "DataFrame | None" = None,
) -> DataFrame:
    """Run the scripted think→execute→observe loop; return the trace.

    ``chunks_with_emb`` needs (chunk_id, conv_id, text, ts, embedding)
    with unique chunk_id (PRECONDITION: dedupe upstream, min-ts keeper);
    ``edges`` (src, dst, rel_type); ``nodes`` (node_id, name, type);
    ``subtitles`` (sub_id, conv_id, start_s, end_s, text) — omitted,
    the subtitle tool legs return empty (a corpus without an SRT
    track, the reference's non-subtitle prompt branch,
    planner.py:128-145).
    """
    from .similarity import with_entity_embeddings, with_text_embeddings

    spark = chunks_with_emb.sparkSession
    nodes_emb = with_entity_embeddings(
        nodes.select("node_id", "name", "type").dropDuplicates(["node_id"])
    ).localCheckpoint()
    chunks_cached = chunks_with_emb.localCheckpoint()
    subs_cached = None
    if subtitles is not None:
        subs_cached = with_text_embeddings(subtitles).localCheckpoint()

    observations: Dict[str, object] = {}
    legs: List[DataFrame] = []
    think_rows: List[tuple] = []

    for iteration in range(max_iterations):
        plan = ps.scripted_plan(query, iteration, observations, topk=topk)
        think_rows.append((iteration, 0, "think", "", 0, None, None, plan))
        if ps.thinking_complete(plan):
            break
        calls = ps.parse_plan(plan)
        iter_legs: List[tuple] = []  # (tool, arg, df)
        for step, (tool, input_data) in enumerate(calls, start=1):
            arg = ps.call_arg_string(input_data)
            if tool == "chunk_search":
                df = tool_chunk_search(
                    chunks_cached, input_data["query"],
                    int(input_data.get("topk", topk)),
                )
            elif tool == "entity_search":
                df = tool_entity_search(nodes_emb, input_data["query"], topk)
            elif tool == "bfs":
                df = tool_bfs(edges, input_data["node_id"])
            elif tool == "next_chunk":
                df = tool_next_chunk(
                    edges, input_data["chunk_id"],
                    int(input_data.get("number_of_hops", 1)),
                )
            elif tool == "chunk_filter":
                df = tool_chunk_filter(
                    chunks_cached, input_data["range"],
                    input_data.get("camera_id") or None,
                )
            elif tool == "subtitle_search":
                if subs_cached is None:
                    continue
                df = tool_subtitle_search(
                    subs_cached, input_data["query"],
                    int(input_data.get("topk", topk)),
                )
            elif tool == "subtitle_filter":
                if subs_cached is None:
                    continue
                df = tool_subtitle_filter(subs_cached, input_data["range"])
            elif tool == "chunk_reader":
                df = tool_chunk_reader(
                    chunks_cached, input_data["chunk_id"],
                    input_data["query"],
                )
            else:  # pragma: no cover — parse_plan already skips these
                continue
            legs.append(_with_trace_meta(df, iteration, step, tool, arg))
            iter_legs.append((tool, arg, df))

        # ---- observe: O(1) scalars only (planner.py:253-266 folds tool
        # results into the next thinking turn; here the fold is exact) --
        if iteration == 0:
            for tool, _arg, df in iter_legs:
                if tool == "chunk_search" and "top_chunk" not in observations:
                    top = df.filter(F.col("rank") == 1).collect()
                    if top:
                        row = top[0]
                        observations["top_chunk"] = row["result_id"]
                        observations["top_chunk_conv"] = row["detail"]
                        ts_row = (
                            chunks_cached.filter(
                                F.col("chunk_id") == row["result_id"]
                            )
                            .select(
                                F.unix_timestamp(F.col("ts"))
                                .cast("long")
                                .alias("epoch")
                            )
                            .collect()
                        )
                        observations["top_chunk_epoch_s"] = (
                            int(ts_row[0]["epoch"]) if ts_row else 0
                        )
                elif tool == "entity_search" and "top_entity" not in observations:
                    top = df.filter(F.col("rank") == 1).collect()
                    if top:
                        observations["top_entity"] = top[0]["result_id"]
        elif iteration == 1:
            for tool, _arg, df in iter_legs:
                if (
                    tool == "subtitle_search"
                    and "top_subtitle_start_s" not in observations
                ):
                    top = df.filter(F.col("rank") == 1).collect()
                    if top:
                        observations["top_subtitle_start_s"] = int(
                            top[0]["detail"].split(":")[0]
                        )

    trace = spark.createDataFrame(think_rows, TRACE_SCHEMA)
    for leg in legs:
        trace = trace.unionByName(leg)
    return trace
