"""Scripted fake-LLM planner: deterministic thinking/execution traces
in the reference's agentic-planner wire format.

Reference semantics (retrieval/planner.py:166-233 thinking_agent,
:270-489 execution_node): the thinking agent emits a free-text plan
containing ``<execute>`` blocks; the execution node escapes XML special
characters in the content, re-unescapes the known structural tags, ET-
parses the result, and expands each block into tool calls — splitting
``;``-separated ``query`` values into one call per query
(planner.py:371-380,428-435) and routing unknown tool names to a skip
(planner.py:404-407). Thinking is complete when the plan contains
``<answer>`` (planner.py:226); the loop is bounded by max_iterations
(planner.py:513-525).

This module is the deterministic stand-in for the LLM half of that
loop — the same role fake_llm_summary_response plays for U4
(operators/summarize.py:51): it reproduces the response SHAPE (XML
plan with execute blocks, observations folded into the next-iteration
plan, a final ``<answer>``) so the full parse path runs end to end,
while the tool legs themselves are executed by the engine (Spark) and
the oracle (pure Python) independently.

Pure Python, no pyspark imports — shared by operators/planner.py and
oracle/precompute.py exactly like functions/embedder.py and
functions/splitter.py are.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

# The driver-query question: fixed, so the whole trace is a pure
# function of the corpus. Mentions a corpus entity so the search legs
# rank something meaningful.
DEFAULT_PLANNER_QUERY = "what did Alice Johnson deploy"

# Tool names the execution node recognizes (planner.py:337-346) — the
# FULL reference registry: ChunkSearch, EntitySearch, ChunkFilter,
# ChunkReader, SubtitleSearch, SubtitleFilter, BFS, NextChunk.
KNOWN_TOOLS = (
    "chunk_search",
    "entity_search",
    "chunk_filter",
    "chunk_reader",
    "subtitle_search",
    "subtitle_filter",
    "bfs",
    "next_chunk",
)

# Structural tags the reference re-unescapes before parsing
# (planner.py:294-334) — everything else stays escaped content.
_STRUCTURAL_TAGS = (
    "execute",
    "step",
    "tool",
    "input",
    "chunk_id",
    "query",
    "keywords",
    "start_time",
    "end_time",
    "range",
    "topk",
    "event_description",
    "max_search_results",
    "camera_id",
    "node_id",
    "number_of_hops",
)


def escape_xml_content(text: str) -> str:
    """planner.py:275-292 — escape ALL XML specials (``&`` first)."""
    text = text.replace("&", "&amp;")
    text = text.replace("<", "&lt;")
    text = text.replace(">", "&gt;")
    text = text.replace('"', "&quot;")
    text = text.replace("'", "&apos;")
    return text


def unescape_structural_tags(text: str) -> str:
    """planner.py:294-334 — re-open only the known structural tags."""
    for tag in _STRUCTURAL_TAGS:
        text = text.replace(f"&lt;{tag}&gt;", f"<{tag}>")
        text = text.replace(f"&lt;/{tag}&gt;", f"</{tag}>")
    return text


def parse_plan(plan_text: str) -> List[Tuple[str, Dict[str, str]]]:
    """Expand a plan's ``<execute>`` blocks into (tool, input) calls.

    Replicates execution_node (planner.py:382-438): escape → selective
    unescape → ET parse → per-block input dict → the query split
    special case (``;``-separated queries become one call per query
    for chunk_search / entity_search). Unknown tools are skipped, like
    the reference's warning path (planner.py:405-407).
    """
    escaped = escape_xml_content(plan_text)
    xml_ready = unescape_structural_tags(escaped)
    root = ET.fromstring(f"<root>{xml_ready}</root>")
    calls: List[Tuple[str, Dict[str, str]]] = []
    for block in root.findall("execute"):
        tool_name = (block.findtext("tool") or "").strip().lower()
        if tool_name not in KNOWN_TOOLS:
            continue
        input_elem = block.find("input")
        input_data = (
            {child.tag: (child.text or "").strip() for child in input_elem}
            if input_elem is not None
            else {}
        )
        queries = input_data.get("query", "").split(";") if "query" in input_data else []
        if (
            tool_name in ("chunk_search", "entity_search", "subtitle_search")
            and len(queries) > 1
        ):
            for one in queries:
                per = dict(input_data)
                per["query"] = one.strip()
                calls.append((tool_name, per))
        else:
            calls.append((tool_name, input_data))
    return calls


def thinking_complete(plan_text: str) -> bool:
    """planner.py:226 — ``<answer>`` marks the plan final."""
    return "<answer>" in plan_text


# ---------------------------------------------------------------------------
# The scripted planner itself: four deterministic iterations covering
# the FULL tool registry.
#
# Iteration 0 — broad recall: semantic chunk search (two ;-joined query
#   variants, exercising the query-split path) + entity search.
# Iteration 1 — targeted follow-up from observations: BFS from the top
#   entity, NEXT_CHUNK walk from the top chunk, a chunk_filter around
#   the top chunk's time window on its camera, a subtitle search, and
#   a chunk_reader (VLM) read of the top chunk.
# Iteration 2 — subtitle_filter around the top subtitle's time range
#   (the reference's subtitle-first → time-range → visual workflow,
#   graph_search_tool.py:1251-1276).
# Iteration 3 — <answer>: thinking complete, loop exits to response.
#
# Observations are the engine's tool results folded back in as scalars
# (top entity id, top chunk id + epoch + conv, top subtitle start) —
# the same observe→replan information flow as planner.py:196-216,
# made exact.
# ---------------------------------------------------------------------------

def scripted_plan(
    query: str,
    iteration: int,
    observations: Optional[Dict[str, object]] = None,
    topk: int = 5,
    filter_window_s: int = 3600,
    subtitle_window_s: int = 30,
) -> str:
    """Return the fake LLM's plan text for one thinking iteration."""
    obs = observations or {}
    if iteration == 0:
        return (
            "I will start broad: semantic retrieval plus entity lookup.\n"
            "<execute>\n"
            "  <step>1</step>\n"
            "  <tool>chunk_search</tool>\n"
            f"  <input><query>{query};{query} details</query>"
            f"<topk>{topk}</topk></input>\n"
            "</execute>\n"
            "<execute>\n"
            "  <step>2</step>\n"
            "  <tool>entity_search</tool>\n"
            f"  <input><query>{query}</query></input>\n"
            "</execute>\n"
        )
    if iteration == 1:
        top_entity = obs.get("top_entity", "")
        top_chunk = obs.get("top_chunk", "")
        t0 = int(obs.get("top_chunk_epoch_s", 0)) - filter_window_s
        t1 = int(obs.get("top_chunk_epoch_s", 0)) + filter_window_s
        camera = obs.get("top_chunk_conv", "")
        return (
            "The results point at one entity and one chunk; I will "
            "expand locally around both, check the spoken track, and "
            "read the top chunk visually.\n"
            "<execute>\n"
            "  <step>1</step>\n"
            "  <tool>bfs</tool>\n"
            f"  <input><node_id>{top_entity}</node_id></input>\n"
            "</execute>\n"
            "<execute>\n"
            "  <step>2</step>\n"
            "  <tool>next_chunk</tool>\n"
            f"  <input><chunk_id>{top_chunk}</chunk_id>"
            "<number_of_hops>2</number_of_hops></input>\n"
            "</execute>\n"
            "<execute>\n"
            "  <step>3</step>\n"
            "  <tool>chunk_filter</tool>\n"
            f"  <input><range>{t0}.0:{t1}.0</range>"
            f"<camera_id>{camera}</camera_id></input>\n"
            "</execute>\n"
            "<execute>\n"
            "  <step>4</step>\n"
            "  <tool>subtitle_search</tool>\n"
            f"  <input><query>{query}</query><topk>{topk}</topk></input>\n"
            "</execute>\n"
            "<execute>\n"
            "  <step>5</step>\n"
            "  <tool>chunk_reader</tool>\n"
            f"  <input><chunk_id>{top_chunk}</chunk_id>"
            f"<query>{query}</query></input>\n"
            "</execute>\n"
        )
    if iteration == 2:
        s0 = int(obs.get("top_subtitle_start_s", 0)) - subtitle_window_s
        s1 = int(obs.get("top_subtitle_start_s", 0)) + subtitle_window_s
        return (
            "The spoken track pins a moment; I will pull every subtitle "
            "in that window before answering.\n"
            "<execute>\n"
            "  <step>1</step>\n"
            "  <tool>subtitle_filter</tool>\n"
            f"  <input><range>{s0}.0:{s1}.0</range></input>\n"
            "</execute>\n"
        )
    return (
        "<answer>Collected semantic, entity, graph-neighborhood, "
        "temporal, spoken-track and visual evidence; the context is "
        "sufficient.</answer>"
    )


def uniform_sample_indices(total: int, k: int) -> List[int]:
    """image_fetcher.py:265-287 transcribed: the frame indices a
    ChunkReader fetch would sample (Python round() half-even at exact
    halves; k == 1 takes the middle frame)."""
    if total > 0 and k > 0 and total > k:
        if k == 1:
            return [total // 2]
        return [int(round(i * (total - 1) / (k - 1))) for i in range(k)]
    return list(range(max(total, 0)))


def chunk_reader_frame_census(text_len: int) -> int:
    """Deterministic stand-in for a chunk's asset-directory frame count
    (the sandbox has no video files): one frame per 40 chars of chunk
    text, at least 1 — both engine and oracle derive it identically."""
    return max(int(text_len) // 40, 1)


def fake_vlm_answer(chunk_text: str, query: str) -> str:
    """Deterministic ChunkReader VLM response through the structured-
    JSON malform→repair→parse cycle (the U4 fake-LLM pattern: the
    response SHAPE is an LLM's, deliberately malformed in a
    content-preserving style picked by a content hash, so the repair
    path runs end to end and the parsed answer is exact)."""
    import hashlib as _hashlib
    import json as _json

    from .jsonrepair import repair_json

    # backticks are scrubbed from the excerpt (the C5 scrub, and a
    # fence INSIDE content would derail repair's fence extraction in
    # EVERY mode, not just the fenced one)
    answer = (
        f"Observed in frames: {chunk_text[:80].replace('`', '')} "
        f"[re: {query}]"
    )
    s = _json.dumps({"answer": answer})
    modes = [3, 0]
    if '"' not in answer and "'" not in answer:
        modes.append(1)
    if "}" not in answer and "]" not in answer:
        modes.append(2)
    pick = modes[
        int.from_bytes(_hashlib.sha1(answer.encode()).digest()[:2], "big")
        % len(modes)
    ]
    if pick == 0:
        raw = "The visual analysis:\n```json\n" + s + "\n```\n"
    elif pick == 1:
        raw = s.replace('"', "'")
    elif pick == 2:
        raw = s.replace("}", ",}")
    else:
        raw = s.replace('"answer":', "answer:", 1)
    doc = repair_json(raw)
    if isinstance(doc, dict) and isinstance(doc.get("answer"), str):
        return doc["answer"]
    return ""


def call_arg_string(input_data: Dict[str, str]) -> str:
    """Canonical one-line rendering of a tool call's input dict — the
    trace's ``arg`` column, shared by engine and oracle so the hash
    gates the exact call sequence (tool, arguments, order)."""
    return "&".join(f"{k}={input_data[k]}" for k in sorted(input_data))


def round_down_to_chunk(value: float, chunk_size: float) -> float:
    """graph_search_tool round_down_to_nearest_chunk_size: the filter
    range is widened outward to chunk boundaries before matching."""
    import math

    return math.floor(value / chunk_size) * chunk_size


def round_up_to_chunk(value: float, chunk_size: float) -> float:
    import math

    return math.ceil(value / chunk_size) * chunk_size
