"""Batch summarization branch (reference functions/summarization/batch.py).

Reference semantics: batches of ``batch_size`` docs (6 by default for
summarization — grag.yaml:57) are concatenated in doc_i order (A1,
batch.py:136), time bounds aggregated (A2, batch.py:160-207), chunk
indices collected (A3, batch.py:148-158), summarized by an LLM with
token-safe recursion (U4 + A10, utils.py:104-231), persisted as Summary
nodes (S6, neo4j_db.py:496-506) linked to their chunks via IN_SUMMARY
(J3, neo4j_db.py:558-576).

Spark shape: ONE groupBy((conv_id, batch_id)) produces concat + bounds +
collected indices together (single shuffle, partial aggregation
map-side); the summarize callable is a pandas UDF slot (deterministic
truncating stub here, LLM endpoint in production); IN_SUMMARY edges are
an explode + equi-join on (conv_id, turn_idx).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stub_summarize_udf(cap: int = 400):
    """Deterministic LLM-summarize stand-in: head of the text, with a
    marker so tests can recognize summarized output."""

    @F.pandas_udf(T.StringType())
    def summarize(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:
            yield s.fillna("").map(lambda t: ("[SUM] " + t)[: cap + 6])

    return summarize


# ---------------------------------------------------------------------------
# U4 — LLM summarization via the structured-JSON response cycle
# (reference functions/summarization/batch.py:122-145 routes batch text
# through an LLM chain; structured_inference.py:105-348 parses the
# model's structured JSON output — our fake LLM reproduces that
# response SHAPE, deliberately malformed in the classic LLM output
# styles, so the full parse path — repair (C10) + field extraction —
# runs end to end, exactly like the json_llm extractor mode for U1)
# ---------------------------------------------------------------------------

def fake_llm_summary_response(summary: str) -> str:
    """Deterministic stand-in for the LLM summarization call: wraps an
    already-computed summary in the structured JSON envelope a
    structured-inference chain returns (``{"summary": ...}``),
    malformed in one of the classic LLM output styles chosen by a hash
    of the content. Only content-preserving failure modes are eligible
    for a given summary (quote styles / trailing commas are skipped
    when the content itself contains the characters they rewrite), so
    repair + parse always reconstructs the summary EXACTLY — parity
    with the direct stub path is by construction, and the driver
    hash-gate checks it against the same precomputed oracle."""
    import hashlib as _hashlib
    import json as _json

    s = _json.dumps({"summary": summary})
    modes = [3, 4]
    if "```" not in summary:
        # a fence INSIDE the content would terminate the repair's fence
        # extraction early and truncate the summary
        modes.append(0)
    if '"' not in summary and "'" not in summary:
        modes.append(1)
    if "}" not in summary and "]" not in summary:
        modes.append(2)
    pick = modes[
        int.from_bytes(_hashlib.sha1(summary.encode()).digest()[:2], "big")
        % len(modes)
    ]
    if pick == 0:
        return "Here is the summary:\n```json\n" + s + "\n```\nDone."
    if pick == 1:
        return s.replace('"', "'")
    if pick == 2:
        return s.replace("}", ",}").replace("]", ",]")
    if pick == 3:
        # unquoted key (first occurrence IS the key: content quotes are
        # escaped by json.dumps, so the literal cannot appear in content)
        return s.replace('"summary":', "summary:", 1)
    return s.replace('{"summary":', '{"confidence": None, "summary":', 1)


def llm_summary_roundtrip(summary: str) -> str:
    """summary -> fake malformed LLM JSON -> repair (C10) -> parse."""
    from ..functions.jsonrepair import repair_json

    doc = repair_json(fake_llm_summary_response(summary))
    if isinstance(doc, dict) and isinstance(doc.get("summary"), str):
        return doc["summary"]
    return ""


def llm_summarize_udf(cap: int = 400):
    """U4 — the LLM summarization slot, closed: computes the summary
    content and routes it through the structured-JSON response cycle
    (malform -> repair -> parse), so a reference config with a
    summarization function maps onto a real (fake-LLM) summarizer, not
    a bare stub. Output equals ``stub_summarize_udf`` by construction
    (lossless response modes only)."""

    @F.pandas_udf(T.StringType())
    def summarize(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:
            yield s.fillna("").map(
                lambda t: llm_summary_roundtrip(("[SUM] " + t)[: cap + 6])
            )

    return summarize


def llm_tree_combine(cap: int = 500):
    """U4 slot for A10 tree recursion: the per-level combine routed
    through the same fake-LLM JSON cycle. Content equals
    ``treeagg.default_combine`` (substring of the ordered concat), so
    the tree output matches the a10 snapshot bit-for-bit."""

    @F.pandas_udf(T.StringType())
    def combine_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:
            yield s.fillna("").map(lambda t: llm_summary_roundtrip(t[:cap]))

    return lambda texts: combine_udf(F.array_join(texts, " "))


def summarize_batches(
    transcripts: DataFrame, batch_size: int = 6, cap: int = 400,
    summarize_udf=None,
) -> DataFrame:
    """transcripts -> summaries(conv_id, batch_id, summary, ts_min,
    ts_max, turn_idxs, n_turns). Single shuffle.

    ``summarize_udf`` is the U4 slot: any pandas UDF string->string
    (an LLM endpoint call in production — reference utils.py:104-231);
    defaults to the deterministic truncating stub."""
    df = transcripts.withColumn(
        "batch_id", (F.col("turn_idx") / batch_size).cast("long")
    ).filter(F.col("text") != ".")
    agg = df.groupBy("conv_id", "batch_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("batch_text"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.array_sort(F.collect_set("turn_idx")).alias("turn_idxs"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    summarize_udf = summarize_udf or stub_summarize_udf(cap)
    return agg.select(
        "conv_id",
        "batch_id",
        summarize_udf(F.col("batch_text")).alias("summary"),
        "ts_min",
        "ts_max",
        "turn_idxs",
        "n_turns",
    )


def retrieve_summary(
    summaries: DataFrame,
    batch_lo: int | None = None,
    batch_hi: int | None = None,
    conv_id: str | None = None,
    summarize_udf=None,
    cap: int = 400,
) -> DataFrame:
    """Summary retriever — the reference's summarization Q&A entry
    point (functions/summarization/summary_retriever.py:72-105 acall):
    fetch the stored batch summaries for a requested range, stuff them
    in batch order into one context per conversation
    (create_stuff_documents_chain), and run the summarization chain
    (the U4 slot) over the stitched context.

    Returns (conv_id, summary, n_batches, batch_lo, batch_hi) — one row
    per conversation with >= 1 summary in range. The range filter is on
    ``batch_id`` (the reference filters chunks on stored metadata the
    same way before stuffing); ``conv_id`` narrows to one stream (the
    reference's uuid). Single shuffle (the per-conv stitch groupBy);
    the summaries table is already tiny relative to the corpus.
    """
    df = summaries
    if conv_id is not None:
        df = df.filter(F.col("conv_id") == conv_id)
    if batch_lo is not None:
        df = df.filter(F.col("batch_id") >= batch_lo)
    if batch_hi is not None:
        df = df.filter(F.col("batch_id") <= batch_hi)
    stitched = df.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("batch_id", "summary"))),
                lambda s: s["summary"],
            ),
            " ",
        ).alias("_context"),
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.min("batch_id").alias("batch_lo"),
        F.max("batch_id").alias("batch_hi"),
    )
    summarize_udf = summarize_udf or llm_summarize_udf(cap)
    return stitched.select(
        "conv_id",
        summarize_udf(F.col("_context")).alias("summary"),
        "n_batches",
        "batch_lo",
        "batch_hi",
    )


def in_summary_edges(summaries: DataFrame, chunks: DataFrame) -> DataFrame:
    """J3 — UNWIND linked chunk indices MATCH chunk (neo4j_db.py:558-576):
    explode turn_idxs, equi-join chunks on (conv_id, turn_idx)."""
    exploded = summaries.select(
        "conv_id",
        "batch_id",
        F.explode("turn_idxs").alias("turn_idx"),
    )
    summary_id = F.sha1(
        F.concat_ws("_", F.lit("summary"), F.col("conv_id"), F.col("batch_id"))
    )
    return (
        exploded.join(
            chunks.select("conv_id", "turn_idx", "chunk_id").dropDuplicates(
                ["conv_id", "turn_idx", "chunk_id"]
            ),
            ["conv_id", "turn_idx"],
        )
        .select(
            F.col("chunk_id").alias("src"),
            summary_id.alias("dst"),
            F.lit("IN_SUMMARY").alias("rel_type"),
            "conv_id",
        )
        .dropDuplicates(["src", "dst"])
    )


def max_batch_index(summaries: DataFrame) -> DataFrame:
    """A6 — MATCH (s:Summary) RETURN max(s.batch_i) (neo4j_db.py:457-463)."""
    return summaries.groupBy("conv_id").agg(F.max("batch_id").alias("max_batch_id"))
