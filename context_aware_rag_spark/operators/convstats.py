"""Conversation-level transcript metrics.

The input table IS the reference's ingestion payload (BASELINE
input_hint: conv_id, turn_idx, role, text, tool, ts — multi-turn
agent transcripts), and the first thing an ingestion pipeline reports
on it is per-conversation shape: turn mix by role, tool usage,
temporal span, cadence, and user→assistant response latency. These
are the per-partition row-count/lineage-style metrics of the north
star applied at the conversation grain, and the skew probes (the
~50×-longer every-40th conversation in the synthetic corpus is
exactly what max-turn metrics surface).

100 TB shape: ONE conversation-keyed window (lag of ts and role share
the single Exchange with the ordering) + ONE map-side-combined
aggregation; integer epoch-micro arithmetic throughout (trunc `div`
for the mean — NULL over zero responses, never a fake 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_turn_metrics(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per conversation:

      (conv_id, n_turns, n_user, n_assistant, n_tool_role, n_system,
       n_tool_calls, n_distinct_tools, span_us, max_gap_us,
       n_responses, mean_response_us)

    where a "response" is an assistant turn immediately following a
    user turn (latency = its inter-turn gap), gaps order by
    ``turn_idx`` (the stable-ordering invariant of the north rule —
    never by timestamp, which can tie), and single-turn conversations
    report NULL max_gap_us.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_idx_col).asc())
    role = F.col(role_col)
    flagged = turns.select(
        F.col(conv_col).alias("conv_id"),
        role.alias("_role"),
        F.col(tool_col).alias("_tool"),
        us.alias("_us"),
        (us - F.lag(us).over(w)).alias("_gap"),
        F.lag(role).over(w).alias("_prev_role"),
    )
    is_resp = (F.col("_role") == "assistant") & (
        F.col("_prev_role") == "user"
    )
    cnt = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    return flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        cnt(F.col("_role") == "user").alias("n_user"),
        cnt(F.col("_role") == "assistant").alias("n_assistant"),
        cnt(F.col("_role") == "tool").alias("n_tool_role"),
        cnt(F.col("_role") == "system").alias("n_system"),
        cnt(F.col("_tool").isNotNull()).alias("n_tool_calls"),
        F.countDistinct("_tool").cast("int").alias("n_distinct_tools"),
        (F.max("_us") - F.min("_us")).alias("span_us"),
        F.max("_gap").alias("max_gap_us"),
        cnt(is_resp).alias("n_responses"),
        F.expr(
            "CASE WHEN sum(CASE WHEN _role = 'assistant'"
            " AND _prev_role = 'user' THEN 1 ELSE 0 END) > 0 THEN"
            " sum(CASE WHEN _role = 'assistant' AND _prev_role = 'user'"
            " THEN _gap ELSE 0 END)"
            " div sum(CASE WHEN _role = 'assistant'"
            " AND _prev_role = 'user' THEN 1 ELSE 0 END) END"
        ).alias("mean_response_us"),
    )
