"""SFT training-pair assembly from multi-turn transcripts.

A large-scale training-data pipeline over conversation/agent
transcripts ultimately emits (prompt, response) pairs for supervised
fine-tuning. This operator turns the engine's input table
(conv_id, turn_idx, role, text, ...) into those pairs:

- A **response unit** is a maximal run of consecutive assistant-role
  turns (an agent answer often spans several turns, e.g. text
  interleaved around tool calls is NOT merged — a tool turn breaks
  the run, exactly as it breaks the assistant's utterance).
- One pair per response unit: ``response`` = the run's turn texts
  joined in turn order; ``prompt`` = the last ``context_turns`` turns
  strictly before the run, each rendered ``role: text`` and joined
  with newlines (every role kept — tool output is context an agent
  model must condition on).
- ``prev_role`` (the role immediately before the run; NULL for a
  conversation-opening run) is emitted, not filtered on: a vanilla
  chat-SFT consumer keeps ``prev_role = 'user'``; an agent-trajectory
  consumer also keeps ``prev_role = 'tool'`` (the model must learn to
  continue after tool results). The operator doesn't guess.

Determinism discipline: ordering is (turn_idx) per conversation — the
payload's stable-ordering invariant; run identity is the classic
gaps-and-islands running sum, so ``pair_id`` = turn_idx of the run's
first turn is stable under any partitioning. Pure column ops, no
UDFs, no floats.

100 TB shape: ONE conv-keyed Exchange serves everything — the lag
(run starts), the running sum (run ids), the prompt-context window
(rowsBetween(-k, -1)), and the per-run groupBy all share the same
partitioning+ordering, so Catalyst plans one sort-based window chain
plus a partial agg. Per-row state is O(context_turns); a 400k-turn
conversation streams through one task without materializing the
conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sft_pairs(
    turns: DataFrame,
    context_turns: int = 4,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    response_role: str = "assistant",
) -> DataFrame:
    """Assemble (prompt, response) pairs from transcript turns.

    Returns one row per maximal ``response_role`` run:
    (group_col, pair_id, prev_role, prompt, response, n_context_turns,
    n_response_turns). ``pair_id`` is the run's first ``order_col``.
    ``prompt`` is NULL (never an empty fake) when the run opens the
    conversation — there is nothing to condition on.
    """
    if context_turns < 1:
        raise ValueError(f"need context_turns >= 1: {context_turns}")

    g, o = group_col, order_col
    w = Window.partitionBy(g).orderBy(F.col(o).asc())
    is_resp = F.col(role_col) == response_role
    prev_role = F.lag(role_col).over(w)
    run_start = is_resp & (
        F.coalesce(prev_role != response_role, F.lit(True))
    )
    rendered = F.concat_ws(
        ": ", F.coalesce(F.col(role_col), F.lit("")), F.col(text_col)
    )
    ctx = F.collect_list(
        F.struct(F.col(o).alias("_o"), rendered.alias("_line"))
    ).over(w.rowsBetween(-context_turns, -1))

    marked = turns.select(
        F.col(g),
        F.col(o),
        F.col(role_col),
        F.col(text_col),
        is_resp.alias("_is_resp"),
        prev_role.alias("_prev_role"),
        run_start.cast("long").alias("_start"),
        F.when(run_start, F.size(ctx)).alias("_n_ctx"),
        F.when(
            run_start & (F.size(ctx) > 0),
            F.concat_ws(
                "\n",
                F.transform(F.array_sort(ctx), lambda s: s["_line"]),
            ),
        ).alias("_prompt"),
    )
    # run id: running count of run starts — turns before the first
    # run get 0 and are dropped by the _is_resp filter anyway
    run_id = F.sum("_start").over(w)
    runs = (
        marked.withColumn("_run", run_id)
        .filter(F.col("_is_resp"))
        .groupBy(g, "_run")
        .agg(
            F.min(o).alias("pair_id"),
            F.max(F.when(F.col("_start") == 1, F.col("_prev_role"))).alias(
                "prev_role"
            ),
            F.max("_prompt").alias("prompt"),
            F.max(F.coalesce(F.col("_n_ctx"), F.lit(0))).alias(
                "n_context_turns"
            ),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(o).alias("_o"),
                                F.col(text_col).alias("_t"),
                            )
                        )
                    ),
                    lambda s: s["_t"],
                ),
            ).alias("response"),
            F.count(F.lit(1)).alias("n_response_turns"),
        )
        .drop("_run")
    )
    return runs.select(
        g,
        "pair_id",
        "prev_role",
        "prompt",
        F.col("n_context_turns").cast("int").alias("n_context_turns"),
        "response",
        F.col("n_response_turns").cast("int").alias("n_response_turns"),
    )
