"""Event-sequence analytics: funnels and cohort retention.

Classic event-log questions over the ``events`` table shape
(user_id, ts, event_type):

- :func:`funnel_counts` — how many users complete step 1, steps 1-2,
  steps 1-2-3 ... IN ORDER, each step within ``window_seconds`` of
  the previous completed step. No per-user UDF and no sessionizing
  sort: step k is resolved as "min ts of a step-k event in
  (t_{k-1}, t_{k-1} + W]" — one filtered join + min-agg per step, all
  shuffled on user_id, so a funnel of depth d costs d bounded
  hash-aggregations regardless of per-user event counts.

- :func:`cohort_retention` — users bucketed by first-activity period;
  per (cohort, periods-since-cohort) distinct active users. Two
  aggregations and a broadcast-sized cohort map join.

Both are pure integer/timestamp arithmetic — fully SQL-twinnable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, event_type, n_users): users whose EARLIEST valid
    completion of each step falls within ``window_seconds`` AFTER
    (strictly) the previous step's completion. Earliest-completion
    semantics are the standard greedy funnel: later re-entries are
    ignored.

    100 TB shape: per step one equi-join on user (the completed-prefix
    side shrinks monotonically) + one min-agg; nothing is ever sorted
    or collected per user.
    """
    if len(steps) < 1:
        raise ValueError("need at least one step")
    if window_seconds < 1:
        raise ValueError(f"need window_seconds >= 1, got {window_seconds}")
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("timestamp").cast("long").alias("t"),
        F.col(type_col).alias("et"),
    )
    # localCheckpoint per step: the count action would otherwise re-run
    # the whole prefix chain at every step (O(d^2) scans)
    completed = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_done"))
        .localCheckpoint()
    )
    counts = [(1, steps[0], completed.count())]
    for k, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("et") == step).join(completed, "u")
        completed = (
            nxt.filter(
                (F.col("t") > F.col("t_done"))
                & (F.col("t") <= F.col("t_done") + window_seconds)
            )
            .groupBy("u")
            .agg(F.min("t").alias("t_done"))
            .localCheckpoint()
        )
        counts.append((k, step, completed.count()))
    spark = events.sparkSession
    return spark.createDataFrame(
        counts, "step: int, event_type: string, n_users: long"
    )


def cohort_retention(
    events: DataFrame,
    period_seconds: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_period, period_offset, n_users): distinct users from
    each first-activity cohort active again ``period_offset`` periods
    later (offset 0 = the cohort size itself). Periods are
    floor(epoch_seconds / period_seconds) — integer and engine-
    portable."""
    if period_seconds < 1:
        raise ValueError(f"need period_seconds >= 1, got {period_seconds}")
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.floor(
            F.col(ts_col).cast("timestamp").cast("long") / period_seconds
        ).alias("period"),
    )
    first = ev.groupBy("u").agg(F.min("period").alias("cohort_period"))
    return (
        ev.join(first, "u")
        .select(
            "u",
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct("u").alias("n_users"))
    )
