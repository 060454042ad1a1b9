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

from pyspark.sql import DataFrame, Window
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


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: "list[str]",
    lookback_seconds: int = 604800,
    model: str = "linear",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch attribution: distribute each conversion's credit
    over the user's preceding touch events inside the lookback
    window. One row per (conversion, credited touch):

      (user_id, conversion_id, conversion_ts, touch_id, touch_type,
       touch_ts, n_touches, credit_ppm)

    ``model``:
      - ``"last_touch"`` / ``"first_touch"`` — the full 1e6 ppm to the
        latest / earliest eligible touch ((ts, id) ordering, so ties
        are deterministic);
      - ``"linear"`` — equal split, trunc 1e6 div n, with the
        REMAINDER assigned to the last touch so every conversion's
        credits sum to exactly 1,000,000 (the exactness contract a
        float split cannot make).

    Eligibility: touch strictly BEFORE the conversion (same-instant
    touches excluded — they did not cause it) and within
    ``lookback_seconds``. Conversions with zero eligible touches emit
    nothing (organic conversions are the caller's complement query).

    100 TB shape: conversions⋈touches is a per-user equi-join whose
    fan-out is bounded by the lookback window (the funnel_counts
    bounded-join argument); ranking/credit is one window over each
    conversion's eligible touch set (partition key = conversion id —
    perfectly fine-grained). Hot users are the join's skew case —
    AQE skew-join territory, same as every per-user join here.
    """
    if model not in ("linear", "last_touch", "first_touch"):
        raise ValueError(f"unknown attribution model: {model!r}")
    if lookback_seconds <= 0:
        raise ValueError(
            f"need lookback_seconds > 0, got {lookback_seconds}"
        )
    if not touch_types:
        raise ValueError("need at least one touch type")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
        us.alias("_cus"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("touch_ts"),
        us.alias("_tus"),
    )
    eligible = conv.join(touch, "user_id").filter(
        (F.col("_tus") < F.col("_cus"))
        & (F.col("_cus") - F.col("_tus") <= lookback_seconds * 1_000_000)
    )
    wdesc = Window.partitionBy("conversion_id").orderBy(
        F.col("_tus").desc(), F.col("touch_id").desc()
    )
    wasc = Window.partitionBy("conversion_id").orderBy(
        F.col("_tus").asc(), F.col("touch_id").asc()
    )
    ranked = eligible.select(
        "user_id", "conversion_id", "conversion_ts", "touch_id",
        "touch_type", "touch_ts",
        F.row_number().over(wdesc).alias("_rk_last"),
        F.row_number().over(wasc).alias("_rk_first"),
        F.count(F.lit(1)).over(Window.partitionBy("conversion_id")).alias(
            "n_touches"
        ),
    )
    if model == "last_touch":
        out = ranked.filter(F.col("_rk_last") == 1).withColumn(
            "credit_ppm", F.lit(1_000_000).cast("long")
        )
    elif model == "first_touch":
        out = ranked.filter(F.col("_rk_first") == 1).withColumn(
            "credit_ppm", F.lit(1_000_000).cast("long")
        )
    else:
        unit = F.expr("1000000 div n_touches")
        out = ranked.withColumn(
            "credit_ppm",
            F.when(
                F.col("_rk_last") == 1,
                F.lit(1_000_000) - unit * (F.col("n_touches") - 1),
            ).otherwise(unit).cast("long"),
        )
    return out.select(
        "user_id", "conversion_id", "conversion_ts", "touch_id",
        "touch_type", "touch_ts",
        F.col("n_touches").cast("long").alias("n_touches"),
        "credit_ppm",
    )
