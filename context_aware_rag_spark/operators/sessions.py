"""Gap-based sessionization of event streams.

Standard analytics primitive the reference's event model implies but
never materializes (its per-conversation batching is fixed-size, not
time-gap — batcher.py groups by arrival index): split each user's
event sequence into sessions wherever the inter-event gap exceeds a
threshold, label every event with a deterministic session id.

Determinism discipline: gaps are compared in integer MICROSECONDS
(``unix_micros``), so the boundary decision is exact integer
arithmetic on both engines (and invariant under the session-timezone
offset a NTZ->timestamp cast applies — only differences are used).
Equal-timestamp events are ordered by event id.

100 TB shape: ONE window shuffle keyed on the user column; cost and
skew are bounded by the hottest single user's event count (millions of
events for one key stream through one task — acceptable; a user hot
enough to break that needs an application-level key split, which the
session semantics cannot do automatically without changing results).
The running ``sum(is_new)`` rides the same window — no second
exchange. Session stats are one further groupBy on session_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Label every event with its session: a new session starts at a
    user's first event and whenever the gap since the previous event
    exceeds ``gap_seconds`` (strictly greater, the common analytics
    convention). Returns the input columns plus ``session_idx``
    (1-based per user) and ``session_id`` (``"<user>#<idx>"``)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(event_id_col).asc()
    )
    gap_us = int(gap_seconds) * 1_000_000
    is_new = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_idx = events.withColumn(
        "session_idx",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return with_idx.withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col).cast("string"), F.col("session_idx")),
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup over a ``sessionize`` output: event count,
    start/end timestamps, duration in integer microseconds."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return sessions.groupBy("session_id").agg(
        F.first(user_col).alias(user_col),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )
