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


def episode_spans(
    events: DataFrame,
    key_cols: "list[str]",
    gap_seconds: int = 86400,
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Gap-split validity EPISODES over a composite key — the temporal
    counterpart of :func:`sessionize` for facts instead of users: a
    timestamped stream of observations of the same key (a (subj,
    pred, obj) triple's mentions, a (user, event_type) habit) splits
    into maximal runs whose internal gaps are <= ``gap_seconds``
    (strictly greater starts a new episode — sessionize's
    convention). One row per episode:

      (*key_cols, episode_idx, start_ts, end_ts, duration_us, n_obs)

    with episode_idx 1-based per key in time order. This is how a KG
    gets triple VALIDITY intervals out of raw mention timestamps —
    "employed_by held from March to November, then again from
    January" — the kg-temporal layer SCD2 can't produce (SCD2 needs a
    changelog; mentions are observations).

    Determinism: order within a key is (ts, tie_col) — pass a unique
    tie-breaker, the sessionize contract. 100 TB shape: ONE key-keyed
    window (lag + running sum share the single Exchange — the
    sessionize plan shape) + ONE map-side-combined agg on
    (key, episode_idx). Hot keys make wide single-task windows — the
    documented window caveat; keys here are facts, naturally much
    finer than users.
    """
    if not key_cols:
        raise ValueError("episode_spans: need at least one key column")
    if gap_seconds < 0:
        raise ValueError(f"need gap_seconds >= 0, got {gap_seconds}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = events.select(
        *key_cols,
        F.col(ts_col),
        F.col(tie_col),
        us.alias("_us"),
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > gap_seconds * 1_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    ).select(
        *key_cols,
        F.col(ts_col),
        "_us",
        F.sum("_new").over(wrun).cast("int").alias("episode_idx"),
    )
    return flagged.groupBy(*key_cols, "episode_idx").agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
        F.count(F.lit(1)).alias("n_obs"),
    )
