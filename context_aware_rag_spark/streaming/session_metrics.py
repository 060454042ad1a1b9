"""Streaming session metrics via native session windows.

The batch twin (operators/sessions.py) labels every event with a
session id through a user-keyed window; on an unbounded stream that
shape is impossible (the "previous event" may be arbitrarily far in
the past), so the streaming form is Spark's built-in SESSION WINDOW
aggregation: state merges events whose gaps stay under the threshold
and the watermark closes a session once no mergeable event can still
arrive (max event time - late_allowance > last_event + gap).

    readStream → withWatermark(ts) → groupBy(session_window(ts, gap),
                                             user) → append

Boundary convention note (tested): ``session_window`` starts a NEW
session when the inter-event gap is >= the threshold (the window is
[start, last+gap), end-exclusive), while the batch
``sessions.sessionize`` splits only on gaps STRICTLY greater. The two
agree on every gap != threshold; reconciliation tests avoid the exact
boundary.

State size: one open session per (user, session) newer than the
watermark — bounded by active users, independent of history length.
Append mode makes the sink immutable and replay-idempotent, the same
contract as streaming/windowed_metrics.py.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    late_allowance: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(user, session) rollup with merge-on-gap session windows.

    Works on a streaming frame (watermark gates append emission and
    bounds state) AND on a batch frame (withWatermark is a no-op),
    so the same function computes the reconciliation twin.
    ``session_end`` is Spark's convention: last event time + gap.
    """
    return (
        events.withWatermark(ts_col, late_allowance)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(ts_col).alias("first_event_ts"),
            F.max(ts_col).alias("last_event_ts"),
        )
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "first_event_ts",
            "last_event_ts",
        )
    )


def start_session_metrics(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    gap: str = "30 minutes",
    late_allowance: str = "2 hours",
    checkpoint_dir: Optional[str] = None,
    available_now: bool = True,
):
    """File-source event stream → session-window stats → parquet
    append sink (one immutable row per closed session)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    stats = session_window_stats(stream, gap, late_allowance)
    writer = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "session_metrics"))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_session_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "session_metrics"))
