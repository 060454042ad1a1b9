"""Watermarked event-time windowed metrics (streaming/windowed_metrics.py):
append-mode emission, late-data drop across restarts, and batch
reconciliation of the finalized windows."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from context_aware_rag_spark.streaming.windowed_metrics import (
    read_metrics,
    start_windowed_metrics,
    windowed_turn_metrics,
)

T0 = dt.datetime(2026, 1, 1, 10, 0, 0)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


def _rows(minute_role_pairs):
    return [
        (f"c{m}", 0, role, f"turn at +{m}m", "", T0 + dt.timedelta(minutes=m))
        for m, role in minute_role_pairs
    ]


def _drain(spark, in_dir, out_dir):
    q = start_windowed_metrics(spark, in_dir, out_dir)
    q.awaitTermination(240)


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("wm_in"))
    out_dir = str(tmp_path_factory.mktemp("wm_out"))

    def write(pairs):
        spark.createDataFrame(_rows(pairs), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # run 1: two early windows [10:00,10:05) and [10:05,10:10)
    write([(0, "user"), (1, "assistant"), (2, "user"), (6, "user"), (7, "user")])
    _drain(spark, in_dir, out_dir)
    after_run1 = read_metrics(spark, out_dir).count()

    # run 2: +30m event -> watermark 10:20 finalizes both early windows
    write([(30, "user")])
    _drain(spark, in_dir, out_dir)

    # run 3: a LATE row at 10:01 (behind the 10:20 watermark, must be
    # dropped) plus an on-time row in the open 10:30 window
    write([(1, "user"), (31, "user")])
    _drain(spark, in_dir, out_dir)

    # run 4: advance the watermark to flush the 10:30 window
    write([(45, "user")])
    _drain(spark, in_dir, out_dir)

    return in_dir, out_dir, after_run1


def test_append_mode_emits_only_watermark_finalized_windows(spark, scenario):
    _, out_dir, after_run1 = scenario
    # nothing can finalize while the watermark is behind every window end
    assert after_run1 == 0
    got = {
        (r.window_start, r.role): (r.n_turns, r.n_chars)
        for r in read_metrics(spark, out_dir).collect()
    }
    w = lambda m: T0 + dt.timedelta(minutes=m)
    assert got == {
        (w(0), "user"): (2, len("turn at +0m") + len("turn at +2m")),
        (w(0), "assistant"): (1, len("turn at +1m")),
        (w(5), "user"): (2, len("turn at +6m") + len("turn at +7m")),
        # the 10:30 window holds ONLY the on-time rows: the 10:01 late
        # row was dropped, never resurrected into any window
        (w(30), "user"): (2, len("turn at +30m") + len("turn at +31m")),
    }


def test_finalized_windows_reconcile_with_batch(spark, scenario):
    in_dir, out_dir, _ = scenario
    # batch twin over the ON-TIME rows — the late row is the only
    # (ts=+1m, role=user) row (run 1's +1m turn was the assistant's).
    # Same aggregation function; withWatermark is a no-op in batch.
    on_time = spark.read.parquet(in_dir).filter(
        ~(
            (F.col("ts") == T0 + dt.timedelta(minutes=1))
            & (F.col("role") == "user")
        )
    )
    batch = {
        (r.window_start, r.role): (r.n_turns, r.n_chars, r.approx_convs)
        for r in windowed_turn_metrics(on_time).collect()
        if r.window_start <= T0 + dt.timedelta(minutes=30)
    }
    stream = {
        (r.window_start, r.role): (r.n_turns, r.n_chars, r.approx_convs)
        for r in read_metrics(spark, out_dir).collect()
    }
    assert stream == batch


def test_state_is_bounded_by_watermark(spark, scenario):
    # the sink only ever holds finalized windows; re-draining with no
    # new input is a no-op (idempotent restart, no duplicate emission)
    in_dir, out_dir, _ = scenario
    before = read_metrics(spark, out_dir).count()
    _drain(spark, in_dir, out_dir)
    assert read_metrics(spark, out_dir).count() == before
