"""Session-window streaming metrics: append emission of closed
sessions, merge semantics, and reconciliation against the batch
sessionize operator."""

import datetime as dt

import pytest

from context_aware_rag_spark.operators import sessions
from context_aware_rag_spark.streaming.session_metrics import (
    read_session_metrics,
    session_window_stats,
    start_session_metrics,
)

T0 = dt.datetime(2026, 3, 1, 9, 0, 0)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _rows(id_user_minute):
    return [
        (i, T0 + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
        for i, u, m in id_user_minute
    ]


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("sm_in"))
    out_dir = str(tmp_path_factory.mktemp("sm_out"))

    def write(rows):
        spark.createDataFrame(_rows(rows), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # user 1: two sessions (gap 45m > 30m threshold); user 2: one
    events = [
        (0, 1, 0),
        (1, 1, 10),
        (2, 1, 55),
        (3, 2, 5),
        (4, 2, 20),
    ]
    write(events)
    q = start_session_metrics(spark, in_dir, out_dir, gap="30 minutes",
                              late_allowance="1 hour")
    q.awaitTermination(240)
    n_closed_early = (
        read_session_metrics(spark, out_dir).count()
        if _sink_exists(spark, out_dir)
        else 0
    )
    # watermark pusher: far-future event closes everything above
    write([(99, 9, 600)])
    q = start_session_metrics(spark, in_dir, out_dir, gap="30 minutes",
                              late_allowance="1 hour")
    q.awaitTermination(240)
    return in_dir, out_dir, n_closed_early, events


def _sink_exists(spark, out_dir):
    try:
        read_session_metrics(spark, out_dir)
        return True
    except Exception:
        return False


def test_closed_sessions_and_merge_semantics(spark, scenario):
    _, out_dir, n_closed_early, _ = scenario
    # first drain: watermark = 9:55 - 1h < every session end -> nothing closed
    assert n_closed_early == 0
    got = {
        (r.user_id, r.session_start): (r.n_events, r.last_event_ts)
        for r in read_session_metrics(spark, out_dir).collect()
    }
    t = lambda m: T0 + dt.timedelta(minutes=m)
    assert got == {
        (1, t(0)): (2, t(10)),
        (1, t(55)): (1, t(55)),
        (2, t(5)): (2, t(20)),
    }


def test_session_end_is_last_plus_gap(spark, scenario):
    _, out_dir, _, _ = scenario
    for r in read_session_metrics(spark, out_dir).collect():
        assert r.session_end == r.last_event_ts + dt.timedelta(minutes=30)


def test_reconciles_with_batch_sessionize(spark, scenario):
    _, _, _, events = scenario
    batch = spark.createDataFrame(_rows(events), SCHEMA)
    # batch twin 1: the same function on a batch frame
    twin = {
        (r.user_id, r.session_start): r.n_events
        for r in session_window_stats(batch, gap="30 minutes").collect()
    }
    # batch twin 2: the per-event labeler -> stats (no gap == threshold
    # in the fixture, so the boundary conventions agree)
    labeled = sessions.sessionize(batch, gap_seconds=1800)
    stats = {
        (r.user_id, r.start_ts): r.n_events
        for r in sessions.session_stats(labeled).collect()
    }
    assert twin == stats
    assert len(twin) == 3
