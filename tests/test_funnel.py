"""Funnel + cohort retention: hand-built event sequences with every
boundary case (window edge, out-of-order completion, re-entry)."""

import datetime as dt

import pytest

from context_aware_rag_spark.operators import funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t)
            for u, s, t in rows
        ],
        "user_id: long, ts: timestamp, event_type: string",
    )


class TestFunnelCounts:
    def test_ordered_completion_and_window(self, spark):
        rows = [
            # u1 completes A -> B -> C tightly
            (1, 0, "A"), (1, 10, "B"), (1, 20, "C"),
            # u2: B BEFORE A (must not count for step 2), then no B after
            (2, 0, "B"), (2, 5, "A"),
            # u3: A then B exactly at the window edge (inclusive)
            (3, 0, "A"), (3, 100, "B"),
            # u4: A then B one past the window (excluded)
            (4, 0, "A"), (4, 101, "B"),
            # u5: greedy earliest-A, B relative to FIRST A
            (5, 0, "A"), (5, 50, "A"), (5, 120, "B"),
        ]
        out = {
            r.step: (r.event_type, r.n_users)
            for r in funnel.funnel_counts(
                _ev(spark, rows), ["A", "B", "C"], window_seconds=100
            ).collect()
        }
        assert out[1] == ("A", 5)
        # step 2: u1 (10s), u3 (edge, inclusive) — u4 past window, u2
        # has no B after A, u5's only B is 120s after its FIRST A
        assert out[2] == ("B", 2)
        assert out[3] == ("C", 1)

    def test_same_timestamp_not_counted(self, spark):
        # strict inequality: B at the same instant as A is not "after"
        rows = [(1, 0, "A"), (1, 0, "B")]
        out = {
            r.step: r.n_users
            for r in funnel.funnel_counts(
                _ev(spark, rows), ["A", "B"], window_seconds=60
            ).collect()
        }
        assert out == {1: 1, 2: 0}

    def test_validates(self, spark):
        df = _ev(spark, [(1, 0, "A")])
        with pytest.raises(ValueError, match="step"):
            funnel.funnel_counts(df, [], 60)
        with pytest.raises(ValueError, match="window"):
            funnel.funnel_counts(df, ["A"], 0)


class TestCohortRetention:
    def test_hand_computed(self, spark):
        day = 86400
        rows = [
            (1, 0 * day, "x"), (1, 7 * day, "x"),     # cohort 0, offsets 0 and 1
            (2, 1 * day, "x"), (2, 16 * day, "x"),    # cohort 0, offsets 0 and 2
            (3, 8 * day, "x"),                         # cohort 1, offset 0 only
        ]
        got = {
            (r.cohort_period, r.period_offset): r.n_users
            for r in funnel.cohort_retention(
                _ev(spark, rows), period_seconds=7 * day
            ).collect()
        }
        base = dt.datetime(2024, 1, 1).timestamp() // (7 * day)
        c0, c1 = int(base), int(base) + 1
        assert got == {(c0, 0): 2, (c0, 1): 1, (c0, 2): 1, (c1, 0): 1}

    def test_validates(self, spark):
        with pytest.raises(ValueError, match="period"):
            funnel.cohort_retention(_ev(spark, [(1, 0, "x")]), period_seconds=0)
