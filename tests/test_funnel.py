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


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------

import datetime as _dt

import pytest as _pytest

from context_aware_rag_spark.operators.funnel import attribution


def _attr_ev(spark, rows):
    base = _dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, u, t, base + _dt.timedelta(seconds=sec))
            for i, (u, t, sec) in enumerate(rows)
        ],
        "event_id: long, user_id: long, event_type: string, ts: timestamp",
    )


class TestAttribution:
    ROWS = [
        (1, "click", 0),      # id 0
        (1, "view", 100),     # id 1
        (1, "click", 200),    # id 2
        (1, "purchase", 300), # id 3
        (2, "purchase", 50),  # id 4: no touches -> organic, no rows
    ]

    def test_linear_split_sums_to_one_million(self, spark):
        out = attribution(
            _attr_ev(spark, self.ROWS), "purchase", ["click", "view"],
            lookback_seconds=3600, model="linear",
        ).collect()
        assert {r.conversion_id for r in out} == {3}
        assert sorted(r.touch_id for r in out) == [0, 1, 2]
        by_touch = {r.touch_id: r.credit_ppm for r in out}
        # 1e6 div 3 = 333333; the LAST touch (id 2) takes the remainder
        assert by_touch[0] == by_touch[1] == 333_333
        assert by_touch[2] == 1_000_000 - 2 * 333_333
        assert sum(by_touch.values()) == 1_000_000

    def test_last_and_first_touch(self, spark):
        ev = _attr_ev(spark, self.ROWS)
        last = attribution(
            ev, "purchase", ["click", "view"], 3600, model="last_touch"
        ).collect()
        assert [(r.touch_id, r.credit_ppm) for r in last] == [(2, 1_000_000)]
        first = attribution(
            ev, "purchase", ["click", "view"], 3600, model="first_touch"
        ).collect()
        assert [(r.touch_id, r.credit_ppm) for r in first] == [(0, 1_000_000)]

    def test_lookback_excludes_old_and_same_instant(self, spark):
        rows = [
            (1, "click", 0),       # too old for 100s lookback
            (1, "click", 250),     # in window
            (1, "view", 300),      # same instant as conversion: excluded
            (1, "purchase", 300),
        ]
        out = attribution(
            _attr_ev(spark, rows), "purchase", ["click", "view"],
            lookback_seconds=100, model="linear",
        ).collect()
        assert [(r.touch_id, r.credit_ppm) for r in out] == [(1, 1_000_000)]

    def test_users_do_not_cross(self, spark):
        rows = [
            (1, "click", 0),
            (2, "purchase", 10),
        ]
        assert attribution(
            _attr_ev(spark, rows), "purchase", ["click"], 3600
        ).collect() == []

    def test_validation(self, spark):
        ev = _attr_ev(spark, self.ROWS)
        with _pytest.raises(ValueError, match="model"):
            attribution(ev, "purchase", ["click"], model="u_shaped")
        with _pytest.raises(ValueError, match="lookback"):
            attribution(ev, "purchase", ["click"], lookback_seconds=0)
        with _pytest.raises(ValueError, match="touch type"):
            attribution(ev, "purchase", [])
