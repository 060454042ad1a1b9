"""As-of join: backward match semantics, inclusive boundary, NULL
handling in right value columns, right-side dedup."""

from datetime import datetime, timedelta

from context_aware_rag_spark.operators import asof

T0 = datetime(2024, 6, 1, 0, 0, 0)


def _t(h):
    return T0 + timedelta(hours=h)


class TestAsofJoinBackward:
    def _join(self, spark, left_rows, right_rows, value_cols=("price",)):
        left = spark.createDataFrame(left_rows, "id: long, key: long, ts: timestamp")
        right = spark.createDataFrame(
            right_rows, "key: long, rts: timestamp, price: double, note: string"
        )
        return {
            r["id"]: tuple(r[c] for c in value_cols)
            for r in asof.asof_join_backward(
                left, right, "key", "key", "ts", "rts", list(value_cols)
            ).collect()
        }

    def test_backward_picks_latest_not_after(self, spark):
        out = self._join(
            spark,
            [(1, 7, _t(5)), (2, 7, _t(0))],
            [(7, _t(1), 10.0, "a"), (7, _t(4), 20.0, "b"), (7, _t(6), 30.0, "c")],
        )
        assert out == {1: (20.0,), 2: (None,)}

    def test_equal_timestamp_is_inclusive(self, spark):
        out = self._join(
            spark,
            [(1, 7, _t(4))],
            [(7, _t(4), 20.0, "a")],
        )
        assert out == {1: (20.0,)}

    def test_unmatched_key_left_semantics(self, spark):
        out = self._join(
            spark,
            [(1, 99, _t(5))],
            [(7, _t(1), 10.0, "a")],
        )
        assert out == {1: (None,)}

    def test_null_right_value_does_not_mix_rows(self, spark):
        # latest right row has price=NULL; per-column carry would
        # resurrect the OLDER row's 10.0 — the struct carry must not
        out = self._join(
            spark,
            [(1, 7, _t(5))],
            [(7, _t(1), 10.0, "a"), (7, _t(4), None, "b")],
            value_cols=("price", "note"),
        )
        assert out == {1: (None, "b")}

    def test_multiple_value_cols_from_same_row(self, spark):
        out = self._join(
            spark,
            [(1, 7, _t(10))],
            [(7, _t(1), 10.0, "old"), (7, _t(9), 99.0, "new")],
            value_cols=("price", "note"),
        )
        assert out == {1: (99.0, "new")}


class TestDedupRightLatest:
    def test_keeps_max_tiebreak_row(self, spark):
        right = spark.createDataFrame(
            [
                (7, _t(1), 100, 1.0),
                (7, _t(1), 200, 2.0),
                (7, _t(2), 50, 5.0),
            ],
            "key: long, rts: timestamp, ord: long, price: double",
        )
        out = {
            (r["key"], r["rts"]): (r["ord"], r["price"])
            for r in asof.dedup_right_latest(right, "key", "rts", "ord").collect()
        }
        assert out == {(7, _t(1)): (200, 2.0), (7, _t(2)): (50, 5.0)}
