"""Unit tests: conv_turn_metrics (the precomputed corpus twin lives
in entry_queries and is swept by test_entry_contract)."""

import datetime as dt

from context_aware_rag_spark.operators.convstats import conv_turn_metrics


def _turns(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (conv, i, role, "text", tool, base + dt.timedelta(seconds=sec))
            for (conv, i, role, tool, sec) in rows
        ],
        "conv_id: string, turn_idx: int, role: string, text: string,"
        " tool: string, ts: timestamp",
    )


class TestConvTurnMetrics:
    def test_hand_computed(self, spark):
        rows = [
            ("c1", 0, "user", None, 0),
            ("c1", 1, "assistant", None, 5),    # response, latency 5s
            ("c1", 2, "tool", "search", 7),
            ("c1", 3, "user", None, 20),
            ("c1", 4, "assistant", None, 32),   # response, latency 12s
            ("c1", 5, "tool", "search", 33),
        ]
        r = {x.conv_id: x for x in conv_turn_metrics(_turns(spark, rows)).collect()}["c1"]
        assert (r.n_turns, r.n_user, r.n_assistant, r.n_tool_role) == (6, 2, 2, 2)
        assert r.n_system == 0
        assert r.n_tool_calls == 2 and r.n_distinct_tools == 1
        assert r.span_us == 33_000_000
        assert r.max_gap_us == 13_000_000
        assert r.n_responses == 2
        assert r.mean_response_us == (5_000_000 + 12_000_000) // 2

    def test_single_turn_nulls(self, spark):
        rows = [("c1", 0, "user", None, 0)]
        r = conv_turn_metrics(_turns(spark, rows)).collect()[0]
        assert r.n_turns == 1
        assert r.max_gap_us is None
        assert r.n_responses == 0 and r.mean_response_us is None

    def test_order_is_turn_idx_not_arrival(self, spark):
        # turn 1 has an EARLIER wall clock than turn 0 (clock skew);
        # gaps must follow turn_idx order -> negative gap surfaces
        rows = [
            ("c1", 0, "user", None, 10),
            ("c1", 1, "assistant", None, 3),
        ]
        r = conv_turn_metrics(_turns(spark, rows)).collect()[0]
        assert r.max_gap_us == -7_000_000
        assert r.mean_response_us == -7_000_000

    def test_assistant_after_tool_is_not_a_response(self, spark):
        rows = [
            ("c1", 0, "user", None, 0),
            ("c1", 1, "tool", "browser", 1),
            ("c1", 2, "assistant", None, 2),
        ]
        r = conv_turn_metrics(_turns(spark, rows)).collect()[0]
        assert r.n_responses == 0 and r.mean_response_us is None

    def test_conversations_stay_separate(self, spark):
        rows = [
            ("a", 0, "user", None, 0), ("a", 1, "assistant", None, 4),
            ("b", 0, "user", None, 100),
        ]
        out = {r.conv_id: r for r in conv_turn_metrics(_turns(spark, rows)).collect()}
        assert out["a"].n_responses == 1 and out["b"].n_responses == 0
        assert out["b"].span_us == 0
