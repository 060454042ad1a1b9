"""Sessionization: boundary semantics, determinism on ties, stats."""

from datetime import datetime, timedelta

from context_aware_rag_spark.operators import sessions

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp"
    )


class TestSessionize:
    def test_gap_boundary_is_strict(self, spark):
        # gaps: exactly 60s (same session), 60.000001s (new session)
        rows = [
            (0, 1, T0),
            (1, 1, T0 + timedelta(seconds=60)),
            (2, 1, T0 + timedelta(seconds=120, microseconds=1)),
        ]
        out = {
            r["event_id"]: r["session_idx"]
            for r in sessions.sessionize(
                _events(spark, rows), gap_seconds=60
            ).collect()
        }
        assert out == {0: 1, 1: 1, 2: 2}

    def test_per_user_independent_and_ids(self, spark):
        rows = [
            (0, 1, T0),
            (1, 2, T0 + timedelta(seconds=5)),
            (2, 1, T0 + timedelta(hours=2)),
            (3, 2, T0 + timedelta(seconds=10)),
        ]
        out = {
            r["event_id"]: (r["session_idx"], r["session_id"])
            for r in sessions.sessionize(
                _events(spark, rows), gap_seconds=1800
            ).collect()
        }
        assert out == {
            0: (1, "1#1"),
            2: (2, "1#2"),
            1: (1, "2#1"),
            3: (1, "2#1"),
        }

    def test_equal_timestamps_tiebreak_on_event_id(self, spark):
        rows = [(5, 1, T0), (3, 1, T0), (4, 1, T0 + timedelta(hours=1))]
        out = sessions.sessionize(_events(spark, rows), gap_seconds=60)
        got = {r["event_id"]: r["session_idx"] for r in out.collect()}
        assert got == {3: 1, 5: 1, 4: 2}

    def test_session_stats(self, spark):
        rows = [
            (0, 1, T0),
            (1, 1, T0 + timedelta(seconds=30)),
            (2, 1, T0 + timedelta(hours=3)),
        ]
        labeled = sessions.sessionize(_events(spark, rows), gap_seconds=1800)
        stats = {
            r["session_id"]: (r["n_events"], r["duration_us"])
            for r in sessions.session_stats(labeled).collect()
        }
        assert stats == {"1#1": (2, 30_000_000), "1#2": (1, 0)}

    def test_single_window_shuffle(self, spark):
        rows = [(i, i % 3, T0 + timedelta(seconds=i)) for i in range(30)]
        plan = (
            sessions.sessionize(_events(spark, rows))
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        # both the lag and the running sum ride ONE user-keyed exchange
        assert plan.count(") Exchange") == 1
        assert "hashpartitioning(user_id" in plan


# ---------------------------------------------------------------------------
# episode spans (composite-key gap islands)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.operators.sessions import episode_spans


def _obs(spark, rows):
    # (subj, pred, second, event_id)
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (s, p, base + dt.timedelta(seconds=sec), i)
            for i, (s, p, sec) in enumerate(rows)
        ],
        "subj: string, pred: string, ts: timestamp, event_id: long",
    )


class TestEpisodeSpans:
    def test_gap_splits_episodes(self, spark):
        ev = _obs(
            spark,
            [("a", "knows", 0), ("a", "knows", 50), ("a", "knows", 200),
             ("a", "knows", 240)],
        )
        out = sorted(
            (r.episode_idx, r.n_obs, r.duration_us)
            for r in episode_spans(
                ev, ["subj", "pred"], gap_seconds=100
            ).collect()
        )
        assert out == [(1, 2, 50_000_000), (2, 2, 40_000_000)]

    def test_strictly_greater_starts_new(self, spark):
        # gap EXACTLY equal to the threshold stays in the episode
        ev = _obs(spark, [("a", "p", 0), ("a", "p", 100)])
        out = episode_spans(ev, ["subj", "pred"], gap_seconds=100).collect()
        assert len(out) == 1 and out[0].n_obs == 2

    def test_keys_do_not_mix(self, spark):
        ev = _obs(
            spark,
            [("a", "p", 0), ("a", "q", 10), ("b", "p", 20)],
        )
        out = episode_spans(ev, ["subj", "pred"], gap_seconds=5).collect()
        assert len(out) == 3
        assert all(r.episode_idx == 1 and r.n_obs == 1 for r in out)

    def test_validation(self, spark):
        ev = _obs(spark, [("a", "p", 0)])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="key column"):
            episode_spans(ev, [])
        with _pytest.raises(ValueError, match="gap_seconds"):
            episode_spans(ev, ["subj"], gap_seconds=-1)
