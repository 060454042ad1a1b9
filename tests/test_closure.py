"""Temporal triadic closure: brute-force parity, tie discipline, plans."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import closure as cl


def _edge_df(spark, rows):
    return spark.createDataFrame(rows, "lo string, hi string, t_s long")


def _brute(rows):
    """Pure-Python oracle: events + census from (lo, hi, t) edges."""
    et = {(lo, hi): t for lo, hi, t in rows}
    nodes = sorted({n for e in et for n in e})
    adj = {n: set() for n in nodes}
    for lo, hi in et:
        adj[lo].add(hi)
        adj[hi].add(lo)
    events = []
    for n1, n2, n3 in itertools.combinations(nodes, 3):
        pairs = [(n1, n2), (n1, n3), (n2, n3)]
        if not all(p in et for p in pairs):
            continue
        keyed = [(et[p], p[0], p[1]) for p in pairs]
        closer = max(keyed)
        rest = [k for k in keyed if k != closer]
        t_open = max(k[0] for k in rest)
        a, c = closer[1], closer[2]
        (b,) = [n for n in (n1, n2, n3) if n not in (a, c)]
        events.append((a, b, c, t_open, closer[0], closer[0] - t_open))
    census = []
    brokered = {}
    closed = {}
    for a, b, c, *_ in events:
        brokered[b] = brokered.get(b, 0) + 1
        for n in (a, b, c):
            closed[n] = closed.get(n, 0) + 1
    for n in nodes:
        d = len(adj[n])
        w = d * (d - 1) // 2
        census.append(
            (n, d, w, closed.get(n, 0), w - closed.get(n, 0),
             brokered.get(n, 0))
        )
    return sorted(events), sorted(census)


class TestClosureEvents:
    def test_single_triangle(self, spark):
        df = _edge_df(
            spark, [("a", "b", 10), ("b", "c", 20), ("a", "c", 50)]
        )
        rows = cl.closure_events(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.node_a, r.broker, r.node_c) == ("a", "b", "c")
        assert (r.t_open_s, r.t_close_s, r.delay_s) == (20, 50, 30)

    def test_open_wedge_emits_nothing(self, spark):
        df = _edge_df(spark, [("a", "b", 10), ("b", "c", 20)])
        assert cl.closure_events(df).count() == 0

    def test_all_ties_zero_delay_deterministic_closer(self, spark):
        # one chunk asserting a clique: every edge t=7; the closer is
        # the lexicographically largest sorted pair (b, c)
        df = _edge_df(spark, [("a", "b", 7), ("b", "c", 7), ("a", "c", 7)])
        r = cl.closure_events(df).collect()[0]
        assert (r.node_a, r.broker, r.node_c) == ("b", "a", "c")
        assert r.delay_s == 0

    def test_two_way_tie_for_last(self, spark):
        # (a,c) and (b,c) tie at t=9; (b,c) > (a,c) as a pair
        df = _edge_df(spark, [("a", "b", 1), ("a", "c", 9), ("b", "c", 9)])
        r = cl.closure_events(df).collect()[0]
        assert (r.node_a, r.broker, r.node_c) == ("b", "a", "c")
        assert (r.t_open_s, r.t_close_s, r.delay_s) == (9, 9, 0)

    def test_brute_force_parity_random(self, spark):
        rng = random.Random(20260820)
        for trial in range(4):
            n = 11
            nodes = [f"e{i:02d}" for i in range(n)]
            rows = [
                (a, b, rng.randrange(0, 40))
                for a, b in itertools.combinations(nodes, 2)
                if rng.random() < 0.38
            ]
            if not rows:
                continue
            want_ev, want_cen = _brute(rows)
            df = _edge_df(spark, rows)
            got_ev = sorted(
                tuple(r) for r in cl.closure_events(df).collect()
            )
            got_cen = sorted(
                tuple(r) for r in cl.closure_census(df).collect()
            )
            assert got_ev == want_ev, f"trial {trial} events"
            assert got_cen == want_cen, f"trial {trial} census"


class TestEdgeTimes:
    def test_direction_predicate_collapse_min_time(self, spark):
        a = spark.createDataFrame(
            [
                ("x", "likes", "y", 30),
                ("y", "knows", "x", 10),
                ("x", "likes", "x", 5),  # self-loop drops
            ],
            "subj_name string, pred string, obj_name string, ts_s long",
        )
        rows = cl.coassertion_edge_times(a).collect()
        assert [(r.lo, r.hi, r.t_s) for r in rows] == [("x", "y", 10)]


class TestCensus:
    def test_star_all_open(self, spark):
        # hub h with 4 leaves, no leaf-leaf edges: C(4,2)=6 open at h
        df = _edge_df(spark, [("h", f"l{i}", i) for i in range(1, 5)])
        cen = {r.node: r for r in cl.closure_census(df).collect()}
        h = cen["h"]
        assert (h.degree, h.n_wedges, h.n_closed, h.n_open,
                h.n_brokered) == (4, 6, 0, 6, 0)
        assert cen["l1"].n_wedges == 0

    def test_broker_identity(self, spark):
        df = _edge_df(
            spark, [("a", "b", 1), ("b", "c", 2), ("a", "c", 3)]
        )
        cen = {r.node: r for r in cl.closure_census(df).collect()}
        assert cen["b"].n_brokered == 1
        assert cen["a"].n_brokered == 0
        assert all(cen[n].n_closed == 1 for n in "abc")


class TestPlanAndDeterminism:
    def test_no_single_partition(self, spark):
        df = _edge_df(spark, [("a", "b", 1), ("b", "c", 2), ("a", "c", 3)])
        for out in (cl.closure_events(df), cl.closure_census(df)):
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "SinglePartition" not in plan, plan

    def test_partitioning_invariance(self, spark):
        rng = random.Random(7)
        nodes = [f"n{i}" for i in range(9)]
        rows = [
            (a, b, rng.randrange(0, 20))
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.5
        ]
        df1 = _edge_df(spark, rows)
        df2 = _edge_df(spark, rows).repartition(7, "t_s")
        a = sorted(tuple(r) for r in cl.closure_events(df1).collect())
        b = sorted(tuple(r) for r in cl.closure_events(df2).collect())
        assert a == b


class TestClosureRateSeries:
    def test_daily_buckets_and_cumulative(self, spark):
        day = 86400
        df = _edge_df(
            spark,
            [("a", "b", 0), ("b", "c", day + 10), ("a", "c", 2 * day + 5)],
        )
        rows = {
            r.bucket_s: r
            for r in cl.closure_rate_series(df, bucket_s=day).collect()
        }
        assert sorted(rows) == [0, day, 2 * day]
        assert (rows[0].n_new_edges, rows[0].n_closures) == (1, 0)
        assert (rows[day].n_new_edges, rows[day].n_closures) == (1, 0)
        r2 = rows[2 * day]
        assert (r2.n_new_edges, r2.n_closures, r2.n_zero_delay) == (1, 1, 0)
        # wedge completed at day+10, closed at 2*day+5
        assert r2.sum_delay_s == (2 * day + 5) - (day + 10)
        assert [rows[b].cum_closures for b in sorted(rows)] == [0, 0, 1]

    def test_zero_delay_clique_counted(self, spark):
        df = _edge_df(spark, [("a", "b", 7), ("b", "c", 7), ("a", "c", 7)])
        r = cl.closure_rate_series(df, bucket_s=86400).collect()[0]
        assert (r.n_new_edges, r.n_closures, r.n_zero_delay) == (3, 1, 1)
        assert r.sum_delay_s == 0

    def test_brute_parity_random(self, spark):
        rng = random.Random(42)
        nodes = [f"n{i}" for i in range(9)]
        rows = [
            (a, b, rng.randrange(0, 5 * 86400))
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.5
        ]
        want_ev, _ = _brute(rows)
        day = 86400
        eb, cb = {}, {}
        for _, _, t in rows:
            b = (t // day) * day
            eb[b] = eb.get(b, 0) + 1
        for _, _, _, t_open, t_close, delay in want_ev:
            b = (t_close // day) * day
            n, z, s = cb.get(b, (0, 0, 0))
            cb[b] = (n + 1, z + (delay == 0), s + delay)
        cum, want = 0, []
        for b in sorted(set(eb) | set(cb)):
            n, z, s = cb.get(b, (0, 0, 0))
            cum += n
            want.append((b, eb.get(b, 0), n, z, s, cum))
        got = sorted(
            tuple(r)
            for r in cl.closure_rate_series(
                _edge_df(spark, rows), bucket_s=day
            ).collect()
        )
        assert got == want

    def test_bad_bucket_raises(self, spark):
        df = _edge_df(spark, [("a", "b", 1)])
        with pytest.raises(ValueError):
            cl.closure_rate_series(df, bucket_s=0)
