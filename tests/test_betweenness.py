"""Pivot-sampled Brandes betweenness: replica bit-parity, classical
fixtures, rational-Brandes closeness, guards, plan discipline."""

import random
from fractions import Fraction

import pytest

from context_aware_rag_spark.operators.graph import betweenness_centrality
from context_aware_rag_spark.oracle.precompute import betweenness_py


def _edge_df(spark, rows):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in rows], "src long, dst long"
    )


def _run(spark, rows, n_pivots=32, max_depth=10):
    got = sorted(
        tuple(r)
        for r in betweenness_centrality(
            _edge_df(spark, rows), n_pivots=n_pivots, max_depth=max_depth
        ).collect()
    )
    exp = [
        tuple(t) for t in betweenness_py(rows, n_pivots, max_depth)
    ]
    return got, exp


def _brandes_exact(rows):
    """Exact rational Brandes (all sources, unbounded depth) — the
    textbook value the floored-micro estimate must track."""
    adj = {}
    for a, b in rows:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    bc = {v: Fraction(0) for v in nodes}
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        frontier = [s]
        t = 0
        while frontier:
            t += 1
            acc = {}
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        acc[w] = acc.get(w, 0) + sigma[u]
            if not acc:
                break
            for w, sg in acc.items():
                dist[w] = t
                sigma[w] = sg
            frontier = sorted(acc)
            levels.append(frontier)
        delta = {v: Fraction(0) for v in dist}
        for t in range(len(levels) - 1, 0, -1):
            for w in levels[t]:
                for p in adj[w]:
                    if dist.get(p) == t - 1:
                        delta[p] += (
                            Fraction(sigma[p], sigma[w]) * (1 + delta[w])
                        )
        for v in dist:
            if v != s:
                bc[v] += delta[v]
    return bc


class TestFixtures:
    def test_path_graph_middles_broker(self, spark):
        got, exp = _run(spark, [(1, 2), (2, 3), (3, 4)], n_pivots=10)
        assert got == exp
        # classical P4 pivot-summed dependencies: ends 0, middles 4
        assert got == [
            (1, 0, 4),
            (2, 4_000_000, 4),
            (3, 4_000_000, 4),
            (4, 0, 4),
        ]

    def test_star_center_brokers_everything(self, spark):
        rows = [(0, i) for i in range(1, 6)]
        got, exp = _run(spark, rows, n_pivots=10)
        assert got == exp
        # center: 2 * C(5,2) = 20 dependency units; leaves 0
        assert got[0] == (0, 20_000_000, 6)
        assert all(v == 0 for (_n, v, _k) in got[1:])

    def test_clique_all_zero(self, spark):
        rows = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got, exp = _run(spark, rows, n_pivots=10)
        assert got == exp
        assert all(v == 0 for (_n, v, _k) in got)

    def test_multi_edge_self_loop_direction_collapse(self, spark):
        # duplicates, reversed duplicates, and self-loops collapse to
        # the same simple path graph
        rows = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 3)]
        got, exp = _run(spark, rows, n_pivots=10)
        assert got == exp
        assert got == [(1, 0, 3), (2, 2_000_000, 3), (3, 0, 3)]

    def test_pivot_subsample_deterministic(self, spark):
        rows = [(1, 2), (2, 3), (3, 4), (4, 5)]
        got, exp = _run(spark, rows, n_pivots=2)
        assert got == exp
        assert got[0][2] == 2  # n_pivots_used honest

    def test_depth_horizon_truncates(self, spark):
        rows = [(i, i + 1) for i in range(6)]
        got, exp = _run(spark, rows, n_pivots=10, max_depth=1)
        assert got == exp
        # depth 1: no node is ever interior to a shortest path
        assert all(v == 0 for (_n, v, _k) in got)


class TestReplicaParity:
    def test_random_graphs_bit_exact(self, spark):
        rng = random.Random(20260820)
        for trial in range(4):
            n = rng.randint(8, 16)
            rows = [
                (rng.randint(0, n - 1), rng.randint(0, n - 1))
                for _ in range(rng.randint(12, 40))
            ]
            rows = [p for p in rows if p[0] != p[1]]
            if not rows:
                continue
            k = rng.choice([3, 7, 100])
            d = rng.choice([2, 10])
            got, exp = _run(spark, rows, n_pivots=k, max_depth=d)
            assert got == exp, (trial, k, d)

    def test_tracks_exact_rational_brandes(self, spark):
        """All-pivot floored-micro sums sit within n*|E| micro-units
        of the exact rational dependency (one floor per DAG edge per
        pivot)."""
        rng = random.Random(42)
        rows = list(
            {
                (rng.randint(0, 9), rng.randint(0, 9))
                for _ in range(25)
            }
        )
        rows = [p for p in rows if p[0] != p[1]]
        got, _ = _run(spark, rows, n_pivots=100, max_depth=10)
        exact = _brandes_exact(rows)
        slack = 10 * len(rows)  # pivots * edges floors, coarse bound
        for node, micro, _k in got:
            target = float(exact[node]) * 1_000_000
            assert abs(micro - target) <= slack, (node, micro, target)


class TestContract:
    def test_validation(self, spark):
        df = _edge_df(spark, [(1, 2)])
        with pytest.raises(ValueError, match="n_pivots"):
            betweenness_centrality(df, n_pivots=0)
        with pytest.raises(ValueError, match="max_depth"):
            betweenness_centrality(df, max_depth=0)

    def test_schema_and_zero_rows_present(self, spark):
        out = betweenness_centrality(
            _edge_df(spark, [(1, 2), (2, 3)]), n_pivots=4
        )
        assert [f.name for f in out.schema.fields] == [
            "node_id",
            "betweenness_micro",
            "n_pivots_used",
        ]
        rows = {r.node_id: r.betweenness_micro for r in out.collect()}
        # leaves appear with an honest 0, not absence
        assert rows[1] == 0 and rows[3] == 0

    def test_partitioning_invariance(self, spark):
        rows = [(i, (i * 3) % 11) for i in range(11)]
        rows = [p for p in rows if p[0] != p[1]]
        df1 = _edge_df(spark, rows).repartition(1)
        df7 = _edge_df(spark, rows).repartition(7)
        a = sorted(
            tuple(r)
            for r in betweenness_centrality(df1, n_pivots=5).collect()
        )
        b = sorted(
            tuple(r)
            for r in betweenness_centrality(df7, n_pivots=5).collect()
        )
        assert a == b

    def test_no_single_partition(self, spark):
        out = betweenness_centrality(
            _edge_df(spark, [(1, 2), (2, 3)]), n_pivots=4, max_depth=2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
