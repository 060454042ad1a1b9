"""graph_summary: fixtures, brute-force parity, ratio discipline."""

import itertools
import random

from context_aware_rag_spark.operators.triads import graph_summary


def _arc_df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _brute(rows):
    arcs = {(s, d) for s, d in rows if s != d}
    loops = {(s, d) for s, d in rows if s == d}
    dyads = {}
    for s, d in arcs:
        lo, hi = min(s, d), max(s, d)
        fwd, rev = dyads.get((lo, hi), (0, 0))
        dyads[(lo, hi)] = (fwd or int(s < d), rev or int(s > d))
    n_mutual = sum(1 for f, r in dyads.values() if f and r)
    nodes = sorted({n for e in dyads for n in e})
    adj = {n: set() for n in nodes}
    for lo, hi in dyads:
        adj[lo].add(hi)
        adj[hi].add(lo)
    n_wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    n_tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    n_arcs, n_dyads, n = len(arcs), len(dyads), len(nodes)
    return (
        n,
        len(loops),
        n_arcs,
        n_dyads,
        n_mutual,
        n_dyads - n_mutual,
        n_wedges,
        n_tri,
        (2_000_000 * n_mutual) // n_arcs if n_arcs else None,
        (1_000_000 * n_arcs) // (n * (n - 1)) if n > 1 else None,
        (3_000_000 * n_tri) // n_wedges if n_wedges else None,
    )


class TestGraphSummary:
    def test_triangle_with_mutual_and_loop(self, spark):
        df = _arc_df(
            spark,
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")],
        )
        r = graph_summary(df).collect()[0]
        assert (r.n_nodes, r.n_self_loops, r.n_arcs) == (3, 1, 4)
        assert (r.n_dyads, r.n_mutual, r.n_asym) == (3, 1, 2)
        assert (r.n_wedges, r.n_triangles) == (3, 1)
        assert r.reciprocity_e6 == 500_000
        assert r.density_e6 == 666_666
        assert r.transitivity_e6 == 1_000_000

    def test_star_no_triangles(self, spark):
        df = _arc_df(spark, [("h", f"l{i}") for i in range(4)])
        r = graph_summary(df).collect()[0]
        assert (r.n_arcs, r.n_mutual, r.n_wedges, r.n_triangles) == (
            4, 0, 6, 0,
        )
        assert r.reciprocity_e6 == 0
        assert r.transitivity_e6 == 0

    def test_empty_graph_null_ratios(self, spark):
        df = _arc_df(spark, []).filter("src IS NOT NULL")
        r = graph_summary(df).collect()[0]
        assert (r.n_nodes, r.n_arcs, r.n_dyads, r.n_triangles) == (0, 0, 0, 0)
        assert r.reciprocity_e6 is None
        assert r.density_e6 is None
        assert r.transitivity_e6 is None

    def test_duplicate_arcs_collapse(self, spark):
        df = _arc_df(spark, [("a", "b")] * 5 + [("b", "a")] * 2)
        r = graph_summary(df).collect()[0]
        assert (r.n_arcs, r.n_dyads, r.n_mutual) == (2, 1, 1)
        assert r.reciprocity_e6 == 1_000_000

    def test_brute_force_parity_random(self, spark):
        rng = random.Random(20260820)
        for trial in range(4):
            nodes = [f"e{i:02d}" for i in range(10)]
            rows = [
                (a, b)
                for a in nodes
                for b in nodes
                if rng.random() < 0.18
            ]
            if not any(a != b for a, b in rows):
                continue
            want = _brute(rows)
            got = tuple(graph_summary(_arc_df(spark, rows)).collect()[0])
            assert got == want, f"trial {trial}: {got} != {want}"
