"""Quad census: the aggregate/inversion arithmetic vs a brute-force
classifier (an INDEPENDENT algorithm: enumerate all C(n,4) node
subsets, classify each induced 4-node subgraph by its (edge count,
sorted degree sequence) signature — a complete isomorphism invariant
on 4 nodes, checked complete below)."""

import itertools
import random

import pytest

from context_aware_rag_spark.operators.triads import QUAD_CLASSES, quad_census

# representative undirected edge sets over nodes 0..3
_REPS = {
    "empty": [],
    "one_edge": [(0, 1)],
    "two_matching": [(0, 1), (2, 3)],
    "two_wedge": [(0, 1), (1, 2)],
    "three_triangle": [(0, 1), (1, 2), (0, 2)],
    "three_path": [(0, 1), (1, 2), (2, 3)],
    "three_star": [(0, 1), (0, 2), (0, 3)],
    "four_cycle": [(0, 1), (1, 2), (2, 3), (0, 3)],
    "four_tailed": [(0, 1), (1, 2), (0, 2), (0, 3)],
    "five_diamond": [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3)],
    "six_clique": list(itertools.combinations(range(4), 2)),
}


def _signature(edges4):
    """(edge count, sorted degree sequence) of a 4-node edge set."""
    deg = {i: 0 for i in range(4)}
    for a, b in edges4:
        deg[a] += 1
        deg[b] += 1
    return (len(edges4), tuple(sorted(deg.values(), reverse=True)))


_SIG_TO_CLASS = {_signature(v): k for k, v in _REPS.items()}
# completeness: the 11 signatures are distinct <=> invariant complete
assert len(_SIG_TO_CLASS) == 11


def _brute_census(n, edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    counts = {c: 0 for c in QUAD_CLASSES}
    for quad in itertools.combinations(range(n), 4):
        pos = {v: i for i, v in enumerate(quad)}
        local = [
            (pos[a], pos[b]) for a, b in und if a in pos and b in pos
        ]
        counts[_SIG_TO_CLASS[_signature(local)]] += 1
    return counts


def _spark_census(spark, n, edges, with_universe=True):
    if edges:
        df = spark.createDataFrame(
            [(f"v{a:02d}", f"v{b:02d}") for a, b in edges],
            "src string, dst string",
        )
    else:
        df = spark.createDataFrame([], "src string, dst string")
    nodes = (
        spark.createDataFrame([(f"v{i:02d}",) for i in range(n)], "v string")
        if with_universe
        else None
    )
    out = quad_census(df, nodes=nodes)
    return {r.clazz: r.n for r in out.collect()}


class TestRepresentatives:
    @pytest.mark.parametrize("clazz", QUAD_CLASSES)
    def test_each_catalog_image(self, spark, clazz):
        got = _spark_census(spark, 4, _REPS[clazz])
        want = {c: 0 for c in QUAD_CLASSES}
        want[clazz] = 1
        assert got == want


class TestRandomGraphs:
    @pytest.mark.parametrize(
        "seed,n,p", [(1, 9, 0.3), (2, 12, 0.18), (3, 10, 0.55), (4, 14, 0.1)]
    )
    def test_matches_brute_force(self, spark, seed, n, p):
        rng = random.Random(seed)
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < p
        ]
        assert _spark_census(spark, n, edges) == _brute_census(n, edges)

    def test_totals_sum_to_n_choose_4(self, spark):
        rng = random.Random(7)
        n = 11
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.25
        ]
        got = _spark_census(spark, n, edges)
        assert sum(got.values()) == n * (n - 1) * (n - 2) * (n - 3) // 24

    def test_hub_star_graph(self, spark):
        # a degree-9 hub: claw-heavy, zero cycles/triangles
        edges = [(0, i) for i in range(1, 10)]
        assert _spark_census(spark, 10, edges) == _brute_census(10, edges)


class TestContracts:
    def test_direction_duplicates_self_loops_collapse(self, spark):
        edges = [(0, 1), (1, 0), (0, 1), (1, 1), (1, 2), (2, 3), (0, 3)]
        assert _spark_census(spark, 4, edges) == _brute_census(
            4, [(0, 1), (1, 2), (2, 3), (0, 3)]
        )

    def test_isolated_nodes_feed_disconnected_classes_only(self, spark):
        got = _spark_census(spark, 6, [(0, 1), (1, 2), (0, 2)])
        assert got == _brute_census(6, [(0, 1), (1, 2), (0, 2)])
        assert got["three_triangle"] == 3  # triangle + each extra node
        assert got["six_clique"] == 0

    def test_default_universe_is_endpoints(self, spark):
        got = _spark_census(
            spark, 8, [(0, 1), (2, 3), (4, 5)], with_universe=False
        )
        # 6 endpoint nodes; quads of 3 disjoint edges: pick 2 edges
        # whole -> matching (3 ways); other quads have <=1 full edge
        assert got == _brute_census(6, [(0, 1), (2, 3), (4, 5)])
        assert got["two_matching"] == 3

    def test_under_four_nodes_all_zero(self, spark):
        got = _spark_census(spark, 3, [(0, 1), (1, 2), (0, 2)])
        assert all(v == 0 for v in got.values())

    def test_empty_graph_empty_universe(self, spark):
        got = _spark_census(spark, 0, [], with_universe=False)
        assert all(v == 0 for v in got.values())
