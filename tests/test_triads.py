"""Triad census: distributed Batagelj–Mrvar arithmetic vs a brute-
force isomorphism-canonical classifier (an INDEPENDENT algorithm:
enumerate all C(n,3) triples, canonicalize each triple's arc pattern
over the 6 node permutations, map the canonical form to its class via
hand-written representative patterns from the standard catalog)."""

import itertools
import random

import pytest

from context_aware_rag_spark.operators.triads import CLASSES, triad_census

# representative arc patterns over nodes 0,1,2 (the catalog images)
_REPS = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)],                    # a<-b->c
    "021U": [(0, 1), (2, 1)],                    # a->b<-c
    "021C": [(0, 1), (1, 2)],                    # a->b->c
    "111D": [(0, 1), (1, 0), (2, 1)],            # a<->b<-c
    "111U": [(0, 1), (1, 0), (1, 2)],            # a<->b->c
    "030T": [(0, 1), (2, 1), (0, 2)],            # a->b<-c, a->c
    "030C": [(1, 0), (2, 1), (0, 2)],            # a<-b<-c, a->c
    "201": [(0, 1), (1, 0), (1, 2), (2, 1)],     # a<->b<->c
    "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],    # a<-b->c, a<->c
    "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],    # a->b<-c, a<->c
    "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],    # a->b->c, a<->c
    "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],  # a->b<->c, a<->c
    "300": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)],
}


def _canon(arcs):
    """Minimum arc-set over the 6 relabelings — the isomorphism key."""
    best = None
    for perm in itertools.permutations(range(3)):
        mapped = tuple(sorted((perm[a], perm[b]) for a, b in arcs))
        if best is None or mapped < best:
            best = mapped
    return best


_CANON_TO_CLASS = {_canon(v): k for k, v in _REPS.items()}
assert len(_CANON_TO_CLASS) == 16  # the 16 classes are non-isomorphic


def _brute_census(n, arcs):
    """Enumerate every node triple; classify via the canonical map."""
    arcset = set(arcs)
    counts = {c: 0 for c in CLASSES}
    for a, b, c in itertools.combinations(range(n), 3):
        trip = [a, b, c]
        local = [
            (trip.index(x), trip.index(y))
            for x, y in arcset
            if x in trip and y in trip
        ]
        counts[_CANON_TO_CLASS[_canon(local)]] += 1
    return counts


def _spark_census(spark, n, arcs, with_universe=True):
    edges = spark.createDataFrame(
        [(f"v{a:02d}", f"v{b:02d}") for a, b in arcs], "src string, dst string"
    )
    nodes = (
        spark.createDataFrame([(f"v{i:02d}",) for i in range(n)], "v string")
        if with_universe
        else None
    )
    out = triad_census(edges, nodes=nodes)
    return {r.clazz: r.n for r in out.collect()}


class TestRepresentatives:
    @pytest.mark.parametrize("clazz", CLASSES)
    def test_each_catalog_image(self, spark, clazz):
        got = _spark_census(spark, 3, _REPS[clazz])
        want = {c: 0 for c in CLASSES}
        want[clazz] = 1
        assert got == want


class TestRandomGraphs:
    @pytest.mark.parametrize("seed,n,p_arc", [(1, 9, 0.25), (2, 12, 0.15),
                                              (3, 10, 0.45), (4, 14, 0.08)])
    def test_matches_brute_force(self, spark, seed, n, p_arc):
        rng = random.Random(seed)
        arcs = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < p_arc
        ]
        assert _spark_census(spark, n, arcs) == _brute_census(n, arcs)

    def test_totals_sum_to_n_choose_3(self, spark):
        rng = random.Random(7)
        n = 11
        arcs = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.2
        ]
        got = _spark_census(spark, n, arcs)
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


class TestContracts:
    def test_duplicates_and_self_loops_ignored(self, spark):
        arcs = [(0, 1), (0, 1), (1, 1), (1, 2)]
        assert _spark_census(spark, 3, arcs) == _brute_census(
            3, [(0, 1), (1, 2)]
        )

    def test_isolated_nodes_shift_disconnected_classes(self, spark):
        # universe of 5 with one arc: extra nodes feed 012/003 only
        got = _spark_census(spark, 5, [(0, 1)])
        want = {c: 0 for c in CLASSES}
        want["012"] = 3   # {0,1,x} for the 3 extra nodes
        want["003"] = 7   # every triple missing 0 or 1 (C(5,3) - 3)
        assert got == want
        assert got == _brute_census(5, [(0, 1)])

    def test_default_universe_is_endpoints(self, spark):
        got = _spark_census(spark, 5, [(0, 1), (1, 0), (2, 3)],
                            with_universe=False)
        # 4 endpoint nodes -> C(4,3)=4 triples: {0,1,2},{0,1,3} are 102;
        # {0,2,3},{1,2,3} are 012
        want = {c: 0 for c in CLASSES}
        want["102"] = 2
        want["012"] = 2
        assert got == want

    def test_small_graph_under_three_nodes(self, spark):
        got = _spark_census(spark, 2, [(0, 1)])
        assert all(v == 0 for v in got.values())
