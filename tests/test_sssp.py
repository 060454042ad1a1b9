"""Weighted shortest distances (graph.sssp_distances) vs a pure-Python
bounded Bellman-Ford replication (an independent min-over-paths
enumeration of the same <=t-hop contract) and hand geometries."""

import random

import pytest

from context_aware_rag_spark.operators import graph


def _sssp_py(triples, seeds, max_hops, directed=True):
    # bounded Bellman-Ford: after t rounds dist = exact min over
    # <=t-hop paths — the operator's documented contract
    adj = {}
    for u, v, w in triples:
        if u == v:
            continue
        if (u, v) not in adj or w < adj[(u, v)]:
            adj[(u, v)] = w
        if not directed:
            if (v, u) not in adj or w < adj[(v, u)]:
                adj[(v, u)] = w
    dist = {s: 0 for s in seeds}
    for _ in range(max_hops):
        nxt = dict(dist)
        for (u, v), w in adj.items():
            if u in dist and (v not in nxt or dist[u] + w < nxt[v]):
                nxt[v] = dist[u] + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def _sssp_map(spark, triples, seeds, **kw):
    df = spark.createDataFrame(triples, "src: string, dst: string, weight: long")
    return {
        r.node_id: r.dist
        for r in graph.sssp_distances(df, seeds, **kw).collect()
    }


def test_sssp_prefers_cheap_long_path_over_short_hop(spark):
    # direct edge costs 10; the 3-hop detour costs 3 — BFS would pick
    # the direct edge, weighted SSSP must not
    triples = [
        ("a", "z", 10),
        ("a", "b", 1), ("b", "c", 1), ("c", "z", 1),
    ]
    assert _sssp_map(spark, triples, ["a"], max_hops=10) == {
        "a": 0, "b": 1, "c": 2, "z": 3
    }
    # hop bound below the detour's length falls back to the direct edge
    assert _sssp_map(spark, triples, ["a"], max_hops=2) == {
        "a": 0, "b": 1, "c": 2, "z": 10
    }


def test_sssp_multi_source_undirected_and_parallel_edges(spark):
    triples = [
        ("1", "2", 5), ("2", "1", 2),   # directed pair, min kept undirected
        ("2", "3", 4), ("2", "3", 1),   # parallel edges collapse to min
        ("3", "4", 7),
    ]
    assert _sssp_map(
        spark, triples, ["1", "4"], max_hops=10, directed=False
    ) == {"1": 0, "2": 2, "3": 3, "4": 0}


def test_sssp_zero_weights_and_unreachable_absent(spark):
    triples = [("a", "b", 0), ("b", "c", 0), ("x", "y", 1)]
    assert _sssp_map(spark, triples, ["a"], max_hops=10) == {
        "a": 0, "b": 0, "c": 0
    }


def test_sssp_matches_python_random_graph(spark):
    rng = random.Random(29)
    nodes = [str(i) for i in range(35)]
    triples = [
        (rng.choice(nodes), rng.choice(nodes), rng.randrange(0, 20))
        for _ in range(140)
    ]
    for directed in (True, False):
        for hops in (3, 12):
            got = _sssp_map(
                spark, triples, ["0", "1"], max_hops=hops, directed=directed
            )
            assert got == _sssp_py(
                triples, ["0", "1"], hops, directed=directed
            ), (directed, hops)


def test_sssp_validation_and_negative_weight_guard(spark):
    df = spark.createDataFrame(
        [("a", "b", 1)], "src: string, dst: string, weight: long"
    )
    with pytest.raises(ValueError):
        graph.sssp_distances(df, [])
    with pytest.raises(ValueError):
        graph.sssp_distances(df, ["a", "a"])
    with pytest.raises(ValueError):
        graph.sssp_distances(df, ["a"], max_hops=-1)
    neg = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", -2)], "src: string, dst: string, weight: long"
    )
    with pytest.raises(Exception, match="non-null and >= 0"):
        graph.sssp_distances(neg, ["a"]).collect()
