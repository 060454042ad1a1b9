"""Graph analytics: integer PageRank + degree stats (operators/graph.py)."""

import pytest

from context_aware_rag_spark.operators import graph
from context_aware_rag_spark.oracle.precompute import pagerank_py

# hub h with three followers, a chain, a dangling sink s, a self-loop
EDGES = [
    ("a", "h"), ("b", "h"), ("c", "h"),
    ("h", "a"),
    ("a", "b"), ("b", "c"),
    ("h", "s"),           # s has no out-edges: dangling
    ("x", "x"),           # self-loop, disconnected component
    ("a", "h"),           # duplicate pair must collapse
]


def _edges_df(spark, pairs=EDGES, parts=None):
    df = spark.createDataFrame(pairs, "src: string, dst: string")
    return df.repartition(parts) if parts else df


def test_pagerank_matches_python(spark):
    got = {
        r.node_id: r.rank_micro
        for r in graph.pagerank(_edges_df(spark)).collect()
    }
    assert got == pagerank_py(EDGES)


def test_partitioning_invariance(spark):
    a = {r.node_id: r.rank_micro for r in graph.pagerank(_edges_df(spark, parts=1)).collect()}
    b = {r.node_id: r.rank_micro for r in graph.pagerank(_edges_df(spark, parts=7)).collect()}
    assert a == b


def test_hub_outranks_leaves(spark):
    got = {r.node_id: r.rank_micro for r in graph.pagerank(_edges_df(spark)).collect()}
    # h is the hub of the connected component; x (a pure self-loop) is
    # a rank trap by construction and legitimately retains more mass
    comp = {k: v for k, v in got.items() if k != "x"}
    assert got["h"] == max(comp.values())
    assert got["h"] > got["c"]


def test_dangling_mass_redistributes(spark):
    # the sink's rank feeds back: every node (even the disconnected
    # self-loop) receives a share of s's mass on the next iteration,
    # so total mass stays ~N * 1e6 (floor-division leak only)
    got = {r.node_id: r.rank_micro for r in graph.pagerank(_edges_df(spark)).collect()}
    n = len(got)
    total = sum(got.values())
    assert n * 1_000_000 - total < n * 100  # leak bounded well below 100ppm
    assert got["s"] > 150_000  # more than bare teleport


def test_degree_stats(spark):
    got = {
        r.node_id: (r.out_deg, r.in_deg)
        for r in graph.degree_stats(_edges_df(spark)).collect()
    }
    assert got == {
        "a": (2, 1), "b": (2, 1), "c": (1, 1),
        "h": (2, 3), "s": (0, 1), "x": (1, 1),
    }


def test_single_iteration_and_validation(spark):
    df = _edges_df(spark)
    got = {r.node_id: r.rank_micro for r in graph.pagerank(df, iterations=1).collect()}
    assert got == pagerank_py(EDGES, iterations=1)
    with pytest.raises(ValueError):
        graph.pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        graph.pagerank(df, damping_pct=100)
