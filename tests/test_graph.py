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


def _tri(spark, pairs):
    return graph.triangle_count(
        spark.createDataFrame(pairs, "src: string, dst: string")
    ).collect()[0]


def test_triangle_k4(spark):
    # complete graph on 4 nodes: C(4,3) = 4 triangles; oriented
    # out-degrees 3/2/1/0 -> wedges C(3,2)+C(2,2)+0+0 = 4, all closed
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    r = _tri(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 4, 4)


def test_triangle_direction_dups_selfloops_collapse(spark):
    # reversed duplicates, repeated pairs and self-loops all reduce to
    # the simple undirected graph {ab, bc, ac}: one triangle
    pairs = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"),
             ("c", "b"), ("a", "c"), ("a", "b")]
    r = _tri(spark, pairs)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_triangle_star_hub_no_wedges(spark):
    # star: every edge orients leaf->hub (degree order), so the hub
    # contributes NO wedges despite degree 5 — the skew-boundedness
    # property the orientation buys at scale
    star = [("h", f"x{i}") for i in range(5)]
    r = _tri(spark, star)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (6, 5, 0, 0)


def test_triangle_matches_bruteforce(spark):
    # deterministic pseudo-random graph vs a from-first-principles
    # Python count (both triangles and oriented wedges)
    pairs = [(f"n{i}", f"n{(i * i + 1) % 23}") for i in range(60)]
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tris = sum(
        1
        for i, a in enumerate(nodes)
        for b in adj[a]
        if b > a
        for c in adj[a] & adj[b]
        if c > b
    )
    deg = {n: len(adj[n]) for n in nodes}
    odeg = {n: 0 for n in nodes}
    for a, b in und:
        lo = a if (deg[a], a) < (deg[b], b) else b
        odeg[lo] += 1
    wedges = sum(k * (k - 1) // 2 for k in odeg.values())
    r = _tri(spark, pairs)
    assert (r.n_nodes, r.n_edges) == (len(nodes), len(und))
    assert (r.n_wedges, r.n_triangles) == (wedges, tris)


def test_ppr_matches_python(spark):
    from context_aware_rag_spark.oracle.precompute import ppr_py

    got = {
        r.node_id: r.ppr_micro
        for r in graph.personalized_pagerank(
            _edges_df(spark), ["a", "h"]
        ).collect()
    }
    assert got == ppr_py(sorted({(s, d) for s, d in EDGES}), ["a", "h"])


def test_ppr_mass_anchors_at_seeds(spark):
    got = {
        r.node_id: r.ppr_micro
        for r in graph.personalized_pagerank(_edges_df(spark), ["h"]).collect()
    }
    # the walk restarts at h: h outranks everything, and the
    # disconnected self-loop x (unreachable from h) holds zero mass
    assert got["h"] == max(got.values())
    assert got["x"] == 0
    assert got["a"] > 0  # h -> a edge feeds it


def test_ppr_partitioning_invariance(spark):
    a = {
        r.node_id: r.ppr_micro
        for r in graph.personalized_pagerank(
            _edges_df(spark, parts=1), ["b", "s"]
        ).collect()
    }
    b = {
        r.node_id: r.ppr_micro
        for r in graph.personalized_pagerank(
            _edges_df(spark, parts=7), ["b", "s"]
        ).collect()
    }
    assert a == b


def test_ppr_validation(spark):
    df = _edges_df(spark)
    with pytest.raises(ValueError):
        graph.personalized_pagerank(df, [])
    with pytest.raises(ValueError):
        graph.personalized_pagerank(df, ["a", "a"])
    with pytest.raises(ValueError):
        graph.personalized_pagerank(df, ["a", "NOT_A_NODE"])
    with pytest.raises(ValueError):
        graph.personalized_pagerank(df, ["a"], iterations=0)


def _kcore(spark, pairs, k, **kw):
    df = spark.createDataFrame(pairs, "src: string, dst: string")
    return {
        r.node_id: r.core_degree
        for r in graph.k_core(df, k, **kw).collect()
    }


def test_kcore_path_peels_away(spark):
    # a path has no 2-core: the ends peel, exposing new ends, until
    # nothing is left — also exercises cascade depth (5 rounds)
    path = [(f"p{i}", f"p{i+1}") for i in range(9)]
    assert _kcore(spark, path, 2) == {}
    # every node of a path IS in the 1-core
    assert _kcore(spark, path, 1) == {f"p{i}": (1 if i in (0, 9) else 2)
                                      for i in range(10)}


def test_kcore_cycle_and_pendants(spark):
    # 2-core of a cycle with pendant chains = exactly the cycle
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    pendants = [("a", "x"), ("x", "y"), ("c", "z")]
    assert _kcore(spark, cyc + pendants, 2) == {
        "a": 2, "b": 2, "c": 2, "d": 2
    }


def test_kcore_clique_with_fringe(spark):
    # K5 plus a fringe node attached to three clique members: the
    # 4-core keeps only the clique (fringe degree 3 peels, clique
    # degrees drop back to 4)
    k5 = [(a, b) for a in "abcde" for b in "abcde" if a < b]
    fringe = [("f", "a"), ("f", "b"), ("f", "c")]
    assert _kcore(spark, k5 + fringe, 4) == {c: 4 for c in "abcde"}


def test_kcore_matches_python(spark):
    from context_aware_rag_spark.oracle.precompute import k_core_py

    pairs = [(f"n{i}", f"n{(i * i + 1) % 23}") for i in range(60)]
    for k in (2, 3, 4):
        want = dict(k_core_py(pairs, k))
        assert _kcore(spark, pairs, k) == want


def test_kcore_validation_and_max_iter(spark):
    df = spark.createDataFrame([("a", "b")], "src: string, dst: string")
    with pytest.raises(ValueError):
        graph.k_core(df, 0)
    # insufficient iteration budget on a deep cascade raises
    path = [(f"p{i}", f"p{i+1}") for i in range(9)]
    pdf = spark.createDataFrame(path, "src: string, dst: string")
    with pytest.raises(RuntimeError):
        graph.k_core(pdf, 2, max_iter=2)


def _lp(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src: string, dst: string")
    return {
        (r.a, r.b): (r.common_neighbors, r.jaccard_ppm, r.adamic_adar_micro)
        for r in graph.link_prediction_scores(df, **kw).collect()
    }


AA2 = round(1_000_000 / __import__("math").log(2))  # deg-2 center weight


def test_linkpred_path(spark):
    # a-b-c: one candidate (a, c) through center b (degree 2);
    # |N(a) u N(c)| = {b} so jaccard = 1.0
    got = _lp(spark, [("a", "b"), ("b", "c")])
    assert got == {("a", "c"): (1, 1_000_000, AA2)}


def test_linkpred_square_and_adjacency_exclusion(spark):
    # 4-cycle: diagonals (a,c) and (b,d) each share two deg-2 centers;
    # existing edges never appear as candidates
    got = _lp(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert got == {
        ("a", "c"): (2, 1_000_000, 2 * AA2),
        ("b", "d"): (2, 1_000_000, 2 * AA2),
    }


def test_linkpred_triangle_all_adjacent(spark):
    got = _lp(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert got == {}


def test_linkpred_center_degree_cap(spark):
    import math

    star = [("h", f"x{i}") for i in range(5)]
    # hub degree 5 > cap 4: enumeration drops it entirely
    assert _lp(spark, star, max_center_degree=4) == {}
    got = _lp(spark, star, max_center_degree=5)
    aa5 = round(1_000_000 / math.log(5))
    assert len(got) == 10
    # leaf pair: N(a) u N(b) = {h} -> jaccard 1.0
    assert all(v == (1, 1_000_000, aa5) for v in got.values())
    with pytest.raises(ValueError):
        _lp(spark, star, max_center_degree=1)


def test_linkpred_matches_bruteforce(spark):
    import math

    pairs = [(f"n{i}", f"n{(i * i + 1) % 23}") for i in range(60)]
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    want = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if b in adj[a]:
                continue
            shared = [z for z in adj[a] & adj[b] if len(adj[z]) >= 2]
            if not shared:
                continue
            cn = len(shared)
            want[(a, b)] = (
                cn,
                cn * 1_000_000 // (len(adj[a]) + len(adj[b]) - cn),
                sum(round(1_000_000 / math.log(len(adj[z]))) for z in shared),
            )
    assert _lp(spark, pairs) == want


def test_single_iteration_and_validation(spark):
    df = _edges_df(spark)
    got = {r.node_id: r.rank_micro for r in graph.pagerank(df, iterations=1).collect()}
    assert got == pagerank_py(EDGES, iterations=1)
    with pytest.raises(ValueError):
        graph.pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        graph.pagerank(df, damping_pct=100)


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------

def _bfs_py(pairs, seeds, max_depth, directed=True):
    adj = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for t in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        if not nxt:
            break
        for v in nxt:
            dist[v] = t
        frontier = nxt
    return dist


def _bfs_map(spark, pairs, seeds, **kw):
    df = spark.createDataFrame(pairs, "src: string, dst: string")
    return {
        r.node_id: r.dist
        for r in graph.bfs_distances(df, seeds, **kw).collect()
    }


def test_bfs_directed_path(spark):
    pairs = [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")]
    assert _bfs_map(spark, pairs, ["1"], max_depth=10) == {
        "1": 0, "2": 1, "3": 2, "4": 3, "5": 4
    }
    # depth bound truncates, does not raise
    assert _bfs_map(spark, pairs, ["1"], max_depth=2) == {
        "1": 0, "2": 1, "3": 2
    }
    # directed: nothing upstream of the seed is reached
    assert _bfs_map(spark, pairs, ["3"], max_depth=10) == {
        "3": 0, "4": 1, "5": 2
    }


def test_bfs_undirected_and_multi_source(spark):
    pairs = [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")]
    assert _bfs_map(spark, pairs, ["3"], max_depth=10, directed=False) == {
        "1": 2, "2": 1, "3": 0, "4": 1, "5": 2
    }
    # multi-source: first frontier to reach wins (min over seeds)
    assert _bfs_map(spark, pairs, ["1", "5"], max_depth=10, directed=False) == {
        "1": 0, "2": 1, "3": 2, "4": 1, "5": 0
    }


def test_bfs_unreachable_absent_and_cycles_terminate(spark):
    pairs = [("a", "b"), ("b", "a"), ("c", "d"), ("x", "x")]
    got = _bfs_map(spark, pairs, ["a"], max_depth=50)
    assert got == {"a": 0, "b": 1}  # c,d,x absent; the a<->b cycle stops


def test_bfs_matches_python_random_graph(spark):
    import random

    rng = random.Random(13)
    nodes = [str(i) for i in range(40)]
    pairs = list({
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    })
    for directed in (True, False):
        got = _bfs_map(
            spark, pairs, ["0", "1"], max_depth=8, directed=directed
        )
        assert got == _bfs_py(pairs, ["0", "1"], 8, directed=directed)


def test_bfs_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src: string, dst: string")
    with pytest.raises(ValueError):
        graph.bfs_distances(df, [])
    with pytest.raises(ValueError):
        graph.bfs_distances(df, ["a", "a"])
    with pytest.raises(ValueError):
        graph.bfs_distances(df, ["a"], max_depth=-1)
