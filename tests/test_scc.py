"""Strongly connected components (graph.strongly_connected_components)
vs an iterative pure-Python Tarjan (an entirely different algorithm —
DFS low-links vs distributed trim/color/harvest) plus hand geometries."""

import random

import pytest

from context_aware_rag_spark.operators import graph


def _tarjan_py(pairs):
    adj = {}
    nodes = set()
    for u, v in pairs:
        if u == v:
            nodes.add(u)
            continue
        adj.setdefault(u, []).append(v)
        nodes.add(u)
        nodes.add(v)
    index, low, onstk, stk, sccs, counter = {}, {}, set(), [], [], [0]

    def strong(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stk.append(v)
                onstk.add(v)
            descended = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    descended = True
                    break
                if w in onstk:
                    low[v] = min(low[v], index[w])
            if not descended:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stk.pop()
                        onstk.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    sccs.append(comp)
                if work:
                    p = work[-1][0]
                    low[p] = min(low[p], low[v])

    for n in sorted(nodes):
        if n not in index:
            strong(n)
    out = {}
    for comp in sccs:
        m = min(comp)
        for n in comp:
            out[n] = m
    return out


def _scc_map(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src: string, dst: string")
    return {
        r.node_id: r.scc_id
        for r in graph.strongly_connected_components(df, **kw).collect()
    }


def test_scc_two_cycles_and_bridge(spark):
    # cycle {a,b,c} -> bridge -> cycle {x,y}; bridge node d is a DAG
    # singleton between them
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "x"),
        ("x", "y"), ("y", "x"),
    ]
    assert _scc_map(spark, pairs) == {
        "a": "a", "b": "a", "c": "a", "d": "d", "x": "x", "y": "x"
    }


def test_scc_dag_all_singletons(spark):
    pairs = [("1", "2"), ("1", "3"), ("2", "4"), ("3", "4")]
    assert _scc_map(spark, pairs) == {"1": "1", "2": "2", "3": "3", "4": "4"}


def test_scc_figure_eight_is_one_component(spark):
    # two cycles sharing node m are mutually reachable through m
    pairs = [("a", "m"), ("m", "a"), ("m", "b"), ("b", "m")]
    assert _scc_map(spark, pairs) == {"a": "a", "m": "a", "b": "a"}


def test_scc_direction_matters(spark):
    # one-way pair is NOT an SCC; symmetric pair is
    assert _scc_map(spark, [("a", "b")]) == {"a": "a", "b": "b"}
    assert _scc_map(spark, [("a", "b"), ("b", "a")]) == {"a": "a", "b": "a"}


def test_scc_self_loops_and_duplicate_edges(spark):
    pairs = [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a")]
    got = _scc_map(spark, pairs)
    assert got["a"] == "a" and got["b"] == "a"


def test_scc_long_path_trim_cascade(spark):
    # pure DAG path: the trim cascade alone must label everything
    pairs = [(str(i), str(i + 1)) for i in range(12)]
    assert _scc_map(spark, pairs) == {str(i): str(i) for i in range(13)}


def test_scc_matches_tarjan_random_graphs(spark):
    rng = random.Random(41)
    for trial, (n, m) in enumerate([(18, 30), (25, 70), (30, 45)]):
        nodes = [f"{trial}_{i:02d}" for i in range(n)]
        pairs = list({
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(m)
        })
        got = _scc_map(spark, pairs)
        assert got == _tarjan_py(pairs), (trial, sorted(pairs))


def test_scc_max_rounds_raises_on_partial(spark):
    # knot {c,d} (containing the max id d) feeds knot {a,b}: one color
    # class rooted at d, round 1 harvests only {c,d}, so {a,b} needs a
    # second round — with max_rounds=1 the loop must raise, never
    # return partial labels
    pairs = [
        ("a", "b"), ("b", "a"),
        ("c", "d"), ("d", "c"),
        ("d", "a"),
    ]
    with pytest.raises(RuntimeError, match="failed to settle"):
        graph.strongly_connected_components(
            spark.createDataFrame(pairs, "src: string, dst: string"),
            max_rounds=1,
        ).collect()
