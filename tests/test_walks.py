"""Deterministic random-walk corpus (operators/walks.py)."""

import hashlib

import pytest

from context_aware_rag_spark.operators import walks

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("c", "d"),            # d is a sink: walks end there
    ("a", "b"),            # duplicate edge collapses
]


def _df(spark, rows=EDGES, parts=None):
    df = spark.createDataFrame(rows, "src: string, dst: string")
    return df.repartition(parts) if parts else df


def _expected(rows, walk_length, walks_per_node):
    adj = {}
    for s, d in sorted(set(rows)):
        adj.setdefault(s, []).append(d)
    nodes = sorted({n for e in rows for n in e})
    out = set()
    for start in nodes:
        for wid in range(walks_per_node):
            node = start
            out.add((start, wid, 0, node))
            for t in range(walk_length - 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                key = "\x1f".join([start, str(wid), str(t)])
                h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                node = nbrs[h % len(nbrs)]
                out.add((start, wid, t + 1, node))
    return out


def _got(spark, df, **kw):
    return {
        (r.start, r.walk_id, r.pos, r.node)
        for r in walks.random_walks(df, **kw).collect()
    }


def test_matches_python_replication(spark):
    got = _got(spark, _df(spark), walk_length=5, walks_per_node=2)
    want = _expected(EDGES, 5, 2)
    assert got == want
    # walks genuinely advance: some pos-4 rows exist (a,b,c form a cycle)
    assert any(p == 4 for _, _, p, _ in got)


def test_sink_ends_walk(spark):
    got = _got(spark, _df(spark), walk_length=6, walks_per_node=1)
    # any walk row AT d must be that walk's last position
    by_walk = {}
    for start, wid, pos, node in got:
        by_walk.setdefault((start, wid), []).append((pos, node))
    for steps in by_walk.values():
        steps.sort()
        for pos, node in steps[:-1]:
            assert node != "d"


def test_partitioning_invariance(spark):
    a = _got(spark, _df(spark, parts=1), walk_length=4)
    b = _got(spark, _df(spark, parts=7), walk_length=4)
    assert a == b


def test_walk_length_one_is_just_starts(spark):
    got = _got(spark, _df(spark), walk_length=1, walks_per_node=3)
    nodes = {"a", "b", "c", "d"}
    assert got == {(n, w, 0, n) for n in nodes for w in range(3)}


def test_skipgram_pairs(spark):
    rows = [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"),
            ("a", 0, 3, "d"), ("z", 1, 0, "z"), ("z", 1, 1, "a")]
    df = spark.createDataFrame(
        rows, "start: string, walk_id: int, pos: int, node: string"
    )
    got = {
        (r.center, r.context, r.offset, r.start, r.walk_id, r.center_pos)
        for r in walks.skipgram_pairs(df, window=2).collect()
    }
    want = set()
    by_walk = {}
    for start, wid, pos, node in rows:
        by_walk.setdefault((start, wid), []).append((pos, node))
    for (start, wid), steps in by_walk.items():
        for p1, n1 in steps:
            for p2, n2 in steps:
                if p1 != p2 and abs(p2 - p1) <= 2:
                    want.add((n1, n2, p2 - p1, start, wid, p1))
    assert got == want
    # the 4-step walk with window 2: pairs at offsets +-1, +-2 only
    assert ("a", "d", 3, "a", 0, 0) not in got
    with pytest.raises(ValueError):
        walks.skipgram_pairs(df, window=0)


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        walks.random_walks(df, walk_length=0)
    with pytest.raises(ValueError):
        walks.random_walks(df, walks_per_node=0)
