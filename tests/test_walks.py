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


# ---------------------------------------------------------------------------
# node2vec biased walks
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import node2vec_py  # noqa: E402


def _got_n2v(spark, rows, **kw):
    df = spark.createDataFrame(rows, "src: string, dst: string")
    return sorted(
        (r.start, r.walk_id, r.pos, r.node)
        for r in walks.node2vec_walks(df, **kw).collect()
    )


def _rand_graph(tag, n, mod):
    out = []
    for i in range(n):
        for j in range(n):
            if i != j:
                h = int(
                    hashlib.md5(f"{tag}:{i}:{j}".encode()).hexdigest()[:8], 16
                )
                if h % mod == 0:
                    out.append((f"v{i:02d}", f"v{j:02d}"))
    return out


class TestNode2vecWalks:
    def test_unit_weights_equal_uniform_walks(self, spark):
        # ret = in = out = 1 degenerates to the first-order draw:
        # pick % out_deg lands in the slot-ordered interval exactly
        # like random_walks' hop % out_deg
        df = _df(spark)
        uni = _got(spark, df, walk_length=4, walks_per_node=2)
        n2v = _got_n2v(
            spark, EDGES, walk_length=4, walks_per_node=2,
            ret_w=1, in_w=1, out_w=1,
        )
        assert sorted(uni) == n2v

    @pytest.mark.parametrize(
        "ret_w,in_w,out_w",
        [(5, 1, 1), (0, 1, 3), (1, 10, 0), (7, 0, 2)],
    )
    def test_matches_python_on_random_graphs(self, spark, ret_w, in_w, out_w):
        rows = _rand_graph("n2v", 10, 3)
        assert _got_n2v(
            spark, rows, walk_length=5, walks_per_node=2,
            ret_w=ret_w, in_w=in_w, out_w=out_w,
        ) == node2vec_py(
            rows, walk_length=5, walks_per_node=2,
            ret_w=ret_w, in_w=in_w, out_w=out_w,
        )

    def test_zero_total_mass_ends_walk(self, spark):
        # line graph x -> y -> z with out_w=0 and ret_w=0: at y the
        # only candidate z is an "explore" (z is not x and not an
        # out-neighbor of x) with weight 0 -> the walk ends at y
        rows = [("x", "y"), ("y", "z"), ("z", "z2")]
        got = _got_n2v(
            spark, rows, walk_length=4, ret_w=0, in_w=1, out_w=0
        )
        x_walk = [r for r in got if r[0] == "x"]
        assert x_walk == [("x", 0, 0, "x"), ("x", 0, 1, "y")]

    def test_return_weight_forces_backtracking(self, spark):
        # triangle with overwhelming return weight: from pos 2 onward
        # every hop goes back where it came from
        rows = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"), ("c", "a")]
        got = _got_n2v(
            spark, rows, walk_length=6, ret_w=1_000_000, in_w=1, out_w=1
        )
        by_walk = {}
        for start, wid, pos, node in got:
            by_walk.setdefault((start, wid), []).append(node)
        for key, seq in by_walk.items():
            # md5 draws % total land < 1e6 overwhelmingly -> return
            for i in range(2, len(seq)):
                assert seq[i] == seq[i - 2], (key, seq)

    def test_validation(self, spark):
        df = _df(spark)
        with pytest.raises(ValueError, match="walk_length"):
            walks.node2vec_walks(df, walk_length=0)
        with pytest.raises(ValueError, match="integer ret_w"):
            walks.node2vec_walks(df, ret_w=-1)
        with pytest.raises(ValueError, match="positive weight"):
            walks.node2vec_walks(df, ret_w=0, in_w=0, out_w=0)
