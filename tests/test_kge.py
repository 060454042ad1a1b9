"""Distributed TransE training (operators/kge.py): bit-exact equality
with the pure-Python oracle replication (md5 init + corruption, integer
gradients, trunc divisions, isqrt normalize), learning behavior, and
energy-scoring consistency."""

import pytest

from context_aware_rag_spark.operators import kge
from context_aware_rag_spark.oracle import precompute


def _graph():
    # two clusters of co-occurring entities plus a bridge relation —
    # small enough for the oracle, structured enough to learn
    tri = []
    for i in range(6):
        tri.append((f"a{i}", "in_cluster", "A"))
        tri.append((f"b{i}", "in_cluster", "B"))
    for i in range(5):
        tri.append((f"a{i}", "next_to", f"a{i+1}"))
        tri.append((f"b{i}", "next_to", f"b{i+1}"))
    tri.append(("A", "linked", "B"))
    return tri


def _train_spark(spark, tri, **kw):
    df = spark.createDataFrame(tri, "src: string, rel: string, dst: string")
    stats = {}
    out = kge.train_transe(df, stats=stats, **kw)
    rows = [
        (r.kind, r.node_id, d, v)
        for r in out.collect()
        for d, v in enumerate(r.emb)
    ]
    return sorted(rows), stats


def test_transe_matches_python_oracle_bitexact(spark):
    tri = _graph()
    got, stats = _train_spark(spark, tri, dim=8, epochs=3)
    want = precompute.transe_py(tri, dim=8, epochs=3)
    assert got == sorted(want)
    assert len(stats["loss_per_epoch"]) == 3
    assert stats["n_triples"] == len(set(tri))


def test_transe_partitioning_invariant(spark):
    tri = _graph()
    df1 = spark.createDataFrame(
        tri, "src: string, rel: string, dst: string"
    ).repartition(1)
    df2 = spark.createDataFrame(
        tri, "src: string, rel: string, dst: string"
    ).repartition(7)
    a = sorted(
        (r.kind, r.node_id, tuple(r.emb))
        for r in kge.train_transe(df1, dim=4, epochs=2).collect()
    )
    b = sorted(
        (r.kind, r.node_id, tuple(r.emb))
        for r in kge.train_transe(df2, dim=4, epochs=2).collect()
    )
    assert a == b


def test_transe_learns_margin_structure(spark):
    tri = _graph()
    df = spark.createDataFrame(tri, "src: string, rel: string, dst: string")
    stats = {}
    emb = kge.train_transe(df, dim=16, epochs=8, stats=stats).localCheckpoint()
    # hinge loss must shrink over training
    assert stats["loss_per_epoch"][-1] < stats["loss_per_epoch"][0]
    # true triples must sit at lower energy than corrupted ones on avg
    pos = kge.transe_energy(emb, df).agg({"energy": "avg"}).collect()[0][0]
    corrupted = spark.createDataFrame(
        [("a0", "in_cluster", "B"), ("b3", "in_cluster", "A"),
         ("a1", "next_to", "b4"), ("b2", "next_to", "a5")],
        "src: string, rel: string, dst: string",
    )
    neg = kge.transe_energy(emb, corrupted).agg({"energy": "avg"}).collect()[0][0]
    assert pos < neg


def test_transe_energy_matches_python_dot(spark):
    tri = [("x", "r1", "y"), ("y", "r1", "z"), ("x", "r2", "z")]
    df = spark.createDataFrame(tri, "src: string, rel: string, dst: string")
    emb = kge.train_transe(df, dim=4, epochs=2).localCheckpoint()
    table = {
        (r.kind, r.node_id): list(r.emb) for r in emb.collect()
    }
    got = {
        (r.src, r.rel, r.dst): r.energy
        for r in kge.transe_energy(emb, df).collect()
    }
    for h, r, t in tri:
        dp = [
            table[("e", h)][i] + table[("r", r)][i] - table[("e", t)][i]
            for i in range(4)
        ]
        assert got[(h, r, t)] == sum(x * x for x in dp)


def test_transe_validation(spark):
    df = spark.createDataFrame(
        [("a", "r", "b")], "src: string, rel: string, dst: string"
    )
    with pytest.raises(ValueError):
        kge.train_transe(df, epochs=0)
    with pytest.raises(ValueError):
        kge.train_transe(df, dim=0)
    empty = spark.createDataFrame([], "src: string, rel: string, dst: string")
    with pytest.raises(ValueError, match="no triples"):
        kge.train_transe(empty)


# ---------------------------------------------------------------------------
# filtered link-prediction ranking (rank_metrics / rank_summary)
# ---------------------------------------------------------------------------


def _rank_spark(spark, tri, test, **kw):
    df = spark.createDataFrame(tri, "src: string, rel: string, dst: string")
    tdf = spark.createDataFrame(test, "src: string, rel: string, dst: string")
    emb = kge.train_transe(df, dim=8, epochs=3)
    out = kge.rank_metrics(emb, tdf, df, **kw)
    return emb, out


def test_rank_metrics_matches_python_oracle_bitexact(spark):
    tri = _graph()
    test = sorted(set(tri))[::3]
    emb, out = _rank_spark(spark, tri, test)
    got = sorted(
        (r.side, r.src, r.rel, r.dst, r.true_energy, r.rank_pos, r.rr_ppm)
        for r in out.collect()
    )
    emb_rows = [
        (r.kind, r.node_id, d, v)
        for r in emb.collect()
        for d, v in enumerate(r.emb)
    ]
    want = precompute.rank_metrics_py(emb_rows, test, tri)
    assert got == want
    assert len(got) == 2 * len(test)


def test_rank_metrics_filtered_excludes_known_true(spark):
    # planted geometry: entity "dup" sits exactly where "t" sits (same
    # md5 init key is impossible, so force via known-triple exclusion
    # semantics instead: a competitor that IS a known true triple must
    # not count against the probe's rank, an unknown one must).
    tri = _graph()
    test = [tri[0]]
    _, filtered = _rank_spark(spark, tri, test)
    df = spark.createDataFrame(tri, "src: string, rel: string, dst: string")
    tdf = spark.createDataFrame(test, "src: string, rel: string, dst: string")
    emb = kge.train_transe(df, dim=8, epochs=3)
    # raw protocol = empty known set: rank can only get worse (>=)
    empty = df.limit(0)
    raw = kge.rank_metrics(emb, tdf, empty)
    f = {(r.side, r.src): r.rank_pos for r in filtered.collect()}
    r = {(r.side, r.src): r.rank_pos for r in raw.collect()}
    assert set(f) == set(r)
    assert all(r[k] >= f[k] for k in f)
    # the probe's own subjects share 'in_cluster' tails with 5 known
    # siblings — at least one side must actually differ on this graph
    assert any(r[k] > f[k] for k in f)


def test_rank_summary_integer_metrics(spark):
    tri = _graph()
    test = sorted(set(tri))[::4]
    _, out = _rank_spark(spark, tri, test)
    row = kge.rank_summary(out, ks=(1, 3, 10)).collect()[0]
    ranks = [r.rank_pos for r in out.collect()]
    n = len(ranks)
    assert row.n == n == 2 * len(test)
    assert row.mrr_ppm == sum(1_000_000 // x for x in ranks) // n
    for k in (1, 3, 10):
        want = 1_000_000 * sum(1 for x in ranks if x <= k) // n
        assert row[f"hits{k}_ppm"] == want
    assert 0 < row.mrr_ppm <= 1_000_000


def test_rank_metrics_side_subset_and_validation(spark):
    tri = _graph()
    test = [tri[0]]
    df = spark.createDataFrame(tri, "src: string, rel: string, dst: string")
    tdf = spark.createDataFrame(test, "src: string, rel: string, dst: string")
    emb = kge.train_transe(df, dim=4, epochs=1)
    only_dst = kge.rank_metrics(emb, tdf, df, sides=("dst",)).collect()
    assert len(only_dst) == 1 and only_dst[0].side == "dst"
    with pytest.raises(ValueError, match="corruption side"):
        kge.rank_metrics(emb, tdf, df, sides=("both",)).collect()
