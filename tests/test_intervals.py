"""Bucketed range join: equivalence vs the naive cross-join spelling,
inclusive bounds, keyed matching, zero-coverage retention, and the
plan guarantee (equi-join on bucket, no nested-loop join)."""

import random

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import intervals


def _random_case(seed, n_pts=120, n_iv=80, span=500):
    rnd = random.Random(seed)
    pts = [(i, rnd.randrange(span), rnd.randrange(3)) for i in range(n_pts)]
    ivs = []
    for i in range(n_iv):
        s = rnd.randrange(span)
        ivs.append((1000 + i, s, s + rnd.randrange(0, 60), rnd.randrange(3)))
    return pts, ivs


def _naive(pts, ivs, keyed):
    out = []
    for pid, p, pk in pts:
        for iid, s, e, ik in ivs:
            if s <= p <= e and (not keyed or pk == ik):
                out.append((pid, iid))
    return sorted(out)


@pytest.mark.parametrize("seed,keyed", [(1, False), (2, True), (3, False)])
def test_matches_naive_cross_join(spark, seed, keyed):
    pts, ivs = _random_case(seed)
    pdf = spark.createDataFrame(pts, "pid: long, p: long, pk: long")
    idf = spark.createDataFrame(ivs, "iid: long, s: long, e: long, ik: long")
    got = intervals.range_join_points(
        pdf, idf, "p", "s", "e", bucket_width=37,
        keys=[("pk", "ik")] if keyed else None,
    )
    assert sorted((r.pid, r.iid) for r in got.collect()) == _naive(
        pts, ivs, keyed
    )


def test_inclusive_bounds_and_degenerate_interval(spark):
    pdf = spark.createDataFrame([(1, 10), (2, 20), (3, 15)], "pid: long, p: long")
    idf = spark.createDataFrame(
        [(100, 10, 20), (200, 15, 15), (300, 21, 11)],  # 300 inverted: no match
        "iid: long, s: long, e: long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in intervals.range_join_points(
            pdf, idf, "p", "s", "e", bucket_width=4
        ).collect()
    )
    assert got == [(1, 100), (2, 100), (3, 100), (3, 200)]


def test_exactly_once_across_bucket_boundaries(spark):
    # interval spans many buckets; each contained point matches once
    pdf = spark.createDataFrame([(i, i) for i in range(50)], "pid: long, p: long")
    idf = spark.createDataFrame([(9, 5, 45)], "iid: long, s: long, e: long")
    rows = intervals.range_join_points(
        pdf, idf, "p", "s", "e", bucket_width=3
    ).collect()
    assert sorted(r.pid for r in rows) == list(range(5, 46))
    assert len(rows) == len(set((r.pid, r.iid) for r in rows))


def test_plan_is_equi_join_not_nested_loop(spark):
    pdf = spark.createDataFrame([(1, 10)], "pid: long, p: long")
    idf = spark.createDataFrame([(2, 5, 15)], "iid: long, s: long, e: long")
    jvm = spark.sparkContext._jvm
    plan = intervals.range_join_points(
        pdf, idf, "p", "s", "e", bucket_width=8
    )._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "_rj_bucket" in plan


def test_coverage_counts_keeps_zero(spark):
    pdf = spark.createDataFrame([(10,), (10,), (99,)], "p: long")
    idf = spark.createDataFrame([(0, 5, 12), (1, 8, 10)], "iid: long, s: long, e: long")
    got = {
        r.p: r.n_covering
        for r in intervals.coverage_counts(
            pdf, idf, "p", "s", "e", bucket_width=16
        ).collect()
    }
    assert got == {10: 2, 99: 0}


def test_validates(spark):
    pdf = spark.createDataFrame([(1, 1)], "pid: long, p: long")
    idf = spark.createDataFrame([(1, 1, 2)], "iid: long, s: long, e: long")
    with pytest.raises(ValueError, match="bucket_width"):
        intervals.range_join_points(pdf, idf, "p", "s", "e", bucket_width=0)
    with pytest.raises(ValueError, match="key pair"):
        intervals.range_join_points(
            pdf, idf, "p", "s", "e", 4, keys=[("nope", "iid")]
        )
    bad = spark.createDataFrame([(1, 1, 2)], "pid: long, s: long, e: long")
    with pytest.raises(ValueError, match="collision"):
        intervals.range_join_points(pdf, bad, "p", "s", "e", 4)


# ---------------------------------------------------------------- overlap


def _random_intervals(seed, n, span, max_len, key_mod):
    rnd = random.Random(seed)
    out = []
    for i in range(n):
        s = rnd.randrange(span)
        out.append((i, s, s + rnd.randrange(0, max_len), rnd.randrange(key_mod)))
    return out


def _naive_overlap(ls, rs, keyed):
    out = []
    for lid, a, b, lk in ls:
        for rid, c, d, rk in rs:
            if a <= d and c <= b and (not keyed or lk == rk):
                out.append((lid, rid))
    return sorted(out)


@pytest.mark.parametrize("seed,keyed,width", [
    (11, False, 37), (12, True, 37), (13, False, 7), (14, True, 113),
])
def test_interval_overlap_matches_naive(spark, seed, keyed, width):
    ls = _random_intervals(seed, 90, 400, 50, 3)
    rs = _random_intervals(seed + 100, 70, 400, 80, 3)
    ldf = spark.createDataFrame(ls, "lid: long, ls: long, le: long, lk: long")
    rdf = spark.createDataFrame(rs, "rid: long, rs: long, re: long, rk: long")
    got = intervals.range_join_intervals(
        ldf, rdf, "ls", "le", "rs", "re", bucket_width=width,
        keys=[("lk", "rk")] if keyed else None,
    )
    assert sorted((r.lid, r.rid) for r in got.collect()) == _naive_overlap(
        ls, rs, keyed
    )


def test_interval_overlap_exactly_once_on_long_overlaps(spark):
    # both intervals span MANY shared buckets; the owner-bucket gate
    # must emit the pair once, and duplicate input rows must fan out
    # (not collapse through a dedup)
    ldf = spark.createDataFrame(
        [(1, 0, 1000), (1, 0, 1000)], "lid: long, ls: long, le: long"
    )
    rdf = spark.createDataFrame([(2, 500, 2000)], "rid: long, rs: long, re: long")
    rows = intervals.range_join_intervals(
        ldf, rdf, "ls", "le", "rs", "re", bucket_width=10
    ).collect()
    assert sorted((r.lid, r.rid) for r in rows) == [(1, 2), (1, 2)]


def test_interval_overlap_inclusive_touching_and_inverted(spark):
    ldf = spark.createDataFrame(
        [(1, 0, 10), (2, 50, 40), (3, None, 5)],
        "lid: long, ls: long, le: long",
    )
    rdf = spark.createDataFrame(
        [(7, 10, 20), (8, 21, 30)], "rid: long, rs: long, re: long"
    )
    rows = intervals.range_join_intervals(
        ldf, rdf, "ls", "le", "rs", "re", bucket_width=8
    ).collect()
    # touching endpoints match (inclusive); inverted + NULL rows don't
    assert sorted((r.lid, r.rid) for r in rows) == [(1, 7)]


def test_interval_overlap_validates(spark):
    ldf = spark.createDataFrame([(1, 0, 10)], "lid: long, s: long, e: long")
    rdf = spark.createDataFrame([(2, 0, 10)], "rid: long, s: long, e: long")
    with pytest.raises(ValueError, match="bucket_width"):
        intervals.range_join_intervals(ldf, rdf, "s", "e", "s", "e", 0)
    with pytest.raises(ValueError, match="collision"):
        intervals.range_join_intervals(ldf, rdf, "s", "e", "s", "e", 10)
    with pytest.raises(ValueError, match="key pair"):
        intervals.range_join_intervals(
            ldf, rdf.withColumnRenamed("s", "rs").withColumnRenamed("e", "re"),
            "s", "e", "rs", "re", 10, keys=[("nope", "rid")],
        )
