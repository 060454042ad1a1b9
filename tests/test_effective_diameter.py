"""HyperBall effective-diameter summary: pure-Python register-algebra
replica parity, fixtures, guards."""

import hashlib
import math

import pytest

from context_aware_rag_spark.operators.graph import effective_diameter

M = 256
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _reg(value):
    h = hashlib.md5(value.encode()).hexdigest()
    b32 = int(h[:8], 16)
    v48 = int(h[8:20], 16)
    rho = 49 if v48 == 0 else 49 - v48.bit_length()
    return b32 % M, rho


def _estimate_e4(members):
    regs = {}
    for v in members:
        b, r = _reg(v)
        regs[b] = max(regs.get(b, 0), r)
    s49 = sum(1 << (49 - mj) for mj in regs.values())
    empty = M - len(regs)
    s49 += empty * (1 << 49)
    raw = ALPHA * M * M * float(1 << 49) / float(s49)
    if empty > 0 and raw <= 2.5 * M:
        est = M * math.log(M / float(empty))
    else:
        est = raw
    # mirror hll_estimate's round(est, 4) then the e4 integerization
    return int(round(round(est, 4) * 10000))


def _brute(edge_rows, n_iter, q_e6):
    adj = {}
    for a, b in edge_rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    balls = {v: {v} for v in nodes}
    nf = []
    for _t in range(n_iter + 1):
        nf.append(sum(_estimate_e4(balls[v]) for v in nodes))
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in adj[v]))
            for v in nodes
        }
    nf0, nfmax = nf[0], max(nf)
    num = sum(t * (nf[t] - nf[t - 1]) for t in range(1, n_iter + 1))
    avg = (
        (1_000_000 * num) // (nfmax - nf0) if nfmax > nf0 else None
    )
    eff = None
    for t in range(n_iter + 1):
        if 1_000_000 * nf[t] >= q_e6 * nfmax:
            if t == 0:
                eff = 0
            else:
                eff = (t - 1) * 1_000_000 + (
                    q_e6 * nfmax - 1_000_000 * nf[t - 1]
                ) // (nf[t] - nf[t - 1])
            break
    return nf0, nfmax, avg, eff


def _edge_df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _check(spark, rows, n_iter=4, q_e6=900_000):
    r = effective_diameter(
        _edge_df(spark, rows), p=8, n_iter=n_iter, q_e6=q_e6
    ).collect()[0]
    nf0, nfmax, avg, eff = _brute(rows, n_iter, q_e6)
    assert (r.nf0_e4, r.nf_max_e4) == (nf0, nfmax)
    assert r.avg_distance_e6 == avg
    assert r.eff_diameter_e6 == eff
    return r


class TestEffectiveDiameter:
    def test_path_graph_parity(self, spark):
        rows = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        r = _check(spark, rows)
        # path P5: true effective diameter near 3-4 hops; the HLL
        # estimate must land in the right regime, not at 0 or n_iter*2
        assert 1_000_000 <= r.eff_diameter_e6 <= 4_000_000

    def test_star_parity(self, spark):
        rows = [("h", f"l{i}") for i in range(6)]
        r = _check(spark, rows)
        assert r.eff_diameter_e6 <= 2_000_000

    def test_complete_graph_low_quantile_zero(self, spark):
        rows = [("a", "b"), ("b", "c"), ("a", "c")]
        r = _check(spark, rows, q_e6=200_000)
        assert r.eff_diameter_e6 == 0

    def test_two_node_parity(self, spark):
        _check(spark, [("x", "y")])

    def test_monotone_and_metadata(self, spark):
        r = effective_diameter(
            _edge_df(spark, [("a", "b"), ("b", "c")]), p=8, n_iter=3
        ).collect()[0]
        assert (r.n_iter, r.q_e6) == (3, 900_000)
        assert r.nf_max_e4 >= r.nf0_e4

    def test_empty_graph_nulls(self, spark):
        df = _edge_df(spark, []).filter("src IS NOT NULL")
        r = effective_diameter(df).collect()[0]
        assert r.nf_max_e4 is None
        assert r.avg_distance_e6 is None
        assert r.eff_diameter_e6 is None

    def test_bad_quantile_raises(self, spark):
        df = _edge_df(spark, [("a", "b")])
        with pytest.raises(ValueError):
            effective_diameter(df, q_e6=0)
        with pytest.raises(ValueError):
            effective_diameter(df, q_e6=1_000_001)


def _brute_harmonic(edge_rows, n_iter):
    adj = {}
    for a, b in edge_rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    balls = {v: {v} for v in nodes}
    series = {v: [_estimate_e4(balls[v])] for v in nodes}
    for _t in range(n_iter):
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in adj[v]))
            for v in nodes
        }
        for v in nodes:
            series[v].append(_estimate_e4(balls[v]))
    return {
        v: sum(
            (max(s[t] - s[t - 1], 0) * (1_000_000 // t)) // 10_000
            for t in range(1, n_iter + 1)
        )
        for v, s in series.items()
    }


class TestHarmonicCentrality:
    def test_path_and_star_parity(self, spark):
        from context_aware_rag_spark.operators.graph import (
            harmonic_centrality,
        )

        for rows in (
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
            [("h", f"l{i}") for i in range(5)],
        ):
            want = _brute_harmonic(rows, 4)
            got = {
                r.node: r.harmonic_e6
                for r in harmonic_centrality(
                    _edge_df(spark, rows), p=8, n_iter=4
                ).collect()
            }
            assert got == want

    def test_center_outranks_leaf(self, spark):
        from context_aware_rag_spark.operators.graph import (
            harmonic_centrality,
        )

        rows = [("h", f"l{i}") for i in range(6)]
        got = {
            r.node: r.harmonic_e6
            for r in harmonic_centrality(
                _edge_df(spark, rows), p=8, n_iter=3
            ).collect()
        }
        assert got["h"] > got["l0"]

    def test_no_single_partition(self, spark):
        from context_aware_rag_spark.operators.graph import (
            harmonic_centrality,
        )

        out = harmonic_centrality(
            _edge_df(spark, [("a", "b"), ("b", "c")]), p=8, n_iter=2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
