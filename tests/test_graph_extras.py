"""Unit tests: tfidf_keywords, pmi_edges, snapshot_diff,
label_propagation — this session's corpus-statistics / incremental /
community additions, each checked against small hand-computed or
pure-Python expectations (the SQL/precomputed twins live in
entry_queries and are swept by test_entry_contract)."""

import math

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import graph, textmetrics
from context_aware_rag_spark.operators.diff import snapshot_diff
from context_aware_rag_spark.oracle.precompute import lpa_py


# ---------------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------------

class TestTfidfKeywords:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple banana apple"),
                (2, "banana cherry"),
                (3, "durian durian durian"),
            ],
            "doc_id: long, text: string",
        )
        out = textmetrics.tfidf_keywords(docs, top_k=2)
        rows = {
            (r.doc_id, r.token): r for r in out.collect()
        }
        # idf(apple) = ln(3/1); tf in doc1 = 2
        idf_apple = round(1_000_000 * math.log(3 / 1))
        assert rows[(1, "apple")].tf == 2
        assert rows[(1, "apple")].idf_micro == idf_apple
        assert rows[(1, "apple")].score_micro == 2 * idf_apple
        assert rows[(1, "apple")].rk == 1
        # banana appears in 2 of 3 docs
        idf_banana = round(1_000_000 * math.log(3 / 2))
        assert rows[(2, "banana")].idf_micro == idf_banana
        # doc3 has one distinct token -> exactly one row despite top_k=2
        assert sorted(k for k in rows if k[0] == 3) == [(3, "durian")]

    def test_rank_cut_is_deterministic(self, spark):
        # equal scores break ties by token ASC
        docs = spark.createDataFrame(
            [(1, "zeta alpha"), (2, "common common")],
            "doc_id: long, text: string",
        )
        out = textmetrics.tfidf_keywords(docs, top_k=1).collect()
        by_doc = {r.doc_id: r.token for r in out}
        assert by_doc[1] == "alpha"  # same tf/idf -> lexicographic cut

    def test_validates_top_k(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
        with pytest.raises(ValueError, match="top_k"):
            textmetrics.tfidf_keywords(docs, top_k=0)


# ---------------------------------------------------------------------------
# pmi_edges
# ---------------------------------------------------------------------------

class TestPmiEdges:
    def test_hand_computed(self, spark):
        # groups: g1={a,b}, g2={a,b}, g3={a,c}, g4={b} -> N=4
        occ = spark.createDataFrame(
            [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
             ("g3", "a"), ("g3", "c"), ("g4", "b")],
            "g: string, i: string",
        )
        out = {
            (r.a, r.b): r
            for r in graph.pmi_edges(occ, "g", "i").collect()
        }
        ab = out[("a", "b")]
        assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 3)
        expected = round(
            1_000_000
            * (math.log(2.0) + math.log(4.0) - math.log(3.0) - math.log(3.0))
        )
        assert ab.pmi_micro == expected
        ac = out[("a", "c")]
        # (1*4)/(3*1): positive PMI — c only ever co-occurs with a
        assert ac.pmi_micro == round(
            1_000_000 * (math.log(1.0) + math.log(4.0)
                         - math.log(3.0) - math.log(1.0))
        )

    def test_duplicate_occurrences_collapse(self, spark):
        occ = spark.createDataFrame(
            [("g1", "a"), ("g1", "a"), ("g1", "b")], "g: string, i: string"
        )
        out = graph.pmi_edges(occ, "g", "i").collect()
        assert len(out) == 1 and out[0].n_ab == 1 and out[0].n_a == 1

    def test_max_group_size_drops_hub_group(self, spark):
        rows = [("hub", f"i{k}") for k in range(5)] + [
            ("g1", "i0"), ("g1", "i1")
        ]
        occ = spark.createDataFrame(rows, "g: string, i: string")
        out = graph.pmi_edges(occ, "g", "i", max_group_size=4).collect()
        # only g1's single pair enumerates, but n_i / N stay global
        assert len(out) == 1
        r = out[0]
        assert (r.a, r.b, r.n_ab, r.n_a, r.n_b) == ("i0", "i1", 1, 2, 2)

    def test_validates_params(self, spark):
        occ = spark.createDataFrame([("g", "i")], "g: string, i: string")
        with pytest.raises(ValueError, match="min_pair_count"):
            graph.pmi_edges(occ, "g", "i", min_pair_count=0)
        with pytest.raises(ValueError, match="max_group_size"):
            graph.pmi_edges(occ, "g", "i", max_group_size=1)


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

class TestSnapshotDiff:
    def test_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "A", 10), (2, "B", 20), (3, "C", 30), (4, None, 40)],
            "k: long, s: string, v: long",
        )
        new = spark.createDataFrame(
            [(2, "B", 20), (3, "C2", 30), (4, None, 40), (5, "E", 50)],
            "k: long, s: string, v: long",
        )
        out = {
            r.k: r
            for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
        }
        assert set(out) == {1, 3, 5}  # 2 unchanged, 4 null==null unchanged
        assert out[1].status == "removed" and out[1].new_s is None
        assert out[3].status == "changed" and (
            out[3].old_s, out[3].new_s
        ) == ("C", "C2")
        assert out[5].status == "added" and out[5].old_v is None

    def test_null_transitions_are_changes(self, spark):
        old = spark.createDataFrame([(1, "A")], "k: long, s: string")
        new = spark.createDataFrame([(1, None)], "k: long, s: string")
        out = snapshot_diff(old, new, ["k"], ["s"]).collect()
        assert len(out) == 1 and out[0].status == "changed"

    def test_validates_columns(self, spark):
        df = spark.createDataFrame([(1, "A")], "k: long, s: string")
        with pytest.raises(ValueError, match="key column"):
            snapshot_diff(df, df, [], ["s"])
        with pytest.raises(ValueError, match="value column"):
            snapshot_diff(df, df, ["k"], [])
        with pytest.raises(ValueError, match="overlap"):
            snapshot_diff(df, df, ["k"], ["k", "s"])


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src: long, dst: long"
    )


class TestLabelPropagation:
    def test_two_cliques_bridge(self, spark):
        # two triangles joined by one bridge edge -> two communities
        pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        out = graph.label_propagation(_edges_df(spark, pairs)).collect()
        labels = {r.node_id: r.label for r in out}
        assert labels[1] == labels[2] == labels[3]
        assert labels[4] == labels[5] == labels[6]
        assert labels[1] != labels[4]

    def test_matches_pure_python_and_early_stops(self, spark):
        # deterministic pseudo-random sparse graph
        pairs = sorted(
            {((k * 7 + 3) % 23, (k * 11 + 5) % 23) for k in range(60)}
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        expected = lpa_py(pairs, max_iter=10)
        got = sorted(
            (r.node_id, r.label, r.n_iter)
            for r in graph.label_propagation(
                _edges_df(spark, pairs), max_iter=10
            ).collect()
        )
        assert got == expected

    def test_bipartite_hits_max_iter(self, spark):
        # K2,2 oscillates under synchronous sweeps: bound must hold
        pairs = [(1, 10), (1, 20), (2, 10), (2, 20)]
        out = graph.label_propagation(
            _edges_df(spark, pairs), max_iter=4
        ).collect()
        assert all(r.n_iter == 4 for r in out)
        assert sorted(
            (r.node_id, r.label, r.n_iter) for r in out
        ) == lpa_py(pairs, max_iter=4)

    def test_validates_max_iter(self, spark):
        with pytest.raises(ValueError, match="max_iter"):
            graph.label_propagation(
                _edges_df(spark, [(1, 2)]), max_iter=0
            )


# ---------------------------------------------------------------------------
# random_indexing_embeddings
# ---------------------------------------------------------------------------

def _py_sign(j: int, y: str) -> int:
    import hashlib

    h = hashlib.md5(f"{j}\x1f{y}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


class TestRandomIndexingEmbeddings:
    def test_hand_computed(self, spark):
        pmi = spark.createDataFrame(
            [("a", "b", 100), ("a", "c", -40), ("b", "c", 7)],
            "a: string, b: string, pmi_micro: long",
        )
        out = {
            (r.node_id, r.j): r.emb_micro
            for r in graph.random_indexing_embeddings(pmi, dim=4).collect()
        }
        # a's neighbors: b (w=100), c (w=-40)
        for j in range(4):
            assert out[("a", j)] == 100 * _py_sign(j, "b") + (
                -40
            ) * _py_sign(j, "c")
            # b's neighbors: a (100), c (7)
            assert out[("b", j)] == 100 * _py_sign(j, "a") + 7 * _py_sign(
                j, "c"
            )

    def test_identical_neighborhoods_identical_embeddings(self, spark):
        # x and y both connect only to z with the same weight
        pmi = spark.createDataFrame(
            [("x", "z", 55), ("y", "z", 55)],
            "a: string, b: string, pmi_micro: long",
        )
        out = {}
        for r in graph.random_indexing_embeddings(pmi, dim=8).collect():
            out.setdefault(r.node_id, {})[r.j] = r.emb_micro
        assert out["x"] == out["y"]

    def test_validates_dim(self, spark):
        pmi = spark.createDataFrame(
            [("a", "b", 1)], "a: string, b: string, pmi_micro: long"
        )
        with pytest.raises(ValueError, match="dim"):
            graph.random_indexing_embeddings(pmi, dim=0)


# ---------------------------------------------------------------------------
# HyperBall
# ---------------------------------------------------------------------------

def _py_hll_register(value: str, p: int = 7):
    import hashlib

    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[:8], 16) % (1 << p)
    v48 = int(h[8:20], 16)
    rho = 49 if v48 == 0 else 49 - len(bin(v48)[2:])
    return bucket, rho


def _py_ball_registers(ball_nodes, p: int = 7):
    regs = {}
    for n in ball_nodes:
        b, r = _py_hll_register(str(n), p)
        regs[b] = max(regs.get(b, 0), r)
    return regs


class TestHyperball:
    def _states(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "src: long, dst: long")
        out = {}
        for r in graph.hyperball_states(df, **kw).collect():
            out.setdefault((r.t, r.node), {})[r.bucket] = r.m_j
        return out

    def test_registers_equal_exact_ball_registers(self, spark):
        # path 0-1-2-3 (undirected): ball(1, 1) = {0,1,2}, ball(0, 2) =
        # {0,1,2}, ball(0, 3) = everything — registers must equal the
        # hand-computed HLL registers of the EXACT BFS balls
        edges = [(0, 1), (1, 2), (2, 3)]
        got = self._states(spark, edges, p=7, n_iter=3)
        balls = {
            0: {0: {0}, 1: {0, 1}, 2: {0, 1, 2}, 3: {0, 1, 2, 3}},
            1: {0: {1}, 1: {0, 1, 2}, 2: {0, 1, 2, 3}, 3: {0, 1, 2, 3}},
            2: {0: {2}, 1: {1, 2, 3}, 2: {0, 1, 2, 3}, 3: {0, 1, 2, 3}},
            3: {0: {3}, 1: {2, 3}, 2: {1, 2, 3}, 3: {0, 1, 2, 3}},
        }
        for node, per_t in balls.items():
            for t, members in per_t.items():
                assert got[(t, node)] == _py_ball_registers(members), (
                    node, t,
                )

    def test_directed_follows_out_edges(self, spark):
        # 0 -> 1 -> 2 directed: ball(0,1) = {0,1}; ball(2,t) stays {2}
        got = self._states(
            spark, [(0, 1), (1, 2)], p=7, n_iter=2, directed=True
        )
        assert got[(1, 0)] == _py_ball_registers({0, 1})
        assert got[(2, 0)] == _py_ball_registers({0, 1, 2})
        assert got[(2, 2)] == _py_ball_registers({2})

    def test_estimates_accurate_on_star(self, spark):
        # star: center 0 with 60 leaves; at t=1 center's ball = 61,
        # leaves' balls = 62 - wait: leaf ball(1) = {leaf, 0}; center
        # ball(1) = all 61. Linear-counting regime at p=7 -> tight.
        edges = [(0, i) for i in range(1, 61)]
        df = spark.createDataFrame(edges, "src: long, dst: long")
        est = {
            (r.t, r.node): r.estimate
            for r in graph.neighborhood_function(df, p=7, n_iter=2).collect()
        }
        assert abs(est[(1, 0)] - 61) / 61 < 0.2
        assert abs(est[(1, 5)] - 2) < 1.5
        assert abs(est[(2, 5)] - 61) / 61 < 0.2

    def test_monotone_and_fixpoint_repeats(self, spark):
        # harmonic_s49 never increases with t; past the diameter the
        # state repeats exactly
        df = spark.createDataFrame([(0, 1), (1, 2)], "src: long, dst: long")
        rows = graph.neighborhood_function(df, p=7, n_iter=4).collect()
        s49 = {}
        for r in rows:
            s49.setdefault(r.node, {})[r.t] = r.harmonic_s49
        for node, per_t in s49.items():
            seq = [per_t[t] for t in sorted(per_t)]
            assert all(a >= b for a, b in zip(seq, seq[1:]))
            assert seq[2] == seq[3] == seq[4]  # diameter 2

    def test_validates(self, spark):
        df = spark.createDataFrame([(0, 1)], "src: long, dst: long")
        with pytest.raises(ValueError, match="n_iter"):
            graph.hyperball_states(df, n_iter=0)


class TestScd2FromChangelog:
    def _log(self, spark, rows):
        from datetime import datetime

        return spark.createDataFrame(
            [(k, datetime(2024, 1, d), v) for k, d, v in rows],
            ["key", "ts", "state"],
        )

    def test_episodes_collapse_and_close(self, spark):
        from context_aware_rag_spark.operators.diff import (
            scd2_from_changelog,
        )
        from datetime import datetime

        log = self._log(
            spark,
            [
                ("u1", 1, "a"), ("u1", 2, "a"), ("u1", 3, "b"),
                ("u1", 4, "b"), ("u1", 5, "a"),
                ("u2", 2, "x"),
            ],
        )
        got = sorted(
            map(tuple, scd2_from_changelog(
                log, ["key"], "ts", ["state"]).collect())
        )
        d = lambda n: datetime(2024, 1, n)
        assert got == sorted([
            ("u1", "a", d(1), d(3)),
            ("u1", "b", d(3), d(5)),
            ("u1", "a", d(5), None),
            ("u2", "x", d(2), None),
        ])

    def test_null_values_null_safe(self, spark):
        from context_aware_rag_spark.operators.diff import (
            scd2_from_changelog,
        )
        from datetime import datetime

        log = self._log(
            spark,
            [("u1", 1, None), ("u1", 2, None), ("u1", 3, "a"),
             ("u1", 4, None)],
        )
        got = sorted(
            map(tuple, scd2_from_changelog(
                log, ["key"], "ts", ["state"]).collect()),
            key=lambda t: t[2],
        )
        d = lambda n: datetime(2024, 1, n)
        # the leading all-NULL state is a real first episode; the
        # repeated NULL collapses into it; NULL after 'a' reopens
        assert got == [
            ("u1", None, d(1), d(3)),
            ("u1", "a", d(3), d(4)),
            ("u1", None, d(4), None),
        ]

    def test_multi_value_columns_and_null_ts_dropped(self, spark):
        from context_aware_rag_spark.operators.diff import (
            scd2_from_changelog,
        )
        from datetime import datetime

        log = spark.createDataFrame(
            [
                ("u1", datetime(2024, 1, 1), "a", 1),
                ("u1", datetime(2024, 1, 2), "a", 2),   # second col changes
                ("u1", datetime(2024, 1, 3), "a", 2),   # unchanged
                ("u1", None, "z", 9),                    # dropped
            ],
            ["key", "ts", "s1", "s2"],
        )
        got = sorted(
            map(tuple, scd2_from_changelog(
                log, ["key"], "ts", ["s1", "s2"]).collect()),
            key=lambda t: t[3],
        )
        d = lambda n: datetime(2024, 1, n)
        assert got == [
            ("u1", "a", 1, d(1), d(2)),
            ("u1", "a", 2, d(2), None),
        ]

    def test_single_exchange_plan(self, spark):
        from context_aware_rag_spark.operators.diff import (
            scd2_from_changelog,
        )

        log = self._log(spark, [("u1", 1, "a"), ("u1", 2, "b")])
        df = scd2_from_changelog(log, ["key"], "ts", ["state"])
        jvm = spark.sparkContext._jvm
        formatted = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # both windows (lag episode-start mark, lead episode close)
        # must share ONE shuffle on the key
        assert formatted.count(") Exchange") == 1

    def test_validation(self, spark):
        from context_aware_rag_spark.operators.diff import (
            scd2_from_changelog,
        )

        log = self._log(spark, [("u1", 1, "a")])
        with pytest.raises(ValueError, match="key column"):
            scd2_from_changelog(log, [], "ts", ["state"])
        with pytest.raises(ValueError, match="not in changelog"):
            scd2_from_changelog(log, ["key"], "ts", ["nope"])
        with pytest.raises(ValueError, match="valid_from"):
            scd2_from_changelog(
                log.withColumn("valid_from", F.lit(1)),
                ["key"], "ts", ["state"],
            )


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------

class TestModularity:
    def _run(self, spark, edges, labels):
        e = spark.createDataFrame(edges, "src: string, dst: string")
        a = spark.createDataFrame(labels, "node_id: string, label: string")
        return {
            r.label: r for r in graph.modularity(e, a).collect()
        }

    def test_two_cliques_perfect_split(self, spark):
        # two disjoint triangles, each its own community: the textbook
        # Q = 1/2 case (coverage 1/2 each, expected 1/4 each)
        tri = lambda p: [  # noqa: E731
            (f"{p}1", f"{p}2"), (f"{p}2", f"{p}3"), (f"{p}1", f"{p}3")
        ]
        rows = self._run(
            spark,
            tri("a") + tri("b"),
            [(f"{p}{i}", p) for p in "ab" for i in (1, 2, 3)],
        )
        for lab in "ab":
            r = rows[lab]
            assert r.n_nodes == 3 and r.intra_edges == 3 and r.deg_sum == 6
            assert r.coverage_ppm == 500_000
            assert r.expected_ppm == 250_000
            assert r.q_ppm == 250_000
        assert sum(r.q_ppm for r in rows.values()) == 500_000

    def test_single_community_is_zero(self, spark):
        # everything in one community: Q = 0 exactly (coverage 1,
        # expected (2m)^2/4m^2 = 1)
        rows = self._run(
            spark,
            [("1", "2"), ("2", "3"), ("3", "4")],
            [(str(i), "all") for i in range(1, 5)],
        )
        assert rows["all"].q_ppm == 0

    def test_hand_computed_cross_edge(self, spark):
        # triangle {a} + single edge {b}, one cross edge: m = 5,
        # intra_a = 3, deg_a = 7, intra_b = 1, deg_b = 3
        rows = self._run(
            spark,
            [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
             ("b1", "b2"), ("a1", "b1")],
            [("a1", "A"), ("a2", "A"), ("a3", "A"),
             ("b1", "B"), ("b2", "B")],
        )
        a, b = rows["A"], rows["B"]
        assert (a.intra_edges, a.deg_sum, a.n_nodes) == (3, 7, 3)
        assert (b.intra_edges, b.deg_sum, b.n_nodes) == (1, 3, 2)
        assert a.coverage_ppm == 3 * 1_000_000 // 5
        assert a.expected_ppm == 49 * 1_000_000 // 100
        assert a.q_ppm == 600_000 - 490_000
        assert b.q_ppm == 200_000 - 90_000

    def test_direction_dup_selfloop_invariance(self, spark):
        base = [("1", "2"), ("2", "3")]
        noisy = base + [("2", "1"), ("1", "2"), ("3", "3")]
        labels = [("1", "x"), ("2", "x"), ("3", "y")]
        clean = self._run(spark, base, labels)
        dirty = self._run(spark, noisy, labels)
        for lab in ("x", "y"):
            assert clean[lab] == dirty[lab]

    def test_missing_label_raises(self, spark):
        e = spark.createDataFrame([("1", "2")], "src: string, dst: string")
        a = spark.createDataFrame([("1", "x")], "node_id: string, label: string")
        with pytest.raises(Exception, match="needs a label"):
            graph.modularity(e, a).collect()


# ---------------------------------------------------------------------------
# minimum spanning forest (Boruvka vs pure-Python Kruskal)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import msf_py  # noqa: E402


def _msf_rows(spark, triples, **kw):
    e = spark.createDataFrame(triples, "src: string, dst: string, weight: long")
    out = graph.minimum_spanning_forest(e, **kw)
    return sorted((r.src, r.dst, r.weight) for r in out.collect())


class TestMinimumSpanningForest:
    def test_hand_computed_square(self, spark):
        # square with one heavy side: MST drops the 9
        edges = [("a", "b", 1), ("b", "c", 2), ("c", "d", 3), ("a", "d", 9)]
        assert _msf_rows(spark, edges) == [
            ("a", "b", 1), ("b", "c", 2), ("c", "d", 3)
        ]

    def test_forest_two_components(self, spark):
        edges = [("a", "b", 5), ("x", "y", 1), ("y", "z", 2), ("x", "z", 3)]
        assert _msf_rows(spark, edges) == [
            ("a", "b", 5), ("x", "y", 1), ("y", "z", 2)
        ]

    def test_tie_break_is_lexicographic(self, spark):
        # all weights equal on a triangle: keep the two (w, lo, hi)-
        # smallest edges
        edges = [("a", "b", 7), ("b", "c", 7), ("a", "c", 7)]
        assert _msf_rows(spark, edges) == [("a", "b", 7), ("a", "c", 7)]

    def test_dup_direction_selfloop_minweight(self, spark):
        edges = [
            ("b", "a", 4), ("a", "b", 2),  # dup pair keeps min
            ("c", "c", 0),                 # self-loop dropped
            ("b", "c", 3),
        ]
        assert _msf_rows(spark, edges) == [("a", "b", 2), ("b", "c", 3)]

    def test_equals_kruskal_on_random_graphs(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for n, p_mod, tag in ((12, 3, "g1"), (18, 2, "g2"), (25, 4, "g3")):
            edges = []
            for i in range(n):
                for j in range(i + 1, n):
                    if h(f"{tag}:{i}:{j}") % p_mod == 0:
                        # small weight range forces heavy ties
                        edges.append((f"n{i:02d}", f"n{j:02d}",
                                      h(f"w:{tag}:{i}:{j}") % 5))
            assert _msf_rows(spark, edges) == msf_py(edges), tag

    def test_long_path_contracts_within_rounds(self, spark):
        # a 40-node increasing path: round-1 merge graph IS the whole
        # path — exercises the lss contraction inside one round
        edges = [(f"p{i:02d}", f"p{i+1:02d}", i) for i in range(40)]
        assert _msf_rows(spark, edges) == msf_py(edges)

    def test_null_weight_raises(self, spark):
        e = spark.createDataFrame(
            [("a", "b", None)], "src: string, dst: string, weight: long"
        )
        with pytest.raises(Exception, match="non-null"):
            graph.minimum_spanning_forest(e).collect()


# ---------------------------------------------------------------------------
# maximal independent set (deterministic Luby)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import mis_py  # noqa: E402


def _mis_rows(spark, pairs):
    e = spark.createDataFrame(pairs, "src: string, dst: string")
    return sorted(
        (r.node_id, r.mis_round)
        for r in graph.maximal_independent_set(e).collect()
    )


class TestMaximalIndependentSet:
    def test_matches_python_and_is_valid(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for tag, n, mod in (("m1", 14, 3), ("m2", 20, 4), ("m3", 9, 2)):
            pairs = [
                (f"x{i:02d}", f"x{j:02d}")
                for i in range(n)
                for j in range(i + 1, n)
                if h(f"{tag}:{i}:{j}") % mod == 0
            ]
            got = _mis_rows(spark, pairs)
            assert got == mis_py(pairs), tag
            # structural validity: independent AND maximal
            mis = {n_ for n_, _ in got}
            adj = {}
            for a, b in pairs:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            for v in mis:
                assert not (adj[v] & mis), (tag, v)
            for v in set(adj) - mis:
                assert adj[v] & mis, (tag, v)

    def test_star_center_or_leaves(self, spark):
        # star: either the hub alone, or all leaves — never a mix
        pairs = [("hub", f"leaf{i}") for i in range(6)]
        mis = {n for n, _ in _mis_rows(spark, pairs)}
        assert mis == {"hub"} or mis == {f"leaf{i}" for i in range(6)}

    def test_triangle_single_winner_round_zero(self, spark):
        got = _mis_rows(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        assert len(got) == 1 and got[0][1] == 0

    def test_direction_dup_selfloop_invariance(self, spark):
        base = [("1", "2"), ("2", "3")]
        noisy = base + [("2", "1"), ("1", "2"), ("3", "3")]
        assert _mis_rows(spark, base) == _mis_rows(spark, noisy)


# ---------------------------------------------------------------------------
# temporal reachability (earliest arrival)
# ---------------------------------------------------------------------------

class TestTemporalReachability:
    def _run(self, spark, edges, seeds, **kw):
        e = spark.createDataFrame(edges, "src: string, dst: string, ts: long")
        out = graph.temporal_reachability(e, seeds, **kw)
        return {r.node_id: r.arrival_micro for r in out.collect()}

    def test_time_gate_blocks_backward_path(self, spark):
        # a->b at t=10, b->c at t=5: c is NOT reachable (strict gate);
        # b->d at t=20 is
        got = self._run(
            spark,
            [("a", "b", 10), ("b", "c", 5), ("b", "d", 20)],
            ["a"],
        )
        assert set(got) == {"a", "b", "d"}
        assert got["b"] == 10 and got["d"] == 20

    def test_earliest_arrival_wins(self, spark):
        # two routes to c: via b arriving 30, direct at 50 -> 30
        got = self._run(
            spark,
            [("a", "b", 10), ("b", "c", 30), ("a", "c", 50)],
            ["a"],
        )
        assert got["c"] == 30

    def test_later_but_enabling_path(self, spark):
        # the classic temporal trap: the cheapest static path a->b->z
        # (b's edge to z fires BEFORE a->b) is time-infeasible; the
        # longer a->x->z works
        got = self._run(
            spark,
            [("a", "b", 10), ("b", "z", 5),
             ("a", "x", 1), ("x", "z", 7)],
            ["a"],
        )
        assert got["z"] == 7

    def test_non_strict_gate(self, spark):
        got = self._run(
            spark,
            [("a", "b", 10), ("b", "c", 10)],
            ["a"],
            strict=False,
        )
        assert got.get("c") == 10
        got_strict = self._run(
            spark, [("a", "b", 10), ("b", "c", 10)], ["a"], strict=True
        )
        assert "c" not in got_strict

    def test_multi_source_min(self, spark):
        got = self._run(
            spark,
            [("s1", "m", 100), ("s2", "m", 40)],
            ["s1", "s2"],
        )
        assert got["m"] == 40

    def test_max_hops_bounds_depth(self, spark):
        chain = [(f"n{i}", f"n{i+1}", i + 1) for i in range(6)]
        got = self._run(spark, chain, ["n0"], max_hops=2)
        assert set(got) == {"n0", "n1", "n2"}

    def test_validation(self, spark):
        e = spark.createDataFrame(
            [("a", "b", 1)], "src: string, dst: string, ts: long"
        )
        with pytest.raises(ValueError, match="seed"):
            graph.temporal_reachability(e, [])
        with pytest.raises(ValueError, match="duplicate"):
            graph.temporal_reachability(e, ["a", "a"])
        en = spark.createDataFrame(
            [("a", "b", None)], "src: string, dst: string, ts: long"
        )
        with pytest.raises(Exception, match="non-null"):
            graph.temporal_reachability(en, ["a"]).collect()


# ---------------------------------------------------------------------------
# k-truss
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import k_truss_py  # noqa: E402


def _truss_rows(spark, pairs, k):
    e = spark.createDataFrame(pairs, "src: string, dst: string")
    return sorted(
        (r.src, r.dst, r.support)
        for r in graph.k_truss(e, k).collect()
    )


class TestKTruss:
    def test_clique_survives_its_truss(self, spark):
        # K4: every edge closes 2 triangles -> survives k=4, dies k=5
        k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
        got4 = _truss_rows(spark, k4, 4)
        assert len(got4) == 6 and all(s == 2 for _, _, s in got4)
        assert _truss_rows(spark, k4, 5) == []

    def test_pendant_triangle_cascade(self, spark):
        # K4 with a pendant triangle hanging off one vertex: k=4 peels
        # the triangle (support 1), then nothing else — a real cascade
        pend = [("a", "p"), ("b", "p"), ("a", "b")]
        k4 = [(x, y) for i, x in enumerate("abcd") for y in "abcd"[i + 1:]]
        got = _truss_rows(spark, k4 + pend, 4)
        assert {(a, b) for a, b, _ in got} == {
            (min(x, y), max(x, y)) for x, y in k4
        }

    def test_matches_python_on_random_graphs(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for tag, n, mod, k in (("t1", 12, 2, 3), ("t2", 16, 3, 4), ("t3", 10, 2, 4)):
            pairs = [
                (f"v{i:02d}", f"v{j:02d}")
                for i in range(n)
                for j in range(i + 1, n)
                if h(f"{tag}:{i}:{j}") % mod == 0
            ]
            assert _truss_rows(spark, pairs, k) == k_truss_py(pairs, k), tag

    def test_triangle_free_graph_empty_at_k3(self, spark):
        path = [(f"p{i}", f"p{i+1}") for i in range(5)]
        assert _truss_rows(spark, path, 3) == []

    def test_k2_keeps_everything(self, spark):
        pairs = [("a", "b"), ("b", "c")]
        got = _truss_rows(spark, pairs, 2)
        assert [(a, b) for a, b, _ in got] == [("a", "b"), ("b", "c")]

    def test_validation(self, spark):
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        with pytest.raises(ValueError, match="k >= 2"):
            graph.k_truss(e, 1)


# ---------------------------------------------------------------------------
# Weisfeiler-Lehman labels
# ---------------------------------------------------------------------------

def _wl_py(pairs, rounds):
    import hashlib

    adj = {}
    for a, b in {(str(a), str(b)) for a, b in pairs}:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: str(len(adj[n])) for n in adj}
    out = [(n, 0, l) for n, l in lab.items()]
    for r in range(1, rounds + 1):
        lab = {
            n: hashlib.md5(
                (lab[n] + "\x1f" + ",".join(sorted(lab[m] for m in adj[n])))
                .encode()
            ).hexdigest()[:16]
            for n in adj
        }
        out.extend((n, r, l) for n, l in lab.items())
    return sorted(out)


class TestWlLabels:
    def _run(self, spark, pairs, rounds=2):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return sorted(
            (r.node_id, r.round, r.label)
            for r in graph.wl_labels(e, rounds=rounds).collect()
        )

    def test_matches_python(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        pairs = [
            (f"w{i:02d}", f"w{j:02d}")
            for i in range(12)
            for j in range(i + 1, 12)
            if h(f"wl:{i}:{j}") % 3 == 0
        ]
        assert self._run(spark, pairs, 3) == _wl_py(pairs, 3)

    def test_isomorphic_positions_share_labels(self, spark):
        # path a-b-c-d-e: symmetric positions (a,e) and (b,d) must
        # carry identical labels at EVERY round; c stays unique
        path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        rows = self._run(spark, path, 3)
        lab = {(n, r): l for n, r, l in rows}
        for r in range(4):
            assert lab[("a", r)] == lab[("e", r)]
            assert lab[("b", r)] == lab[("d", r)]
            assert lab[("b", r)] != lab[("a", r)]

    def test_refinement_splits_degree_twins(self, spark):
        # x and y both have degree 2 (same round-0 label) but one sits
        # on a triangle and one on a path: round 2 separates them
        tri_plus_path = [
            ("x", "p"), ("x", "q"), ("p", "q"),   # triangle corner x
            ("y", "s"), ("y", "t"),               # path middle y
        ]
        rows = self._run(spark, tri_plus_path, 2)
        lab = {(n, r): l for n, r, l in rows}
        assert lab[("x", 0)] == lab[("y", 0)] == "2"
        assert lab[("x", 2)] != lab[("y", 2)]

    def test_round_zero_only(self, spark):
        rows = self._run(spark, [("a", "b")], rounds=0)
        assert rows == [("a", 0, "1"), ("b", 0, "1")]


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import hits_py  # noqa: E402


class TestHits:
    def _run(self, spark, pairs, iterations=5):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return sorted(
            (r.node_id, r.hub_micro, r.auth_micro)
            for r in graph.hits(e, iterations=iterations).collect()
        )

    def test_matches_python_on_random_digraphs(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for tag, n, mod in (("h1", 10, 3), ("h2", 14, 4)):
            pairs = [
                (f"d{i:02d}", f"d{j:02d}")
                for i in range(n)
                for j in range(n)
                if i != j and h(f"{tag}:{i}:{j}") % mod == 0
            ]
            assert self._run(spark, pairs) == hits_py(pairs), tag

    def test_star_separates_hub_from_authority(self, spark):
        # one broadcaster pointing at many: the center is THE hub
        # (max-normalized to 1e6), leaves are the authorities
        pairs = [("hub", f"x{i}") for i in range(5)]
        rows = {n: (hm, am) for n, hm, am in self._run(spark, pairs)}
        assert rows["hub"] == (1_000_000, 0)
        for i in range(5):
            assert rows[f"x{i}"] == (0, 1_000_000)

    def test_direction_matters(self, spark):
        fwd = self._run(spark, [("a", "b"), ("c", "b")])
        rev = self._run(spark, [("b", "a"), ("b", "c")])
        d_fwd = dict((n, (hm, am)) for n, hm, am in fwd)
        d_rev = dict((n, (hm, am)) for n, hm, am in rev)
        assert d_fwd["b"] == (0, 1_000_000)
        assert d_rev["b"] == (1_000_000, 0)

    def test_validation(self, spark):
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="iterations"):
            graph.hits(e, iterations=0)


# ---------------------------------------------------------------------------
# densest subgraph (Bahmani greedy peeling)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import densest_py  # noqa: E402


class TestDensestSubgraph:
    def _run(self, spark, pairs, eps_ppm=100_000):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return sorted(
            (r.node_id, r.density_ppm, r.n_nodes, r.n_edges, r.found_round)
            for r in graph.densest_subgraph(e, eps_ppm=eps_ppm).collect()
        )

    def test_clique_with_tail_finds_the_clique(self, spark):
        # K5 (density 2.0) plus a long path (density ~1): the clique
        # must survive as the densest core
        k5 = [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]
        tail = [(f"p{i}", f"p{i+1}") for i in range(8)] + [("k0", "p0")]
        rows = self._run(spark, k5 + tail)
        nodes = {n for n, *_ in rows}
        assert nodes == {f"k{i}" for i in range(5)}
        assert rows[0][1] == 2_000_000  # 10 edges / 5 nodes

    def test_matches_python_on_random_graphs(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for tag, n, mod in (("d1", 14, 3), ("d2", 20, 5)):
            pairs = [
                (f"v{i:02d}", f"v{j:02d}")
                for i in range(n)
                for j in range(i + 1, n)
                if h(f"{tag}:{i}:{j}") % mod == 0
            ]
            assert self._run(spark, pairs) == densest_py(pairs), tag

    def test_single_edge(self, spark):
        rows = self._run(spark, [("a", "b")])
        assert [(n, d) for n, d, *_ in rows] == [
            ("a", 500_000), ("b", 500_000)
        ]

    def test_validation(self, spark):
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="eps_ppm"):
            graph.densest_subgraph(e, eps_ppm=-1)
        empty = spark.createDataFrame([("a", "a")], "src: string, dst: string")
        with _pytest.raises(ValueError, match="empty graph"):
            graph.densest_subgraph(empty)


# ---------------------------------------------------------------------------
# greedy coloring (iterated MIS)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import coloring_py  # noqa: E402


class TestGreedyColoring:
    def _run(self, spark, pairs, **kw):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return sorted(
            (r.node_id, r.color)
            for r in graph.greedy_coloring(e, **kw).collect()
        )

    def test_matches_python_and_is_proper(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        pairs = [
            (f"c{i:02d}", f"c{j:02d}")
            for i in range(12)
            for j in range(i + 1, 12)
            if h(f"col:{i}:{j}") % 3 == 0
        ]
        got = self._run(spark, pairs)
        assert got == coloring_py(pairs)
        col = dict(got)
        for a, b in pairs:
            assert col[a] != col[b], (a, b)

    def test_triangle_needs_three_colors(self, spark):
        got = self._run(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        assert {c for _, c in got} == {0, 1, 2}

    def test_star_is_two_colors(self, spark):
        pairs = [("hub", f"x{i}") for i in range(5)]
        col = dict(self._run(spark, pairs))
        assert {col["hub"]} | {col[f"x{i}"] for i in range(5)} == {0, 1}

    def test_max_colors_raises(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")], "src: string, dst: string"
        )
        with pytest.raises(RuntimeError, match="exhaust"):
            graph.greedy_coloring(e, max_colors=2)


# ---------------------------------------------------------------------------
# weighted PageRank
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import (  # noqa: E402
    pagerank_py,
    pagerank_weighted_py,
)


class TestPagerankWeighted:
    def _run(self, spark, triples, **kw):
        e = spark.createDataFrame(triples, "src: string, dst: string, weight: long")
        return {
            r.node_id: r.rank_micro
            for r in graph.pagerank_weighted(e, **kw).collect()
        }

    def test_matches_python(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        triples = [
            (f"p{i}", f"p{j}", 1 + h(f"pw:{i}:{j}") % 9)
            for i in range(9)
            for j in range(9)
            if i != j and h(f"pe:{i}:{j}") % 3 == 0
        ]
        assert self._run(spark, triples) == pagerank_weighted_py(triples)

    def test_heavier_edge_pulls_more_rank(self, spark):
        # a splits 9:1 between b and c; dangling mass recycles evenly,
        # so b must outrank c
        got = self._run(spark, [("a", "b", 9), ("a", "c", 1)])
        assert got["b"] > got["c"]

    def test_parallel_edges_sum(self, spark):
        one = self._run(spark, [("a", "b", 2), ("a", "c", 1)])
        dup = self._run(spark, [("a", "b", 1), ("a", "b", 1), ("a", "c", 1)])
        assert one == dup

    def test_nonpositive_weight_raises(self, spark):
        e = spark.createDataFrame(
            [("a", "b", 0)], "src: string, dst: string, weight: long"
        )
        with pytest.raises(Exception, match="positive"):
            graph.pagerank_weighted(e).collect()


# ---------------------------------------------------------------------------
# bipartite projection
# ---------------------------------------------------------------------------

class TestBipartiteProjection:
    def test_hand_computed(self, spark):
        # orders: o1 {s1,s2,s3}, o2 {s1,s2}, o3 {s2,s3}
        rows = [
            ("s1", "o1"), ("s2", "o1"), ("s3", "o1"),
            ("s1", "o2"), ("s2", "o2"),
            ("s2", "o3"), ("s3", "o3"),
        ]
        e = spark.createDataFrame(rows, "src: string, dst: string")
        got = {
            (r.a, r.b): r.n_shared
            for r in graph.bipartite_projection(e, min_shared=1).collect()
        }
        assert got == {
            ("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 2
        }
        gated = {
            (r.a, r.b)
            for r in graph.bipartite_projection(e, min_shared=2).collect()
        }
        assert gated == {("s1", "s2"), ("s2", "s3")}

    def test_duplicate_rows_collapse(self, spark):
        rows = [("a", "o"), ("a", "o"), ("b", "o")]
        e = spark.createDataFrame(rows, "src: string, dst: string")
        out = graph.bipartite_projection(e, min_shared=1).collect()
        assert [(r.a, r.b, r.n_shared) for r in out] == [("a", "b", 1)]

    def test_validation(self, spark):
        e = spark.createDataFrame([("a", "o")], "src: string, dst: string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="min_shared"):
            graph.bipartite_projection(e, min_shared=0)


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------

class TestDegreeAssortativity:
    def _run(self, spark, pairs):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return graph.degree_assortativity(e).collect()[0]

    def test_star_is_maximally_disassortative(self, spark):
        # star: every edge joins deg-n hub to deg-1 leaf -> r = -1
        r = self._run(spark, [("h", f"x{i}") for i in range(5)])
        assert r.r_ppm == -1_000_000

    def test_regular_graph_null(self, spark):
        # cycle: all degrees 2 -> zero variance -> NULL
        cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        assert self._run(spark, cyc).r_ppm is None

    def test_hand_computed_path(self, spark):
        # path a-b-c-d: degrees 1,2,2,1; edges (1,2),(2,2),(2,1)
        # S1 = 3+4+3 = 10, S2 = 5+8+5 = 18, S3 = 2+4+2 = 8, M = 3
        # r = (4*3*8 - 100) / (2*3*18 - 100) = -4/8 = -0.5
        r = self._run(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert (r.n_edges, r.s1, r.s2, r.s3) == (3, 10, 18, 8)
        assert r.r_ppm == -500_000

    def test_two_cliques_assortative_sign(self, spark):
        # K3 + K4 disjoint: within each clique degrees equal, across
        # cliques none -> positive assortativity (like attaches like)
        k3 = [("a", "b"), ("b", "c"), ("a", "c")]
        k4 = [(f"k{i}", f"k{j}") for i in range(4) for j in range(i + 1, 4)]
        r = self._run(spark, k3 + k4)
        assert r.r_ppm == 1_000_000


# ---------------------------------------------------------------------------
# condensation + topological layering
# ---------------------------------------------------------------------------

class TestCondenseAndLayers:
    def test_condense_drops_intra_and_dedups(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "x"), ("b", "x"), ("x", "y")],
            "src: string, dst: string",
        )
        lab = spark.createDataFrame(
            [("a", "A"), ("b", "A"), ("x", "X"), ("y", "Y")],
            "node_id: string, scc_id: string",
        )
        got = sorted(
            (r.src, r.dst) for r in graph.condense(e, lab, label="scc_id").collect()
        )
        assert got == [("A", "X"), ("X", "Y")]

    def test_condense_missing_label_raises(self, spark):
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        lab = spark.createDataFrame(
            [("a", "A")], "node_id: string, scc_id: string"
        )
        with pytest.raises(Exception, match="needs a label"):
            graph.condense(e, lab, label="scc_id").collect()

    def test_layers_longest_path(self, spark):
        # diamond with a shortcut: d's layer = longest path = 2
        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")],
            "src: string, dst: string",
        )
        got = dict(
            (r.node_id, r.layer) for r in graph.topo_layers(e).collect()
        )
        assert got == {"a": 0, "b": 1, "c": 1, "d": 2}

    def test_layers_cycle_raises(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src: string, dst: string"
        )
        with pytest.raises(ValueError, match="cycle"):
            graph.topo_layers(e)

    def test_scc_condense_layers_composition(self, spark):
        # 2-cycle {a,b} feeding x feeding the 2-cycle {c,d}:
        # condensation = A -> x -> C, layers 0/1/2
        e = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "x"), ("x", "c"),
             ("c", "d"), ("d", "c")],
            "src: string, dst: string",
        )
        sccs = graph.strongly_connected_components(e)
        dag = graph.condense(e, sccs, label="scc_id")
        layers = {
            r.node_id: r.layer for r in graph.topo_layers(dag).collect()
        }
        assert sorted(layers.values()) == [0, 1, 2]
        assert layers["a"] == 0 and layers["x"] == 1 and layers["c"] == 2


# ---------------------------------------------------------------------------
# PathSim
# ---------------------------------------------------------------------------

class TestPathsim:
    def _run(self, spark, rows, **kw):
        inst = spark.createDataFrame(rows, "a: string, mid: string, n: long")
        return {
            (r.a, r.b): r for r in graph.pathsim(inst, **kw).collect()
        }

    def test_hand_computed(self, spark):
        # x: {m1: 2, m2: 1}; y: {m1: 1}; z: {m3: 5}
        rows = [("x", "m1", 2), ("x", "m2", 1), ("y", "m1", 1), ("z", "m3", 5)]
        got = self._run(spark, rows)
        r = got[("x", "y")]
        # m_xy = 2*1 = 2; m_xx = 4+1 = 5; m_yy = 1
        assert (r.m_ab, r.m_aa, r.m_bb) == (2, 5, 1)
        assert r.pathsim_ppm == 4_000_000 // 6
        assert ("x", "z") not in got  # no shared mid

    def test_identical_profiles_score_one(self, spark):
        rows = [("x", "m1", 3), ("x", "m2", 1), ("y", "m1", 3), ("y", "m2", 1)]
        assert self._run(spark, rows)[("x", "y")].pathsim_ppm == 1_000_000

    def test_normalization_penalizes_big_nodes(self, spark):
        # hub shares y's whole profile but has 10x more mass elsewhere:
        # PathSim must rank the modest twin above the hub
        rows = (
            [("y", "m1", 1), ("twin", "m1", 1)]
            + [("hub", "m1", 1)] + [("hub", f"e{i}", 3) for i in range(10)]
        )
        got = self._run(spark, rows)
        assert got[("twin", "y")].pathsim_ppm > got[("hub", "y")].pathsim_ppm

    def test_duplicate_instance_rows_sum(self, spark):
        a = self._run(spark, [("x", "m", 2), ("y", "m", 1)])
        b = self._run(spark, [("x", "m", 1), ("x", "m", 1), ("y", "m", 1)])
        assert a[("x", "y")] == b[("x", "y")]

    def test_min_sim_cut_and_validation(self, spark):
        rows = [("x", "m1", 2), ("x", "m2", 1), ("y", "m1", 1)]
        assert self._run(spark, rows, min_sim_ppm=700_000) == {}
        inst = spark.createDataFrame(rows, "a: string, mid: string, n: long")
        with pytest.raises(ValueError, match="min_sim_ppm"):
            graph.pathsim(inst, min_sim_ppm=-1)


# ---------------------------------------------------------------------------
# local clustering coefficients
# ---------------------------------------------------------------------------

class TestClusteringCoefficients:
    def _run(self, spark, pairs):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return {
            r.node_id: (r.degree, r.n_triangles, r.clustering_ppm)
            for r in graph.clustering_coefficients(e).collect()
        }

    def test_hand_computed(self, spark):
        # triangle abc plus pendant d on a: a has deg 3, 1 triangle,
        # C = 2*1/(3*2) = 1/3; b,c have deg 2, C = 1; d deg 1 -> NULL
        got = self._run(
            spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
        )
        assert got["a"] == (3, 1, 333_333)
        assert got["b"] == (2, 1, 1_000_000)
        assert got["c"] == (2, 1, 1_000_000)
        assert got["d"] == (1, 0, None)

    def test_clique_all_one(self, spark):
        k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
        got = self._run(spark, k4)
        assert all(v == (3, 3, 1_000_000) for v in got.values())

    def test_star_center_zero(self, spark):
        got = self._run(spark, [("h", f"x{i}") for i in range(4)])
        assert got["h"] == (4, 0, 0)
        assert all(got[f"x{i}"][2] is None for i in range(4))

    def test_python_replication(self, spark):
        import hashlib
        from itertools import combinations

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        pairs = [
            (f"v{i:02d}", f"v{j:02d}")
            for i in range(14)
            for j in range(i + 1, 14)
            if h(f"cc:{i}:{j}") % 3 == 0
        ]
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        exp = {}
        for v, nb in adj.items():
            t = sum(
                1 for x, y in combinations(sorted(nb), 2) if y in adj[x]
            )
            d = len(nb)
            c = (2 * t * 1_000_000) // (d * (d - 1)) if d >= 2 else None
            exp[v] = (d, t, c)
        assert self._run(spark, pairs) == exp


class TestShortestPath:
    def _df(self, spark, rows):
        from pyspark.sql import functions as F  # noqa: F401
        return spark.createDataFrame(
            [(int(a), int(b)) for a, b in rows], "src long, dst long"
        )

    def _run(self, spark, rows, s, t, **kw):
        from context_aware_rag_spark.operators.graph import shortest_path

        return sorted(
            (r.step, r.node_id)
            for r in shortest_path(self._df(spark, rows), s, t, **kw).collect()
        )

    def test_path_graph_chain(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (3, 4)], 1, 4)
        assert got == [(0, 1), (1, 2), (2, 3), (3, 4)]

    def test_min_predecessor_election(self, spark):
        # two shortest 1->4 paths (via 2 or via 3): the pred-chain
        # must pick the lexicographically least interior node
        got = self._run(spark, [(1, 2), (1, 3), (2, 4), (3, 4)], 1, 4)
        assert got == [(0, 1), (1, 2), (2, 4)]

    def test_source_equals_target(self, spark):
        got = self._run(spark, [(1, 2)], 1, 1)
        assert got == [(0, 1)]

    def test_unreachable_is_empty(self, spark):
        got = self._run(spark, [(1, 2), (3, 4)], 1, 4)
        assert got == []

    def test_max_depth_bounds_search(self, spark):
        rows = [(1, 2), (2, 3), (3, 4)]
        assert self._run(spark, rows, 1, 4, max_depth=2) == []
        assert len(self._run(spark, rows, 1, 4, max_depth=3)) == 4

    def test_directed_respects_orientation(self, spark):
        rows = [(1, 2), (3, 2)]  # no directed 1->3 path
        assert self._run(spark, rows, 1, 3, directed=True) == []
        got = self._run(spark, rows, 1, 3, directed=False)
        assert got == [(0, 1), (1, 2), (2, 3)]

    def test_guard(self, spark):
        from context_aware_rag_spark.operators.graph import shortest_path

        with pytest.raises(ValueError, match="max_depth"):
            shortest_path(self._df(spark, [(1, 2)]), 1, 2, max_depth=-1)


class TestDegreeConcentration:
    def _run(self, spark, rows):
        from context_aware_rag_spark.operators.graph import (
            degree_concentration,
        )

        df = spark.createDataFrame(
            [(str(a), str(b)) for a, b in rows], "src string, dst string"
        )
        return degree_concentration(df).collect()[0]

    def test_regular_graph_zero_gini(self, spark):
        # 4-cycle: every node degree 2 — perfectly uniform
        r = self._run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert (r.n_nodes, r.n_edges, r.max_degree) == (4, 4, 2)
        assert (r.median_degree, r.p99_degree) == (2, 2)
        assert r.gini_ppm == 0
        # top ceil(4/100)=1 node holds 2 of 8 endpoints
        assert r.top1pct_share_ppm == 250_000

    def test_star_concentrates(self, spark):
        # hub degree 9, 9 leaves degree 1: Gini via the rank formula
        rows = [(0, i) for i in range(1, 10)]
        r = self._run(spark, rows)
        assert (r.n_nodes, r.n_edges, r.max_degree) == (10, 9, 9)
        # p99 rank = ceil(9.9) = 10 — the hub itself at n=10
        assert r.median_degree == 1 and r.p99_degree == 9
        # degrees asc: nine 1s then a 9. sum d = 18,
        # sum i*d = 45 + 10*9 = 135; (270 - 11*18)*1e6 // 180
        assert r.gini_ppm == (2 * 135 - 11 * 18) * 1_000_000 // (10 * 18)
        assert r.top1pct_share_ppm == 500_000  # hub: 9 of 18

    def test_duplicate_and_self_edges_collapse(self, spark):
        r = self._run(spark, [(1, 2), (2, 1), (1, 1), (1, 2)])
        assert (r.n_nodes, r.n_edges, r.max_degree) == (2, 1, 1)
        assert r.gini_ppm == 0

    def test_empty_graph_row(self, spark):
        from context_aware_rag_spark.operators.graph import (
            degree_concentration,
        )

        df = spark.createDataFrame([], "src string, dst string")
        r = degree_concentration(df).collect()[0]
        assert (r.n_nodes, r.n_edges) == (0, 0)
        assert r.gini_ppm is None

    def test_tie_order_invariance(self, spark):
        # two graphs identical up to node relabeling inside a degree
        # tie must produce the same scorecard
        a = self._run(spark, [(1, 2), (2, 3)])
        b = self._run(spark, [(9, 8), (8, 7)])
        assert tuple(a) == tuple(b)


class TestShortestPathTriples:
    def _run(self, spark, tri_rows, s, t, **kw):
        from context_aware_rag_spark.operators.graph import (
            shortest_path_triples,
        )

        tri = spark.createDataFrame(
            tri_rows, "subj_name string, pred string, obj_name string"
        )
        return sorted(
            tuple(r)
            for r in shortest_path_triples(tri, s, t, **kw).collect()
        )

    def test_labeled_chain_with_directions(self, spark):
        # a —WORKS_AT→ b, c —MANAGES→ b: path a-b-c crosses hop 2
        # backward
        rows = [
            ("a", "WORKS_AT", "b"),
            ("c", "MANAGES", "b"),
        ]
        got = self._run(spark, rows, "a", "c")
        assert got == [
            (0, "a", "WORKS_AT", "b", "forward"),
            (1, "b", "MANAGES", "c", "backward"),
        ]

    def test_parallel_predicates_all_emitted(self, spark):
        rows = [
            ("a", "KNOWS", "b"),
            ("a", "MET", "b"),
            ("b", "KNOWS", "a"),
        ]
        got = self._run(spark, rows, "a", "b")
        assert got == [
            (0, "a", "KNOWS", "b", "backward"),
            (0, "a", "KNOWS", "b", "forward"),
            (0, "a", "MET", "b", "forward"),
        ]

    def test_source_equals_target_empty(self, spark):
        got = self._run(spark, [("a", "P", "b")], "a", "a")
        assert got == []

    def test_unreachable_empty(self, spark):
        got = self._run(
            spark, [("a", "P", "b"), ("c", "P", "d")], "a", "d"
        )
        assert got == []

    def test_min_predecessor_chain_labels(self, spark):
        # two equal paths a-b-d and a-c-d: chain must go via b
        rows = [
            ("a", "P1", "b"),
            ("a", "P2", "c"),
            ("b", "P3", "d"),
            ("c", "P4", "d"),
        ]
        got = self._run(spark, rows, "a", "d")
        assert got == [
            (0, "a", "P1", "b", "forward"),
            (1, "b", "P3", "d", "forward"),
        ]


# ---------------------------------------------------------------------------
# Katz centrality (unnormalized truncated expansion)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.oracle.precompute import katz_py  # noqa: E402


class TestKatzCentrality:
    def _run(self, spark, pairs, iterations=8, alpha_ppm=100_000):
        e = spark.createDataFrame(pairs, "src: string, dst: string")
        return sorted(
            (r.node_id, r.katz_micro)
            for r in graph.katz_centrality(
                e, iterations=iterations, alpha_ppm=alpha_ppm
            ).collect()
        )

    def test_matches_python_on_random_digraphs(self, spark):
        import hashlib

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for tag, n, mod in (("k1", 10, 3), ("k2", 14, 4)):
            pairs = [
                (f"d{i:02d}", f"d{j:02d}")
                for i in range(n)
                for j in range(n)
                if i != j and h(f"{tag}:{i}:{j}") % mod == 0
            ]
            assert self._run(spark, pairs) == katz_py(pairs), tag

    def test_chain_attenuates_per_hop(self, spark):
        # a -> b -> c with alpha 0.1: b = 1 + 0.1, c = 1 + 0.1 b
        got = dict(self._run(spark, [("a", "b"), ("b", "c")]))
        assert got["a"] == 1_000_000
        assert got["b"] == 1_100_000
        assert got["c"] == 1_110_000

    def test_source_with_no_in_edges_holds_micro(self, spark):
        got = dict(self._run(spark, [("s", f"t{i}") for i in range(4)]))
        assert got["s"] == 1_000_000
        assert all(got[f"t{i}"] == 1_100_000 for i in range(4))

    def test_no_degree_division_vs_pagerank_shape(self, spark):
        # a broadcaster feeding 3 targets gives each FULL attenuated
        # mass (Katz never splits over out-degree)
        one = dict(self._run(spark, [("s", "t0")]))
        many = dict(self._run(spark, [("s", f"t{i}") for i in range(3)]))
        assert one["t0"] == many["t0"]

    def test_duplicates_and_self_loops_collapse(self, spark):
        a = self._run(spark, [("a", "b"), ("a", "b"), ("b", "b")])
        b = self._run(spark, [("a", "b")])
        assert a == b

    def test_validation(self, spark):
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="iterations"):
            graph.katz_centrality(e, iterations=0)
        with _pytest.raises(ValueError, match="alpha_ppm"):
            graph.katz_centrality(e, alpha_ppm=0)
        with _pytest.raises(ValueError, match="alpha_ppm"):
            graph.katz_centrality(e, alpha_ppm=1_000_000)
