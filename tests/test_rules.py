"""AMIE-lite path-rule mining / application (operators/rules.py) vs a
pure-Python replication and hand geometries."""

import random

import pytest

from context_aware_rag_spark.operators import rules


def _df(spark, tri):
    return spark.createDataFrame(tri, "src: string, rel: string, dst: string")


def _mine_py(tri, min_support, min_conf_ppm, max_mid_fanout=10_000):
    tri = sorted(set(tri))
    in_deg, out_deg = {}, {}
    for h, _p, t in tri:
        out_deg[h] = out_deg.get(h, 0) + 1
        in_deg[t] = in_deg.get(t, 0) + 1
    ok = {
        m
        for m in set(in_deg) & set(out_deg)
        if in_deg[m] * out_deg[m] <= max_mid_fanout
    }
    body = set()
    for h1, p1, m in tri:
        if m not in ok:
            continue
        for m2, p2, t2 in tri:
            if m2 == m and h1 != t2:
                body.add((p1, p2, h1, t2))
    body_sz, support = {}, {}
    edges = {(h, p, t) for h, p, t in tri}
    by_pair = {}
    for h, p, t in tri:
        by_pair.setdefault((h, t), set()).add(p)
    for p1, p2, x, y in body:
        body_sz[(p1, p2)] = body_sz.get((p1, p2), 0) + 1
        for p3 in by_pair.get((x, y), ()):
            support[(p1, p2, p3)] = support.get((p1, p2, p3), 0) + 1
    out = {}
    for (p1, p2, p3), s in support.items():
        bs = body_sz[(p1, p2)]
        conf = (s * 1_000_000) // bs
        if s >= min_support and conf >= min_conf_ppm:
            out[(p1, p2, p3)] = (s, bs, conf)
    return out


def _planted():
    tri = []
    for c in range(8):
        n = f"n{c % 2}"
        tri.append((f"c{c}", "in_nation", n))
    tri.append(("n0", "in_region", "r0"))
    tri.append(("n1", "in_region", "r0"))
    # in_region head edges for 6 of the 8 customers -> confidence 6/8
    for c in range(6):
        tri.append((f"c{c}", "cust_region", "r0"))
    return tri


def test_mine_finds_planted_rule_with_exact_confidence(spark):
    tri = _planted()
    got = {
        (r.p1, r.p2, r.p3): (r.support, r.body_size, r.conf_ppm)
        for r in rules.mine_path_rules(
            _df(spark, tri), min_support=2, min_conf_ppm=500_000
        ).collect()
    }
    assert got[("in_nation", "in_region", "cust_region")] == (6, 8, 750_000)


def test_mine_matches_python_random_kg(spark):
    rng = random.Random(61)
    ents = [f"e{i}" for i in range(15)]
    preds = ["pa", "pb", "pc"]
    tri = list({
        (rng.choice(ents), rng.choice(preds), rng.choice(ents))
        for _ in range(120)
    })
    got = {
        (r.p1, r.p2, r.p3): (r.support, r.body_size, r.conf_ppm)
        for r in rules.mine_path_rules(
            _df(spark, tri), min_support=1, min_conf_ppm=0
        ).collect()
    }
    assert got == _mine_py(tri, 1, 0)


def test_mid_fanout_guard_drops_hub_paths(spark):
    # hub m: 5 in x 5 out = fanout 25
    tri = [(f"a{i}", "p", "hub") for i in range(5)]
    tri += [("hub", "q", f"b{i}") for i in range(5)]
    tri += [(f"a{i}", "r", f"b{i}") for i in range(5)]
    full = rules.mine_path_rules(
        _df(spark, tri), min_support=1, min_conf_ppm=0, max_mid_fanout=25
    )
    assert full.filter("p1 = 'p' AND p2 = 'q'").count() > 0
    capped = rules.mine_path_rules(
        _df(spark, tri), min_support=1, min_conf_ppm=0, max_mid_fanout=24
    )
    assert capped.filter("p1 = 'p' AND p2 = 'q'").count() == 0
    assert _mine_py(tri, 1, 0, max_mid_fanout=24) == {
        (r.p1, r.p2, r.p3): (r.support, r.body_size, r.conf_ppm)
        for r in capped.collect()
    }


def test_infer_emits_missing_heads_only_and_is_idempotent(spark):
    tri = _planted()
    df = _df(spark, tri)
    mined = rules.mine_path_rules(df, min_support=2, min_conf_ppm=700_000)
    inferred = rules.infer_from_rules(df, mined)
    got = {(r.src, r.rel, r.dst): r.conf_ppm for r in inferred.collect()}
    # exactly the two customers missing their cust_region edge
    assert got == {
        ("c6", "cust_region", "r0"): 750_000,
        ("c7", "cust_region", "r0"): 750_000,
    }
    # materialize and re-apply: nothing new
    merged = df.unionByName(inferred.select("src", "rel", "dst"))
    again = rules.infer_from_rules(merged, mined)
    assert again.count() == 0


def test_rules_validation(spark):
    df = _df(spark, [("a", "p", "b")])
    with pytest.raises(ValueError):
        rules.mine_path_rules(df, min_support=0)
    with pytest.raises(ValueError):
        rules.mine_path_rules(df, min_conf_ppm=2_000_000)
    with pytest.raises(ValueError):
        rules.mine_path_rules(df, max_mid_fanout=0)


class TestRelationProfile:
    def test_hand_computed(self, spark):
        tri = [
            # functional: 3 subjects, 3 triples, 2 distinct objects
            ("a", "born_in", "x"), ("b", "born_in", "x"), ("c", "born_in", "y"),
            # non-functional: 1 subject, 3 objects
            ("a", "visited", "x"), ("a", "visited", "y"), ("a", "visited", "z"),
            # symmetric pair + one unreciprocated + one reflexive
            ("a", "met", "b"), ("b", "met", "a"), ("a", "met", "c"),
            ("d", "met", "d"),
        ]
        got = {r.pred: r for r in rules.relation_profile(_df(spark, tri)).collect()}
        b = got["born_in"]
        assert (b.n_triples, b.n_subjects, b.n_objects) == (3, 3, 2)
        assert b.functionality_ppm == 1_000_000
        assert b.inv_functionality_ppm == 666_666
        assert (b.n_reflexive, b.n_symmetric, b.symmetry_ppm) == (0, 0, 0)
        v = got["visited"]
        assert (v.n_triples, v.n_subjects, v.n_objects) == (3, 1, 3)
        assert v.functionality_ppm == 333_333
        assert v.inv_functionality_ppm == 1_000_000
        m = got["met"]
        assert (m.n_triples, m.n_reflexive) == (4, 1)
        # reflexive (d,d) is NOT counted symmetric; (a,b)+(b,a) are
        assert m.n_symmetric == 2
        assert m.symmetry_ppm == 500_000

    def test_duplicate_triples_collapse(self, spark):
        tri = [("a", "p", "b")] * 5 + [("b", "p", "a")]
        r = rules.relation_profile(_df(spark, tri)).collect()[0]
        assert (r.n_triples, r.n_symmetric) == (2, 2)

    def test_empty_predicate_isolation(self, spark):
        # symmetry join must key on pred: reverse under ANOTHER
        # predicate is not symmetry
        tri = [("a", "p", "b"), ("b", "q", "a")]
        got = {r.pred: r.n_symmetric for r in
               rules.relation_profile(_df(spark, tri)).collect()}
        assert got == {"p": 0, "q": 0}


class TestRelationSignatures:
    def test_hand_computed(self, spark):
        rows = [
            ("p", "Person", "Org"), ("p", "Person", "Org"),
            ("p", "Person", "Place"), ("q", None, "Org"),
        ]
        df = spark.createDataFrame(
            rows, "rel: string, subj_type: string, obj_type: string"
        )
        got = {
            (r.pred, r.subj_type, r.obj_type): (r.n_triples, r.share_ppm)
            for r in rules.relation_signatures(df).collect()
        }
        assert got[("p", "Person", "Org")] == (2, 666_666)
        assert got[("p", "Person", "Place")] == (1, 333_333)
        # NULL type is its own anomaly class, never coalesced
        assert got[("q", None, "Org")] == (1, 1_000_000)


class TestInverseRuleCensus:
    def _tri(self, spark, rows):
        return spark.createDataFrame(rows, "src string, rel string, dst string")

    def test_cross_predicate_inverse(self, spark):
        rows = [
            ("a", "delivered_to", "b"),
            ("b", "received_from", "a"),
            ("c", "delivered_to", "d"),
            ("d", "received_from", "c"),
            ("e", "delivered_to", "f"),  # unreciprocated
            ("x", "owns", "y"),          # unrelated
        ]
        out = {
            (r.pred, r.pred_inv): r.asDict()
            for r in rules.inverse_rule_census(self._tri(spark, rows)).collect()
        }
        fwd = out[("delivered_to", "received_from")]
        assert fwd["n_overlap"] == 2
        assert fwd["n_pairs_p"] == 3 and fwd["n_pairs_q"] == 2
        assert fwd["confidence_ppm"] == 2 * 1_000_000 // 3
        rev = out[("received_from", "delivered_to")]
        assert rev["n_overlap"] == 2 and rev["confidence_ppm"] == 1_000_000
        assert ("owns", "owns") not in out

    def test_same_pred_overlap_equals_relation_profile_symmetry(self, spark):
        rows = [
            ("a", "met", "b"),
            ("b", "met", "a"),
            ("c", "met", "d"),   # one-directional
            ("e", "met", "e"),   # reflexive: excluded by both operators
        ]
        tri = self._tri(spark, rows)
        census = {
            (r.pred, r.pred_inv): r.n_overlap
            for r in rules.inverse_rule_census(tri).collect()
        }
        prof = {
            r.pred: r.n_symmetric
            for r in rules.relation_profile(tri).collect()
        }
        # n_symmetric counts orientations too, so the identity is
        # equality (both see the (a,b) AND (b,a) rows)
        assert census[("met", "met")] == prof["met"] == 2

    def test_reflexive_and_duplicates_dropped(self, spark):
        rows = [
            ("a", "p", "a"),  # reflexive would trivially self-match
            ("a", "p", "b"),
            ("a", "p", "b"),  # duplicate collapses
            ("b", "p", "a"),
        ]
        out = rules.inverse_rule_census(self._tri(spark, rows)).collect()
        assert len(out) == 1
        assert out[0].n_overlap == 2 and out[0].n_pairs_p == 2

    def test_min_overlap_gate_and_guard(self, spark):
        tri = self._tri(spark, [("a", "p", "b"), ("b", "p", "a"),
                                ("c", "q", "d"), ("d", "q", "c"),
                                ("e", "q", "f"), ("f", "q", "e")])
        out = rules.inverse_rule_census(tri, min_overlap=3).collect()
        assert {(r.pred, r.pred_inv) for r in out} == {("q", "q")}
        with pytest.raises(ValueError):
            rules.inverse_rule_census(tri, min_overlap=0)

    def test_no_single_partition_and_broadcast_sizes(self, spark):
        rows = [("s%d" % i, "p%d" % (i % 3), "s%d" % ((i + 1) % 20))
                for i in range(40)]
        df = rules.inverse_rule_census(self._tri(spark, rows))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
        assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def _tri5(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj_name string, subj_type string, pred string, "
        "obj_name string, obj_type string",
    )


class TestTypeCompletion:
    def test_signature_vote_elects_majority_type(self, spark):
        rows = [
            # WORKS_AT subjects: 2 typed Person, 1 typed Robot
            ("alice", "Person", "WORKS_AT", "acme", "Org"),
            ("bob", "Person", "WORKS_AT", "acme", "Org"),
            ("r2", "Robot", "WORKS_AT", "acme", "Org"),
            # mystery: untyped everywhere, one WORKS_AT subj slot
            ("mystery", None, "WORKS_AT", "acme", None),
        ]
        got = rules.type_completion(_tri5(spark, rows)).collect()
        # 'acme' is typed (Org) so only 'mystery' is a candidate
        assert len(got) == 1
        r = got[0]
        # votes: w=1 slot x n_sig — Person 2, Robot 1; margin 1
        assert (r.name, r.inferred_type, r.votes, r.margin, r.n_slots) == (
            "mystery", "Person", 2, 1, 1
        )

    def test_elsewhere_typed_name_is_not_inferred(self, spark):
        rows = [
            ("alice", "Person", "WORKS_AT", "acme", "Org"),
            ("alice", None, "VISITED", "paris", "Place"),  # row-level NULL
            ("ghost", None, "WORKS_AT", "acme", "Org"),
        ]
        got = {r.name for r in rules.type_completion(_tri5(spark, rows)).collect()}
        assert got == {"ghost"}  # alice is known elsewhere

    def test_tie_breaks_on_type_asc(self, spark):
        rows = [
            ("a1", "Alpha", "P", "x", "T"),
            ("b1", "Beta", "P", "x", "T"),
            ("u", None, "P", "x", "T"),
        ]
        r = rules.type_completion(_tri5(spark, rows)).collect()[0]
        assert (r.inferred_type, r.votes, r.margin) == ("Alpha", 1, 0)

    def test_no_typed_evidence_means_absent(self, spark):
        rows = [("u", None, "P", "v", None)]
        assert rules.type_completion(_tri5(spark, rows)).count() == 0

    def test_vote_weights_multiply_occurrences(self, spark):
        rows = [
            ("alice", "Person", "MET", "bob", "Person"),
            # mystery occurs in TWO distinct MET-subj triples: w=2
            ("mystery", None, "MET", "carol", "Person"),
            ("mystery", None, "MET", "dave", "Person"),
        ]
        r = rules.type_completion(_tri5(spark, rows)).collect()[0]
        # subj slot: w=2 x n_sig(MET,subj,Person)=1 → 2 votes... plus
        # nothing from obj side (mystery never an object)
        assert (r.name, r.inferred_type, r.votes, r.n_slots) == (
            "mystery", "Person", 2, 1
        )


class TestPredicateAlignment:
    def test_synonym_full_jaccard(self, spark):
        a = _tri5(spark, [
            ("x", "T", "EMPLOYED_BY", "acme", "Org"),
            ("y", "T", "EMPLOYED_BY", "bigco", "Org"),
        ])
        b = _tri5(spark, [
            ("x", "T", "WORKS_AT", "acme", "Org"),
            ("y", "T", "WORKS_AT", "bigco", "Org"),
        ])
        got = rules.predicate_alignment(a, b).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.pred_a, r.pred_b, r.n_common) == (
            "EMPLOYED_BY", "WORKS_AT", 2
        )
        assert r.jaccard_ppm == 1_000_000
        assert r.containment_a_ppm == r.containment_b_ppm == 1_000_000

    def test_subproperty_containment_asymmetry(self, spark):
        a = _tri5(spark, [  # CEO_OF ⊂ WORKS_AT
            ("x", "T", "CEO_OF", "acme", "Org"),
        ])
        b = _tri5(spark, [
            ("x", "T", "WORKS_AT", "acme", "Org"),
            ("y", "T", "WORKS_AT", "acme", "Org"),
        ])
        r = rules.predicate_alignment(a, b).collect()[0]
        assert r.containment_a_ppm == 1_000_000  # all of CEO_OF inside
        assert r.containment_b_ppm == 500_000
        assert r.jaccard_ppm == 500_000

    def test_min_common_gate_and_guard(self, spark):
        a = _tri5(spark, [("x", "T", "P", "u", "T")])
        b = _tri5(spark, [("x", "T", "Q", "u", "T")])
        assert rules.predicate_alignment(a, b, min_common=2).count() == 0
        with pytest.raises(ValueError, match="min_common"):
            rules.predicate_alignment(a, b, min_common=0)

    def test_duplicate_assertions_collapse_in_extension(self, spark):
        a = _tri5(spark, [
            ("x", "T", "P", "u", "T"),
            ("x", "T2", "P", "u", "T2"),  # same name pair, retyped
        ])
        b = _tri5(spark, [("x", "T", "Q", "u", "T")])
        r = rules.predicate_alignment(a, b).collect()[0]
        assert (r.n_a, r.n_b, r.n_common) == (1, 1, 1)
