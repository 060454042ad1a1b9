"""Predicate canonicalization (canonicalize.canonicalize_predicates):
distributional alias merging over (subj, obj) pair profiles."""

from context_aware_rag_spark.operators import canonicalize


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj_name: string, pred: string, obj_name: string"
    )


def _canon(spark, rows, **kw):
    return {
        r.pred: (r.canon_pred, r.n_pairs)
        for r in canonicalize.canonicalize_predicates(
            _triples(spark, rows), **kw
        ).collect()
    }


def test_alias_predicates_merge_and_strangers_do_not(spark):
    pairs = [("alice", "bob"), ("carol", "dan"), ("eve", "frank")]
    rows = []
    for s, o in pairs:
        rows.append((s, "married_to", o))
        rows.append((s, "spouse_of", o))
    # overlaps on 1 of 3 pairs only -> jaccard 1/3 < 0.5
    rows.append(("alice", "knows", "bob"))
    rows.append(("zed", "knows", "yana"))
    rows.append(("xia", "knows", "walt"))
    got = _canon(spark, rows, threshold=0.5)
    assert got["married_to"] == ("married_to", 3)
    assert got["spouse_of"] == ("married_to", 3)
    assert got["knows"] == ("knows", 3)


def test_transitive_alias_chain_closes(spark):
    # J(p_a, p_b) = J(p_b, p_c) = 2/4 = 0.5, but J(p_a, p_c) = 1/5 —
    # the chain must still close into one group via CC
    rows = [
        ("s1", "p_a", "o1"), ("s2", "p_a", "o2"), ("s3", "p_a", "o3"),
        ("s1", "p_b", "o1"), ("s2", "p_b", "o2"), ("s4", "p_b", "o4"),
        ("s2", "p_c", "o2"), ("s4", "p_c", "o4"), ("s5", "p_c", "o5"),
    ]
    got = _canon(spark, rows, threshold=0.5)
    assert got == {
        "p_a": ("p_a", 3), "p_b": ("p_a", 3), "p_c": ("p_a", 3)
    }


def test_duplicate_triples_do_not_inflate_profiles(spark):
    rows = [
        ("a", "uses", "b"), ("a", "uses", "b"), ("a", "uses", "b"),
        ("a", "uses_tool", "b"),
    ]
    got = _canon(spark, rows, threshold=1.0)
    # identical singleton profiles, duplicates collapsed
    assert got == {"uses": ("uses", 1), "uses_tool": ("uses", 1)}


def test_pair_identity_is_subject_object_sensitive(spark):
    # reversed arguments are DIFFERENT pairs — no merge
    rows = [("a", "parent_of", "b"), ("b", "child_of", "a")]
    got = _canon(spark, rows, threshold=0.5)
    assert got == {
        "parent_of": ("parent_of", 1), "child_of": ("child_of", 1)
    }
