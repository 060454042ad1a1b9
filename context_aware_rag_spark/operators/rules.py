"""Horn-rule mining and application over the triple store (AMIE-lite).

AMIE (Galarraga et al., WWW 2013) mines closed Horn rules like
``in_nation(x, n) AND nation_in_region(n, r) => in_region(x, r)`` from
a KG and scores them by support and confidence; applying confident
rules is the classic symbolic KG-completion step (the complement to
the learned :mod:`kge` link predictor). The reference has no rule
engine — its graph completion is LLM-prompted; here mining is three
relational passes over the triple table, so it runs at corpus scale.

Scope: length-2 closed path rules ``p1(x, m) AND p2(m, y) => p3(x, y)``
— AMIE's most productive rule class and the one whose evaluation is
pure equi-join algebra.

    body(p1, p2)    = DISTINCT (x, y) pairs connected by the path
    support(..p3)   = |body INTERSECT edges of p3|
    confidence      = support / |body|      (standard CWA confidence)

100 TB shape: the path enumeration is ONE self-join of the triple
table on the mid entity — the quadratic hazard is a hub mid (fan-out
in_deg(m) x out_deg(m)), guarded by ``max_mid_fanout`` exactly like
pmi_edges' max_group_size / the dedup df_cap discipline: hub mids are
dropped from ENUMERATION only, deterministically, and the cap is part
of the operator's declared semantics. Everything downstream of the
path join is map-side-combined aggs on (p1, p2[, p3]) — rule-schema
sized, not corpus sized. Confidence is integer ppm (trunc div).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _clean(triples: DataFrame, src: str, rel: str, dst: str) -> DataFrame:
    return (
        triples.select(
            F.col(src).cast("string").alias("h"),
            F.col(rel).cast("string").alias("p"),
            F.col(dst).cast("string").alias("t"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )


def _paths(tri: DataFrame, max_mid_fanout: int) -> DataFrame:
    """DISTINCT (p1, p2, x, y) with x != y, via mids whose
    in_deg * out_deg <= max_mid_fanout."""
    if max_mid_fanout < 1:
        raise ValueError(f"need max_mid_fanout >= 1, got {max_mid_fanout}")
    in_deg = tri.groupBy(F.col("t").alias("m")).agg(
        F.count(F.lit(1)).alias("_in")
    )
    out_deg = tri.groupBy(F.col("h").alias("m")).agg(
        F.count(F.lit(1)).alias("_out")
    )
    ok_mid = (
        in_deg.join(out_deg, "m")
        .filter(F.col("_in") * F.col("_out") <= max_mid_fanout)
        .select("m")
    )
    left = tri.select(
        F.col("h").alias("x"), F.col("p").alias("p1"), F.col("t").alias("m")
    ).join(ok_mid, "m")
    right = tri.select(
        F.col("h").alias("m"), F.col("p").alias("p2"), F.col("t").alias("y")
    )
    return (
        left.join(right, "m")
        .filter(F.col("x") != F.col("y"))
        .select("p1", "p2", "x", "y")
        .dropDuplicates()
    )


def mine_path_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_conf_ppm: int = 100_000,
    max_mid_fanout: int = 10_000,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
) -> DataFrame:
    """Mine ``p1 AND p2 => p3`` rules: returns (p1, p2, p3, support,
    body_size, conf_ppm) with conf_ppm = (support * 1e6) div body_size,
    filtered to support >= min_support and conf_ppm >= min_conf_ppm.
    Trivially-true self-rules where p3 reproduces a body edge are NOT
    excluded — filtering them is the caller's policy choice."""
    if min_support < 1:
        raise ValueError(f"need min_support >= 1, got {min_support}")
    if not (0 <= min_conf_ppm <= 1_000_000):
        raise ValueError(f"min_conf_ppm out of range: {min_conf_ppm}")
    tri = _clean(triples, src, rel, dst)
    body = _paths(tri, max_mid_fanout).localCheckpoint()
    body_sz = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("body_size")
    )
    heads = tri.select(
        F.col("h").alias("x"), F.col("p").alias("p3"), F.col("t").alias("y")
    )
    support = (
        body.join(heads, ["x", "y"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        support.join(body_sz, ["p1", "p2"])
        .withColumn(
            "conf_ppm", F.expr("(support * 1000000) div body_size")
        )
        .filter(
            (F.col("support") >= min_support)
            & (F.col("conf_ppm") >= min_conf_ppm)
        )
        .select("p1", "p2", "p3", "support", "body_size", "conf_ppm")
    )


def infer_from_rules(
    triples: DataFrame,
    rules: DataFrame,
    max_mid_fanout: int = 10_000,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
) -> DataFrame:
    """Apply mined rules: emit CANDIDATE triples (src, rel, dst,
    conf_ppm) that the rule bodies derive but the KG does not yet
    contain — the symbolic KG-completion feed (a candidate's conf_ppm
    is the MAX confidence over rules deriving it; deterministic).

    ``rules`` needs (p1, p2, p3, conf_ppm) —
    :func:`mine_path_rules` output works as-is. Candidates are
    anti-joined against the existing edges of p3, so re-applying rules
    is idempotent: inferred-and-materialized triples stop being
    candidates."""
    tri = _clean(triples, src, rel, dst)
    body = _paths(tri, max_mid_fanout)
    cand = (
        body.join(
            F.broadcast(rules.select("p1", "p2", "p3", "conf_ppm")),
            ["p1", "p2"],
        )
        .groupBy(
            F.col("x").alias("src"),
            F.col("p3").alias("rel"),
            F.col("y").alias("dst"),
        )
        .agg(F.max("conf_ppm").alias("conf_ppm"))
    )
    existing = tri.select(
        F.col("h").alias("src"), F.col("p").alias("rel"),
        F.col("t").alias("dst"),
    )
    return cand.join(existing, ["src", "rel", "dst"], "left_anti")


def inverse_rule_census(
    triples: DataFrame,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    min_overlap: int = 1,
) -> DataFrame:
    """AMIE inverse-rule census: for every ordered predicate pair
    (p, q), the support and CWA confidence of ``p(x, y) => q(y, x)``.

    Over the DISTINCT non-reflexive triple set:

    - ``n_overlap`` — |{(x, y) : p(x, y) AND q(y, x)}|, the rule's
      support. For ``p == q`` this counts BOTH orientations of each
      symmetric pair (the (x,y) and (y,x) rows each find their
      reverse) — exactly :func:`relation_profile`'s ``n_symmetric``,
      which also counts orientations, a cross-operator consistency
      identity the tests pin.
    - ``n_pairs_p`` / ``n_pairs_q`` — each predicate's distinct
      non-reflexive edge count.
    - ``confidence_ppm`` — ``n_overlap * 1e6 div n_pairs_p`` (CWA
      confidence of the rule with p as body). Near 1e6 with p != q
      is an inverse predicate pair (DELIVERED_TO / RECEIVED_FROM):
      canonicalize one onto the other before graph materialization.
      Near 1e6 with p == q is a symmetric predicate. Low-but-nonzero
      across unrelated pairs is the reversed-argument extraction-bug
      signal, rankable directly.

    Integer trunc-div ppm, same discipline as :func:`relation_profile`.

    100 TB shape: ONE self-equi-join of the distinct triple table on
    the reversed (entity, entity) key — both sides shuffle on
    (h, t)/(t, h), candidate volume is bounded by the true reversed-
    pair count (never all-pairs within a predicate) — followed by a
    map-side-combined groupBy on (p, q) and a broadcast join against
    the vocabulary-sized per-predicate edge counts. No windows, no
    driver actions.
    """
    if min_overlap < 1:
        raise ValueError(f"need min_overlap >= 1, got {min_overlap}")
    tri = _clean(triples, src, rel, dst).filter(F.col("h") != F.col("t"))
    sizes = tri.groupBy("p").agg(F.count(F.lit(1)).alias("n_pairs"))
    rev = tri.select(
        F.col("t").alias("h"), F.col("p").alias("q"), F.col("h").alias("t")
    )
    overlap = (
        tri.join(rev, ["h", "t"])
        .groupBy(F.col("p").alias("pred"), F.col("q").alias("pred_inv"))
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return (
        overlap.join(
            F.broadcast(sizes.select(F.col("p").alias("pred"),
                                     F.col("n_pairs").alias("n_pairs_p"))),
            "pred",
        )
        .join(
            F.broadcast(sizes.select(F.col("p").alias("pred_inv"),
                                     F.col("n_pairs").alias("n_pairs_q"))),
            "pred_inv",
        )
        .select(
            "pred",
            "pred_inv",
            "n_overlap",
            "n_pairs_p",
            "n_pairs_q",
            F.expr("n_overlap * 1000000 div n_pairs_p").alias(
                "confidence_ppm"
            ),
        )
    )


def relation_profile(
    triples: DataFrame,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
) -> DataFrame:
    """Per-predicate schema census — the statistics AMIE conditions
    on, surfaced as a first-class QA table for the freshly-built KG.

    For each predicate over the DISTINCT triple set:

    - ``n_triples``, ``n_subjects``, ``n_objects`` — raw cardinalities.
    - ``functionality_ppm`` = n_subjects / n_triples (AMIE's fun(p),
      Galarraga et al. 2013 §3): 1e6 means every subject has exactly
      one object — a functional relation, where a second object for
      the same subject is an extraction ERROR, the KG-construction
      monitor's highest-precision anomaly signal.
    - ``inv_functionality_ppm`` = n_objects / n_triples — same, for
      the inverse direction (identifies join-key-like predicates).
    - ``n_reflexive`` — triples with subj == obj (usually extraction
      noise for real-world relation vocabularies).
    - ``n_symmetric`` / ``symmetry_ppm`` — non-reflexive triples whose
      exact reverse (obj, pred, subj) is also asserted; a predicate
      near 1e6 is symmetric (MET, MARRIED_TO) and its edges should be
      canonically oriented before dedup, near 0 is directed
      (MANAGES) and a reversed pair is a likely extraction swap.

    All ratios are integer trunc-div ppm (engine-portable — the
    repo-wide discipline). Composite entity identities (name, type)
    are the caller's to compose into ``src``/``dst`` (concat with an
    unambiguous separator), same contract as :func:`mine_path_rules`.

    100 TB shape: one multi-distinct groupBy(pred) (single Expand
    pass) + one self-equi-join keyed on the full reversed tuple —
    both shuffles are triple-table-sized, output is
    vocabulary-sized. No windows, no driver actions, no UDFs.
    """
    tri = _clean(triples, src, rel, dst)
    base = tri.groupBy(F.col("p").alias("pred")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("h").alias("n_subjects"),
        F.countDistinct("t").alias("n_objects"),
        F.sum((F.col("h") == F.col("t")).cast("long")).alias("n_reflexive"),
    )
    rev = tri.select(
        F.col("p"), F.col("t").alias("h"), F.col("h").alias("t")
    )
    sym = (
        tri.filter(F.col("h") != F.col("t"))
        .join(rev, ["p", "h", "t"], "left_semi")
        .groupBy(F.col("p").alias("pred"))
        .agg(F.count(F.lit(1)).alias("n_symmetric"))
    )
    return (
        base.join(sym, "pred", "left")
        .na.fill({"n_symmetric": 0})
        .select(
            "pred",
            "n_triples",
            "n_subjects",
            "n_objects",
            F.expr("n_subjects * 1000000 div n_triples").alias(
                "functionality_ppm"
            ),
            F.expr("n_objects * 1000000 div n_triples").alias(
                "inv_functionality_ppm"
            ),
            "n_reflexive",
            "n_symmetric",
            F.expr("n_symmetric * 1000000 div n_triples").alias(
                "symmetry_ppm"
            ),
        )
    )


def relation_signatures(
    triples: DataFrame,
    rel: str = "rel",
    subj_type: str = "subj_type",
    obj_type: str = "obj_type",
) -> DataFrame:
    """Domain/range census: distinct-triple counts per (pred,
    subj_type, obj_type) with the share of the predicate's total in
    integer ppm — the schema-induction companion to
    :func:`relation_profile` (which profiles instances; this profiles
    the TYPE signature). A predicate whose mass concentrates on one
    (domain, range) pair has an induced signature; rows outside it
    are type-level extraction anomalies, rankable directly by
    ``share_ppm``. NULL types group as NULL (never coalesced to a
    fake type — an untyped mention is its own anomaly class).

    Counts are over input rows AS GIVEN — pass the distinct triple
    set (the same contract the kg_relation_profile query applies);
    the operator cannot dedupe for you because entity identity
    columns are not in its signature.

    One map-side-combined groupBy + a predicate-keyed window over the
    signature-sized result for the total; output is
    vocabulary x type-vocabulary sized.
    """
    tri = triples.select(
        F.col(rel).cast("string").alias("pred"),
        F.col(subj_type).cast("string").alias("subj_type"),
        F.col(obj_type).cast("string").alias("obj_type"),
    )
    sig = tri.groupBy("pred", "subj_type", "obj_type").agg(
        F.count(F.lit(1)).alias("n_triples")
    )
    return sig.withColumn(
        "share_ppm",
        F.expr("n_triples * 1000000 div sum(n_triples) over (partition by pred)"),
    )


def type_completion(triples: DataFrame) -> DataFrame:
    """Entity-type completion by domain/range signature vote — the
    KG-construction step that fills the holes extraction leaves: an
    entity asserted only in untyped mentions inherits the type its
    predicates' signatures predict (Paulheim 2017's SDType in the
    AMIE-census idiom; :func:`relation_signatures` profiles the
    signatures, this APPLIES them).

    Input: the pipeline triple schema (subj_name, subj_type, pred,
    obj_name, obj_type); rows are deduplicated to the distinct
    name-level triple set internally. An entity NAME is "untyped" iff
    no row anywhere types it (per-row NULLs on an elsewhere-typed name
    are the canonicalizer's job, not this operator's). For each
    untyped name: every (pred, role) slot it occupies casts
    ``w * n_sig`` votes for each type, where ``w`` is the number of
    distinct triples putting the name in that slot and ``n_sig`` the
    count of TYPED distinct triples of that (pred, role, type) —
    exact integer weights, no floats. The winner is elected by
    (votes DESC, type ASC), emitted with its vote mass, the runner-up
    margin, and the slot count; names whose every predicate has no
    typed examples are absent (no evidence, no guess).

    Output: (name, inferred_type, votes, margin, n_slots).

    100 TB shape: the signature table is vocabulary × type-vocabulary
    sized → broadcast into the untyped-occurrence join; candidate rows
    per name are bounded by the type vocabulary, so the election
    window is narrow; two map-side-combined aggs + one broadcast join,
    no corpus self-join.
    """
    base = triples.select(
        "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    occ = base.select(
        F.col("subj_name").alias("name"),
        F.col("subj_type").alias("typ"),
        "pred",
        F.lit("subj").alias("role"),
    ).unionAll(
        base.select(
            F.col("obj_name").alias("name"),
            F.col("obj_type").alias("typ"),
            "pred",
            F.lit("obj").alias("role"),
        )
    )
    known = (
        occ.filter(F.col("typ").isNotNull())
        .select("name")
        .distinct()
    )
    sig = (
        occ.filter(F.col("typ").isNotNull())
        .groupBy("pred", "role", "typ")
        .agg(F.count(F.lit(1)).alias("n_sig"))
    )
    untyped_occ = (
        occ.join(known, "name", "left_anti")
        .groupBy("name", "pred", "role")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    votes = (
        untyped_occ.join(F.broadcast(sig), ["pred", "role"])
        .groupBy("name", "typ")
        .agg(
            F.sum(F.col("w") * F.col("n_sig")).alias("votes"),
        )
    )
    slots = untyped_occ.groupBy("name").agg(
        F.count(F.lit(1)).alias("n_slots")
    )
    w_rank = Window.partitionBy("name").orderBy(
        F.col("votes").desc(), F.col("typ").asc()
    )
    return (
        votes.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "margin",
            F.col("votes")
            - F.coalesce(
                F.lead("votes").over(w_rank), F.lit(0)
            ),
        )
        .filter(F.col("rk") == 1)
        .join(slots, "name")
        .select(
            "name",
            F.col("typ").alias("inferred_type"),
            "votes",
            "margin",
            "n_slots",
        )
    )


def predicate_alignment(
    triples_a: DataFrame,
    triples_b: DataFrame,
    min_common: int = 1,
) -> DataFrame:
    """Predicate (schema) alignment between two KGs by extension
    overlap — the merge step when two extraction runs (different
    prompt versions, different corpora halves, an acquired KG) name
    the same relation differently: predicates asserting the same
    (subj, obj) pairs ARE the same relation, whatever they are called
    (PARIS, Suchanek et al. 2011, restricted to its relation-overlap
    leg with exact integer evidence).

    Both inputs use the pipeline triple schema; extensions are the
    distinct name-level (subj, obj) pair sets per predicate. For every
    predicate pair with ``n_common >= min_common`` shared pairs:

    (pred_a, pred_b, n_a, n_b, n_common, jaccard_ppm,
     containment_a_ppm, containment_b_ppm)

    — Jaccard for symmetric alignment, the two containments to detect
    sub-property relationships (a pred whose extension sits INSIDE
    another's is a narrower relation, not a synonym).

    100 TB shape: one equi-join of the two distinct extension tables
    keyed on the (subj, obj) pair — a pair shared by many predicates
    fans out at most |vocab_a| x |vocab_b| rows, vocabulary-bounded by
    construction; per-pred sizes are vocabulary-sized broadcasts; the
    census agg is map-side combined.
    """
    if min_common < 1:
        raise ValueError(f"need min_common >= 1, got {min_common}")

    def ext(t: DataFrame) -> DataFrame:
        return t.select(
            F.col("pred"),
            F.col("subj_name").alias("s"),
            F.col("obj_name").alias("o"),
        ).distinct()

    ea = ext(triples_a)
    eb = ext(triples_b)
    na = ea.groupBy(F.col("pred").alias("pred_a")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    nb = eb.groupBy(F.col("pred").alias("pred_b")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    common = (
        ea.withColumnRenamed("pred", "pred_a")
        .join(eb.withColumnRenamed("pred", "pred_b"), ["s", "o"])
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return (
        common.join(F.broadcast(na), "pred_a")
        .join(F.broadcast(nb), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "n_common * 1000000 div (n_a + n_b - n_common)"
            ).alias("jaccard_ppm"),
            F.expr("n_common * 1000000 div n_a").alias(
                "containment_a_ppm"
            ),
            F.expr("n_common * 1000000 div n_b").alias(
                "containment_b_ppm"
            ),
        )
    )
