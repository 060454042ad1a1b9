"""Exact Davis–Leinhardt triad census of a directed simple graph.

The 16-class triad census (Holland & Leinhardt 1970; class images as
in the standard catalog: 003, 012, 102, 021D ``a<-b->c``, 021U
``a->b<-c``, 021C ``a->b->c``, 111D ``a<->b<-c``, 111U ``a<->b->c``,
030T ``a->b<-c, a->c``, 030C ``a<-b<-c, a->c``, 201 ``a<->b<->c``,
120D ``a<-b->c, a<->c``, 120U ``a->b<-c, a<->c``, 120C
``a->b->c, a<->c``, 210, 300) is THE structural profile of a directed
graph — reciprocity, brokerage, transitivity and cyclicity in one
16-integer signature. Over an extracted KG it reads as a schema-level
QA fingerprint: inverse-predicate pairs inflate the mutual classes
(102/201/300), extraction direction bugs show up as 030C mass, and
hierarchy shows as 021D/120D dominance. Census drift between two
construction runs is a cheap regression alarm on the whole graph.

Algorithm — the edge/node-centric arithmetic of Batagelj & Mrvar
(Social Networks 23, 2001, "A subquadratic triad census algorithm"),
re-expressed as DataFrame aggregates. Enumeration is needed ONLY for
closed triples (triangles of the underlying undirected graph); every
open/disconnected class is pure counting:

- per-CENTER dyad-type pair counts give the 2-dyad classes
  (021D/U/C, 111D/U, 201) after subtracting each triangle's three
  center contributions;
- per-DYAD complement counting gives 012/102: an asymmetric (mutual)
  dyad {a, b} forms an 012 (102) triad with every third node adjacent
  to NEITHER endpoint, and |N(a) ∪ N(b) \\ {a,b}| = du(a) + du(b) - 2
  - common(a, b) with common = triangles through the dyad;
- 003 is the complement of everything vs C(n, 3).

Triangle LISTING uses degree-ordered orientation (Suri &
Vassilvitskii WWW 2011, same scheme as graph.triangle_count): orient
each undirected dyad from the smaller (degree, id) endpoint to the
larger, list wedges at the apex, close with an oriented edge — each
triangle materializes exactly once and a degree-skewed hub only emits
wedges through its (few) higher-order neighbors, bounding the wedge
join at O(m^1.5) regardless of skew.

100 TB shape: the wedge join is the only superlinear stage and is
skew-bounded as above; everything else is map-side-combinable
aggregation whose outputs are node-sized, dyad-sized, or constant-
sized; the scalar pieces (n and C(n,3)) broadcast back in-plan
(single-row crossJoin, the facts_as_of pattern — no driver collect).
Determinism: every count is exact integer arithmetic; output is the
16 fixed classes with explicit zeros.

All counts are over the DISTINCT non-reflexive arc set. Isolated
nodes are invisible to the default node universe (endpoints only);
pass ``nodes`` to census a larger universe — they only shift the
disconnected classes (003/012/102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLASSES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _c2(col):
    # n-choose-2 as exact integer arithmetic (shift, not float division)
    return F.shiftright((col * (col - F.lit(1))).cast("long"), 1)


def triad_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: "DataFrame | None" = None,
) -> DataFrame:
    """(clazz, n) — one row per Davis–Leinhardt class, explicit zeros.

    ``nodes``: optional single-column frame of the node universe
    (defaults to the arc endpoint set; extra nodes feed 003/012/102).
    """
    spark = edges.sparkSession
    arcs = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .dropDuplicates()
    )
    # ---- dyads: (lo, hi, fwd, rev) over the unordered pair ----------
    dyads = (
        arcs.select(
            F.least("s", "d").alias("lo"),
            F.greatest("s", "d").alias("hi"),
            (F.col("s") < F.col("d")).cast("int").alias("fwd"),
            (F.col("s") > F.col("d")).cast("int").alias("rev"),
        )
        .groupBy("lo", "hi")
        .agg(F.max("fwd").alias("fwd"), F.max("rev").alias("rev"))
        .withColumn("mut", (F.col("fwd") + F.col("rev") == 2).cast("int"))
        .localCheckpoint()
    )
    node_col = nodes.columns[0] if nodes is not None else None
    universe = (
        nodes.select(F.col(node_col).alias("v")).dropDuplicates()
        if nodes is not None
        else dyads.select(F.col("lo").alias("v"))
        .unionAll(dyads.select(F.col("hi").alias("v")))
        .dropDuplicates()
    )
    n_df = universe.agg(F.count(F.lit(1)).alias("n_nodes"))

    # ---- per-node dyad-type counts (out/in relative to v) -----------
    lo_side = dyads.select(
        F.col("lo").alias("v"),
        (F.col("fwd") * (1 - F.col("mut"))).alias("o"),   # v -> other
        (F.col("rev") * (1 - F.col("mut"))).alias("i"),
        F.col("mut").alias("m"),
    )
    hi_side = dyads.select(
        F.col("hi").alias("v"),
        (F.col("rev") * (1 - F.col("mut"))).alias("o"),
        (F.col("fwd") * (1 - F.col("mut"))).alias("i"),
        F.col("mut").alias("m"),
    )
    per_node = (
        lo_side.unionAll(hi_side)
        .groupBy("v")
        .agg(
            F.sum("o").alias("n_out"),
            F.sum("i").alias("n_in"),
            F.sum("m").alias("n_mut"),
        )
    )
    center_pairs = per_node.agg(
        F.sum(_c2(F.col("n_out"))).cast("long").alias("021D"),
        F.sum(_c2(F.col("n_in"))).cast("long").alias("021U"),
        F.sum(F.col("n_in") * F.col("n_out")).alias("021C"),
        F.sum(F.col("n_mut") * F.col("n_in")).alias("111D"),
        F.sum(F.col("n_mut") * F.col("n_out")).alias("111U"),
        F.sum(_c2(F.col("n_mut"))).cast("long").alias("201"),
    )

    # ---- triangle listing: degree-ordered orientation ---------------
    deg = (
        dyads.select(F.col("lo").alias("v"))
        .unionAll(dyads.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("du"))
        .localCheckpoint()
    )
    da, db = deg.alias("da"), deg.alias("db")
    with_deg = (
        dyads.join(da, F.col("lo") == F.col("da.v"))
        .join(db, F.col("hi") == F.col("db.v"))
        .select(
            "lo", "hi",
            F.col("da.du").alias("d_lo"), F.col("db.du").alias("d_hi"),
        )
    )
    lower_first = (F.col("d_lo") < F.col("d_hi")) | (
        (F.col("d_lo") == F.col("d_hi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lower_first, F.col("hi")).otherwise(F.col("lo")).alias("w"),
        F.when(lower_first, F.col("d_lo")).otherwise(F.col("d_hi")).alias("d_u"),
        F.when(lower_first, F.col("d_hi")).otherwise(F.col("d_lo")).alias("d_w"),
    ).localCheckpoint()
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    order_lt = (F.col("e1.d_w") < F.col("e2.d_w")) | (
        (F.col("e1.d_w") == F.col("e2.d_w"))
        & (F.col("e1.w") < F.col("e2.w"))
    )
    wedges = e1.join(
        e2, (F.col("e1.u") == F.col("e2.u")) & order_lt
    ).select(
        F.col("e1.u").alias("apex"),
        F.col("e1.w").alias("b1"),
        F.col("e2.w").alias("b2"),
    )
    tri_ids = wedges.join(
        e3,
        (F.col("e3.u") == F.col("b1")) & (F.col("e3.w") == F.col("b2")),
        "left_semi",
    ).select(
        F.array_sort(F.array("apex", "b1", "b2")).alias("t")
    ).select(
        F.col("t")[0].alias("n1"), F.col("t")[1].alias("n2"),
        F.col("t")[2].alias("n3"),
    )
    d12, d13, d23 = dyads.alias("d12"), dyads.alias("d13"), dyads.alias("d23")
    tri = (
        tri_ids.join(
            d12,
            (F.col("n1") == F.col("d12.lo")) & (F.col("n2") == F.col("d12.hi")),
        )
        .join(
            d13,
            (F.col("n1") == F.col("d13.lo")) & (F.col("n3") == F.col("d13.hi")),
        )
        .join(
            d23,
            (F.col("n2") == F.col("d23.lo")) & (F.col("n3") == F.col("d23.hi")),
        )
        .select(
            "n1", "n2", "n3",
            F.col("d12.fwd").alias("f12"), F.col("d12.rev").alias("r12"),
            F.col("d13.fwd").alias("f13"), F.col("d13.rev").alias("r13"),
            F.col("d23.fwd").alias("f23"), F.col("d23.rev").alias("r23"),
            (F.col("d12.mut") + F.col("d13.mut") + F.col("d23.mut")).alias("mm"),
            F.col("d12.mut").alias("m12"), F.col("d13.mut").alias("m13"),
            F.col("d23.mut").alias("m23"),
        )
        .localCheckpoint()
    )

    # ---- closed-class labels ----------------------------------------
    # mm == 1: z = the node outside the mutual dyad; z_out counts asym
    # arcs z -> pair, z_in arcs pair -> z (the two non-mutual dyads
    # both touch z).
    z_out = (
        F.when(F.col("m12") == 1, F.col("r13") + F.col("r23"))
        .when(F.col("m13") == 1, F.col("r12") + F.col("f23"))
        .otherwise(F.col("f12") + F.col("f13"))
    )
    z_in = (
        F.when(F.col("m12") == 1, F.col("f13") + F.col("f23"))
        .when(F.col("m13") == 1, F.col("f12") + F.col("r23"))
        .otherwise(F.col("r12") + F.col("r13"))
    )
    cyc = (
        (F.col("f12") * F.col("f23") * F.col("r13"))
        + (F.col("f13") * F.col("r23") * F.col("r12"))
    ) > 0
    clazz = (
        F.when(F.col("mm") == 3, F.lit("300"))
        .when(F.col("mm") == 2, F.lit("210"))
        .when(
            F.col("mm") == 1,
            F.when(z_out == 2, F.lit("120D"))
            .when(z_in == 2, F.lit("120U"))
            .otherwise(F.lit("120C")),
        )
        .otherwise(F.when(cyc, F.lit("030C")).otherwise(F.lit("030T")))
    )
    closed = tri.groupBy(clazz.alias("clazz")).agg(
        F.count(F.lit(1)).alias("n")
    )

    # ---- per-triangle center-pair contributions (to subtract) -------
    # type of dyad (p, q) relative to endpoint p: mut / out / in
    def rel(mut, toward, away):
        return (
            F.when(mut == 1, F.lit("m"))
            .when(toward == 1, F.lit("o"))
            .otherwise(F.lit("i"))
        )

    pairs_at = [
        # (type of first incident dyad, type of second) per node
        (rel(F.col("m12"), F.col("f12"), F.col("r12")),
         rel(F.col("m13"), F.col("f13"), F.col("r13"))),      # at n1
        (rel(F.col("m12"), F.col("r12"), F.col("f12")),
         rel(F.col("m23"), F.col("f23"), F.col("r23"))),      # at n2
        (rel(F.col("m13"), F.col("r13"), F.col("f13")),
         rel(F.col("m23"), F.col("r23"), F.col("f23"))),      # at n3
    ]

    def bucket(t1, t2):
        both = F.array_sort(F.array(t1, t2))
        key = F.concat(both[0], both[1])
        return (
            F.when(key == "oo", F.lit("021D"))
            .when(key == "ii", F.lit("021U"))
            .when(key == "io", F.lit("021C"))
            .when(key == "im", F.lit("111D"))
            .when(key == "mo", F.lit("111U"))
            .otherwise(F.lit("201"))
        )

    closed_pairs = None
    for t1, t2 in pairs_at:
        part = tri.groupBy(bucket(t1, t2).alias("clazz")).agg(
            F.count(F.lit(1)).alias("n")
        )
        closed_pairs = part if closed_pairs is None else closed_pairs.unionAll(part)

    # ---- 012 / 102 via dyad complement counting ----------------------
    common = (
        tri.select(F.col("n1").alias("lo"), F.col("n2").alias("hi"))
        .unionAll(tri.select(F.col("n1").alias("lo"), F.col("n3").alias("hi")))
        .unionAll(tri.select(F.col("n2").alias("lo"), F.col("n3").alias("hi")))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    dy_full = (
        dyads.join(common, ["lo", "hi"], "left")
        .join(
            deg.select(F.col("v").alias("lo"), F.col("du").alias("du_lo")),
            "lo",
        )
        .join(
            deg.select(F.col("v").alias("hi"), F.col("du").alias("du_hi")),
            "hi",
        )
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "lonely",
            F.col("n_nodes")
            - F.lit(2)
            - (
                F.col("du_lo") + F.col("du_hi") - F.lit(2)
                - F.coalesce(F.col("common"), F.lit(0))
            ),
        )
    )
    disc = dy_full.groupBy(
        F.when(F.col("mut") == 1, F.lit("102")).otherwise(F.lit("012")).alias(
            "clazz"
        )
    ).agg(F.sum("lonely").alias("n"))

    # ---- assemble: seed zeros, positive parts, subtractions, 003 ----
    seed = spark.createDataFrame([(c, 0) for c in CLASSES], "clazz string, n long")
    center_rows = None
    for c in ["021D", "021U", "021C", "111D", "111U", "201"]:
        row = center_pairs.select(
            F.lit(c).alias("clazz"), F.col(f"`{c}`").cast("long").alias("n")
        )
        center_rows = row if center_rows is None else center_rows.unionAll(row)
    neg_closed_pairs = closed_pairs.select(
        "clazz", (-F.col("n")).cast("long").alias("n")
    )
    total3 = n_df.select(
        F.lit("003").alias("clazz"),
        F.expr(
            "CAST(n_nodes AS BIGINT) * (n_nodes - 1) * (n_nodes - 2) div 6"
        ).alias("n"),
    )
    positives = (
        center_rows.unionAll(neg_closed_pairs)
        .unionAll(closed.select("clazz", F.col("n").cast("long")))
        .unionAll(disc.select("clazz", F.col("n").cast("long")))
    )
    # 003 = C(n,3) - everything else: append each non-003 unit negated
    # under clazz '003' so one groupBy closes the complement in-plan
    neg_for_003 = positives.select(F.lit("003").alias("clazz"), -F.col("n"))
    return (
        seed.unionAll(positives)
        .unionAll(total3)
        .unionAll(neg_for_003)
        .groupBy("clazz")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def graph_summary(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row exact structural scorecard of the directed simple graph:

    (n_nodes, n_self_loops, n_arcs, n_dyads, n_mutual, n_asym,
     n_wedges, n_triangles, reciprocity_e6, density_e6,
     transitivity_e6)

    The whole-graph companion to :func:`triad_census` — the three
    classic scalars every KG-construction run should log per build:

    - ``reciprocity_e6``: fraction of arcs whose reverse arc also
      exists (Garlaschelli-Loffredo arc reciprocity, 2*mutual/arcs) —
      inverse-predicate extraction shows up as reciprocity inflation;
    - ``density_e6``: arcs / n(n-1);
    - ``transitivity_e6``: global clustering 3*triangles/wedges with
      ``n_wedges = sum over nodes of C(d_undirected, 2)`` — computed
      arithmetically from degrees, never by listing open wedges.

    Ratios are exact floor-integer micro units (integer DIV — the
    repo-wide discipline, reproducible bit-exact in any SQL engine);
    a zero denominator yields NULL. Counts are over the DISTINCT
    non-reflexive arc set; ``n_self_loops`` reports the distinct
    reflexive arcs dropped.

    100 TB shape: dyads and degrees are map-side-combinable aggs; the
    only superlinear stage is the skew-bounded oriented triangle
    listing (delegated to :func:`.graph.triangle_count`); the global
    reduces collapse per-partition partials (bounded at #partitions
    rows) and the scalars assemble via single-row crossJoin — no
    driver collect.
    """
    from .graph import triangle_count

    raw = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    loops = (
        raw.filter(F.col("s") == F.col("d"))
        .dropDuplicates()
        .agg(F.count(F.lit(1)).alias("n_self_loops"))
    )
    arcs = raw.filter(F.col("s") != F.col("d")).dropDuplicates().localCheckpoint()
    dyads = (
        arcs.select(
            F.least("s", "d").alias("lo"),
            F.greatest("s", "d").alias("hi"),
            (F.col("s") < F.col("d")).cast("int").alias("fwd"),
            (F.col("s") > F.col("d")).cast("int").alias("rev"),
        )
        .groupBy("lo", "hi")
        .agg(F.max("fwd").alias("fwd"), F.max("rev").alias("rev"))
    )
    dy_agg = dyads.agg(
        F.count(F.lit(1)).alias("n_dyads"),
        F.coalesce(
            F.sum(((F.col("fwd") + F.col("rev")) == 2).cast("long")), F.lit(0)
        ).alias("n_mutual"),
        F.coalesce(F.sum(F.col("fwd") + F.col("rev")), F.lit(0))
        .cast("long")
        .alias("n_arcs"),
    )
    node_agg = (
        dyads.select(F.col("lo").alias("v"))
        .unionAll(dyads.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("du"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.coalesce(F.sum(_c2(F.col("du"))), F.lit(0))
            .cast("long")
            .alias("n_wedges"),
        )
    )
    tri = triangle_count(arcs, "s", "d").select("n_triangles")
    return (
        dy_agg.crossJoin(node_agg)
        .crossJoin(tri)
        .crossJoin(loops)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_self_loops").cast("long").alias("n_self_loops"),
            "n_arcs",
            F.col("n_dyads").cast("long").alias("n_dyads"),
            F.col("n_mutual").cast("long").alias("n_mutual"),
            (F.col("n_dyads") - F.col("n_mutual"))
            .cast("long")
            .alias("n_asym"),
            "n_wedges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.expr(
                "CASE WHEN n_arcs > 0 THEN"
                " (2000000 * CAST(n_mutual AS BIGINT)) DIV n_arcs END"
            ).alias("reciprocity_e6"),
            F.expr(
                "CASE WHEN n_nodes > 1 THEN (1000000 * n_arcs)"
                " DIV (CAST(n_nodes AS BIGINT) * (n_nodes - 1)) END"
            ).alias("density_e6"),
            F.expr(
                "CASE WHEN n_wedges > 0 THEN"
                " (3000000 * CAST(n_triangles AS BIGINT)) DIV n_wedges END"
            ).alias("transitivity_e6"),
        )
    )


QUAD_CLASSES = [
    "empty", "one_edge", "two_matching", "two_wedge",
    "three_triangle", "three_path", "three_star",
    "four_cycle", "four_tailed", "five_diamond", "six_clique",
]


def quad_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: "DataFrame | None" = None,
) -> DataFrame:
    """Exact induced 11-class QUAD census of the UNDIRECTED simple
    graph underlying ``edges`` — the 4-node companion of
    :func:`triad_census` and the graphlet signature of the graphlet/
    GDV literature (Przulj 2007): every 4-subset of the node universe
    classified by its induced subgraph up to isomorphism.

    Classes (edge count, then shape): ``empty`` (0), ``one_edge``
    (1), ``two_matching`` / ``two_wedge`` (2), ``three_triangle`` /
    ``three_path`` / ``three_star`` (3), ``four_cycle`` /
    ``four_tailed`` (paw, 4), ``five_diamond`` (5), ``six_clique``
    (6). Over an extracted KG the connected tail is the structural QA
    profile one order above the triad census: entity-merge
    over-canonicalization inflates ``six_clique``/``five_diamond``
    mass, hub-spoke extraction shows as ``three_star`` dominance, and
    chain-of-mention transcripts as ``three_path``.

    Algorithm — the subgraph-to-induced inversion of ESCAPE (Pinar,
    Seshadhri & Vishal, WWW 2017) / the quad-census arithmetic of
    Ortmann & Brandes (Network Science 2017): enumeration only for
    TRIANGLES (degree-ordered compact-forward listing, the
    :func:`triad_census` scheme); every other non-induced count is an
    aggregate —

    - ``N_claw  = sum_v C(d_v, 3)``; wedge mass ``W = sum_v C(d_v,2)``
    - ``N_p4    = sum_(u,v) in E (d_u-1)(d_v-1) - 3T``
    - ``N_paw   = sum_v t_v (d_v - 2)`` (t_v = triangles at v)
    - ``N_dia   = sum_e C(t_e, 2)`` (t_e = triangles on edge e)
    - ``N_c4    = (sum_{p<q} C(codeg(p,q), 2)) / 2`` (each 4-cycle
      once per diagonal pair)
    - ``N_k4``: per-edge apex pairs (the N_dia candidate set)
      semi-joined against the edge set, divided by 6 —

    then the upper-triangular containment matrix (computed by hand,
    pinned by the brute-force test oracle) converts non-induced to
    induced top-down from ``six_clique``; the disconnected classes
    close by complement against C(n,2), C(n,3)-style totals and
    C(n,4).

    100 TB shape: every stage is a map-side-combinable aggregate
    except (a) the triangle listing — skew-bounded O(m^1.5) by
    orientation — and (b) the CODEGREE wedge join behind ``N_c4``,
    which is Theta(W = sum C(d,2)): that wedge mass is the price of
    exact 4-cycle counting (ESCAPE pays the same), and unlike
    triangles it cannot be oriented away because a hub's 4-cycle
    incidence is real output mass, not enumeration waste. At extreme
    hub skew, census a degree-capped or quality-filtered subgraph
    upstream — the operator stays exact for whatever graph it is
    given. Scalars assemble via single-row crossJoins (no driver
    collect); all arithmetic is exact integers, widened through
    DECIMAL(38,0) where triple products can outgrow BIGINT.

    ``nodes``: optional single-column universe frame (defaults to the
    edge endpoint set; extra isolated nodes feed only the
    disconnected classes). Returns (clazz, n) with explicit zeros,
    ``n`` DECIMAL(38,0) — NOT BIGINT: the disconnected classes are
    C(n,4)-sized (already 1.07e21 at 400k nodes, measured in
    bench_scaling_quads.py), so int64 output would overflow on any
    real corpus while every connected-class count still compares
    bit-exactly as an integer-valued decimal.
    """
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    node_col = nodes.columns[0] if nodes is not None else None
    universe = (
        nodes.select(F.col(node_col).alias("v")).dropDuplicates()
        if nodes is not None
        else und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .dropDuplicates()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )

    dec = "DECIMAL(38,0)"
    n_df = universe.agg(F.count(F.lit(1)).cast(dec).alias("n"))
    m_df = und.agg(F.count(F.lit(1)).cast(dec).alias("m"))
    deg_aggs = deg.agg(
        F.coalesce(
            F.sum(F.expr(f"CAST(d AS {dec}) * (d - 1) / 2")), F.lit(0)
        ).cast(dec).alias("w_wedges"),
        F.coalesce(
            F.sum(F.expr(f"CAST(d AS {dec}) * (d - 1) * (d - 2) / 6")),
            F.lit(0),
        ).cast(dec).alias("n_claw"),
    )

    # ---- triangle listing (compact-forward, one row per triangle) ---
    da, db = deg.alias("da"), deg.alias("db")
    with_deg = (
        und.join(da, F.col("a") == F.col("da.v"))
        .join(db, F.col("b") == F.col("db.v"))
        .select(
            "a", "b", F.col("da.d").alias("d_a"), F.col("db.d").alias("d_b")
        )
    )
    lower_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(lower_first, F.col("d_b")).otherwise(F.col("d_a")).alias("d_w"),
    ).localCheckpoint()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    order_lt = (F.col("e1.d_w") < F.col("e2.d_w")) | (
        (F.col("e1.d_w") == F.col("e2.d_w")) & (F.col("e1.w") < F.col("e2.w"))
    )
    tri = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & order_lt)
        .select(
            F.col("e1.u").alias("apex"),
            F.col("e1.w").alias("x"),
            F.col("e2.w").alias("y"),
        )
        .join(
            oriented.select(F.col("u").alias("x"), F.col("w").alias("y")),
            ["x", "y"],
            "left_semi",
        )
        .select(F.array_sort(F.array("apex", "x", "y")).alias("t"))
        .select(
            F.col("t")[0].alias("n1"),
            F.col("t")[1].alias("n2"),
            F.col("t")[2].alias("n3"),
        )
        .localCheckpoint()
    )
    t_df = tri.agg(F.count(F.lit(1)).cast(dec).alias("t"))
    t_v = (
        tri.select(F.col("n1").alias("v"))
        .unionAll(tri.select(F.col("n2").alias("v")))
        .unionAll(tri.select(F.col("n3").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("tv"))
    )
    paw_df = (
        t_v.join(deg, "v")
        .agg(
            F.coalesce(
                F.sum(F.expr(f"CAST(tv AS {dec}) * (d - 2)")), F.lit(0)
            ).cast(dec).alias("n_paw")
        )
    )
    t_e = (
        tri.select(F.col("n1").alias("a"), F.col("n2").alias("b"))
        .unionAll(tri.select(F.col("n1").alias("a"), F.col("n3").alias("b")))
        .unionAll(tri.select(F.col("n2").alias("a"), F.col("n3").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("te"))
        .localCheckpoint()
    )
    dia_df = t_e.agg(
        F.coalesce(
            F.sum(F.expr(f"CAST(te AS {dec}) * (te - 1) / 2")), F.lit(0)
        ).cast(dec).alias("n_dia")
    )
    # P4 raw term: sum over edges of (d_u - 1)(d_v - 1); 3T subtracted
    # in the inversion row below
    p4_df = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("d_a")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("d_b")), "b")
        .agg(
            F.coalesce(
                F.sum(F.expr(f"CAST(d_a - 1 AS {dec}) * (d_b - 1)")), F.lit(0)
            ).cast(dec).alias("p4_raw")
        )
    )
    # ---- codegrees (the Theta(W) wedge join) -> non-induced C4 ------
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    wa, wb = adj.alias("wa"), adj.alias("wb")
    cod = (
        wa.join(
            wb,
            (F.col("wa.v") == F.col("wb.v"))
            & (F.col("wa.w") < F.col("wb.w")),
        )
        .groupBy(F.col("wa.w").alias("p"), F.col("wb.w").alias("q"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c4_df = cod.agg(
        F.coalesce(
            F.sum(F.expr(f"CAST(c AS {dec}) * (c - 1) / 2")), F.lit(0)
        ).cast(dec).alias("c4_double")
    )
    # ---- K4: per-edge apex pairs (the N_dia candidate mass) ---------
    edge_apex = (
        tri.select(F.col("n1").alias("a"), F.col("n2").alias("b"),
                   F.col("n3").alias("apex"))
        .unionAll(tri.select("n1", F.col("n3").alias("b"),
                             F.col("n2").alias("apex")))
        .unionAll(tri.select(F.col("n2").alias("a"), "n3",
                             F.col("n1").alias("apex")))
    )
    ea1, ea2 = edge_apex.alias("ea1"), edge_apex.alias("ea2")
    k4_df = (
        ea1.join(
            ea2,
            (F.col("ea1.a") == F.col("ea2.a"))
            & (F.col("ea1.b") == F.col("ea2.b"))
            & (F.col("ea1.apex") < F.col("ea2.apex")),
        )
        .select(
            F.col("ea1.apex").alias("a"), F.col("ea2.apex").alias("b")
        )
        .join(und, ["a", "b"], "left_semi")
        .agg(F.expr(f"CAST(count(1) AS {dec}) / 6").cast(dec).alias("n_k4"))
    )

    scalars = (
        n_df.crossJoin(m_df)
        .crossJoin(deg_aggs)
        .crossJoin(t_df)
        .crossJoin(paw_df)
        .crossJoin(dia_df)
        .crossJoin(p4_df)
        .crossJoin(c4_df)
        .crossJoin(k4_df)
    )
    # ---- non-induced -> induced inversion (containment matrix) ------
    inv = scalars.selectExpr(
        "n", "m", "w_wedges", "n_claw", "t", "n_paw", "n_dia",
        "p4_raw", "n_k4",
        f"CAST(c4_double / 2 AS {dec}) AS n_c4",
    ).selectExpr(
        "*",
        "n_k4 AS i_k4",
        f"CAST(n_dia - 6 * n_k4 AS {dec}) AS i_dia",
    ).selectExpr(
        "*",
        f"CAST(n_paw - 4 * i_dia - 12 * i_k4 AS {dec}) AS i_paw",
        f"CAST(n_c4 - i_dia - 3 * i_k4 AS {dec}) AS i_c4",
    ).selectExpr(
        "*",
        f"CAST(t * (n - 3) - 2 * i_dia - i_paw - 4 * i_k4 AS {dec})"
        " AS i_t3",
        f"CAST(p4_raw - 3 * t - 6 * i_dia - 2 * i_paw - 4 * i_c4"
        f" - 12 * i_k4 AS {dec}) AS i_p4",
        f"CAST(n_claw - 2 * i_dia - i_paw - 4 * i_k4 AS {dec}) AS i_s3",
    ).selectExpr(
        "*",
        f"CAST(w_wedges * (n - 3) - 3 * i_s3 - 2 * i_p4 - 3 * i_t3"
        f" - 4 * i_c4 - 5 * i_paw - 8 * i_dia - 12 * i_k4 AS {dec})"
        " AS i_w2",
        f"CAST(m * (m - 1) / 2 - w_wedges - i_p4 - 2 * i_c4 - i_paw"
        f" - 2 * i_dia - 3 * i_k4 AS {dec}) AS i_m2",
    ).selectExpr(
        "*",
        f"CAST(m * (n - 2) * (n - 3) / 2 - 2 * i_m2 - 2 * i_w2"
        f" - 3 * (i_s3 + i_p4 + i_t3) - 4 * (i_c4 + i_paw)"
        f" - 5 * i_dia - 6 * i_k4 AS {dec}) AS i_e1",
    ).selectExpr(
        "*",
        f"CAST(n * (n - 1) * (n - 2) * (n - 3) / 24 - i_e1 - i_m2"
        f" - i_w2 - i_s3 - i_p4 - i_t3 - i_c4 - i_paw - i_dia - i_k4"
        f" AS {dec}) AS i_e0",
    ).localCheckpoint()

    out_cols = [
        ("empty", "i_e0"), ("one_edge", "i_e1"),
        ("two_matching", "i_m2"), ("two_wedge", "i_w2"),
        ("three_triangle", "i_t3"), ("three_path", "i_p4"),
        ("three_star", "i_s3"), ("four_cycle", "i_c4"),
        ("four_tailed", "i_paw"), ("five_diamond", "i_dia"),
        ("six_clique", "i_k4"),
    ]
    rows = None
    for clazz, col in out_cols:
        row = inv.select(F.lit(clazz).alias("clazz"), F.col(col).alias("n"))
        rows = row if rows is None else rows.unionAll(row)
    return rows
