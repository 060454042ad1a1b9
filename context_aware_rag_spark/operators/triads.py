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
