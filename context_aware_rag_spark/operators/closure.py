"""Temporal triadic closure over the timestamped co-assertion graph.

The classic KG-evolution question: when two facts put entities a-b and
b-c on the graph, how long until a fact linking a-c arrives? Each
conversation stream keeps asserting facts (facts.fact_assertions gives
the distinct timed assertion set); the co-assertion graph's *triadic
closure events* — open wedge a-b-c turning into a triangle — are the
growth signal a KG-construction pipeline monitors: a rising closure
rate means extraction is densifying real neighborhoods, a flood of
zero-delay closures means single chunks are emitting cliques, and
per-entity brokerage identifies the entities through which the graph
grows. (Reference parity anchor: the reference maintains the same
entity graph incrementally via its GraphDB edge upserts,
src/vss_ctx_rag/tools/storage/neo4j_db.py-style add_edge paths; it
never derives closure analytics — this operator is the analytics layer
a consumer would bolt on.)

The enumeration insight that makes this scale: a wedge that CLOSES is
exactly a triangle of the final graph, and within a triangle the
closure event is determined by edge arrival times — the LAST edge
closes the wedge formed by the other two, whose common endpoint is the
broker. So closure detection needs only the skew-bounded
compact-forward triangle listing (graph.triangle_count's orientation:
each node's oriented out-degree is O(sqrt(m)) regardless of hub skew —
no task ever materializes a hot entity's deg^2 open wedges), and the
STILL-OPEN wedge census is pure node-local arithmetic
(C(deg, 2) - triangles_at_node), never an enumeration.

Determinism: closure needs a total order on edges; ties in first-
assertion time are broken by the edge's sorted endpoint pair, i.e. the
comparison key is the struct (t_s, lo, hi) — lexicographic, exact, and
reproducible in any SQL engine as a tuple comparison. Delays are
integer seconds; a wedge and its closer asserted at the same instant
(one chunk emitting a clique) closes with delay 0.

100 TB shape: dyad first-times is ONE map-side-combinable agg keyed by
the sorted pair; the triangle wedge join is the only superlinear stage
and is orientation-bounded as above; the census is node-keyed aggs
joined on the same key. No driver collect, no SinglePartition — the
scalar-free plan is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coassertion_edge_times(
    assertions: DataFrame,
    src: str = "subj_name",
    dst: str = "obj_name",
    ts: str = "ts_s",
) -> DataFrame:
    """(lo, hi, t_s): first-assertion time per undirected entity dyad.

    Input is any timed edge stream (facts.fact_assertions by default:
    subj_name, pred, obj_name, ts_s). Direction and predicate collapse
    — the co-assertion graph is about which entities the KG links at
    all; self-loops drop (a wedge needs three distinct nodes). One
    hash-agg shuffle keyed by the sorted pair.
    """
    return (
        assertions.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.col(ts).cast("long").alias("t"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .groupBy("lo", "hi")
        .agg(F.min("t").alias("t_s"))
    )


def _timed_triangles(edge_times: DataFrame) -> DataFrame:
    """(n1, n2, n3, t12, t13, t23) — each triangle of the undirected
    graph exactly once, id-sorted (n1 < n2 < n3), with the three edge
    first-times. Compact-forward orientation (Suri & Vassilvitskii WWW
    2011; same scheme as graph.triangle_count:547) so the wedge join is
    O(m^1.5) regardless of degree skew."""
    und = edge_times.select("lo", "hi", "t_s").localCheckpoint()
    deg = (
        und.select(F.col("lo").alias("n"))
        .unionAll(und.select(F.col("hi").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    with_deg = (
        und.join(da, F.col("lo") == F.col("da.n"))
        .join(db, F.col("hi") == F.col("db.n"))
        .select(
            "lo", "hi", "t_s",
            F.col("da.d").alias("d_lo"), F.col("db.d").alias("d_hi"),
        )
    )
    lower_first = (F.col("d_lo") < F.col("d_hi")) | (
        (F.col("d_lo") == F.col("d_hi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lower_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lower_first, F.col("d_hi")).otherwise(F.col("d_lo")).alias(
            "d_v"
        ),
        F.col("t_s").alias("t"),
    ).localCheckpoint()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    order_lt = (F.col("e1.d_v") < F.col("e2.d_v")) | (
        (F.col("e1.d_v") == F.col("e2.d_v")) & (F.col("e1.v") < F.col("e2.v"))
    )
    wedges = e1.join(
        e2, (F.col("e1.u") == F.col("e2.u")) & order_lt
    ).select(
        F.col("e1.u").alias("apex"),
        F.col("e1.v").alias("x"),
        F.col("e1.t").alias("t_ax"),
        F.col("e2.v").alias("y"),
        F.col("e2.t").alias("t_ay"),
    )
    # the closing edge's endpoints are id-unsorted in orientation
    # order; join on the sorted pair so either orientation matches
    closer = und.select(
        F.col("lo").alias("cx"), F.col("hi").alias("cy"),
        F.col("t_s").alias("t_xy"),
    )
    tri = wedges.join(
        closer,
        (F.least("x", "y") == F.col("cx"))
        & (F.greatest("x", "y") == F.col("cy")),
    )
    # canonicalize: sort the three edges by their sorted endpoint
    # pairs — for corners n1 < n2 < n3 the pairs order (n1,n2) <
    # (n1,n3) < (n2,n3) lexicographically, so after the sort the
    # corners and all three times read off positionally (no string
    # keys, no map: entity names stay opaque)
    es = F.array_sort(
        F.array(
            F.struct(
                F.least("apex", "x").alias("lo"),
                F.greatest("apex", "x").alias("hi"),
                F.col("t_ax").alias("t"),
            ),
            F.struct(
                F.least("apex", "y").alias("lo"),
                F.greatest("apex", "y").alias("hi"),
                F.col("t_ay").alias("t"),
            ),
            F.struct(
                F.col("cx").alias("lo"),
                F.col("cy").alias("hi"),
                F.col("t_xy").alias("t"),
            ),
        )
    )
    return tri.select(
        es[0]["lo"].alias("n1"),
        es[0]["hi"].alias("n2"),
        es[2]["hi"].alias("n3"),
        es[0]["t"].alias("t12"),
        es[1]["t"].alias("t13"),
        es[2]["t"].alias("t23"),
    )


def closure_events(edge_times: DataFrame) -> DataFrame:
    """One row per triangle of the co-assertion graph = one triadic
    closure event:

    (node_a, broker, node_c, t_open_s, t_close_s, delay_s)

    where (node_a, node_c) is the triangle's LAST-arriving edge (total
    order: (t_s, lo, hi) lexicographic, so time ties break on the
    sorted endpoint pair), ``broker`` the wedge center the closing
    edge bypassed, ``t_open_s`` the instant the wedge completed (max
    of the two earlier edge times), ``delay_s = t_close_s - t_open_s``
    (>= 0 by construction; 0 when a single chunk asserts a clique).
    ``node_a < node_c`` canonically.
    """
    tri = _timed_triangles(edge_times)
    # edge comparison keys: struct (t, lo, hi) — Spark orders structs
    # lexicographically, matching SQL tuple comparison in the twin
    k12 = F.struct(F.col("t12").alias("t"), F.col("n1").alias("lo"),
                   F.col("n2").alias("hi"))
    k13 = F.struct(F.col("t13").alias("t"), F.col("n1").alias("lo"),
                   F.col("n3").alias("hi"))
    k23 = F.struct(F.col("t23").alias("t"), F.col("n2").alias("lo"),
                   F.col("n3").alias("hi"))
    is12 = (k12 > k13) & (k12 > k23)
    is13 = (k13 > k12) & (k13 > k23)
    return tri.select(
        F.when(is12, F.col("n1"))
        .when(is13, F.col("n1"))
        .otherwise(F.col("n2"))
        .alias("node_a"),
        F.when(is12, F.col("n3"))
        .when(is13, F.col("n2"))
        .otherwise(F.col("n1"))
        .alias("broker"),
        F.when(is12, F.col("n2"))
        .when(is13, F.col("n3"))
        .otherwise(F.col("n3"))
        .alias("node_c"),
        F.when(is12, F.greatest("t13", "t23"))
        .when(is13, F.greatest("t12", "t23"))
        .otherwise(F.greatest("t12", "t13"))
        .alias("t_open_s"),
        F.when(is12, F.col("t12"))
        .when(is13, F.col("t13"))
        .otherwise(F.col("t23"))
        .alias("t_close_s"),
    ).withColumn("delay_s", F.col("t_close_s") - F.col("t_open_s"))


def closure_census(edge_times: DataFrame) -> DataFrame:
    """Per-entity triadic-closure scorecard, all exact integers:

    (node, degree, n_wedges, n_closed, n_open, n_brokered)

    ``n_wedges = C(degree, 2)`` — wedges centered at the node;
    ``n_closed`` — those that closed (= triangles containing the node,
    counted at every corner, NOT just as broker); ``n_open`` — still
    waiting; ``n_brokered`` — closure events where this node was the
    broker (each event has exactly one). The open count is node-local
    arithmetic — open wedges at a hub are NEVER enumerated.
    """
    deg = (
        edge_times.select(F.col("lo").alias("node"))
        .unionAll(edge_times.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ev = closure_events(edge_times).localCheckpoint()
    tri_at = (
        ev.select(F.col("node_a").alias("node"))
        .unionAll(ev.select(F.col("broker").alias("node")))
        .unionAll(ev.select(F.col("node_c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_closed"))
    )
    brokered = ev.groupBy(F.col("broker").alias("node")).agg(
        F.count(F.lit(1)).alias("n_brokered")
    )
    d = F.col("degree")
    return (
        deg.join(tri_at, "node", "left")
        .join(brokered, "node", "left")
        .select(
            "node",
            "degree",
            F.shiftright((d * (d - F.lit(1))).cast("long"), 1).alias(
                "n_wedges"
            ),
            F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
            (
                F.shiftright((d * (d - F.lit(1))).cast("long"), 1)
                - F.coalesce("n_closed", F.lit(0))
            ).alias("n_open"),
            F.coalesce("n_brokered", F.lit(0)).alias("n_brokered"),
        )
    )


def closure_rate_series(
    edge_times: DataFrame, bucket_s: int = 86400
) -> DataFrame:
    """Graph-growth monitor: per time bucket, edges formed vs wedges
    closed.

    (bucket_s, n_new_edges, n_closures, n_zero_delay, sum_delay_s,
     cum_closures)

    ``bucket_s`` is the bucket start (epoch seconds floored to the
    bucket width; timestamps are assumed non-negative). A bucket
    appears if it saw a first-assertion edge OR a closure; absent
    counts are explicit zeros. ``n_zero_delay`` isolates same-instant
    clique emissions (one chunk asserting a triangle), the
    extraction-artifact signal; ``cum_closures`` is the running total
    — a flattening curve means the graph stopped densifying.

    100 TB shape: two bucket-keyed map-side-combinable aggs over the
    closure-event and dyad streams + a full-outer merge on the bucket
    key. The cumulative sum is a global window over BUCKET rows —
    bounded by timespan/bucket_s (thousands, not corpus-sized), the
    audited bounded-input exemption (dsir/sketches pattern).
    """
    from pyspark.sql import Window

    if bucket_s < 1:
        raise ValueError(f"need bucket_s >= 1, got {bucket_s}")
    eb = (
        edge_times.groupBy(
            F.expr(f"(t_s DIV {bucket_s}) * {bucket_s}").alias("bucket_s")
        )
        .agg(F.count(F.lit(1)).alias("n_new_edges"))
    )
    ev = closure_events(edge_times)
    cb = (
        ev.groupBy(
            F.expr(f"(t_close_s DIV {bucket_s}) * {bucket_s}").alias(
                "bucket_s"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_closures"),
            F.sum((F.col("delay_s") == 0).cast("long")).alias("n_zero_delay"),
            F.sum("delay_s").alias("sum_delay_s"),
        )
    )
    ser = (
        eb.join(cb, "bucket_s", "full_outer")
        .select(
            "bucket_s",
            F.coalesce("n_new_edges", F.lit(0)).alias("n_new_edges"),
            F.coalesce("n_closures", F.lit(0)).alias("n_closures"),
            F.coalesce("n_zero_delay", F.lit(0)).alias("n_zero_delay"),
            F.coalesce("sum_delay_s", F.lit(0)).alias("sum_delay_s"),
        )
    )
    w = Window.orderBy("bucket_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ser.withColumn("cum_closures", F.sum("n_closures").over(w))
