"""Graph analytics over the materialized knowledge graph.

The reference persists its graph into Neo4j/Arango and leans on the
database for any graph-wide computation (the NetworkX plugin,
packages/vss_ctx_rag_arango/.../networkx_db.py, holds the graph in
memory). Here the graph IS a pair of DataFrames, so corpus-wide
analytics run distributed: per-node degree profiles and a fixed-
iteration PageRank — the standard entity-salience signal for ranking
KG nodes (hot-entity detection feeds the skew-salting story: the top
of the PageRank/degree distribution is exactly the key set that needs
salted joins at 100 TB).

Determinism discipline: PageRank runs in integer MICRO-units with
floor division (``div``) everywhere — no float accumulates across
partitions, so any partitioning yields bit-identical ranks and the
pure-Python oracle (oracle/precompute.pagerank_py) reproduces them
exactly.

100 TB shape: each iteration is one equi-join of the rank vector with
the edge list on src (AQE handles hub skew; hot entities are the skew
case by construction) + one map-side-combined groupBy(dst) sum; the
dangling-mass term is a 1-row broadcast, never a driver action.
``localCheckpoint`` per iteration keeps lineage flat (the same
discipline as the canonicalization fixpoint). Degree stats are two
map-side-combined aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst", deduped: bool = False
) -> DataFrame:
    """Per-node degree profile over the DISTINCT directed pair set:
    (node_id, out_deg, in_deg). Nodes appearing only as source (or only
    as destination) report 0 for the missing side.

    ``deduped=True`` declares the input is ALREADY a distinct (src,
    dst) pair set (e.g. the frame a sibling :func:`pagerank` call
    materialized) and skips the dedup shuffle — the caller's contract,
    not checked."""
    pairs = edges.select(src, dst)
    if not deduped:
        pairs = pairs.dropDuplicates()
    out_deg = pairs.groupBy(F.col(src).alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_deg = pairs.groupBy(F.col(dst).alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    nodes = (
        pairs.select(F.col(src).alias("node_id"))
        .union(pairs.select(F.col(dst).alias("node_id")))
        .distinct()
    )
    return (
        nodes.join(out_deg, "node_id", "left")
        .join(in_deg, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def _driver_pagerank(
    edges: DataFrame,
    rows,
    src: str,
    dst: str,
    iterations: int,
    damping_pct: int,
) -> "DataFrame | None":
    """Exact Python replica of the distributed integer PageRank below
    (same dedup, same floor-division recurrence over nonnegative longs,
    same dangling/teleport terms, same empty-graph result), returning a
    local relation. Returns None on a NULL endpoint (the distributed
    null-join semantics are not worth replicating)."""
    pairs = set()
    for r in rows:
        a, b = r[0], r[1]
        if a is None or b is None:
            return None
        pairs.add((a, b))
    out_deg: dict = {}
    nodes = set()
    for a, b in pairs:
        out_deg[a] = out_deg.get(a, 0) + 1
        nodes.add(a)
        nodes.add(b)
    from pyspark.sql import types as T

    ntype = edges.schema[src].dataType
    schema = T.StructType(
        [
            T.StructField("node_id", ntype),
            T.StructField("rank_micro", T.LongType()),
        ]
    )
    n = len(nodes)
    if n == 0:
        return edges.sparkSession.createDataFrame([], schema)
    teleport = ((100 - damping_pct) * MICRO) // 100
    r = {v: MICRO for v in nodes}
    for _ in range(iterations):
        inbound = {}
        for a, b in pairs:
            inbound[b] = inbound.get(b, 0) + r[a] // out_deg[a]
        dang = sum(r[v] for v in nodes if v not in out_deg)
        r = {
            v: teleport
            + (damping_pct * (inbound.get(v, 0) + dang // n)) // 100
            for v in nodes
        }
    out = sorted(r.items())
    return edges.sparkSession.createDataFrame(out, schema)


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    deduped: bool = False,
    small_graph_cap: int | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank: (node_id, rank_micro).

    Exact recurrence (both engines, all integer / floor division):

        share(u)   = r(u) div out(u)                  [u with out > 0]
        inbound(v) = sum of share(u) over edges u->v
        dang       = sum of r(u) over u with out = 0
        r'(v)      = teleport + (damping_pct * (inbound(v) + dang div N)) div 100

    with ``teleport = ((100 - damping_pct) * 1e6) div 100`` and initial
    rank 1e6 per node. Floor division leaks a few micro-units of mass
    per iteration — the standard price of exact integer PageRank; ranks
    are an ORDERING signal, not probabilities, and the leak is ~N nano
    units, far below any rank gap it could reorder.

    ``iterations`` is fixed (default 10), not convergence-tested: the
    iteration count must be part of the operator's identity for
    cross-engine reproducibility.
    """
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"need 0 < damping_pct < 100, got {damping_pct}")
    # small-graph election (r6): same bounded limit-probe + exact driver
    # replica + distributed fallback pattern as label_propagation above
    if small_graph_cap:
        head = edges.select(src, dst).limit(small_graph_cap + 1).collect()
        if len(head) <= small_graph_cap:
            local = _driver_pagerank(
                edges, head, src, dst, iterations, damping_pct
            )
            if local is not None:
                return local
    pairs = _pin_pairs(edges, src, dst, deduped)
    state = _pagerank_state(pairs, src, dst)
    n = state.count()
    if n == 0:
        pairs.unpersist()
        return state.select("node_id", F.lit(0).cast("long").alias("rank_micro"))
    teleport = ((100 - damping_pct) * MICRO) // 100
    # per iteration exactly ONE edge-sized exchange — the (dst, share)
    # combine feeding groupBy(dst); the pairs⋈shares join reuses pairs'
    # pinned src partitioning (shares, node-sized, shuffles to match).
    # The edge list itself never moves again.
    # intermediate rounds use LAZY localCheckpoint: the plan is
    # truncated (and the round's RDD cached) without paying a job per
    # round — the final round is eager, so the whole chain materializes
    # in ONE job and the pairs cache can be released right after
    # (fixed iteration count needs no per-round convergence probe)
    for i in range(iterations):
        state = _pagerank_step(
            state, pairs, src, dst, n, teleport, damping_pct
        ).localCheckpoint(eager=(i == iterations - 1))
    pairs.unpersist()
    return state.select("node_id", F.col("r").alias("rank_micro"))


def _pin_pairs(
    edges: DataFrame, src: str, dst: str, deduped: bool
) -> DataFrame:
    """Distinct (src, dst) pairs, pre-partitioned by src ONCE and
    pinned, so every iteration's contribution join reuses this
    partitioning — the edge list (the 100 TB side) never re-shuffles.

    persist(), NOT localCheckpoint(): under AQE a checkpoint captures
    UnknownPartitioning and the pin is silently lost, while a cached
    plan keeps its output partitioning
    (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning defaults
    false). Plan-asserted in tests/test_plans.py. ``deduped=True``
    declares the input already distinct (shared with degree_stats) and
    skips the dedup shuffle."""
    base = edges.select(src, dst)
    if not deduped:
        base = base.dropDuplicates()
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return base.repartition(p, F.col(src)).persist()


def _pagerank_state(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Initial rank state (node_id, out_deg, r=MICRO). out_deg is
    STATIC: folded into the state once so the per-iteration share
    computation is a narrow map, never a join (dangling nodes carry
    NULL out_deg — the dangling term becomes a filter-agg)."""
    p = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out_deg = pairs.groupBy(F.col(src).alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    nodes = (
        pairs.select(F.col(src).alias("node_id"))
        .union(pairs.select(F.col(dst).alias("node_id")))
        .distinct()
    )
    return (
        nodes.join(out_deg, "node_id", "left")
        .repartition(p, F.col("node_id"))
        .select("node_id", "out_deg", F.lit(MICRO).cast("long").alias("r"))
        .localCheckpoint()
    )


def _pagerank_step(
    state: DataFrame,
    pairs: DataFrame,
    src: str,
    dst: str,
    n: int,
    teleport: int,
    damping_pct: int,
) -> DataFrame:
    """One un-checkpointed PageRank iteration over the folded state —
    factored out so the plan shape (single wide exchange) is testable."""
    shares = state.filter(F.col("out_deg").isNotNull()).select(
        "node_id", F.expr("r div out_deg").alias("share")
    )
    contrib = (
        pairs.join(shares, pairs[src] == shares.node_id)
        .groupBy(F.col(dst).alias("node_id"))
        .agg(F.sum("share").alias("inbound"))
    )
    dang = (
        state.filter(F.col("out_deg").isNull())
        .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
    )
    return (
        state.select("node_id", "out_deg")
        .join(contrib, "node_id", "left")
        .crossJoin(F.broadcast(dang))
        .select(
            "node_id",
            "out_deg",
            (
                F.lit(teleport)
                + F.expr(
                    f"({damping_pct} * (coalesce(inbound, 0L) + dang div {n})) div 100"
                )
            ).cast("long").alias("r"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    iterations: int = 10,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    deduped: bool = False,
) -> DataFrame:
    """Seed-personalized integer PageRank: (node_id, ppr_micro).

    The graph-retrieval salience signal (topic-sensitive PageRank,
    Haveliwala 2002): random walks restart at the SEED set — a query's
    entity mentions — so mass concentrates in the seeds' graph
    neighborhood and the ranking answers "which KG nodes matter for
    THIS query", the reranking step of graph-augmented retrieval.

    Exact integer recurrence (initial mass MICRO per seed, 0
    elsewhere; s = len(seeds)):

        r'(v) = [v in S] * teleport
                + (damping_pct * (inbound(v) + [v in S] * dang div s)) div 100

    i.e. both the teleport term AND the dangling mass return to the
    seeds, never the whole graph — the walk is anchored. Same
    floor-division determinism contract as :func:`pagerank`.

    ``seeds`` is a small driver-side list (a query's entity set —
    bounded by construction, shipped as a broadcast one-column frame;
    never a corpus-scale side). Seeds absent from the graph raise.
    """
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"need 0 < damping_pct < 100, got {damping_pct}")
    if not seeds:
        raise ValueError("need at least one seed")
    if len(set(seeds)) != len(seeds):
        raise ValueError("duplicate seeds")
    # same single-edge-shuffle-per-iteration shape as pagerank(): edges
    # pinned on src once (see _pin_pairs), static (out_deg, is_seed)
    # folded into the rank state, dangling term a filter-agg
    pairs = _pin_pairs(edges, src, dst, deduped)
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out_deg = pairs.groupBy(F.col(src).alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    seed_df = spark.createDataFrame(
        [(s,) for s in seeds], ["node_id"]
    ).withColumn("is_seed", F.lit(True))
    state = (
        pairs.select(F.col(src).alias("node_id"))
        .union(pairs.select(F.col(dst).alias("node_id")))
        .distinct()
        .join(F.broadcast(seed_df), "node_id", "left")
        .join(out_deg, "node_id", "left")
        .repartition(p, F.col("node_id"))
        .select(
            "node_id",
            F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
            "out_deg",
            F.when(F.coalesce("is_seed", F.lit(False)), F.lit(MICRO))
            .otherwise(F.lit(0)).cast("long").alias("r"),
        )
        .localCheckpoint()
    )
    n_seeds_present = state.filter("is_seed").count()
    if n_seeds_present != len(seeds):
        pairs.unpersist()
        raise ValueError(
            f"{len(seeds) - n_seeds_present} seed(s) not present in the graph"
        )
    s = len(seeds)
    teleport = ((100 - damping_pct) * MICRO) // 100
    for _ in range(iterations):
        shares = state.filter(F.col("out_deg").isNotNull()).select(
            "node_id", F.expr("r div out_deg").alias("share")
        )
        contrib = (
            pairs.join(shares, pairs[src] == shares.node_id)
            .groupBy(F.col(dst).alias("node_id"))
            .agg(F.sum("share").alias("inbound"))
        )
        dang = (
            state.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        state = (
            state.select("node_id", "is_seed", "out_deg")
            .join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node_id",
                "is_seed",
                "out_deg",
                (
                    F.when(F.col("is_seed"), F.lit(teleport)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_pct} * (coalesce(inbound, 0L)"
                        f" + if(is_seed, dang div {s}, 0L))) div 100"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    pairs.unpersist()
    return state.select("node_id", F.col("r").alias("ppr_micro"))


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int = 1000,
) -> DataFrame:
    """Structural link-prediction scores for NON-adjacent node pairs at
    distance 2 in the undirected simple graph underlying ``edges`` —
    the classic KG-completion signal set (Liben-Nowell & Kleinberg
    2003): which absent edges does the graph's own structure predict?

    Returns one row per unordered candidate pair (a < b):
      - ``common_neighbors``: shared-neighbor count,
      - ``jaccard_ppm``: (cn * 1e6) div |N(a) ∪ N(b)| as an integer,
      - ``adamic_adar_micro``: sum over shared neighbors z of
        round(1e6 / ln(deg(z))) — each term an exact integer BEFORE
        the sum, so the aggregate is order/partition independent
        (same micro-unit discipline as :func:`pagerank`).

    Skew control: candidate pairs are enumerated through wedge centers
    (one self-join of the symmetric adjacency on the center), and a hub
    center of degree d fans out C(d, 2) pairs — the inherent quadratic
    hazard. ``max_center_degree`` drops centers above the cap from
    ENUMERATION only (degrees in the jaccard denominator stay exact):
    the standard estimator truncation — a 10^7-degree hub contributes
    ~0 Adamic-Adar weight per pair anyway (1/ln d) while costing 10^14
    pairs to enumerate. Same default-on discipline as the inverted-
    index ``df_cap`` in ngram_jaccard_pairs. Scores therefore count
    only common neighbors of degree <= cap; pairs whose every shared
    neighbor exceeds the cap are absent from the output.
    """
    if max_center_degree < 2:
        raise ValueError(
            f"need max_center_degree >= 2, got {max_center_degree}"
        )
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    sym = und.select(F.col("a").alias("n"), F.col("b").alias("z")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("z"))
    )
    deg = sym.groupBy(F.col("n").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    ).localCheckpoint()
    # centers eligible for enumeration: degree in [2, cap] (degree-1
    # centers have no wedge; ln(1) = 0 would also divide by zero)
    centers = deg.filter(
        (F.col("d") >= 2) & (F.col("d") <= max_center_degree)
    ).select(
        F.col("node").alias("z"),
        F.round(F.lit(1_000_000) / F.log(F.col("d"))).cast("long").alias("aa_micro"),
    )
    s1, s2 = sym.alias("s1"), sym.alias("s2")
    wedges = (
        s1.join(s2, (F.col("s1.z") == F.col("s2.z"))
                & (F.col("s1.n") < F.col("s2.n")))
        .select(F.col("s1.n").alias("a"), F.col("s2.n").alias("b"),
                F.col("s1.z").alias("z"))
        .join(centers, "z")
    )
    cn = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum("aa_micro").alias("adamic_adar_micro"),
    )
    # link PREDICTION: drop pairs that are already edges
    candidates = cn.join(und, ["a", "b"], "left_anti")
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("d_b"))
    return (
        candidates.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            F.expr(
                "(common_neighbors * 1000000L)"
                " div (d_a + d_b - common_neighbors)"
            ).alias("jaccard_ppm"),
            "adamic_adar_micro",
        )
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int | None = None,
) -> DataFrame:
    """The k-core of the undirected simple graph underlying ``edges``:
    the (unique) maximal subgraph in which every node has degree >= k
    — the standard dense-region extractor (Seidman 1983), here the
    "structurally load-bearing entities" filter over a KG.

    Returns (node_id, core_degree): surviving nodes with their degree
    INSIDE the core.

    Algorithm: iterative peeling — drop all nodes of degree < k,
    recompute, repeat to fixpoint. Each round is one degree aggregate
    + two anti-joins against the (usually tiny) peel set, with
    ``localCheckpoint`` keeping lineage flat and exactly one driver
    action (the peel-set count, which doubles as the convergence
    test) — the same fixpoint discipline as the canonicalization CC
    loop. Round count is bounded by the peel DEPTH (adversarial
    worst case O(n) on a path; real co-occurrence graphs settle in a
    handful of cascades); ``max_iter`` defaults to the node count —
    the true bound — and the loop raises rather than silently
    returning a non-fixpoint.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )

    def degrees(und: DataFrame) -> DataFrame:
        return (
            und.select(F.col("a").alias("node_id"))
            .unionAll(und.select(F.col("b").alias("node_id")))
            .groupBy("node_id")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )

    if max_iter is None:
        max_iter = max(1, degrees(cur).count())
    for _ in range(max_iter):
        deg = degrees(cur).localCheckpoint()
        low = deg.filter(F.col("core_degree") < k).select("node_id")
        if low.count() == 0:
            return deg
        la = low.select(F.col("node_id").alias("a"))
        lb = low.select(F.col("node_id").alias("b"))
        cur = (
            cur.join(la, "a", "left_anti")
            .join(lb, "b", "left_anti")
            .localCheckpoint()
        )
    # empty graph: zero iterations of peeling still need a result
    if degrees(cur).count() == 0:
        return degrees(cur)
    raise RuntimeError(f"k_core failed to converge in {max_iter} rounds")


def bfs_distances(
    edges: DataFrame,
    seeds: list,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Exact multi-source shortest-path (hop) distances: (node_id, dist).

    The per-query companion to :func:`neighborhood_function` (HyperBall
    estimates the corpus-wide distance census; this computes EXACT
    distances from one query's seed set — "how far is every KG node
    from the entities this question mentions", the hop-expansion
    radius signal for graph retrieval).

    Frontier expansion: dist(seed) = 0; round t joins the CURRENT
    frontier against the adjacency (one equi-join on the node key —
    AQE covers hub skew) and anti-joins the visited set, so each round
    touches only edges incident to the frontier and the first time a
    node is reached IS its shortest distance (BFS invariant). One
    driver action per round (the frontier count for termination — the
    k_core discipline), ``localCheckpoint`` keeps lineage flat. Work
    across all rounds is O(|E| + |V|) total for connected reach:
    every edge is expanded from its source's frontier round exactly
    once, because frontiers are disjoint.

    ``seeds`` is a small driver-side list (a query's entity mentions —
    bounded by construction; broadcast as a one-column frame). Nodes
    farther than ``max_depth`` (or unreachable) are absent from the
    output — the bound is the contract, not a convergence guess, so
    hitting it is not an error.
    """
    if not seeds:
        raise ValueError("need at least one seed")
    if len(set(seeds)) != len(seeds):
        raise ValueError("duplicate seeds")
    if max_depth < 0:
        raise ValueError(f"need max_depth >= 0, got {max_depth}")
    spark = edges.sparkSession
    adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        adj = adj.unionAll(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    # multi-edges fan the frontier join out before the distinct
    # collapses it — dedupe once up front so every round's join is
    # bounded by the simple-graph degree
    adj = adj.filter(F.col("u") != F.col("v")).dropDuplicates(
        ["u", "v"]
    ).localCheckpoint()
    frontier = spark.createDataFrame(
        [(s,) for s in seeds], ["node_id"]
    ).localCheckpoint()
    visited = frontier.withColumn("dist", F.lit(0)).localCheckpoint()
    for t in range(1, max_depth + 1):
        nxt = (
            frontier.join(adj, frontier.node_id == adj.u)
            .select(F.col("v").alias("node_id"))
            .dropDuplicates(["node_id"])
            .join(visited.select("node_id"), "node_id", "left_anti")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        visited = visited.unionAll(
            nxt.withColumn("dist", F.lit(t))
        ).localCheckpoint()
        frontier = nxt
    return visited


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of the UNDIRECTED simple graph underlying
    ``edges`` (direction, duplicate pairs and self-loops are ignored).

    Degree-ordered orientation (the MapReduce-classic "compact-forward"
    scheme, Suri & Vassilvitskii WWW 2011): orient every undirected
    edge from the endpoint with the smaller (degree, id) pair to the
    larger, then count wedges u->v, u->w (v before w in the same
    order) that close with an oriented edge v->w. Every triangle is
    counted exactly once — at its minimum-order corner.

    Why this shape at 100 TB: the wedge self-join is the quadratic
    hazard, and orientation bounds each node's out-degree by
    O(sqrt(m)) REGARDLESS of raw degree skew — a celebrity hub with
    10^7 neighbors contributes wedges only through its (few)
    higher-order neighbors, so no task materializes deg^2 pairs. Three
    hash shuffles total: degree agg, wedge self-join on the apex,
    closure join on (v, w).

    Returns a 1-row frame: (n_nodes, n_edges, n_wedges, n_triangles).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    with_deg = (
        und.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select(
            "a", "b", F.col("da.d").alias("d_a"), F.col("db.d").alias("d_b")
        )
    )
    lower_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("d_b")).otherwise(F.col("d_a")).alias("d_v"),
    ).localCheckpoint()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    order_lt = (F.col("e1.d_v") < F.col("e2.d_v")) | (
        (F.col("e1.d_v") == F.col("e2.d_v"))
        & (F.col("e1.v") < F.col("e2.v"))
    )
    wedges = e1.join(
        e2, (F.col("e1.u") == F.col("e2.u")) & order_lt
    ).select(F.col("e1.v").alias("x"), F.col("e2.v").alias("y"))
    closed = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    # wedge/triangle totals need the wedge frame twice; both aggs are
    # cheap counts, so recompute rather than checkpoint the (possibly
    # huge) wedge set
    counts = (
        und.agg(
            F.count(F.lit(1)).alias("n_edges"),
        )
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
        .crossJoin(closed.agg(F.count(F.lit(1)).alias("n_triangles")))
    )
    return counts.select("n_nodes", "n_edges", "n_wedges", "n_triangles")


def pmi_edges(
    occurrences: DataFrame,
    group_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_group_size: int = 1000,
) -> DataFrame:
    """Pointwise-mutual-information weights for the co-occurrence edge
    list — the statistical upgrade of the raw mention-cooccurrence
    edges the canonicalization connected-components run on (reference
    builds its entity graph from unweighted co-mentions,
    graph_extraction.py; PMI separates "co-occur because both are
    frequent" from "co-occur because they are related").

    One row per unordered item pair (a < b) co-occurring in at least
    ``min_pair_count`` groups:
      pmi_micro = round(1e6 * (ln n_ab + ln N - ln n_a - ln n_b))
    with N = number of distinct groups. The log-sum form (not
    ln(n_ab*N/(n_a*n_b))) keeps every intermediate in double range at
    any scale — integer products of corpus-scale counts would overflow
    int64. Each term is evaluated left-to-right identically in any
    engine, so the rounded micro value is portable.

    100 TB shape: pair enumeration is confined WITHIN groups (one
    self-join keyed on the group), so cost is sum over groups of
    C(m, 2); ``max_group_size`` drops degenerate hub groups from
    enumeration (same default-on truncation discipline as df_cap /
    max_center_degree) while item counts and N stay exact. Item-count
    attachment is two 1-row-per-item joins after aggregation.
    """
    if min_pair_count < 1:
        raise ValueError(f"need min_pair_count >= 1, got {min_pair_count}")
    if max_group_size < 2:
        raise ValueError(f"need max_group_size >= 2, got {max_group_size}")
    occ = (
        occurrences.select(
            F.col(group_col).alias("g"), F.col(item_col).alias("i")
        )
        .dropDuplicates(["g", "i"])
        .localCheckpoint()
    )
    sizes = occ.groupBy("g").agg(F.count(F.lit(1)).alias("_m"))
    eligible = occ.join(
        sizes.filter(F.col("_m") <= max_group_size).select("g"), "g"
    )
    x, y = eligible.alias("x"), eligible.alias("y")
    pair_counts = (
        x.join(y, (F.col("x.g") == F.col("y.g")) & (F.col("x.i") < F.col("y.i")))
        .groupBy(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    item_counts = occ.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    n_groups = occ.select(
        F.countDistinct("g").cast("double").alias("_n_groups")
    )
    na = item_counts.select(F.col("i").alias("a"), F.col("n_i").alias("n_a"))
    nb = item_counts.select(F.col("i").alias("b"), F.col("n_i").alias("n_b"))
    pmi = (
        F.log(F.col("n_ab").cast("double"))
        + F.log(F.col("_n_groups"))
        - F.log(F.col("n_a").cast("double"))
        - F.log(F.col("n_b").cast("double"))
    )
    return (
        pair_counts.join(na, "a")
        .join(nb, "b")
        .crossJoin(F.broadcast(n_groups))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.lit(1_000_000) * pmi).cast("long").alias("pmi_micro"),
        )
    )


# probe cap for label_propagation's small-graph election (see the
# docstring there): ~65k edges is single-digit MB on the driver
SMALL_LPA_EDGE_CAP = 65_536


def _driver_lpa(edges: DataFrame, rows, src: str, dst: str, max_iter: int):
    """Exact Python replica of the distributed synchronous LPA below
    (same und construction, same (-count, label) argmin vote, same
    round accounting incl. the final no-change round), returning a
    local relation. Comparison semantics agree: UTF-8 byte order —
    Spark's string order — preserves code-point order — Python's.
    Returns None when an un-droppable NULL survives und (cannot happen:
    least/greatest null-skip always collapses a null edge to a==b)."""
    und = set()
    for r in rows:
        a, b = r[0], r[1]
        if a is None or b is None or a == b:
            continue  # identical to least/greatest null-skip + a != b
        und.add((a, b) if a < b else (b, a))
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    n_iter = 0
    for _ in range(max_iter):
        n_iter += 1
        new = {}
        for n, nbrs in adj.items():
            cnt: dict = {}
            for z in nbrs:
                lz = labels[z]
                cnt[lz] = cnt.get(lz, 0) + 1
            new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        changed = sum(1 for n in new if new[n] != labels[n])
        labels = new
        if changed == 0:
            break
    from pyspark.sql import types as T

    ntype = edges.schema[src].dataType
    schema = T.StructType(
        [
            T.StructField("node_id", ntype),
            T.StructField("label", ntype),
            T.StructField("n_iter", T.IntegerType(), False),
        ]
    )
    out = sorted((n, labels[n], n_iter) for n in labels)
    return edges.sparkSession.createDataFrame(out, schema)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    small_graph_cap: int | None = None,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007, made order-independent): community detection over the
    undirected simple graph underlying ``edges`` — the cheap
    community signal for entity neighborhoods that the reference
    delegates to its graph-DB plugin.

    Every node starts labeled with itself; each round, every node
    adopts the label that is most frequent among its neighbors, ties
    broken by MINIMUM label — a total order per node, so the sweep is
    deterministic regardless of partitioning (classic async LPA is
    visit-order dependent; the synchronous min-tie-break variant
    trades a little convergence speed for reproducibility).
    Synchronous LPA can 2-cycle on bipartite structure, so the loop is
    bounded by ``max_iter`` and also stops early at a fixpoint.

    Returns (node_id, label, n_iter) where label is the community
    representative and n_iter the rounds actually run.

    100 TB shape: per round, ONE edge-sized shuffle — the
    neighbor-label gather joins labels (node-sized, hash-partitioned
    on node) to the symmetric adjacency, then a map-side-combined
    (node, label) count and a per-node window max. Label state is
    localCheckpointed per round (bounded lineage, same discipline as
    :func:`pagerank`); convergence costs one count action per round on
    the changed-rows frame.
    ``small_graph_cap`` (r6, default None = off): when set, probe the
    raw edge projection with a bounded ``limit(cap+1).collect()`` (a
    scan, no shuffle — callers pass checkpointed edge tables); if it
    fits, the whole fixpoint runs as an exact driver replica returning
    a local relation — the per-round job fixed cost IS the wall on
    vocabulary-sized entity graphs — else fall through unchanged. Same
    strategy-election pattern as canonicalize.SMALL_CC_PAIR_CAP.
    """
    if max_iter < 1:
        raise ValueError(f"need max_iter >= 1, got {max_iter}")
    if small_graph_cap:
        head = edges.select(src, dst).limit(small_graph_cap + 1).collect()
        if len(head) <= small_graph_cap:
            local = _driver_lpa(edges, head, src, dst, max_iter)
            if local is not None:
                return local
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    # pre-partition the (static) adjacency on the per-round join key so
    # every round's gather shuffles only the node-sized label frame,
    # never the edge frame (guide §2.4: two operations keyed the same
    # way share one exchange)
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # one pass over und: both orientations explode from the same scan
    # (unionAll of two projections evaluated the dedup'd edge frame
    # twice); identical row set
    sym = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("n"), F.col("b").alias("z")),
                    F.struct(F.col("b").alias("n"), F.col("a").alias("z")),
                )
            ).alias("_e")
        )
        .select("_e.*")
        .repartition(n_shuffle, "z")
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("n").alias("node_id"))
        .dropDuplicates()
        .withColumn("label", F.col("node_id"))
        .localCheckpoint()
    )
    n_iter = 0
    for _ in range(max_iter):
        n_iter += 1
        nbr = sym.join(
            labels.select(
                F.col("node_id").alias("z"), F.col("label").alias("nbr_label")
            ),
            "z",
        )
        # argmax by (cnt DESC, label ASC) as a min_by over the struct
        # (-cnt, label) — one hash agg instead of the sort + row_number
        # window (identical pick: a total order per node). The old
        # label rides along so the round is ONE job: the convergence
        # probe's full count materializes the persisted frame and
        # reports changed rows in the same action (the previous
        # checkpoint-then-count shape paid two jobs per round, and the
        # per-round job count IS the wall on vocabulary-sized graphs —
        # bounded lineage is preserved by the max_iter bound).
        new_labels = (
            nbr.groupBy("n", "nbr_label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("n")
            .agg(
                F.min_by(
                    "nbr_label",
                    F.struct(
                        (-F.col("cnt")).alias("_nc"),
                        F.col("nbr_label").alias("_l"),
                    ),
                ).alias("label")
            )
            .select(F.col("n").alias("node_id"), "label")
            .join(
                labels.select(
                    "node_id", F.col("label").alias("_old")
                ),
                "node_id",
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node_id", "label")
        if changed == 0:
            break
    return labels.select("node_id", "label", F.lit(n_iter).alias("n_iter"))


def random_indexing_embeddings(
    pmi: DataFrame,
    dim: int = 8,
    a_col: str = "a",
    b_col: str = "b",
    weight_col: str = "pmi_micro",
) -> DataFrame:
    """Training-free node embeddings by random indexing (Kanerva et al.
    2000; the sparse-random-projection shortcut to spectral embedding):
    every node's vector is the weight-scaled SUM of its neighbors'
    fixed random sign vectors,

        emb[x, j] = sum over neighbors y of w(x, y) * sign(y, j)

    with sign(y, j) = +/-1 derived from md5("<j>\\x1f<y>") — portable,
    and INTEGER: weights are micro-units (e.g. :func:`pmi_edges`
    output), signs are +/-1, so each coordinate is an exact int64 sum,
    partition-order independent, engine-reproducible. Johnson-
    Lindenstrauss gives cosine preservation in expectation; unlike
    skip-gram training the result needs ONE aggregation, no iterations.

    ``pmi`` carries undirected weighted pairs (a < b convention is
    fine — both directions are materialized internally). Returns long
    format (node_id, j, emb_micro): SQL-checkable, and pivotable to an
    array column downstream.

    100 TB shape: edges explode x dim (a constant fan-out) into one
    map-side-combined (node, j) sum — a single shuffle bounded by
    nodes x dim; no iteration, no driver state.
    """
    if not (1 <= dim <= 64):
        raise ValueError(f"need 1 <= dim <= 64, got {dim}")
    sym = pmi.select(
        F.col(a_col).alias("x"), F.col(b_col).alias("y"),
        F.col(weight_col).alias("w"),
    ).unionAll(
        pmi.select(
            F.col(b_col).alias("x"), F.col(a_col).alias("y"),
            F.col(weight_col).alias("w"),
        )
    )
    expanded = sym.select(
        "x", "y", "w",
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j"),
    )
    h = F.md5(
        F.concat_ws("\x1f", F.col("j").cast("string"), F.col("y").cast("string"))
    )
    sign = F.when(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        expanded.select(
            F.col("x").alias("node_id"), "j", (F.col("w") * sign).alias("term")
        )
        .groupBy("node_id", "j")
        .agg(F.sum("term").cast("long").alias("emb_micro"))
    )


def hyperball_states(
    edges: DataFrame,
    p: int = 7,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) — the web-scale neighborhood-
    function algorithm: every node carries an HLL register set of the
    nodes within distance t, and one iteration max-merges each node's
    registers with its successors',

        ball(x, t+1) = ball(x, t)  ∪  union over (x, y) in E of ball(y, t)

    which in rowset form is a plain groupBy-max over (node, bucket) —
    the same mergeable-register algebra as :mod:`.sketches`, so the
    whole radius-t distance census costs t scans of the edge list with
    bounded (2^p per node) state. This is how avg-distance / effective-
    diameter is computed on billion-edge graphs where exact BFS per
    node is impossible.

    Runs EXACTLY ``n_iter`` iterations (deterministic output shape; a
    converged graph just repeats its fixpoint rows at higher t) and
    returns all radii: (t, node, bucket, m_j) for t in 0..n_iter.
    Estimates per (t, node) come from :func:`..sketches.hll_estimate`
    with group_cols ["t", "node"].

    100 TB shape: per iteration one edge-state equi-join + one
    map-side-combined max — registers are partial aggregates; state is
    localCheckpoint-pinned per radius so the t-fold union does not
    re-run earlier joins.
    """
    from .sketches import hll_merge, hll_registers

    if n_iter < 1:
        raise ValueError(f"need n_iter >= 1, got {n_iter}")
    e = edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
    if not directed:
        e = e.unionAll(
            edges.select(F.col(dst_col).alias("x"), F.col(src_col).alias("y"))
        )
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .dropDuplicates()
    )
    state = hll_registers(
        nodes.select("node", F.col("node").alias("_v")), ["node"], "_v", p=p
    ).localCheckpoint()
    radii = [state.select(F.lit(0).alias("t"), "node", "bucket", "m_j")]
    for t in range(1, n_iter + 1):
        contrib = e.join(state, e["y"] == state["node"]).select(
            e["x"].alias("node"), "bucket", "m_j"
        )
        state = hll_merge(state, contrib).localCheckpoint()
        radii.append(state.select(F.lit(t).alias("t"), "node", "bucket", "m_j"))
    out = radii[0]
    for r in radii[1:]:
        out = out.unionByName(r)
    return out


def neighborhood_function(
    edges: DataFrame,
    p: int = 7,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """Per (t, node) ball-size estimates: (t, node, n_registers,
    n_empty, harmonic_s49, estimate) — the distance-distribution
    census behind avg-distance / effective-diameter estimates."""
    from .sketches import hll_estimate

    states = hyperball_states(
        edges, p=p, n_iter=n_iter, src_col=src_col, dst_col=dst_col,
        directed=directed,
    )
    return hll_estimate(states, ["t", "node"], p=p)


def effective_diameter(
    edges: DataFrame,
    p: int = 8,
    n_iter: int = 4,
    q_e6: int = 900_000,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """HyperBall-derived distance summary within horizon ``n_iter`` —
    one row:

    (n_iter, q_e6, nf0_e4, nf_max_e4, avg_distance_e6,
     eff_diameter_e6)

    ``NF(t)`` — the neighborhood function, sum over nodes of the HLL
    ball-size estimate at radius t — is summed in integer 1e-4 units
    (each per-node estimate is an exact-4dp double, identical in any
    IEEE engine, so the sum is order-independent). From it:

    - ``avg_distance_e6``: Boldi-Vigna average distance over pairs
      reachable within the horizon, sum over t of t*(NF(t)-NF(t-1))
      divided by NF(n_iter)-NF(0), floor-micro;
    - ``eff_diameter_e6``: the Palmer/Leskovec interpolated effective
      diameter at quantile q — the smallest t with NF(t) >= q*NF(max),
      minus the linear back-off (q*NF(max)-NF(t-1))/(NF(t)-NF(t-1)),
      floor-micro. 0 when NF(0) already meets the quantile; both NULL
      on an empty graph.

    Both are HORIZON-BOUNDED estimates: with n_iter below the true
    effective diameter they read "within radius n_iter" (NF(max) is
    NF at the horizon, not at convergence) — pick n_iter >= the
    expected diameter, or iterate until NF plateaus. This is the
    billion-edge diameter recipe (Boldi & Vigna 2013; Palmer et al.
    ANF 2002): t scans of the edge list, bounded 2^p state per node,
    never a per-node BFS.

    100 TB shape: everything after the HyperBall scans operates on
    n_iter+1 ROWS — the lag window and min-candidate agg are
    bounded-input by construction (the audited exemption); scalars
    assemble via single-row crossJoin, no driver collect.
    """
    if not (0 < q_e6 <= 1_000_000):
        raise ValueError(f"need 0 < q_e6 <= 1000000, got {q_e6}")
    per_node = neighborhood_function(
        edges, p=p, n_iter=n_iter, src_col=src_col, dst_col=dst_col,
        directed=directed,
    )
    nf = per_node.groupBy("t").agg(
        F.sum(F.expr("CAST(round(estimate * 10000) AS BIGINT)")).alias(
            "nf_e4"
        )
    )
    w = Window.orderBy("t")
    nf2 = nf.select(
        "t", "nf_e4", F.lag("nf_e4").over(w).alias("nf_prev_e4")
    ).localCheckpoint()
    base = nf2.agg(
        F.max("nf_e4").alias("nf_max_e4"),
        F.sum(F.when(F.col("t") == 0, F.col("nf_e4"))).alias("nf0_e4"),
        F.sum(
            F.when(
                F.col("t") > 0,
                F.col("t") * (F.col("nf_e4") - F.col("nf_prev_e4")),
            )
        ).alias("_growth_num_e4"),
    )
    cand = (
        nf2.crossJoin(base.select("nf_max_e4"))
        .filter(
            F.lit(1_000_000) * F.col("nf_e4")
            >= F.lit(q_e6) * F.col("nf_max_e4")
        )
        .agg(
            F.min(F.struct("t", "nf_prev_e4", "nf_e4")).alias("c")
        )
        .select(
            F.col("c.t").alias("_ct"),
            F.col("c.nf_prev_e4").alias("_cprev"),
            F.col("c.nf_e4").alias("_cnf"),
        )
    )
    return (
        base.crossJoin(cand)
        .select(
            F.lit(n_iter).cast("long").alias("n_iter"),
            F.lit(q_e6).cast("long").alias("q_e6"),
            "nf0_e4",
            "nf_max_e4",
            F.expr(
                "CASE WHEN nf_max_e4 > nf0_e4 THEN"
                " (1000000 * _growth_num_e4) DIV (nf_max_e4 - nf0_e4) END"
            ).alias("avg_distance_e6"),
            F.expr(
                f"CASE WHEN _ct IS NULL THEN NULL"
                f" WHEN _ct = 0 THEN 0"
                f" ELSE (_ct - 1) * 1000000"
                f" + ({q_e6} * nf_max_e4 - 1000000 * _cprev)"
                f" DIV (_cnf - _cprev) END"
            ).cast("long").alias("eff_diameter_e6"),
        )
    )


def harmonic_centrality(
    edges: DataFrame,
    p: int = 8,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """Approximate harmonic centrality per node from HyperBall
    (Boldi & Vigna 2014, "Axioms for centrality" — their flagship
    application): with ``ball(x, t)`` the HLL ball-size estimate,

        H(x) = sum over t in 1..n_iter of (1/t) * (ball(x,t) - ball(x,t-1))

    i.e. every newly-reached node at distance t contributes 1/t. The
    horizon caps contributions at 1/n_iter — nodes farther than the
    horizon contribute 0, the standard HyperBall truncation (harmonic
    centrality's 1/d decay makes the truncated tail small).

    Returns (node, harmonic_e6) with the deterministic integer
    evaluation ``sum_t (max(ball_e4(t) - ball_e4(t-1), 0) *
    (1000000 DIV t)) DIV 10000`` — ball estimates enter as exact-4dp
    scaled BIGINTs, deltas clamp at 0 (registers only grow; a rare
    regime-switch dip in the estimator is noise, not shrinkage), and
    the per-term floor makes the value reproducible in any SQL
    engine.

    100 TB shape: the t edge-scan max-merges are the only data-sized
    work; the derivation is a node-partitioned lag window + one
    node-keyed agg — no global window, no collect.
    """
    per_node = neighborhood_function(
        edges, p=p, n_iter=n_iter, src_col=src_col, dst_col=dst_col,
        directed=directed,
    )
    e4 = per_node.select(
        "t",
        "node",
        F.expr("CAST(round(estimate * 10000) AS BIGINT)").alias("e4"),
    )
    w = Window.partitionBy("node").orderBy("t")
    return (
        e4.withColumn("prev", F.lag("e4").over(w))
        .filter(F.col("t") > 0)
        .groupBy("node")
        .agg(
            F.sum(
                F.expr(
                    "(greatest(e4 - prev, 0L) * (1000000 DIV t)) DIV 10000"
                )
            ).alias("harmonic_e6")
        )
    )


def lin_centrality(
    edges: DataFrame,
    p: int = 8,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """Approximate Lin centrality per node from HyperBall (Boldi &
    Vigna 2014 §7 — the closeness variant that SURVIVES disconnected
    graphs, which every freshly-extracted KG is): with ``r(x)`` the
    horizon-bounded reachable-set size and ``S(x)`` the sum of
    distances to it,

        Lin(x) = r(x)^2 / S(x)

    — squaring the reach rewards nodes that see a BIG component
    nearby, where plain closeness 1/S(x) absurdly crowns isolated
    two-node islands. The sibling of :func:`harmonic_centrality` (1/d
    decay) with the opposite emphasis: harmonic grades local
    brokerage, Lin grades component-scale reach.

    Returns (node, reach_e4, sumdist_e4, lin_e6) under the repo's
    deterministic integer evaluation: ball estimates enter as
    exact-4dp BIGINTs, ``sumdist_e4 = sum_t t * max(ball_t -
    ball_{{t-1}}, 0)`` (clamped deltas, per-term exact),
    ``reach_e4 = ball(n_iter)``, and ``lin_e6 = reach_e4^2 * 100 div
    sumdist_e4`` in DECIMAL(38,0) — reproducible in any SQL engine.
    A node whose ball never grows (isolated at the horizon) reports
    NULL lin_e6 rather than a fake infinity.

    100 TB shape: identical to :func:`harmonic_centrality` — the t
    edge-scan max-merges are the only data-sized work; the derivation
    is one node-partitioned lag window + one node-keyed agg.
    """
    per_node = neighborhood_function(
        edges, p=p, n_iter=n_iter, src_col=src_col, dst_col=dst_col,
        directed=directed,
    )
    e4 = per_node.select(
        "t",
        "node",
        F.expr("CAST(round(estimate * 10000) AS BIGINT)").alias("e4"),
    )
    w = Window.partitionBy("node").orderBy("t")
    return (
        e4.withColumn("prev", F.lag("e4").over(w))
        .groupBy("node")
        .agg(
            F.sum(
                F.when(
                    F.col("t") > 0,
                    F.col("t") * F.greatest(
                        F.col("e4") - F.col("prev"), F.lit(0).cast("long")
                    ),
                )
            ).alias("sumdist_e4"),
            F.max(
                F.when(F.col("t") == n_iter, F.col("e4"))
            ).alias("reach_e4"),
        )
        .select(
            "node",
            "reach_e4",
            "sumdist_e4",
            F.when(
                F.col("sumdist_e4") > 0,
                F.expr(
                    "CAST(CAST(reach_e4 AS DECIMAL(38,0)) * reach_e4 * 100"
                    " div sumdist_e4 AS BIGINT)"
                ),
            ).alias("lin_e6"),
        )
    )


def sssp_distances(
    edges: DataFrame,
    seeds: list,
    weight: str = "weight",
    max_hops: int = 10,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Weighted single/multi-source shortest distances: (node_id, dist).

    The weighted companion to :func:`bfs_distances` (hop counts):
    edge weights are COSTS (integer, >= 0 — for float costs pre-scale
    to integer micro, the repo-wide ln-micro discipline, so min() is
    exact and partitioning-independent), and the result is the minimum
    total cost from the seed set over paths of at most ``max_hops``
    edges. In the KG use the weight is a dissimilarity (e.g. inverse
    co-occurrence strength), turning hop expansion into
    relevance-bounded expansion.

    Delta-stepping-flavored Bellman-Ford: each round relaxes only
    edges out of nodes whose distance IMPROVED last round (the
    frontier), via one equi-join frontier x adjacency + one
    map-side-combined min-agg + one left-outer compare against the
    settled state. With non-negative weights, after t rounds the
    state holds the exact minimum over <= t-hop paths, so
    ``max_hops`` is the contract (the bfs_distances bound semantics),
    and early convergence (empty frontier) yields the true unbounded
    shortest distances. One driver action per round (frontier count,
    doubling as the termination test — the k_core discipline);
    ``localCheckpoint`` keeps lineage flat.

    100 TB shape: per-round work is bounded by edges incident to the
    improving frontier (AQE covers hub skew in the join); the state
    table shuffles once per round on node_id. Nodes unreachable
    within ``max_hops`` are absent. Parallel edges collapse to their
    min weight up front, so round cost is bounded by the simple
    graph's degree.
    """
    if not seeds:
        raise ValueError("need at least one seed")
    if len(set(seeds)) != len(seeds):
        raise ValueError("duplicate seeds")
    if max_hops < 0:
        raise ValueError(f"need max_hops >= 0, got {max_hops}")
    spark = edges.sparkSession
    adj = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        F.col(weight).cast("long").alias("w"),
    )
    if not directed:
        adj = adj.unionAll(
            edges.select(
                F.col(dst).alias("u"),
                F.col(src).alias("v"),
                F.col(weight).cast("long").alias("w"),
            )
        )
    # negative weights break the <=t-hop invariant — guard in-plan
    # (lazy per-row assert_true, no extra driver action; the dedup.py
    # pattern), surfacing at the first action on adj
    adj = (
        adj.filter(F.col("u") != F.col("v"))
        .withColumn(
            "w",
            F.when(
                F.assert_true(
                    F.col("w").isNotNull() & (F.col("w") >= 0),
                    F.lit("sssp_distances: weights must be non-null and >= 0"),
                ).isNull(),
                F.col("w"),
            ),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    frontier = (
        spark.createDataFrame([(s,) for s in seeds], ["node_id"])
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    state = frontier
    for _ in range(max_hops):
        relaxed = (
            frontier.join(adj, frontier.node_id == adj.u)
            .select(
                F.col("v").alias("node_id"),
                (F.col("dist") + F.col("w")).alias("cand"),
            )
            .groupBy("node_id")
            .agg(F.min("cand").alias("cand"))
        )
        # full-outer merge instead of anti-join+union: one shuffle on
        # node_id updates settled rows and admits new ones together
        # (the CC-fixpoint state-update shape)
        merged = state.join(relaxed, "node_id", "full_outer").select(
            "node_id",
            F.col("dist"),
            F.col("cand"),
            (
                F.col("cand").isNotNull()
                & (F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            ).alias("_improved"),
        ).localCheckpoint()
        frontier = merged.filter(F.col("_improved")).select(
            "node_id", F.col("cand").alias("dist")
        )
        state = merged.select(
            "node_id",
            F.when(F.col("_improved"), F.col("cand"))
            .otherwise(F.col("dist"))
            .alias("dist"),
        )
        if merged.filter(F.col("_improved")).count() == 0:
            break
    return state


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int | None = None,
) -> DataFrame:
    """(node_id, scc_id) for every node of the DIRECTED graph, where
    scc_id is the minimum node id of the node's strongly connected
    component — the directed companion to
    canonicalize.connected_components (KG use: cyclic predicate
    clusters / mutually-reachable entity knots, which an undirected CC
    conflates with mere weak connectivity).

    Coloring algorithm (Orzan's MapReduce/Pregel SCC decomposition):
    per outer round on the remaining subgraph —

    1. TRIM: peel nodes with no in-edge or no out-edge (they can sit
       in no cycle → singleton SCCs), repeating while the peel
       cascades (the k_core discipline, one driver action per peel).
    2. COLOR: propagate the maximum node id FORWARD to fixpoint —
       color(v) = max id that reaches v; one edge-sized equi-join +
       map-side-combined max-agg per step, rounds = color-partition
       diameter.
    3. HARVEST: every color root r (color(r) == r) anchors one SCC =
       nodes that reach r BACKWARD through their own color class;
       backward frontier expansion restricted to same-color edges.
    4. Label the harvested SCCs (scc_id = min member id), remove
       them, repeat.

    Every remaining node after a harvest had its color root removed,
    so each outer round retires >= 1 SCC per surviving color class;
    ``max_rounds`` defaults to the node count (the true bound) and
    the loop RAISES rather than returning a partial labeling.
    Adversarial chains (a pure path) cost O(n) trim rounds — the
    documented k_core peel-depth caveat — while the engine's real
    shapes (dense mutual knots + DAG tails) settle in a handful:
    trim eats the tails, one color+harvest eats each knot.

    100 TB shape: every step is an equi-join of the state vector with
    the edge list (AQE covers hub skew) + one agg; state is one row
    per live node; ``localCheckpoint`` per step keeps lineage flat;
    driver actions are one count per fixpoint step, never data.
    """
    spark = edges.sparkSession
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint()
    )
    node_type = cur.schema["u"].dataType.simpleString()
    labeled = spark.createDataFrame(
        [], f"node_id {node_type}, scc_id {node_type}"
    )
    n_nodes = (
        cur.select(F.col("u").alias("node_id"))
        .unionAll(cur.select(F.col("v").alias("node_id")))
        .distinct()
        .count()
    )
    if max_rounds is None:
        max_rounds = max(1, n_nodes)
    for _ in range(max_rounds):
        nodes = (
            cur.select(F.col("u").alias("node_id"))
            .unionAll(cur.select(F.col("v").alias("node_id")))
            .distinct()
            .localCheckpoint()
        )
        if nodes.count() == 0:
            return labeled
        # --- 1) trim cascade: no-in or no-out nodes are singleton SCCs
        trimmed_any = True
        while trimmed_any:
            has_out = cur.select(F.col("u").alias("node_id")).distinct()
            has_in = cur.select(F.col("v").alias("node_id")).distinct()
            live = has_out.join(has_in, "node_id").localCheckpoint()
            trivial = nodes.join(live, "node_id", "left_anti").localCheckpoint()
            if trivial.count() == 0:
                trimmed_any = False
            else:
                labeled = labeled.unionByName(
                    trivial.select(
                        "node_id", F.col("node_id").alias("scc_id")
                    )
                ).localCheckpoint()
                cur = (
                    cur.join(
                        trivial.select(F.col("node_id").alias("u")), "u",
                        "left_anti",
                    )
                    .join(
                        trivial.select(F.col("node_id").alias("v")), "v",
                        "left_anti",
                    )
                    .localCheckpoint()
                )
                nodes = nodes.join(trivial, "node_id", "left_anti").localCheckpoint()
        if nodes.count() == 0:
            return labeled
        # --- 2) forward max-color fixpoint
        colors = nodes.select(
            "node_id", F.col("node_id").alias("color")
        ).localCheckpoint()
        changed = 1
        while changed > 0:
            incoming = (
                cur.join(colors, cur.u == colors.node_id)
                .groupBy(F.col("v").alias("node_id"))
                .agg(F.max("color").alias("in_color"))
            )
            nxt = (
                colors.join(incoming, "node_id", "left_outer")
                .select(
                    "node_id",
                    F.greatest(
                        F.col("color"),
                        F.coalesce(F.col("in_color"), F.col("color")),
                    ).alias("color"),
                    (
                        F.coalesce(F.col("in_color"), F.col("color"))
                        > F.col("color")
                    ).alias("_chg"),
                )
                .localCheckpoint()
            )
            changed = nxt.filter(F.col("_chg")).count()
            colors = nxt.select("node_id", "color")
        # --- 3) backward reach from color roots within the color class
        member = colors.filter(F.col("node_id") == F.col("color")).select(
            "node_id", F.col("color").alias("root")
        ).localCheckpoint()
        frontier = member
        while True:
            new = (
                cur.join(frontier, cur.v == frontier.node_id)
                .select(F.col("u").alias("node_id"), "root")
                .dropDuplicates(["node_id"])
                .join(colors, "node_id")
                .filter(F.col("color") == F.col("root"))
                .select("node_id", "root")
                .join(member.select("node_id"), "node_id", "left_anti")
                .localCheckpoint()
            )
            if new.count() == 0:
                break
            member = member.unionByName(new).localCheckpoint()
            frontier = new
        # --- 4) label (scc_id = min member id), peel, repeat
        scc_ids = member.groupBy("root").agg(F.min("node_id").alias("scc_id"))
        labeled = labeled.unionByName(
            member.join(scc_ids, "root").select("node_id", "scc_id")
        ).localCheckpoint()
        done = member.select("node_id")
        cur = (
            cur.join(done.select(F.col("node_id").alias("u")), "u", "left_anti")
            .join(done.select(F.col("node_id").alias("v")), "v", "left_anti")
            .localCheckpoint()
        )
    if cur.count() == 0:
        return labeled
    raise RuntimeError(
        f"strongly_connected_components failed to settle in {max_rounds} rounds"
    )


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node_id",
    label: str = "label",
) -> DataFrame:
    """Newman modularity of a community assignment, one row per
    community: (label, n_nodes, intra_edges, deg_sum, coverage_ppm,
    expected_ppm, q_ppm). Total modularity Q = sum(q_ppm)/1e6 by
    contract — the quality score for any partition the engine
    produces (label_propagation communities, dedup families,
    canonicalization groups).

    Newman & Girvan 2004: Q = sum_c [ m_c/m - (d_c/2m)^2 ] over an
    undirected simple graph with m edges, m_c intra-community edges
    and d_c the community's degree sum. Exactness discipline: every
    term is integer — coverage_ppm = (m_c*1e6) div m and
    expected_ppm = (d_c^2 * 1e6) div (4*m^2) computed in
    decimal(38,0) (d_c <= 2m overflows int64 already at m ~ 3e9;
    decimal(38,0) carries ~1e38, good past m = 1e12), both
    non-negative so Spark's `div` and DuckDB's HUGEINT `//` agree
    bit-for-bit, and q_ppm is the DIFFERENCE of the two truncations —
    never a signed division, whose floor/trunc mismatch across
    engines would leak.

    Graph semantics: direction ignored (edges canonicalized to
    (least, greatest)), duplicate pairs collapse, self-loops dropped.
    Every endpoint must carry a label — enforced lazily in-plan
    (per-row assert_true, the sssp_distances pattern), surfacing at
    the first action rather than silently shrinking m.

    100 TB shape: one dedup shuffle over the canonical pair set, two
    node-keyed equi-joins against the (node-sized) assignment, then
    everything aggregates map-side-combined to label-sized frames;
    the edge total joins back as a 1-row broadcast crossJoin (the
    tfidf N pattern). No driver action, no collect.
    """
    pairs = (
        edges.select(
            F.col(src).cast("string").alias("a"),
            F.col(dst).cast("string").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .dropDuplicates()
    )
    amap = assignment.select(
        F.col(node).cast("string").alias("_n"),
        F.col(label).cast("string").alias("_lab"),
    ).dropDuplicates(["_n"])
    guard = lambda c: F.when(  # noqa: E731
        F.assert_true(
            F.col(c).isNotNull(),
            F.lit("modularity: every graph endpoint needs a label"),
        ).isNull(),
        F.col(c),
    )
    labeled = (
        pairs.join(amap.withColumnRenamed("_n", "lo"), "lo", "left")
        .withColumnRenamed("_lab", "lab_lo")
        .join(
            amap.withColumnRenamed("_n", "hi").withColumnRenamed(
                "_lab", "lab_hi"
            ),
            "hi",
            "left",
        )
        .select(
            "lo", "hi", guard("lab_lo").alias("lab_lo"),
            guard("lab_hi").alias("lab_hi"),
        )
        .localCheckpoint()  # consumed 3x (m, intra, degrees)
    )
    m_row = labeled.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("_m"))
    intra = (
        labeled.filter(F.col("lab_lo") == F.col("lab_hi"))
        .groupBy(F.col("lab_lo").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    ends = labeled.select(
        F.col("lo").alias("node"), F.col("lab_lo").alias("label")
    ).unionAll(
        labeled.select(F.col("hi").alias("node"), F.col("lab_hi").alias("label"))
    )
    per_label = ends.groupBy("label").agg(
        F.count(F.lit(1)).alias("deg_sum"),
        F.countDistinct("node").alias("n_nodes"),
    )
    return (
        per_label.join(intra, "label", "left")
        .withColumn("intra_edges", F.coalesce("intra_edges", F.lit(0)))
        .crossJoin(F.broadcast(m_row))
        .select(
            "label",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("intra_edges").cast("long").alias("intra_edges"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            F.expr(
                "CAST(intra_edges AS decimal(38,0)) * 1000000 div _m"
            ).alias("coverage_ppm"),
            F.expr(
                "CAST(deg_sum AS decimal(38,0)) * CAST(deg_sum AS decimal(38,0))"
                " * 1000000 div (4 * _m * _m)"
            ).alias("expected_ppm"),
        )
        .withColumn("q_ppm", F.col("coverage_ppm") - F.col("expected_ppm"))
    )


def minimum_spanning_forest(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_rounds: int = 30,
) -> DataFrame:
    """Minimum spanning forest (Boruvka 1926) of the undirected graph:
    the cheapest edge set connecting every component — the KG-backbone
    extraction (keep the strongest-association skeleton of a dense
    co-occurrence graph) and the clustering primitive single-linkage
    builds on.

    Edge order is made STRICTLY total by the (w, lo, hi) lexicographic
    key (weights long, endpoints canonicalized strings), so the MSF is
    unique and Boruvka here provably equals Kruskal under the same
    key — the pure-Python oracle (oracle/precompute.msf_py) IS
    Kruskal, making the hash check an algorithm-independent proof.
    Duplicate pairs collapse to their min weight, direction and
    self-loops are dropped; NULL weights raise in-plan (the
    sssp_distances guard pattern).

    100 TB shape: per round one comp-map equi-join pair over the live
    edge set + ONE map-side-combined min-struct agg per component
    side, then contraction labels come from
    :func:`canonicalize.connected_components` ("lss": O(log n) star
    rounds, skew-friendly) over the COMPONENT-sized chosen-edge graph
    — never the full edge list. Component count at least halves per
    round, so rounds <= log2(V) (max_rounds=30 covers 1e9 nodes);
    one driver action (the live-edge count) per round, localCheckpoint
    keeps lineage flat. Hub endpoints are the skew case in the
    comp-map joins — AQE skew-join territory, same as pagerank's rank
    join.
    """
    from .canonicalize import connected_components

    spark = edges.sparkSession
    canon = (
        edges.select(
            F.col(src).cast("string").alias("a"),
            F.col(dst).cast("string").alias("b"),
            F.col(weight).cast("long").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"),
            F.greatest("a", "b").alias("hi"),
            F.when(
                F.assert_true(
                    F.col("w").isNotNull(),
                    F.lit("minimum_spanning_forest: weights must be non-null"),
                ).isNull(),
                F.col("w"),
            ).alias("w"),
        )
        .groupBy("lo", "hi")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    comp = (
        canon.select(F.col("lo").alias("node"))
        .union(canon.select(F.col("hi").alias("node")))
        .distinct()
        .withColumn("c", F.col("node"))
        .localCheckpoint()
    )
    forest = spark.createDataFrame([], "lo string, hi string, w long")
    for _ in range(max_rounds):
        live = (
            canon.join(
                comp.select(F.col("node").alias("lo"), F.col("c").alias("c_lo")),
                "lo",
            )
            .join(
                comp.select(F.col("node").alias("hi"), F.col("c").alias("c_hi")),
                "hi",
            )
            .filter(F.col("c_lo") != F.col("c_hi"))
            .localCheckpoint()
        )
        if live.count() == 0:
            return forest.select(
                F.col("lo").alias("src"), F.col("hi").alias("dst"),
                F.col("w").alias("weight"),
            )
        # (w, lo, hi) is unique per live edge, so trailing comp ids in
        # the struct never influence which edge min() elects
        e = F.struct("w", "lo", "hi", "c_lo", "c_hi").alias("e")
        chosen = (
            live.select(F.col("c_lo").alias("c"), e)
            .unionAll(live.select(F.col("c_hi").alias("c"), e))
            .groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.*")
            .dropDuplicates(["lo", "hi"])
            .localCheckpoint()
        )
        forest = forest.unionByName(
            chosen.select("lo", "hi", "w")
        ).localCheckpoint()
        relabel = connected_components(
            chosen.select(F.col("c_lo").alias("a"), F.col("c_hi").alias("b")),
            algorithm="lss",
        )
        comp = (
            comp.join(
                relabel.withColumnRenamed("node_id", "c"), "c", "left"
            )
            .select(
                "node", F.coalesce("canon_id", F.col("c")).alias("c")
            )
            .localCheckpoint()
        )
    raise RuntimeError(
        f"minimum_spanning_forest failed to settle in {max_rounds} rounds"
    )


def maximal_independent_set(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """Maximal independent set (Luby 1986, deterministic variant):
    (node_id, mis_round) for every MIS member — no two members are
    adjacent, and every non-member has a member neighbor (maximality).
    The anchor-selection primitive: pick a set of mutually
    non-adjacent "representative" nodes (e.g. one anchor per dense
    KG neighborhood) in O(log n) rounds.

    Priorities are md5-derived (pri = md5_u32(node), total order via
    the (pri, node) pair so hash collisions cannot stall a round) —
    deterministic on any cluster size / replay, and distributionally
    random, which is what gives Luby its O(log n) expected rounds. A
    node enters the MIS when its key is a strict local minimum among
    LIVE neighbors (isolated live nodes enter trivially); its
    neighbors are knocked out; the graph shrinks and repeats.

    100 TB shape: per round one edge⋈key equi-join + one
    map-side-combined min agg (the local-minimum test), then two
    semi/anti-joins to peel winners + losers from the live edge set.
    One driver action (live count) per round; localCheckpoint per
    round keeps lineage flat. Direction ignored, self-loops dropped
    (a self-loop would make its node its own neighbor and
    independence vacuous).
    """
    sym = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    sym = (
        sym.unionAll(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates()
        .localCheckpoint()
    )
    key = lambda c: F.struct(  # noqa: E731
        F.conv(F.substring(F.md5(F.col(c)), 1, 8), 16, 10)
        .cast("long")
        .alias("pri"),
        F.col(c).alias("n"),
    )
    live = (
        sym.select(F.col("u").alias("node_id"))
        .distinct()
        .localCheckpoint()
    )
    ecur = sym
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "node_id string, mis_round int")
    for r in range(max_rounds):
        if live.count() == 0:
            return mis
        # min neighbor key per live node (nodes absent from ecur have
        # no live neighbors -> trivially local-minimal)
        nbr_min = (
            ecur.select(F.col("u").alias("node_id"), key("v").alias("k"))
            .groupBy("node_id")
            .agg(F.min("k").alias("nbr_min"))
        )
        winners = (
            live.join(nbr_min, "node_id", "left")
            .filter(
                F.col("nbr_min").isNull()
                | (key("node_id") < F.col("nbr_min"))
            )
            .select("node_id")
            .localCheckpoint()
        )
        mis = mis.unionByName(
            winners.withColumn("mis_round", F.lit(r))
        ).localCheckpoint()
        knocked = (
            ecur.join(
                winners.withColumnRenamed("node_id", "u"), "u", "left_semi"
            )
            .select(F.col("v").alias("node_id"))
            .distinct()
        )
        dead = winners.unionByName(knocked).localCheckpoint()
        live = live.join(dead, "node_id", "left_anti").localCheckpoint()
        ecur = (
            ecur.join(
                dead.withColumnRenamed("node_id", "u"), "u", "left_anti"
            )
            .join(dead.withColumnRenamed("node_id", "v"), "v", "left_anti")
            .localCheckpoint()
        )
    raise RuntimeError(
        f"maximal_independent_set failed to settle in {max_rounds} rounds"
    )


def temporal_reachability(
    edges: DataFrame,
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    ts: str = "ts",
    max_hops: int = 20,
    strict: bool = True,
    start_micro: int = None,
) -> DataFrame:
    """Earliest-arrival time-respecting reachability (Wu et al.,
    "Path Problems in Temporal Graphs", VLDB 2014): from the seed
    set, a temporal path may only continue along an edge whose
    timestamp is later than the current arrival (``strict=True``;
    ``>=`` otherwise) — the information-flow semantics of a
    transcript-derived KG ("who could have learned X, and by when"),
    which static reachability over-approximates badly.

    Returns (node_id, arrival_micro); seeds carry ``start_micro``
    (default: long-min/4, i.e. "always known"). Timestamp columns
    are normalized to integer epoch-micros (unix_micros for
    timestamp-typed columns — pin the session to UTC, the repo-wide
    rule), so min() is exact and partitioning-independent.

    Greedy earliest-arrival is EXACT here: a smaller arrival at u
    permits a superset of outgoing edges, so relaxing from per-node
    minima loses nothing — the fixpoint equals the true minimum over
    all temporal paths, and the DuckDB twin can independently
    ENUMERATE temporal walks and take min(arrival) (an
    algorithm-independent equality, valid once both sides converge).

    100 TB shape: identical to :func:`sssp_distances` — per round one
    frontier⋈adjacency equi-join (filtered by the time gate) + one
    map-side-combined min-agg + one full-outer state merge on
    node_id; one driver action per round; arrivals only decrease so
    ``max_hops`` bounds rounds and an empty frontier certifies the
    TRUE unbounded fixpoint.
    """
    if not seeds:
        raise ValueError("need at least one seed")
    if len(set(seeds)) != len(seeds):
        raise ValueError("duplicate seeds")
    if max_hops < 0:
        raise ValueError(f"need max_hops >= 0, got {max_hops}")
    spark = edges.sparkSession
    if start_micro is None:
        start_micro = -(1 << 61)
    tcol = F.col(ts)
    if dict(edges.dtypes).get(ts, "").startswith("timestamp"):
        tcol = F.unix_micros(tcol.cast("timestamp"))
    else:
        tcol = tcol.cast("long")
    adj = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
            F.when(
                F.assert_true(
                    tcol.isNotNull(),
                    F.lit("temporal_reachability: timestamps must be non-null"),
                ).isNull(),
                tcol,
            ).alias("t"),
        )
        .filter(F.col("u") != F.col("v"))
        # parallel temporal edges all matter in general, but for
        # EARLIEST arrival only the soonest-usable one does per
        # (u, v): keep them all — the time gate needs every t
        .dropDuplicates()
        .localCheckpoint()
    )
    frontier = (
        spark.createDataFrame([(str(s),) for s in seeds], ["node_id"])
        .withColumn("arrival_micro", F.lit(start_micro).cast("long"))
        .localCheckpoint()
    )
    state = frontier
    gate = (
        (F.col("t") > F.col("arrival_micro"))
        if strict
        else (F.col("t") >= F.col("arrival_micro"))
    )
    for _ in range(max_hops):
        relaxed = (
            frontier.join(adj, frontier.node_id == adj.u)
            .filter(gate)
            .select(F.col("v").alias("node_id"), F.col("t").alias("cand"))
            .groupBy("node_id")
            .agg(F.min("cand").alias("cand"))
        )
        merged = (
            state.join(relaxed, "node_id", "full_outer")
            .select(
                "node_id",
                F.col("arrival_micro"),
                F.col("cand"),
                (
                    F.col("cand").isNotNull()
                    & (
                        F.col("arrival_micro").isNull()
                        | (F.col("cand") < F.col("arrival_micro"))
                    )
                ).alias("_improved"),
            )
            .localCheckpoint()
        )
        frontier = merged.filter(F.col("_improved")).select(
            "node_id", F.col("cand").alias("arrival_micro")
        )
        state = merged.select(
            "node_id",
            F.when(F.col("_improved"), F.col("cand"))
            .otherwise(F.col("arrival_micro"))
            .alias("arrival_micro"),
        )
        if merged.filter(F.col("_improved")).count() == 0:
            break
    return state


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
) -> DataFrame:
    """k-truss of the undirected simple graph (Cohen 2008): the
    maximal subgraph where EVERY edge closes >= k-2 triangles inside
    the subgraph — edge-level cohesion, strictly stronger than the
    k-core's degree test (a k-truss is always inside the (k-1)-core),
    and the standard "relationship is corroborated by common
    neighbors" filter for denoising co-occurrence KGs.

    Peeling fixpoint: per round, count each edge's triangle support
    with the same degree-ordered compact-forward enumeration as
    :func:`triangle_count` (each triangle found once at its
    minimum-order corner, every task's wedge fan-out bounded by
    O(sqrt(m)) regardless of hub skew), then drop edges with support
    < k-2 and repeat until stable. Returns the surviving canonical
    edge set with its in-truss support: (src, dst, support).

    100 TB shape: per round three hash shuffles (degree agg, wedge
    join, closure join) + one support agg — all map-side combinable;
    one driver action (the dropped-edge count); localCheckpoint per
    round. Cascades can be long in theory (max_rounds guards,
    RAISING rather than returning a non-truss — the SCC discipline);
    in co-occurrence graphs support collapses in a few rounds.
    """
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    cur = (
        edges.select(
            F.least(F.col(src).cast("string"), F.col(dst).cast("string"))
            .alias("a"),
            F.greatest(F.col(src).cast("string"), F.col(dst).cast("string"))
            .alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionAll(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        da, db = deg.alias("da"), deg.alias("db")
        with_deg = (
            cur.join(da, F.col("a") == F.col("da.n"))
            .join(db, F.col("b") == F.col("db.n"))
            .select(
                "a", "b", F.col("da.d").alias("d_a"), F.col("db.d").alias("d_b")
            )
        )
        lower_first = (F.col("d_a") < F.col("d_b")) | (
            (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
        )
        oriented = with_deg.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("d_b")).otherwise(F.col("d_a")).alias("d_v"),
        ).localCheckpoint()
        e1, e2 = oriented.alias("e1"), oriented.alias("e2")
        order_lt = (F.col("e1.d_v") < F.col("e2.d_v")) | (
            (F.col("e1.d_v") == F.col("e2.d_v"))
            & (F.col("e1.v") < F.col("e2.v"))
        )
        tris = (
            e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & order_lt)
            .select(
                F.col("e1.u").alias("w"),
                F.col("e1.v").alias("x"),
                F.col("e2.v").alias("y"),
            )
            .join(
                oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
                ["x", "y"],
                "left_semi",
            )
        )
        side = lambda p, q: tris.select(  # noqa: E731
            F.least(p, q).alias("a"), F.greatest(p, q).alias("b")
        )
        support = (
            side(F.col("w"), F.col("x"))
            .unionAll(side(F.col("w"), F.col("y")))
            .unionAll(side(F.col("x"), F.col("y")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        scored = (
            cur.join(support, ["a", "b"], "left")
            .withColumn("support", F.coalesce("support", F.lit(0)))
            .localCheckpoint()
        )
        kept = scored.filter(F.col("support") >= k - 2)
        # one driver action per round: the dropped count doubles as
        # the termination test (scored is checkpointed, so the second
        # filter re-reads cached rows, not the plan)
        if scored.filter(F.col("support") < k - 2).count() == 0:
            return kept.select(
                F.col("a").alias("src"), F.col("b").alias("dst"), "support"
            )
        cur = kept.select("a", "b").localCheckpoint()
    raise RuntimeError(f"k_truss failed to settle in {max_rounds} rounds")


def wl_labels(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Weisfeiler-Lehman iterative relabeling (the 1-WL color
    refinement; Shervashidze et al., JMLR 2011) over the undirected
    simple graph: every node's label is repeatedly rehashed with the
    SORTED multiset of its neighbors' labels, so after r rounds equal
    labels certify equal r-hop structural neighborhoods — the
    structural-role signature (two entities "shaped alike" in the KG
    get the same label) and the standard graph-isomorphism screen.

    Returns (node_id, round, label) for rounds 0..``rounds`` with
    round-0 labels = the node's degree (pure structure, no ids leak
    into the hash). Labels are 16-hex-char md5 prefixes — engine-
    portable (DuckDB md5 agrees), deterministic on any partitioning.

    100 TB shape: per round ONE edge⋈label equi-join + ONE
    map-side-combinable groupBy(node) with an in-agg sort of the
    neighbor-label list (task cost O(d log d) per node — hubs sort
    within one task, the random_walks adjacency caveat) + one hash
    map. localCheckpoint per round; no driver actions at all —
    ``rounds`` is data-independent by definition of WL.
    """
    if rounds < 0:
        raise ValueError(f"need rounds >= 0, got {rounds}")
    sym = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    sym = (
        sym.unionAll(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates()
        .localCheckpoint()
    )
    labels = (
        sym.groupBy(F.col("u").alias("node_id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("node_id", F.col("deg").cast("string").alias("label"))
        .localCheckpoint()
    )
    out = labels.withColumn("round", F.lit(0))
    for r in range(1, rounds + 1):
        nbr = sym.join(
            labels.withColumnRenamed("node_id", "v"), "v"
        ).select(F.col("u").alias("node_id"), F.col("label").alias("nl"))
        labels = (
            labels.join(
                nbr.groupBy("node_id").agg(
                    F.sort_array(F.collect_list("nl")).alias("nls")
                ),
                "node_id",
            )
            .select(
                "node_id",
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f", F.col("label"), F.concat_ws(",", "nls")
                        )
                    ),
                    1, 16,
                ).alias("label"),
            )
            .localCheckpoint()
        )
        out = out.unionByName(labels.withColumn("round", F.lit(r)))
    return out.select("node_id", "round", "label")


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
    simple graph: authority(v) accumulates hub mass over in-edges,
    hub(u) accumulates authority mass over out-edges — the
    two-sided salience signal PageRank's single score conflates
    (in a KG: prolific SOURCES of facts vs entities facts point AT).

    Integer discipline (the pagerank pattern): scores live in micro
    units; after every half-step the vector renormalizes by its MAX
    via trunc division (L-inf norm — power iteration converges to the
    same principal direction under any norm, and max-normalization
    needs no sqrt), computed as a 1-row broadcast crossJoin, so the
    whole loop has NO driver actions and the pure-Python oracle
    (oracle/precompute.hits_py) reproduces every score bit-for-bit.
    Self-loops are dropped; duplicate edges collapse.

    Returns (node_id, hub_micro, auth_micro) after ``iterations``
    full (authority, hub) rounds; nodes with no in-edges hold
    authority 0, no out-edges hub 0 — sinks/sources stay in the
    output.

    100 TB shape: per half-step one edge⋈score equi-join (hot nodes =
    AQE skew-join) + one map-side-combined sum + the 1-row max
    broadcast; localCheckpoint per round keeps lineage flat. int64
    headroom: scores <= 1e6 and degree sums stay exact past 1e12
    in-edges per node.
    """
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    pairs = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint()
    )
    nodes = (
        pairs.select(F.col("u").alias("node_id"))
        .union(pairs.select(F.col("v").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    state = nodes.select(
        "node_id",
        F.lit(MICRO).cast("long").alias("h"),
        F.lit(MICRO).cast("long").alias("a"),
    ).localCheckpoint()

    def _norm(df: DataFrame, col: str) -> DataFrame:
        mx = df.agg(
            F.greatest(F.lit(1).cast("long"), F.max(col)).alias("_mx")
        )
        return df.crossJoin(F.broadcast(mx)).select(
            *[c for c in df.columns if c != col],
            F.expr(f"({col} * 1000000) div _mx").alias(col),
        )

    for _ in range(iterations):
        a_new = (
            pairs.join(
                state.select(F.col("node_id").alias("u"), "h"), "u"
            )
            .groupBy(F.col("v").alias("node_id"))
            .agg(F.sum("h").alias("a"))
        )
        state = _norm(
            state.drop("a").join(a_new, "node_id", "left").select(
                "node_id", "h", F.coalesce("a", F.lit(0)).alias("a")
            ),
            "a",
        ).localCheckpoint()
        h_new = (
            pairs.join(
                state.select(F.col("node_id").alias("v"), "a"), "v"
            )
            .groupBy(F.col("u").alias("node_id"))
            .agg(F.sum("a").alias("h"))
        )
        state = _norm(
            state.drop("h").join(h_new, "node_id", "left").select(
                "node_id", "a", F.coalesce("h", F.lit(0)).alias("h")
            ),
            "h",
        ).localCheckpoint()
    return state.select(
        "node_id",
        F.col("h").cast("long").alias("hub_micro"),
        F.col("a").cast("long").alias("auth_micro"),
    )


def densest_subgraph(
    edges: DataFrame,
    eps_ppm: int = 100_000,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
) -> DataFrame:
    """Greedy densest subgraph (Bahmani, Kumar & Vassilvitskii,
    "Densest Subgraph in Streaming and MapReduce", VLDB 2012): peel
    every node whose degree is <= 2(1+eps) times the current density
    rho = |E(S)|/|S|, keep the best-density snapshot — a
    2(1+eps)-approximation in O(log n / eps) rounds, and THE
    community-core extractor for a noisy co-occurrence KG (the
    densest region is where the corpus actually talks).

    Returns the best snapshot's nodes: (node_id, density_ppm,
    n_nodes, n_edges, found_round) — density_ppm = trunc(1e6*E/S),
    identical on every row. All comparisons integer: the peel test is
    deg * n * 1e6 <= 2 * e * (1e6 + eps_ppm) in decimal(38,0)
    (deg*n*1e6 overflows int64 at ~3e3 density x 1e9 nodes), so the
    pure-Python oracle (oracle/precompute.densest_py) replays the
    peeling exactly.

    100 TB shape: per round one degree agg + one broadcast of the two
    scalars + one anti-join peel; the average-degree argument
    guarantees >= 1 node peels per round, and (1+eps) shrinkage
    bounds rounds logarithmically. One driver action per round (the
    combined |E|,|S| agg).
    """
    if eps_ppm < 0:
        raise ValueError(f"need eps_ppm >= 0, got {eps_ppm}")
    canon = (
        edges.select(
            F.col(src).cast("string").alias("a"),
            F.col(dst).cast("string").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    live = (
        canon.select(F.col("lo").alias("node_id"))
        .union(canon.select(F.col("hi").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    ecur = canon
    best = None  # (density_ppm, nodes_df, n_nodes, n_edges, round)
    for r in range(max_rounds):
        counts = live.agg(F.count(F.lit(1)).alias("n")).crossJoin(
            ecur.agg(F.count(F.lit(1)).alias("e"))
        ).collect()[0]
        n_s, e_s = int(counts["n"]), int(counts["e"])
        if n_s == 0:
            break
        density = (e_s * MICRO) // n_s
        if best is None or density > best[0]:
            best = (density, live, n_s, e_s, r)
        if e_s == 0:
            break
        deg = (
            ecur.select(F.col("lo").alias("node_id"))
            .unionAll(ecur.select(F.col("hi").alias("node_id")))
            .groupBy("node_id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # peel deg <= 2(1+eps)rho, in decimal; isolated nodes (absent
        # from deg) peel unconditionally (deg 0)
        thresh = 2 * e_s * (MICRO + eps_ppm)
        keep = (
            live.join(deg, "node_id", "left")
            .filter(
                F.coalesce("deg", F.lit(0)).cast("decimal(38,0)")
                * F.lit(n_s).cast("decimal(38,0)")
                * F.lit(MICRO).cast("decimal(38,0)")
                > F.lit(thresh).cast("decimal(38,0)")
            )
            .select("node_id")
            .localCheckpoint()
        )
        live = keep
        ecur = (
            ecur.join(keep.withColumnRenamed("node_id", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("node_id", "hi"), "hi", "left_semi")
            .localCheckpoint()
        )
    if best is None:
        raise ValueError("densest_subgraph: empty graph")
    density, nodes, n_nodes, n_edges, r = best
    return nodes.select(
        "node_id",
        F.lit(density).cast("long").alias("density_ppm"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(r).cast("int").alias("found_round"),
    )


def greedy_coloring(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_colors: int = 64,
) -> DataFrame:
    """Conflict-free color classes via iterated MIS (the classic
    Luby reduction: color c = a maximal independent set of the
    residual graph): (node_id, color) with NO edge joining two
    same-color nodes, colors 0-based and every class maximal in its
    residual — the batch scheduler for conflicting updates (merge
    canonical groups / apply edge rewrites in waves that cannot
    race), bounded by max-degree + 1 classes.

    Determinism is inherited wholesale from
    :func:`maximal_independent_set`'s (md5, node) priorities, so the
    pure-Python oracle (oracle/precompute.coloring_py) replays the
    exact class assignment. RAISES if the graph is not exhausted
    within ``max_colors`` classes (degree > max_colors territory —
    the caller should know, not receive a partial coloring).

    100 TB shape: each color class costs one MIS run on the residual
    graph (the peel-family round shape); the residual shrinks by the
    class plus nothing else, so total work is sum over classes of the
    live edge set — worst case Delta passes, in practice few (random
    priorities 3-color most sparse graphs).
    """
    if max_colors < 1:
        raise ValueError(f"need max_colors >= 1, got {max_colors}")
    sym = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    sym = (
        sym.unionAll(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node_id string, color int")
    live_edges = sym
    live_nodes = sym.select(F.col("u").alias("node_id")).distinct().localCheckpoint()
    for color in range(max_colors):
        if live_nodes.count() == 0:
            return out
        # isolated residual nodes all join this class (MIS of an
        # empty graph is everything)
        mis = (
            maximal_independent_set(
                live_edges.select(
                    F.col("u").alias("src"), F.col("v").alias("dst")
                )
            ).select("node_id")
            if live_edges.count() > 0
            else live_nodes
        )
        # nodes isolated in the residual are absent from live_edges
        # but still colorable now: no live neighbor can conflict
        in_edges = live_edges.select(F.col("u").alias("node_id")).distinct()
        isolated = live_nodes.join(in_edges, "node_id", "left_anti")
        cls = mis.unionByName(isolated).dropDuplicates().localCheckpoint()
        out = out.unionByName(
            cls.withColumn("color", F.lit(color))
        ).localCheckpoint()
        live_nodes = live_nodes.join(cls, "node_id", "left_anti").localCheckpoint()
        live_edges = (
            live_edges.join(
                cls.withColumnRenamed("node_id", "u"), "u", "left_anti"
            )
            .join(cls.withColumnRenamed("node_id", "v"), "v", "left_anti")
            .localCheckpoint()
        )
    if live_nodes.count() == 0:
        return out
    raise RuntimeError(
        f"greedy_coloring did not exhaust the graph in {max_colors} colors"
    )


def pagerank_weighted(
    edges: DataFrame,
    weight: str = "weight",
    iterations: int = 10,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Weighted PageRank: (node_id, rank_micro), where a node's rank
    flows to its out-neighbors PROPORTIONALLY to edge weight —
    the salience signal for weighted co-occurrence KGs, where an
    entity mentioned with another 500 times should pull more rank
    across that edge than a once-seen pairing.

    Exact recurrence (both engines, trunc division per edge):

        share(u->v) = (r(u) * w_uv) div w_out(u)
        inbound(v)  = sum of share(u->v)
        r'(v)       = teleport + (damping * (inbound + dang div N)) div 100

    Weights must be POSITIVE integers (in-plan assert, the sssp
    guard); duplicate (src, dst) rows collapse by SUMMING weights
    (parallel edges add pull). int64 headroom: r <= ~2e6 micro, so
    keep weights below ~1e12 — co-occurrence counts are fine.

    Deviation from :func:`pagerank`'s shape: the per-edge trunc
    means shares are computed in the edge join, not as a narrow
    state map — still exactly ONE edge-sized exchange per iteration;
    the edge list is pre-partitioned by src once and pinned (the
    _pin_pairs discipline).
    """
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"need 0 < damping_pct < 100, got {damping_pct}")
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pairs = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.when(
                F.assert_true(
                    F.col(weight).isNotNull() & (F.col(weight) > 0),
                    F.lit("pagerank_weighted: weights must be positive"),
                ).isNull(),
                F.col(weight).cast("long"),
            ).alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .repartition(p, F.col("u"))
        .persist()
    )
    w_out = pairs.groupBy(F.col("u").alias("node_id")).agg(
        F.sum("w").alias("w_out")
    )
    nodes = (
        pairs.select(F.col("u").alias("node_id"))
        .union(pairs.select(F.col("v").alias("node_id")))
        .distinct()
    )
    state = (
        nodes.join(w_out, "node_id", "left")
        .repartition(p, F.col("node_id"))
        .select("node_id", "w_out", F.lit(MICRO).cast("long").alias("r"))
        .localCheckpoint()
    )
    n = state.count()
    if n == 0:
        pairs.unpersist()
        return state.select(
            "node_id", F.lit(0).cast("long").alias("rank_micro")
        )
    teleport = ((100 - damping_pct) * MICRO) // 100
    for _ in range(iterations):
        srcs = state.filter(F.col("w_out").isNotNull()).select(
            F.col("node_id").alias("u"), "r", "w_out"
        )
        contrib = (
            pairs.join(srcs, "u")
            .groupBy(F.col("v").alias("node_id"))
            .agg(F.sum(F.expr("(r * w) div w_out")).alias("inbound"))
        )
        dang = state.filter(F.col("w_out").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang")
        )
        state = (
            state.select("node_id", "w_out")
            .join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node_id",
                "w_out",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(inbound, 0L)"
                        f" + dang div {n})) div 100"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    pairs.unpersist()
    return state.select("node_id", F.col("r").alias("rank_micro"))


def bipartite_projection(
    edges: DataFrame,
    min_shared: int = 2,
    left: str = "src",
    right: str = "dst",
) -> DataFrame:
    """One-mode projection of a bipartite relation: left entities
    sharing >= ``min_shared`` distinct right neighbors become an edge
    (a, b, n_shared) with a < b — THE co-occurrence-graph constructor
    (suppliers sharing orders, entities sharing chunks, tools sharing
    conversations) that a dozen engine queries spell inline.

    100 TB shape: one self-equi-join on the RIGHT key (fan-out =
    right-side degree squared — hot right keys are the skew hazard;
    cap them upstream with a df_cap-style filter when the right side
    is Zipfian) + one map-side-combined distinct count. The
    min_shared gate prunes the long tail AFTER counting — the count
    is exact, the gate is the graph-density knob every downstream
    operator here takes.
    """
    if min_shared < 1:
        raise ValueError(f"need min_shared >= 1, got {min_shared}")
    base = edges.select(
        F.col(left).alias("l"), F.col(right).alias("r")
    ).dropDuplicates()
    x, y = base.alias("x"), base.alias("y")
    return (
        x.join(
            y,
            (F.col("x.r") == F.col("y.r")) & (F.col("x.l") < F.col("y.l")),
        )
        .groupBy(
            F.col("x.l").alias("a"), F.col("y.l").alias("b")
        )
        .agg(F.countDistinct("x.r").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002) of the
    undirected simple graph, ONE row: (n_edges, s1, s2, s3, r_ppm) —
    the Pearson correlation of endpoint degrees across edges, the
    one-number answer to "do hubs attach to hubs?" (social KGs:
    positive; technological/co-occurrence: typically negative, hubs
    surrounded by leaves — which decides whether hub-salting is a
    head-of-distribution fix or a everywhere fix).

    Exact integer form: with per-edge endpoint degrees j, k and
    S1 = sum(j + k), S2 = sum(j^2 + k^2), S3 = sum(j*k) over the M
    canonical edges, Newman's r multiplies out to

        r = (4*M*S3 - S1^2) / (2*M*S2 - S1^2)

    computed in decimal(38,0) (S2 <= M * n^2 overflows int64 early),
    r_ppm = numerator * 1e6 div denominator — a SIGNED trunc division,
    identical on Spark `div` and DuckDB HUGEINT `//` (both truncate
    toward zero, verified). NULL r_ppm when the graph is
    degree-regular (zero variance denominator).

    100 TB shape: one dedup shuffle, one degree agg, two degree joins,
    one 1-row agg. Nothing iterative.
    """
    canon = (
        edges.select(
            F.col(src).cast("string").alias("a"),
            F.col(dst).cast("string").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("lo").alias("n"))
        .unionAll(canon.select(F.col("hi").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("d"))
    )
    sums = (
        canon.join(deg.withColumnRenamed("n", "lo"), "lo")
        .withColumnRenamed("d", "dj")
        .join(
            deg.withColumnRenamed("n", "hi").withColumnRenamed("d", "dk"),
            "hi",
        )
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
            F.sum(F.col("dj") + F.col("dk")).cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("dj") * F.col("dj") + F.col("dk") * F.col("dk"))
            .cast("decimal(38,0)")
            .alias("s2"),
            F.sum(F.col("dj") * F.col("dk")).cast("decimal(38,0)").alias("s3"),
        )
    )
    return sums.select(
        F.col("m").cast("long").alias("n_edges"),
        F.col("s1").cast("long").alias("s1"),
        F.col("s2").cast("long").alias("s2"),
        F.col("s3").cast("long").alias("s3"),
        F.when(
            (F.lit(2).cast("decimal(38,0)") * F.col("m") * F.col("s2")
             - F.col("s1") * F.col("s1")) != 0,
            F.expr(
                "CAST((4 * m * s3 - s1 * s1) * 1000000 div "
                "(2 * m * s2 - s1 * s1) AS LONG)"
            ),
        ).alias("r_ppm"),
    )


def condense(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node_id",
    label: str = "scc_id",
) -> DataFrame:
    """Condensation: rewrite each directed edge onto its endpoints'
    component labels and drop intra-component edges — with SCC labels
    this is THE classic construction of the component DAG (always
    acyclic), the cycle-free dependency view of a directed KG.
    Returns distinct (src, dst) label pairs.

    Endpoints missing a label raise in-plan (the modularity guard) —
    a silently dropped edge would fake acyclicity downstream.

    100 TB shape: two node-keyed equi-joins + one dedup shuffle;
    output is component-sized.
    """
    lab = labels.select(
        F.col(node).cast("string").alias("_n"),
        F.col(label).cast("string").alias("_l"),
    ).dropDuplicates(["_n"])
    guard = lambda c: F.when(  # noqa: E731
        F.assert_true(
            F.col(c).isNotNull(),
            F.lit("condense: every endpoint needs a label"),
        ).isNull(),
        F.col(c),
    )
    return (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .join(lab.withColumnRenamed("_n", "u"), "u", "left")
        .withColumnRenamed("_l", "lu")
        .join(
            lab.withColumnRenamed("_n", "v").withColumnRenamed("_l", "lv"),
            "v",
            "left",
        )
        .select(guard("lu").alias("src"), guard("lv").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def topo_layers(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 100,
) -> DataFrame:
    """Topological layering of a DAG: (node_id, layer) with layer =
    length of the LONGEST incoming path (sources at 0) — the
    dependency-wave schedule (everything in layer k depends only on
    layers < k, so waves execute in parallel), and the natural
    ordering for applying condensed-KG updates.

    Kahn-style peeling: per round, emit nodes whose unresolved
    in-degree is zero, remove them, repeat. RAISES if anything
    remains after ``max_depth`` rounds OR if no node peels in a round
    (both certify a cycle — a partial layering would silently
    misorder downstream work; run :func:`condense` over
    strongly_connected_components first).

    100 TB shape: per round one anti-join (live edges vs resolved
    sources) + one in-degree agg + one driver action; rounds = the
    DAG's longest path, bounded by ``max_depth``.
    """
    if max_depth < 1:
        raise ValueError(f"need max_depth >= 1, got {max_depth}")
    pairs = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint()
    )
    live_nodes = (
        pairs.select(F.col("u").alias("node_id"))
        .union(pairs.select(F.col("v").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    live_edges = pairs
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node_id string, layer int")
    for layer in range(max_depth):
        if live_nodes.count() == 0:
            return out
        with_in = live_edges.select(F.col("v").alias("node_id")).distinct()
        zero_in = live_nodes.join(with_in, "node_id", "left_anti").localCheckpoint()
        # no progress on a non-empty residual == a cycle; raise loudly
        # (in-plan assert would not see the empty frame)
        if zero_in.count() == 0:
            raise ValueError(
                "topo_layers: cycle detected — condense() the graph "
                "over its strongly connected components first"
            )
        out = out.unionByName(
            zero_in.withColumn("layer", F.lit(layer))
        ).localCheckpoint()
        live_nodes = live_nodes.join(zero_in, "node_id", "left_anti").localCheckpoint()
        live_edges = live_edges.join(
            zero_in.withColumnRenamed("node_id", "u"), "u", "left_anti"
        ).localCheckpoint()
    if live_nodes.count() == 0:
        return out
    raise RuntimeError(
        f"topo_layers did not settle in {max_depth} rounds"
    )


def pathsim(
    instances: DataFrame,
    a: str = "a",
    mid: str = "mid",
    n: str = "n",
    min_sim_ppm: int = 0,
) -> DataFrame:
    """PathSim meta-path similarity (Sun et al., VLDB 2011):
    s(x, y) = 2*m_xy / (m_xx + m_yy) over a SYMMETRIC meta-path,
    where m_xy = sum over mid of n_x(mid) * n_y(mid) counts the
    path instances between x and y — the heterogeneous-KG peer
    similarity ("customers structurally alike through their
    order->supplier profile") that plain co-occurrence overstates
    for high-degree nodes (the normalization by self-instances is
    the point of the measure).

    Input is the HALF-path instance table (a, mid, n) — fold any
    meta-path prefix into it with ordinary joins + count aggs (each
    hop: join + groupBy sum, the kge/linking shapes); this operator
    closes the path with its own mirror. Returns
    (a, b, m_ab, m_aa, m_bb, pathsim_ppm) for a < b, m_ab > 0, and
    pathsim_ppm >= ``min_sim_ppm``; instance products are summed in
    decimal(38,0) (1e6-instance hubs square past int64), the ppm is
    a trunc division.

    100 TB shape: ONE mid-keyed self-join (fan-out = per-mid
    instance-row count squared — hot mids are the df_cap-style skew
    case: cap or drop promiscuous mids upstream, exactly like the
    inverted-index family) + map-side-combined pair and diagonal
    aggs.
    """
    if not (0 <= min_sim_ppm <= 1_000_000):
        raise ValueError(f"need 0 <= min_sim_ppm <= 1e6: {min_sim_ppm}")
    inst = (
        instances.select(
            F.col(a).cast("string").alias("x"),
            F.col(mid).cast("string").alias("m"),
            F.col(n).cast("long").alias("cnt"),
        )
        .groupBy("x", "m")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()  # self-joined + diagonal agg
    )
    diag = inst.groupBy(F.col("x")).agg(
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("m_self")
    )
    l, r = inst.alias("l"), inst.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.m") == F.col("r.m")) & (F.col("l.x") < F.col("r.x")),
        )
        .groupBy(F.col("l.x").alias("pa"), F.col("r.x").alias("pb"))
        .agg(
            F.sum(
                F.col("l.cnt").cast("decimal(38,0)")
                * F.col("r.cnt").cast("decimal(38,0)")
            ).cast("decimal(38,0)").alias("m_ab")
        )
    )
    return (
        pairs.join(diag.withColumnRenamed("x", "pa"), "pa")
        .withColumnRenamed("m_self", "m_aa")
        .join(
            diag.withColumnRenamed("x", "pb").withColumnRenamed(
                "m_self", "m_bb"
            ),
            "pb",
        )
        .select(
            F.col("pa").alias("a"),
            F.col("pb").alias("b"),
            F.col("m_ab").cast("long").alias("m_ab"),
            F.col("m_aa").cast("long").alias("m_aa"),
            F.col("m_bb").cast("long").alias("m_bb"),
            F.expr(
                "CAST(2 * m_ab * 1000000 div (m_aa + m_bb) AS LONG)"
            ).alias("pathsim_ppm"),
        )
        .filter(F.col("pathsim_ppm") >= min_sim_ppm)
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient (Watts & Strogatz 1998):
    (node_id, degree, n_triangles, clustering_ppm) with
    clustering_ppm = trunc(1e6 * 2*T(v) / (deg(v)*(deg(v)-1))) — the
    node-level cohesion signal the corpus-wide census
    (:func:`triangle_count`) aggregates away: an entity whose
    neighbors all know each other is a community member; one whose
    neighbors don't is a bridge (and a salting candidate, since
    bridges stay hot under any partition).

    Degree-1 nodes report NULL (undefined, not a fake 0). Same
    degree-ordered compact-forward enumeration as triangle_count —
    every triangle found once, then exploded to its THREE corners for
    the per-node count; deg*(deg-1) is computed in decimal(38,0)
    (1e10-degree hubs square past int64).

    100 TB shape: triangle_count's three shuffles + one corner
    explode/agg (map-side combined) + one degree join.
    """
    und = (
        edges.select(
            F.least(F.col(src).cast("string"), F.col(dst).cast("string"))
            .alias("a"),
            F.greatest(F.col(src).cast("string"), F.col(dst).cast("string"))
            .alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    with_deg = (
        und.join(da, F.col("a") == F.col("da.n"))
        .join(db, F.col("b") == F.col("db.n"))
        .select("a", "b", F.col("da.d").alias("d_a"), F.col("db.d").alias("d_b"))
    )
    lower_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("d_b")).otherwise(F.col("d_a")).alias("d_v"),
    ).localCheckpoint()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    order_lt = (F.col("e1.d_v") < F.col("e2.d_v")) | (
        (F.col("e1.d_v") == F.col("e2.d_v")) & (F.col("e1.v") < F.col("e2.v"))
    )
    tris = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & order_lt)
        .select(
            F.col("e1.u").alias("w"),
            F.col("e1.v").alias("x"),
            F.col("e2.v").alias("y"),
        )
        .join(
            oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
            ["x", "y"],
            "left_semi",
        )
    )
    corners = (
        tris.select(F.explode(F.array("w", "x", "y")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.select(F.col("n").alias("node_id"), F.col("d").alias("degree"))
        .join(corners, "node_id", "left")
        .select(
            "node_id",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "CAST(2 * coalesce(n_triangles, 0) * 1000000 div "
                    "(CAST(degree AS decimal(38,0)) * (degree - 1)) AS LONG)"
                ),
            ).alias("clustering_ppm"),
        )
    )


def betweenness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_pivots: int = 32,
    max_depth: int = 10,
) -> DataFrame:
    """Pivot-sampled Brandes betweenness centrality over the undirected
    simple graph underlying ``edges`` — the brokerage score the
    degree/PageRank family cannot see (a low-degree node bridging two
    dense KG neighborhoods routes every cross-community shortest path;
    reference users read exactly this off their graph DB's centrality
    plugin, networkx_db.py holds the whole graph in one process to do
    it).

    Estimator (Brandes 2001 accumulation; Brandes & Pich 2007 pivot
    sampling): from each of ``n_pivots`` sources run a level-
    synchronous BFS computing sigma (shortest-path counts), then
    accumulate dependencies backward level by level.  The estimate of
    C_B(v) at full scale is ``betweenness_micro / 1e6 * n / k`` — the
    raw pivot-summed dependency is returned (with ``n_pivots_used``)
    so the consumer applies the extrapolation; unreached and
    non-broker nodes appear with an honest 0.

    Determinism discipline (hash-exact vs the pure-Python replica
    precompute.betweenness_py):

    - pivots are the first k nodes under the total order
      ``(md5(node), node)`` — a uniform-but-deterministic sample, the
      md5-threshold trick from sampling.py; planned as one
      TakeOrderedAndProject (k-bounded, never a global sort),
    - sigma is an exact integer (sums of longs over the frontier),
    - dependency delta is held in integer MICRO units with the
      per-edge contribution floored BEFORE the sum —
      ``(sigma_pred * (1e6 + delta_succ)) div sigma_succ`` in
      DECIMAL(38,0) — so every aggregate is a sum of exact integers:
      partition- and order-independent, and the replica applies the
      IDENTICAL floor structure (documented deliberate quantization of
      the rational Brandes delta; error per edge < 1 micro-unit).

    100 TB shape: state is (pivot, node) keyed — k·n rows, all k BFS
    waves advance in the SAME per-round equi-join + map-side-combined
    groupBy (embarrassingly parallel across pivots, round count
    bounded by ``max_depth``); the backward pass replays the same
    joins in reverse level order. ``localCheckpoint`` per round keeps
    lineage flat. No driver action except the per-round emptiness
    count and the k-bounded pivot collect.
    """
    if n_pivots < 1:
        raise ValueError(f"need n_pivots >= 1, got {n_pivots}")
    if max_depth < 1:
        raise ValueError(f"need max_depth >= 1, got {max_depth}")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).localCheckpoint()
    nodes = sym.select(F.col("u").alias("node_id")).distinct().localCheckpoint()
    # deterministic pivot sample: first k nodes under (md5, node) —
    # TakeOrderedAndProject, k-bounded
    pivots = (
        nodes.orderBy(
            F.md5(F.col("node_id").cast("string")).asc(), F.col("node_id").asc()
        )
        .limit(n_pivots)
        .select(F.col("node_id").alias("s"))
        .localCheckpoint()
    )
    k_used = pivots.count()
    # ---- forward: level-synchronous multi-pivot BFS with path counts
    settled = pivots.select(
        "s",
        F.col("s").alias("v"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint()
    frontier = settled
    t_max = 0
    for t in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier.v == sym.u)
            .groupBy("s", sym.v.alias("w"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("w", "v")
            .join(settled.select("s", "v"), ["s", "v"], "left_anti")
            .withColumn("dist", F.lit(t))
            .select("s", "v", "dist", "sigma")
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        settled = settled.unionAll(nxt).localCheckpoint()
        frontier = nxt
        t_max = t
    # ---- backward: dependency accumulation, deepest level first.
    # delta(s, v) is determined entirely by level dist(v)+1 (BFS DAG
    # edges only cross adjacent levels), so each (s, v) is written by
    # exactly one round.
    delta = settled.limit(0).select(
        "s", "v", F.lit(0).cast("long").alias("delta_micro")
    ).localCheckpoint()
    for t in range(t_max, 0, -1):
        succ = (
            settled.filter(F.col("dist") == t)
            .join(delta, ["s", "v"], "left")
            .select(
                "s",
                "v",
                "sigma",
                F.coalesce("delta_micro", F.lit(0)).alias("d_succ"),
            )
        )
        contrib = (
            succ.join(sym, succ.v == sym.u)
            .select(
                "s",
                sym.v.alias("p"),
                F.col("sigma").alias("sigma_succ"),
                "d_succ",
            )
            .join(
                settled.filter(F.col("dist") == t - 1).select(
                    "s", F.col("v").alias("p"), F.col("sigma").alias("sigma_pred")
                ),
                ["s", "p"],
            )
            .select(
                "s",
                F.col("p").alias("v"),
                F.expr(
                    "CAST(sigma_pred AS DECIMAL(38,0)) * (1000000 + d_succ)"
                    " div sigma_succ"
                ).alias("c"),
            )
        )
        lvl = contrib.groupBy("s", "v").agg(
            F.sum("c").cast("long").alias("delta_micro")
        )
        delta = delta.unionAll(lvl).localCheckpoint()
    bc = (
        delta.filter(F.col("v") != F.col("s"))
        .groupBy(F.col("v").alias("node_id"))
        .agg(F.sum("delta_micro").alias("betweenness_micro"))
    )
    return (
        nodes.join(bc, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("betweenness_micro", F.lit(0)).cast("long").alias(
                "betweenness_micro"
            ),
            F.lit(k_used).cast("int").alias("n_pivots_used"),
        )
    )


def shortest_path(
    edges: DataFrame,
    source,
    target,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """ONE concrete shortest path between two nodes, as (step, node_id)
    rows — the "how are X and Y connected" explanation query behind
    every KG-RAG answer that cites a relation chain (the reference
    walks its graph DB for this; :func:`bfs_distances` answers only
    "how far").

    Path election is deterministic: the forward level-synchronous BFS
    records, for every node, the MINIMUM predecessor among its
    distance-minus-one neighbors (one map-side-combined min-agg per
    round — no float, no arbitrary first-writer race), and the path is
    the unique backward pred-chain from the target. The result is THE
    lexicographically-least shortest path read right-to-left, so any
    partitioning and any engine (the DuckDB twin re-derives dist via a
    recursive CTE, pred via the same min rule, and walks the same
    chain) produces identical rows.

    Unreachable-within-``max_depth`` targets yield an EMPTY frame (the
    honest answer for a bounded search); ``source == target`` yields
    the single step-0 row.

    100 TB shape: the forward pass is the :func:`bfs_distances` loop
    (frontier equi-join + min-agg per round, early exit the round the
    target settles — one scalar driver action per round); the backward
    walk is at most ``max_depth`` one-row broadcast joins, each a
    lookup into the settled state, never a corpus shuffle.
    """
    if max_depth < 0:
        raise ValueError(f"need max_depth >= 0, got {max_depth}")
    adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        adj = adj.unionAll(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    adj = adj.filter(F.col("u") != F.col("v")).dropDuplicates(
        ["u", "v"]
    ).localCheckpoint()
    node_t = adj.schema["u"].dataType
    spark = edges.sparkSession
    settled = spark.createDataFrame([(source,)], ["node_id"]).select(
        F.col("node_id").cast(node_t).alias("node_id"),
        F.lit(0).alias("dist"),
        F.lit(None).cast(node_t).alias("pred"),
    ).localCheckpoint()
    frontier = settled.select("node_id")
    d_target = 0 if source == target else None
    for t in range(1, max_depth + 1):
        if d_target is not None:
            break
        nxt = (
            frontier.join(adj, frontier.node_id == adj.u)
            .groupBy(F.col("v").alias("node_id"))
            .agg(F.min("u").alias("pred"))
            .join(settled.select("node_id"), ["node_id"], "left_anti")
            .select("node_id", F.lit(t).alias("dist"), "pred")
            .localCheckpoint()
        )
        hit = nxt.filter(F.col("node_id") == F.lit(target)).count()
        if hit:
            d_target = t
        elif nxt.count() == 0:
            break
        settled = settled.unionAll(nxt).localCheckpoint()
        frontier = nxt.select("node_id")
    out_schema = settled.select(
        F.col("dist").cast("int").alias("step"), "node_id"
    ).limit(0)
    if d_target is None:
        return out_schema
    cur = settled.filter(F.col("node_id") == F.lit(target))
    rows = cur.select(F.col("dist").cast("int").alias("step"), "node_id")
    for t in range(d_target, 0, -1):
        cur = (
            F.broadcast(cur.select(F.col("pred").alias("_want")))
            .join(settled, F.col("_want") == settled.node_id)
            .select("node_id", "dist", "pred")
        )
        rows = rows.unionAll(
            cur.select(F.col("dist").cast("int").alias("step"), "node_id")
        )
    return rows


def degree_concentration(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One-row hub-skew scorecard of the undirected simple graph — the
    quantified answer to the 100 TB question every join plan here
    hinges on: HOW concentrated is the degree mass (a Gini near 0 =
    uniform keys, shuffle freely; near 1 = a few hot entities carry
    the graph, salt or broadcast before joining on them). The
    measurement companion to the salting machinery in skew.py.

    Columns (all exact integers — no floats anywhere):

    - ``n_nodes``, ``n_edges``, ``max_degree``,
    - ``median_degree`` / ``p99_degree`` — degrees at ranks
      ceil(n/2) and ceil(0.99 n) of the ascending (degree, node)
      order,
    - ``gini_ppm`` — floor-ppm Gini of the degree distribution via
      the rank formula ``(2*sum(i*d_i) - (n+1)*sum(d)) * 1e6 div
      (n * sum(d))`` over ascending ranks (tie order cannot change
      the value: equal degrees contribute ``d * sum(rank range)``
      whatever their internal order),
    - ``top1pct_share_ppm`` — share of endpoint mass held by the
      top ceil(n/100) nodes.

    100 TB shape: one degree agg, then :func:`skew.global_rank` (two-
    phase range shuffle + broadcast prefix offsets — no
    SinglePartition on the node stream), then one map-side-combined
    global agg whose SinglePartition reduce sees per-partition PARTIAL
    rows only (the audited exemption). Products go through
    DECIMAL(38,0) so a billion-node sum cannot overflow.
    """
    from .skew import global_rank

    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("node")).unionAll(
            und.select(F.col("b").alias("node"))
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked, n = global_rank(deg, ["d", "node"], rank_col="i")
    if n == 0:
        return ranked.sparkSession.createDataFrame(
            [(0, 0, None, None, None, None, None)],
            "n_nodes long, n_edges long, max_degree long, "
            "median_degree long, p99_degree long, gini_ppm long, "
            "top1pct_share_ppm long",
        )
    med_rank = -(-n // 2)  # ceil(n/2), the documented contract
    p99_rank = -(-99 * n // 100)
    top_k = -(-n // 100)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(d) div 2").alias("n_edges"),
        F.max("d").alias("max_degree"),
        F.max(F.when(F.col("i") == med_rank, F.col("d"))).alias(
            "median_degree"
        ),
        F.max(F.when(F.col("i") == p99_rank, F.col("d"))).alias(
            "p99_degree"
        ),
        F.expr(
            "CAST((2 * sum(CAST(i AS DECIMAL(38,0)) * d)"
            f" - ({n} + 1) * sum(CAST(d AS DECIMAL(38,0))))"
            f" * 1000000 div ({n} * sum(CAST(d AS DECIMAL(38,0))))"
            " AS LONG)"
        ).alias("gini_ppm"),
        F.expr(
            f"CAST(sum(CASE WHEN i > {n} - {top_k} THEN"
            " CAST(d AS DECIMAL(38,0)) ELSE 0 END) * 1000000"
            " div sum(CAST(d AS DECIMAL(38,0))) AS LONG)"
        ).alias("top1pct_share_ppm"),
    )


def shortest_path_triples(
    triples: DataFrame,
    source,
    target,
    max_depth: int = 10,
    subj: str = "subj_name",
    rel: str = "pred",
    obj: str = "obj_name",
) -> DataFrame:
    """The relation-chain explanation: :func:`shortest_path` over the
    undirected name graph of ``triples``, with every hop labeled by
    ALL the predicates asserting it and the assertion direction —
    "Berlin ←LOCATED_IN— Warehouse 13 —STORES→ Crate 7" is the answer
    shape of the reference's graph-BFS Q&A tool (reference parity:
    functions/rag/graph_rag/tools/graph_search_tool.py:182 `get_bfs`
    and the BFS tool at :432, which walk the stored entity graph and
    render hop-labeled relation chains), and the citation a KG-RAG
    response stuffs next to a multi-hop claim.

    Output, one row per (hop, predicate) pair:

    (step, src_name, pred, dst_name, direction)

    with ``step`` the 0-based hop index from ``source``, src/dst in
    PATH orientation, and ``direction`` 'forward' when the triple was
    asserted (src, pred, dst), 'backward' when (dst, pred, src) —
    both emitted when both exist. The node chain is the deterministic
    lexicographically-least shortest path (see :func:`shortest_path`);
    ``source == target`` or an unreachable target yields an empty
    frame (a zero-hop path has no relations to explain).

    100 TB shape: the path is ≤ max_depth+1 rows — the hop frame is a
    broadcast side against ONE distinct-triple scan (two orientation
    legs of the same join, unioned); nothing here shuffles the corpus.
    """
    tri = triples.select(
        F.col(subj).alias("s"), F.col(rel).alias("p"), F.col(obj).alias("o")
    ).distinct()
    path = shortest_path(
        tri.select(F.col("s").alias("src"), F.col("o").alias("dst")),
        source,
        target,
        max_depth=max_depth,
    ).localCheckpoint()
    a, b = path.alias("a"), path.alias("b")
    hops = (
        a.join(b, F.col("b.step") == F.col("a.step") + 1)
        .select(
            F.col("a.step").alias("step"),
            F.col("a.node_id").alias("u"),
            F.col("b.node_id").alias("v"),
        )
    )
    fwd = (
        F.broadcast(hops)
        .join(tri, (F.col("s") == F.col("u")) & (F.col("o") == F.col("v")))
        .select(
            "step",
            F.col("u").alias("src_name"),
            F.col("p").alias("pred"),
            F.col("v").alias("dst_name"),
            F.lit("forward").alias("direction"),
        )
    )
    bwd = (
        F.broadcast(hops)
        .join(tri, (F.col("s") == F.col("v")) & (F.col("o") == F.col("u")))
        .select(
            "step",
            F.col("u").alias("src_name"),
            F.col("p").alias("pred"),
            F.col("v").alias("dst_name"),
            F.lit("backward").alias("direction"),
        )
    )
    return fwd.unionAll(bwd)


def katz_centrality(
    edges: DataFrame,
    iterations: int = 8,
    alpha_ppm: int = 100_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Truncated Katz centrality (Katz 1953) over the DIRECTED simple
    graph: ``x = sum_{k<=T} alpha^k (A^T)^k 1`` — every node starts
    with one unit and accumulates attenuated walk mass over IN-edges,
    so a node is central when many walks of any length END at it,
    each discounted by ``alpha`` per hop. The third classical lens
    next to the library's PageRank (out-degree-normalized mass
    conservation) and HITS (mutually-renormalized two-sided scores):
    Katz attenuates but never divides, so prolific sources inflate
    ALL their targets — in a KG it reads as "assertion-weighted
    reachability salience", and the pagerank/katz rank DISAGREEMENT
    set is the degree-skew diagnostic.

    Integer discipline: scores in micro units; each round is
    ``x(v) <- MICRO + (alpha_ppm * sum_{u->v} x(u)) div MICRO`` —
    exact trunc-division arithmetic, NO driver actions, bit-for-bit
    reproduced by the pure-Python oracle (precompute.katz_py).
    UNNORMALIZED on purpose (the beta=1 injection keeps its textbook
    weight): convergence and int64 headroom both need
    ``alpha * lambda_max < 1``; since ``lambda_max <= d_max_in``,
    scores stay <= MICRO*(T+1) whenever ``alpha_ppm * d_in <= 1e6``
    for every node, and a hotter graph fails LOUDLY (ANSI long
    overflow in both engines) instead of silently wrapping — lower
    ``alpha_ppm`` or cap degrees upstream. Self-loops are dropped;
    duplicate arcs collapse (binary adjacency).

    Returns (node_id, katz_micro); sources with no in-edges hold
    exactly MICRO.

    100 TB shape: per round one edge⋈score equi-join (hot targets =
    AQE skew-join) + one map-side-combined sum; localCheckpoint per
    round keeps lineage flat. Reference parity: the reference's
    NetworkX plugin exposes centrality over the ArangoDB-backed
    graph; this is the Spark-native equivalent for its KG.
    """
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    if not 0 < alpha_ppm < MICRO:
        raise ValueError(f"need 0 < alpha_ppm < 1e6, got {alpha_ppm}")
    pairs = (
        edges.select(
            F.col(src).cast("string").alias("u"),
            F.col(dst).cast("string").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint()
    )
    state = (
        pairs.select(F.col("u").alias("node_id"))
        .union(pairs.select(F.col("v").alias("node_id")))
        .distinct()
        .select("node_id", F.lit(MICRO).cast("long").alias("x"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        agg = (
            pairs.join(state.select(F.col("node_id").alias("u"), "x"), "u")
            .groupBy(F.col("v").alias("node_id"))
            .agg(F.sum("x").alias("s"))
        )
        state = (
            state.select("node_id")
            .join(agg, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit(MICRO).cast("long")
                    + F.expr(
                        f"({alpha_ppm}L * coalesce(s, 0L)) div {MICRO}"
                    )
                ).alias("x"),
            )
            .localCheckpoint()
        )
    return state.select("node_id", F.col("x").alias("katz_micro"))


def graphlet_orbits(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node graphlet degree vector — exact INDUCED counts of the
    15 automorphism orbits of the 2-4-node connected graphlets
    (Przulj 2007's GDV, the node-role signature of the graphlet
    literature) over the UNDIRECTED simple graph underlying
    ``edges``. The node-level companion of :func:`.triads.quad_census`:
    o0 degree; o1/o2 path-3 end/center; o3 triangle; o4/o5 path-4
    end/middle; o6/o7 claw leaf/center; o8 4-cycle; o9/o10/o11 paw
    pendant / triangle / attachment; o12/o13 diamond apex / shared
    edge; o14 4-clique. Two nodes with similar GDVs play the same
    structural role regardless of where they sit — over a KG it
    separates hub-spoke anchors (o7-heavy) from clique cores
    (o13/o14) from chain relays (o5) at per-entity resolution.

    Algorithm — the orbit-level ESCAPE/Ortmann-Brandes arithmetic
    (same derivation discipline as quad_census, matrix verified by
    the brute-force test oracle): enumeration ONLY for triangles
    (compact-forward listing) and per-edge K4 completions; every
    other NON-induced orbit count is a node-keyed aggregate —
    neighbor-degree sums (o1/o4/o6), second-neighborhood sums (o4),
    per-edge degree products minus edge-triangles (o5), codegree
    pair masses (o8), neighbor-triangle sums (o9), per-triangle
    degree/opposite-edge sums (o10/o12), incident-edge triangle-pair
    masses (o13) — then the hand-derived upper-triangular containment
    inversion converts to induced counts per node, top-down from o14.

    100 TB shape: the two superlinear stages are the orientation-
    bounded triangle listing (O(m^1.5) under any skew) and the
    codegree wedge join behind o8 (Theta(sum C(d,2)) — the exact-
    4-cycle price, see quad_census). Everything else is one round of
    node-keyed equi-joins + map-side-combinable sums; assembly is a
    chain of left joins ON THE NODE KEY, so AQE coalesces them onto
    one partitioning. No driver actions. Counts are BIGINT (per-node
    orbit masses are degree-polynomial, not corpus-sized).

    Returns (node_id, o0..o14), one row per edge-endpoint node.
    Isolated nodes (not on any edge) have all-zero GDVs and are
    omitted by construction.
    """
    und = (
        edges.select(
            F.least(F.col(src).cast("string"),
                    F.col(dst).cast("string")).alias("a"),
            F.greatest(F.col(src).cast("string"),
                       F.col(dst).cast("string")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    deg = (
        adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint()
    )
    deg_w = deg.select(F.col("v").alias("w"), F.col("d").alias("d_w"))

    # neighbor-degree masses: S_v (o1/o4 raw), claw-leaf mass (o6)
    s_frame = (
        adj.join(deg_w, "w")
        .groupBy("v")
        .agg(
            F.sum(F.col("d_w") - 1).alias("s"),
            F.sum(
                F.expr("((d_w - 1) * (d_w - 2)) div 2")
            ).cast("long").alias("n6"),
        )
        .localCheckpoint()
    )
    # second-neighborhood sum T2_v = sum_{u in N(v)} S_u
    t2_frame = (
        adj.join(s_frame.select(F.col("v").alias("w"), F.col("s")), "w")
        .groupBy("v")
        .agg(F.sum("s").alias("t2"))
    )

    # ---- triangle listing (compact-forward) --------------------------
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
    t_v = (
        tri.select(F.col("n1").alias("v"))
        .unionAll(tri.select(F.col("n2").alias("v")))
        .unionAll(tri.select(F.col("n3").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("tv"))
    )
    t_e = (
        tri.select(F.col("n1").alias("a"), F.col("n2").alias("b"))
        .unionAll(tri.select(F.col("n1").alias("a"), F.col("n3").alias("b")))
        .unionAll(tri.select(F.col("n2").alias("a"), F.col("n3").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("te"))
        .localCheckpoint()
    )
    # o13 raw: incident-edge triangle-pair mass
    n13_frame = (
        t_e.select(F.col("a").alias("v"), F.col("te"))
        .unionAll(t_e.select(F.col("b").alias("v"), F.col("te")))
        .groupBy("v")
        .agg(
            F.expr("sum(te * (te - 1)) div 2").cast("long").alias("n13")
        )
    )
    # per-(v, neighbor) masses: o5 raw and o9 raw share one frame
    te_vw = t_e.select(
        F.col("a").alias("v"), F.col("b").alias("w"), F.col("te")
    ).unionAll(
        t_e.select(F.col("b").alias("v"), F.col("a").alias("w"), F.col("te"))
    )
    n59_frame = (
        adj.join(deg, "v")
        .join(deg_w, "w")
        .join(
            t_v.select(F.col("v").alias("w"), F.col("tv").alias("tv_w")),
            "w",
            "left",
        )
        .join(te_vw, ["v", "w"], "left")
        .withColumn("te0", F.coalesce("te", F.lit(0)))
        .groupBy("v")
        .agg(
            F.sum(
                F.expr("(d - 1) * (d_w - 1) - te0")
            ).cast("long").alias("n5"),
            F.sum(
                F.coalesce(F.col("tv_w"), F.lit(0)) - F.col("te0")
            ).cast("long").alias("n9"),
        )
    )
    # per-triangle rows: o10 raw (other-member degree slack) and
    # o12 raw (opposite-edge triangle fanout)
    tri_full = (
        tri.join(deg.select(F.col("v").alias("n1"),
                            F.col("d").alias("d1")), "n1")
        .join(deg.select(F.col("v").alias("n2"), F.col("d").alias("d2")),
              "n2")
        .join(deg.select(F.col("v").alias("n3"), F.col("d").alias("d3")),
              "n3")
        .join(t_e.select(F.col("a").alias("n1"), F.col("b").alias("n2"),
                         F.col("te").alias("te12")), ["n1", "n2"])
        .join(t_e.select(F.col("a").alias("n1"), F.col("b").alias("n3"),
                         F.col("te").alias("te13")), ["n1", "n3"])
        .join(t_e.select(F.col("a").alias("n2"), F.col("b").alias("n3"),
                         F.col("te").alias("te23")), ["n2", "n3"])
    )
    n1012_frame = (
        tri_full.select(
            F.col("n1").alias("v"),
            (F.col("d2") + F.col("d3") - 4).alias("c10"),
            (F.col("te23") - 1).alias("c12"),
        )
        .unionAll(
            tri_full.select(
                F.col("n2").alias("v"),
                (F.col("d1") + F.col("d3") - 4).alias("c10"),
                (F.col("te13") - 1).alias("c12"),
            )
        )
        .unionAll(
            tri_full.select(
                F.col("n3").alias("v"),
                (F.col("d1") + F.col("d2") - 4).alias("c10"),
                (F.col("te12") - 1).alias("c12"),
            )
        )
        .groupBy("v")
        .agg(
            F.sum("c10").cast("long").alias("n10"),
            F.sum("c12").cast("long").alias("n12"),
        )
    )
    # codegree masses (the Theta(W) wedge join) -> o8 raw
    wa, wb = adj.alias("wa"), adj.alias("wb")
    cod = (
        wa.join(
            wb,
            (F.col("wa.v") == F.col("wb.v")) & (F.col("wa.w") < F.col("wb.w")),
        )
        .groupBy(F.col("wa.w").alias("p"), F.col("wb.w").alias("q"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n8_frame = (
        cod.select(F.col("p").alias("v"), F.col("c"))
        .unionAll(cod.select(F.col("q").alias("v"), F.col("c")))
        .groupBy("v")
        .agg(F.expr("sum(c * (c - 1)) div 2").cast("long").alias("n8"))
    )
    # K4 instances: per-edge apex pairs closed by an edge; each K4
    # appears 6x and contains every member once -> per-node count / 6
    edge_apex = (
        tri.select(F.col("n1").alias("a"), F.col("n2").alias("b"),
                   F.col("n3").alias("apex"))
        .unionAll(tri.select("n1", F.col("n3").alias("b"),
                             F.col("n2").alias("apex")))
        .unionAll(tri.select(F.col("n2").alias("a"), "n3",
                             F.col("n1").alias("apex")))
    )
    ea1, ea2 = edge_apex.alias("ea1"), edge_apex.alias("ea2")
    n14_frame = (
        ea1.join(
            ea2,
            (F.col("ea1.a") == F.col("ea2.a"))
            & (F.col("ea1.b") == F.col("ea2.b"))
            & (F.col("ea1.apex") < F.col("ea2.apex")),
        )
        .select(
            F.col("ea1.a").alias("m1"), F.col("ea1.b").alias("m2"),
            F.col("ea1.apex").alias("m3"), F.col("ea2.apex").alias("m4"),
        )
        .join(
            und.select(F.col("a").alias("m3"), F.col("b").alias("m4")),
            ["m3", "m4"],
            "left_semi",
        )
        .select(
            F.explode(F.array("m1", "m2", "m3", "m4")).alias("v")
        )
        .groupBy("v")
        .agg(F.expr("count(1) div 6").cast("long").alias("n14"))
    )

    base = (
        deg.join(s_frame, "v", "left")
        .join(t2_frame, "v", "left")
        .join(t_v, "v", "left")
        .join(n59_frame, "v", "left")
        .join(n1012_frame, "v", "left")
        .join(n13_frame, "v", "left")
        .join(n8_frame, "v", "left")
        .join(n14_frame, "v", "left")
        .select(
            F.col("v").alias("node_id"),
            F.col("d"),
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ["s", "n6", "t2", "tv", "n5", "n9", "n10",
                          "n12", "n13", "n8", "n14"]
            ],
        )
    )
    # non-induced -> induced inversion (matrix pinned by test oracle)
    return base.selectExpr(
        "node_id",
        "d", "s", "n6", "t2", "tv", "n5", "n9", "n10", "n12", "n13",
        "n8", "n14",
        "t2 - d * (d - 1) - 2 * tv AS n4",
        "d * (d - 1) * (d - 2) div 6 AS n7",
        "tv * (d - 2) AS n11",
        "n14 AS i14",
        "n13 - 3 * n14 AS i13",
        "n12 - 3 * n14 AS i12",
    ).selectExpr(
        "node_id", "d", "s", "tv", "n4", "n5", "n6", "n7", "n8", "n9",
        "n10", "n11", "i12", "i13", "i14",
        "n8 - i12 - i13 - 3 * i14 AS i8",
        "n11 - 2 * i13 - 3 * i14 AS i11",
        "n10 - 2 * i12 - 2 * i13 - 6 * i14 AS i10",
        "n9 - 2 * i12 - 3 * i14 AS i9",
    ).selectExpr(
        "node_id", "d", "s", "tv", "n4", "n5", "n6", "n7",
        "i8", "i9", "i10", "i11", "i12", "i13", "i14",
        "n5 - 2 * i8 - i10 - 2 * i11 - 2 * i12 - 4 * i13 - 6 * i14"
        " AS i5",
        "n4 - 2 * i8 - 2 * i9 - i10 - 4 * i12 - 2 * i13 - 6 * i14"
        " AS i4",
        "n7 - i11 - i13 - i14 AS i7",
        "n6 - i9 - i10 - 2 * i12 - i13 - 3 * i14 AS i6",
    ).selectExpr(
        "node_id",
        "d AS o0",
        "s - 2 * tv AS o1",
        "d * (d - 1) div 2 - tv AS o2",
        "tv AS o3",
        "i4 AS o4", "i5 AS o5", "i6 AS o6", "i7 AS o7", "i8 AS o8",
        "i9 AS o9", "i10 AS o10", "i11 AS o11", "i12 AS o12",
        "i13 AS o13", "i14 AS o14",
    )


def gdv_role_census(
    orbits: DataFrame, top_k: int = 50
) -> DataFrame:
    """Structural-role equivalence census over a graphlet-degree-
    vector frame (:func:`graphlet_orbits` output): two nodes play the
    same structural ROLE when their orbit counts agree at order-of-
    magnitude resolution, so each node is keyed by its DAMPED
    signature ``dlog_i = floor(log2(o_i + 1))`` (the integer-exact
    stand-in for the graphlet literature's log-scaled GDV distance at
    distance zero) and the census reports each role class's
    population. The corpus-level reading of GDVs: a healthy KG shows
    a long tail of roles; over-canonicalization collapses entities
    into a few clique-core classes, hub-spoke extraction concentrates
    mass in one claw-center class.

    Output, ``top_k`` rows by (n_nodes DESC, exemplar ASC):
    (dlog0..dlog14, n_nodes, exemplar) with ``exemplar`` the
    lexicographically-least member. Determinism: floor(log2(x+1)) on
    exact int64 inputs is reproducible across engines (IEEE doubles
    represent the inputs exactly below 2^53 and log2 hits integers
    only at exact powers of two, where IEEE log2 is exact).

    100 TB shape: ONE narrow projection + one map-side-combinable
    groupBy on the 15-int signature + TakeOrderedAndProject for the
    top-k — linear in nodes, no joins, no driver actions. The
    signature key is bounded-cardinality by construction (each dlog
    <= 64), so the agg state is small regardless of corpus size.
    """
    if top_k < 1:
        raise ValueError(f"need top_k >= 1, got {top_k}")
    dcols = [
        F.expr(f"CAST(floor(log2(o{i} + 1)) AS INT)").alias(f"dlog{i}")
        for i in range(15)
    ]
    return (
        orbits.select(F.col("node_id"), *dcols)
        .groupBy(*[f"dlog{i}" for i in range(15)])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node_id").alias("exemplar"),
        )
        .orderBy(F.col("n_nodes").desc(), F.col("exemplar").asc())
        .limit(top_k)
    )
