"""Stage 5 — alias canonicalization: connected components + edge rewrite.

The reference merges duplicate entities with apoc.refactor.mergeNodes
over same-label cosine>0.9 pairs, capped at 100 groups per pass
(neo4j_db.py:1575-1687). We canonicalize the FULL transitive closure in
one job — an intentional, documented superset (SURVEY.md §6 risk 5) —
via min-id label propagation over the similarity pair list:

    label(v) <- min(label(v), min over neighbors label(u))

iterated to fixpoint. Each iteration is one join + one aggregation;
``localCheckpoint()`` truncates lineage so the loop does not stack a
growing plan (the classic iterative-Spark failure mode). Alias groups
are near-cliques (every pair above threshold), so convergence takes
2-3 iterations regardless of corpus size; for adversarial long chains
the iteration count is bounded by graph diameter and each step remains
a hash join on node_id — no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# exact-GEMM vs LSH crossover, in distinct surface forms (reps): the
# repo's own measurements (PLANS.md §7 — 20k forms: exact faster;
# 200k forms: LSH 6.9x vs exact 9.1x wall, closure identical) put the
# crossover around 1e5; the exact path is O(reps^2 / n_blocks) per
# type, so beyond this the quadratic term dominates
AUTO_LSH_THRESHOLD = 100_000

# small-graph strategy election for connected_components (r6): below
# this many PAIRS the component closure runs as a driver union-find
# (bounded collect — ~65k edges is single-digit MB, the same order as
# the session's 64 MB autoBroadcastJoinThreshold) instead of 5+
# fixpoint jobs whose per-job fixed cost IS the wall on vocabulary-
# sized dedup graphs. Election is by MEASURED size with a distributed
# fallback, the same pattern as AUTO_LSH_THRESHOLD above — not a
# local-mode constant: the dominant workload (alias canonicalization)
# has vocabulary-bounded reps at ANY corpus size.
SMALL_CC_PAIR_CAP = 65_536
# canonicalize_nodes only offers the election when its (already
# measured) representative count is this small — so the limit-probe's
# potential recompute touches a <=4096-node pairing stage, trivial at
# any corpus size
SMALL_CC_REPS = 4_096


def canonicalize_nodes(
    nodes: DataFrame,
    threshold: float,
    embedding_dim: int = 64,
    n_blocks: int = 8,
    blocking: str = "auto",
    lsh_bands: int = 8,
    lsh_bits_per_band: int = 16,
    auto_lsh_threshold: int = AUTO_LSH_THRESHOLD,
) -> DataFrame:
    """Full canonicalization: nodes(node_id, name, type) -> canonical_map.

    Scale structure: entity ids are per-conversation hashes, so the same
    surface form appearing in N conversations is N distinct nodes whose
    embeddings are IDENTICAL (cosine 1.0 > any threshold) — pairing them
    directly is quadratic in N. Instead:

    1. collapse exact (name, type) groups to a representative
       (min node_id) — one groupBy, linear;
    2. similarity pairing + connected components over the
       representatives only (cardinality = distinct surface forms,
       independent of corpus size). ``blocking="type"`` = exact
       blocked GEMM (parity mode, forced); ``blocking="lsh"`` = banded
       sign-random-projection — near-linear (forced);
       ``blocking="auto"`` (default) counts the reps — one cheap agg
       on the already-checkpointed frame — and escalates to LSH at
       ``auto_lsh_threshold`` distinct forms, so a 100x corpus cannot
       silently get the quadratic plan because someone forgot a flag
       (VERDICT r2 scale item 1);
    3. compose node -> rep -> canon with two joins.

    Semantics-preserving w.r.t. the transitive closure the oracle
    computes: same-name nodes are always in one component, and the
    component minimum is unchanged (rep = per-name min, canon = min of
    rep component = global component min).
    """
    from .similarity import similarity_pairs, with_entity_embeddings

    base = nodes.select("node_id", "name", "type")
    reps = (
        base.groupBy("name", "type")
        .agg(F.min("node_id").alias("rep_id"))
        .localCheckpoint()
    )
    rep_nodes = reps.select(
        F.col("rep_id").alias("node_id"), "name", "type"
    )
    n_reps = None
    if blocking == "auto":
        n_reps = reps.count()
        blocking = "lsh" if n_reps >= auto_lsh_threshold else "type"
    with_emb = with_entity_embeddings(rep_nodes, dim=embedding_dim)
    pairs = similarity_pairs(with_emb, threshold=threshold, blocking=blocking,
                             n_blocks=n_blocks, bands=lsh_bands,
                             bits_per_band=lsh_bits_per_band, dim=embedding_dim)
    # the rep count is already measured in auto mode; when it bounds the
    # pair graph to vocabulary size, elect the driver union-find closure
    # (see SMALL_CC_* above) — the fixpoint jobs' fixed cost dominates
    # the wall on graphs this small at every corpus size
    cc_cap = (
        SMALL_CC_PAIR_CAP
        if n_reps is not None and n_reps <= SMALL_CC_REPS
        else None
    )
    rep_canon = connected_components(pairs, small_graph_cap=cc_cap)

    node_to_rep = base.join(reps, ["name", "type"]).select(
        "node_id", "rep_id"
    )
    return (
        node_to_rep.join(
            rep_canon.withColumnRenamed("node_id", "rep_id"), "rep_id", "left"
        )
        .select(
            "node_id",
            F.coalesce(F.col("canon_id"), F.col("rep_id")).alias("canon_id"),
        )
        .filter(F.col("node_id") != F.col("canon_id"))
    )


def canonicalize_incremental(
    existing_nodes: DataFrame,
    existing_map: DataFrame,
    new_nodes: DataFrame,
    threshold: float,
    embedding_dim: int = 64,
    blocking: str = "lsh",
    lsh_bands: int = 8,
    lsh_bits_per_band: int = 16,
    n_blocks: int = 8,
    auto_lsh_threshold: int = AUTO_LSH_THRESHOLD,
) -> DataFrame:
    """Incremental canonicalization: fold NEW nodes into an existing
    canonical map without re-pairing the whole corpus (the reference's
    repeated capped dedup passes, neo4j_db.py:1575-1687, re-expressed
    as an incremental closure update).

    Exactness argument: the full-batch closure is the transitive
    closure of all similarity pairs. Old-old pair connectivity is
    carried by two DETERMINISTIC edge sets — ``existing_map``'s
    node->canon edges plus a bridge edge (new_rep, old_rep) for every
    surface form whose representative was re-elected (same surface =>
    always above threshold, no similarity recall involved) — so the
    closure of

        map edges ∪ bridge edges ∪ pairs touching >= 1 new rep

    equals the full recompute with the same ``blocking``, including a
    new alias bridging two previously separate components. Without the
    bridges, a re-elected rep would make old connectivity depend on
    re-FINDING borderline old pairs, where approximate blocking could
    split a merged component.

    Cost shape (blocking="lsh"): candidates come from a banded join of
    the NEW reps' rows against all reps' rows — per-bucket fan-out is
    bucket_new x bucket_all, so work scales with the new data, never
    old². blocking="type" uses the exact GEMM over all reps (full
    exactness, full-recompute cost — verification mode).

    Inputs: frames of (node_id, name, type); ``existing_map`` is the
    prior (node_id, canon_id) output (non-identity rows). Returns the
    UPDATED full canonical map.
    """
    from .similarity import (
        _pair_dot,
        similarity_pairs,
        with_entity_embeddings,
        with_lsh_bands,
    )

    all_nodes = (
        existing_nodes.select("node_id", "name", "type")
        .unionByName(new_nodes.select("node_id", "name", "type"))
        .dropDuplicates(["node_id"])
    )
    reps = (
        all_nodes.groupBy("name", "type")
        .agg(F.min("node_id").alias("rep_id"))
        .localCheckpoint()
    )
    new_ids = new_nodes.select("node_id").distinct()
    new_reps = (
        reps.join(
            all_nodes.join(new_ids, "node_id", "left_semi").select("name", "type").distinct(),
            ["name", "type"],
        )
        .select("rep_id")
        .distinct()
        .localCheckpoint()
    )
    rep_nodes = reps.select(F.col("rep_id").alias("node_id"), "name", "type")
    with_emb = with_entity_embeddings(rep_nodes, dim=embedding_dim)

    # accept the same blocking vocabulary as canonicalize_nodes — the
    # config default is "auto", and passing it through to
    # similarity_pairs would raise
    if blocking == "auto":
        blocking = "lsh" if reps.count() >= auto_lsh_threshold else "type"

    if blocking == "lsh":
        # narrow banding (see similarity_pairs): the NEW×ALL banded
        # join shuffles only (node_id, type, band, band_hash);
        # embeddings re-join by id on the deduped candidate pairs
        emb_base = with_emb.select("node_id", "type", "embedding").localCheckpoint()
        banded_all = with_lsh_bands(
            emb_base, embedding_dim, lsh_bands, lsh_bits_per_band
        ).select("node_id", "type", "band", "band_hash").localCheckpoint()
        banded_new = banded_all.join(
            new_reps.withColumnRenamed("rep_id", "node_id"), "node_id", "left_semi"
        )
        cand = (
            banded_new.alias("l")
            .join(
                banded_all.alias("r"),
                on=[
                    F.col("l.type") == F.col("r.type"),
                    F.col("l.band") == F.col("r.band"),
                    F.col("l.band_hash") == F.col("r.band_hash"),
                    F.col("l.node_id") != F.col("r.node_id"),
                ],
            )
            .select(
                F.least("l.node_id", "r.node_id").alias("a"),
                F.greatest("l.node_id", "r.node_id").alias("b"),
            )
            .dropDuplicates(["a", "b"])
        )
        emb_a = emb_base.select(
            F.col("node_id").alias("a"), F.col("embedding").alias("emb_a")
        )
        emb_b = emb_base.select(
            F.col("node_id").alias("b"), F.col("embedding").alias("emb_b")
        )
        touch_new = (
            cand.join(emb_a, "a")
            .join(emb_b, "b")
            .withColumn("score", _pair_dot(F.col("emb_a"), F.col("emb_b")))
            .filter(F.col("score") > threshold)
            .select("a", "b")
        )
    else:
        pairs_all = similarity_pairs(
            with_emb, threshold=threshold, blocking=blocking, n_blocks=n_blocks,
            bands=lsh_bands, bits_per_band=lsh_bits_per_band, dim=embedding_dim,
        ).localCheckpoint()
        touch_new = (
            pairs_all.join(
                new_reps.withColumnRenamed("rep_id", "a"), "a", "left_semi"
            )
            .unionByName(
                pairs_all.join(
                    new_reps.withColumnRenamed("rep_id", "b"), "b", "left_semi"
                )
            )
            .select("a", "b")
            .dropDuplicates(["a", "b"])
        )

    # bridge edges: surfaces whose representative changed connect the
    # new rep to the old one deterministically (same surface form)
    old_reps = existing_nodes.groupBy("name", "type").agg(
        F.min("node_id").alias("old_rep")
    )
    bridges = (
        reps.join(old_reps, ["name", "type"])
        .filter(F.col("rep_id") != F.col("old_rep"))
        .select(F.col("rep_id").alias("a"), F.col("old_rep").alias("b"))
    )

    prior_edges = existing_map.select(
        F.col("node_id").alias("a"), F.col("canon_id").alias("b")
    )
    closure = connected_components(
        touch_new.unionByName(bridges).unionByName(prior_edges)
    )

    node_to_rep = all_nodes.join(reps, ["name", "type"]).select("node_id", "rep_id")
    return (
        node_to_rep.join(
            closure.withColumnRenamed("node_id", "rep_id"), "rep_id", "left"
        )
        .select(
            "node_id",
            F.coalesce(F.col("canon_id"), F.col("rep_id")).alias("canon_id"),
        )
        .filter(F.col("node_id") != F.col("canon_id"))
    )


def _driver_cc(pairs: DataFrame, rows) -> "DataFrame | None":
    """Union-find closure of a collected pair list; same minimum-id
    labeling as the distributed fixpoints (string comparison agrees:
    UTF-8 byte order — Spark's — preserves code-point order — Python's).
    Returns None when a NULL endpoint is present (the distributed
    paths' null semantics are join-dependent; don't replicate them)."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r[0], r[1]
        if a is None or b is None:
            return None
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = sorted((n, find(n)) for n in parent)
    from pyspark.sql import types as T

    atype = pairs.schema[pairs.columns[0]].dataType
    schema = T.StructType(
        [T.StructField("node_id", atype), T.StructField("canon_id", atype)]
    )
    return pairs.sparkSession.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    max_iter: int = 50,
    checkpoint_every: int = 1,  # kept for API compat; rounds now persist
    # each iteration and truncate lineage on a fixed 8-round cadence
    algorithm: str = "label",
    small_graph_cap: int | None = None,
) -> DataFrame:
    """pairs(a, b) -> canonical_map(node_id, canon_id) for ALL nodes that
    appear in any pair (canon = min node_id of the component).

    ``algorithm``:
      - ``"label"`` (default) — min-label propagation; one join + one
        agg per round, rounds = component DIAMETER. The right choice
        for the engine's dominant workload (alias groups / near-dup
        families are near-cliques: 2-3 rounds regardless of corpus
        size).
      - ``"lss"`` — alternating large-star / small-star (Kiveris et
        al., "Connected Components in MapReduce and Beyond", SoCC
        2014). Rounds = O(log n) INDEPENDENT of diameter, and each
        star step hangs high-degree nodes' neighbors directly off the
        component minimum, so Zipf-hot nodes shrink rather than
        re-propagate. The scale path when the pair graph's shape is
        unknown (chained shared-span / near-dup graphs at web scale
        can have long filaments that would cost label-prop one shuffle
        round per hop).

    Both produce the identical minimum-id labeling.

    ``small_graph_cap`` (r6, default None = off): when set, probe the
    pair list with a bounded ``limit(cap+1).collect()`` — if it fits,
    the closure is a driver union-find returning a local relation
    (downstream joins broadcast it), skipping every fixpoint job; if it
    does not fit (or a NULL endpoint appears), fall through to the
    distributed algorithm unchanged. Same labeling either way; on the
    fast path ``max_iter`` never binds (union-find cannot fail to
    converge). Callers should only enable this when an upstream
    measurement bounds the graph (see canonicalize_nodes' rep count):
    the probe's limit can re-evaluate the pair stage on fallback.
    """
    if algorithm == "lss" and small_graph_cap is None:
        return _connected_components_lss(pairs, max_iter=max_iter)
    if algorithm not in ("label", "lss"):
        raise ValueError(f"unknown cc algorithm: {algorithm!r}")
    if small_graph_cap:
        head = pairs.limit(small_graph_cap + 1).collect()
        if len(head) <= small_graph_cap:
            local = _driver_cc(pairs, head)
            if local is not None:
                return local
    if algorithm == "lss":
        return _connected_components_lss(pairs, max_iter=max_iter)
    # pre-partition the (static) adjacency on the per-round join key so
    # each round's gather shuffles only the node-sized label frame
    # (guide §2.4); the old label rides the round's checkpoint so the
    # convergence probe is a filter over cached rows, not a join job
    n_shuffle = int(
        pairs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # ONE pass over pairs: both orientations explode from the same scan
    # (the union of two projections evaluated the pairs frame TWICE —
    # for canonicalize_nodes that meant running the GEMM/LSH pairing
    # stage itself twice; identical edge set either way)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("src"), F.col("b").alias("dst")
                    ),
                    F.struct(
                        F.col("b").alias("src"), F.col("a").alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.*")
        .dropDuplicates(["src", "dst"])
        .repartition(n_shuffle, "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("label", F.col("node_id"))
        .localCheckpoint()
    )
    for i in range(max_iter):
        # min label among self and neighbors
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node_id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node_id == neighbor_min.src, "left")
            .select(
                "node_id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # ONE job per round: persist + a full probe count materializes
        # the round and reports changed rows in the same action; a
        # localCheckpoint every 8th round truncates lineage for long
        # diameter chains (the label workload converges in 2-3)
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node_id", "label")
        if (i + 1) % 8 == 0:
            labels = labels.localCheckpoint()
        if changed == 0:
            break
    else:
        # silent non-convergence would split components and break the
        # transitive-closure guarantee — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("node_id", F.col("label").alias("canon_id"))


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-LARGER neighbor of u to min(N(u) + {u}).

    Emissions come from each edge's smaller endpoint, so connectivity
    is preserved; larger nodes' neighborhoods collapse toward the
    minimum (the skew-friendly direction: a hot node's fan-out is
    rewired in one round instead of propagating hop by hop).
    """
    adj = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        adj.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("src", "_mn").alias("m"))
    )
    return (
        adj.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges larger->smaller, then connect every SMALLER
    neighbor of u (and u itself) to min(N(u))."""
    oriented = (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(mins, "src")
    return (
        joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(
            joined.select("src", F.col("m").alias("dst")).dropDuplicates()
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _connected_components_lss(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al. 2014).

    One round = large-star + small-star, each a groupBy(min) plus an
    equi-join on the grouping key — two shuffles, both keyed on node
    id. Convergence is detected by an order-independent edge-set
    signature (count + bit_xor + modular sum of xxhash64) — one agg
    action per round; the paper's potential argument makes a repeated
    signature a true fixpoint, and the fixpoint of both operations is
    a forest of depth-1 stars rooted at each component's minimum.
    The star shape is re-validated structurally after the loop (three
    bounded actions) so a signature collision can never return a
    wrong labeling silently.
    """
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    all_nodes = (
        pairs.select(F.col("a").alias("node_id"))
        .unionByName(pairs.select(F.col("b").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("x"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("dst", "src"), F.lit(1_000_000_007))),
                F.lit(0),
            ).alias("s"),
        ).first()
        sig = (row["n"], row["x"], row["s"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components(lss) did not converge in {max_iter} "
            "rounds; raise max_iter"
        )
    # structural validation of the fixpoint: child > root everywhere,
    # two-level (no root is also a child), one root per child
    if edges.filter(F.col("src") <= F.col("dst")).limit(1).count():
        raise RuntimeError("lss fixpoint violates child > root orientation")
    if (
        edges.alias("a")
        .join(edges.alias("b"), F.col("a.dst") == F.col("b.src"), "left_semi")
        .limit(1)
        .count()
    ):
        raise RuntimeError("lss fixpoint is not two-level (root is a child)")
    if (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .count()
    ):
        raise RuntimeError("lss fixpoint assigns multiple roots to a node")
    labels = edges.select(
        F.col("src").alias("node_id"), F.col("dst").alias("canon_id")
    )
    return all_nodes.join(labels, "node_id", "left").select(
        "node_id",
        F.coalesce(F.col("canon_id"), F.col("node_id")).alias("canon_id"),
    )


def merged_counts(canonical_map: DataFrame) -> DataFrame:
    """A11 — the reference's totalMerged metric (neo4j_db.py:1665-1684:
    ``sum(size(nodes))`` over merge groups, i.e. every node that took
    part in a merge INCLUDING the kept representative).

    canonical_map holds only non-representative rows (node_id !=
    canon_id), so total = rows + distinct representatives.
    """
    return canonical_map.agg(
        F.count(F.lit(1)).cast("long").alias("merged_nodes"),
        F.countDistinct("canon_id").cast("long").alias("merge_groups"),
        (F.count(F.lit(1)) + F.countDistinct("canon_id"))
        .cast("long")
        .alias("total_merged"),
    )


def rewrite_edges(edges: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """J6 — rewrite edge endpoints through the canonical map, then dedupe
    (MERGE semantics). Two left joins + coalesce; the planner/AQE picks
    broadcast vs shuffle from the map's actual size (an explicit
    broadcast hint would be honored unconditionally and OOM on a
    hundreds-of-millions-row canonical map)."""
    cmap = canonical_map
    src_map = cmap.select(
        F.col("node_id").alias("_src_old"), F.col("canon_id").alias("_src_new")
    )
    dst_map = cmap.select(
        F.col("node_id").alias("_dst_old"), F.col("canon_id").alias("_dst_new")
    )
    return (
        edges.join(src_map, edges.src == F.col("_src_old"), "left")
        .withColumn("src", F.coalesce(F.col("_src_new"), F.col("src")))
        .drop("_src_old", "_src_new")
        .join(dst_map, F.col("dst") == F.col("_dst_old"), "left")
        .withColumn("dst", F.coalesce(F.col("_dst_new"), F.col("dst")))
        .drop("_dst_old", "_dst_new")
        .dropDuplicates(["src", "dst", "rel_type"])
    )


def rewrite_triples(triples: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """Rewrite subj_id/obj_id through the canonical map (names kept)."""
    cmap = canonical_map
    s = cmap.select(F.col("node_id").alias("_so"), F.col("canon_id").alias("_sn"))
    o = cmap.select(F.col("node_id").alias("_oo"), F.col("canon_id").alias("_on"))
    return (
        triples.join(s, triples.subj_id == F.col("_so"), "left")
        .withColumn("subj_id", F.coalesce(F.col("_sn"), F.col("subj_id")))
        .drop("_so", "_sn")
        .join(o, F.col("obj_id") == F.col("_oo"), "left")
        .withColumn("obj_id", F.coalesce(F.col("_on"), F.col("obj_id")))
        .drop("_oo", "_on")
    )




def canonicalize_predicates(
    triples: DataFrame,
    threshold: float = 0.5,
    pred_col: str = "pred",
    subj_col: str = "subj_name",
    obj_col: str = "obj_name",
) -> DataFrame:
    """Predicate (relation) canonicalization by DISTRIBUTIONAL
    similarity — the relation-side twin of entity canonicalization:
    two surface predicates ("married_to" / "spouse_of") that connect
    largely the same (subject, object) pairs are aliases of one
    relation (the Harris distributional hypothesis applied to KG
    schema cleaning; OpenIE canonicalization a la CESI/AMIE treats
    predicates exactly as their argument-pair distributions).

    Each predicate's profile is its DISTINCT (subj, obj) pair set
    (pairs fingerprinted as single tokens); profiles with exact
    Jaccard >= ``threshold`` become alias pairs
    (:func:`dedup.allpairs_jaccard_pairs_sets` — the prefix-filtered
    exact join, so hot pairs like (user, tool) never quadratic-blow
    the index), and alias pairs close transitively via
    :func:`connected_components`. Returns one row per DISTINCT
    predicate: (pred, canon_pred, n_pairs) with canon_pred = the
    lexicographically smallest predicate of the alias group (identity
    for unmerged predicates) and n_pairs = the profile size.

    100 TB shape: one triple scan -> per-predicate pair-set agg
    (map-side combined; state bounded by DISTINCT pairs per
    predicate); the similarity join runs over #distinct-predicates
    rows — schema-sized, not corpus-sized; CC runs on the alias pairs
    only.
    """
    from .dedup import allpairs_jaccard_pairs_sets

    profiles = (
        triples.select(
            F.col(pred_col).alias("pred"),
            F.concat_ws("\x01", F.col(subj_col), F.col(obj_col)).alias(
                "_pair"
            ),
        )
        .groupBy("pred")
        .agg(F.array_distinct(F.collect_list("_pair")).alias("tokens"))
        .localCheckpoint()
    )
    alias_pairs = allpairs_jaccard_pairs_sets(
        profiles, threshold=threshold, id_col="pred", tokens_col="tokens"
    ).select(F.col("a"), F.col("b"))
    canon = connected_components(alias_pairs)
    return (
        profiles.join(
            canon.withColumnRenamed("node_id", "pred"), "pred", "left"
        )
        .select(
            "pred",
            F.coalesce(F.col("canon_id"), F.col("pred")).alias("canon_pred"),
            F.size("tokens").cast("long").alias("n_pairs"),
        )
    )


def cluster_purity(
    nodes: DataFrame,
    canonical_map: DataFrame,
    min_members: int = 2,
) -> DataFrame:
    """Canonicalization-quality census: per-canonical-cluster member,
    alias, and type statistics — the QA table a KG engineer reads
    before trusting a merge (a cluster mixing entity TYPES is the
    highest-precision canonicalization-error signal: 'Paris the
    Person' glued to 'Paris the Location' corrupts every downstream
    join through that node).

    ``nodes`` is the node-grain frame (node_id, name, type) —
    mentions deduplicated on node_id; ``canonical_map`` the
    (node_id, canon_id) output of :func:`canonicalize_nodes` (rows
    only where they differ — unmapped nodes are their own canon).
    For every cluster with ``>= min_members`` members:

    (canon_id, n_members, n_names, n_types, majority_type,
     majority_n, purity_ppm)

    - ``n_names`` > 1 is the merge actually doing alias work;
    - ``n_types`` counts NULL as its OWN class (an untyped mention is
      its own anomaly class — the relation_signatures convention);
    - ``majority_type`` elected by (member count DESC, type ASC NULLS
      LAST) — deterministic on both engines;
    - ``purity_ppm`` = majority members * 1e6 div members; anything
      below 1e6 is a mixed cluster, rankable directly.

    100 TB shape: one left join against the map (the map is
    alias-pair-sized, broadcast-able; unmatched nodes coalesce to
    themselves), two map-side-combined aggs on the canon key, and a
    majority window bounded by the type vocabulary per cluster. No
    corpus self-join, no driver action.
    """
    if min_members < 1:
        raise ValueError(f"need min_members >= 1, got {min_members}")
    assigned = (
        nodes.select("node_id", "name", "type")
        .join(
            canonical_map.select(
                F.col("node_id").alias("_nid"), "canon_id"
            ),
            F.col("node_id") == F.col("_nid"),
            "left",
        )
        .select(
            F.coalesce("canon_id", "node_id").alias("canon_id"),
            "node_id",
            "name",
            "type",
        )
    )
    sizes = assigned.groupBy("canon_id").agg(
        F.countDistinct("node_id").alias("n_members"),
        F.countDistinct("name").alias("n_names"),
        (
            F.countDistinct("type")
            + F.max(F.col("type").isNull().cast("int"))
        ).alias("n_types"),
    )
    per_type = assigned.groupBy("canon_id", "type").agg(
        F.countDistinct("node_id").alias("n")
    )
    w = Window.partitionBy("canon_id").orderBy(
        F.col("n").desc(), F.col("type").asc_nulls_last()
    )
    major = (
        per_type.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "canon_id",
            F.col("type").alias("majority_type"),
            F.col("n").alias("majority_n"),
        )
    )
    return (
        sizes.filter(F.col("n_members") >= min_members)
        .join(major, "canon_id")
        .select(
            "canon_id",
            "n_members",
            "n_names",
            "n_types",
            "majority_type",
            "majority_n",
            F.expr("majority_n * 1000000 div n_members").alias(
                "purity_ppm"
            ),
        )
    )
