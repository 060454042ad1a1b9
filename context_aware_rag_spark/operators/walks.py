"""Deterministic random-walk corpus generation over the KG.

DeepWalk / node2vec (Perozzi et al. 2014; Grover & Leskovec 2016)
train node embeddings on a corpus of short random walks — the
graph-structured analogue of the text corpus a language model trains
on. This operator is that corpus generator, distributed: ``w`` walks
of length ``<= L`` from every node, following directed edges.

Determinism: the "random" next hop at step t of walk (start, wid) is
md5-derived — first 32 bits of md5 over a chr(31)-joined
(start, wid, t) key, mod the current node's out-degree — so any
cluster size, partitioning, or replay emits the identical walk
corpus, and a DuckDB recursive-CTE twin reproduces it exactly (the
portable-hash discipline of operators/sampling.py).

100 TB shape: the neighbor table gets a per-source neighbor index
once (one window sort per adjacency list); each step is then ONE
equi-join of the walk frontier against (node, slot) — hash
partitioned, no fan-out, frontier size monotonically non-increasing
(walks die at sinks). L steps = L narrow joins, each localCheckpointed
so lineage stays flat. Hub adjacency lists sort within one task
(O(d log d) per hub) — acceptable for real degree distributions;
a 10^8-degree pathology would call for the two-phase global_index
per source, which the docstring notes rather than pre-pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x1f"


def _md5_u32(col):
    """First 32 bits of md5 as an unsigned integer — identical in
    DuckDB as CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Walk corpus as flat rows (start, walk_id, pos, node).

    Every distinct node starts ``walks_per_node`` walks (walk_id in
    [0, w)); position 0 is the start itself; each subsequent hop
    follows the md5-selected out-edge of the current node. A walk
    ends early at a sink (no out-edges) — shorter walks are emitted
    as-is, never padded or resampled.
    """
    if walk_length < 1:
        raise ValueError(f"need walk_length >= 1, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"need walks_per_node >= 1, got {walks_per_node}")
    pairs = (
        edges.select(
            F.col(src).cast("string").alias("s"),
            F.col(dst).cast("string").alias("d"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    adj = pairs.select(
        "s",
        "d",
        F.row_number().over(Window.partitionBy("s").orderBy("d")).alias("slot"),
    ).localCheckpoint()
    deg = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("out_deg"))
    starts = (
        pairs.select(F.col("s").alias("node"))
        .union(pairs.select(F.col("d").alias("node")))
        .distinct()
    )
    cur = starts.select(
        F.col("node").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk_id"),
        F.lit(0).alias("pos"),
        "node",
    ).localCheckpoint()
    out = cur
    for t in range(walk_length - 1):
        hop = F.pmod(
            _md5_u32(
                F.concat_ws(
                    SEP, "start", F.col("walk_id").cast("string"), F.lit(str(t))
                )
            ),
            F.col("out_deg"),
        )
        cur = (
            cur.join(deg, deg.s == cur.node)  # inner: sinks end the walk
            .withColumn("slot", (hop + 1).cast("int"))
            .join(adj, ["s", "slot"])
            .select(
                "start", "walk_id",
                (F.col("pos") + 1).alias("pos"),
                F.col("d").alias("node"),
            )
            .localCheckpoint()
        )
        out = out.unionAll(cur)
    return out


def skipgram_pairs(
    walk_rows: DataFrame, window: int = 2
) -> DataFrame:
    """(center, context, offset) training pairs from a walk corpus —
    the skip-gram extraction step of DeepWalk/word2vec (Mikolov et
    al. 2013): within each walk, every ordered node pair at distance
    1..window becomes one example; ``offset`` = context_pos -
    center_pos (negative = context precedes center).

    Input is :func:`random_walks` output (start, walk_id, pos, node).
    One self-equi-join on the walk key with the bounded |pos| window
    as a post-filter — cost is walks x L x 2w examples, linear in the
    corpus; the join key (start, walk_id) is perfectly uniform by
    construction, so no skew story is even needed."""
    if window < 1:
        raise ValueError(f"need window >= 1, got {window}")
    a, b = walk_rows.alias("a"), walk_rows.alias("b")
    off = F.col("b.pos") - F.col("a.pos")
    return (
        a.join(
            b,
            (F.col("a.start") == F.col("b.start"))
            & (F.col("a.walk_id") == F.col("b.walk_id")),
        )
        .filter((off != 0) & (F.abs(off) <= window))
        .select(
            F.col("a.node").alias("center"),
            F.col("b.node").alias("context"),
            off.alias("offset"),
            F.col("a.start").alias("start"),
            F.col("a.walk_id").alias("walk_id"),
            F.col("a.pos").alias("center_pos"),
        )
    )


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    ret_w: int = 1,
    in_w: int = 1,
    out_w: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Second-order biased walk corpus (node2vec, Grover & Leskovec
    2016): the next hop from ``node`` given the previous node ``prev``
    weighs each out-neighbor ``d`` by

      - ``ret_w``  if d == prev            (the 1/p "return" weight),
      - ``in_w``   if d is an out-neighbor of prev   (distance-1, BFS-ish),
      - ``out_w``  otherwise               (the 1/q "explore" weight),

    with INTEGER weights (pass e.g. ret_w=5, in_w=10, out_w=2 for
    p=2, q=5 at scale 10) so the cumulative-mass draw is exact and
    engine-portable. Step 0 has no prev and picks uniformly — exactly
    :func:`random_walks`' hash draw. Directed semantics: "neighbor of
    prev" means out-neighbor. Return takes precedence when d is both
    prev and prev's out-neighbor (a 2-cycle).

    Determinism: the draw at step t of walk (start, wid) is
    md5_u32(start|wid|t) % total_mass, landing in the candidate whose
    (d-ordered) cumulative-weight interval contains it — so any
    partitioning, cluster size, or replay (and the pure-Python twin,
    oracle/precompute.node2vec_py) emits the identical corpus.
    Zero-weight candidates are structurally unreachable; a state
    whose total mass is 0 ends the walk (documented contract, mirrors
    the sink rule).

    100 TB shape: per step ONE frontier⋈adjacency equi-join (fan-out
    = out-degree), ONE left membership probe of (prev, d) against the
    distinct edge set, and ONE per-walk window (partition key =
    (start, walk_id) — perfectly uniform by construction; partition
    SIZE = the current node's out-degree, so a 1e8-degree hub makes a
    wide-but-single-task window — the same hub caveat random_walks
    documents). localCheckpoint per step keeps lineage flat.
    """
    if walk_length < 1:
        raise ValueError(f"need walk_length >= 1, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"need walks_per_node >= 1, got {walks_per_node}")
    for nm, w in (("ret_w", ret_w), ("in_w", in_w), ("out_w", out_w)):
        if not isinstance(w, int) or w < 0:
            raise ValueError(f"need integer {nm} >= 0, got {w!r}")
    if ret_w == 0 and in_w == 0 and out_w == 0:
        raise ValueError("need at least one positive weight class")
    pairs = (
        edges.select(
            F.col(src).cast("string").alias("s"),
            F.col(dst).cast("string").alias("d"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    deg = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("out_deg"))
    adj = pairs.select(
        "s",
        "d",
        F.row_number().over(Window.partitionBy("s").orderBy("d")).alias("slot"),
    ).localCheckpoint()
    starts = (
        pairs.select(F.col("s").alias("node"))
        .union(pairs.select(F.col("d").alias("node")))
        .distinct()
    )
    cur = starts.select(
        F.col("node").alias("start"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk_id"),
        F.lit(0).alias("pos"),
        "node",
        F.lit(None).cast("string").alias("prev"),
    ).localCheckpoint()
    out = cur.select("start", "walk_id", "pos", "node")
    if walk_length == 1:
        return out
    # --- step 0: uniform (no prev), random_walks' exact draw
    hop0 = F.pmod(
        _md5_u32(
            F.concat_ws(SEP, "start", F.col("walk_id").cast("string"), F.lit("0"))
        ),
        F.col("out_deg"),
    )
    cur = (
        cur.join(deg, deg.s == cur.node)
        .withColumn("slot", (hop0 + 1).cast("int"))
        .join(adj, ["s", "slot"])
        .select(
            "start", "walk_id",
            (F.col("pos") + 1).alias("pos"),
            F.col("d").alias("node"),
            F.col("s").alias("prev"),
        )
        .localCheckpoint()
    )
    out = out.unionAll(cur.select("start", "walk_id", "pos", "node"))
    # --- steps t >= 1: biased by (return / in-neighbor / explore)
    nbr = pairs.select(
        F.col("s").alias("prev"), F.col("d").alias("d"),
        F.lit(1).alias("is_nbr"),
    )
    for t in range(1, walk_length - 1):
        cand = (
            cur.join(adj, adj.s == cur.node)
            .join(nbr, ["prev", "d"], "left")
            .withColumn(
                "w",
                F.when(F.col("d") == F.col("prev"), F.lit(ret_w))
                .when(F.col("is_nbr").isNotNull(), F.lit(in_w))
                .otherwise(F.lit(out_w))
                .cast("long"),
            )
        )
        wk = Window.partitionBy("start", "walk_id")
        cum = wk.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        cand = cand.select(
            "start", "walk_id", "pos", "node", "d", "w",
            F.sum("w").over(cum).alias("cw"),
            F.sum("w").over(wk).alias("total"),
        ).filter(F.col("total") > 0)
        pick = F.pmod(
            _md5_u32(
                F.concat_ws(
                    SEP, "start", F.col("walk_id").cast("string"), F.lit(str(t))
                )
            ),
            F.col("total"),
        )
        cur = (
            cand.filter((pick >= F.col("cw") - F.col("w")) & (pick < F.col("cw")))
            .select(
                "start", "walk_id",
                (F.col("pos") + 1).alias("pos"),
                F.col("d").alias("node"),
                # the node we hopped FROM becomes the next step's prev
                F.col("node").alias("prev"),
            )
            .localCheckpoint()
        )
        out = out.unionAll(cur.select("start", "walk_id", "pos", "node"))
    return out
