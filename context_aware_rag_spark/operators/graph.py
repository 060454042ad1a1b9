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

from pyspark.sql import DataFrame
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


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    deduped: bool = False,
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
    # deduped=True: the caller hands in an already-distinct,
    # already-materialized pair frame (shared with degree_stats) — skip
    # the dedup shuffle and the redundant checkpoint
    pairs = (
        edges.select(src, dst)
        if deduped
        else edges.select(src, dst).dropDuplicates().localCheckpoint()
    )
    out_deg = (
        pairs.groupBy(F.col(src).alias("node_id"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint()
    )
    nodes = (
        pairs.select(F.col(src).alias("node_id"))
        .union(pairs.select(F.col(dst).alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node_id", F.lit(0).cast("long").alias("rank_micro"))
    teleport = ((100 - damping_pct) * MICRO) // 100
    ranks = nodes.select("node_id", F.lit(MICRO).cast("long").alias("r"))
    for _ in range(iterations):
        shares = ranks.join(out_deg, "node_id").select(
            "node_id", F.expr("r div out_deg").alias("share")
        )
        contrib = (
            pairs.join(shares, pairs[src] == shares.node_id)
            .groupBy(F.col(dst).alias("node_id"))
            .agg(F.sum("share").alias("inbound"))
        )
        dang = (
            ranks.join(out_deg, "node_id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes.join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node_id",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(inbound, 0L) + dang div {n})) div 100"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node_id", F.col("r").alias("rank_micro"))
