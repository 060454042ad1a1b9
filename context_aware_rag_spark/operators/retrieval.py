"""Retrieval-side operators: the EP3 graph-vector search re-expressed
as DataFrame joins (reference VECTOR_GRAPH_SEARCH_QUERY,
constants.py:54-232: vector top-k chunks ⇒ HAS_ENTITY ⇒ entity
frequency top-40 ⇒ similarity-banded 1-2-hop expansion ⇒ dedupe ⇒
context assembly).

Each hop is one equi-join of the frontier against the edges table —
the edges scan is filter-pruned to the relevant rel_types, the frontier
is broadcast when small, and hop count is a bounded Python loop (no
driver-side row data).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import cosine_topk_bruteforce


def topk_chunks_for_query(
    chunks_with_emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
) -> DataFrame:
    """Vector retriever: top-k chunks by cosine for one query vector."""
    spark = chunks_with_emb.sparkSession
    q = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])], ["query_id", "embedding"]
    )
    hits = cosine_topk_bruteforce(
        chunks_with_emb, q, k=k, id_col="chunk_id", vec_col="embedding"
    )
    return hits.select("chunk_id", F.col("cosine").alias("chunk_score"))


def entities_for_chunks(
    edges: DataFrame, chunk_hits: DataFrame, top_entities: int = 40
) -> DataFrame:
    """HAS_ENTITY join + A4 frequency ranking (count DESC LIMIT 40)."""
    has_ent = edges.filter(F.col("rel_type") == "HAS_ENTITY").select(
        F.col("src").alias("chunk_id"), F.col("dst").alias("node_id")
    )
    return (
        has_ent.join(F.broadcast(chunk_hits), "chunk_id")
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("num_chunks"))
        .orderBy(F.desc("num_chunks"), F.asc("node_id"))
        .limit(top_entities)
    )


def expand_hops(
    edges: DataFrame,
    seed_nodes: DataFrame,
    hops: int = 2,
    structural: tuple = ("PART_OF", "FIRST_CHUNK", "NEXT_CHUNK", "HAS_ENTITY", "SIMILAR"),
    nodes: DataFrame | None = None,
    query_vec: list[float] | None = None,
    band: tuple = (0.3, 0.9),
    embedding_dim: int = 64,
) -> DataFrame:
    """J8 — bounded-hop expansion over extracted predicate edges.

    Returns (src, dst, rel_type, hop). Each iteration joins the frontier
    (small, broadcast) to the pruned edge scan; visited accumulates via
    union + dropDuplicates. Hop count is bounded (reference uses 1-2).

    Similarity-band gating (reference VECTOR_GRAPH_SEARCH_QUERY,
    constants.py:54-232): when ``nodes`` (node_id, name) and
    ``query_vec`` are given, an expansion target is kept only if the
    cosine between its entity embedding and the query lies in ``band``
    [0.3, 0.9) — excluding both near-duplicates of the query (already
    retrieved) and unrelated entities.
    """
    pred_edges = edges.filter(~F.col("rel_type").isin(*structural)).select(
        "src", "dst", "rel_type"
    ).localCheckpoint()

    if nodes is not None and query_vec is not None:
        from .similarity import with_entity_embeddings

        q = [float(x) for x in query_vec]
        qn = float(sum(x * x for x in q)) ** 0.5 or 1.0
        with_emb = with_entity_embeddings(
            nodes.select("node_id", "name").dropDuplicates(["node_id"]),
            dim=embedding_dim,
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(x / qn) for x in q]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        in_band = with_emb.select(
            "node_id", dot.alias("_qcos")
        ).filter(
            (F.col("_qcos") >= band[0]) & (F.col("_qcos") < band[1])
        ).select("node_id").localCheckpoint()
        pred_edges = (
            pred_edges.join(
                in_band.withColumnRenamed("node_id", "dst"), "dst", "left_semi"
            ).localCheckpoint()
        )
    frontier = seed_nodes.select(F.col("node_id")).distinct()
    out: Optional[DataFrame] = None
    for hop in range(1, hops + 1):
        # no forced broadcast: hop-1 frontier is <= top_entities rows but
        # later frontiers scale with graph fan-out — AQE picks broadcast
        # vs shuffle from the frontier's measured size at runtime
        step = (
            pred_edges.join(frontier, pred_edges.src == frontier.node_id)
            .select("src", "dst", "rel_type", F.lit(hop).alias("hop"))
        )
        out = step if out is None else out.unionByName(step)
        out = out.dropDuplicates(["src", "dst", "rel_type"]).localCheckpoint()
        frontier = out.select(F.col("dst").alias("node_id")).distinct()
    return out


def graph_vector_search(
    chunks_with_emb: DataFrame,
    edges: DataFrame,
    query_vec: list[float],
    k: int = 5,
    top_entities: int = 40,
    hops: int = 2,
    nodes: DataFrame | None = None,
    band: tuple = (0.3, 0.9),
) -> DataFrame:
    """EP3 end-to-end: returns the expanded context edge set with
    provenance columns (hop, seed entity frequency). Pass ``nodes``
    (node_id, name) to enable the reference's similarity-band gating."""
    hits = topk_chunks_for_query(chunks_with_emb, query_vec, k=k).localCheckpoint()
    ents = entities_for_chunks(edges, hits, top_entities=top_entities).localCheckpoint()
    expanded = expand_hops(
        edges, ents, hops=hops, nodes=nodes, query_vec=query_vec, band=band
    )
    return expanded.join(
        F.broadcast(ents.select("node_id", "num_chunks")),
        expanded.src == F.col("node_id"),
        "left",
    ).drop("node_id")
