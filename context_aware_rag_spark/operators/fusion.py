"""Reciprocal Rank Fusion — the hybrid-retrieval combiner.

The engine now has both retrieval legs the reference's RAG loop needs
at scale: dense (ann.cosine_topk_* over embeddings; the reference's
chunk vector search, graph_retrieval/base.py) and lexical
(bm25.bm25_topk). RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is
the standard way to merge them without score calibration:

    rrf(d) = sum over legs  w_leg / (k + rank_leg(d))

Only RANKS cross the fusion boundary — integer arithmetic end to end
(contributions are fixed to integer micro-units), so fused output is
engine-exact and the DuckDB twin reproduces it bit-for-bit.

100 TB shape: each leg is already a per-query top-k (tiny); fusion is
a union of leg outputs + one groupBy((query, doc)) + one query-keyed
window — all bounded by queries x k x n_legs, never by corpus size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    legs: "list[DataFrame]",
    rrf_k: int = 60,
    topk: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    weights: "list[float] | None" = None,
) -> DataFrame:
    """Fuse per-query rankings into one: every leg frame carries
    (query_col, id_col, rank_col); a doc absent from a leg simply
    contributes nothing (the standard RRF convention).

    Returns (query_col, id_col, rrf_micro, n_legs, rank) — ``rrf_micro``
    is the integer micro-unit fused score, ``n_legs`` how many legs
    surfaced the doc, ``rank`` the fused 1-based position (ties break
    on ascending id).
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranking leg")
    if weights is not None and len(weights) != len(legs):
        raise ValueError("weights must match the number of legs")
    contribs = []
    for i, leg in enumerate(legs):
        w = 1.0 if weights is None else float(weights[i])
        contribs.append(
            leg.select(
                F.col(query_col),
                F.col(id_col),
                F.round(
                    F.lit(w * 1000000.0) / (F.lit(int(rrf_k)) + F.col(rank_col))
                )
                .cast("long")
                .alias("_c"),
            )
        )
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = unioned.groupBy(query_col, id_col).agg(
        F.sum("_c").alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_legs"),
    )
    w_rank = Window.partitionBy(query_col).orderBy(
        F.col("rrf_micro").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= topk)
        .select(query_col, id_col, "rrf_micro", "n_legs", "rank")
    )
