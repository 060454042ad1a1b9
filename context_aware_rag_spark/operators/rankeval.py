"""Ranked-retrieval evaluation: per-query AP / P@k / R@k / RR and the
corpus summary (MAP, mean P@k/R@k, MRR).

The engine ships four retrieval surfaces (bm25_topk, ann.*_topk,
graph_vector_search, fusion.rrf_fuse) and the reference ships one
(functions/rag/graph_rag/retrieval — the GraphRetrieval entry point)
— but nothing grades a run against relevance judgments. This is the
standard trec_eval battery (Buckley & Voorhees, SIGIR 2000
conventions) over an arbitrary ranked run:

- ``hits_at_k``   — relevant docs retrieved at rank <= k.
- ``p_at_k_ppm``  — hits / k (trec convention: k is the denominator
  even when the run returned fewer rows).
- ``r_at_k_ppm``  — hits / n_rel.
- ``rr_ppm``      — 1 / rank of the first relevant doc at rank <= k;
  0 when no relevant doc is retrieved within the cutoff (trec's
  convention — a *scorable* miss, distinct from unscorable NULL).
- ``ap_ppm``      — sum over relevant positions i <= k of
  precision@i, divided by n_rel (MAP@k with the standard full-recall
  denominator, so a run that ranks only some of the relevant docs is
  penalized for the rest).

Determinism discipline: every metric is integer trunc-ppm —
precision@i terms truncate to ppm BEFORE the sum (the per-term
truncation order is part of the contract and replicated by the SQL
twin), divisions are ``div``. Queries with zero judged-relevant docs
get NULL metrics (unscorable, never a fake 0); queries with judgments
but no run rows score honest zeros. The run must carry a 1-based,
gap-free per-query ``rank`` column (every *_topk operator here emits
one); ranks are validated in-plan (lazy assert_true — a duplicated or
gapped rank silently shifts every precision@i after it, so it RAISES
instead).

100 TB shape: one (query, doc)-keyed equi-join marks relevance, one
query-keyed window computes the running relevant-count (rank order),
and the per-query groupBy reuses the window's partitioning — two
run-sized Exchanges total, no driver actions, no UDFs. qrels
aggregates once to per-query counts (qrels-sized shuffle). The
summary is one map-side-combined 1-row agg. Hot queries (a query
judged against millions of docs) only widen their own partition —
the window state is O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval metrics at cutoff ``k``.

    ``run``: one row per (query, retrieved doc) with a 1-based
    gap-free ``rank_col`` per query (ties already broken — every
    retrieval operator in this engine emits deterministic ranks).
    ``qrels``: (query, doc) binary relevance pairs; duplicates are
    collapsed.

    Returns one row per query present in either frame:
    (query_col, n_rel, n_ranked, hits_at_k, p_at_k_ppm, r_at_k_ppm,
    rr_ppm, ap_ppm). NULL metrics when n_rel == 0 (unscorable);
    zero metrics when the query has judgments but no run rows.
    """
    if k < 1:
        raise ValueError(f"need k >= 1: {k}")

    q, d, r = query_col, doc_col, rank_col
    rel_pairs = (
        qrels.select(
            F.col(q).alias("_q"), F.col(d).alias("_d")
        ).dropDuplicates(["_q", "_d"])
    )
    n_rel = rel_pairs.groupBy(F.col("_q").alias(q)).agg(
        F.count(F.lit(1)).alias("n_rel")
    )

    marked = run.select(
        F.col(q), F.col(d), F.col(r).cast("long").alias("_rank")
    ).join(
        rel_pairs.withColumn("_rel", F.lit(1)),
        on=[F.col(q) == F.col("_q"), F.col(d) == F.col("_d")],
        how="left",
    ).drop("_q", "_d")

    w = Window.partitionBy(q).orderBy(F.col("_rank").asc())
    rel_cnt = F.sum(F.coalesce(F.col("_rel"), F.lit(0))).over(w)
    # greatest(_rank, 1): a rank <= 0 would divide by zero here before
    # the 1-based guard below gets to raise its own message — the
    # clamped value never escapes (the guard kills the query)
    prec_i = F.when(
        (F.col("_rel") == 1) & (F.col("_rank") <= k),
        F.expr("(_relcnt * 1000000L) div greatest(_rank, 1L)"),
    ).otherwise(F.lit(0))
    per_query = (
        marked.withColumn("_relcnt", rel_cnt)
        .withColumn("_prec_i", prec_i)
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).alias("n_ranked"),
            F.max("_rank").alias("_max_rank"),
            F.count_distinct(F.col("_rank")).alias("_n_distinct"),
            F.min("_rank").alias("_min_rank"),
            F.sum(
                F.when(
                    (F.col("_rel") == 1) & (F.col("_rank") <= k), 1
                ).otherwise(0)
            ).alias("hits_at_k"),
            F.min(
                F.when(
                    (F.col("_rel") == 1) & (F.col("_rank") <= k),
                    F.col("_rank"),
                )
            ).alias("_first_rel"),
            F.sum("_prec_i").alias("_ap_num"),
        )
        .withColumn(
            "_guard",
            F.assert_true(
                (F.col("_max_rank") == F.col("n_ranked"))
                & (F.col("_n_distinct") == F.col("n_ranked"))
                & (F.col("_min_rank") == 1),
                F.lit(
                    "ranking_metrics: rank must be 1-based, gap-free "
                    "and duplicate-free per query"
                ),
            ),
        )
        .filter(F.col("_guard").isNull())
        .drop("_guard", "_max_rank", "_n_distinct", "_min_rank")
    )

    joined = per_query.join(n_rel, on=q, how="full_outer")
    scorable = F.col("n_rel").isNotNull()
    has_run = F.col("n_ranked").isNotNull()
    z = F.lit(0).cast("long")
    return joined.select(
        F.col(q),
        F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
        F.coalesce(F.col("n_ranked"), F.lit(0)).alias("n_ranked"),
        F.when(
            scorable, F.coalesce(F.col("hits_at_k"), F.lit(0))
        ).cast("long").alias("hits_at_k"),
        F.when(
            scorable,
            F.coalesce(
                F.expr(f"(hits_at_k * 1000000L) div {k}"), z
            ),
        ).alias("p_at_k_ppm"),
        F.when(
            scorable,
            F.coalesce(
                F.expr("(hits_at_k * 1000000L) div n_rel"), z
            ),
        ).alias("r_at_k_ppm"),
        F.when(
            scorable & has_run & F.col("_first_rel").isNotNull(),
            F.expr("1000000L div _first_rel"),
        ).otherwise(F.when(scorable, z)).alias("rr_ppm"),
        F.when(
            scorable,
            F.coalesce(F.expr("_ap_num div n_rel"), z),
        ).alias("ap_ppm"),
    )


def ranking_summary(metrics: DataFrame, query_col: str = "query_id") -> DataFrame:
    """Corpus roll-up of ranking_metrics: one row with n_queries
    (scorable only — NULL-metric queries are excluded from every
    mean, never averaged as zeros), map_ppm, mean_p_at_k_ppm,
    mean_r_at_k_ppm, mrr_ppm — each the trunc-ppm mean over scorable
    queries. NULL row values when no query is scorable."""
    sc = metrics.filter(F.col("ap_ppm").isNotNull())
    return sc.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.expr("sum(ap_ppm) div count(1)").alias("map_ppm"),
        F.expr("sum(p_at_k_ppm) div count(1)").alias("mean_p_at_k_ppm"),
        F.expr("sum(r_at_k_ppm) div count(1)").alias("mean_r_at_k_ppm"),
        F.expr("sum(rr_ppm) div count(1)").alias("mrr_ppm"),
    )
