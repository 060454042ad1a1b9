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


def discount_micro(rank: int) -> int:
    """The nDCG position discount floor(1e6 / log2(rank + 1)) as an
    integer micro weight. This single Python definition is the ONE
    source of the discount values — the Spark plan embeds them as an
    array literal and the SQL twin interpolates the same integers into
    a VALUES list, so no runtime log2() (whose last-ulp behaviour
    differs between libm implementations) ever reaches either engine.
    rank=1 -> 1_000_000 exactly."""
    import math

    if rank < 1:
        raise ValueError(f"need rank >= 1: {rank}")
    return int(1_000_000 / math.log2(rank + 1))


def ndcg_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    gain_col: str = "gain",
) -> DataFrame:
    """Per-query nDCG@k with GRADED relevance (Järvelin & Kekäläinen,
    TOIS 2002) — the graded companion to ranking_metrics' binary
    battery, grading the same four retrieval surfaces when judgments
    carry degrees (exact class match vs partial class match).

    ``run``: one row per (query, retrieved doc) with a 1-based
    gap-free per-query ``rank_col`` (validated in-plan exactly as
    ranking_metrics does — a gapped rank silently shifts every
    discounted gain after it, so it RAISES instead). ``qrels``:
    (query, doc, gain) with integer gain >= 0, validated in-plan;
    duplicate (query, doc) judgments collapse to the MOST generous
    (max gain) — the documented tie policy, never a nondeterministic
    pick.

    Determinism discipline: DCG = sum(gain * w[rank]) with
    w = discount_micro (a driver-side integer table — see above), so
    both DCG and ideal DCG are exact int64 sums; the final ratio is
    computed in decimal(38,0) (gain * 1e6 * 1e6 products) and
    truncated to ppm. Ideal DCG orders by (gain desc, doc asc) — the
    doc tie-break cannot change IDCG (swapping equal gains across
    positions leaves the weighted sum unchanged), it only pins the
    plan to one deterministic ordering.

    NULL ndcg when the query has no positive-gain judgment (IDCG = 0,
    unscorable — never a fake 0 or a division blow-up); honest zero
    when the query is judged but the run retrieved nothing relevant;
    NULL for run-only (unjudged) queries.

    100 TB shape: qrels collapse in one (q,d)-keyed agg, the ideal
    side is one qrels-sized window + agg, the run side one
    (q,d)-keyed join + one q-keyed agg (the rank-contract guard rides
    the same agg) — all qrels/run-sized Exchanges, no driver actions,
    no UDFs; the discount table is an in-plan array literal, not a
    join.
    """
    if k < 1:
        raise ValueError(f"need k >= 1: {k}")
    if k > 1000:
        raise ValueError(f"discount literal bounded at k <= 1000: {k}")

    q, d, r, g = query_col, doc_col, rank_col, gain_col
    weights = F.array(*[F.lit(discount_micro(i)) for i in range(1, k + 1)])

    graded = (
        qrels.select(
            F.col(q).alias("_q"),
            F.col(d).alias("_d"),
            F.col(g).cast("long").alias("_g"),
        )
        .withColumn(
            "_chk",
            F.assert_true(
                F.col("_g").isNotNull() & (F.col("_g") >= 0),
                F.lit("ndcg_metrics: gain must be a non-negative integer"),
            ),
        )
        .filter(F.col("_chk").isNull())
        .groupBy("_q", "_d")
        .agg(F.max("_g").alias("_g"))
    )

    ideal_w = Window.partitionBy("_q").orderBy(
        F.col("_g").desc(), F.col("_d").asc()
    )
    ideal = (
        graded.withColumn("_pos", F.row_number().over(ideal_w))
        .filter(F.col("_pos") <= k)
        .groupBy(F.col("_q").alias(q))
        .agg(
            F.sum(
                F.col("_g") * F.element_at(weights, F.col("_pos"))
            ).alias("idcg_micro"),
        )
    )
    n_judged = graded.groupBy(F.col("_q").alias(q)).agg(
        F.count(F.lit(1)).alias("n_judged")
    )

    marked = run.select(
        F.col(q), F.col(d), F.col(r).cast("long").alias("_rank")
    ).join(
        graded,
        on=[F.col(q) == F.col("_q"), F.col(d) == F.col("_d")],
        how="left",
    ).drop("_q", "_d")
    per_query = (
        marked.groupBy(q)
        .agg(
            F.count(F.lit(1)).alias("n_ranked"),
            F.max("_rank").alias("_max_rank"),
            F.count_distinct(F.col("_rank")).alias("_n_distinct"),
            F.min("_rank").alias("_min_rank"),
            F.sum(
                F.when(
                    (F.col("_rank") <= k) & F.col("_g").isNotNull(),
                    F.col("_g")
                    * F.element_at(weights, F.col("_rank").cast("int")),
                ).otherwise(F.lit(0))
            ).alias("dcg_micro"),
        )
        .withColumn(
            "_guard",
            F.assert_true(
                (F.col("_max_rank") == F.col("n_ranked"))
                & (F.col("_n_distinct") == F.col("n_ranked"))
                & (F.col("_min_rank") == 1),
                F.lit(
                    "ndcg_metrics: rank must be 1-based, gap-free "
                    "and duplicate-free per query"
                ),
            ),
        )
        .filter(F.col("_guard").isNull())
        .drop("_guard", "_max_rank", "_n_distinct", "_min_rank")
    )

    joined = per_query.join(
        n_judged.join(ideal, on=q, how="inner"), on=q, how="full_outer"
    )
    scorable = F.col("idcg_micro") > 0
    return joined.select(
        F.col(q),
        F.coalesce(F.col("n_judged"), F.lit(0)).alias("n_judged"),
        F.coalesce(F.col("n_ranked"), F.lit(0)).alias("n_ranked"),
        F.when(
            F.col("n_judged").isNotNull(),
            F.coalesce(F.col("dcg_micro"), F.lit(0)),
        ).alias("dcg_micro"),
        F.col("idcg_micro"),
        F.when(
            scorable,
            F.expr(
                "cast((cast(coalesce(dcg_micro, 0) as decimal(38,0))"
                " * 1000000) div cast(idcg_micro as decimal(38,0))"
                " as bigint)"
            ),
        ).alias("ndcg_ppm"),
    )
