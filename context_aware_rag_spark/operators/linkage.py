"""Cross-table record linkage (fuzzy entity matching).

The reference links mentions to existing graph entities by similarity
ranking inside one corpus (vss_ctx_rag graph extraction; our
canonicalize.py covers that). Record LINKAGE is the two-table version
a lakehouse needs constantly — match a dirty feed against a master
dimension (vendor names, product titles, user handles) — and the
naive spelling is a cross join with a similarity UDF: O(|L| x |R|),
dead at scale.

Spark-first shape:

1. tokenize both sides once (lower, split on non-alphanumeric,
   distinct per record) — narrow maps;
2. blocking via the shared-token inverted index, with a document-
   frequency cap (df computed over BOTH sides) that drops
   stopword-grade tokens from index AND scoring — the same df_cap
   discipline as ngram_jaccard_pairs: a token in more than ``df_cap``
   records contributes candidate pairs quadratically while carrying
   ~no discriminative weight;
3. score = integer-ppm Jaccard of the capped token sets, computed
   entirely from the same inverted-index join (shared-token count per
   candidate pair + per-record set sizes) — no second pass over raw
   text;
4. optional mutual-best filter: keep (l, r) only when r is l's best
   match AND l is r's best (score DESC, id ASC tie-break) — the
   deterministic 1:1 assignment that greedy matching gives when both
   directions agree, without an iterative auction.

100 TB shape: candidate volume is sum over kept tokens of
df_l(t) x df_r(t) — bounded by df_cap, never |L| x |R|; everything
else is equi-joins and two windows over the candidate set. All
arithmetic integer (ppm), so the DuckDB twin re-derives every score
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SPLIT_RE = "[^a-z0-9]+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(rec_id, token) — distinct normalized word set per record."""
    words = F.split(F.lower(F.col(text_col)), _SPLIT_RE)
    return (
        df.select(
            F.col(id_col).alias("rec_id"),
            F.explode(
                F.array_distinct(F.filter(words, lambda w: w != ""))
            ).alias("token"),
        )
    )


def link_records(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    l_text: str,
    r_id: str,
    r_text: str,
    min_jaccard_ppm: int = 200_000,
    df_cap: int = 1000,
    mutual_best: bool = True,
) -> DataFrame:
    """Match ``left`` records to similar ``right`` records.

    Returns (l_id, r_id, shared_tokens, l_size, r_size, jaccard_ppm)
    with jaccard_ppm = floor(1e6 * |L ∩ R| / |L ∪ R|) over the capped
    token sets. Records must have unique ids within their side (the
    usual documented unique-id precondition — duplicate ids fan out).
    Records whose token set is empty (or all-capped) match nothing.
    """
    if df_cap < 1:
        raise ValueError(f"df_cap must be >= 1, got {df_cap}")
    if l_id == r_id:
        raise ValueError(
            f"l_id and r_id must differ (output columns collide): {l_id!r}"
        )
    if not (0 <= min_jaccard_ppm <= 1_000_000):
        raise ValueError(
            f"min_jaccard_ppm must be in [0, 1e6], got {min_jaccard_ppm}"
        )

    lt = _tokens(left, l_id, l_text)
    rt = _tokens(right, r_id, r_text)

    # document frequency over BOTH sides; tokens above the cap leave
    # the pipeline entirely (blocking and scoring) — stopword-grade
    # evidence is worth ~0 but costs df_l x df_r pairs
    df_tok = (
        lt.select("token").unionAll(rt.select("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= df_cap)
        .select("token")
    )
    lt = lt.join(df_tok, "token").localCheckpoint()
    rt = rt.join(df_tok, "token").localCheckpoint()

    l_sizes = lt.groupBy("rec_id").agg(F.count(F.lit(1)).alias("l_size"))
    r_sizes = rt.groupBy("rec_id").agg(F.count(F.lit(1)).alias("r_size"))

    shared = (
        lt.select(F.col("rec_id").alias("_l"), "token")
        .join(rt.select(F.col("rec_id").alias("_r"), "token"), "token")
        .groupBy("_l", "_r")
        .agg(F.count(F.lit(1)).alias("shared_tokens"))
    )
    scored = (
        shared.join(l_sizes.withColumnRenamed("rec_id", "_l"), "_l")
        .join(r_sizes.withColumnRenamed("rec_id", "_r"), "_r")
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "(shared_tokens * 1000000)"
                " div (l_size + r_size - shared_tokens)"
            ),
        )
        .filter(F.col("jaccard_ppm") >= min_jaccard_ppm)
    )
    if mutual_best:
        wl = Window.partitionBy("_l").orderBy(
            F.desc("jaccard_ppm"), F.asc("_r")
        )
        wr = Window.partitionBy("_r").orderBy(
            F.desc("jaccard_ppm"), F.asc("_l")
        )
        scored = (
            scored.withColumn("_rl", F.row_number().over(wl))
            .withColumn("_rr", F.row_number().over(wr))
            .filter((F.col("_rl") == 1) & (F.col("_rr") == 1))
            .drop("_rl", "_rr")
        )
    return scored.select(
        F.col("_l").alias(l_id),
        F.col("_r").alias(r_id),
        "shared_tokens",
        "l_size",
        "r_size",
        "jaccard_ppm",
    )


def _norm_text(col):
    """lower + non-alphanumeric runs to single spaces + trim — the
    same normal form on both engines (DuckDB twin: lower +
    regexp_replace(g) + trim)."""
    return F.trim(F.regexp_replace(F.lower(col), _SPLIT_RE, " "))


def link_records_edit(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    l_text: str,
    r_id: str,
    r_text: str,
    min_sim_ppm: int = 700_000,
    df_cap: int = 1000,
    mutual_best: bool = True,
) -> DataFrame:
    """Record linkage scored by NORMALIZED EDIT DISTANCE — the
    typo-level companion to :func:`link_records`: token Jaccard scores
    "acme corp" vs "acme crop" at 1/3 (one shared token of three),
    while character-level Levenshtein sees one transposition-ish edit.

    Same shared-token blocking as link_records (inverted index with
    the both-sides df_cap — candidate volume bounded by
    df_l(t) x df_r(t) per kept token, never |L| x |R|); each candidate
    pair is then scored ONCE on the normalized full strings:

        sim_ppm = 1e6 - (levenshtein(l, r) * 1e6)
                        div greatest(1, greatest(len(l), len(r)))

    — integer ppm, exactly re-derivable in the DuckDB twin (both
    engines implement classic unit-cost Levenshtein). Returns
    (l_id, r_id, edit_dist, l_len, r_len, sim_ppm).

    100 TB shape: blocking identical to link_records; scoring adds one
    broadcast-sized join per side to fetch the normalized strings and
    a JVM levenshtein per CANDIDATE (O(len^2) per pair — bounded by
    the block sizes, and records sharing zero rare tokens are never
    scored). A pair must share >= 1 sub-df_cap token to be considered:
    that is the recall contract (pure-typo pairs with NO intact shared
    token are out of scope — they need the n-gram LSH family instead).
    """
    if df_cap < 1:
        raise ValueError(f"df_cap must be >= 1, got {df_cap}")
    if l_id == r_id:
        raise ValueError(
            f"l_id and r_id must differ (output columns collide): {l_id!r}"
        )
    if not (0 <= min_sim_ppm <= 1_000_000):
        raise ValueError(
            f"min_sim_ppm must be in [0, 1e6], got {min_sim_ppm}"
        )
    lt = _tokens(left, l_id, l_text)
    rt = _tokens(right, r_id, r_text)
    df_tok = (
        lt.select("token").unionAll(rt.select("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= df_cap)
        .select("token")
    )
    cand = (
        lt.join(df_tok, "token")
        .select(F.col("rec_id").alias("_l"), "token")
        .join(
            rt.join(df_tok, "token").select(
                F.col("rec_id").alias("_r"), "token"
            ),
            "token",
        )
        .select("_l", "_r")
        .dropDuplicates(["_l", "_r"])
    )
    l_norm = left.select(
        F.col(l_id).alias("_l"), _norm_text(F.col(l_text)).alias("_lt")
    )
    r_norm = right.select(
        F.col(r_id).alias("_r"), _norm_text(F.col(r_text)).alias("_rt")
    )
    scored = (
        cand.join(l_norm, "_l")
        .join(r_norm, "_r")
        .select(
            "_l",
            "_r",
            F.levenshtein("_lt", "_rt").alias("edit_dist"),
            F.length("_lt").alias("l_len"),
            F.length("_rt").alias("r_len"),
        )
        .withColumn(
            "sim_ppm",
            F.lit(1_000_000)
            - F.expr(
                "(edit_dist * 1000000)"
                " div greatest(1, greatest(l_len, r_len))"
            ),
        )
        .filter(F.col("sim_ppm") >= min_sim_ppm)
    )
    if mutual_best:
        wl = Window.partitionBy("_l").orderBy(F.desc("sim_ppm"), F.asc("_r"))
        wr = Window.partitionBy("_r").orderBy(F.desc("sim_ppm"), F.asc("_l"))
        scored = (
            scored.withColumn("_rl", F.row_number().over(wl))
            .withColumn("_rr", F.row_number().over(wr))
            .filter((F.col("_rl") == 1) & (F.col("_rr") == 1))
            .drop("_rl", "_rr")
        )
    return scored.select(
        F.col("_l").alias(l_id),
        F.col("_r").alias(r_id),
        "edit_dist",
        "l_len",
        "r_len",
        "sim_ppm",
    )


def clustering_pair_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "node_id",
    pred_col: str = "pred_label",
    gold_col: str = "gold_label",
) -> DataFrame:
    """Pairwise clustering evaluation (the standard entity-resolution
    metric, e.g. Menestrina et al., "Evaluating Entity Resolution
    Results", VLDB 2010): treat every same-cluster item pair as a
    prediction and score it against the gold partition. ONE row out:

      (n_items, tp_pairs, pred_pairs, gold_pairs, fp_pairs, fn_pairs,
       precision_ppm, recall_ppm, f1_ppm)

    with TP = sum over (pred, gold) cells of C(n_pg, 2), pred/gold
    pair totals from their marginals, P = TP/pred_pairs,
    R = TP/gold_pairs, F1 = 2TP/(pred_pairs + gold_pairs) — all in
    trunc-ppm (NULL when the denominator is 0: an all-singletons
    prediction has undefined precision, not a fake 100%).

    Only items present in BOTH assignments are scored (inner join on
    ``id_col``; duplicate ids collapse to their first label via
    dropDuplicates — the caller's uniqueness contract, documented not
    checked). C(n,2) is computed in decimal(38,0): a 1e10-item
    cluster's pair count already overflows int64.

    100 TB shape: one id-keyed equi-join + three map-side-combined
    aggs (cells, pred marginals, gold marginals) + a 3-way 1-row
    combine. Nothing touches pairs materially — the quadratic pair
    SPACE is scored through the closed-form cell counts.
    """
    joined = (
        pred.select(
            F.col(id_col).alias("_id"), F.col(pred_col).alias("_p")
        )
        .dropDuplicates(["_id"])
        .join(
            gold.select(
                F.col(id_col).alias("_id"), F.col(gold_col).alias("_g")
            ).dropDuplicates(["_id"]),
            "_id",
        )
        .localCheckpoint()  # consumed by 3 aggregations
    )
    c2 = "CAST(n AS decimal(38,0)) * (CAST(n AS decimal(38,0)) - 1) / 2"
    cells = (
        joined.groupBy("_p", "_g")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr(c2)).cast("decimal(38,0)").alias("tp"))
    )
    pred_m = (
        joined.groupBy("_p")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.expr(c2)).cast("decimal(38,0)").alias("pp"),
            F.sum("n").alias("n_items"),
        )
    )
    gold_m = (
        joined.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr(c2)).cast("decimal(38,0)").alias("gp"))
    )
    ppm = lambda num, den: F.when(  # noqa: E731
        F.expr(den) > 0,
        F.expr(f"CAST(({num}) * 1000000 div ({den}) AS LONG)"),
    )
    return (
        cells.crossJoin(pred_m)
        .crossJoin(gold_m)
        .select(
            F.col("n_items").cast("long").alias("n_items"),
            F.col("tp").cast("long").alias("tp_pairs"),
            F.col("pp").cast("long").alias("pred_pairs"),
            F.col("gp").cast("long").alias("gold_pairs"),
            (F.col("pp") - F.col("tp")).cast("long").alias("fp_pairs"),
            (F.col("gp") - F.col("tp")).cast("long").alias("fn_pairs"),
            ppm("tp", "pp").alias("precision_ppm"),
            ppm("tp", "gp").alias("recall_ppm"),
            ppm("2 * tp", "pp + gp").alias("f1_ppm"),
        )
    )


def blocking_metrics(
    candidates: DataFrame,
    gold: DataFrame,
    cand_a: str = "a",
    cand_b: str = "b",
    id_col: str = "node_id",
    gold_col: str = "gold_label",
) -> DataFrame:
    """Blocking-quality evaluation (the standard ER blocker scorecard,
    Christen 2012 §7): ONE row —

      (n_candidates, n_true_pairs, n_candidate_true, n_total_pairs,
       pair_completeness_ppm, reduction_ratio_ppm)

    pair completeness = how many TRUE match pairs the blocker's
    candidate set retains (recall of the candidate generator);
    reduction ratio = how much of the quadratic N^2/2 comparison
    space it prunes. Together they grade ANY candidate generator here
    (minhash bands, shared-token blocks, SimHash pigeonholes, AllPairs
    prefixes) before the expensive scoring pass runs.

    Candidates are canonicalized ((least, greatest), dups collapse,
    self-pairs dropped) and ALL counted — pairs naming ids outside the
    gold universe still cost comparisons, they just can't be true.
    True pairs come from the gold partition's C(n_g, 2) cells,
    computed closed-form in decimal(38,0) (the clustering_pair_metrics
    discipline); NULL ppm on zero denominators, never a fake score.

    100 TB shape: one candidate dedup shuffle + two id-keyed label
    joins + label-sized aggs; the quadratic spaces are scored through
    closed forms, never materialized.
    """
    cand = (
        candidates.select(
            F.col(cand_a).cast("string").alias("x"),
            F.col(cand_b).cast("string").alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi")
        )
        .dropDuplicates()
        .localCheckpoint()  # counted + label-joined
    )
    g = gold.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(gold_col).cast("string").alias("_g"),
    ).dropDuplicates(["_id"])
    c2 = "CAST(n AS decimal(38,0)) * (CAST(n AS decimal(38,0)) - 1) / 2"
    true_tot = (
        g.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.expr(c2)).cast("decimal(38,0)").alias("tp"),
            F.sum("n").alias("n_ids"),
        )
    )
    cand_true = (
        cand.join(g.withColumnRenamed("_id", "lo"), "lo")
        .withColumnRenamed("_g", "g_lo")
        .join(
            g.withColumnRenamed("_id", "hi").withColumnRenamed("_g", "g_hi"),
            "hi",
        )
        .filter(F.col("g_lo") == F.col("g_hi"))
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("nc"))
    ppm = lambda num, den: F.when(  # noqa: E731
        F.expr(den) > 0,
        F.expr(f"CAST(({num}) * 1000000 div ({den}) AS LONG)"),
    )
    return (
        n_cand.crossJoin(true_tot)
        .crossJoin(cand_true)
        .select(
            F.col("nc").cast("long").alias("n_candidates"),
            F.col("tp").cast("long").alias("n_true_pairs"),
            F.col("ct").cast("long").alias("n_candidate_true"),
            F.expr(
                "CAST(CAST(n_ids AS decimal(38,0)) "
                "* (CAST(n_ids AS decimal(38,0)) - 1) / 2 "
                "AS decimal(38,0))"
            ).cast("long").alias("n_total_pairs"),
            ppm("ct", "tp").alias("pair_completeness_ppm"),
            ppm(
                "CAST(CAST(n_ids AS decimal(38,0)) "
                "* (CAST(n_ids AS decimal(38,0)) - 1) / 2 "
                "AS decimal(38,0)) - nc",
                "CAST(CAST(n_ids AS decimal(38,0)) "
                "* (CAST(n_ids AS decimal(38,0)) - 1) / 2 "
                "AS decimal(38,0))",
            ).alias("reduction_ratio_ppm"),
        )
    )
