"""Generation-quality evaluation: ROUGE-N over candidate/reference
pairs.

The reference's summarization family (vss_ctx_rag
functions/summarization/*) emits text the pipeline never scores; a
training/eval corpus pipeline needs the standard overlap metric to
grade summaries, compressions and retrieved contexts against
references at corpus scale. ROUGE-N (Lin 2004) is the n-gram
clipped-overlap family: clipped = sum_g min(count_cand(g),
count_ref(g)), recall = clipped/ref_grams, precision =
clipped/cand_grams, F = 2*clipped/(cand+ref) (the exact harmonic
mean, no float intermediate).

Determinism discipline: tokenization is the repo-wide normalization
(dedup.normalized_text — lower, strip punctuation to spaces, collapse
whitespace; bit-identical to the DuckDB twin's _NORM_SQL), counts and
ppm scores are integers with trunc division, NULL (never a fake
score) when a side has no grams.

100 TB shape: one narrow map builds both gram multisets per pair,
then ONE explode keyed by (pair ids, gram) feeds ONE
map-side-combined agg — shuffle volume is total token count, the
same budget as any n-gram operator here; a left join back to the
pair frame keeps gramless pairs. No UDFs, no driver actions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def _gram_array(text_col, n: int):
    """Contiguous word n-grams WITH multiplicity (counts matter for
    clipping); empty array when the text has fewer than n words.
    sequence(1, m) would count DOWN for m < 1 — guard explicitly."""
    words = F.split(normalized_text(text_col), " ")
    m = F.size(words) - (n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def rouge_n_scores(
    pairs: DataFrame,
    id_cols: Sequence[str] = ("pair_id",),
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
    n: int = 2,
) -> DataFrame:
    """Per-pair ROUGE-N: (*id_cols, cand_grams, ref_grams,
    clipped_overlap, precision_ppm, recall_ppm, f_ppm). ``id_cols``
    must uniquely key the pair rows (the caller's contract — a
    duplicate key would merge two pairs' gram counts).
    """
    if n < 1:
        raise ValueError(f"rouge_n_scores: need n >= 1, got {n}")
    if not id_cols:
        raise ValueError("rouge_n_scores: need at least one id column")
    ids = list(id_cols)
    base = pairs.select(
        *ids,
        _gram_array(F.col(cand_col), n).alias("_cg"),
        _gram_array(F.col(ref_col), n).alias("_rg"),
    ).localCheckpoint()  # consumed twice (sizes + explode)
    sides = base.select(
        *ids, F.explode("_cg").alias("gram"), F.lit(1).alias("_c"),
        F.lit(0).alias("_r"),
    ).unionAll(
        base.select(
            *ids, F.explode("_rg").alias("gram"), F.lit(0).alias("_c"),
            F.lit(1).alias("_r"),
        )
    )
    clipped = (
        sides.groupBy(*ids, "gram")
        .agg(F.sum("_c").alias("c"), F.sum("_r").alias("r"))
        .groupBy(*ids)
        .agg(F.sum(F.least("c", "r")).alias("clipped_overlap"))
    )
    ppm = lambda num, den: F.when(  # noqa: E731
        F.expr(den) > 0,
        F.expr(f"CAST(({num}) * 1000000 div ({den}) AS LONG)"),
    )
    scored = (
        base.select(
            *ids,
            F.size("_cg").cast("long").alias("cand_grams"),
            F.size("_rg").cast("long").alias("ref_grams"),
        )
        .join(clipped, ids, "left")
        .withColumn(
            "clipped_overlap",
            F.coalesce("clipped_overlap", F.lit(0)).cast("long"),
        )
    )
    return scored.select(
        *ids,
        "cand_grams",
        "ref_grams",
        "clipped_overlap",
        ppm("clipped_overlap", "cand_grams").alias("precision_ppm"),
        ppm("clipped_overlap", "ref_grams").alias("recall_ppm"),
        ppm("2 * clipped_overlap", "cand_grams + ref_grams").alias("f_ppm"),
    )


def _char_gram_array(chars_col, n: int):
    """Contiguous character n-grams WITH multiplicity over an
    already-normalized, space-stripped string; empty array when the
    string is shorter than n (same sequence(1, m<1) counts-down guard
    as the word-gram builder above)."""
    m = F.length(chars_col) - (n - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: chars_col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def chrf_scores(
    pairs: DataFrame,
    id_cols: Sequence[str] = ("pair_id",),
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
    max_n: int = 6,
    beta_sq: int = 4,
) -> DataFrame:
    """Per-pair chrF (Popović, WMT 2015) — the character-n-gram
    F-score that grades morphology-level overlap word-token metrics
    miss (inflection variants, typos, agglutination). Character
    1..max_n-grams are taken over the repo-wide normalization with
    spaces REMOVED (the chrF convention: word boundaries carry no
    signal at the character level); per order n

        clip_n = sum_g min(count_cand(g), count_ref(g))
        F_n    = (1 + beta_sq) * clip_n / (beta_sq * ref_n + cand_n)

    — the exact closed form of (1+b)PR/(bP+R) after clearing the
    P = clip/cand, R = clip/ref denominators, so every level score is
    one integer trunc-ppm division (beta_sq = beta^2 = 4 is the
    standard recall-doubled chrF2). chrf_ppm is the trunc mean over
    the INCLUDED levels: a level with zero grams on BOTH sides is
    excluded (a short pair is scored at the orders it can express,
    never padded with fake zeros); a level where only one side is
    empty scores an honest 0 AND stays in the mean. NOTE — this
    DELIBERATELY differs from sacreBLEU's effective-order rule, which
    drops any order where EITHER side lacks n-grams: under that rule a
    candidate much shorter than max_n characters is never penalized at
    the orders it cannot express, so e.g. a one-char candidate against
    a long reference scores only at order 1. Here the mismatch is kept
    as a 0-valued level (a length-mismatch penalty); expect chrF
    values to diverge from sacreBLEU whenever either text is shorter
    than max_n characters. The SQL twin (chrf_excerpt_eval) pins this
    contract. NULL chrf when no level is scorable (both texts empty).

    100 TB shape: identical to rouge_n_scores — one narrow map builds
    the char strings, 2*max_n explode branches over the checkpointed
    base union into ONE (ids, n, gram)-keyed map-side-combined agg
    (shuffle volume = max_n * total chars — the documented cost of
    the full chrF order family), level sizes come straight from
    length() arithmetic (no second explode), and one ids-keyed agg
    rolls up. No UDFs, no driver actions.
    """
    if max_n < 1:
        raise ValueError(f"chrf_scores: need max_n >= 1, got {max_n}")
    if beta_sq < 0:
        raise ValueError(f"chrf_scores: need beta_sq >= 0, got {beta_sq}")
    if not id_cols:
        raise ValueError("chrf_scores: need at least one id column")
    ids = list(id_cols)

    chars = lambda c: F.replace(  # noqa: E731
        normalized_text(c), F.lit(" "), F.lit("")
    )
    base = pairs.select(
        *ids,
        chars(F.col(cand_col)).alias("_cc"),
        chars(F.col(ref_col)).alias("_rc"),
    ).localCheckpoint()  # consumed 2*max_n + 1 times

    side_frames = []
    for n in range(1, max_n + 1):
        side_frames.append(
            base.select(
                *ids, F.lit(n).alias("n"),
                F.explode(_char_gram_array(F.col("_cc"), n)).alias("gram"),
                F.lit(1).alias("_c"), F.lit(0).alias("_r"),
            )
        )
        side_frames.append(
            base.select(
                *ids, F.lit(n).alias("n"),
                F.explode(_char_gram_array(F.col("_rc"), n)).alias("gram"),
                F.lit(0).alias("_c"), F.lit(1).alias("_r"),
            )
        )
    sides = side_frames[0]
    for f in side_frames[1:]:
        sides = sides.unionAll(f)
    clipped = (
        sides.groupBy(*ids, "n", "gram")
        .agg(F.sum("_c").alias("c"), F.sum("_r").alias("r"))
        .groupBy(*ids, "n")
        .agg(F.sum(F.least("c", "r")).cast("long").alias("_clip"))
    )

    levels = base.select(
        *ids,
        F.explode(
            F.array(*[F.lit(n) for n in range(1, max_n + 1)])
        ).alias("n"),
        F.length("_cc").alias("_lc"),
        F.length("_rc").alias("_lr"),
    ).select(
        *ids, "n",
        F.greatest(F.col("_lc") - F.col("n") + 1, F.lit(0))
        .cast("long").alias("_tc"),
        F.greatest(F.col("_lr") - F.col("n") + 1, F.lit(0))
        .cast("long").alias("_tr"),
    )
    per_level = (
        levels.join(clipped, [*ids, "n"], "left")
        .withColumn("_clip", F.coalesce("_clip", F.lit(0)).cast("long"))
        .withColumn(
            "_f_ppm",
            # the guard is the F-denominator itself (not tc+tr) so the
            # beta_sq=0 precision degenerate can't divide by zero on a
            # ref-only level — for any beta_sq >= 1 the two guards are
            # equivalent
            F.when(
                F.lit(beta_sq) * F.col("_tr") + F.col("_tc") > 0,
                F.expr(
                    f"(({1 + beta_sq} * _clip) * 1000000)"
                    f" div ({beta_sq} * _tr + _tc)"
                ),
            ),
        )
    )
    return per_level.groupBy(*ids).agg(
        F.sum(
            F.when(F.col("_f_ppm").isNotNull(), 1).otherwise(0)
        ).cast("int").alias("n_levels"),
        F.sum(F.col("_tc")).alias("cand_grams"),
        F.sum(F.col("_tr")).alias("ref_grams"),
        F.sum(F.col("_clip")).alias("clipped_overlap"),
        F.expr(
            "CASE WHEN sum(CASE WHEN _f_ppm IS NOT NULL THEN 1 ELSE 0 END)"
            " > 0 THEN sum(coalesce(_f_ppm, 0))"
            " div sum(CASE WHEN _f_ppm IS NOT NULL THEN 1 ELSE 0 END)"
            " END"
        ).alias("chrf_ppm"),
    )
