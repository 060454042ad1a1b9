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
