"""Corpus-trained n-gram language-model perplexity scoring.

CCNet-style quality signal (Wenzek et al. 2020 §4.3: per-document LM
perplexity drives the head/middle/tail quality split used to cull web
corpora before LLM training). The reference engine has no LM scoring —
this extends the training-data culling family (textmetrics / dedup)
with the standard third leg: dedup, rule filters, perplexity.

Instead of an external pretrained LM (unavailable and non-reproducible
here), the LM is trained ON THE CORPUS ITSELF in the same job — an
add-alpha-smoothed word bigram model. That keeps everything inside two
map-side-combined aggregations plus equi-joins, and makes the whole
computation expressible in ANSI SQL for the DuckDB oracle twin.

Determinism discipline: each bigram occurrence's log-probability is
rounded to integer MICRO-NATS (``round(ln(p) * 1e6)`` as BIGINT)
*before* the per-document sum, so the aggregate is order-independent
exact integer arithmetic — no float-summation-order hazard between
Spark and the SQL twin. The float→int rounding itself is safe: both
engines compute ``ln`` of the identical IEEE-754 ratio via libm.

100 TB shape: occurrences collapse to per-(doc, bigram) counts in one
map-side-combined shuffle; bigram counts aggregate that frame (keyed
on grams, bounded by vocabulary) and context totals come from a
window over the bigram frame itself; the per-bigram log-prob table
is assembled vocabulary-side (the Zipf-hot w1 window runs over
DISTINCT bigrams, never occurrences — see the skew note in the body)
and the single corpus-sized join is doc_pairs x lp_table on the full
(w1, w2) key, whose skew is the hottest BIGRAM (orders of magnitude
milder than the hottest word; AQE covers the residue). The vocab size
is a 1-row broadcast. No UDF anywhere — the whole plan is JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(text_col):
    # identical convention to textmetrics._words / the SQL twins'
    # regexp_split_to_array(lower(trim(text)), '\s+')
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document bigram-LM log-probability and perplexity.

    P(w2|w1) = (c(w1,w2) + alpha) / (c(w1·) + alpha·V) with V = corpus
    vocabulary size; counts come from the scored corpus itself.

    Returns (id_col, n_bigrams, logprob_micro, ppl):
      - ``logprob_micro``: sum over the doc's bigram occurrences of
        round(ln(P) * 1e6) — exact integers, order-independent.
      - ``ppl`` = round(exp(-logprob_micro/1e6 / n_bigrams), 4).

    Documents with fewer than two tokens emit no bigrams and are absent
    (same as the SQL twin). Low ppl = fluent/typical text ("head" of
    the CCNet split); high ppl = atypical/garbled ("tail").
    """
    words = _words(F.col(text_col))
    # parallel-slice zip: (w1, w2) pairs without an index transform
    pairs = (
        docs.select(
            F.col(id_col),
            F.when(
                F.size(words) >= 2,
                F.arrays_zip(
                    F.slice(words, 1, F.size(words) - 1).alias("w1"),
                    F.slice(words, 2, F.size(words) - 1).alias("w2"),
                ),
            )
            .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            .alias("bi"),
        )
        .select(F.col(id_col), F.explode("bi").alias("bi"))
        .select(F.col(id_col), F.col("bi.w1").alias("w1"), F.col("bi.w2").alias("w2"))
    )
    # SKEW DISCIPLINE: never join per-OCCURRENCE rows on a word key —
    # Zipf makes the hottest w1 ("the") a single straggler task that
    # caps scaling (measured: the occurrence-joined shape scaled 1.46x
    # from 4->16 cores at 100k docs; this shape restored the family to
    # >=0.8). Instead: (1) collapse occurrences to per-(doc, bigram)
    # counts ONCE — this frame feeds the bigram agg, the context agg
    # and the scoring join; (2) build a vocabulary-bounded per-bigram
    # log-prob table (context totals window over DISTINCT bigrams per
    # w1, not occurrences); (3) join doc counts to the lp
    # table and weight by c. sum_c(round(lp)) == c * round(lp), so the
    # result is bit-identical to per-occurrence scoring.
    doc_pairs = (
        pairs.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    bigram_counts = doc_pairs.groupBy("w1", "w2").agg(F.sum("c").alias("c_big"))
    vocab = (
        docs.select(F.explode(words).alias("word"))
        .agg(F.countDistinct("word").alias("vocab"))
    )
    # context totals via a window over the (vocabulary-bounded) bigram
    # frame instead of a second full aggregation pass over doc_pairs +
    # a join: sum_w2(c_big) grouped by w1 == sum(doc_pairs.c) grouped
    # by w1 — exact integer arithmetic, bit-identical lp_micro. The
    # window's hash(w1) exchange carries DISTINCT bigrams only (the old
    # context agg re-shuffled the corpus-gram-sized doc_pairs frame,
    # and the w1 equi-join it fed is gone entirely). Skew bound: the
    # hottest w1's partition holds its distinct successors — vocabulary
    # scale, never occurrence scale.
    lp_table = (
        bigram_counts
        .withColumn("c_ctx", F.sum("c_big").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c_big") + F.lit(float(alpha)))
                    / (F.col("c_ctx") + F.lit(float(alpha)) * F.col("vocab"))
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    scored = doc_pairs.join(lp_table, ["w1", "w2"]).select(
        F.col(id_col),
        F.col("c"),
        (F.col("c") * F.col("lp_micro")).alias("lp_sum"),
    )
    return scored.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.sum("lp_sum").alias("logprob_micro"),
        F.round(
            F.exp(
                -(F.sum("lp_sum") / F.lit(1000000.0)) / F.sum("c")
            ),
            4,
        ).alias("ppl"),
    )
