"""Multiclass classification evaluation: confusion counts, per-class
precision / recall / F1, and the corpus summary (accuracy, macro
averages, Cohen's kappa).

The engine ships three classifier surfaces (textmetrics.language_id,
textmetrics.language_id_ngram, clf_train's quality keep/drop
threshold) and the reference consumes classifier verdicts throughout
its curation path — but nothing grades hard predictions against
ground-truth labels (calibration.calibration_metrics grades
*probabilities*; this grades *decisions*). Standard conventions:

- per class c: ``tp`` (label = pred = c), ``n_true`` (support),
  ``n_pred``; ``precision_ppm`` = tp/n_pred, ``recall_ppm`` =
  tp/n_true, ``f1_ppm`` = 2*tp/(n_true + n_pred) — the exact integer
  closed form of the harmonic mean after clearing denominators, so
  every per-class metric is ONE trunc-ppm division.
- a class missing from one side keeps honest NULLs there (precision
  undefined when never predicted, recall undefined when never true —
  never a fake 0), exactly like rankeval's unjudged-query NULLs.
- summary: ``accuracy_ppm`` = sum tp / N (for single-label multiclass
  this IS micro-P = micro-R = micro-F1, so no separate micro columns);
  ``macro_*_ppm`` = trunc mean over classes with NULL metrics
  zero-filled (sklearn's zero_division=0 convention, documented —
  macro punishes classes the classifier never gets right);
  ``kappa_ppm`` = Cohen's chance-corrected agreement
  (N*sum_tp - S) / (N^2 - S) with S = sum_c n_true_c * n_pred_c,
  SIGNED trunc in decimal(38,0) (kappa is negative under
  worse-than-chance agreement; both engines truncate toward zero),
  NULL when N^2 = S (chance agreement is total — e.g. a single
  class — and the correction is undefined).

Determinism discipline: all counts are exact int64; NULL labels or
predictions RAISE in-plan (lazy assert_true — a NULL silently lands
in its own phantom class and deflates every macro otherwise).

100 TB shape: ONE (label, pred)-keyed map-side-combined groupBy is
the only corpus-sized Exchange — the confusion table it emits is
C^2 rows for C classes, and everything downstream (two re-aggs, one
full-outer class join, the 1-row summary) runs on that. No UDFs, no
driver actions, no windows. Hot classes cost only their combiner
partials.

Reference anchor: the reference's own eval story stops at manual
inspection of extraction output (src/vss_ctx_rag/functions/rag —
no eval module exists); this operator supplies the missing grading
surface for any (label, pred) pair the engine produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(
    scored: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """The (label, pred, n) confusion table — the single corpus-sized
    aggregation every other metric here derives from. NULL labels or
    predictions RAISE (in-plan, lazy)."""
    checked = scored.select(
        F.col(label_col).cast("string").alias("label"),
        F.col(pred_col).cast("string").alias("pred"),
    ).withColumn(
        "_chk",
        F.assert_true(
            F.col("label").isNotNull() & F.col("pred").isNotNull(),
            F.lit("confusion_counts: NULL label/pred (phantom class)"),
        ),
    ).filter(F.col("_chk").isNull())
    return checked.groupBy("label", "pred").agg(
        F.count(F.lit(1)).alias("n")
    )


def classification_metrics(
    scored: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """Per-class precision/recall/F1 over the union of observed
    classes (truth-side or prediction-side). One row per class:
    (class, n_true, n_pred, tp, precision_ppm, recall_ppm, f1_ppm).
    """
    conf = confusion_counts(scored, label_col, pred_col)
    true_side = conf.groupBy(F.col("label").alias("class")).agg(
        F.sum("n").alias("n_true"),
        F.sum(F.when(F.col("label") == F.col("pred"), F.col("n"))).alias(
            "_tp_t"
        ),
    )
    pred_side = conf.groupBy(F.col("pred").alias("class")).agg(
        F.sum("n").alias("n_pred")
    )
    joined = true_side.join(pred_side, on="class", how="full_outer")
    base = joined.select(
        F.col("class"),
        F.coalesce(F.col("n_true"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce(F.col("_tp_t"), F.lit(0)).cast("long").alias("tp"),
    )
    return base.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        F.when(
            F.col("n_pred") > 0, F.expr("(tp * 1000000) div n_pred")
        ).alias("precision_ppm"),
        F.when(
            F.col("n_true") > 0, F.expr("(tp * 1000000) div n_true")
        ).alias("recall_ppm"),
        F.when(
            F.col("n_true") + F.col("n_pred") > 0,
            F.expr("(2 * tp * 1000000) div (n_true + n_pred)"),
        ).alias("f1_ppm"),
    )


def classification_summary(per_class: DataFrame) -> DataFrame:
    """One-row corpus roll-up of :func:`classification_metrics` output:
    (n_examples, n_classes, accuracy_ppm, macro_precision_ppm,
    macro_recall_ppm, macro_f1_ppm, kappa_ppm). Empty input yields the
    honest empty summary (zero counts, NULL metrics)."""
    dec = "decimal(38,0)"
    return per_class.agg(
        F.coalesce(F.sum("n_true"), F.lit(0)).cast("long").alias("_n"),
        F.count(F.lit(1)).cast("int").alias("n_classes"),
        F.coalesce(F.sum("tp"), F.lit(0)).cast("long").alias("_tp"),
        F.coalesce(
            F.sum(F.col("n_true").cast(dec) * F.col("n_pred").cast(dec)),
            F.lit(0).cast(dec),
        ).alias("_s"),
        F.sum(F.coalesce("precision_ppm", F.lit(0))).alias("_sp"),
        F.sum(F.coalesce("recall_ppm", F.lit(0))).alias("_sr"),
        F.sum(F.coalesce("f1_ppm", F.lit(0))).alias("_sf"),
    ).select(
        F.col("_n").alias("n_examples"),
        F.col("n_classes"),
        F.when(F.col("_n") > 0, F.expr("(_tp * 1000000) div _n")).alias(
            "accuracy_ppm"
        ),
        F.when(
            F.col("n_classes") > 0, F.expr("_sp div n_classes")
        ).alias("macro_precision_ppm"),
        F.when(
            F.col("n_classes") > 0, F.expr("_sr div n_classes")
        ).alias("macro_recall_ppm"),
        F.when(
            F.col("n_classes") > 0, F.expr("_sf div n_classes")
        ).alias("macro_f1_ppm"),
        F.when(
            F.expr(f"cast(_n as {dec}) * cast(_n as {dec})") != F.col("_s"),
            F.expr(
                f"cast((cast(_n as {dec}) * cast(_tp as {dec})"
                f" - cast(_s as {dec})) * 1000000"
                f" div (cast(_n as {dec}) * cast(_n as {dec})"
                f" - cast(_s as {dec})) as bigint)"
            ),
        ).alias("kappa_ppm"),
    )
