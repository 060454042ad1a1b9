"""Probability-calibration evaluation for learned filters.

The curation stack applies the learned quality classifier
(textmetrics.quality_classifier / clf_train) as a keep/drop gate; the
gate's threshold is only meaningful if the probabilities are
calibrated — a 0.9 should be right ~90% of the time. This is the
standard reliability-diagram battery (Guo et al., ICML 2017
conventions): equal-width confidence bins, per-bin confidence vs
accuracy, expected calibration error, Brier score.

Determinism discipline: per-row floats (the classifier's ``prob`` is
float-bit-exact cross-engine by construction) are floored to integer
micro IMMEDIATELY — ``floor(prob * 1e6)`` and
``floor((prob - y)^2 * 1e6)`` are single fixed-order IEEE operations
on identical bits, so the int64 sums that follow are
partitioning-independent and SQL-twin-exact. All ratios are trunc
``div``. Bin assignment is ``least(floor(prob * n_bins), n_bins - 1)``
so prob = 1.0 lands in the top bin instead of overflowing. Labels and
probabilities are validated in-plan (lazy assert_true): a prob outside
[0, 1] or a label outside {0, 1} poisons every bin silently otherwise.

100 TB shape: one narrow map (bin, micro conversions) + ONE
map-side-combined groupBy bounded at n_bins output rows; the summary
is a second agg over those n_bins rows. No window, no join, no UDFs,
no driver actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_metrics(
    scored: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin reliability rows: (bin, n, n_pos, conf_ppm, acc_ppm,
    gap_ppm, sum_prob_micro, sum_sq_err_micro). ``conf_ppm`` is the
    bin's mean predicted probability, ``acc_ppm`` its empirical
    positive rate, ``gap_ppm`` = conf - acc (signed: positive =
    overconfident). Empty bins are absent (nothing to report), not
    zero-filled.
    """
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1: {n_bins}")

    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("long")
    guarded = scored.select(
        F.when(
            F.assert_true(
                p.isNotNull() & (p >= 0.0) & (p <= 1.0),
                F.lit(f"calibration_metrics: {prob_col} must be in [0, 1]"),
            ).isNull(),
            p,
        ).alias("_p"),
        F.when(
            F.assert_true(
                y.isin(0, 1),
                F.lit(f"calibration_metrics: {label_col} must be 0/1"),
            ).isNull(),
            y,
        ).alias("_y"),
    )
    binned = guarded.select(
        F.least(
            F.floor(F.col("_p") * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.floor(F.col("_p") * 1_000_000).cast("long").alias("_p_micro"),
        F.floor(
            (F.col("_p") - F.col("_y")) * (F.col("_p") - F.col("_y"))
            * 1_000_000
        ).cast("long").alias("_sq_micro"),
        F.col("_y"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.sum("_p_micro").alias("sum_prob_micro"),
            F.sum("_sq_micro").alias("sum_sq_err_micro"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("sum_prob_micro div n").alias("conf_ppm"),
            F.expr("(n_pos * 1000000L) div n").alias("acc_ppm"),
            (
                F.expr("sum_prob_micro div n")
                - F.expr("(n_pos * 1000000L) div n")
            ).alias("gap_ppm"),
            "sum_prob_micro",
            "sum_sq_err_micro",
        )
    )


def calibration_summary(bins: DataFrame) -> DataFrame:
    """One-row roll-up of calibration_metrics: (n, ece_ppm, brier_ppm,
    base_rate_ppm). ECE = sum_b (n_b * |gap_b|) div N — the standard
    bin-weighted expected calibration error; Brier = total squared
    error div N. NULL metrics on an empty frame (unscorable)."""
    return bins.agg(
        F.sum("n").alias("n"),
        F.expr(
            "sum(n * abs(gap_ppm)) div sum(n)"
        ).alias("ece_ppm"),
        F.expr("sum(sum_sq_err_micro) div sum(n)").alias("brier_ppm"),
        F.expr("(sum(n_pos) * 1000000L) div sum(n)").alias("base_rate_ppm"),
    )
