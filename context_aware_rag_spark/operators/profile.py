"""One-pass table profiling — the data-quality census a curation
pipeline runs before and after every transform (null drift, distinct
collapse, value-range drift, payload shrinkage are the four standard
regression signals on a 100 TB refresh).

All statistics for all columns come from ONE aggregation over ONE
scan: per column count / distinct / min / max / total string length,
pivoted to long format driver-side-free with ``stack``. Exact distinct
counts plan as a single Expand (one extra shuffle pass, the standard
multi-distinct strategy); for trillion-row profiling swap in the
bounded-state sketches (:mod:`.sketches` HLL / KMV) per column.

min/max are computed on the NATIVE type (so numeric columns order
numerically) and cast to string only for the uniform output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: "list[str] | None" = None
) -> DataFrame:
    """Long-format profile: one row per column —
    (column, n_rows, n_nonnull, n_nulls, n_distinct, min_value,
    max_value, avg_len_x100). ``avg_len_x100`` is the average string
    length of non-null values in integer hundredths (int64 div — no
    FP, engine-portable); NULL min/max/avg for all-null columns."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"_cnt_{i}"),
            F.countDistinct(F.col(c)).alias(f"_dst_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{i}"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"_len_{i}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        "_n_rows",
        F.expr(
            "stack({n}, {args}) AS (column, n_nonnull, n_distinct, "
            "min_value, max_value, _len_sum)".format(
                n=len(cols),
                args=", ".join(
                    "'{}', _cnt_{}, _dst_{}, _min_{}, _max_{}, _len_{}".format(
                        c.replace("'", "''"), i, i, i, i, i
                    )
                    for i, c in enumerate(cols)
                ),
            )
        ),
    )
    return stacked.select(
        "column",
        F.col("_n_rows").alias("n_rows"),
        "n_nonnull",
        (F.col("_n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
        F.when(
            F.col("n_nonnull") > 0,
            F.expr("_len_sum * 100 div n_nonnull"),
        ).alias("avg_len_x100"),
    )


def check_expectations(
    df: DataFrame, rules: "dict[str, object]"
) -> DataFrame:
    """Declarative data-quality gate: ``rules`` maps rule name to a
    boolean Column over the frame's columns; returns one row per rule
    — (rule, n_rows, n_violations, violation_ppm, passed) — from ONE
    aggregation over ONE scan (a NULL rule result counts as a
    violation: unknown is not a pass).

    The before/after-transform counterpart to :func:`profile_table`:
    assert the invariants you know ("ids non-null", "ts within
    range", "score in [0,1]") instead of eyeballing a census. Integer
    ppm — no FP.
    """
    if not rules:
        raise ValueError("need at least one rule")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for i, name in enumerate(names):
        aggs.append(
            F.sum(
                F.when(F.coalesce(rules[name], F.lit(False)), 0).otherwise(1)
            ).alias(f"_viol_{i}")
        )
    row = df.agg(*aggs)
    stacked = row.select(
        "_n_rows",
        F.expr(
            "stack({n}, {args}) AS (rule, n_violations)".format(
                n=len(names),
                args=", ".join(
                    "'{}', _viol_{}".format(name.replace("'", "''"), i)
                    for i, name in enumerate(names)
                ),
            )
        ),
    )
    return stacked.select(
        "rule",
        F.col("_n_rows").alias("n_rows"),
        F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
        F.when(
            F.col("_n_rows") > 0,
            F.expr("coalesce(n_violations, 0) * 1000000 div _n_rows"),
        ).otherwise(F.lit(0)).cast("long").alias("violation_ppm"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )
