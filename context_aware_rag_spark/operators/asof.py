"""As-of (point-in-time) join — the time-series enrichment primitive.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive Spark
spelling — range join + latest-per-pair dedup — explodes to
|left| x |right-per-key| intermediate rows. This is the scalable
union-window formulation instead:

    tag left / right rows → union → ONE window per key ordered by
    (ts, right-first) → last(right-row STRUCT, ignorenulls) → keep
    left rows

Each left row is matched to the most recent right row with
right_ts <= left_ts (backward as-of, inclusive) in a single shuffle
keyed on the join key, cost O(|left| + |right|) — no pair blow-up,
no per-key driver loop. The matched right columns are carried as ONE
struct, so a right row whose individual value columns contain NULLs
is still matched atomically (per-column last(ignorenulls) would
stitch values from DIFFERENT right rows). Skew is bounded by the
hottest key's combined row count, same profile as any per-key window.

Precondition (documented, not silently resolved): the right side must
be unique per (key, ts) — duplicate timestamps would make "the" match
ambiguous. Deduplicate deterministically first (e.g. keep max id per
(key, ts)); ``dedup_right_latest`` does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_right_latest(
    right: DataFrame, key_col: str, ts_col: str, tiebreak_col: str
) -> DataFrame:
    """One row per (key, ts): the max-``tiebreak_col`` row's values
    (a deterministic groupBy max/max_by reduction — no window)."""
    others = [
        c for c in right.columns if c not in (key_col, ts_col, tiebreak_col)
    ]
    return right.groupBy(key_col, ts_col).agg(
        F.max(tiebreak_col).alias(tiebreak_col),
        *[F.max_by(c, tiebreak_col).alias(c) for c in others],
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_col_left: str,
    key_col_right: str,
    left_ts_col: str,
    right_ts_col: str,
    right_value_cols: "list[str]",
) -> DataFrame:
    """LEFT as-of join: every left row, enriched with ``right_value_cols``
    from the latest right row where ``right_ts <= left_ts`` on the same
    key (NULLs when no right row precedes). Equal timestamps match
    (inclusive), implemented by sorting right rows before left rows at
    the same instant."""
    right_struct = F.struct(*[F.col(c) for c in right_value_cols])
    left_struct_type = (
        "struct<"
        + ",".join(
            f"`{f.name}`:{f.dataType.simpleString()}" for f in left.schema
        )
        + ">"
    )
    # field order must follow right_value_cols (the struct literal's
    # order), not the right schema's, or the union's types conflict
    right_struct_type = (
        "struct<"
        + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}"
            for c in right_value_cols
        )
        + ">"
    )
    left_tagged = left.select(
        F.col(key_col_left).alias("_asof_key"),
        F.col(left_ts_col).cast("timestamp").alias("_asof_ts"),
        F.lit(0).alias("_asof_is_right"),
        F.lit(None).cast(right_struct_type).alias("_asof_right"),
        F.struct(*left.columns).alias("_asof_left"),
    )
    right_tagged = right.select(
        F.col(key_col_right).alias("_asof_key"),
        F.col(right_ts_col).cast("timestamp").alias("_asof_ts"),
        F.lit(1).alias("_asof_is_right"),
        right_struct.alias("_asof_right"),
        F.lit(None).cast(left_struct_type).alias("_asof_left"),
    )
    w = (
        Window.partitionBy("_asof_key")
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left_tagged.unionByName(right_tagged).select(
        "_asof_is_right",
        "_asof_left",
        F.last("_asof_right", ignorenulls=True).over(w).alias("_asof_right"),
    )
    return carried.filter(F.col("_asof_is_right") == 0).select(
        *[F.col(f"_asof_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof_right.{c}").alias(c) for c in right_value_cols],
    )
