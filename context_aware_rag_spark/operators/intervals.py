"""Bucketed range join — point-in-interval matching at scale.

Spark has no range-join optimization (Databricks' RANGE_JOIN hint is
proprietary): a plain ``p BETWEEN s AND e`` join with no equi-key
plans as BroadcastNestedLoopJoin (or a cartesian product), which is
O(|points| x |intervals|) — unusable at 100 TB. The classic fix is
interval bucketing:

    bucket width w → every interval [s, e] is exploded into the
    buckets it touches (floor(s/w) .. floor(e/w), a bounded fan-out
    when interval length is bounded by ~w); every point lands in
    exactly ONE bucket → equi-join on bucket (+ optional real keys)
    → residual filter s <= p <= e.

The join becomes a plain shuffled hash/sort-merge join on an integer
key that AQE can re-plan and skew-split; the fan-out factor is
len/w + 1 per interval, chosen by the caller to match the interval
length distribution. Each (point, interval) match is produced exactly
once — a point exists in one bucket only, so no post-join dedup is
needed.

100 TB shape: cost is one explode projection (narrow) + one equi
shuffle on bucket; intermediate size is |points| + |intervals| x
avg_fanout, versus the nested-loop product. Pick ``bucket_width``
near the p95 interval length so avg_fanout stays ~2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: "list[tuple[str, str]] | None" = None,
) -> DataFrame:
    """Inner join of ``points`` rows to every ``intervals`` row whose
    [start_col, end_col] contains the point (inclusive on both ends),
    optionally also matching on equi-keys ``[(point_key, interval_key),
    ...]``. The three range columns must be integer-valued (cast dates
    to days / timestamps to epoch seconds first); intervals with
    end < start or NULL bounds match nothing, NULL points match
    nothing.

    Returns all columns of ``points`` then all non-duplicate columns
    of ``intervals``.
    """
    if bucket_width < 1:
        raise ValueError(f"need bucket_width >= 1, got {bucket_width}")
    keys = keys or []
    for pk, ik in keys:
        if pk not in points.columns or ik not in intervals.columns:
            raise ValueError(f"key pair ({pk}, {ik}) not present")
    overlap = [
        c for c in intervals.columns
        if c in points.columns and c not in [ik for _, ik in keys]
    ]
    if overlap:
        raise ValueError(
            f"column collision between points and intervals: {overlap}"
        )

    p = points.filter(F.col(point_col).isNotNull()).withColumn(
        "_rj_bucket", F.floor(F.col(point_col).cast("long") / bucket_width)
    )
    iv = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    ).withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / bucket_width),
                F.floor(F.col(end_col).cast("long") / bucket_width),
            )
        ),
    )
    cond = [p["_rj_bucket"] == iv["_rj_bucket"]]
    for pk, ik in keys:
        cond.append(p[pk] == iv[ik])
    joined = p.join(iv, cond, "inner").filter(
        (p[point_col] >= iv[start_col]) & (p[point_col] <= iv[end_col])
    )
    dropped = {ik for _, ik in keys}
    out_cols = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in dropped
    ]
    return joined.select(*out_cols)


def coverage_counts(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Per distinct point value: how many intervals cover it
    (inclusive). Points covered by nothing are kept with count 0 —
    the common "occupancy per timestamp" shape. One bucketed range
    join + one count aggregation."""
    pts = points.select(F.col(point_col)).dropDuplicates()
    matched = range_join_points(
        pts,
        intervals.select(start_col, end_col),
        point_col,
        start_col,
        end_col,
        bucket_width,
    )
    counts = matched.groupBy(point_col).agg(
        F.count(F.lit(1)).alias("n_covering")
    )
    return pts.join(counts, point_col, "left").select(
        point_col,
        F.coalesce("n_covering", F.lit(0)).cast("long").alias("n_covering"),
    )


def range_join_intervals(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    keys: "list[tuple[str, str]] | None" = None,
) -> DataFrame:
    """Inner join of every ``left`` interval to every ``right``
    interval it overlaps (inclusive: l_start <= r_end AND r_start <=
    l_end), optionally under equi-keys ``[(left_key, right_key), ...]``.
    Bounds must be integer-valued; rows with NULL or inverted bounds
    match nothing.

    Exactly-once ownership: two overlapping intervals both contain
    max(l_start, r_start), so both bucket lists contain its bucket —
    the pair is emitted only from that owner bucket
    (``bucket == floor(greatest(l_start, r_start) / w)``), never from
    the other shared buckets, so no post-join dedup (and no dedup
    losing legitimately duplicate input rows).

    100 TB shape: both sides explode by len/w + 1 and meet in ONE
    equi shuffle on (bucket, keys) that AQE can skew-split — versus
    the BroadcastNestedLoopJoin a raw overlap predicate plans. Pick
    ``bucket_width`` near the p95 interval length of the LONGER side;
    fan-out is linear in interval length, never quadratic in row
    count.
    """
    if bucket_width < 1:
        raise ValueError(f"need bucket_width >= 1, got {bucket_width}")
    keys = keys or []
    for lk, rk in keys:
        if lk not in left.columns or rk not in right.columns:
            raise ValueError(f"key pair ({lk}, {rk}) not present")
    overlap_cols = [
        c for c in right.columns
        if c in left.columns and c not in [rk for _, rk in keys]
    ]
    if overlap_cols:
        raise ValueError(
            f"column collision between left and right: {overlap_cols}"
        )

    def _explode(df, s, e):
        return df.filter(
            F.col(s).isNotNull()
            & F.col(e).isNotNull()
            & (F.col(e) >= F.col(s))
        ).withColumn(
            "_rj_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s).cast("long") / bucket_width),
                    F.floor(F.col(e).cast("long") / bucket_width),
                )
            ),
        )

    lf = _explode(left, l_start, l_end)
    rf = _explode(right, r_start, r_end)
    cond = [lf["_rj_bucket"] == rf["_rj_bucket"]]
    for lk, rk in keys:
        cond.append(lf[lk] == rf[rk])
    owner = F.floor(
        F.greatest(
            lf[l_start].cast("long"), rf[r_start].cast("long")
        ) / bucket_width
    )
    joined = lf.join(rf, cond, "inner").filter(
        (lf[l_start] <= rf[r_end])
        & (rf[r_start] <= lf[l_end])
        & (lf["_rj_bucket"] == owner)
    )
    dropped = {rk for _, rk in keys}
    out_cols = [lf[c] for c in left.columns] + [
        rf[c] for c in right.columns if c not in dropped
    ]
    return joined.select(*out_cols)
