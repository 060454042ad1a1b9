"""Keyed snapshot diff — the incremental-materialization primitive.

The reference rebuilds its graph DB state per ingestion run and
exposes no way to see what an ingest changed (graph_db rewrites are
destructive; vss_ctx_rag/functions/graph_db.py). Snapshot diffing is
the Spark-native replacement: materialize node/edge tables per epoch
(sinks.py), diff consecutive epochs declaratively, and ship only the
delta to downstream consumers (MERGE INTO source, cache invalidation,
audit trail).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of two keyed snapshots.

    Returns one row per key present in either snapshot whose state
    differs: ``status`` in ('added', 'removed', 'changed'), key columns,
    and paired ``old_<v>`` / ``new_<v>`` value columns (NULL on the
    absent side). Keys equal in both snapshots are dropped — the delta
    is the output, so downstream cost scales with churn, not table
    size.

    Requires unique keys per snapshot (raises downstream consumers'
    fan-out otherwise — same unique-key precondition as the banding
    re-joins, documented not enforced: enforcing would cost an extra
    shuffle per call).

    100 TB shape: ONE full-outer sort-merge join on the key — the
    minimal possible plan for a diff; both sides prune to
    key+value columns at scan (column pruning reaches parquet). Equal
    rows are eliminated pre-shuffle-free by the null-safe comparison in
    the same stage as the join output. With both epochs bucketed by key
    (sinks.write_bucketed), the join plans with zero Exchange.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    if not value_cols:
        raise ValueError("need at least one value column")
    overlap = set(key_cols) & set(value_cols)
    if overlap:
        raise ValueError(f"key/value overlap: {sorted(overlap)}")
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(v).alias(f"old_{v}") for v in value_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(v).alias(f"new_{v}") for v in value_cols],
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, list(key_cols), "full_outer")
    changed = None
    for v in value_cols:
        neq = ~F.col(f"old_{v}").eqNullSafe(F.col(f"new_{v}"))
        changed = neq if changed is None else (changed | neq)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    keep = F.col("_in_old").isNull() | F.col("_in_new").isNull() | changed
    out_cols = (
        [status.alias("status")]
        + [F.col(k) for k in key_cols]
        + [F.col(f"old_{v}") for v in value_cols]
        + [F.col(f"new_{v}") for v in value_cols]
    )
    return joined.filter(keep).select(*out_cols)


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Compress an append-only change log into SCD type-2 validity
    intervals: one row per (key, state episode) with ``valid_from`` /
    ``valid_to`` — ``valid_to`` NULL marks the current state. An
    episode starts where the value tuple differs (null-safely) from
    the key's previous log row and ends where the next episode starts,
    so consecutive identical updates collapse into one interval.

    Requires unique (key, ts) rows — same documented-not-enforced
    precondition as :func:`snapshot_diff` (two states at one instant
    have no defined order; dedupe upstream, e.g. asof.dedup_right_latest
    with a tie-break column). NULL timestamps are dropped.

    100 TB shape: both windows (the lag that finds episode starts, the
    lead that closes them) share the key partitioning and ts ordering,
    so Catalyst plans ONE Exchange — a single shuffle over the log,
    the floor for any per-key ordered pass. Output size = number of
    state changes, not log size. The result joins point-in-time
    queries either directly (ts BETWEEN valid_from AND valid_to via
    intervals.range_join_points) or through asof.asof_join on
    valid_from.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    if not value_cols:
        raise ValueError("need at least one value column")
    missing = [
        c for c in [*key_cols, ts_col, *value_cols]
        if c not in changes.columns
    ]
    if missing:
        raise ValueError(f"columns not in changelog: {missing}")
    for taken in ("_prev", "_first", "valid_from", "valid_to"):
        if taken in changes.columns:
            raise ValueError(f"input already has a '{taken}' column")

    key_order = Window.partitionBy(*key_cols).orderBy(ts_col)
    val = F.struct(*[F.col(c) for c in value_cols])
    starts = (
        changes.filter(F.col(ts_col).isNotNull())
        .withColumn("_prev", F.lag(val).over(key_order))
        # first row per key has NULL _prev: eqNullSafe would make an
        # all-NULL value tuple look unchanged there — carry the
        # explicit first-row flag (windows are not allowed in WHERE,
        # so both land as columns before the filter)
        .withColumn("_first", F.lag(F.col(ts_col)).over(key_order).isNull())
        .filter(F.col("_first") | ~val.eqNullSafe(F.col("_prev")))
        .drop("_prev", "_first")
    )
    return starts.select(
        *key_cols,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(key_order).alias("valid_to"),
    )


def psi_numeric(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two corpus snapshots of a
    numeric column — the standard training-data drift monitor (PSI
    < 0.1 stable, 0.1-0.25 moderate, > 0.25 population shift).

    Buckets are equi-width over the REFERENCE snapshot's [min, max]
    (the fixed yardstick: the current snapshot is measured against the
    reference's frame, so out-of-range current values CLAMP into the
    end buckets — standard PSI practice, and the clamp is what makes a
    range shift visible as end-bucket mass). NULL values are excluded
    on both sides (unknowable position). Ratios are Laplace-smoothed
    ((c + 1) / (total + n_buckets)) so an empty bucket cannot divide
    by zero; each bucket's contribution is rounded to integer micro
    units from scalar counts BEFORE any cross-bucket arithmetic, so
    the output is partitioning-order-independent. A degenerate
    reference (min == max, or no non-NULL rows) fails loudly in-plan
    via assert_true rather than emitting NaN buckets.

    Returns (bucket, ref_count, cur_count, psi_micro), one row per
    occupied bucket; total PSI = sum(psi_micro) / 1e6. Plan: two
    map-side-combined groupBys (n_buckets rows each), a full outer
    join and two 1-row broadcast cross joins — nothing corpus-sized
    after the scans, both of which read ONLY value_col.
    """
    if n_buckets < 2:
        raise ValueError(f"need n_buckets >= 2, got {n_buckets}")
    v = F.col(value_col)
    stats = ref.filter(v.isNotNull()).agg(
        F.min(v).alias("_mn"), F.max(v).alias("_mx")
    ).select(
        F.assert_true(
            F.col("_mn").isNotNull() & (F.col("_mx") > F.col("_mn")),
            F.lit(
                f"psi_numeric: reference {value_col} is empty or "
                "constant — equi-width buckets undefined"
            ),
        ).alias("_chk"),
        "_mn", "_mx",
    )

    def bucketed(df: DataFrame) -> DataFrame:
        width = (F.col("_mx") - F.col("_mn")) / F.lit(n_buckets)
        b = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.col("_mn")) / width).cast("int"),
            ),
        )
        return (
            df.filter(v.isNotNull())
            .crossJoin(F.broadcast(stats))
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
    r = bucketed(ref).select("bucket", F.col("c").alias("ref_count"))
    c = bucketed(cur).select("bucket", F.col("c").alias("cur_count"))
    j = (
        r.join(c, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
            F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
        )
    )
    tot = j.agg(
        F.sum("ref_count").alias("_tr"), F.sum("cur_count").alias("_tc")
    )
    pa = (F.col("ref_count") + F.lit(1.0)) / (F.col("_tr") + F.lit(n_buckets))
    pb = (F.col("cur_count") + F.lit(1.0)) / (F.col("_tc") + F.lit(n_buckets))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "ref_count",
            "cur_count",
            F.round((pa - pb) * F.log(pa / pb) * F.lit(1_000_000))
            .cast("long")
            .alias("psi_micro"),
        )
    )


def psi_categorical(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    *,
    hex_chars: int = 1,
) -> DataFrame:
    """PSI over a categorical/string column via md5 hash buckets
    (16^hex_chars of them) — the unbounded-vocabulary variant: bucket
    = the first ``hex_chars`` of ``md5(value)``, a content-stable key
    both engines compute identically (the sampling.py idiom), so no
    vocabulary table is ever built or shuffled. NULLs excluded; same
    smoothing/rounding contract as :func:`psi_numeric`.

    Returns (bucket, ref_count, cur_count, psi_micro). Hash buckets
    dilute per-category signal (a category shift spreads over its
    bucket's mass) — they bound state, not sensitivity; raise
    hex_chars for finer resolution at 16x state per char.
    """
    if not 1 <= hex_chars <= 8:
        raise ValueError(f"need 1 <= hex_chars <= 8, got {hex_chars}")
    n_buckets = 16 ** hex_chars
    v = F.col(value_col)
    b = F.substring(F.md5(v.cast("string").cast("binary")), 1, hex_chars)

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(v.isNotNull())
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(out))
        )
    j = (
        bucketed(ref, "ref_count")
        .join(bucketed(cur, "cur_count"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
            F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
        )
    )
    tot = j.agg(
        F.sum("ref_count").alias("_tr"), F.sum("cur_count").alias("_tc")
    )
    pa = (F.col("ref_count") + F.lit(1.0)) / (F.col("_tr") + F.lit(n_buckets))
    pb = (F.col("cur_count") + F.lit(1.0)) / (F.col("_tc") + F.lit(n_buckets))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "ref_count",
            "cur_count",
            F.round((pa - pb) * F.log(pa / pb) * F.lit(1_000_000))
            .cast("long")
            .alias("psi_micro"),
        )
    )
