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

from pyspark.sql import DataFrame, Window
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


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: "list[str] | None" = None,
    k_x10: int = 30,
) -> DataFrame:
    """Median/MAD outlier flagging (the robust z-score, Iglewicz &
    Hoaglin 1993): per group, med = exact median, mad = exact median
    of |x - med|, and x flags when 10*|x - med| > k_x10 * mad — the
    k = k_x10/10 cutoff expressed WITHOUT a float division, so with
    integer-valued inputs every comparison is IEEE-exact on any
    engine (medians of int64 interpolate to exact halves; scale float
    measures to integer units — cents, micros — before calling, the
    repo-wide discipline). Unlike mean/stddev gating, a single wild
    value cannot drag the threshold (50% breakdown point) — the
    data-quality screen for ingest metrics.

    Returns the input columns plus (med, abs_dev, mad, is_outlier).
    A zero MAD (over half the group identical) flags ANY deviation —
    the standard, documented degeneracy. NULL values pass through
    un-flagged (is_outlier NULL).

    100 TB shape: two group-keyed exact-percentile aggs + two
    group-keyed joins. Exact percentile sorts per group IN the agg —
    hot groups sort within one task; at extreme group sizes switch to
    histogram_quantiles (the sketch family) and accept bounded error.
    """
    if k_x10 < 1:
        raise ValueError(f"need k_x10 >= 1, got {k_x10}")
    groups = list(group_cols or [])
    gb = lambda d: d.groupBy(*groups) if groups else d.groupBy()  # noqa: E731
    v = F.col(value_col)
    med = gb(df).agg(F.expr(f"percentile({value_col}, 0.5)").alias("med"))
    joined = (
        df.join(med, groups) if groups else df.crossJoin(F.broadcast(med))
    ).withColumn("abs_dev", F.abs(v - F.col("med")))
    mad = gb(joined).agg(F.expr("percentile(abs_dev, 0.5)").alias("mad"))
    scored = (
        joined.join(mad, groups)
        if groups
        else joined.crossJoin(F.broadcast(mad))
    )
    return scored.withColumn(
        "is_outlier",
        F.when(
            v.isNotNull(),
            F.lit(10.0) * F.col("abs_dev") > F.lit(float(k_x10)) * F.col("mad"),
        ),
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    group_cols: "list[str] | None" = None,
    tie_cols: "list[str] | None" = None,
) -> DataFrame:
    """Equi-depth (quantile) binning: adds ``bin`` (1..n_bins) so
    every bin holds an equal share of rows — the feature
    discretization / percentile-cohort assignment step (ntile
    semantics: bin sizes differ by at most one row). Ordering is
    (value, *tie_cols) — pass a unique tie-breaker, the engine-wide
    determinism contract; without it equal values straddle a bin
    boundary nondeterministically.

    100 TB shape: grouped binning is ONE window per group (a
    group-keyed sort shuffle, fully parallel across groups — a hot
    group sorts within one task, same trade-off as exact percentiles
    above). GLOBAL binning does NOT use ``Window.orderBy()`` — that
    plans an ``Exchange SinglePartition`` and funnels the whole corpus
    through one task. Instead it rides :func:`skew.global_rank`
    (repartitionByRange + local sort + broadcast prefix offsets — one
    parallel range shuffle, plan-asserted SinglePartition-free) and
    derives the bin arithmetically from (rank, N): with ``q = N div
    n_bins`` and ``rem = N mod n_bins`` the first ``rem`` bins hold
    ``q+1`` rows — exactly SQL ntile. N falls out of global_rank's
    offset collect, so no extra job.
    """
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    order = [F.col(value_col).asc()] + [
        F.col(c).asc() for c in (tie_cols or [])
    ]
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return df.withColumn("bin", F.ntile(n_bins).over(w))

    from .skew import global_rank

    order_cols = [value_col] + list(tie_cols or [])
    ranked, n = global_rank(df, order_cols, rank_col="_edb_rank")
    q, rem = divmod(n, n_bins)
    r = F.col("_edb_rank")
    cut = rem * (q + 1)  # rows 1..cut land in the q+1-sized bins
    # integer `div`, never float `/`: bit-exact at any N
    big = F.expr(f"(_edb_rank - 1) div {q + 1} + 1")
    # q == 0 only when N < n_bins, where every row satisfies r <= cut
    # (cut == N) — the small branch never selects a row then; max(q,1)
    # just keeps the divisor nonzero so non-ANSI NULL-on-div-zero
    # can't leak through evaluation of the unselected branch.
    small = F.expr(f"{rem} + (_edb_rank - 1 - {cut}) div {max(q, 1)} + 1")
    return ranked.withColumn(
        "bin", F.when(r <= F.lit(cut), big).otherwise(small).cast("int")
    ).drop("_edb_rank")


def time_decayed_counts(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    as_of: str,
    half_life_s: int,
    max_halvings: int = 62,
) -> DataFrame:
    """Recency-weighted activity per key — the decayed complement of a
    plain count (A4's entity frequency is the undecayed version; a KG
    retrieval layer ranks entities by *current* salience, not lifetime
    mentions).

    Each event's weight is ``1_000_000 >> (age // half_life_s)`` — the
    power-of-two staircase of exponential decay: exactly one halving
    per elapsed half-life, evaluated in pure int64 so Spark and any
    SQL twin agree bit-for-bit (no ``exp()``/``pow()`` float drift).
    Ages are integer seconds derived from microsecond epochs with
    trunc division; the shift count is capped at ``max_halvings``
    (BIGINT shift semantics diverge across engines past the word
    width; 1e6 >> 20 is already 0, so the cap changes nothing
    observable).

    Rows with ``ts_col`` after ``as_of`` are EXCLUDED — as of the
    scoring instant they have not happened; a negative age would
    otherwise mint unbounded weight. NULL timestamps are excluded the
    same way (unknowable age, never a fake weight).

    Output per key: (*key_cols, n_events, salience, last_ts) where
    ``salience`` = sum of decayed weights and ``n_events`` counts the
    INCLUDED rows. One map-side-combined groupBy — a single
    key-shuffle, no window, no driver actions.

    100 TB shape: weights are computed in the narrow map before the
    exchange, so shuffle volume is one partial aggregate per (task,
    key); hot keys (a viral entity) cost only their own partial rows.
    """
    if half_life_s < 1:
        raise ValueError(f"need half_life_s >= 1: {half_life_s}")
    if not (0 <= max_halvings <= 62):
        raise ValueError(f"need 0 <= max_halvings <= 62: {max_halvings}")

    # parse as_of DRIVER-SIDE (same ADVICE-r4 contract as
    # silence_intervals): a junk timestamp must RAISE here, not cast to
    # NULL and silently zero the whole salience table; naive inputs are
    # pinned UTC, exact integer epoch math.
    from datetime import datetime, timedelta, timezone

    dt = datetime.fromisoformat(as_of)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    as_of_us_val = (
        dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
    ) // timedelta(microseconds=1)
    as_of_us = F.lit(as_of_us_val).cast("long")
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    k = F.least(
        F.expr(
            f"(({as_of_us_val}L"
            f" - unix_micros(cast({ts_col} as timestamp))) div 1000000)"
            f" div {half_life_s}"
        ),
        F.lit(max_halvings).cast("long"),
    )
    weighted = (
        df.filter(F.col(ts_col).isNotNull() & (ts_us <= as_of_us))
        .withColumn("_k", k.cast("int"))
        .withColumn("_w", F.expr("shiftright(1000000L, _k)"))
    )
    return weighted.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_w").alias("salience"),
        F.max(ts_col).alias("last_ts"),
    )


def burst_buckets(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    bucket_s: int = 3600,
    baseline_buckets: int = 24,
    factor_num: int = 3,
    factor_den: int = 1,
    min_count: int = 5,
) -> DataFrame:
    """Per-bucket burst flags: which fixed time buckets carry
    anomalously MANY events per key vs that key's own trailing rate.

    The complement of :func:`time_decayed_counts`: decay answers "what
    is hot NOW", bursts answer "WHEN did each key spike" — the signal a
    KG ingestion monitor uses to spot replay storms / topic eruptions
    in the transcript stream (the reference surfaces no temporal
    anomaly view at all; its metrics are lifetime counters,
    otel_metrics.py).

    Semantics (integer-exact, engine-portable):

    - ``epoch`` = floor(event seconds / bucket_s) in int64 (trunc
      division on microsecond epochs — no FP).
    - ``cnt`` = events per (key, epoch); ``base_sum`` = sum of cnt over
      the trailing ``baseline_buckets`` epochs, computed with a
      RANGE-frame window over the epoch VALUE, so empty buckets
      contribute exactly 0 without densification — a gap longer than
      the baseline window yields base_sum NULL→0 (history forgotten),
      matching the arithmetic a densified frame would produce.
    - burst ⇔ ``cnt >= min_count`` AND ``cnt * baseline_buckets *
      factor_den > factor_num * base_sum`` — the division-free form of
      "rate > factor × trailing mean" (same discipline as the MAD
      outlier threshold, rules.py). Cold-start buckets (no history)
      pass the ratio vacuously and are gated by ``min_count`` alone —
      a key's first-ever spike IS a burst.

    One map-side-combined (key, epoch) aggregation, then one key-keyed
    window. 100 TB shape: the shuffle carries pre-aggregated bucket
    rows (corpus-size-independent per key-hour), and the window state
    is bounded by ``baseline_buckets`` rows per key. A hot key costs
    its own bucket rows only — no densification join, no driver
    action.
    """
    if bucket_s < 1:
        raise ValueError(f"need bucket_s >= 1: {bucket_s}")
    if baseline_buckets < 1:
        raise ValueError(f"need baseline_buckets >= 1: {baseline_buckets}")
    if factor_num < 1 or factor_den < 1:
        raise ValueError("need factor_num, factor_den >= 1")
    key_cols = list(key_cols)
    epoch = F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) div 1000000) div {bucket_s}"
    )
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*key_cols, epoch.alias("epoch"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("epoch")
        .rangeBetween(-baseline_buckets, -1)
    )
    return counts.withColumn(
        "base_sum", F.coalesce(F.sum("cnt").over(w), F.lit(0).cast("long"))
    ).withColumn(
        "is_burst",
        (F.col("cnt") >= min_count)
        & (
            F.col("cnt") * F.lit(baseline_buckets * factor_den)
            > F.lit(factor_num) * F.col("base_sum")
        ),
    )


def burst_intervals(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    bucket_s: int = 3600,
    baseline_buckets: int = 24,
    factor_num: int = 3,
    factor_den: int = 1,
    min_count: int = 5,
) -> DataFrame:
    """Maximal runs of consecutive burst buckets per key
    (gaps-and-islands over :func:`burst_buckets`).

    ``island`` = epoch − row_number over the key's burst buckets in
    epoch order: consecutive epochs share it, any gap starts a new
    one — the standard islands identity, exact because epochs are
    integers. Output per (key, island): (*key_cols, start_epoch,
    end_epoch, n_buckets, total_events, peak_count); epochs stay
    integer bucket indexes (× bucket_s = seconds since Unix epoch) so
    SQL twins compare bit-for-bit without timestamp-zone semantics.

    The islands window and the final groupBy both key on the same
    (*key_cols)-prefixed partitioning the flag window already
    established — Catalyst reuses one Exchange for all three.
    """
    flagged = burst_buckets(
        df,
        key_cols,
        ts_col,
        bucket_s=bucket_s,
        baseline_buckets=baseline_buckets,
        factor_num=factor_num,
        factor_den=factor_den,
        min_count=min_count,
    ).filter(F.col("is_burst"))
    key_cols = list(key_cols)
    iw = Window.partitionBy(*key_cols).orderBy("epoch")
    islands = flagged.withColumn(
        "island", F.col("epoch") - F.row_number().over(iw)
    )
    return islands.groupBy(*key_cols, "island").agg(
        F.min("epoch").alias("start_epoch"),
        F.max("epoch").alias("end_epoch"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("cnt").alias("total_events"),
        F.max("cnt").alias("peak_count"),
    ).drop("island")


def silence_intervals(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    bucket_s: int = 3600,
    min_gap_buckets: int = 6,
    as_of: "str | None" = None,
) -> DataFrame:
    """Maximal runs of EMPTY time buckets per key — the outage
    complement of :func:`burst_intervals`.

    A rate DROP is invisible to any threshold over bucket rows: a key
    that stops emitting produces NO rows at all, so "too few events"
    can never be flagged by filtering counts. The gap between
    consecutive ACTIVE buckets is the only place silence exists, so
    the detector is one ``lag`` per key over distinct active epochs:
    ``epoch − lag(epoch) − 1 >= min_gap_buckets`` emits the interval
    of strictly-empty buckets between them. Exact with no
    densification — a trillion-bucket calendar costs nothing; only
    active buckets are rows.

    With ``as_of`` set, a trailing silence per key is also emitted
    (``is_trailing = true``): last active bucket + 1 through the
    bucket BEFORE the as_of instant's (the as_of bucket is partial —
    counting it would flag every key mid-bucket). An ongoing outage is
    precisely the silence a monitor must not miss. Leading silence
    (before a key's first event) is undefined — keys have no birth
    timestamp — and never emitted.

    Output: (*key_cols, start_epoch, end_epoch, n_buckets,
    is_trailing); epochs are integer bucket indexes as in
    :func:`burst_intervals`. The lag window and the trailing groupBy
    share the key partitioning — one shuffle of distinct active
    buckets.
    """
    if bucket_s < 1:
        raise ValueError(f"need bucket_s >= 1: {bucket_s}")
    if min_gap_buckets < 1:
        raise ValueError(f"need min_gap_buckets >= 1: {min_gap_buckets}")
    key_cols = list(key_cols)
    epoch = F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) div 1000000) div {bucket_s}"
    )
    active = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*key_cols, epoch.alias("epoch"))
        .distinct()
    )
    w = Window.partitionBy(*key_cols).orderBy("epoch")
    interior = (
        active.withColumn("prev", F.lag("epoch").over(w))
        .filter(
            F.col("prev").isNotNull()
            & (F.col("epoch") - F.col("prev") - 1 >= min_gap_buckets)
        )
        .select(
            *key_cols,
            (F.col("prev") + 1).alias("start_epoch"),
            (F.col("epoch") - 1).alias("end_epoch"),
            (F.col("epoch") - F.col("prev") - 1).alias("n_buckets"),
            F.lit(False).alias("is_trailing"),
        )
    )
    if as_of is None:
        return interior
    # parse as_of DRIVER-SIDE (ADVICE r4): interpolating the raw string
    # into F.expr meant an unparsable timestamp cast to NULL under
    # non-ANSI mode and silently suppressed every trailing-silence row
    # (an ongoing-outage monitor that quietly reports nothing), and a
    # quote in the string broke the expression. fromisoformat RAISES on
    # junk; naive inputs are pinned UTC (the session-wide timezone
    # contract), and the epoch math is exact integer division.
    from datetime import datetime, timedelta, timezone

    dt = datetime.fromisoformat(as_of)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    epoch_us = (
        dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
    ) // timedelta(microseconds=1)
    as_of_epoch_val = (epoch_us // 1_000_000) // bucket_s
    trailing = (
        active.groupBy(*key_cols)
        .agg(F.max("epoch").alias("last_epoch"))
        .withColumn("_ao", F.lit(as_of_epoch_val).cast("long"))
        .filter(F.col("_ao") - F.col("last_epoch") - 1 >= min_gap_buckets)
        .select(
            *key_cols,
            (F.col("last_epoch") + 1).alias("start_epoch"),
            (F.col("_ao") - 1).alias("end_epoch"),
            (F.col("_ao") - F.col("last_epoch") - 1).alias("n_buckets"),
            F.lit(True).alias("is_trailing"),
        )
    )
    return interior.unionByName(trailing)


def level_shifts(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    bucket_s: int = 3600,
    window_buckets: int = 24,
    factor_num: int = 2,
    factor_den: int = 1,
    min_side_events: int = 10,
    full_window: bool = False,
) -> DataFrame:
    """Sustained regime shifts per key — the third leg of the temporal
    health family: :func:`burst_intervals` flags single-bucket spikes,
    :func:`silence_intervals` flags total stops, this flags the rate
    LEVEL changing and staying changed (a deploy doubling error rate,
    a migration halving traffic).

    At every active bucket, compare the trailing ``window_buckets``
    sum against the leading one (current bucket inclusive), both as
    RANGE frames over the epoch value (gap-exact, densification-free):

    - up-shift  ⇔ ``lead * factor_den >= factor_num * trail`` with
      ``lead >= min_side_events`` and ``trail >= 1``
    - down-shift ⇔ mirrored.

    Both sides must be nonzero: a key appearing from nothing is a
    burst/cold-start, a key stopping entirely is a silence — each
    already owned by its operator. Consecutive same-direction flagged
    buckets are one shift event; the representative is elected by max
    ``|lead − trail|`` then min epoch (deterministic). Output:
    (*key_cols, epoch, direction ±1, trail_sum, lead_sum, ratio_ppm)
    with ``ratio_ppm = lead * 1e6 div trail``.

    ``full_window=False`` (default) also reports a key's ramp-in /
    ramp-out edges (partial windows at history boundaries satisfy the
    ratio) — real signals for a monitor watching key lifecycles.
    ``full_window=True`` restricts to buckets with ``window_buckets``
    of history on BOTH sides: strict interior regime comparison.

    Shape: the bucket agg shuffles once on (key, epoch); every window
    (two frame sums, the run-id lag/cumsum, min/max support when
    ``full_window``) shares one key-keyed sort, then the election
    row_number re-partitions by (key, run) — bucket-census-sized
    exchanges, corpus-size-independent per key-hour.
    """
    if window_buckets < 1:
        raise ValueError(f"need window_buckets >= 1: {window_buckets}")
    if factor_num < 1 or factor_den < 1:
        raise ValueError("need factor_num, factor_den >= 1")
    key_cols = list(key_cols)
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            *key_cols,
            F.expr(
                f"(unix_micros(cast({ts_col} as timestamp)) div 1000000)"
                f" div {bucket_s}"
            ).alias("epoch"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wk = Window.partitionBy(*key_cols).orderBy("epoch")
    trail = F.coalesce(
        F.sum("cnt").over(wk.rangeBetween(-window_buckets, -1)),
        F.lit(0).cast("long"),
    )
    lead = F.coalesce(
        F.sum("cnt").over(wk.rangeBetween(0, window_buckets - 1)),
        F.lit(0).cast("long"),
    )
    scored = counts.select(
        *key_cols,
        "epoch",
        trail.alias("trail_sum"),
        lead.alias("lead_sum"),
        F.min("epoch").over(wk).alias("_first"),
        F.max("epoch").over(
            wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_last"),
    )
    up = (
        (F.col("lead_sum") * factor_den >= F.lit(factor_num) * F.col("trail_sum"))
        & (F.col("lead_sum") >= min_side_events)
        & (F.col("trail_sum") >= 1)
    )
    down = (
        (F.col("trail_sum") * factor_den >= F.lit(factor_num) * F.col("lead_sum"))
        & (F.col("trail_sum") >= min_side_events)
        & (F.col("lead_sum") >= 1)
    )
    flagged = scored.withColumn(
        "direction", F.when(up, F.lit(1)).when(down, F.lit(-1))
    ).filter(F.col("direction").isNotNull())
    if full_window:
        flagged = flagged.filter(
            (F.col("epoch") - F.col("_first") >= window_buckets)
            & (F.col("_last") - F.col("epoch") >= window_buckets - 1)
        )
    runs = flagged.select(
        *key_cols, "epoch", "direction", "trail_sum", "lead_sum",
        F.coalesce(
            (F.lag("epoch").over(wk) != F.col("epoch") - 1)
            | (F.lag("direction").over(wk) != F.col("direction")),
            F.lit(True),
        ).cast("long").alias("_new_run"),
    ).withColumn(
        "_run",
        F.sum("_new_run").over(wk.rowsBetween(Window.unboundedPreceding, 0)),
    )
    elect = Window.partitionBy(*key_cols, "_run").orderBy(
        F.abs(F.col("lead_sum") - F.col("trail_sum")).desc(), F.col("epoch").asc()
    )
    return (
        runs.withColumn("_rn", F.row_number().over(elect))
        .filter(F.col("_rn") == 1)
        .select(
            *key_cols, "epoch", "direction", "trail_sum", "lead_sum",
            F.expr("lead_sum * 1000000 div trail_sum").alias("ratio_ppm"),
        )
    )


def temporal_health_scorecard(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    bucket_s: int = 3600,
    baseline_buckets: int = 24,
    burst_factor_num: int = 3,
    burst_min_count: int = 5,
    min_gap_buckets: int = 72,
    shift_factor_num: int = 2,
    shift_min_side: int = 10,
    as_of: "str | None" = None,
) -> DataFrame:
    """One health row per key: the three temporal detectors composed —
    how many burst runs, silence intervals (+ whether one is ongoing)
    and level-shift events each key exhibited, plus total activity.
    This is the monitor table an ingestion operator actually reads;
    the individual detectors are its drill-downs.

    Keys with zero anomalies still appear (activity side is the spine,
    detectors left-join onto it) — absence of a row meaning "healthy"
    would be indistinguishable from "never ingested". Counts are 0,
    never NULL, for present keys. All detector semantics and defaults
    are the composed operators', unchanged.

    Shape: three detector plans plus one activity agg, all keyed the
    same, joined key-on-key — every side is key-vocabulary-sized
    after its own aggregation, so the joins are trivially
    broadcast-able at any corpus scale.
    """
    key_cols = list(key_cols)
    activity = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bursts = (
        burst_intervals(
            df, key_cols, ts_col, bucket_s=bucket_s,
            baseline_buckets=baseline_buckets,
            factor_num=burst_factor_num, min_count=burst_min_count,
        )
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_bursts"),
            F.max("peak_count").alias("max_burst_peak"),
        )
    )
    sil = silence_intervals(
        df, key_cols, ts_col, bucket_s=bucket_s,
        min_gap_buckets=min_gap_buckets, as_of=as_of,
    )
    silences = sil.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_silences"),
        F.max("n_buckets").alias("max_silence_buckets"),
        F.max(F.col("is_trailing").cast("long")).alias("ongoing_silence"),
    )
    shifts = (
        level_shifts(
            df, key_cols, ts_col, bucket_s=bucket_s,
            window_buckets=baseline_buckets,
            factor_num=shift_factor_num, min_side_events=shift_min_side,
        )
        .groupBy(*key_cols)
        .agg(
            F.sum((F.col("direction") == 1).cast("long")).alias("n_up_shifts"),
            F.sum((F.col("direction") == -1).cast("long")).alias("n_down_shifts"),
        )
    )
    out = (
        activity.join(bursts, key_cols, "left")
        .join(silences, key_cols, "left")
        .join(shifts, key_cols, "left")
    )
    return out.na.fill(
        {
            "n_bursts": 0,
            "max_burst_peak": 0,
            "n_silences": 0,
            "max_silence_buckets": 0,
            "ongoing_silence": 0,
            "n_up_shifts": 0,
            "n_down_shifts": 0,
        }
    )
