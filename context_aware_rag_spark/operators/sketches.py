"""Mergeable cardinality sketches (HyperLogLog, Flajolet et al. 2007).

The reference counts distinct entities by materializing them
(graph_db node MERGE + count queries); at 100 TB the distinct-count
questions an ingest pipeline actually asks per partition/epoch
("how many distinct entities / conversations / users landed?") need a
MERGEABLE sketch: fixed 2^p-register state per group, combinable by a
plain max — so partial aggregation, cross-epoch accumulation, and
streaming all come for free, and a re-merged epoch is a no-op
(idempotent replay, the same exactly-once discipline as
streaming/dedup_ingest).

Portability discipline: the hash is md5 (identical literal hex in
Spark and DuckDB — the same trick sampling.py uses), the register
value is derived with integer/bit ops only (conv/bin/shiftleft have
exact DuckDB twins), and the harmonic denominator is accumulated as
the INTEGER sum of 2^(49 - M_j) — dyadic terms summed exactly in
int64 (max m * 2^49 = 2^57 at p = 8), so the only float ops are the
final alpha multiply/divide and ln correction, identical
double-expressions in any engine. No approx_count_distinct black box:
the whole estimator is visible, testable, and hash-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# rho is computed from a 48-bit suffix of md5 (hex chars 9-20): the
# register ceiling is 49, and 2^(49 - M) stays an exact int64 term.
_RHO_BITS = 48


def _alpha(m: int) -> float:
    # standard bias constant; p >= 7 keeps the closed form exact
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> int:
    if not (7 <= p <= 14):
        raise ValueError(f"need 7 <= p <= 14, got {p}")
    return 1 << p


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., bucket, m_j) with
    m_j = max over hashed values in the bucket of (leading zeros of
    the 48-bit hash suffix + 1). Only OCCUPIED buckets are emitted —
    the state per group is at most 2^p rows regardless of input size.

    100 TB shape: one narrow md5 projection + one map-side-combined
    groupBy max — registers ARE partial aggregates, so the combine
    happens before any shuffle; the shuffled payload per group is
    <= 2^p tiny rows.
    """
    from .skew import coalesce_for_agg

    m = _check_p(p)
    # bounded coalesce: register keys are <= groups x 2^p — partial
    # aggregation over many small scan partitions emits near-distinct
    # keys per task; fewer, fuller map tasks combine before the
    # exchange (see skew.coalesce_for_agg; measured 1.9 s -> 0.6 s on
    # the bench's 3M-word build)
    df = coalesce_for_agg(df)
    h = F.md5(F.col(value_col).cast("string"))
    b32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    v48 = F.conv(F.substring(h, 9, 12), 16, 10).cast("long")
    rho = F.when(v48 == 0, F.lit(_RHO_BITS + 1)).otherwise(
        F.lit(_RHO_BITS + 1) - F.length(F.bin(v48))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *[F.col(g) for g in group_cols],
            (b32 % m).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("m_j"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register tables from any number of partial computations
    (partitions, epochs, streams): union + max. Max is idempotent and
    commutative, so re-merging a duplicate epoch is a no-op — replayed
    ingest cannot inflate the estimate."""
    if not register_frames:
        raise ValueError("need at least one register frame")
    out = register_frames[0]
    for r in register_frames[1:]:
        out = out.unionByName(r)
    group_cols = [c for c in out.columns if c not in ("bucket", "m_j")]
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("m_j").cast("int").alias("m_j")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """Cardinality estimate per group from a register table:
    (group_cols..., n_registers, n_empty, harmonic_s49, estimate).

    harmonic_s49 = sum over all 2^p buckets of 2^(49 - M_j), empty
    buckets contributing 2^49 — an exact integer, so the raw estimate
    alpha * m^2 * 2^49 / S involves exactly one float division.
    Small-range (linear-counting) correction applies below 2.5 * m
    when empty buckets remain, the standard HLL regime switch; the
    48-bit rho space makes the large-range collision correction moot
    at any realistic cardinality.
    """
    m = _check_p(p)
    two49 = 1 << (_RHO_BITS + 1)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(
            # PySpark's shiftleft() only takes a literal shift amount;
            # the SQL form accepts a column expression
            F.expr(f"shiftleft(1L, {_RHO_BITS + 1} - m_j)")
        ).alias("_s_present"),
    )
    n_empty = F.lit(m) - F.col("n_registers")
    s49 = (F.col("_s_present") + n_empty * F.lit(two49)).cast("long")
    est_raw = (
        F.lit(_alpha(m)) * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(two49))
    ) / s49.cast("double")
    corrected = F.when(
        (n_empty > 0) & (est_raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty.cast("double")),
    ).otherwise(est_raw)
    return agg.select(
        *group_cols,
        "n_registers",
        n_empty.cast("int").alias("n_empty"),
        s49.alias("harmonic_s49"),
        F.round(corrected, 4).alias("estimate"),
    )


def hll_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Convenience: registers -> estimate in one call."""
    return hll_estimate(
        hll_registers(df, group_cols, value_col, p=p), group_cols, p=p
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

def _check_cms(depth: int, width: int) -> None:
    if not (1 <= depth <= 16):
        raise ValueError(f"need 1 <= depth <= 16, got {depth}")
    if width < 16:
        raise ValueError(f"need width >= 16, got {width}")


def _cms_h1(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def _cms_h2(col):
    # forced odd: a full-cycle stride for power-of-two widths
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 9, 8), 16, 10).cast(
            "long"
        )
        * 2
        + 1
    )


def _cms_bucket_expr(width: int):
    # expects _h1/_h2 columns; h1 + 15 * 2^33 < 2^38 — no overflow
    return F.pmod(F.col("_h1") + F.col("row") * F.col("_h2"), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of key frequencies: (row, bucket, cnt) with
    ``depth`` independent hash rows of ``width`` buckets. Buckets use
    Kirsch-Mitzenmacher double hashing off ONE md5 per key —
    bucket_i = (h1 + i * h2') mod width with h1/h2 the first two
    32-bit md5 words and h2' forced odd — which preserves the CMS
    guarantees (K-M 2006) at a quarter of the hash cost of per-row
    md5 (measured 32.8 -> 12.2 s on a 36M-word build at 4 cores), and
    stays engine-portable. Point estimates (:func:`cms_query`) are min
    over rows — an upper bound on the true count, within eps*N
    (eps = e/width) with probability 1 - (1/2)^depth.

    Sketch state is depth * width rows REGARDLESS of key cardinality,
    and merges by plain SUM — so partial aggregation, cross-epoch
    accumulation, and exactly-once streaming (per-epoch overwrite +
    sum-on-read) all come free. The heavy-hitter companion to the
    exact-but-key-bounded key_skew_report.

    100 TB shape: one narrow projection exploding each key into
    ``depth`` (row, bucket) cells + one map-side-combined sum; the
    shuffle payload is bounded by depth * width per map partition.
    """
    from .skew import coalesce_for_agg

    _check_cms(depth, width)
    # bounded coalesce: sketch cells are depth x width keys — same
    # map-side-combine argument as hll_registers (1.9 s -> 0.55 s on
    # the bench's 3M-word build)
    df = coalesce_for_agg(df)
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        _cms_h1(F.col(key_col)).alias("_h1"),
        _cms_h2(F.col(key_col)).alias("_h2"),
        w.alias("_w"),
    )
    rows = keyed.select(
        "_h1", "_h2", "_w",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        rows.select(
            "row", _cms_bucket_expr(width).alias("bucket"), "_w"
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS tables from partial computations: union + sum (same
    depth/width assumed — the caller's contract)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for each key in ``keys``: (key_col, est) with
    est = min over the sketch's rows of the key's bucket count (0 when
    a bucket row is absent — possible on sparse sketches).

    100 TB shape: the probe side explodes to depth rows per key and
    equi-joins the (depth*width)-bounded sketch — broadcast-sized by
    construction.
    """
    _check_cms(depth, width)
    # NULL keys were never counted (cms_build excludes them) — a NULL
    # probe would hash to a fabricated bucket; exclude them here too
    probes = keys.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        _cms_h1(F.col(key_col)).alias("_h1"),
        _cms_h2(F.col(key_col)).alias("_h2"),
    ).select(
        key_col, "_h1", "_h2",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    probes = probes.select(
        key_col, "row", _cms_bucket_expr(width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles (the third mergeable summary: bin
# counts merge by sum, like CMS; quantile extraction is a cum-sum scan
# over at most n_bins rows)
# ---------------------------------------------------------------------------

def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    n_bins: int = 1000,
    quantiles: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Approximate quantiles from a single-pass fixed-bin histogram:
    one row per requested integer percentile q — (q, bin, upper_edge,
    cum_count, n_total). The answer bin is the first whose cumulative
    count reaches ceil(q * N / 100); ``upper_edge`` bounds the true
    quantile from above by one bin width ((hi - lo) / n_bins).

    Everything except the two edge doubles is integer: bin ids, counts,
    thresholds — so results are partition-order independent and
    engine-portable (no percentile_approx black box).

    100 TB shape: one min/max agg (broadcast back as a 1-row
    crossJoin), one narrow bin projection + map-side-combined count —
    scan-bound; the cum-sum window runs over <= n_bins rows. Bin
    counts are mergeable by SUM across partitions/epochs like
    :func:`cms_build` cells.
    """
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    qs = sorted(set(int(q) for q in quantiles))
    if not qs or qs[0] < 1 or qs[-1] > 100:
        raise ValueError(f"quantiles must be integer percents in [1, 100]: {quantiles}")
    vals = df.select(F.col(value_col).cast("double").alias("_x")).filter(
        F.col("_x").isNotNull()
    )
    bounds = vals.agg(
        F.min("_x").alias("_lo"),
        F.max("_x").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    binned = vals.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.col("_hi") == F.col("_lo"), F.lit(0).cast("long")
        )
        .otherwise(
            F.least(
                F.lit(n_bins - 1).cast("long"),
                F.floor(
                    (F.col("_x") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * n_bins
                ),
            )
        )
        .alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cum = counts.select(
        "bin",
        "cnt",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_count"),
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(q,) for q in qs], "q: int")
    hit = (
        qdf.crossJoin(cum.crossJoin(F.broadcast(bounds)))
        .filter(
            F.col("cum_count") >= F.expr("CAST((q * _n + 99) div 100 AS BIGINT)")
        )
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        hit.join(cum, "bin")
        .crossJoin(F.broadcast(bounds))
        .select(
            "q",
            "bin",
            F.round(
                F.col("_lo")
                + (F.col("bin") + 1) * (F.col("_hi") - F.col("_lo")) / n_bins,
                6,
            ).alias("upper_edge"),
            "cum_count",
            F.col("_n").alias("n_total"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta) sketch — Bar-Yossef et al. 2002,
# Beyer et al. 2007. The set-OPERATION sketch: unlike HLL registers,
# KMV register sets support intersection estimates (audience overlap,
# cross-corpus contamination mass) because the k smallest hashes of a
# union are a uniform sample of the union.
# ---------------------------------------------------------------------------

_KMV_SPACE = 2**48  # 12 hex chars of md5: exactly representable in
# int64 products ((k-1) * 2^48 < 2^63 for k <= 16384), so estimates
# are pure integer arithmetic — no FP, engine-portable bit-for-bit.


def _check_kmv(k: int) -> None:
    if not (2 <= k <= 4096):
        raise ValueError(f"need 2 <= k <= 4096, got {k}")


def _kmv_hash(col):
    # +1 maps into [1, 2^48] — the kth-smallest divisor can never be 0
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
            "long"
        )
        + 1
    )


def kmv_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per group: the ascending array of the k smallest distinct value
    hashes (fewer when the group has < k distinct values — then the
    sketch IS the exact distinct set). Two shuffles: one distinct on
    (group, hash), one window on group; register state is bounded by
    k per group regardless of cardinality, and two sketches merge by
    'k smallest of the union' (:func:`kmv_union_registers`).
    """
    _check_kmv(k)
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _kmv_hash(F.col(value_col)).alias("h"))
        .dropDuplicates([*group_cols, "h"])
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("hashes"))
    )


def _kmv_est_expr(hashes_col: str, k: int):
    """n_distinct estimate from a register array column: exact size
    when under-filled, else (k-1) * 2^48 div h_k — int64 `div`, no
    floats anywhere (DuckDB twin: `//`)."""
    return F.expr(
        f"CASE WHEN size({hashes_col}) < {k} "
        f"THEN CAST(size({hashes_col}) AS BIGINT) "
        f"ELSE {(k - 1) * _KMV_SPACE} "
        f"div get({hashes_col}, size({hashes_col}) - 1) END"
    )


def kmv_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group distinct estimate: (group_cols..., n_distinct_est).
    Relative error ~ 1/sqrt(k-2); exact below k."""
    regs = kmv_registers(df, group_cols, value_col, k=k)
    return regs.select(
        *group_cols, _kmv_est_expr("hashes", k).alias("n_distinct_est")
    )


def kmv_union_registers(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Merge two register tables on their group columns: k smallest of
    the union — the same sketch the concatenated inputs would have
    produced. FULL outer on the group cols: a group seen by only one
    partial computation keeps its registers unchanged (an inner join
    would silently drop it)."""
    _check_kmv(k)
    group_cols = [c for c in a.columns if c != "hashes"]
    merged = a.withColumnRenamed("hashes", "_hashes_a").join(
        b.withColumnRenamed("hashes", "_hashes_b"), group_cols, "full"
    )
    empty = F.array().cast("array<long>")
    return merged.select(
        *group_cols,
        F.slice(
            F.array_sort(
                F.array_union(
                    F.coalesce("_hashes_a", empty),
                    F.coalesce("_hashes_b", empty),
                )
            ),
            1,
            k,
        ).alias("hashes"),
    )


def kmv_pairwise_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Distinct-set overlap between every pair of groups (a < b):
    (a, b, union_est, match_count, jaccard_ppm, intersect_est). The
    union sketch U is the k smallest of both registers; matches are U
    members present in BOTH registers; jaccard = matches/|U| in ppm;
    intersect_est = matches * union_est div |U|. All integer — exact
    (not just close) when both groups are under-filled.

    100 TB shape: registers are k-bounded per group, the pair join is
    |groups|^2 rows of 2k longs — driver-scale metadata even at
    thousands of groups.
    """
    _check_kmv(k)
    regs = kmv_registers(df, [group_col], value_col, k=k)
    a = regs.select(
        F.col(group_col).alias("a"), F.col("hashes").alias("ha")
    )
    b = regs.select(
        F.col(group_col).alias("b"), F.col("hashes").alias("hb")
    )
    pairs = a.join(b, F.col("a") < F.col("b"))
    u = F.slice(F.array_sort(F.array_union("ha", "hb")), 1, k)
    pairs = pairs.withColumn("u", u)
    match_count = F.size(
        F.array_intersect(F.array_intersect("u", "ha"), "hb")
    ).cast("long")
    union_est = _kmv_est_expr("u", k)
    pairs = pairs.select(
        "a",
        "b",
        union_est.alias("union_est"),
        match_count.alias("match_count"),
        F.size("u").cast("long").alias("_u_sz"),
    )
    # int64 overflow bound: match_count * union_est < 2^63, i.e. true
    # union cardinality below ~2^63 / k — far past any real corpus
    return pairs.select(
        "a",
        "b",
        "union_est",
        "match_count",
        F.expr("match_count * 1000000 div _u_sz").alias("jaccard_ppm"),
        F.expr("match_count * union_est div _u_sz").alias("intersect_est"),
    )


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches of
    the join keys (same depth/width — the caller's contract): the
    inner product of each hash row upper-bounds |A JOIN B| (Cormode &
    Muthukrishnan 2005 §4.2), and the estimate is the MIN over rows.
    One row out: (est_join_size).

    This is the planner-style use of the sketch: sizing a join's
    shuffle before running it from depth x width state per side —
    e.g. choosing broadcast vs shuffle, or detecting a fan-out join
    about to explode. All-integer (int64 sums of cnt_a * cnt_b).
    """
    prod = a.join(
        b.withColumnRenamed("cnt", "_cnt_b"), ["row", "bucket"], "inner"
    ).select("row", (F.col("cnt") * F.col("_cnt_b")).alias("_p"))
    per_row = prod.groupBy("row").agg(F.sum("_p").alias("_dot"))
    # a hash row whose buckets never collide across the two sketches
    # has dot = 0 (its row is absent from the inner join) — the min
    # must see it, so fill the row domain from both sketches
    row_dom = a.select("row").unionAll(b.select("row")).dropDuplicates()
    dots = row_dom.join(per_row, "row", "left").select(
        F.coalesce("_dot", F.lit(0)).alias("_dot")
    )
    return dots.agg(
        F.coalesce(F.min("_dot"), F.lit(0)).cast("long").alias("est_join_size")
    )


def histogram_quantiles_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int = 1000,
    quantiles: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Per-group :func:`histogram_quantiles`: (group_cols..., q, bin,
    upper_edge, cum_count, n_total), one row per group x percentile.
    Bounds are per group (join instead of the global broadcast); the
    cum-sum window runs per group over <= n_bins rows. Same ceil
    thresholds and integer bins as the global version.
    """
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    qs = sorted(set(int(q) for q in quantiles))
    if not qs or qs[0] < 1 or qs[-1] > 100:
        raise ValueError(
            f"quantiles must be integer percents in [1, 100]: {quantiles}"
        )
    gcols = list(group_cols)
    vals = df.select(
        *gcols, F.col(value_col).cast("double").alias("_x")
    ).filter(F.col("_x").isNotNull())
    bounds = vals.groupBy(*gcols).agg(
        F.min("_x").alias("_lo"),
        F.max("_x").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    binned = vals.join(F.broadcast(bounds), gcols).select(
        *gcols,
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.lit(n_bins - 1).cast("long"),
                F.floor(
                    (F.col("_x") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * n_bins
                ),
            )
        )
        .alias("bin"),
    )
    counts = binned.groupBy(*gcols, "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = counts.select(
        *gcols,
        "bin",
        "cnt",
        F.sum("cnt")
        .over(
            Window.partitionBy(*gcols)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum_count"),
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(q,) for q in qs], "q: int")
    hit = (
        cum.join(F.broadcast(bounds), gcols)
        .crossJoin(F.broadcast(qdf))
        .filter(
            F.col("cum_count")
            >= F.expr("CAST((q * _n + 99) div 100 AS BIGINT)")
        )
        .groupBy(*gcols, "q")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        hit.join(cum, [*gcols, "bin"])
        .join(F.broadcast(bounds), gcols)
        .select(
            *gcols,
            "q",
            "bin",
            F.round(
                F.col("_lo")
                + (F.col("bin") + 1) * (F.col("_hi") - F.col("_lo")) / n_bins,
                6,
            ).alias("upper_edge"),
            "cum_count",
            F.col("_n").alias("n_total"),
        )
    )
