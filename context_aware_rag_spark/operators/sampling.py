"""Deterministic corpus splitting and sampling.

A training-data pipeline needs REPRODUCIBLE splits and samples: the
same document must land in the same split on every run, on any cluster
size, with no RNG state to ship. Both operators here key on
``md5(id)`` — a content-stable hash Spark and DuckDB compute
identically (lowercase hex), so every decision is exactly
SQL-twin-able and, more importantly, re-derivable by any other engine
auditing the split.

Scale shape: both are single narrow maps over the corpus — no shuffle
for the split (a literal string comparison per row), and a
TakeOrdered(k) for the sample (per-partition top-k, then a k-row merge
on the driver — never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hex-string thresholds: md5 is uniform over [0, 16^32), so a
# lexicographic cut at 'cc' keeps 204/256 = 79.7% and 'e6' keeps
# 230/256 = 89.8% — the standard ~80/10/10 layout
DEFAULT_CUTS = (("train", "cc"), ("val", "e6"))


def _hash_col(id_col: str):
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def deterministic_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    cuts=DEFAULT_CUTS,
    final_split: str = "test",
) -> DataFrame:
    """Assign every row a stable train/val/test split from md5(id).

    ``cuts`` is an ordered list of (name, hex_upper_bound): a row joins
    the first split whose bound its hash precedes lexicographically;
    rows past every bound join ``final_split``. Adding data never moves
    an existing row between splits (the decision depends only on the
    row's own id), which is the property random-number splits lose.
    """
    cuts = list(cuts)
    bounds = [b for _, b in cuts]
    if any(b != b.lower() or not all(c in "0123456789abcdef" for c in b)
           for b in bounds):
        # md5 hex is lowercase; an uppercase bound compares BELOW every
        # letter-leading hash and silently skews the split
        raise ValueError(f"cut bounds must be lowercase hex: {bounds}")
    if bounds != sorted(bounds):
        raise ValueError(
            f"cut bounds must be ascending (later splits unreachable): {bounds}"
        )
    if "split" in docs.columns:
        raise ValueError("input already has a 'split' column")
    h = _hash_col(id_col)
    expr = F.lit(final_split)
    for name, bound in reversed(cuts):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    return docs.select("*", expr.alias("split"))


def hash_sample(
    docs: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic uniform sample WITHOUT replacement: the ``k`` rows
    with the smallest (md5(id), id). Reproducible across runs/engines
    and stable under partitioning (the id tie-breaker keeps the
    k-boundary deterministic; rows DUPLICATING an id still tie — feed
    deduped input if row identity matters); plans as TakeOrdered(k)
    (per-partition top-k + driver merge of k rows), never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if "_h" in docs.columns:
        raise ValueError("input already has a '_h' column")
    return (
        docs.withColumn("_h", _hash_col(id_col))
        .orderBy("_h", id_col)
        .limit(k)
        .drop("_h")
    )


def _hex8_threshold(frac: float) -> str:
    """frac in [0, 1] -> the 8-hex-digit string t such that
    P[md5(id)[:8] < t] = frac under a uniform hash."""
    return format(min(int(frac * 16**8), 16**8 - 1), "08x")


def mix_corpus(
    docs: DataFrame,
    weights: dict,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain mixing (the Pile / DoReMi-style per-source
    epoch weights): replicate every document of source ``s``
    ``weights[s]`` times in expectation — ``floor(w)`` guaranteed
    copies plus one fractional copy iff the first 8 hex chars of
    md5(id) fall below a per-source threshold. Sources absent from
    ``weights`` default to 1.0 (pass 0.0 to drop a source).

    Every decision is a pure function of (id, weights): re-running, on
    any cluster size, yields the SAME mixed corpus — the property RNG
    sampling loses — and the twin re-derives it in SQL. Output adds
    ``copy_idx`` (1..n_copies); rows with n_copies = 0 are dropped.

    Scale shape: one narrow map (hash + CASE on source) and an explode
    bounded by ceil(max weight) — no shuffle; the output inherits the
    input partitioning with each partition growing by at most the
    largest per-source weight.
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be >= 0: {weights}")
    for taken in ("copy_idx", "_n"):
        if taken in docs.columns:
            raise ValueError(f"input already has a '{taken}' column")
    h8 = F.substring(_hash_col(id_col), 1, 8)
    base = F.lit(1)
    extra = h8 < _hex8_threshold(0.0)  # default frac 0 -> never true
    for s, w in sorted(weights.items()):
        src = F.col(source_col) == s
        base = F.when(src, F.lit(int(w))).otherwise(base)
        extra = F.when(src, h8 < _hex8_threshold(w - int(w))).otherwise(extra)
    n_copies = (base + extra.cast("int")).alias("_n")
    return (
        docs.select("*", n_copies)
        .filter(F.col("_n") >= 1)  # sequence(1, 0) is DESCENDING, guard it
        .select(
            "*", F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("copy_idx")
        )
        .drop("_n")
    )


def stratified_sample(
    docs: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    pre_salts: int = 0,
) -> DataFrame:
    """Deterministic stratified sample: per stratum, the ``k`` rows
    with the smallest (md5(id), id) — the per-group version of
    :func:`hash_sample`, with the same properties (reproducible across
    runs/engines, stable under growth: a new row only enters a
    stratum's sample by displacing the current k-boundary, never by
    reshuffling survivors... strictly, rows below the boundary are
    unaffected).

    Scale shape: a per-stratum top-k is a window rank — ONE shuffle on
    the stratum key, but a hot stratum lands on one task and must sort
    its whole stratum. ``pre_salts > 0`` turns on the two-phase form:
    phase 1 ranks within (stratum, xxhash64(id) % pre_salts) and keeps
    k per salt — the hot stratum's sort spreads over ``pre_salts``
    tasks — phase 2 re-ranks the surviving <= k * pre_salts rows per
    stratum. Identical output (the global top-k is contained in the
    union of per-salt top-k's); pick pre_salts ~ executor count when a
    stratum can exceed one task's memory.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for taken in ("_h", "_rk", "_salt"):
        if taken in docs.columns:
            raise ValueError(f"input already has a '{taken}' column")
    out = docs.withColumn("_h", _hash_col(id_col))
    if pre_salts > 0:
        w1 = Window.partitionBy(strata_col, "_salt").orderBy("_h", id_col)
        out = (
            out.withColumn(
                "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(pre_salts))
            )
            .withColumn("_rk", F.row_number().over(w1))
            .filter(F.col("_rk") <= k)
            .drop("_rk", "_salt")
        )
    w = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_h", "_rk")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws u from md5(id) — the first 13
    hex digits as a dyadic rational in (0, 1], exactly representable
    in double — and the k rows maximizing u^(1/w), i.e. ln(u)/w, win.
    P[row in sample] rises with weight exactly as the weighted
    reservoir scheme prescribes, but with NO RNG state: re-running on
    any cluster size draws the same sample, and the twin re-derives
    every key in SQL.

    The sort key is rounded to integer micro-units (round(1e6 *
    ln(u)/w)) with the id as tie-break — the same discipline as the
    Adamic-Adar/PMI/BM25 families, so a last-ulp libm divergence
    between engines cannot flip the order. Rows with NULL or
    non-positive weights are excluded (zero weight = never sampled,
    matching A-ES's limit).

    Scale shape: one narrow map (hash + ln) and a TakeOrdered(k) —
    per-partition top-k, k-row driver merge, never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for taken in ("_u", "_key"):
        if taken in docs.columns:
            raise ValueError(f"input already has a '{taken}' column")
    # (int(md5[:13], 16) + 1) / 2^52: 13 hex digits = 52 bits, +1 keeps
    # u > 0 (ln defined) and u <= 1
    u = (
        F.conv(F.substring(_hash_col(id_col), 1, 13), 16, 10)
        .cast("long") + 1
    ) / F.lit(float(2**52))
    key = F.round(F.log(u) / F.col(weight_col) * 1e6).cast("long")
    return (
        docs.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn("_key", key)
        .orderBy(F.desc("_key"), F.col(id_col))
        .limit(k)
        .drop("_key")
    )
