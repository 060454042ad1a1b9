"""Physical-layout management: z-order clustering and small-file
compaction.

At 100 TB the scan cost of every downstream query is set by the file
layout, not the query plan: parquet readers skip row groups / files by
min-max stats, and stats are only selective when the writer clustered
the data. Sorting by one column gives skipping on that column only;
Z-ORDERING (interleaving the bits of several columns) gives useful
min-max locality on ALL of them at once — the standard lakehouse
technique (Delta/Iceberg `OPTIMIZE ZORDER BY`), absent from OSS Spark.

The z-key here is fully deterministic integer arithmetic:

    cell_i = floor((x_i - lo_i) * 2^bits / (hi_i - lo_i + 1))   < 2^bits
    zkey   = interleave(cell_0 .. cell_{n-1})   (bit j of col i
                                                 → position j*n + i)

so it is engine-portable (the DuckDB twin reproduces keys exactly) and
needs one bounds aggregation broadcast back — no sampling, no UDF.

Small-file compaction is the other half: streaming ingest and
per-partition writers leave thousands of KB-sized files whose open
cost dominates scans (the classic small-file problem). `compact_files`
rewrites a directory into ceil(rows / target)-sized files;
`compaction_plan` bins the current files first-fit-decreasing so an
incremental compactor can rewrite only the offending bins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _check_zorder(cols: "list[str]", bits: int) -> None:
    if not cols:
        raise ValueError("need at least one column")
    if not (1 <= bits and bits * len(cols) <= 63):
        raise ValueError(
            f"need 1 <= bits and bits * n_cols <= 63, got bits={bits} "
            f"n_cols={len(cols)}"
        )


def add_zorder_key(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 16,
    key_name: str = "zkey",
) -> DataFrame:
    """Append a z-order key interleaving ``cols`` (integer-valued;
    cast dates/timestamps first). NULL in any key column → NULL key
    (sorts first). Column ranges must satisfy
    (hi - lo + 1) * 2^bits < 2^63.

    100 TB shape: one min/max aggregation broadcast back as a 1-row
    crossJoin + a narrow bit-arithmetic projection — scan-bound, no
    shuffle beyond the bounds agg."""
    _check_zorder(cols, bits)
    if key_name in df.columns:
        raise ValueError(f"column {key_name!r} already exists")
    n = len(cols)
    bounds = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("long")).alias(f"_hi_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(bounds))
    # TRUE int64 division (`div`), not floor(double /): near the 2^53
    # double-precision edge (e.g. lo=0, hi=2^54, bits=8 — inside the
    # documented contract) the double quotient for x = hi rounds up to
    # exactly 2^bits, leaking a bit past the interleave width
    cells = []
    for i, c in enumerate(cols):
        lo, hi = F.col(f"_lo_{i}"), F.col(f"_hi_{i}")
        num = (F.col(c).cast("long") - lo) * F.lit(2**bits).cast("long")
        out = out.withColumn(f"_znum_{i}", num).withColumn(
            f"_zden_{i}", hi - lo + 1
        )
        cells.append(F.expr(f"_znum_{i} div _zden_{i}"))
    terms = [
        F.shiftleft(F.shiftright(cells[i], j).bitwiseAND(F.lit(1)), j * n + i)
        for i in range(n)
        for j in range(bits)
    ]
    zkey = reduce(lambda a, b: a.bitwiseOR(b), terms)
    return out.withColumn(key_name, zkey.cast("long")).drop(
        *[f"_lo_{i}" for i in range(n)],
        *[f"_hi_{i}" for i in range(n)],
        *[f"_znum_{i}" for i in range(n)],
        *[f"_zden_{i}" for i in range(n)],
    )


def repartition_zorder(
    df: DataFrame, cols: "list[str]", n_partitions: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` into ``n_partitions`` range partitions of the
    z-key, sorted within each — the write-side layout that makes every
    output file's min-max stats tight on ALL of ``cols``. The key
    column is dropped after sorting (a projection; physical order is
    preserved)."""
    if n_partitions < 1:
        raise ValueError(f"need n_partitions >= 1, got {n_partitions}")
    keyed = add_zorder_key(df, cols, bits=bits, key_name="_zorder_tmp")
    return (
        keyed.repartitionByRange(n_partitions, "_zorder_tmp")
        .sortWithinPartitions("_zorder_tmp")
        .drop("_zorder_tmp")
    )


def file_stats(spark: SparkSession, path: str) -> "list[tuple[str, int]]":
    """(name, bytes) for every data file directly under ``path``,
    listed through the Hadoop FileSystem API so remote stores resolve
    (same rationale as streaming.dedup_ingest). Raises when the path
    does not exist — a silent [] would read as 'already compact'."""
    from ..fsutil import fs_and_path

    fs, p = fs_and_path(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    return sorted(
        (st.getPath().getName(), st.getLen())
        for st in fs.listStatus(p)
        if st.isFile() and not st.getPath().getName().startswith("_")
    )


def compaction_plan(
    spark: SparkSession, path: str, target_bytes: int
) -> "list[list[str]]":
    """First-fit-decreasing binning of ``path``'s data files into
    ~``target_bytes`` rewrite groups; files already >= target stay in
    singleton bins (left alone by an incremental compactor). Driver-
    side by design — file listings are metadata, thousands of entries
    at most, and the rewrite itself is the distributed part."""
    if target_bytes < 1:
        raise ValueError(f"need target_bytes >= 1, got {target_bytes}")
    files = file_stats(spark, path)
    bins: "list[tuple[int, list[str]]]" = []
    for name, size in sorted(files, key=lambda t: (-t[1], t[0])):
        for i, (used, members) in enumerate(bins):
            if used + size <= target_bytes:
                bins[i] = (used + size, members + [name])
                break
        else:
            bins.append((size, [name]))
    return [members for _, members in bins]


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ceil(rows / target_rows_per_file) evenly-sized files at
    ``out_path``; returns the file count written. Round-robin
    repartition (not coalesce) so output sizes are even regardless of
    input skew."""
    if target_rows_per_file < 1:
        raise ValueError(
            f"need target_rows_per_file >= 1, got {target_rows_per_file}"
        )
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
