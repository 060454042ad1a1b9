"""Versioned upsert store over plain parquet (merge-on-read).

The production design targets Iceberg (see sinks.py), whose jar this
image lacks; this module supplies the same table semantics — MERGE
upserts, deletes, snapshot isolation, time travel, compaction — from
first principles, the way Delta/Iceberg actually implement them:

    base/
      delta=00000000/   ordered commits: rows + _op (upsert | delete)
      delta=00000001/
      ckpt=00000001/    optional checkpoints: the RESOLVED state
                        through that delta (compaction artifacts)

- A READER resolves state as of delta n: newest-commit-wins per key
  (one window over (key, commit desc)), dropping keys whose newest
  op is delete. With a checkpoint at c <= n it reads ckpt=c plus only
  the deltas in (c, n] — merge-on-read with bounded log replay.
- A WRITER never mutates existing files: each commit is a new
  directory, so readers see either the old or the new snapshot
  (the same append-only-log contract as the streaming ingests).
- ``compact`` writes a checkpoint; ``vacuum`` deletes deltas a
  checkpoint already covers — state-invariant (tested).

All directory listing goes through the Hadoop FileSystem API so
remote stores resolve (the dedup_ingest ADVICE lesson).

100 TB shape: commits are append-only parquet writes; resolution is
one window shuffle over (checkpoint + tail deltas), not the full
history; compaction bounds the tail. Time travel = pick a smaller n.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_OP = "_op"
_COMMIT = "_commit"


def _fs(spark: SparkSession, path: str):
    from ..fsutil import fs_and_path

    return fs_and_path(spark, path)


def _list_ids(spark: SparkSession, base: str, prefix: str) -> "list[int]":
    fs, p = _fs(spark, base)
    if not fs.exists(p):
        return []
    return sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(p)
        if st.isDirectory() and st.getPath().getName().startswith(f"{prefix}=")
    )


def _next_commit(spark: SparkSession, base: str) -> int:
    ids = _list_ids(spark, base, "delta")
    return (ids[-1] + 1) if ids else 0


def _write_delta(df: DataFrame, base: str, commit: int) -> int:
    df.write.mode("errorifexists").parquet(
        os.path.join(base, f"delta={commit:08d}")
    )
    return commit


def commit_upsert(
    spark: SparkSession, base: str, df: DataFrame, key_cols: "list[str]"
) -> int:
    """Append an upsert commit (newest state for every key in ``df``);
    duplicate keys WITHIN one commit are rejected — which of them is
    'newest' would be undefined."""
    if not key_cols:
        raise ValueError("need key_cols")
    dup = (
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    if dup.limit(1).count() > 0:
        raise ValueError(f"duplicate keys within one commit on {key_cols}")
    return _write_delta(
        df.withColumn(_OP, F.lit("upsert")), base, _next_commit(spark, base)
    )


def commit_delete(
    spark: SparkSession, base: str, keys: DataFrame, key_cols: "list[str]"
) -> int:
    """Append a delete commit for the given key rows; non-key columns
    are typed NULLs from the latest commit's schema (a metadata-only
    read — resolution never looks at a tombstone's value columns, so
    running a full read_state here would pay a whole log-window
    shuffle for nothing)."""
    deltas = _list_ids(spark, base, "delta")
    if not deltas:
        raise FileNotFoundError(f"no commits in {base}")
    schema = spark.read.parquet(
        os.path.join(base, f"delta={deltas[-1]:08d}")
    ).schema
    missing = [k for k in key_cols if k not in schema.names]
    if missing:
        raise ValueError(f"key cols not in store schema: {missing}")
    tombstones = keys.select(*key_cols).dropDuplicates().select(
        *[
            F.col(f.name)
            if f.name in key_cols
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name != _OP
        ]
    )
    return _write_delta(
        tombstones.withColumn(_OP, F.lit("delete")),
        base,
        _next_commit(spark, base),
    )


def _read_log(
    spark: SparkSession, base: str, key_cols: "list[str]", as_of: int
) -> DataFrame:
    """Checkpoint (if any, at <= as_of) plus the tail deltas in
    (ckpt, as_of], each tagged with its commit id."""
    ckpts = [c for c in _list_ids(spark, base, "ckpt") if c <= as_of]
    start = -1
    frames = []
    if ckpts:
        start = ckpts[-1]
        frames.append(
            spark.read.parquet(os.path.join(base, f"ckpt={start:08d}"))
            .withColumn(_OP, F.lit("upsert"))
            .withColumn(_COMMIT, F.lit(start))
        )
    deltas = [
        d for d in _list_ids(spark, base, "delta") if start < d <= as_of
    ]
    for d in deltas:
        frames.append(
            spark.read.parquet(os.path.join(base, f"delta={d:08d}"))
            .withColumn(_COMMIT, F.lit(d))
        )
    if not frames:
        raise FileNotFoundError(f"no commits at or before {as_of} in {base}")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def read_state(
    spark: SparkSession,
    base: str,
    key_cols: "list[str]",
    as_of: "int | None" = None,
) -> DataFrame:
    """Resolved table state as of commit ``as_of`` (default: latest):
    newest commit wins per key, deletes drop the key. One window
    shuffle over checkpoint + tail."""
    deltas = _list_ids(spark, base, "delta")
    if not deltas:
        raise FileNotFoundError(f"no commits in {base}")
    n = deltas[-1] if as_of is None else as_of
    log = _read_log(spark, base, key_cols, n)
    w = Window.partitionBy(*key_cols).orderBy(F.col(_COMMIT).desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(_OP) == "upsert"))
        .drop("_rn", _OP, _COMMIT)
    )


def compact(
    spark: SparkSession, base: str, key_cols: "list[str]"
) -> int:
    """Write a checkpoint of the resolved state through the latest
    delta; readers from then on replay only newer deltas. Returns the
    checkpoint's commit id."""
    deltas = _list_ids(spark, base, "delta")
    if not deltas:
        raise FileNotFoundError(f"no commits in {base}")
    n = deltas[-1]
    read_state(spark, base, key_cols, as_of=n).write.mode(
        "errorifexists"
    ).parquet(os.path.join(base, f"ckpt={n:08d}"))
    return n


def vacuum(spark: SparkSession, base: str) -> "list[int]":
    """Delete delta directories fully covered by the latest checkpoint
    — state-invariant for reads at or after that checkpoint (time
    travel to EARLIER commits is forfeited, as in any table format's
    retention cleanup). Returns the removed commit ids."""
    ckpts = _list_ids(spark, base, "ckpt")
    if not ckpts:
        return []
    cut = ckpts[-1]
    from ..fsutil import hadoop_path

    fs, _ = _fs(spark, base)
    removed = []
    for d in _list_ids(spark, base, "delta"):
        if d < cut:
            fs.delete(
                hadoop_path(spark, os.path.join(base, f"delta={d:08d}")), True
            )
            removed.append(d)
    return removed
