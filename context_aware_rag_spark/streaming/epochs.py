"""Shared epoch-partitioned index plumbing for the streaming ingest
family (dedup_ingest, canonical_ingest): list epoch dirs through the
Hadoop FileSystem API and read the strictly-prior slice with loud
failures on the two silent-corruption modes."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def epoch_ids(spark: SparkSession, base: str) -> "list[int] | None":
    """Epoch partition ids under ``base``, listed through the Hadoop
    FileSystem API so remote stores (HDFS/S3) resolve like local paths —
    a driver-side ``os.listdir`` would silently return nothing for a
    non-local ``out_dir`` and disable cross-epoch state. Returns ``None``
    when the base dir does not exist (vs ``[]`` for exists-but-empty)."""
    from ..fsutil import fs_and_path

    fs, path = fs_and_path(spark, base)
    if not fs.exists(path):
        return None
    return [
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(path)
        if st.isDirectory() and st.getPath().getName().startswith("epoch=")
    ]


def read_prior_index(
    spark: SparkSession,
    out_dir: str,
    subdir: str,
    before_epoch: int,
    schema: str,
    what: str,
) -> DataFrame:
    """Index rows accumulated by epochs STRICTLY BEFORE ``before_epoch``
    (a replayed epoch must not see its own partial output).

    Fails loudly on the two silent-corruption modes: a missing index
    dir when prior epochs should have written one (remote-store
    misconfiguration would otherwise disable cross-epoch state), and
    epoch dirs FROM THE FUTURE (> current epoch), which mean the stream
    checkpoint was reset while the output dir was kept — epoch ids
    restart at 0, and new data would resolve against dead epochs."""
    base = os.path.join(out_dir, subdir)
    ids = epoch_ids(spark, base)
    if ids is None:
        if before_epoch > 0:
            raise FileNotFoundError(
                f"streaming {what} index missing at {base!r} but epoch "
                f"{before_epoch} expects epochs 0..{before_epoch - 1} to have "
                "written it — wrong out_dir or filesystem misconfiguration "
                "(cross-epoch state would be silently disabled)"
            )
        return spark.createDataFrame([], schema)
    stale = [e for e in ids if e > before_epoch]
    if stale:
        raise RuntimeError(
            f"streaming {what} out_dir {out_dir!r} contains epoch dirs "
            f"{sorted(stale)} beyond current epoch {before_epoch}: the "
            "stream checkpoint was reset (epoch ids restart at 0) while the "
            "output dir was kept — clear out_dir or restore the checkpoint"
        )
    prior = [e for e in ids if e < before_epoch]
    if not prior:
        return spark.createDataFrame([], schema)
    return (
        spark.read.option("basePath", base)
        .parquet(*[os.path.join(base, f"epoch={e}") for e in prior])
        .drop("epoch")
    )
