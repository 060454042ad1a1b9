"""Shared Hadoop FileSystem access.

Directory listings MUST go through the Hadoop FileSystem API — a
driver-side ``os.listdir`` silently returns nothing for a non-local
path (HDFS/S3), which reads as "empty store" and disables whatever
relied on the listing (the original dedup_ingest ADVICE finding).
One helper so the idiom can't drift across call sites
(streaming/dedup_ingest, operators/layout, sources/snapstore).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_and_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path``, resolved through the
    session's Hadoop configuration so remote schemes work."""
    sc = spark.sparkContext
    p = sc._jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(sc._jsc.hadoopConfiguration()), p


def hadoop_path(spark: SparkSession, path: str):
    """A bare Hadoop Path (for delete/rename calls on an existing fs
    handle)."""
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(path)
