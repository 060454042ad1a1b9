"""Executor-side package deployment.

On a real cluster the package ships via ``spark-submit --py-files
context_aware_rag_spark.zip``. When the engine is imported into an
existing session (the driver harness imports ``__spark_entry__.py`` by
path, from an arbitrary cwd), executors still need the package on their
``sys.path`` to unpickle the pandas UDFs — :func:`ensure_on_executors`
zips the package once and registers it with ``sc.addPyFile``, which is
the same mechanism ``--py-files`` uses.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_ZIP_CACHE: dict[str, str] = {}


def package_zip() -> str:
    """Build (once per process) a zip of the package, return its path."""
    if "path" not in _ZIP_CACHE:
        fd, path = tempfile.mkstemp(suffix=".zip", prefix="context_aware_rag_spark_")
        os.close(fd)
        pkg_name = os.path.basename(_PKG_DIR)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(pkg_name, os.path.relpath(full, _PKG_DIR))
                    zf.write(full, rel)
        _ZIP_CACHE["path"] = path
    return _ZIP_CACHE["path"]


def ensure_on_executors(spark: SparkSession) -> None:
    """Idempotently make the package importable by executor workers."""
    sc = spark.sparkContext
    marker = "_context_aware_rag_spark_shipped"
    if getattr(sc, marker, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, marker, True)
