"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on a
deterministic synthesized transcripts corpus at sf0.001 scale and
returns the emitted triple set. ``queries()`` / ``oracle_sql()`` expose
every implemented operator (SURVEY.md §2 + training-data ops); see
``context_aware_rag_spark/plans/entry_queries.py`` for the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from context_aware_rag_spark.deploy import ensure_on_executors  # noqa: E402
from context_aware_rag_spark.plans import entry_queries  # noqa: E402


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Executor workers must import the package to unpickle pandas UDFs;
    ship it (addPyFile — the --py-files mechanism) before planning."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_on_executors(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → chunk → extract → clean → hash → triples."""
    ensure_on_executors(spark)
    return entry_queries.kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipped(fn) for name, fn in entry_queries.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
