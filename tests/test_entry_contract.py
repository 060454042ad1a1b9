"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count + order-insensitive values. The EXTRA_QUERIES registry
(demoted driver entries — the driver caps at 50) is swept identically.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from context_aware_rag_spark.plans import entry_queries as eq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = {**entry_mod.oracle_sql(), **eq.EXTRA_ORACLES}
QUERIES = {**entry_mod.queries(), **eq.EXTRA_QUERIES}
SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_driver_registry_within_cap():
    # the driver runs at most 50 registered queries (registration
    # order); every entry must get a CORRECTNESS row
    assert len(entry_mod.queries()) <= 50


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s, d = rowset(spark_cols, spark_rows), rowset(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:5]
    assert s == d, f"{name}: first mismatches {[(s[i], d[i]) for i in mism]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    }
