"""Distributed PCA (operators/pca.py): bit-exact parity with the
pure-Python loop replication, geometry sanity, partitioning
invariance, and the in-plan shape guard."""

import random

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import pca
from context_aware_rag_spark.oracle.precompute import pca_project_py


def _synth_vectors(n=60, dim=8, seed=3):
    """Anisotropic cloud: coordinate 0 carries 10x the spread, so the
    top component must align with e0."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rng.uniform(-0.1, 0.1) for _ in range(dim)]
        v[0] = rng.uniform(-1.0, 1.0)
        rows.append((i, v))
    return rows


@pytest.fixture(scope="module")
def cloud(spark):
    rows = _synth_vectors()
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    ).localCheckpoint()
    return df, rows


def test_projection_matches_python_bit_exact(spark, cloud):
    df, rows = cloud
    got = sorted(
        (r.vec_id, r.pc, r.value_micro)
        for r in pca.pca_fit_project(df, dim=8, k=3).collect()
    )
    assert got == sorted(pca_project_py(rows, dim=8, k=3))


def test_partitioning_invariance(spark, cloud):
    df, _ = cloud
    base = sorted(
        map(tuple, pca.pca_fit_project(df, dim=8, k=3).collect())
    )
    for parts in (1, 7):
        again = sorted(
            map(
                tuple,
                pca.pca_fit_project(df.repartition(parts), dim=8, k=3).collect(),
            )
        )
        assert again == base


def test_top_component_captures_planted_variance(spark, cloud):
    df, _ = cloud
    mean, comps, eigvals, n = pca.pca_fit(df, dim=8, k=3)
    assert n == 60
    # descending eigenvalues, top one dominated by coordinate 0
    assert eigvals == sorted(eigvals, reverse=True)
    assert abs(comps[0][0]) > 0.95
    # sign fix: the pivot (largest-|x|) entry is positive
    for c in comps:
        assert max(c, key=abs) > 0


def test_projection_reduces_for_downstream(spark, cloud):
    df, _ = cloud
    out = pca.pca_fit_project(df, dim=8, k=2)
    assert out.columns == ["vec_id", "pc", "value_micro"]
    assert out.count() == 60 * 2
    assert out.select("pc").distinct().count() == 2


def test_validation_and_shape_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError):
        pca.pca_fit(df, dim=2, k=3)
    with pytest.raises(ValueError):
        pca.pca_fit(df, dim=0, k=1)
    with pytest.raises(ValueError):
        pca.pca_fit(
            spark.createDataFrame(
                [], "vec_id: long, embedding: array<double>"
            ),
            dim=2,
            k=1,
        )
    # wrong-length row fails loudly via the in-plan assert
    bad = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3])],
        "vec_id: long, embedding: array<double>",
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        pca.pca_fit(bad, dim=2, k=1)
    assert "length-2" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_real_embeddings_parity(spark):
    """End-to-end on the sf0.001 embeddings parquet — the same frame
    the EXTRA query uses at sf0.01."""
    import duckdb

    path = "/root/testdata/sf0.001/embeddings.parquet"
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{path}') ORDER BY vec_id"
    ).fetchall()
    df = spark.read.parquet(path)
    got = sorted(
        (r.vec_id, r.pc, r.value_micro)
        for r in pca.pca_fit_project(df, dim=64, k=4).collect()
    )
    assert got == sorted(pca_project_py(rows, dim=64, k=4))
