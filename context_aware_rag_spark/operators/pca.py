"""Distributed PCA over an embedding column — exact-arithmetic fit.

Dimensionality reduction is the standard pre-step for embedding-heavy
curation at scale (SemDeDup/ANN over 64-1536-dim vectors gets cheaper
and often *better* after projecting to the top principal components).
The reference delegates all vector math to its embedding service; here
the corpus IS a DataFrame, so the fit must be a distributed
aggregation.

Shape (the 100 TB story):

1. **Mean** — per-coordinate sums in integer micros (truncation, the
   repo's cross-side rounding discipline): ``posexplode`` →
   map-side-combined ``groupBy(pos).sum`` — the exchange carries
   ``dim`` rows per map partition, nothing row-scaled.
2. **Gram matrix** — ONE corpus scan via ``mapInPandas``: each Arrow
   batch emits the upper triangle of ``sum_rows trunc(c_i*c_j*1e6)``
   as ``dim*(dim+1)/2`` (pos, val) partial rows; a global
   ``groupBy(pos).sum`` finishes it. Per-row products are truncated to
   integer micros BEFORE any summation, so the total is an int64 sum —
   exact and partitioning-independent (the same order-independence
   contract as the integer PageRank).
3. **Eigendecomposition** — driver-side ``numpy.linalg.eigh`` of the
   dim×dim integer matrix (dim² state, independent of corpus size;
   the classic tall-skinny regime). Component signs are fixed
   deterministically: the largest-|coefficient| entry (ties → lowest
   index) is made positive.
4. **Projection** — pure JVM: ``zip_with`` center + sequential
   ``aggregate`` fold per component (left-to-right IEEE float64, the
   fold order the pure-Python oracle replicates bit-for-bit), output
   truncated to integer micros.

The only driver materialization is the dim*(dim+1)/2 Gram cells +
dim mean cells — bounded by the embedding dimension, never the corpus.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _validate(dim: int, k: int) -> None:
    if dim < 1:
        raise ValueError(f"need dim >= 1, got {dim}")
    if not (1 <= k <= dim):
        raise ValueError(f"need 1 <= k <= dim, got k={k} dim={dim}")


def pca_fit(
    df: DataFrame,
    dim: int,
    k: int = 8,
    vec_col: str = "embedding",
) -> Tuple[List[float], List[List[float]], List[float], int]:
    """Fit top-``k`` principal components. Returns
    ``(mean, components, eigvals, n)`` — all driver-side, all bounded
    by ``dim``; ``components[j]`` is the j-th component (descending
    eigenvalue), sign-fixed.

    PRECONDITION: every row's ``vec_col`` is a non-null length-``dim``
    array (rows violating it raise via the in-plan assert).
    """
    _validate(dim, k)
    # in-plan lazy guard (the _guard_signature_length idiom: the filter
    # keeps the assert un-prunable; a dropped unused column would let
    # Catalyst optimize the check away entirely)
    vecs = df.filter(
        F.assert_true(
            F.col(vec_col).isNotNull() & (F.size(vec_col) == dim),
            F.lit(f"pca_fit: {vec_col} must be non-null length-{dim}"),
        ).isNull()
    ).select(F.col(vec_col).cast("array<double>").alias("_v"))

    # 1. mean in integer micros (truncation toward zero = Python int())
    sums = (
        vecs.select(F.posexplode("_v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.sum((F.col("x") * MICRO).cast("long")).alias("msum"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if not sums:
        raise ValueError("pca_fit: empty input")
    n = sums[0]["n"]
    msum = {r["pos"]: r["msum"] for r in sums}
    mean = [float(msum[i]) / float(n * MICRO) for i in range(dim)]

    # 2. Gram upper triangle, per-row micro truncation then int64 sums
    mean_arr = np.array(mean, dtype=np.float64)
    iu, ju = np.triu_indices(dim)

    def gram_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            mat = np.array(list(b["_v"]), dtype=np.float64)
            total = np.zeros(len(iu), dtype=np.int64)
            for lo in range(0, len(mat), 512):
                c = mat[lo : lo + 512] - mean_arr
                outer = np.einsum("bi,bj->bij", c, c)[:, iu, ju]
                total += np.trunc(outer * MICRO).astype(np.int64).sum(axis=0)
            yield pd.DataFrame({"pos": np.arange(len(iu)), "val": total})

    cells = (
        vecs.mapInPandas(gram_partials, schema="pos long, val long")
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    tri = {r["pos"]: r["val"] for r in cells}
    g = np.zeros((dim, dim), dtype=np.float64)
    for p in range(len(iu)):
        g[iu[p], ju[p]] = g[ju[p], iu[p]] = float(tri.get(p, 0))

    # 3. eigh (ascending) -> top-k descending, deterministic sign
    eigvals, eigvecs = np.linalg.eigh(g)
    comps, vals = [], []
    for j in range(dim - 1, dim - 1 - k, -1):
        v = eigvecs[:, j].copy()
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        vals.append(float(eigvals[j]) / MICRO)
    return mean, comps, vals, int(n)


def pca_project(
    df: DataFrame,
    mean: List[float],
    components: List[List[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project rows onto fitted components — pure JVM, exploded output
    (id, pc, value_micro) with the sequential-fold/truncation contract
    documented in the module docstring."""
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_lit, lambda a, b: a - b
    )
    out = df.select(F.col(id_col), centered.alias("_c"))
    proj_cols = []
    for j, comp in enumerate(components):
        w = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(F.col("_c"), w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_cols.append((dot * MICRO).cast("long").alias(f"_p{j}"))
    out = out.select(id_col, F.array(*proj_cols).alias("_p"))
    return out.select(
        id_col,
        F.posexplode("_p").alias("pc", "value_micro"),
    ).select(id_col, F.col("pc").cast("int").alias("pc"), "value_micro")


def pca_fit_project(
    df: DataFrame,
    dim: int,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit on the frame, project the same frame (the curation use:
    reduce once, feed SemDeDup/ANN downstream)."""
    base = df.select(id_col, vec_col).localCheckpoint()
    mean, comps, _, _ = pca_fit(base, dim=dim, k=k, vec_col=vec_col)
    return pca_project(base, mean, comps, id_col=id_col, vec_col=vec_col)
