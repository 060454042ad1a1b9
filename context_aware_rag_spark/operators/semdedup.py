"""SemDeDup — semantic deduplication via cluster-then-prune.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the embedding space,
then WITHIN each cluster find pairs above a cosine threshold and keep
exactly one document per near-duplicate group — the member FARTHEST
from the cluster centroid (the most atypical example carries the most
marginal information; ties break to the smallest id).

This is the scale-correct shape for embedding-level dedup at 100 TB:
the quadratic pair search never sees the corpus, only one cluster at a
time — cost sum_c |c|^2 with |c| ~ corpus/k, and k is chosen so a
cluster fits one task (the paper uses k = 50k on LAION). The cluster
pass itself is one Arrow-batched matmul per batch (nearest-centroid
assignment) + one groupBy shuffle on cluster_id. Contrast with
``dedup.embedding_near_dups``: that operator answers "give me all
near-dup PAIRS" (LSH-banded, auto-escalating); SemDeDup answers "give
me a pruned corpus" without materializing cross-cluster pairs at all.

Determinism (oracle-parity discipline): the centroid sample is
hash-ordered (xxhash64 of the id — replicated bit-for-bit by
oracle/xxh64.py), k-means is the shared fixed-seed Lloyd's from
operators/ann.py, and within each cluster rows are sorted by id before
the float32 GEMM, so every comparison sees bit-identical values in the
pure-Python oracle (oracle/precompute.py:semantic_dedup_py).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ann import _kmeans_centroids

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster_id", T.IntegerType()),
        T.StructField("family_id", T.LongType()),
        T.StructField("keep", T.BooleanType()),
    ]
)


def _normalize_f32(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1
    return mat / n


def _union_find_families(ids: np.ndarray, adj_i: np.ndarray, adj_j: np.ndarray):
    """Union-find over index pairs; returns root index per row."""
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(adj_i.tolist(), adj_j.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # root = smaller ID (ids are sorted, so index order = id order)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.array([find(i) for i in range(len(ids))])


def semantic_dedup(
    embs: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    sample_size: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Label every vector with its k-means cluster, its near-duplicate
    family within that cluster, and whether SemDeDup keeps it.

    Returns (vec_id, cluster_id, family_id, keep): ``family_id`` is the
    smallest id in the vector's connected component of the
    within-cluster cosine>=threshold graph (singleton -> own id);
    ``keep`` is true for exactly one member per family — the member
    with the LOWEST cosine to the cluster centroid (paper keeper rule),
    ties to the smallest id.

    ``id_col`` must be an INTEGRAL column (the per-cluster prune runs
    over a fixed ``vec_id: long`` Arrow schema); a silent cast of
    string ids would null them out and collapse every row into one
    family, so non-integral ids fail loudly here instead.
    """
    id_type = embs.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"semantic_dedup requires an integral id column; {id_col} is "
            f"{id_type} — map string ids to a surrogate long first"
        )
    # deterministic, unbiased centroid sample (same recipe as ann IVF:
    # hash order decorrelates the sample from ingest order)
    sample = np.array(
        [
            r[0]
            for r in embs.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ],
        dtype=np.float32,
    )
    cents = _kmeans_centroids(_normalize_f32(sample), n_clusters)

    @F.pandas_udf(T.IntegerType())
    def nearest_centroid(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = _normalize_f32(np.stack(s.to_numpy()).astype(np.float32))
            yield pd.Series(np.argmax(mat @ cents.T, axis=1).astype("int32"))

    assigned = embs.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        nearest_centroid(F.col(vec_col)).alias("cluster_id"),
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        cid = int(pdf["cluster_id"].iloc[0])
        mat = _normalize_f32(np.stack(pdf["_vec"].to_numpy()).astype(np.float32))
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        roots = _union_find_families(ids, iu[hit], ju[hit])
        cent_sim = mat @ cents[cid]
        keep = np.zeros(len(ids), dtype=bool)
        for root in np.unique(roots):
            members = np.nonzero(roots == root)[0]
            # keeper: farthest from centroid, ties -> smallest id
            # (members are in ascending-id order, argmin takes the first)
            keep[members[np.argmin(cent_sim[members])]] = True
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_id": np.full(len(ids), cid, dtype="int32"),
                "family_id": ids[roots],
                "keep": keep,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(prune, _OUT_SCHEMA)
