#!/usr/bin/env python
"""Canonicalization blocking scale evidence: exact blocked-GEMM vs LSH
banding at 1x and 10x DISTINCT SURFACE FORMS (the dimension that
actually grows the pairing cost — canonicalize_nodes collapses repeated
forms before pairing, so corpus growth alone never reaches this stage).

Prints ONE JSON line:
  {"sizes": [m, 10m], "exact_wall": [...], "lsh_wall": [...],
   "exact_growth": x, "lsh_growth": y, "pairs_equal": bool}

Sub-quadratic claim: exact growth trends toward 100x (quadratic in m);
LSH growth stays near-linear. pairs_equal verifies the LSH closure
matches the exact closure on the planted alias structure at 1x.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from context_aware_rag_spark.session import build_session  # noqa: E402


def make_nodes(spark, m: int):
    """m distinct surface forms in alias groups of 3 with the pipeline's
    alias geometry (base + 0.04*noise, within-group cosine ~0.998 —
    embedder.entity_embed semantics, synthesized directly so group count
    scales with m), spread over 4 types."""
    from pyspark.sql import functions as F

    from context_aware_rag_spark.functions.embedder import _unit_vec

    base = spark.range(m).select(
        F.col("id").cast("string").alias("node_id"),
        (F.col("id") / 3).cast("long").alias("grp"),
        F.concat(F.lit("T"), ((F.col("id") / 3).cast("long") % 4).cast("string")).alias("type"),
    )

    @F.pandas_udf("array<float>")
    def emb(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            out = []
            for key in s:
                nid, g = key.split("|")
                b = _unit_vec(f"grp::{g}", 64)
                n = _unit_vec(f"noise::{nid}", 64)
                v = b + 0.04 * n
                out.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.Series(out)

    return base.select(
        "node_id", "type",
        emb(F.concat_ws("|", "node_id", "grp")).alias("embedding"),
    ).localCheckpoint()


def closure(spark, with_emb, blocking: str, threshold: float = 0.9):
    from context_aware_rag_spark.operators.similarity import similarity_pairs

    t0 = time.monotonic()
    pairs = similarity_pairs(
        with_emb, threshold=threshold, blocking=blocking,
        bands=8, bits_per_band=16,
    )
    n_pairs = pairs.count()
    wall = time.monotonic() - t0
    return wall, n_pairs, pairs


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    m1 = int(os.environ.get("CANON_M", "4000"))
    spark = build_session(
        app_name="bench-canon", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from context_aware_rag_spark.deploy import ensure_on_executors

    ensure_on_executors(spark)

    from context_aware_rag_spark.operators.canonicalize import connected_components

    sizes = [m1, 10 * m1]
    exact_wall, lsh_wall, n_pairs, recalls = [], [], [], []
    closure_equal = None
    for i, m in enumerate(sizes):
        with_emb = make_nodes(spark, m)
        we, ne, pe = closure(spark, with_emb, "type")
        wl, nl, pl = closure(spark, with_emb, "lsh")
        exact_wall.append(round(we, 2))
        lsh_wall.append(round(wl, 2))
        n_pairs.append(nl)
        recalls.append(round(nl / max(ne, 1), 6))
        if i == 0:
            # the semantically relevant equality: alias groups are
            # near-cliques, so the transitive closure absorbs isolated
            # missed pairs — compare canonical maps, not pair sets
            ce = {tuple(r) for r in connected_components(pe).collect()}
            cl = {tuple(r) for r in connected_components(pl).collect()}
            closure_equal = ce == cl
    out = {
        "sizes": sizes,
        "exact_wall": exact_wall,
        "lsh_wall": lsh_wall,
        "n_pairs": n_pairs,
        "lsh_pair_recall": recalls,
        "exact_growth": round(exact_wall[1] / max(exact_wall[0], 1e-9), 1),
        "lsh_growth": round(lsh_wall[1] / max(lsh_wall[0], 1e-9), 1),
        "closure_equal_at_1x": closure_equal,
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
