#!/usr/bin/env python
"""Scaling-efficiency evidence for the GRAPHLET family (induced quad
census + per-node graphlet degree vectors) over the identical
synthetic edge parquet at two parallelism levels;
efficiency = (T_N / T_4N) / 4.

Methodology is bench_scaling_dedup.py's, unchanged: same files both
levels, fresh JVM per level session, untimed warm-up trial, settle
(evict + GC + touch) before every timer, interleaved lo/hi sessions
with min-of-sessions, 2 MB splits.

The generator here is UNIFORM on purpose (no planted hub set, unlike
bench_scaling_graph.py): the graphlet operators' dominant stage is the
codegree wedge join, whose mass is Theta(sum C(d, 2)) — REAL output
mass that hub skew inflates quadratically rather than a join-strategy
artifact AQE could absorb (quad_census docstring documents the
degree-cap-upstream mitigation). Uniform degrees make the two-level
comparison measure the ENGINE's scaling of a fixed wedge mass, which
is the claim under test; the skew sensitivity itself is documented,
not hidden (see PLANS.md session-23).

Prints one JSON line; recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

GEN = r"""
import sys
sys.path.insert(0, "{repo}")
from pyspark.sql import functions as F
from context_aware_rag_spark.session import build_session

n_edges = int(sys.argv[1])
n_nodes = max(10, n_edges // 10)   # avg undirected degree ~ 20
out = sys.argv[2]
spark = build_session(app_name="quads-gen", master="local[32]",
                      shuffle_partitions=32)
df = spark.range(0, n_edges, 1, 256)
src = F.pmod(F.xxhash64("id", F.lit(1)), n_nodes)
dst = F.pmod(F.xxhash64("id", F.lit(2)), n_nodes)
df.select(src.cast("string").alias("src"),
          dst.cast("string").alias("dst")).write.mode(
    "overwrite").parquet(out)
print("GENERATED", spark.read.parquet(out).count())
spark.stop()
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "{repo}")
from context_aware_rag_spark.session import build_session
from context_aware_rag_spark.operators import graph
from context_aware_rag_spark.operators.triads import quad_census

cores = int(sys.argv[1])
path = sys.argv[2]
trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
mpb = os.environ.get("SCALE_MAX_PARTITION_BYTES", "2097152")
spark = build_session(app_name=f"quads{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=int(os.environ.get("SCALE_SHUFFLE_MULT", "1")) * cores,
                      extra_conf={{"spark.sql.files.maxPartitionBytes": mpb}})
from context_aware_rag_spark.deploy import ensure_on_executors
ensure_on_executors(spark)

edges = spark.read.parquet(path)
n_edges = edges.count()        # warm: file listing + footers + one scan

def one_trial():
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
    spark.sparkContext._jvm.System.gc()
    edges.limit(1).count()
    t = {{}}
    t0 = time.monotonic()
    qc = {{r.clazz: r.n for r in quad_census(edges).collect()}}
    t["quad_census"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    n_gdv = graph.graphlet_orbits(edges).count()
    t["graphlet_orbits"] = round(time.monotonic() - t0, 3)
    t["n_cliques4"] = int(qc["six_clique"])
    t["n_gdv_nodes"] = n_gdv
    t["total"] = round(t["quad_census"] + t["graphlet_orbits"], 3)
    return t

one_trial()                    # untimed warm-up (codegen, worker pool)
trials_out = [one_trial() for _ in range(trials)]
best = min(trials_out, key=lambda t: t["total"])
print(json.dumps({{"cores": cores, "n_edges": n_edges, "wall_s": best["total"],
                  "per_op": best, "walls": [t["total"] for t in trials_out],
                  "edges_per_sec": round(n_edges / best["total"], 1)}}))
spark.stop()
"""


def _run(code: str, *args: str) -> str:
    repo = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, "-c", code.format(repo=repo), *args],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"subprocess failed rc={out.returncode}: {args}")
    return out.stdout


def main() -> None:
    n_edges = int(os.environ.get("SCALE_N_EDGES", "1000000"))
    levels = os.environ.get("SCALE_LEVELS", "4,16").split(",")
    n, n4 = int(levels[0]), int(levels[1])
    input_dir = os.environ.get(
        "SCALE_INPUT_DIR",
        os.path.join(tempfile.gettempdir(), f"scale_quads_{n_edges}"),
    )
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        _run(GEN, str(n_edges), input_dir)

    def level(c: int, trials: int = 2) -> dict:
        out = _run(WORKER, str(c), input_dir, str(trials))
        return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])

    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(rounds):     # interleave lo/hi sessions (drift discipline)
        lo_runs.append(level(n))
        hi_runs.append(level(n4))

    def best(runs):
        b = dict(min(runs, key=lambda r: r["wall_s"]))
        b["walls"] = [r["wall_s"] for r in runs]
        b["edges_per_sec"] = round(b["n_edges"] / b["wall_s"], 1)
        return b

    r_lo, r_hi = best(lo_runs), best(hi_runs)
    eff = (r_lo["wall_s"] / r_hi["wall_s"]) / (n4 / n)
    print(json.dumps({
        "metric": f"quads_scaling_efficiency_{n}_to_{n4}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"level_{n}": r_lo,
        f"level_{n4}": r_hi,
        "n_edges": r_lo["n_edges"],
        "input": input_dir,
    }))
    if os.environ.get("SCALE_KEEP_INPUT", "1") != "1":
        shutil.rmtree(input_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
