#!/usr/bin/env python
"""Scaling-efficiency evidence for the SCAN-BOUND summary family
(sketches + profiling + the bucketed range join), complementing the
KG (bench_scaling.py), dedup (bench_scaling_dedup.py), scoring and
graph harnesses: HLL distinct over the exploded word stream, Count-Min
build, one-pass table profile, and the 20x-points range join, at two
parallelism levels; efficiency = (T_N / T_4N) / 4.

Methodology unchanged from the other harnesses: same parquet corpus
both levels, fresh JVM per level session, untimed warm-up, settle
(evict + GC + touch) before timers, interleaved lo/hi sessions with
min-of-sessions, 2 MB splits. Range-join inputs are derived
deterministically from the corpus size (points = 20 x docs, intervals
= docs, avg length 300, bucket width 512).

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
from context_aware_rag_spark.session import build_session
from context_aware_rag_spark.sources.synth_docs import synthesize_docs

n_docs = int(sys.argv[1])
out = sys.argv[2]
spark = build_session(app_name="sketch-gen", master="local[32]",
                      shuffle_partitions=32)
synthesize_docs(spark, n_docs).write.mode("overwrite").parquet(out)
print("GENERATED", spark.read.parquet(out).count())
spark.stop()
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "{repo}")
from pyspark.sql import functions as F
from context_aware_rag_spark.session import build_session
from context_aware_rag_spark.operators import intervals, profile, sketches

cores = int(sys.argv[1])
path = sys.argv[2]
trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
mpb = os.environ.get("SCALE_MAX_PARTITION_BYTES", "2097152")
spark = build_session(app_name=f"sketch{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=cores,
                      extra_conf={{"spark.sql.files.maxPartitionBytes": mpb}})
from context_aware_rag_spark.deploy import ensure_on_executors
ensure_on_executors(spark)

docs = spark.read.parquet(path)
n_docs = docs.count()          # warm: file listing + footers + one scan
n_points = n_docs * 20
pts = spark.range(n_points).select(
    F.col("id").alias("pid"), ((F.col("id") * 7) % (n_points * 20)).alias("p"))
ivs = spark.range(n_docs).select(
    F.col("id").alias("iid"),
    ((F.col("id") * 131) % (n_points * 20)).alias("s"),
    (((F.col("id") * 131) % (n_points * 20)) + F.col("id") % 600).alias("e"))

def words():
    return docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))

def one_trial():
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
    spark.sparkContext._jvm.System.gc()
    docs.limit(1).count()
    t = {{}}
    t0 = time.monotonic()
    sketches.hll_count_distinct(
        words().select(F.lit("all").alias("g"), "w"), ["g"], "w", p=12
    ).collect()
    t["hll"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    sketches.cms_build(words(), "w", depth=4, width=4096).count()
    t["cms"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    profile.profile_table(docs, ["doc_id", "text"]).collect()
    t["profile"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    intervals.range_join_points(pts, ivs, "p", "s", "e", bucket_width=512).count()
    t["range_join"] = round(time.monotonic() - t0, 3)
    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 3)
    return t

one_trial()                     # untimed warm-up (codegen, worker pool)
trials_out = [one_trial() for _ in range(trials)]
best = min(trials_out, key=lambda t: t["total"])
print(json.dumps({{"cores": cores, "n_docs": n_docs, "wall_s": best["total"],
                  "per_op": best, "walls": [t["total"] for t in trials_out]}}))
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
    n_docs = int(os.environ.get("SCALE_N_DOCS", "300000"))
    levels = os.environ.get("SCALE_LEVELS", "4,16").split(",")
    n, n4 = int(levels[0]), int(levels[1])
    input_dir = os.environ.get(
        "SCALE_INPUT_DIR",
        os.path.join(tempfile.gettempdir(), f"scale_docs_{n_docs}"),
    )
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        _run(GEN, str(n_docs), input_dir)

    def level(c: int, trials: int = 2) -> dict:
        out = _run(WORKER, str(c), input_dir, str(trials))
        return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])

    rounds = int(os.environ.get("SCALE_ROUNDS", "3"))
    lo_runs, hi_runs = [], []
    for _ in range(rounds):     # interleave lo/hi sessions (drift discipline)
        lo_runs.append(level(n))
        hi_runs.append(level(n4))

    def best(runs):
        b = dict(min(runs, key=lambda r: r["wall_s"]))
        b["walls"] = [r["wall_s"] for r in runs]
        return b

    r_lo, r_hi = best(lo_runs), best(hi_runs)
    eff = (r_lo["wall_s"] / r_hi["wall_s"]) / (n4 / n)
    print(json.dumps({
        "metric": f"sketch_scaling_efficiency_{n}_to_{n4}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"level_{n}": r_lo,
        f"level_{n4}": r_hi,
        "n_docs": r_lo["n_docs"],
        "input": input_dir,
    }))
    if os.environ.get("SCALE_KEEP_INPUT", "1") != "1":
        shutil.rmtree(input_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
