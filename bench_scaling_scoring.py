#!/usr/bin/env python
"""Scaling-efficiency evidence for the SCORING/SELECTION family
(learned quality classifier, DSIR importance selection, corpus-trained
LM perplexity) — the hashed-feature operators added in round 4 —
over the identical parquet document corpus at two parallelism levels;
efficiency = (T_N / T_4N) / 4.

Methodology is bench_scaling_dedup.py's, unchanged: same files both
levels, fresh JVM per level session, untimed warm-up trial, settle
(evict + GC + touch) before every timer, interleaved lo/hi sessions
with min-of-sessions, 2 MB splits. Default corpus 100k docs (the DSIR
gram scan is the heavy op; 300k pushes lo-level sessions past useful
wall budgets without changing the ratio).

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
spark = build_session(app_name="scoring-gen", master="local[32]",
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
from context_aware_rag_spark.operators import dsir, lm, textmetrics

cores = int(sys.argv[1])
path = sys.argv[2]
trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
mpb = os.environ.get("SCALE_MAX_PARTITION_BYTES", "2097152")
spark = build_session(app_name=f"scoring{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=cores,
                      extra_conf={{"spark.sql.files.maxPartitionBytes": mpb}})
from context_aware_rag_spark.deploy import ensure_on_executors
ensure_on_executors(spark)

docs = spark.read.parquet(path)
n_docs = docs.count()          # warm: file listing + footers + one scan

def one_trial():
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
    spark.sparkContext._jvm.System.gc()
    docs.limit(1).count()
    t = {{}}
    t0 = time.monotonic()
    textmetrics.quality_classifier(docs).filter("keep").count()
    t["classifier"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    dsir.dsir_select(
        docs, docs.filter(F.col("doc_id") % 7 == 0),
        k=1000, n_buckets=65536,
    ).count()
    t["dsir"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    lm.bigram_lm_scores(docs).count()
    t["lm"] = round(time.monotonic() - t0, 3)
    t["total"] = round(t["classifier"] + t["dsir"] + t["lm"], 3)
    return t

one_trial()                     # untimed warm-up (codegen, worker pool)
trials_out = [one_trial() for _ in range(trials)]
best = min(trials_out, key=lambda t: t["total"])
print(json.dumps({{"cores": cores, "n_docs": n_docs, "wall_s": best["total"],
                  "per_op": best, "walls": [t["total"] for t in trials_out],
                  "docs_per_sec": round(n_docs / best["total"], 1)}}))
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
    n_docs = int(os.environ.get("SCALE_N_DOCS", "100000"))
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

    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(rounds):     # interleave lo/hi sessions (drift discipline)
        lo_runs.append(level(n))
        hi_runs.append(level(n4))

    def best(runs):
        b = dict(min(runs, key=lambda r: r["wall_s"]))
        b["walls"] = [r["wall_s"] for r in runs]
        b["docs_per_sec"] = round(b["n_docs"] / b["wall_s"], 1)
        return b

    r_lo, r_hi = best(lo_runs), best(hi_runs)
    eff = (r_lo["wall_s"] / r_hi["wall_s"]) / (n4 / n)
    print(json.dumps({
        "metric": f"scoring_scaling_efficiency_{n}_to_{n4}",
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
