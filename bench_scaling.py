#!/usr/bin/env python
"""Scaling-efficiency evidence: the same KG-construction job at two
parallelism levels — N and 4N cores over the IDENTICAL parquet input —
reporting throughput at both plus efficiency = (T_N / T_4N) / 4.

Methodology
- The transcript corpus is generated once and written to parquet; both
  levels scan the same files (the production input shape — an Iceberg/
  parquet table — not a driver-cached RDD, whose deserialized java rows
  GC-throttle the bigger level and measure the cache, not the engine).
- Level choice: this host exposes 32 hardware threads over ~16 physical
  cores; a raw CPU-burn probe shows 8->32 processes yields only 2.9x
  (SMT), capping ANY job's possible efficiency at 0.73, while 4->16
  yields 3.87x (0.97). Default levels are therefore 4 and 16 so the
  measurement reflects the engine, not hyper-threading; override with
  SCALE_LEVELS=8,32.
- Each level runs in a fresh subprocess (own JVM) and does a small
  untimed warm-up first (python worker pool, codegen caches).

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
from context_aware_rag_spark.sources.transcripts import generate_transcripts
spark = build_session(app_name="scale-gen", master="local[32]", shuffle_partitions=32)
from context_aware_rag_spark.deploy import ensure_on_executors
ensure_on_executors(spark)
df = generate_transcripts(spark, int(sys.argv[1]), partitions=256)
df.write.mode("overwrite").parquet(sys.argv[2])
print("GENERATED", spark.read.parquet(sys.argv[2]).count())
spark.stop()
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "{repo}")
from context_aware_rag_spark.session import build_session
from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA, generate_transcripts)

cores = int(sys.argv[1])
path = sys.argv[2]
# split sizing: the 110MB corpus needs ~3-4 input tasks per core at the
# BIGGER level (55 tasks at 2MB) — the repo's sub-MB-testdata override
# (256k) makes ~500 tiny tasks whose fixed cost dominates the small
# level, while 8MB leaves the 16-core level 2 straggler-bound waves.
# Same rule a real cluster uses: provision splits, then measure.
mpb = os.environ.get("SCALE_MAX_PARTITION_BYTES", "2097152")
spark = build_session(app_name=f"scale{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=cores,
                      extra_conf={{"spark.sql.files.maxPartitionBytes": mpb}})
from context_aware_rag_spark.deploy import ensure_on_executors
ensure_on_executors(spark)   # pandas UDFs unpickle on executor workers

# untimed warm-up: spin up the python worker pool, codegen, Arrow paths
warm = generate_transcripts(spark, 20, partitions=cores)
run_pipeline(spark, warm, PipelineConfig()).triples.count()

trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
tr = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
n_turns = tr.count()
walls = []
for _ in range(trials):     # min-of-N: GC/turbo variance on a shared box
    t0 = time.monotonic()
    res = run_pipeline(spark, tr, PipelineConfig())
    n_triples = res.triples.count()
    walls.append(round(time.monotonic() - t0, 3))
wall = min(walls)
print(json.dumps({{"cores": cores, "n_turns": n_turns,
                  "n_triples": n_triples, "wall_s": wall, "walls": walls,
                  "triples_per_sec": round(n_triples / wall, 1)}}))
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
    n_convs = int(os.environ.get("SCALE_N_CONVS", "40000"))
    levels = os.environ.get("SCALE_LEVELS", "4,16").split(",")
    n, n4 = int(levels[0]), int(levels[1])
    # per-size default dir: a kept corpus from an earlier run at a
    # DIFFERENT SCALE_N_CONVS must never be silently reused (the same
    # fix bench_scaling_dedup.py got in round 3 — this harness measured
    # a stale 40k corpus under an 80k label once in round 4)
    input_dir = os.environ.get(
        "SCALE_INPUT_DIR",
        os.path.join(tempfile.gettempdir(), f"scale_transcripts_{n_convs}"),
    )
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        _run(GEN, str(n_convs), input_dir)

    def level(c: int, trials: int = 1) -> dict:
        out = _run(WORKER, str(c), input_dir, str(trials))
        return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])

    # interleave level sessions (lo, hi, lo, hi, ...): the shared box
    # drifts on minute scales, and back-to-back blocks would attribute
    # the drift to whichever level ran second — alternating sessions
    # expose both levels to the same conditions; min-of-sessions then
    # discards co-tenant noise
    rounds = int(os.environ.get("SCALE_ROUNDS", "3"))
    lo_runs = [level(n) for _ in range(1)]
    hi_runs = [level(n4) for _ in range(1)]
    for _ in range(rounds - 1):
        lo_runs.append(level(n))
        hi_runs.append(level(n4))

    def best(runs):
        b = min(runs, key=lambda r: r["wall_s"])
        b = dict(b)
        b["walls"] = [r["wall_s"] for r in runs]
        b["triples_per_sec"] = round(b["n_triples"] / b["wall_s"], 1)
        return b

    r_lo, r_hi = best(lo_runs), best(hi_runs)
    eff = (r_lo["wall_s"] / r_hi["wall_s"]) / (n4 / n)
    print(json.dumps({
        "metric": f"scaling_efficiency_{n}_to_{n4}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"level_{n}": r_lo,
        f"level_{n4}": r_hi,
        "n_convs": n_convs,
        "input": input_dir,
    }))
    if os.environ.get("SCALE_KEEP_INPUT", "1") != "1":
        shutil.rmtree(input_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
