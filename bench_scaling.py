#!/usr/bin/env python
"""Scaling-efficiency evidence: the same KG-construction job at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N
vs 4N executors per BASELINE.md), identical input, reporting throughput
at both plus efficiency = (T8_wall / T32_wall) / 4.

Each level runs in a fresh subprocess (own JVM) so the measurements are
independent. Results print as one JSON line and are recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath("{repo}")))
sys.path.insert(0, "{repo}")
from context_aware_rag_spark.session import build_session
from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import generate_transcripts

cores = int(sys.argv[1])
n_convs = int(sys.argv[2])
spark = build_session(app_name=f"scale{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=cores)
tr = generate_transcripts(spark, n_convs, partitions=max(cores * 4, 32))
tr = tr.localCheckpoint()           # materialize input once, outside timing
n_turns = tr.count()
t0 = time.monotonic()
res = run_pipeline(spark, tr, PipelineConfig())
n_triples = res.triples.count()
wall = time.monotonic() - t0
print(json.dumps({{"cores": cores, "n_turns": n_turns,
                  "n_triples": n_triples, "wall_s": round(wall, 3),
                  "triples_per_sec": round(n_triples / wall, 1)}}))
spark.stop()
"""


def run_level(cores: int, n_convs: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_convs)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(os.environ.get("SCALE_N_CONVS", "240"))
    r8 = run_level(8, n_convs)
    r32 = run_level(32, n_convs)
    eff = (r8["wall_s"] / r32["wall_s"]) / 4.0
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "level_8": r8,
        "level_32": r32,
    }))


if __name__ == "__main__":
    main()
