#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

The KG pipeline number is the one that matters at 100 TB: it reports
end-to-end transcripts→triples wall plus triples/sec throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from context_aware_rag_spark.session import build_session  # noqa: E402


HEADLINE = [
    "tpch_q1",
    "tpch_q3_top10",
    "j1_revenue_per_nation",
    "w2_event_linking",
    "w5_topk_per_user",
    "a1_ordered_concat",
    "word_explode_topk",
    "dedup_exact_normalized",
    "minhash_near_dups",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "token_count",
    "quality_scores",
    "ann_cosine_topk",
]


def force(df) -> int:
    """Execute the full plan; return row count (single action)."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    spark = build_session(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    from context_aware_rag_spark.deploy import ensure_on_executors

    ensure_on_executors(spark)  # executors need the package for pandas UDFs

    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.plans import entry_queries as eq
    from context_aware_rag_spark.plans.pipeline import run_pipeline

    timings: dict[str, float] = {}

    # -- KG construction pipeline (the flagship number) -------------------
    transcripts = eq.transcripts_for(spark, sf_dir)
    n_turns = transcripts.count()  # materialization cost excluded from timing

    t0 = time.monotonic()
    res = run_pipeline(spark, transcripts, PipelineConfig())
    n_triples = res.triples.count()
    kg_wall = time.monotonic() - t0
    timings["kg_pipeline"] = round(kg_wall, 3)

    t0 = time.monotonic()
    res_dedup = run_pipeline(
        spark, transcripts, PipelineConfig(deduplicate_nodes=True)
    )
    force(res_dedup.nodes)
    timings["kg_pipeline_dedup"] = round(time.monotonic() - t0, 3)

    # -- relational / training-data headline queries ----------------------
    for name in HEADLINE:
        fn = eq.QUERIES[name]
        t0 = time.monotonic()
        force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg": {
            "n_turns": n_turns,
            "n_triples": n_triples,
            "triples_per_sec": round(n_triples / kg_wall, 1),
            "turns_per_sec": round(n_turns / kg_wall, 1),
        },
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
