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


def drop_persisted(spark) -> None:
    """Unpersist leftover localCheckpoint RDDs so one query's cached
    state doesn't GC-tax the next measurement."""
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
    except Exception:
        pass


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

    # untimed warm-up: codegen, python worker pool, parquet footer reads,
    # and one full scan of each input table (first-touch costs — cold
    # file read + codegen compile — otherwise land on whichever query
    # reads a table first and get misattributed to it)
    run_pipeline(
        spark, eq.generate_transcripts(spark, 5), PipelineConfig()
    ).triples.count()
    for warm_q in ("tpch_q1", "token_count", "embedding_norm_stats",
                   "w5_topk_per_user"):
        force(eq.QUERIES[warm_q](spark, sf_dir))

    # -- relational / training-data headline queries (light, first) -------
    for name in HEADLINE:
        fn = eq.QUERIES[name]
        drop_persisted(spark)
        t0 = time.monotonic()
        force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    drop_persisted(spark)

    # -- KG construction pipeline (the flagship number) -------------------
    # input materialized first: we time the ENGINE, not the synthesizer
    transcripts = eq.transcripts_for(spark, sf_dir).localCheckpoint()
    n_turns = transcripts.count()

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

    # 10x corpus: amortizes fixed job overhead, the honest throughput number
    from context_aware_rag_spark.sources.transcripts import generate_transcripts

    big = generate_transcripts(spark, 10 * eq.n_convs_for(sf_dir)).localCheckpoint()
    n_big_turns = big.count()
    t0 = time.monotonic()
    n_big_triples = run_pipeline(spark, big, PipelineConfig()).triples.count()
    big_wall = time.monotonic() - t0
    timings["kg_pipeline_10x"] = round(big_wall, 3)

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
            "kg_10x_turns": n_big_turns,
            "kg_10x_triples_per_sec": round(n_big_triples / big_wall, 1),
            "kg_10x_turns_per_sec": round(n_big_turns / big_wall, 1),
        },
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
