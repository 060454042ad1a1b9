#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction ingestion job.

Cluster usage (the production shape; BASELINE.json north rule):

    python -m zipfile -c context_aware_rag_spark.zip context_aware_rag_spark
    spark-submit --py-files context_aware_rag_spark.zip \
        jobs/ingest_kg.py \
        --input  <iceberg table name | parquet path of transcripts> \
        --workdir <checkpoint/output dir> \
        [--batch-size 1] [--chunk-size 500] [--chunk-overlap 10] \
        [--dedup] [--synthesize-convs N] [--run-id r1]

Local sandbox evidence run (N vs 4N executor proxy):

    spark-submit --master local[8]  --py-files ... jobs/ingest_kg.py --synthesize-convs 240 --workdir /tmp/kg8
    spark-submit --master local[32] --py-files ... jobs/ingest_kg.py --synthesize-convs 240 --workdir /tmp/kg32

Prints one JSON line with rows per stage, wall seconds, triples/sec.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None, help="transcripts table/path")
    p.add_argument("--workdir", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--chunk-size", type=int, default=500)
    p.add_argument("--chunk-overlap", type=int, default=10)
    p.add_argument("--dedup", action="store_true")
    p.add_argument("--synthesize-convs", type=int, default=0,
                   help="generate a deterministic corpus instead of --input")
    p.add_argument("--run-id", default="run0")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("kg-ingest")
        # chunk ids hash a Python-rendered epoch: a non-UTC session
        # timezone would shift the pandas-naive timestamps the UDF
        # sees and flip every sha1 chunk id (ADVICE r2)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.deploy import ensure_on_executors
    from context_aware_rag_spark.plans.pipeline import run_pipeline
    from context_aware_rag_spark.sources.transcripts import (
        generate_transcripts,
        read_transcripts,
    )

    ensure_on_executors(spark)

    if args.synthesize_convs:
        transcripts = generate_transcripts(spark, args.synthesize_convs)
    elif args.input:
        transcripts = read_transcripts(spark, args.input)
    else:
        print("either --input or --synthesize-convs is required", file=sys.stderr)
        sys.exit(2)

    cfg = PipelineConfig(
        batch_size=args.batch_size,
        chunk_size=args.chunk_size,
        chunk_overlap=args.chunk_overlap,
        deduplicate_nodes=args.dedup,
    )
    t0 = time.monotonic()
    res = run_pipeline(spark, transcripts, cfg, workdir=args.workdir, run_id=args.run_id)
    n_triples = res.triples.count()
    wall = time.monotonic() - t0
    print(json.dumps({
        "run_id": args.run_id,
        "wall_s": round(wall, 3),
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / wall, 1),
        "stages": res.metrics,
    }, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
