#!/usr/bin/env python
"""spark-submit entrypoint for EP3 graph-vector retrieval over an
ingested KG workdir (reference VECTOR_GRAPH_SEARCH_QUERY +
ContextualCompressionRetriever).

    spark-submit --py-files context_aware_rag_spark.zip \
        jobs/query_kg.py --workdir <ingest workdir> \
        --query "what did ada tell bob" [--k 5] [--hops 2] [--compress]

Reads the ingest job's ``chunks``/``edges``/``nodes`` stage tables,
embeds the query with the configured embedder, assembles per-document
context (and optionally compresses it), and prints one JSON line per
retrieved document.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--hops", type=int, default=2)
    p.add_argument("--top-entities", type=int, default=40)
    p.add_argument("--compress", action="store_true")
    p.add_argument("--embedding-dim", type=int, default=64)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("kg-query")
        # chunk ids hash a Python-rendered epoch: a non-UTC session
        # timezone would shift the pandas-naive timestamps the UDF
        # sees and flip every sha1 chunk id (ADVICE r2)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from context_aware_rag_spark.deploy import ensure_on_executors
    from context_aware_rag_spark.functions.embedder import hash_embed
    from context_aware_rag_spark.operators.retrieval import (
        assemble_context,
        compress_context,
    )
    from context_aware_rag_spark.operators.similarity import with_text_embeddings

    ensure_on_executors(spark)

    chunks = (
        spark.read.parquet(os.path.join(args.workdir, "chunks"))
        .dropDuplicates(["chunk_id"])
        .select("chunk_id", "conv_id", "text")
    )
    edges = spark.read.parquet(os.path.join(args.workdir, "edges"))
    nodes = spark.read.parquet(os.path.join(args.workdir, "nodes"))

    with_emb = with_text_embeddings(chunks, dim=args.embedding_dim).localCheckpoint()
    qvec = [float(x) for x in hash_embed([args.query], dim=args.embedding_dim)[0]]

    ctx = assemble_context(
        with_emb, edges, nodes, qvec,
        k=args.k, top_entities=args.top_entities, hops=args.hops,
    )
    if args.compress:
        out = compress_context(ctx.localCheckpoint(), qvec)
    else:
        out = ctx
    for row in out.collect():
        print(json.dumps(row.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
