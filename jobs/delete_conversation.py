#!/usr/bin/env python
"""spark-submit entrypoint for per-conversation KG delete + orphan
cleanup (reference QUERY_TO_DELETE_UUID_GRAPH, constants.py:406-443,
surfaced by the service's delete API).

    spark-submit --py-files context_aware_rag_spark.zip \
        jobs/delete_conversation.py \
        --workdir <dir written by jobs/ingest_kg.py> \
        --conv-ids conv00002,conv00007 [--run-id del1]

Reads the ingest job's ``nodes``/``edges`` stage tables, applies the
delete, and writes versioned ``nodes_<run-id>`` / ``edges_<run-id>``
tables (on an Iceberg catalog this is a MERGE/DELETE on the same
table; parquet stage dirs get an atomic new version instead). Prints
one JSON line with before/after row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--conv-ids", required=True,
                   help="comma-separated conversation ids to delete")
    p.add_argument("--run-id", default="del0")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("kg-delete")
        # chunk ids hash a Python-rendered epoch: a non-UTC session
        # timezone would shift the pandas-naive timestamps the UDF
        # sees and flip every sha1 chunk id (ADVICE r2)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from context_aware_rag_spark.deploy import ensure_on_executors
    from context_aware_rag_spark.operators.delete import delete_conversations

    ensure_on_executors(spark)

    nodes = spark.read.parquet(os.path.join(args.workdir, "nodes"))
    edges = spark.read.parquet(os.path.join(args.workdir, "edges"))
    conv_ids = [c.strip() for c in args.conv_ids.split(",") if c.strip()]

    t0 = time.monotonic()
    res = delete_conversations(nodes, edges, conv_ids)
    out_nodes = os.path.join(args.workdir, f"nodes_{args.run_id}")
    out_edges = os.path.join(args.workdir, f"edges_{args.run_id}")
    res.nodes.write.mode("overwrite").parquet(out_nodes)
    res.edges.write.mode("overwrite").parquet(out_edges)
    wall = time.monotonic() - t0

    print(json.dumps({
        "run_id": args.run_id,
        "conv_ids": conv_ids,
        "wall_s": round(wall, 3),
        "nodes_before": nodes.count(),
        "nodes_after": spark.read.parquet(out_nodes).count(),
        "edges_before": edges.count(),
        "edges_after": spark.read.parquet(out_edges).count(),
        "deleted_ids": res.deleted_node_ids.count(),
        "nodes_out": out_nodes,
        "edges_out": out_edges,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
