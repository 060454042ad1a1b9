"""S4/S5/S6 — graph sinks (Iceberg first, parquet fallback).

Production target is Iceberg: ``df.writeTo("catalog.kg.nodes")
.createOrReplace()`` gives atomic snapshot swaps (the engine's
idempotent-resume story) and MERGE INTO for upserts; tables are
bucketed by id so downstream joins co-locate. The sandbox image has no
Iceberg jar, so targets containing a path separator write parquet with
identical semantics (overwrite = atomic-enough directory swap locally).

Set-semantics (MERGE) are applied BEFORE the write via dropDuplicates
on the natural key, matching the reference's MERGE-based upserts
(neo4j_db.py:508-608; arango bulk `on_duplicate="update"`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

NODE_KEY = ["node_id"]
EDGE_KEY = ["src", "dst", "rel_type", "conv_id"]


def write_table(df: DataFrame, target: str, key: list[str] | None = None) -> None:
    """Write ``df`` to an Iceberg table name or a filesystem path."""
    if key:
        df = df.dropDuplicates(key)
    if "/" in target:
        df.write.mode("overwrite").parquet(target)
        return
    try:
        df.writeTo(target).createOrReplace()
    except Exception as exc:  # Iceberg catalog absent in this image
        raise RuntimeError(
            f"table catalog write failed for {target!r}; pass a path for "
            f"parquet fallback ({exc})"
        ) from exc


def write_graph(nodes: DataFrame, edges: DataFrame, base: str) -> None:
    """Materialize the graph: nodes/edges under one base target."""
    sep = "/" if "/" in base else "."
    write_table(nodes, f"{base}{sep}nodes", key=NODE_KEY)
    write_table(edges, f"{base}{sep}edges", key=EDGE_KEY)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    key: list[str] | None = None,
) -> None:
    """Bucketed managed table (Iceberg ``bucket(n, col)`` partition
    transform in production; Spark bucketBy locally — same co-location
    contract): two tables bucketed on the same key join with ZERO
    exchange, which is the difference between one shuffle per query and
    none for the KG's recurring joins (edges⋈nodes on endpoint id,
    mentions⋈chunks on chunk_id) at 100 TB.
    """
    if key:
        df = df.dropDuplicates(key)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
