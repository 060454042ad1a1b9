"""Keyed snapshot diff — the incremental-materialization primitive.

The reference rebuilds its graph DB state per ingestion run and
exposes no way to see what an ingest changed (graph_db rewrites are
destructive; vss_ctx_rag/functions/graph_db.py). Snapshot diffing is
the Spark-native replacement: materialize node/edge tables per epoch
(sinks.py), diff consecutive epochs declaratively, and ship only the
delta to downstream consumers (MERGE INTO source, cache invalidation,
audit trail).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of two keyed snapshots.

    Returns one row per key present in either snapshot whose state
    differs: ``status`` in ('added', 'removed', 'changed'), key columns,
    and paired ``old_<v>`` / ``new_<v>`` value columns (NULL on the
    absent side). Keys equal in both snapshots are dropped — the delta
    is the output, so downstream cost scales with churn, not table
    size.

    Requires unique keys per snapshot (raises downstream consumers'
    fan-out otherwise — same unique-key precondition as the banding
    re-joins, documented not enforced: enforcing would cost an extra
    shuffle per call).

    100 TB shape: ONE full-outer sort-merge join on the key — the
    minimal possible plan for a diff; both sides prune to
    key+value columns at scan (column pruning reaches parquet). Equal
    rows are eliminated pre-shuffle-free by the null-safe comparison in
    the same stage as the join output. With both epochs bucketed by key
    (sinks.write_bucketed), the join plans with zero Exchange.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    if not value_cols:
        raise ValueError("need at least one value column")
    overlap = set(key_cols) & set(value_cols)
    if overlap:
        raise ValueError(f"key/value overlap: {sorted(overlap)}")
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(v).alias(f"old_{v}") for v in value_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(v).alias(f"new_{v}") for v in value_cols],
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, list(key_cols), "full_outer")
    changed = None
    for v in value_cols:
        neq = ~F.col(f"old_{v}").eqNullSafe(F.col(f"new_{v}"))
        changed = neq if changed is None else (changed | neq)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    keep = F.col("_in_old").isNull() | F.col("_in_new").isNull() | changed
    out_cols = (
        [status.alias("status")]
        + [F.col(k) for k in key_cols]
        + [F.col(f"old_{v}") for v in value_cols]
        + [F.col(f"new_{v}") for v in value_cols]
    )
    return joined.filter(keep).select(*out_cols)
