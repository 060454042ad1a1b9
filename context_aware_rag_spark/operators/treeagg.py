"""A10 — hierarchical token-safe aggregation (tree reduce over chunks).

The reference recursively splits oversized inputs in half, summarizes
the halves, then re-aggregates (utils.py:104-231, recursion limit 8).
The Spark shape is the inverse tree: iteratively combine adjacent
chunks per conversation until one row per conv remains, applying a
pluggable combine expression (an LLM-summarize pandas UDF in
production; a deterministic truncating concat here) at every level.

Each level is one groupBy on (conv_id, position // 2) — log2(n) bounded
shuffles, each strictly smaller than the last; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_combine(texts: Column, cap: int = 500) -> Column:
    """Deterministic stand-in for an LLM summarize call: ordered concat
    truncated to ``cap`` chars (token-safety analog)."""
    return F.substring(F.array_join(texts, " "), 1, cap)


def tree_summarize(
    chunks: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "position",
    text_col: str = "text",
    cap: int = 500,
    max_levels: int = 20,
) -> DataFrame:
    """Reduce each group's ordered texts to one summary row via pairwise
    tree aggregation. Returns (group_col, summary, n_levels)."""
    df = chunks.select(
        F.col(group_col).alias("g"),
        F.col(order_col).cast("long").alias("pos"),
        F.col(text_col).alias("txt"),
    )
    level = 0
    while level < max_levels:
        over = df.groupBy("g").count().filter(F.col("count") > 1).limit(1).count()
        if over == 0:
            break
        df = (
            df.groupBy("g", (F.col("pos") / 2).cast("long").alias("ppos"))
            .agg(
                default_combine(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "txt"))),
                        lambda s: s["txt"],
                    ),
                    cap,
                ).alias("txt")
            )
            .select("g", F.col("ppos").alias("pos"), "txt")
            .localCheckpoint()
        )
        level += 1
    return df.select(
        F.col("g").alias(group_col),
        F.col("txt").alias("summary"),
        F.lit(level).alias("n_levels"),
    )
