"""A10 — hierarchical token-safe aggregation (tree reduce over chunks).

The reference recursively splits oversized inputs in half, summarizes
the halves, then re-aggregates (utils.py:104-231, recursion limit 8).
The Spark shape is the inverse tree: iteratively combine adjacent
chunks per conversation until one row per conv remains, applying a
pluggable combine (an LLM-summarize expression in production; a
deterministic truncating concat here) at every level.

Level mechanics: positions are RE-RANKED per level (row_number within
the group), so the number of levels is ceil(log2(max group size))
regardless of how sparse the original order column is (raw timestamps
as positions would otherwise need log2(position spread) levels).
Groups already reduced to one row pass through levels UNCHANGED —
results are compositional (a group's summary never depends on what
other groups still need reducing). Each level is one bounded shuffle,
strictly smaller than the last; no driver-side row data.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, Window
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
    combine: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Reduce each group's ordered texts to one summary row via pairwise
    tree aggregation. Returns (group_col, summary, n_levels).

    ``combine``: array<string> column -> string column (the U4 slot —
    an LLM summarize expression in production); defaults to the
    truncating concat. Raises if groups fail to converge within
    ``max_levels`` (cannot happen below 2^max_levels rows per group).
    """
    combine = combine or (lambda texts: default_combine(texts, cap))
    df = chunks.select(
        F.col(group_col).alias("g"),
        F.col(order_col).cast("long").alias("pos"),
        F.col(text_col).alias("txt"),
    )
    level = 0
    while True:
        biggest = (
            df.groupBy("g").count().agg(F.max("count")).collect()[0][0] or 0
        )
        if biggest <= 1:
            break
        if level >= max_levels:
            raise RuntimeError(
                f"tree_summarize did not converge in {max_levels} levels "
                f"(a group still has {biggest} rows); raise max_levels"
            )
        w = Window.partitionBy("g").orderBy("pos")
        sizes = df.groupBy("g").agg(F.count(F.lit(1)).alias("_n"))
        ranked = df.withColumn("_rnk", F.row_number().over(w)).join(sizes, "g")
        done = ranked.filter(F.col("_n") == 1).select(
            "g", F.lit(0).cast("long").alias("pos"), "txt"
        )
        # aggregate the ordered text array first, THEN apply combine in
        # a separate projection: combine is pluggable (the U4 slot) and
        # a pandas-UDF combine cannot wrap an aggregate expression
        # inside agg() — the two-step shape works for both JVM
        # expressions and Arrow UDFs, with an identical plan for the
        # default expression combine (Catalyst collapses the project)
        combined = (
            ranked.filter(F.col("_n") > 1)
            .groupBy("g", ((F.col("_rnk") - 1) / 2).cast("long").alias("ppos"))
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_rnk").alias("pos"), "txt"))
                ).alias("_arr")
            )
            .select(
                "g",
                F.col("ppos").alias("pos"),
                combine(
                    F.transform(F.col("_arr"), lambda s: s["txt"])
                ).alias("txt"),
            )
        )
        df = combined.unionByName(done).localCheckpoint()
        level += 1
    return df.select(
        F.col("g").alias(group_col),
        F.col("txt").alias("summary"),
        F.lit(level).alias("n_levels"),
    )
