"""Bucketed co-located joins: two tables bucketed on the join key must
join with NO Exchange (the 100 TB story for the KG's recurring joins)."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.sources.sinks import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    nodes = spark.range(2000).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("node_id"),
        (F.col("id") % 7).alias("grp"),
    )
    edges = spark.range(8000).select(
        F.concat(F.lit("n"), (F.col("id") % 2000).cast("string")).alias("dst"),
        F.concat(F.lit("n"), ((F.col("id") * 13) % 2000).cast("string")).alias("src"),
    )
    write_bucketed_table(nodes, "bkt_nodes", "node_id", n_buckets=8)
    write_bucketed_table(
        edges.withColumnRenamed("dst", "node_id"), "bkt_edges", "node_id",
        n_buckets=8,
    )
    yield spark.table("bkt_nodes"), spark.table("bkt_edges")
    spark.sql("DROP TABLE IF EXISTS bkt_nodes")
    spark.sql("DROP TABLE IF EXISTS bkt_edges")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    nodes, edges = bucketed
    # disable auto-broadcast so the plan choice is bucket-vs-shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = edges.join(nodes, "node_id").groupBy("grp").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not reshuffle either bucketed side: the
        # only allowed exchange is the one feeding the final aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(node_id" not in join_part, plan
        # correctness unchanged
        total = joined.agg(F.sum("count")).collect()[0][0]
        assert total == 8000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_vs_unbucketed_plan(spark, bucketed):
    nodes, edges = bucketed
    plain_nodes = nodes.repartition(4)  # strips bucket metadata
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            edges.join(plain_nodes, "node_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the non-bucketed side needs an exchange on the join key
        assert "Exchange hashpartitioning(node_id" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
