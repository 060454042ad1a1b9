"""Salted two-phase linking must be row-identical to the single-window
version, including on the 50x-long conversation in the corpus."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.operators.chunking import chunk_transcripts
from context_aware_rag_spark.operators.linking import link_chunks
from context_aware_rag_spark.operators.skew import link_chunks_salted
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)

COLS = ["conv_id", "chunk_id", "position", "content_offset", "prev_chunk_id", "is_first"]


@pytest.fixture(scope="module")
def chunks(spark):
    rows = generate_rows(10)  # includes conv 7, the 50x-long one
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    return chunk_transcripts(df, PipelineConfig()).localCheckpoint()


def _key(rows):
    return sorted(tuple(r[c] for c in COLS) for r in rows)


@pytest.mark.parametrize("block_turns", [7, 256, 8192])
def test_salted_equals_plain(spark, chunks, block_turns):
    plain = _key(link_chunks(chunks).select(*COLS).collect())
    salted = _key(
        link_chunks_salted(chunks, block_turns=block_turns).select(*COLS).collect()
    )
    assert salted == plain


def test_global_index_equals_window(spark):
    """Two-phase global_index must be value-identical to the single-task
    row_number() OVER (ORDER BY ...) — including with duplicate sort
    prefixes (ties broken by the second column) and skewed input
    partitioning."""
    from pyspark.sql import Window

    from context_aware_rag_spark.operators.skew import global_index

    rows = [(i % 97, f"id{i:05d}", i * 3 % 11) for i in range(2000)]
    df = spark.createDataFrame(rows, ["ts", "event_id", "v"]).repartition(7)
    w = Window.orderBy("ts", "event_id")
    want = {
        (r["event_id"], r["doc_index"])
        for r in df.select(
            "event_id", F.row_number().over(w).cast("long").alias("doc_index")
        ).collect()
    }
    got = {
        (r["event_id"], r["doc_index"])
        for r in global_index(df, ["ts", "event_id"])
        .select("event_id", "doc_index")
        .collect()
    }
    assert got == want
    # deterministic across runs (fresh range-boundary sampling each time)
    again = {
        (r["event_id"], r["doc_index"])
        for r in global_index(df, ["ts", "event_id"], partitions=3)
        .select("event_id", "doc_index")
        .collect()
    }
    assert again == want


def test_global_index_plan_has_no_single_partition_exchange(spark):
    from context_aware_rag_spark.operators.skew import global_index

    df = spark.range(100).select(
        F.col("id").alias("ts"), F.col("id").cast("string").alias("event_id")
    )
    plan = global_index(df, ["ts", "event_id"])._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_long_conv_present(chunks):
    per_conv = chunks.groupBy("conv_id").count().collect()
    counts = {r["conv_id"]: r["count"] for r in per_conv}
    assert max(counts.values()) > 15 * (sorted(counts.values())[len(counts) // 2])


# ---------------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------------

class TestSaltedJoin:
    def _frames(self, spark):
        import random

        rnd = random.Random(5)
        left = [(i, rnd.choice([1, 1, 1, 1, 2, 3, None])) for i in range(300)]
        right = [(100 + j, rnd.choice([1, 2, 3, 4])) for j in range(40)]
        ldf = spark.createDataFrame(left, "lid: long, k: long")
        rdf = spark.createDataFrame(right, "rid: long, rk: long")
        return ldf, rdf

    def test_inner_equals_plain_join(self, spark):
        from context_aware_rag_spark.operators.skew import salted_join

        ldf, rdf = self._frames(spark)
        got = sorted(
            (r.lid, r.rid)
            for r in salted_join(ldf, rdf, "k", "rk", [1], n_salt=4).collect()
        )
        want = sorted(
            (r.lid, r.rid)
            for r in ldf.join(rdf, ldf["k"] == rdf["rk"]).collect()
        )
        assert got == want and len(got) > 0

    def test_left_join_keeps_unmatched_and_null_keys(self, spark):
        from context_aware_rag_spark.operators.skew import salted_join

        ldf, rdf = self._frames(spark)
        got = sorted(
            (r.lid, r.rid)
            for r in salted_join(
                ldf, rdf, "k", "rk", [1, 2], n_salt=4, how="left"
            ).collect()
        )
        want = sorted(
            (r.lid, r.rid)
            for r in ldf.join(rdf, ldf["k"] == rdf["rk"], "left").collect()
        )
        assert got == want
        # NULL-keyed left rows present exactly once, unmatched
        nulls = [t for t in got if t[1] is None]
        assert len(nulls) == sum(1 for r in ldf.collect() if r.k is None) + sum(
            1
            for r in ldf.collect()
            if r.k is not None
            and r.k not in {x.rk for x in rdf.collect()}
        )

    def test_hot_branch_partitions_on_salt(self, spark):
        from context_aware_rag_spark.operators.skew import salted_join

        ldf, rdf = self._frames(spark)
        jvm = spark.sparkContext._jvm
        plan = salted_join(ldf, rdf, "k", "rk", [1])._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "_salt" in plan  # the fan-out key reaches the exchange

    def test_validates(self, spark):
        from context_aware_rag_spark.operators.skew import salted_join

        ldf, rdf = self._frames(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_salt"):
            salted_join(ldf, rdf, "k", "rk", [1], n_salt=1)
        with _pytest.raises(ValueError, match="hot_keys"):
            salted_join(ldf, rdf, "k", "rk", [])
        with _pytest.raises(ValueError, match="how"):
            salted_join(ldf, rdf, "k", "rk", [1], how="outer")
        with _pytest.raises(ValueError, match="collision"):
            salted_join(ldf, ldf, "k", "k", [1])
