"""Sequence packing: two-phase prefix sum equals the naive global
window cumsum, with no Exchange SinglePartition in the plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from context_aware_rag_spark.operators.packing import bin_stats, pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 900 + 5) for i in range(2000)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]).localCheckpoint()


def test_matches_naive_window_cumsum(spark, docs):
    got = {
        r["doc_id"]: (r["cum_before"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(docs, max_tokens=512).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: (r["c"], r["c"] // 512, r["c"] % 512)
        for r in docs.select(
            "doc_id",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long").alias("c"),
        ).collect()
    }
    assert got == naive


def test_no_single_partition_exchange(spark, docs):
    plan = pack_sequences(docs, max_tokens=512)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_bin_stats_fill(spark, docs):
    packed = pack_sequences(docs, max_tokens=512)
    stats = bin_stats(packed, max_tokens=512).collect()
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["tokens_started"] for r in stats) == total_tokens
    # bins are gap-free EXCEPT where a doc longer than max_tokens spans
    # several bins (no doc STARTS in the spanned ones); all bin ids are
    # within the total-token range and start at 0
    bins = sorted(r["bin_id"] for r in stats)
    assert bins[0] == 0
    assert bins[-1] <= total_tokens // 512
    assert len(bins) == len(set(bins))


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, max_tokens=128).count() == 0


def test_max_tokens_must_be_positive(spark, docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, max_tokens=0)
