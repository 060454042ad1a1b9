"""Streaming maintenance of the valid-time fact-interval view: each
micro-batch of timed assertions folds into a globally-distinct
ASSERTION index (the facts.fact_assertions grain), and the
gaps-and-islands interval encoding is re-derived INCREMENTALLY — only
for the (subj, pred) slots the epoch actually touched.

Why slot-scoped, not full recompute: run-length interval encoding is
order-sensitive within a slot (a late assertion can split, close, or
reopen any interval of ITS slot) but slots are independent by
construction — fact_intervals partitions by (subj_name, pred) and no
expression crosses slots. So the correct incremental unit is the slot:
an epoch re-encodes exactly the slots present in its NEW assertions,
over the full accumulated assertion history OF THOSE SLOTS, and writes
the replacement rows to its own ``intervals/epoch=<id>`` partition.
The read side resolves each slot to the rows of the LATEST epoch that
wrote it — which by construction saw every assertion for the slot
known at that point, and any later assertion re-touches the slot in a
later epoch. Stream == batch over the concatenated input is
pytest-proven (tests/test_streaming_facts.py).

100 TB shape: the per-epoch cost is (epoch assertions) + (accumulated
assertions OF TOUCHED SLOTS) — epoch-sized times the slot re-assertion
factor, never corpus-sized; the anti-join and the left_semi slot
filter shuffle on the same (subj, pred[, obj, ts]) keys the interval
encoder needs anyway. The read-side latest-per-slot resolution is one
slot-keyed window over the interval table (slot-partitioned — no
SinglePartition; same key discipline as facts.fact_intervals).

Exactly-once shape (identical to dedup/canonical/community ingest): a
replayed epoch reads the same strictly-prior index, recomputes the
same new-assertion set and the same slot re-encodings, and overwrites
the same ``epoch=<id>`` dirs byte-for-byte — replay idempotence is
pytest-proven.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .epochs import read_prior_index

_ASSERT_SCHEMA = "subj_name string, pred string, obj_name string, ts_s long"
_ASSERT_COLS = ["subj_name", "pred", "obj_name", "ts_s"]


def facts_microbatch(batch_df: DataFrame, out_dir: str, epoch_id: int) -> None:
    """Per-micro-batch body: fold the batch's distinct assertions into
    the epoch-partitioned assertion index, then re-encode the validity
    intervals of exactly the slots this epoch touched."""
    from ..operators.facts import fact_intervals

    spark = batch_df.sparkSession
    batch = batch_df.select(*_ASSERT_COLS).dropDuplicates()
    prior = read_prior_index(
        spark, out_dir, "assertions_new", epoch_id, _ASSERT_SCHEMA,
        "fact assertion",
    )
    # NULL-safe anti-join (defensive: the assertion grain is normally
    # non-NULL, but a NULL-bearing row must not be re-stored per epoch)
    cond = None
    for c in _ASSERT_COLS:
        eq = batch[c].eqNullSafe(prior[c])
        cond = eq if cond is None else (cond & eq)
    new_rows = batch.join(prior, cond, "left_anti").localCheckpoint()
    new_rows.write.mode("overwrite").parquet(
        os.path.join(out_dir, "assertions_new", f"epoch={epoch_id}")
    )
    # slot-scoped interval refresh: all accumulated assertions of the
    # touched slots (prior index + this epoch's new rows), re-encoded
    touched = new_rows.select("subj_name", "pred").dropDuplicates()
    slot_asserts = (
        prior.unionByName(new_rows)
        .join(touched, ["subj_name", "pred"], "left_semi")
    )
    fact_intervals(slot_asserts).write.mode("overwrite").parquet(
        os.path.join(out_dir, "intervals", f"epoch={epoch_id}")
    )


def read_assertions(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated globally-distinct assertion set (epoch dropped)."""
    base = os.path.join(out_dir, "assertions_new")
    return (
        spark.read.option("basePath", base)
        .parquet(os.path.join(base, "epoch=*"))
        .select(*_ASSERT_COLS)
    )


def read_fact_intervals(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained valid-time view: per slot, the interval rows of
    the latest epoch that re-encoded it — equal to batch
    ``facts.fact_intervals`` over every assertion ingested so far."""
    base = os.path.join(out_dir, "intervals")
    iv = spark.read.option("basePath", base).parquet(
        os.path.join(base, "epoch=*")
    )
    w = Window.partitionBy("subj_name", "pred")
    return (
        iv.withColumn("_latest", F.max("epoch").over(w))
        .filter(F.col("epoch") == F.col("_latest"))
        .select(
            "subj_name", "pred", "obj_name",
            "valid_from", "valid_to", "n_asserts",
        )
    )


def start_streaming_facts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """readStream over a parquet directory of timed assertion rows ->
    foreachBatch(facts_microbatch). Returns the StreamingQuery."""
    reader = (
        spark.readStream.schema(_ASSERT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1)
        .parquet(input_dir)
    )

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        facts_microbatch(batch_df, out_dir, epoch_id)

    writer = reader.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
