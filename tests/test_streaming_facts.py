"""Streaming valid-time fact maintenance: stream == batch intervals
over the concatenated assertions, slot-scoped incremental re-encode
(untouched slots keep their earlier epoch's rows), replay idempotence.
"""

import glob
import os
import shutil

from context_aware_rag_spark.operators import facts
from context_aware_rag_spark.streaming.facts_ingest import (
    facts_microbatch,
    read_assertions,
    read_fact_intervals,
    start_streaming_facts,
)

COLS = ["subj_name", "pred", "obj_name", "ts_s"]
SCHEMA = "subj_name: string, pred: string, obj_name: string, ts_s: long"

# epoch 0: vm flips rack7 -> rack9; db stable; one dup inside the batch
B0 = [
    ("vm", "hosted_on", "rack7", 10),
    ("vm", "hosted_on", "rack7", 10),   # in-batch dup collapses
    ("vm", "hosted_on", "rack9", 30),
    ("db", "hosted_on", "rack1", 5),
]
# epoch 1: a LATE assertion splits vm's first interval (rack8 @20),
# a cross-epoch exact dup, and a brand-new slot
B1 = [
    ("vm", "hosted_on", "rack8", 20),
    ("vm", "hosted_on", "rack7", 10),   # cross-epoch dup: not re-stored
    ("vm", "owned_by", "alice", 15),
]


def _write_batches(spark, in_dir, batches):
    for i, rows in enumerate(batches):
        stage = os.path.join(in_dir, f"_stage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(in_dir, f"b{i}.parquet"))
        shutil.rmtree(stage)


def _iv_set(df):
    return {
        (r.subj_name, r.pred, r.obj_name, r.valid_from, r.valid_to,
         r.n_asserts)
        for r in df.collect()
    }


def test_stream_equals_batch_and_slot_scoping(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("fx_in"))
    out_dir = str(tmp_path_factory.mktemp("fx_out"))
    ckpt = str(tmp_path_factory.mktemp("fx_ckpt"))
    _write_batches(spark, in_dir, [B0, B1])
    q = start_streaming_facts(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    # assertion index is globally distinct: 3 from B0 (in-batch dup
    # collapsed) + 2 genuinely new from B1 (the cross-epoch dup is not
    # re-stored)
    idx = {tuple(r) for r in read_assertions(spark, out_dir).collect()}
    assert len(idx) == 5

    # stream view == batch fact_intervals over the concatenated input
    batch_iv = facts.fact_intervals(
        spark.createDataFrame(B0 + B1, SCHEMA).dropDuplicates()
    )
    got = _iv_set(read_fact_intervals(spark, out_dir))
    assert got == _iv_set(batch_iv)
    # and the late rack8 assertion really split the interval
    assert ("vm", "hosted_on", "rack7", 10, 20, 1) in got
    assert ("vm", "hosted_on", "rack8", 20, 30, 1) in got

    # slot scoping: epoch 1 re-encoded ONLY its touched slots — the
    # untouched (db, hosted_on) slot still resolves from epoch 0
    e1 = spark.read.parquet(os.path.join(out_dir, "intervals", "epoch=1"))
    assert {(r.subj_name, r.pred) for r in e1.collect()} == {
        ("vm", "hosted_on"), ("vm", "owned_by"),
    }


def test_replay_idempotence(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("fx_replay"))
    b0 = spark.createDataFrame(B0, SCHEMA)
    b1 = spark.createDataFrame(B1, SCHEMA)
    facts_microbatch(b0, out_dir, 0)
    facts_microbatch(b1, out_dir, 1)
    before = _iv_set(read_fact_intervals(spark, out_dir))
    n_idx = read_assertions(spark, out_dir).count()
    # replay epoch 1 (crash-after-write, restart re-delivers the batch)
    facts_microbatch(b1, out_dir, 1)
    assert _iv_set(read_fact_intervals(spark, out_dir)) == before
    assert read_assertions(spark, out_dir).count() == n_idx


def test_read_side_no_single_partition(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("fx_plan"))
    facts_microbatch(spark.createDataFrame(B0, SCHEMA), out_dir, 0)
    df = read_fact_intervals(spark, out_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
