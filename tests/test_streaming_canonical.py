"""Streaming incremental canonicalization: end-to-end equivalence with
the full-batch closure, replay idempotence, and delta boundedness."""

import glob
import os
import shutil

from context_aware_rag_spark.operators.canonicalize import canonicalize_nodes
from context_aware_rag_spark.streaming.canonical_ingest import (
    canonical_microbatch,
    read_canonical_map,
    read_canonical_nodes,
    start_streaming_canonical,
)

B0 = [("n1", "Alice", "Person"), ("n9", "Tokyo", "Location")]
B1 = [("n2", "Alice Johnson", "Person"), ("n8", "Paris", "Location")]
# a0 has a SMALLER id than every prior rep -> forces re-election and
# bridge edges through the incremental fold
B2 = [("a0", "Alice", "Person"), ("n5", "Ms. Johnson", "Person")]
COLS = ["node_id", "name", "type"]
THR = 0.9


def _full_map(spark):
    all_nodes = spark.createDataFrame(B0 + B1 + B2, COLS)
    return {
        (r.node_id, r.canon_id)
        for r in canonicalize_nodes(
            all_nodes, threshold=THR, blocking="lsh"
        ).collect()
    }


def _write_batches(spark, in_dir, batches):
    for i, rows in enumerate(batches):
        stage = os.path.join(in_dir, f"_stage{i}")
        spark.createDataFrame(rows, COLS).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(in_dir, f"b{i}.parquet"))
        shutil.rmtree(stage)


def test_streaming_canonical_end_to_end(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("sc_in"))
    out_dir = str(tmp_path_factory.mktemp("sc_out"))
    ckpt = str(tmp_path_factory.mktemp("sc_ckpt"))
    _write_batches(spark, in_dir, [B0, B1, B2])
    q = start_streaming_canonical(spark, in_dir, out_dir, ckpt, threshold=THR)
    q.awaitTermination(180)
    got = {
        (r.node_id, r.canon_id)
        for r in read_canonical_map(spark, out_dir).collect()
    }
    # the accumulated streaming map equals the full-batch closure, for
    # ANY epoch arrival order (the incremental exactness argument)
    assert got == _full_map(spark)
    assert read_canonical_nodes(spark, out_dir).count() == 6


def test_microbatch_replay_idempotent_and_deltas_bounded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sc_replay"))
    for i, b in enumerate([B0, B1, B2]):
        canonical_microbatch(
            spark.createDataFrame(b, COLS), out, epoch_id=i, threshold=THR
        )
    first = {
        (r.node_id, r.canon_id)
        for r in read_canonical_map(spark, out).collect()
    }
    assert first == _full_map(spark)
    # replay the LAST epoch (the foreachBatch replay contract)
    canonical_microbatch(
        spark.createDataFrame(B2, COLS), out, epoch_id=2, threshold=THR
    )
    second = {
        (r.node_id, r.canon_id)
        for r in read_canonical_map(spark, out).collect()
    }
    assert second == first
    # epoch-1 delta must not restate epoch-0 rows that did not change:
    # Tokyo (n9) maps to itself throughout and never enters any delta
    all_delta_nodes = {
        r.node_id
        for r in spark.read.option(
            "basePath", os.path.join(out, "canon_map_delta")
        ).parquet(os.path.join(out, "canon_map_delta", "epoch=*")).collect()
    }
    assert "n9" not in all_delta_nodes and "n8" not in all_delta_nodes
