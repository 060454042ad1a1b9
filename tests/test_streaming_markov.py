"""Streaming Markov metrics: cross-epoch boundary stitching makes the
stream exactly equal to the batch operator; replay idempotence rests
on the per-epoch overwrite."""

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import functions as F

from context_aware_rag_spark.operators import seqmine
from context_aware_rag_spark.streaming.markov_metrics import (
    markov_microbatch,
    read_merged_transitions,
    start_streaming_markov,
)

BASE = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    # rows: (user, sec, token); event_id = sec (unique per user here)
    return spark.createDataFrame(
        [
            (u, sec, BASE + dt.timedelta(seconds=sec), t)
            for (u, sec, t) in rows
        ],
        "user_id: long, event_id: long, ts: timestamp, event_type: string",
    )


# user 1's sequence a,b,c,d is CUT across all three epochs (b->c and
# c->d are boundary pairs); user 2 appears in epochs 0 and 2 only, so
# its stitch must skip epoch 1
EPOCHS = [
    [(1, 0, "a"), (1, 1, "b"), (2, 0, "x")],
    [(1, 2, "c")],
    [(1, 3, "d"), (2, 5, "y"), (2, 6, "x")],
]


def _sorted_rows(df):
    return sorted(
        (r.from_token, r.to_token, r.n_obs, r.from_total, r.p_ppm)
        for r in df.collect()
    )


class TestStreamingMarkov:
    def test_stitched_stream_equals_batch(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("mk_out"))
        for i, rows in enumerate(EPOCHS):
            markov_microbatch(_df(spark, rows), out, epoch_id=i)
        got = _sorted_rows(read_merged_transitions(spark, out))
        everything = _df(spark, [r for e in EPOCHS for r in e])
        exp = _sorted_rows(seqmine.markov_transitions(everything))
        assert got == exp
        # the cut pairs really are present (they exist in no epoch)
        pairs = {(a, b) for a, b, *_ in got}
        assert ("b", "c") in pairs and ("c", "d") in pairs
        assert ("x", "y") in pairs  # user 2's epoch-skipping stitch

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("mk_replay"))
        for i, rows in enumerate(EPOCHS):
            markov_microbatch(_df(spark, rows), out, epoch_id=i)
        first = _sorted_rows(read_merged_transitions(spark, out))
        markov_microbatch(_df(spark, EPOCHS[1]), out, epoch_id=1)
        second = _sorted_rows(read_merged_transitions(spark, out))
        assert first == second

    def test_end_to_end_stream(self, spark, tmp_path_factory):
        in_dir = str(tmp_path_factory.mktemp("mk_in"))
        out = str(tmp_path_factory.mktemp("mk_stream"))
        for i, rows in enumerate(EPOCHS):
            stage = os.path.join(in_dir, f"_stage{i}")
            _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(in_dir, f"b{i}.parquet"))
            shutil.rmtree(stage)
        schema = _df(spark, [(1, 0, "a")]).schema
        q = start_streaming_markov(spark, in_dir, out, schema=schema)
        q.awaitTermination(120)
        got = read_merged_transitions(spark, out)
        # the file source's epoch order is not contractually the write
        # order, so assert the order-independent invariant: total
        # transition mass = sum over groups of (n_events - 1)
        total = got.agg(F.sum("n_obs")).collect()[0][0]
        assert total == sum(len(e) for e in EPOCHS) - 2  # 2 groups
        # and per-from totals match the summed observations
        bad = got.filter(
            F.col("p_ppm") != F.expr("n_obs * 1000000 div from_total")
        ).count()
        assert bad == 0
