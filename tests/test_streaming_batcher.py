"""Stateful streaming batcher: batches straddling micro-batches fire
exactly once, out-of-order turns within a batch are tolerated, a
trailing is_last partial batch fires, an incomplete batch never fires.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from context_aware_rag_spark.streaming.batcher import streaming_batches

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("is_last", T.BooleanType(), False),
    ]
)

BATCH = 4


def write_file(spark, d, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": [r[2] for r in rows],
            "is_last": [r[3] for r in rows],
        }
    )
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))


def test_stateful_batcher(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # file 1: conv A turns 0,1 (half of batch 0) + out-of-order turn 3
    write_file(spark, in_dir, "f1", [
        ("A", 0, "t0", False), ("A", 1, "t1", False), ("A", 3, "t3", False),
    ])
    # file 2: completes batch 0 (turn 2), adds partial batch 1 (turns 4,5)
    # and conv B's final partial batch terminated by is_last
    write_file(spark, in_dir, "f2", [
        ("A", 2, "t2", False), ("A", 4, "t4", False), ("A", 5, "t5", False),
        ("B", 0, "b0", False), ("B", 1, "b1", True),
    ])

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = streaming_batches(stream, BATCH)
    q = (
        out.writeStream.format("memory")
        .queryName("batches")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = {
        (r["conv_id"], r["batch_id"]): r
        for r in spark.sql("SELECT * FROM batches").collect()
    }
    # conv A batch 0: fired once, ordered text despite out-of-order arrival
    a0 = rows[("A", 0)]
    assert a0["batch_text"] == "t0 t1 t2 t3"
    assert a0["n_turns"] == BATCH
    # conv B batch 0: partial but is_last and contiguous -> fired
    b0 = rows[("B", 0)]
    assert b0["batch_text"] == "b0 b1" and b0["n_turns"] == 2
    # conv A batch 1 (turns 4,5 only): incomplete, never fires
    assert ("A", 1) not in rows
    assert len(rows) == 2


def test_final_batch_with_missing_leading_turn(spark, tmp_path_factory):
    """Reference is_full anchors contiguity at the first PRESENT doc
    (ctx_rag_batcher.py:76-82): an is_last batch missing its leading
    turn must still fire, not be held forever."""
    import pandas as pd

    from context_aware_rag_spark.streaming.batcher import make_batch_assembler

    class FakeState:
        exists = False
        def update(self, v): self.saved = v
        def remove(self): pass

    assemble = make_batch_assembler(4)
    # batch base 8; turn 8 lost at the source; 10 is the conv's last
    pdf = pd.DataFrame({"turn_idx": [9, 10], "text": ["t9", "t10"],
                        "is_last": [False, True]})
    out = list(assemble(("convZ", 2), iter([pdf]), FakeState()))
    rows = pd.concat(out)
    assert len(rows) == 1
    assert rows.iloc[0]["batch_text"] == "t9 t10"
    assert rows.iloc[0]["min_turn"] == 9 and rows.iloc[0]["max_turn"] == 10
