"""HyperLogLog sketch: register derivation vs hashlib, merge ==
recompute-on-union (the CRDT property), estimate accuracy in both
regimes, and the streaming epoch-merge path (equivalence with batch +
replay idempotence). The full-estimator SQL twin is swept by
test_entry_contract (query hll_user_distinct)."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from context_aware_rag_spark.operators import sketches
from context_aware_rag_spark.streaming.hll_metrics import (
    hll_microbatch,
    merged_estimate,
    start_streaming_hll,
)


def _py_register(value: str, p: int = 8):
    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[:8], 16) % (1 << p)
    v48 = int(h[8:20], 16)
    rho = 49 if v48 == 0 else 49 - v48.bit_length()
    return bucket, rho


def _docs(spark, values, group="g"):
    return spark.createDataFrame(
        [(group, v) for v in values], "grp: string, val: string"
    )


class TestHllRegisters:
    def test_matches_hashlib(self, spark):
        values = [f"user-{k}" for k in range(200)]
        got = {
            (r.bucket, r.m_j)
            for r in sketches.hll_registers(
                _docs(spark, values), ["grp"], "val"
            ).collect()
        }
        expected = {}
        for v in values:
            b, rho = _py_register(v)
            expected[b] = max(expected.get(b, 0), rho)
        assert got == set(expected.items())

    def test_merge_equals_union_recompute(self, spark):
        a = [f"u{k}" for k in range(150)]
        b = [f"u{k}" for k in range(100, 300)]  # overlapping
        ra = sketches.hll_registers(_docs(spark, a), ["grp"], "val")
        rb = sketches.hll_registers(_docs(spark, b), ["grp"], "val")
        merged = sorted(
            (r.bucket, r.m_j)
            for r in sketches.hll_merge(ra, rb).collect()
        )
        union = sorted(
            (r.bucket, r.m_j)
            for r in sketches.hll_registers(
                _docs(spark, sorted(set(a) | set(b))), ["grp"], "val"
            ).collect()
        )
        assert merged == union

    def test_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [("g", "x"), ("g", None)], "grp: string, val: string"
        )
        regs = sketches.hll_registers(df, ["grp"], "val").collect()
        assert len(regs) == 1

    def test_validates_p(self, spark):
        df = _docs(spark, ["x"])
        with pytest.raises(ValueError, match="7 <= p"):
            sketches.hll_registers(df, ["grp"], "val", p=4)


class TestHllEstimate:
    def test_linear_counting_small_range_exact_formula(self, spark):
        import math

        values = [f"v{k}" for k in range(20)]
        est = sketches.hll_count_distinct(
            _docs(spark, values), ["grp"], "val"
        ).collect()[0]
        occupied = len({_py_register(v)[0] for v in values})
        assert est.n_registers == occupied
        expected = round(256.0 * math.log(256.0 / (256 - occupied)), 4)
        assert est.estimate == expected
        # linear counting at this range is accurate to a few percent
        assert abs(est.estimate - 20) / 20 < 0.15

    def test_raw_regime_accuracy_at_10k(self, spark):
        values = [f"item-{k}" for k in range(10_000)]
        est = sketches.hll_count_distinct(
            _docs(spark, values), ["grp"], "val"
        ).collect()[0]
        # 1 sigma = 1.04/sqrt(256) = 6.5%; 3 sigma bound
        assert abs(est.estimate - 10_000) / 10_000 < 0.20

    def test_duplicates_do_not_move_estimate(self, spark):
        values = [f"v{k}" for k in range(500)]
        once = sketches.hll_count_distinct(
            _docs(spark, values), ["grp"], "val"
        ).collect()[0]
        thrice = sketches.hll_count_distinct(
            _docs(spark, values * 3), ["grp"], "val"
        ).collect()[0]
        assert once.estimate == thrice.estimate
        assert once.harmonic_s49 == thrice.harmonic_s49

    def test_per_group_independence(self, spark):
        df = spark.createDataFrame(
            [("a", f"x{k}") for k in range(50)]
            + [("b", f"x{k}") for k in range(10)],
            "grp: string, val: string",
        )
        est = {
            r.grp: r.estimate
            for r in sketches.hll_count_distinct(df, ["grp"], "val").collect()
        }
        assert est["a"] > est["b"] > 0


class TestStreamingHll:
    SCHEMA = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.StringType()),
        ]
    )

    def _write_batches(self, spark, in_dir, batches):
        import glob
        import shutil

        for i, rows in enumerate(batches):
            stage = os.path.join(in_dir, f"_stage{i}")
            spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(in_dir, f"b{i}.parquet"))
            shutil.rmtree(stage)

    def test_stream_equals_batch(self, spark, tmp_path_factory):
        in_dir = str(tmp_path_factory.mktemp("hll_in"))
        out_dir = str(tmp_path_factory.mktemp("hll_out"))
        batches = [
            [("g", f"u{k}") for k in range(100)],
            [("g", f"u{k}") for k in range(50, 200)],  # overlap
            [("h", f"w{k}") for k in range(30)],
        ]
        self._write_batches(spark, in_dir, batches)
        q = start_streaming_hll(
            spark, in_dir, out_dir, ["grp"], "val", schema=self.SCHEMA
        )
        q.awaitTermination(120)
        streamed = {
            r.grp: (r.harmonic_s49, r.estimate)
            for r in merged_estimate(spark, out_dir, ["grp"]).collect()
        }
        all_rows = [r for b in batches for r in b]
        batch = {
            r.grp: (r.harmonic_s49, r.estimate)
            for r in sketches.hll_count_distinct(
                spark.createDataFrame(all_rows, self.SCHEMA), ["grp"], "val"
            ).collect()
        }
        assert streamed == batch

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("hll_replay"))
        batch = spark.createDataFrame(
            [("g", f"u{k}") for k in range(80)], self.SCHEMA
        )
        hll_microbatch(batch, out_dir, 0, ["grp"], "val")
        once = merged_estimate(spark, out_dir, ["grp"]).collect()[0]
        hll_microbatch(batch, out_dir, 0, ["grp"], "val")  # replay
        twice = merged_estimate(spark, out_dir, ["grp"]).collect()[0]
        assert (once.harmonic_s49, once.estimate) == (
            twice.harmonic_s49,
            twice.estimate,
        )
