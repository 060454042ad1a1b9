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


def _py_cms_bucket(row: int, key: str, width: int = 1024) -> int:
    # Kirsch-Mitzenmacher off one md5: bucket_i = (h1 + i*h2') mod m
    h = hashlib.md5(key.encode()).hexdigest()
    h1 = int(h[:8], 16)
    h2 = int(h[8:16], 16) * 2 + 1
    return (h1 + row * h2) % width


class TestCountMin:
    def test_cells_match_hashlib(self, spark):
        data = [("a",)] * 3 + [("b",)] * 2 + [("c",)]
        df = spark.createDataFrame(data, "k: string")
        got = {
            (r.row, r.bucket): r.cnt
            for r in sketches.cms_build(df, "k", depth=2, width=64).collect()
        }
        expected = {}
        for k, n in (("a", 3), ("b", 2), ("c", 1)):
            for row in range(2):
                cell = (row, _py_cms_bucket(row, k, 64))
                expected[cell] = expected.get(cell, 0) + n
        assert got == expected

    def test_estimate_upper_bounds_exact(self, spark):
        data = [(f"k{i % 37}",) for i in range(1000)]
        df = spark.createDataFrame(data, "k: string")
        cms = sketches.cms_build(df, "k", depth=4, width=64)  # collisions likely
        keys = df.dropDuplicates()
        est = {
            r.k: r.est
            for r in sketches.cms_query(cms, keys, "k", depth=4, width=64).collect()
        }
        exact = {}
        for (k,) in data:
            exact[k] = exact.get(k, 0) + 1
        assert all(est[k] >= exact[k] for k in exact)

    def test_exact_when_no_collisions(self, spark):
        data = [("x",)] * 5 + [("y",)] * 7
        df = spark.createDataFrame(data, "k: string")
        cms = sketches.cms_build(df, "k", depth=4, width=4096)
        est = {
            r.k: r.est
            for r in sketches.cms_query(
                cms, df.dropDuplicates(), "k", depth=4, width=4096
            ).collect()
        }
        assert est == {"x": 5, "y": 7}

    def test_merge_equals_recompute(self, spark):
        a = spark.createDataFrame([("x",)] * 3 + [("y",)], "k: string")
        b = spark.createDataFrame([("x",)] * 2 + [("z",)], "k: string")
        merged = sorted(
            (r.row, r.bucket, r.cnt)
            for r in sketches.cms_merge(
                sketches.cms_build(a, "k", depth=2, width=64),
                sketches.cms_build(b, "k", depth=2, width=64),
            ).collect()
        )
        full = sorted(
            (r.row, r.bucket, r.cnt)
            for r in sketches.cms_build(
                a.unionAll(b), "k", depth=2, width=64
            ).collect()
        )
        assert merged == full

    def test_weighted(self, spark):
        df = spark.createDataFrame([("x", 10), ("x", 5)], "k: string, w: long")
        est = sketches.cms_query(
            sketches.cms_build(df, "k", depth=2, width=256, weight_col="w"),
            df.select("k").dropDuplicates(),
            "k", depth=2, width=256,
        ).collect()
        assert est[0].est == 15

    def test_validates_params(self, spark):
        df = spark.createDataFrame([("x",)], "k: string")
        with pytest.raises(ValueError, match="depth"):
            sketches.cms_build(df, "k", depth=0)
        with pytest.raises(ValueError, match="width"):
            sketches.cms_build(df, "k", width=8)


class TestHistogramQuantiles:
    def test_uniform_integers_hit_exact_bins(self, spark):
        # values 1..100, 100 bins over [1, 100]: p50 lands in the bin
        # holding 50, p99 in the bin holding 99
        df = spark.createDataFrame(
            [(float(v),) for v in range(1, 101)], "x: double"
        )
        out = {
            r.q: r
            for r in sketches.histogram_quantiles(
                df, "x", n_bins=100, quantiles=(50, 99, 100)
            ).collect()
        }
        assert out[50].cum_count == 50
        assert out[99].cum_count == 99
        assert out[100].cum_count == 100  # last occupied bin
        # threshold arithmetic: ceil semantics
        assert out[50].n_total == 100

    def test_single_value_degenerate_range(self, spark):
        df = spark.createDataFrame([(7.0,)] * 5, "x: double")
        out = sketches.histogram_quantiles(df, "x", quantiles=(50,)).collect()
        assert len(out) == 1
        assert out[0].bin == 0 and out[0].cum_count == 5

    def test_upper_edge_bounds_true_quantile(self, spark):
        import random

        rnd = random.Random(7)
        vals = sorted(rnd.uniform(0, 1000) for _ in range(5000))
        df = spark.createDataFrame([(v,) for v in vals], "x: double")
        out = {
            r.q: r.upper_edge
            for r in sketches.histogram_quantiles(
                df, "x", n_bins=500, quantiles=(50, 90)
            ).collect()
        }
        true_p50 = vals[2499]
        true_p90 = vals[4499]
        width = (vals[-1] - vals[0]) / 500
        assert true_p50 <= out[50] <= true_p50 + 2 * width
        assert true_p90 <= out[90] <= true_p90 + 2 * width

    def test_validates_params(self, spark):
        df = spark.createDataFrame([(1.0,)], "x: double")
        with pytest.raises(ValueError, match="n_bins"):
            sketches.histogram_quantiles(df, "x", n_bins=0)
        with pytest.raises(ValueError, match="quantiles"):
            sketches.histogram_quantiles(df, "x", quantiles=(0,))


def _py_kmv_hash(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) + 1


class TestKmv:
    def test_registers_match_hashlib(self, spark):
        vals = [f"v{i}" for i in range(40)] + ["v0", "v1"]  # dups collapse
        df = spark.createDataFrame([(v,) for v in vals], "v: string")
        got = sketches.kmv_registers(
            df.withColumn("g", F.lit("x")), ["g"], "v", k=16
        ).collect()
        assert len(got) == 1
        expected = sorted(_py_kmv_hash(f"v{i}") for i in range(40))[:16]
        assert list(got[0].hashes) == expected

    def test_exact_below_k(self, spark):
        df = spark.createDataFrame(
            [(f"u{i % 7}",) for i in range(100)], "v: string"
        ).withColumn("g", F.lit("x"))
        est = sketches.kmv_count_distinct(df, ["g"], "v", k=64).collect()
        assert est[0].n_distinct_est == 7

    def test_estimate_accuracy(self, spark):
        df = spark.range(0, 20_000).select(
            F.lit("x").alias("g"), F.col("id").cast("string").alias("v")
        )
        est = sketches.kmv_count_distinct(df, ["g"], "v", k=256).collect()
        assert abs(est[0].n_distinct_est - 20_000) / 20_000 < 0.15

    def test_union_merge_equals_recompute(self, spark):
        a = spark.range(0, 500).select(
            F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
        )
        b = spark.range(300, 900).select(
            F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
        )
        merged = sketches.kmv_union_registers(
            sketches.kmv_registers(a, ["g"], "v", k=64),
            sketches.kmv_registers(b, ["g"], "v", k=64),
            k=64,
        ).collect()[0]
        full = sketches.kmv_registers(
            a.unionAll(b), ["g"], "v", k=64
        ).collect()[0]
        assert list(merged.hashes) == list(full.hashes)

    def test_pairwise_overlap_exact_when_underfilled(self, spark):
        # A = {0..59}, B = {40..99}: intersection 20, union 100 — both
        # under k, so every output column is exact
        rows = [("A", str(i)) for i in range(60)] + [
            ("B", str(i)) for i in range(40, 100)
        ]
        df = spark.createDataFrame(rows, "g: string, v: string")
        out = sketches.kmv_pairwise_overlap(df, "g", "v", k=128).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.a, r.b) == ("A", "B")
        assert r.union_est == 100
        assert r.match_count == 20
        assert r.intersect_est == 20
        assert r.jaccard_ppm == 200_000

    def test_pairwise_overlap_estimation_regime(self, spark):
        # 3000-element sets with 1000 shared: jaccard = 0.2
        rows = [("A", str(i)) for i in range(3000)] + [
            ("B", str(i)) for i in range(2000, 5000)
        ]
        df = spark.createDataFrame(rows, "g: string, v: string")
        r = sketches.kmv_pairwise_overlap(df, "g", "v", k=256).collect()[0]
        assert abs(r.union_est - 5000) / 5000 < 0.2
        assert abs(r.jaccard_ppm - 200_000) / 200_000 < 0.35
        assert abs(r.intersect_est - 1000) / 1000 < 0.45

    def test_validates_k(self, spark):
        df = spark.createDataFrame([("x", "v")], "g: string, v: string")
        with pytest.raises(ValueError, match="k"):
            sketches.kmv_registers(df, ["g"], "v", k=1)


class TestCmsJoinSize:
    def test_upper_bounds_and_tracks_exact(self, spark):
        # zipf-ish keys: exact join size = sum over keys of n_a * n_b
        a_rows = [(f"k{i % 13}",) for i in range(400)]
        b_rows = [(f"k{i % 7}",) for i in range(300)]
        a = spark.createDataFrame(a_rows, "k: string")
        b = spark.createDataFrame(b_rows, "k: string")
        exact = a.join(b, "k").count()
        est = sketches.cms_join_size(
            sketches.cms_build(a, "k", depth=4, width=1024),
            sketches.cms_build(b, "k", depth=4, width=1024),
        ).collect()[0].est_join_size
        assert est >= exact
        assert est <= exact * 1.2  # wide sketch: collisions negligible

    def test_exact_when_collision_free(self, spark):
        a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "k: string")
        b = spark.createDataFrame([("x",)] * 5 + [("z",)], "k: string")
        est = sketches.cms_join_size(
            sketches.cms_build(a, "k", depth=4, width=4096),
            sketches.cms_build(b, "k", depth=4, width=4096),
        ).collect()[0].est_join_size
        assert est == 15  # 3 * 5

    def test_disjoint_keys_small(self, spark):
        a = spark.createDataFrame([("a1",), ("a2",)], "k: string")
        b = spark.createDataFrame([("b1",), ("b2",)], "k: string")
        est = sketches.cms_join_size(
            sketches.cms_build(a, "k", depth=4, width=4096),
            sketches.cms_build(b, "k", depth=4, width=4096),
        ).collect()[0].est_join_size
        assert est == 0


class TestStreamingCms:
    SCHEMA = T.StructType([T.StructField("k", T.StringType())])

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
        from context_aware_rag_spark.streaming.cms_metrics import (
            merged_query,
            start_streaming_cms,
        )

        in_dir = str(tmp_path_factory.mktemp("cms_in"))
        out_dir = str(tmp_path_factory.mktemp("cms_out"))
        batches = [
            [(f"k{i % 5}",) for i in range(60)],
            [(f"k{i % 3}",) for i in range(30)],
            [("k0",)] * 7,
        ]
        self._write_batches(spark, in_dir, batches)
        q = start_streaming_cms(
            spark, in_dir, out_dir, "k", schema=self.SCHEMA, width=256
        )
        q.awaitTermination(120)
        keys = spark.createDataFrame([(f"k{i}",) for i in range(5)], self.SCHEMA)
        streamed = {
            r.k: r.est
            for r in merged_query(
                spark, out_dir, keys, "k", width=256
            ).collect()
        }
        all_rows = [r for b in batches for r in b]
        batch = {
            r.k: r.est
            for r in sketches.cms_query(
                sketches.cms_build(
                    spark.createDataFrame(all_rows, self.SCHEMA), "k",
                    width=256,
                ),
                keys, "k", width=256,
            ).collect()
        }
        assert streamed == batch

    def test_replayed_epoch_cannot_double_count(self, spark, tmp_path_factory):
        # CMS merge is SUM (not idempotent) — replay safety comes from
        # the per-epoch OVERWRITE, which this pins
        from context_aware_rag_spark.streaming.cms_metrics import (
            cms_microbatch,
            merged_query,
        )

        out_dir = str(tmp_path_factory.mktemp("cms_replay"))
        batch = spark.createDataFrame([("x",)] * 9, self.SCHEMA)
        keys = spark.createDataFrame([("x",)], self.SCHEMA)
        cms_microbatch(batch, out_dir, 0, "k")
        once = merged_query(spark, out_dir, keys, "k").collect()[0].est
        cms_microbatch(batch, out_dir, 0, "k")  # replay
        twice = merged_query(spark, out_dir, keys, "k").collect()[0].est
        assert once == twice == 9


class TestReviewRegressions:
    def test_kmv_union_keeps_one_sided_groups(self, spark):
        # a group seen by only one partial computation must survive the
        # merge with its registers unchanged (inner join dropped it)
        a = spark.createDataFrame(
            [("g1", "x"), ("g2", "y")], "g: string, v: string"
        )
        b = spark.createDataFrame([("g1", "z")], "g: string, v: string")
        ra = sketches.kmv_registers(a, ["g"], "v", k=8)
        rb = sketches.kmv_registers(b, ["g"], "v", k=8)
        merged = {
            r.g: list(r.hashes)
            for r in sketches.kmv_union_registers(ra, rb, k=8).collect()
        }
        full = {
            r.g: list(r.hashes)
            for r in sketches.kmv_registers(
                a.unionAll(b), ["g"], "v", k=8
            ).collect()
        }
        assert merged == full
        assert "g2" in merged

    def test_cms_query_excludes_null_probe_keys(self, spark):
        df = spark.createDataFrame([("x",)] * 3, "k: string")
        cms = sketches.cms_build(df, "k", depth=2, width=64)
        probes = spark.createDataFrame([("x",), (None,)], "k: string")
        got = sketches.cms_query(cms, probes, "k", depth=2, width=64).collect()
        # NULL was never counted in the sketch; it must not get a
        # fabricated estimate row
        assert {r.k: r.est for r in got} == {"x": 3}


class TestHistogramQuantilesGrouped:
    def test_matches_global_per_group(self, spark):
        import random

        rnd = random.Random(3)
        rows = [("g1", rnd.uniform(0, 100)) for _ in range(500)] + [
            ("g2", rnd.uniform(50, 900)) for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "g: string, x: double")
        grouped = {
            (r.g, r.q): (r.bin, r.upper_edge, r.cum_count, r.n_total)
            for r in sketches.histogram_quantiles_grouped(
                df, ["g"], "x", n_bins=100, quantiles=(50, 90)
            ).collect()
        }
        for g in ("g1", "g2"):
            solo = {
                r.q: (r.bin, r.upper_edge, r.cum_count, r.n_total)
                for r in sketches.histogram_quantiles(
                    df.filter(F.col("g") == g), "x",
                    n_bins=100, quantiles=(50, 90),
                ).collect()
            }
            for q in (50, 90):
                assert grouped[(g, q)] == solo[q], (g, q)

    def test_validates(self, spark):
        df = spark.createDataFrame([("g", 1.0)], "g: string, x: double")
        with pytest.raises(ValueError, match="quantiles"):
            sketches.histogram_quantiles_grouped(df, ["g"], "x", quantiles=())
