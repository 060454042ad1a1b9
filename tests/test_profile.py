"""Table profiler: hand-computed stats, null/all-null handling,
single-scan plan shape."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import profile


class TestProfileTable:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, "aa", None), (2, "b", None), (2, None, None)],
            "k: long, s: string, z: string",
        )
        got = {r.column: r for r in profile.profile_table(df).collect()}
        assert set(got) == {"k", "s", "z"}
        k = got["k"]
        assert (k.n_rows, k.n_nonnull, k.n_nulls, k.n_distinct) == (3, 3, 0, 2)
        assert (k.min_value, k.max_value) == ("1", "2")
        assert k.avg_len_x100 == 100
        s = got["s"]
        assert (s.n_nonnull, s.n_nulls, s.n_distinct) == (2, 1, 2)
        assert (s.min_value, s.max_value) == ("aa", "b")
        assert s.avg_len_x100 == 150  # (2 + 1) * 100 div 2
        z = got["z"]
        assert (z.n_nonnull, z.n_distinct) == (0, 0)
        assert z.min_value is None and z.avg_len_x100 is None

    def test_subset_and_native_type_ordering(self, spark):
        # numeric min/max must order numerically, not lexically
        df = spark.createDataFrame([(9,), (10,), (2,)], "v: long")
        r = profile.profile_table(df, ["v"]).collect()[0]
        assert (r.min_value, r.max_value) == ("2", "10")

    def test_single_scan(self, spark):
        df = spark.createDataFrame([(1, "x")], "a: long, b: string")
        plan = profile.profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
        # one scan of the input relation (profiling is one aggregation,
        # not one job per column)
        assert plan.count("LogicalRDD") == 1

    def test_validates(self, spark):
        df = spark.createDataFrame([(1,)], "a: long")
        with pytest.raises(ValueError, match="not in frame"):
            profile.profile_table(df, ["nope"])
        with pytest.raises(ValueError, match="at least one"):
            profile.profile_table(df, [])


class TestCheckExpectations:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (None, "b"), (3, None), (4, "d")],
            "k: long, s: string",
        )
        from context_aware_rag_spark.operators.profile import check_expectations

        got = {
            r.rule: (r.n_rows, r.n_violations, r.violation_ppm, r.passed)
            for r in check_expectations(
                df,
                {
                    "k_not_null": F.col("k").isNotNull(),
                    "k_positive": F.col("k") > 0,  # NULL -> violation
                    "s_short": F.length("s") <= 1,  # NULL -> violation
                    "always": F.lit(True),
                },
            ).collect()
        }
        assert got["k_not_null"] == (4, 1, 250_000, False)
        assert got["k_positive"] == (4, 1, 250_000, False)
        assert got["s_short"] == (4, 1, 250_000, False)
        assert got["always"] == (4, 0, 0, True)

    def test_single_scan_and_empty_frame(self, spark):
        from context_aware_rag_spark.operators.profile import check_expectations

        df = spark.createDataFrame([], "k: long")
        rows = check_expectations(
            df, {"r": F.col("k").isNotNull()}
        ).collect()
        assert rows[0].n_rows == 0 and rows[0].passed
        import pytest as _pytest

        with _pytest.raises(ValueError, match="at least one"):
            check_expectations(df, {})


# ---------------------------------------------------------------------------
# robust outliers (median/MAD)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.operators.profile import robust_outliers


def _vals(spark, rows):
    return spark.createDataFrame(rows, "id: long, g: string, v: long")


class TestRobustOutliers:
    def test_hand_computed(self, spark):
        # group a: values 1..7 plus a wild 1000 -> med 4.5, deviations
        # {3.5,2.5,1.5,.5,.5,1.5,2.5,995.5} -> mad 2.0; k=3 threshold
        # 10*dev > 60 -> only the wild point flags
        rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 1000])]
        out = {r.id: r for r in robust_outliers(_vals(spark, rows), "v", ["g"]).collect()}
        assert out[7].is_outlier is True
        assert all(out[i].is_outlier is False for i in range(7))
        assert out[0].med == 4.5 and out[0].mad == 2.0

    def test_breakdown_resistance_vs_mean(self, spark):
        # the wild point barely moves the median: a mean/3-sigma gate
        # would NOT flag 40 here (sigma blown up by 10000), MAD does
        rows = [(i, "a", v) for i, v in enumerate([10, 11, 12, 13, 14, 40, 10000])]
        out = {r.v: r.is_outlier for r in robust_outliers(_vals(spark, rows), "v", ["g"]).collect()}
        assert out[10000] is True and out[40] is True
        assert out[12] is False

    def test_zero_mad_flags_any_deviation(self, spark):
        rows = [(i, "a", 5) for i in range(5)] + [(9, "a", 6)]
        out = {r.id: r.is_outlier for r in robust_outliers(_vals(spark, rows), "v", ["g"]).collect()}
        assert out[9] is True and out[0] is False

    def test_groups_isolated_and_global_mode(self, spark):
        rows = [(1, "a", 1), (2, "a", 2), (3, "b", 1000), (4, "b", 1001)]
        per_g = robust_outliers(_vals(spark, rows), "v", ["g"]).collect()
        assert all(r.is_outlier is False for r in per_g)
        glob = {
            r.id: r.is_outlier
            for r in robust_outliers(_vals(spark, rows), "v").collect()
        }
        assert glob == {1: False, 2: False, 3: False, 4: False} or True
        # global med sits between the clusters; both clusters deviate
        # symmetrically -> mad equals the deviation -> nothing flags
        assert set(glob.values()) == {False}

    def test_null_passes_unflagged(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1), (2, "a", 2), (3, "a", None)],
            "id: long, g: string, v: long",
        )
        out = {r.id: r.is_outlier for r in robust_outliers(df, "v", ["g"]).collect()}
        assert out[3] is None

    def test_validation(self, spark):
        import pytest as _pytest

        df = _vals(spark, [(1, "a", 1)])
        with _pytest.raises(ValueError, match="k_x10"):
            robust_outliers(df, "v", k_x10=0)


# ---------------------------------------------------------------------------
# equi-depth binning
# ---------------------------------------------------------------------------

from context_aware_rag_spark.operators.profile import equi_depth_bins


class TestEquiDepthBins:
    def test_equal_shares_and_order(self, spark):
        df = spark.createDataFrame(
            [(i, "g", (i * 7) % 100) for i in range(20)],
            "id: long, g: string, v: long",
        )
        out = equi_depth_bins(
            df, "v", n_bins=4, group_cols=["g"], tie_cols=["id"]
        ).collect()
        sizes = {}
        for r in out:
            sizes[r.bin] = sizes.get(r.bin, 0) + 1
        assert sizes == {1: 5, 2: 5, 3: 5, 4: 5}
        # monotone: every bin-1 value <= every bin-4 value
        assert max(r.v for r in out if r.bin == 1) <= min(
            r.v for r in out if r.bin == 4
        )

    def test_uneven_split_differs_by_at_most_one(self, spark):
        df = spark.createDataFrame(
            [(i, i) for i in range(10)], "id: long, v: long"
        )
        out = equi_depth_bins(df, "v", n_bins=3, tie_cols=["id"]).collect()
        sizes = sorted(
            sum(1 for r in out if r.bin == b) for b in (1, 2, 3)
        )
        assert sizes == [3, 3, 4]

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1)], "id: long, v: long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_bins"):
            equi_depth_bins(df, "v", n_bins=0)

    def test_global_plan_has_no_single_partition_exchange(self, spark):
        # the r5 scale fix: global binning rides global_rank, not a
        # partition-less window — assert the executed plan proves it
        df = spark.createDataFrame(
            [(i, (i * 13) % 97) for i in range(200)], "id: long, v: long"
        )
        out = equi_depth_bins(df, "v", n_bins=7, tie_cols=["id"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan

    def test_global_matches_window_ntile(self, spark):
        # two-phase global path ≡ the single-task window ntile, row by
        # row, including n_bins > N and exact-multiple N
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        for n_rows, n_bins in ((37, 5), (40, 8), (4, 9), (1, 3)):
            df = spark.createDataFrame(
                [(i, (i * 31) % 11) for i in range(n_rows)],
                "id: long, v: long",
            )
            got = {
                (r.id, r.bin)
                for r in equi_depth_bins(
                    df, "v", n_bins=n_bins, tie_cols=["id"]
                ).collect()
            }
            w = W.orderBy(F.col("v").asc(), F.col("id").asc())
            want = {
                (r.id, r.bin)
                for r in df.withColumn(
                    "bin", F.ntile(n_bins).over(w)
                ).collect()
            }
            assert got == want, (n_rows, n_bins)

    def test_global_empty_input(self, spark):
        df = spark.createDataFrame([], "id: long, v: long")
        assert equi_depth_bins(df, "v", n_bins=4, tie_cols=["id"]).count() == 0


class TestTimeDecayedCounts:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "k string, ts timestamp"
        )

    def test_staircase_halving(self, spark):
        from datetime import datetime

        from context_aware_rag_spark.operators import profile as prof

        # events exactly 0, 1, 2 half-lives old: 1e6 + 5e5 + 2.5e5
        rows = [
            ("a", datetime(2024, 1, 10, 0, 0, 0)),
            ("a", datetime(2024, 1, 9, 0, 0, 0)),
            ("a", datetime(2024, 1, 8, 0, 0, 0)),
        ]
        out = prof.time_decayed_counts(
            self._df(spark, rows), ["k"], "ts",
            as_of="2024-01-10 00:00:00", half_life_s=86400,
        ).collect()
        assert len(out) == 1
        assert out[0]["n_events"] == 3
        assert out[0]["salience"] == 1_000_000 + 500_000 + 250_000

    def test_future_and_null_rows_excluded(self, spark):
        from datetime import datetime

        from context_aware_rag_spark.operators import profile as prof

        rows = [
            ("a", datetime(2024, 1, 10, 0, 0, 0)),
            ("a", datetime(2024, 1, 11, 0, 0, 0)),   # future
            ("a", None),                              # unknowable
        ]
        out = prof.time_decayed_counts(
            self._df(spark, rows), ["k"], "ts",
            as_of="2024-01-10 00:00:00", half_life_s=86400,
        ).collect()
        assert out[0]["n_events"] == 1
        assert out[0]["salience"] == 1_000_000

    def test_halvings_cap(self, spark):
        from datetime import datetime

        from context_aware_rag_spark.operators import profile as prof

        # 25 half-lives old: weight would be 0 anyway; cap at 3 keeps
        # 1e6 >> 3 = 125000 (the cap is observable => honored)
        rows = [("a", datetime(2023, 12, 1, 0, 0, 0))]
        out = prof.time_decayed_counts(
            self._df(spark, rows), ["k"], "ts",
            as_of="2024-01-10 00:00:00", half_life_s=86400,
            max_halvings=3,
        ).collect()
        assert out[0]["salience"] == 125_000

    def test_key_isolation(self, spark):
        from datetime import datetime

        from context_aware_rag_spark.operators import profile as prof

        rows = [
            ("a", datetime(2024, 1, 10, 0, 0, 0)),
            ("b", datetime(2024, 1, 9, 0, 0, 0)),
        ]
        got = {
            r["k"]: r["salience"]
            for r in prof.time_decayed_counts(
                self._df(spark, rows), ["k"], "ts",
                as_of="2024-01-10 00:00:00", half_life_s=86400,
            ).collect()
        }
        assert got == {"a": 1_000_000, "b": 500_000}

    def test_validation(self, spark):
        import pytest as _pytest

        from context_aware_rag_spark.operators import profile as prof

        df = self._df(spark, [])
        with _pytest.raises(ValueError, match="half_life_s"):
            prof.time_decayed_counts(df, ["k"], "ts", "2024-01-01", 0)
        with _pytest.raises(ValueError, match="max_halvings"):
            prof.time_decayed_counts(
                df, ["k"], "ts", "2024-01-01", 1, max_halvings=63
            )


class TestBurstDetection:
    @staticmethod
    def _events(spark, rows):
        # rows: (key, epoch_seconds) — build timestamp column
        return spark.createDataFrame(
            [(k, s) for k, s in rows], "k: string, sec: long"
        ).withColumn("ts", F.timestamp_seconds(F.col("sec")))

    def test_planted_burst(self, spark):
        # key "a": 1 event/bucket for buckets 0..23 (baseline=24),
        # then 6 events in bucket 24 — 6 >= min_count 5 and
        # 6*24 = 144 > 3*24 = 72 -> burst. Bucket 25 back to 1 -> not.
        rows = [("a", b * 10) for b in range(24)]
        rows += [("a", 240 + i) for i in range(6)]
        rows += [("a", 250)]
        df = self._events(spark, rows)
        flags = profile.burst_buckets(
            df, ["k"], "ts", bucket_s=10, baseline_buckets=24,
            factor_num=3, min_count=5,
        )
        got = {r.epoch: (r.cnt, r.base_sum, r.is_burst) for r in flags.collect()}
        assert got[24] == (6, 24, True)
        assert got[25] == (1, 29, False)
        assert all(not v[2] for e, v in got.items() if e != 24)

    def test_cold_start_gated_by_min_count_only(self, spark):
        # first-ever bucket, no history: base_sum 0, ratio vacuous
        df = self._events(spark, [("a", i) for i in range(5)] + [("b", 0)])
        got = {
            r.k: (r.base_sum, r.is_burst)
            for r in profile.burst_buckets(
                df, ["k"], "ts", bucket_s=10, min_count=5
            ).collect()
        }
        assert got["a"] == (0, True)   # 5 events >= min_count
        assert got["b"] == (0, False)  # 1 event < min_count

    def test_gap_forgets_history(self, spark):
        # dense history at epochs 0..23, then silence until epoch 100:
        # the RANGE frame sees nothing in (76..99] -> base_sum 0,
        # exactly what a densified frame would give
        rows = [("a", b * 10 + i) for b in range(24) for i in range(9)]
        rows += [("a", 1000 + i) for i in range(5)]
        flags = profile.burst_buckets(
            df := self._events(spark, rows), ["k"], "ts",
            bucket_s=10, baseline_buckets=24, factor_num=3, min_count=5,
        )
        r100 = [r for r in flags.collect() if r.epoch == 100][0]
        assert (r100.base_sum, r100.is_burst) == (0, True)

    def test_intervals_islands(self, spark):
        # two adjacent burst buckets collapse to one interval; a
        # separated third stays its own island
        rows = [("a", b * 10) for b in range(24)]           # baseline 1/bucket
        rows += [("a", 240 + i) for i in range(6)]          # burst bucket 24
        rows += [("a", 250 + i) for i in range(7)]          # burst bucket 25
        rows += [("a", 260), ("a", 270)]                    # quiet 26, 27
        rows += [("a", 280 + i) for i in range(9)]          # burst bucket 28
        ivs = profile.burst_intervals(
            self._events(spark, rows), ["k"], "ts", bucket_s=10,
            baseline_buckets=24, factor_num=3, min_count=5,
        ).orderBy("start_epoch").collect()
        assert [(r.start_epoch, r.end_epoch, r.n_buckets, r.total_events,
                 r.peak_count) for r in ivs] == [
            (24, 25, 2, 13, 7),
            (28, 28, 1, 9, 9),
        ]

    def test_matches_duckdb_on_events(self, spark):
        import duckdb
        import os

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
        )
        got = sorted(
            tuple(r) for r in profile.burst_intervals(
                spark.read.parquet(f"{sf_dir}/events.parquet"),
                ["event_type"], "ts", bucket_s=3600,
                baseline_buckets=24, factor_num=3, min_count=5,
            ).collect()
        )
        want = sorted(duckdb.connect().execute(f"""
            WITH c AS (
              SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS epoch,
                     count(*)::BIGINT AS cnt
              FROM '{sf_dir}/events.parquet'
              WHERE ts IS NOT NULL GROUP BY 1, 2
            ), t AS (
              SELECT *, coalesce(sum(cnt) OVER (
                       PARTITION BY event_type ORDER BY epoch
                       RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS base_sum
              FROM c
            ), b AS (
              SELECT *, epoch - row_number() OVER (
                       PARTITION BY event_type ORDER BY epoch) AS island
              FROM t WHERE cnt >= 5 AND cnt * 24 > 3 * base_sum
            )
            SELECT event_type, min(epoch), max(epoch), count(*)::BIGINT,
                   sum(cnt)::BIGINT, max(cnt)
            FROM b GROUP BY event_type, island
        """).fetchall())
        assert got == want and len(got) > 0

    def test_validation(self, spark):
        df = self._events(spark, [("a", 0)])
        with pytest.raises(ValueError):
            profile.burst_buckets(df, ["k"], "ts", bucket_s=0)
        with pytest.raises(ValueError):
            profile.burst_buckets(df, ["k"], "ts", baseline_buckets=0)
        with pytest.raises(ValueError):
            profile.burst_buckets(df, ["k"], "ts", factor_num=0)


class TestSilenceIntervals:
    def test_interior_gap(self, spark):
        # active buckets 0,1,2 then 10: empty 3..9 = 7 buckets
        rows = [("a", e * 10) for e in (0, 1, 2, 10)]
        df = TestBurstDetection._events(spark, rows)
        got = profile.silence_intervals(
            df, ["k"], "ts", bucket_s=10, min_gap_buckets=6
        ).collect()
        assert [(r.start_epoch, r.end_epoch, r.n_buckets, r.is_trailing)
                for r in got] == [(3, 9, 7, False)]
        # below threshold: nothing
        assert profile.silence_intervals(
            df, ["k"], "ts", bucket_s=10, min_gap_buckets=8
        ).count() == 0

    def test_trailing_silence_excludes_partial_bucket(self, spark):
        # last active bucket 2; as_of inside bucket 20 -> silence 3..19
        df = TestBurstDetection._events(spark, [("a", 0), ("a", 25)])
        got = profile.silence_intervals(
            df, ["k"], "ts", bucket_s=10, min_gap_buckets=6,
            as_of="1970-01-01 00:03:25",  # second 205 -> bucket 20
        ).collect()
        assert [(r.start_epoch, r.end_epoch, r.n_buckets, r.is_trailing)
                for r in got] == [(3, 19, 17, True)]

    def test_no_as_of_no_trailing(self, spark):
        df = TestBurstDetection._events(spark, [("a", 0)])
        assert profile.silence_intervals(
            df, ["k"], "ts", bucket_s=10, min_gap_buckets=1
        ).count() == 0

    def test_junk_as_of_raises_not_silent(self, spark):
        # ADVICE r4: an unparsable as_of used to cast to NULL in-plan
        # and silently suppress every trailing-silence row — the
        # ongoing-outage monitor quietly reporting nothing. It must
        # RAISE at plan-build time now.
        import pytest as _pytest

        df = TestBurstDetection._events(spark, [("a", 0)])
        with _pytest.raises(ValueError):
            profile.silence_intervals(
                df, ["k"], "ts", bucket_s=10, min_gap_buckets=1,
                as_of="not-a-timestamp'); DROP",
            )
        with _pytest.raises(ValueError):
            profile.time_decayed_counts(
                df, ["k"], "ts", as_of="2024-13-45 99:99:99",
                half_life_s=60,
            )

    def test_key_isolation(self, spark):
        # a's activity must not mask b's gap
        rows = [("a", e * 10) for e in range(12)] + [("b", 0), ("b", 110)]
        got = profile.silence_intervals(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, min_gap_buckets=6,
        ).collect()
        assert [(r.k, r.start_epoch, r.end_epoch) for r in got] == [
            ("b", 1, 10)
        ]

    def test_matches_duckdb_on_events(self, spark):
        import duckdb
        import os

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
        )
        got = sorted(
            tuple(r) for r in profile.silence_intervals(
                spark.read.parquet(f"{sf_dir}/events.parquet"),
                ["user_id", "event_type"], "ts", bucket_s=3600,
                min_gap_buckets=72, as_of="2024-01-31 00:00:00",
            ).collect()
        )
        want = sorted(duckdb.connect().execute(f"""
            WITH a AS (
              SELECT DISTINCT user_id, event_type,
                     epoch_us(ts) // 1000000 // 3600 AS epoch
              FROM '{sf_dir}/events.parquet' WHERE ts IS NOT NULL
            ), g AS (
              SELECT *, lag(epoch) OVER (
                       PARTITION BY user_id, event_type ORDER BY epoch) AS prev
              FROM a
            ), last AS (
              SELECT user_id, event_type, max(epoch) AS last_epoch
              FROM a GROUP BY 1, 2
            )
            SELECT user_id, event_type, prev + 1, epoch - 1,
                   epoch - prev - 1, false
            FROM g WHERE prev IS NOT NULL AND epoch - prev - 1 >= 72
            UNION ALL
            SELECT user_id, event_type, last_epoch + 1,
                   (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600) - 1,
                   (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600)
                     - last_epoch - 1, true
            FROM last
            WHERE (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600)
                    - last_epoch - 1 >= 72
        """).fetchall())
        assert got == want and len(got) > 100

    def test_validation(self, spark):
        df = TestBurstDetection._events(spark, [("a", 0)])
        with pytest.raises(ValueError):
            profile.silence_intervals(df, ["k"], "ts", bucket_s=0)
        with pytest.raises(ValueError):
            profile.silence_intervals(df, ["k"], "ts", min_gap_buckets=0)


class TestLevelShifts:
    def test_planted_step_up(self, spark):
        # rate 1/bucket for 24 buckets, then 3/bucket for 24: a 3x
        # sustained shift. The detector should emit ONE up event per
        # run; the elected epoch has max |lead - trail|.
        rows = [("a", b * 10) for b in range(24)]
        rows += [("a", 240 + b * 10 + i) for b in range(24) for i in range(3)]
        got = profile.level_shifts(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, window_buckets=24, factor_num=2, min_side_events=10,
            full_window=True,
        ).collect()
        assert len(got) == 1
        r = got[0]
        assert r.direction == 1
        # at the boundary bucket 24: trail = 24, lead = 72
        assert (r.epoch, r.trail_sum, r.lead_sum, r.ratio_ppm) == (
            24, 24, 72, 3_000_000,
        )

    def test_planted_step_down(self, spark):
        rows = [("a", b * 10 + i) for b in range(24) for i in range(4)]
        rows += [("a", 240 + b * 10) for b in range(24)]
        got = profile.level_shifts(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, window_buckets=24, factor_num=2, min_side_events=10,
            full_window=True,
        ).collect()
        assert len(got) == 1 and got[0].direction == -1
        assert got[0].ratio_ppm == 250_000  # 24 / 96

    def test_uniform_interior_quiet(self, spark):
        rows = [("a", b * 10) for b in range(72)]
        assert profile.level_shifts(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, window_buckets=24, factor_num=2, min_side_events=10,
            full_window=True,
        ).count() == 0

    def test_boundary_ramps_without_full_window(self, spark):
        # same uniform data WITHOUT full_window: birth/death partial
        # windows satisfy the ratio -> exactly one up and one down ramp
        rows = [("a", b * 10) for b in range(72)]
        got = profile.level_shifts(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, window_buckets=24, factor_num=2, min_side_events=10,
        ).collect()
        dirs = sorted(r.direction for r in got)
        assert dirs == [-1, 1]

    def test_zero_side_never_flags(self, spark):
        # key born from nothing: trail 0 -> burst territory, not shift
        rows = [("a", b * 10 + i) for b in range(24) for i in range(2)]
        got = profile.level_shifts(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, window_buckets=24, factor_num=2, min_side_events=10,
        ).collect()
        assert all(r.trail_sum >= 1 and r.lead_sum >= 1 for r in got)

    def test_matches_duckdb_on_events(self, spark):
        import duckdb
        import os

        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
        )
        got = sorted(
            tuple(r) for r in profile.level_shifts(
                spark.read.parquet(f"{sf_dir}/events.parquet"),
                ["event_type"], "ts", bucket_s=3600, window_buckets=24,
                factor_num=2, min_side_events=10,
            ).collect()
        )
        want = sorted(duckdb.connect().execute(f"""
            WITH c AS (
              SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS epoch,
                     count(*)::BIGINT AS cnt
              FROM '{sf_dir}/events.parquet'
              WHERE ts IS NOT NULL GROUP BY 1, 2
            ), t AS (
              SELECT event_type, epoch,
                coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
                  RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS trail_sum,
                coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
                  RANGE BETWEEN CURRENT ROW AND 23 FOLLOWING), 0) AS lead_sum
              FROM c
            ), f AS (
              SELECT *, CASE
                  WHEN lead_sum >= 2 * trail_sum AND lead_sum >= 10
                       AND trail_sum >= 1 THEN 1
                  WHEN trail_sum >= 2 * lead_sum AND trail_sum >= 10
                       AND lead_sum >= 1 THEN -1 END AS direction
              FROM t
            ), g AS (
              SELECT *, CASE WHEN lag(epoch) OVER w = epoch - 1
                         AND lag(direction) OVER w = direction
                        THEN 0 ELSE 1 END AS new_run
              FROM f WHERE direction IS NOT NULL
              WINDOW w AS (PARTITION BY event_type ORDER BY epoch)
            ), r AS (
              SELECT *, sum(new_run) OVER (
                  PARTITION BY event_type ORDER BY epoch) AS run
              FROM g
            ), e AS (
              SELECT *, row_number() OVER (
                  PARTITION BY event_type, run
                  ORDER BY abs(lead_sum - trail_sum) DESC, epoch ASC) AS rn
              FROM r
            )
            SELECT event_type, epoch, direction, trail_sum, lead_sum,
                   lead_sum * 1000000 // trail_sum
            FROM e WHERE rn = 1
        """).fetchall())
        assert got == want and len(got) > 0

    def test_validation(self, spark):
        df = TestBurstDetection._events(spark, [("a", 0)])
        with pytest.raises(ValueError):
            profile.level_shifts(df, ["k"], "ts", window_buckets=0)
        with pytest.raises(ValueError):
            profile.level_shifts(df, ["k"], "ts", factor_den=0)


class TestTemporalHealthScorecard:
    def test_healthy_key_appears_with_zeros(self, spark):
        # "a" has a planted burst; "b" is uniform (healthy) — it must
        # still appear, with zero anomaly counts, not vanish
        rows = [("a", b * 10) for b in range(24)]
        rows += [("a", 240 + i) for i in range(6)]
        rows += [("b", b * 10) for b in range(26)]
        got = {
            r.k: r
            for r in profile.temporal_health_scorecard(
                TestBurstDetection._events(spark, rows), ["k"], "ts",
                bucket_s=10, baseline_buckets=24, burst_factor_num=3,
                burst_min_count=5, min_gap_buckets=2,
                shift_factor_num=10, shift_min_side=1000,
            ).collect()
        }
        assert got["a"].n_bursts == 1 and got["a"].max_burst_peak == 6
        b = got["b"]
        assert b.n_events == 26
        assert (b.n_bursts, b.n_silences, b.n_up_shifts, b.n_down_shifts,
                b.ongoing_silence) == (0, 0, 0, 0, 0)

    def test_ongoing_silence_flag(self, spark):
        rows = [("a", 0)]
        got = profile.temporal_health_scorecard(
            TestBurstDetection._events(spark, rows), ["k"], "ts",
            bucket_s=10, min_gap_buckets=2, as_of="1970-01-01 00:01:40",
        ).collect()[0]
        assert (got.n_silences, got.ongoing_silence) == (1, 1)
        assert got.max_silence_buckets == 9  # buckets 1..9
