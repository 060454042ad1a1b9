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
