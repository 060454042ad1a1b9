"""PSI corpus-drift monitors: hand-computed buckets, clamp/NULL
contracts, degenerate-reference loud failure, categorical hash buckets."""



class TestPsiDrift:
    def test_numeric_hand_computed(self, spark):
        import math

        ref = spark.createDataFrame([(0.0,), (1.0,), (2.0,), (3.0,)], "value: double")
        cur = spark.createDataFrame([(0.0,), (0.5,), (3.0,)], "value: double")
        from context_aware_rag_spark.operators import diff as diff_ops

        got = {r.bucket: r for r in diff_ops.psi_numeric(
            ref, cur, "value", n_buckets=2
        ).collect()}
        # ref: width 1.5 -> buckets [0,1.5)=2, [1.5,3]=2 (3.0 clamps to 1)
        # cur: 0, 0.5 -> bucket 0; 3.0 -> bucket 1
        assert (got[0].ref_count, got[0].cur_count) == (2, 2)
        assert (got[1].ref_count, got[1].cur_count) == (2, 1)
        pa0, pb0 = 3 / 6, 3 / 5
        pa1, pb1 = 3 / 6, 2 / 5
        assert got[0].psi_micro == round((pa0 - pb0) * math.log(pa0 / pb0) * 1e6)
        assert got[1].psi_micro == round((pa1 - pb1) * math.log(pa1 / pb1) * 1e6)

    def test_numeric_clamp_and_nulls(self, spark):
        from context_aware_rag_spark.operators import diff as diff_ops

        ref = spark.createDataFrame(
            [(0.0,), (10.0,), (None,)], "value: double"
        )
        cur = spark.createDataFrame(
            [(-100.0,), (999.0,), (None,)], "value: double"
        )
        got = {r.bucket: r for r in diff_ops.psi_numeric(
            ref, cur, "value", n_buckets=2
        ).collect()}
        # out-of-range cur values clamp into end buckets; NULLs gone
        assert got[0].cur_count == 1 and got[1].cur_count == 1
        assert got[0].ref_count == 1 and got[1].ref_count == 1

    def test_degenerate_reference_raises(self, spark):
        from context_aware_rag_spark.operators import diff as diff_ops

        ref = spark.createDataFrame([(5.0,), (5.0,)], "value: double")
        cur = spark.createDataFrame([(5.0,)], "value: double")
        import pytest as _pytest

        # loud in-plan failure: the assert_true backstop, or ANSI's
        # division-by-zero from the degenerate width — whichever stage
        # materializes first; either way no silent NaN buckets
        with _pytest.raises(Exception):
            diff_ops.psi_numeric(ref, cur, "value").collect()
        with _pytest.raises(ValueError):
            diff_ops.psi_numeric(cur, cur, "value", n_buckets=1)

    def test_categorical_missing_category(self, spark):
        from context_aware_rag_spark.operators import diff as diff_ops

        ref = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 5, "value: string"
        )
        cur = spark.createDataFrame([("a",)] * 5, "value: string")
        rows = diff_ops.psi_categorical(ref, cur, "value").collect()
        # 'b' occupies a bucket in ref only -> positive contribution;
        # total across buckets is positive (drift detected)
        assert sum(r.psi_micro for r in rows) > 0
        assert all(r.psi_micro >= 0 for r in rows)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            diff_ops.psi_categorical(ref, cur, "value", hex_chars=0)

    def test_identical_snapshots_near_zero(self, spark):
        from context_aware_rag_spark.operators import diff as diff_ops

        ref = spark.createDataFrame(
            [(float(i % 7),) for i in range(100)], "value: double"
        )
        rows = diff_ops.psi_numeric(ref, ref, "value").collect()
        assert all(r.psi_micro == 0 for r in rows)
