"""Calibration battery: hand-computed reliability bins, guards,
summary arithmetic."""

import pytest

from context_aware_rag_spark.operators import calibration as cal


def _df(spark, rows):
    return spark.createDataFrame(rows, "prob double, label int")


class TestBins:
    def test_hand_computed_bins(self, spark):
        df = _df(spark, [(0.9, 1), (0.95, 0), (0.05, 0), (1.0, 1)])
        got = {r["bin"]: tuple(r)[1:] for r in
               cal.calibration_metrics(df, n_bins=10).collect()}
        # bin 9: probs .9/.95/1.0 (top-bin clamp), labels 1/0/1
        assert got[9] == (3, 2, 950_000, 666_666, 283_334,
                          2_850_000, 912_499)
        # bin 0: prob .05 label 0 -> sq err floor(.0025 * 1e6) = 2500
        assert got[0] == (1, 0, 50_000, 0, 50_000, 50_000, 2_500)
        assert set(got) == {0, 9}  # empty bins absent, not zero-filled

    def test_perfectly_calibrated_bin(self, spark):
        # ten rows at prob .7, exactly 7 positive: gap = 0
        df = _df(spark, [(0.7, 1)] * 7 + [(0.7, 0)] * 3)
        row = cal.calibration_metrics(df, n_bins=10).collect()[0]
        assert row["conf_ppm"] == 700_000
        assert row["acc_ppm"] == 700_000
        assert row["gap_ppm"] == 0

    def test_guards(self, spark):
        with pytest.raises(Exception, match=r"in \[0, 1\]"):
            cal.calibration_metrics(_df(spark, [(1.5, 1)])).collect()
        with pytest.raises(Exception, match="must be 0/1"):
            cal.calibration_metrics(_df(spark, [(0.5, 2)])).collect()
        with pytest.raises(ValueError, match="n_bins"):
            cal.calibration_metrics(_df(spark, [(0.5, 1)]), n_bins=0)


class TestSummary:
    def test_ece_and_brier(self, spark):
        df = _df(spark, [(0.9, 1), (0.95, 0), (0.05, 0), (1.0, 1)])
        s = cal.calibration_summary(
            cal.calibration_metrics(df, n_bins=10)
        ).collect()[0]
        # ece = (1*50000 + 3*283334) div 4; brier = (2500+912499) div 4
        assert s["n"] == 4
        assert s["ece_ppm"] == 225_000
        assert s["brier_ppm"] == 228_749
        assert s["base_rate_ppm"] == 500_000

    def test_empty_is_null(self, spark):
        s = cal.calibration_summary(
            cal.calibration_metrics(_df(spark, []))
        ).collect()[0]
        assert s["n"] is None or s["n"] == 0
        assert s["ece_ppm"] is None
