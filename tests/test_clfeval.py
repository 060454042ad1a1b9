"""Classification evaluation battery: hand-computed confusion
fixtures, one-sided-class NULL semantics, kappa sign and degeneracy,
NULL-label guard."""

import pytest

from context_aware_rag_spark.operators import clfeval


def _scored(spark, rows):
    return spark.createDataFrame(rows, "label string, pred string")


def _by_class(df):
    return {r["class"]: r.asDict() for r in df.collect()}


class TestPerClass:
    def test_hand_computed_three_class(self, spark):
        # true a=5 b=5 c=3; pred a=5 b=4 c=4; tp a=4 b=3 c=2
        rows = (
            [("a", "a")] * 4 + [("a", "b")]
            + [("b", "b")] * 3 + [("b", "c")] * 2
            + [("c", "a")] + [("c", "c")] * 2
        )
        m = _by_class(clfeval.classification_metrics(_scored(spark, rows)))
        assert m["a"]["tp"] == 4 and m["a"]["n_true"] == 5
        assert m["a"]["precision_ppm"] == (4 * 10**6) // 5
        assert m["b"]["recall_ppm"] == (3 * 10**6) // 5
        # f1 = 2*tp/(n_true+n_pred), exact integer closed form
        assert m["b"]["f1_ppm"] == (2 * 3 * 10**6) // (5 + 4)
        assert m["c"]["f1_ppm"] == (2 * 2 * 10**6) // (3 + 4)

    def test_one_sided_classes(self, spark):
        # 'd' predicted but never true: recall NULL, precision honest 0
        # 'z' true but never predicted: precision NULL, recall honest 0
        rows = [("a", "a"), ("a", "d"), ("z", "a")]
        m = _by_class(clfeval.classification_metrics(_scored(spark, rows)))
        assert m["d"]["n_true"] == 0 and m["d"]["recall_ppm"] is None
        assert m["d"]["precision_ppm"] == 0 and m["d"]["f1_ppm"] == 0
        assert m["z"]["n_pred"] == 0 and m["z"]["precision_ppm"] is None
        assert m["z"]["recall_ppm"] == 0 and m["z"]["f1_ppm"] == 0

    def test_null_label_raises(self, spark):
        df = spark.createDataFrame(
            [("a", "a"), (None, "a")], "label string, pred string"
        )
        with pytest.raises(Exception, match="phantom class"):
            clfeval.classification_metrics(df).collect()

    def test_null_pred_raises(self, spark):
        df = spark.createDataFrame(
            [("a", "a"), ("a", None)], "label string, pred string"
        )
        with pytest.raises(Exception, match="phantom class"):
            clfeval.classification_metrics(df).collect()


class TestSummary:
    def _summary(self, spark, rows):
        return clfeval.classification_summary(
            clfeval.classification_metrics(_scored(spark, rows))
        ).collect()[0]

    def test_hand_computed_kappa(self, spark):
        rows = (
            [("a", "a")] * 4 + [("a", "b")]
            + [("b", "b")] * 3 + [("b", "c")] * 2
            + [("c", "a")] + [("c", "c")] * 2
        )
        s = self._summary(spark, rows)
        n, tp = 13, 9
        big_s = 5 * 5 + 5 * 4 + 3 * 4
        assert s["n_examples"] == n and s["n_classes"] == 3
        assert s["accuracy_ppm"] == (tp * 10**6) // n
        assert s["kappa_ppm"] == ((n * tp - big_s) * 10**6) // (
            n * n - big_s
        )

    def test_perfect_prediction(self, spark):
        s = self._summary(spark, [("a", "a"), ("b", "b"), ("c", "c")])
        assert s["accuracy_ppm"] == 10**6
        assert s["macro_f1_ppm"] == 10**6
        assert s["kappa_ppm"] == 10**6

    def test_kappa_negative_below_chance(self, spark):
        # systematic disagreement on a balanced binary task: acc 0,
        # kappa = -1 exactly ((0 - S) / (N^2 - S), S = 2*2 + 2*2 = 8,
        # N^2 = 16 -> -8/8); trunc toward zero keeps the full -1e6
        s = self._summary(
            spark, [("a", "b"), ("a", "b"), ("b", "a"), ("b", "a")]
        )
        assert s["accuracy_ppm"] == 0
        assert s["kappa_ppm"] == -(10**6)

    def test_kappa_null_single_class(self, spark):
        # one class on both sides: N^2 == S, chance correction
        # undefined -> NULL, never a division blow-up
        s = self._summary(spark, [("a", "a"), ("a", "a")])
        assert s["accuracy_ppm"] == 10**6
        assert s["kappa_ppm"] is None

    def test_macro_zero_fill_convention(self, spark):
        # class 'z' never predicted: NULL precision zero-fills into
        # the macro mean (sklearn zero_division=0), denominator = all
        # observed classes
        rows = [("a", "a"), ("z", "a")]
        s = self._summary(spark, rows)
        # per-class precision: a = 1/2, z = NULL -> macro = (500000+0)//2
        assert s["macro_precision_ppm"] == 250000
        assert s["n_classes"] == 2

    def test_empty_input(self, spark):
        s = self._summary(spark, [])
        assert s["n_examples"] == 0 and s["n_classes"] == 0
        assert s["accuracy_ppm"] is None
        assert s["kappa_ppm"] is None
