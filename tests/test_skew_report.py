"""Hot-key skew diagnostics (skew.key_skew_report)."""

import pytest

from context_aware_rag_spark.operators.skew import key_skew_report

ROWS = (
    [("hot", i) for i in range(60)]
    + [("warm", i) for i in range(30)]
    + [("cold", 0), ("cold", 1), ("tied", 0), ("tied", 1)]
)


def _df(spark):
    return spark.createDataFrame(ROWS, "k: string, v: long")


def test_ranks_counts_and_ppm(spark):
    got = [
        (r.rank, r.k, r.cnt, r.frac_ppm, r.cum_frac_ppm)
        for r in key_skew_report(_df(spark), ["k"], top_k=3).collect()
    ]
    n = len(ROWS)
    assert got == [
        (1, "hot", 60, 60 * 1000000 // n, 60 * 1000000 // n),
        (2, "warm", 30, 30 * 1000000 // n, 90 * 1000000 // n),
        # cold/tied tie at 2 -> lexicographic tie-break picks cold
        (3, "cold", 2, 2 * 1000000 // n, 92 * 1000000 // n),
    ]


def test_multi_key_and_validation(spark):
    df = _df(spark)
    rows = key_skew_report(df, ["k", "v"], top_k=5).collect()
    assert len(rows) == 5 and rows[0].cnt == 1  # all (k,v) pairs unique
    with pytest.raises(ValueError):
        key_skew_report(df, [], top_k=3)
    with pytest.raises(ValueError):
        key_skew_report(df, ["k"], top_k=0)


def test_plans_take_ordered(spark):
    plan = (
        key_skew_report(_df(spark), ["k"], top_k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
