"""Cross-table record linkage: hand-computed Jaccard scores, df_cap
blocking semantics, mutual-best assignment, tie-breaks, validation."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators.linkage import link_records


def _df(spark, rows, idc, tc):
    return spark.createDataFrame(rows, [idc, tc])


def _pairs(df):
    return sorted(
        (r[0], r[1], r["shared_tokens"], r["jaccard_ppm"])
        for r in df.collect()
    )


def test_hand_computed_scores(spark):
    left = _df(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "red green blue"),
            (3, "solo unique words here"),
        ],
        "lid", "lname",
    )
    right = _df(
        spark,
        [
            (10, "alpha beta gamma epsilon"),
            (11, "red blue yellow"),
            (12, "totally different content"),
        ],
        "rid", "rname",
    )
    got = _pairs(
        link_records(left, right, "lid", "lname", "rid", "rname",
                     min_jaccard_ppm=0)
    )
    # (1,10): 3 shared / 5 union = 600000; (2,11): 2/4 = 500000
    assert got == [(1, 10, 3, 600000), (2, 11, 2, 500000)]


def test_df_cap_blocks_hot_tokens_from_scoring_too(spark):
    # 'common' is in every record; with df_cap=3 (6 records carry it)
    # it can neither form candidates nor count toward scores
    left = _df(
        spark,
        [(i, f"common word{i}") for i in range(3)],
        "lid", "lname",
    )
    right = _df(
        spark,
        [(10 + i, f"common word{i} extra") for i in range(3)],
        "rid", "rname",
    )
    got = _pairs(
        link_records(left, right, "lid", "lname", "rid", "rname",
                     min_jaccard_ppm=0, df_cap=3)
    )
    # candidates only via the rare wordN tokens; score over capped
    # sets: L={wordN} (size 1), R={wordN, extra}... but 'extra' df=3
    # <= cap so kept: shared 1, union 2 -> 500000
    assert got == [(i, 10 + i, 1, 500000) for i in range(3)]


def test_mutual_best_resolves_contention(spark):
    left = _df(spark, [(1, "a b c"), (2, "a b d")], "lid", "lname")
    right = _df(spark, [(10, "a b c e")], "rid", "rname")
    both = link_records(
        left, right, "lid", "lname", "rid", "rname",
        min_jaccard_ppm=0, mutual_best=False,
    )
    assert sorted(r["lid"] for r in both.collect()) == [1, 2]
    mutual = link_records(
        left, right, "lid", "lname", "rid", "rname",
        min_jaccard_ppm=0, mutual_best=True,
    )
    assert [(r["lid"], r["rid"]) for r in mutual.collect()] == [(1, 10)]


def test_tie_breaks_on_smaller_id(spark):
    left = _df(spark, [(1, "a b")], "lid", "lname")
    right = _df(spark, [(20, "a b x"), (10, "a b x")], "rid", "rname")
    got = link_records(
        left, right, "lid", "lname", "rid", "rname", min_jaccard_ppm=0
    ).collect()
    assert [(r["lid"], r["rid"]) for r in got] == [(1, 10)]


def test_duplicate_words_count_once_and_threshold(spark):
    left = _df(spark, [(1, "a a b")], "lid", "lname")
    right = _df(spark, [(10, "a b"), (11, "a z y w")], "rid", "rname")
    got = _pairs(
        link_records(left, right, "lid", "lname", "rid", "rname",
                     min_jaccard_ppm=600_000, mutual_best=False)
    )
    # (1,10): sets {a,b} vs {a,b} -> 1000000; (1,11): 1/5 = 200000 cut
    assert got == [(1, 10, 2, 1000000)]


def test_validation(spark):
    left = _df(spark, [(1, "a")], "lid", "lname")
    right = _df(spark, [(2, "a")], "rid", "rname")
    with pytest.raises(ValueError, match="df_cap"):
        link_records(left, right, "lid", "lname", "rid", "rname",
                     df_cap=0)
    with pytest.raises(ValueError, match="min_jaccard_ppm"):
        link_records(left, right, "lid", "lname", "rid", "rname",
                     min_jaccard_ppm=2_000_000)
    with pytest.raises(ValueError, match="must differ"):
        link_records(left, right.withColumnRenamed("rid", "lid"),
                     "lid", "lname", "lid", "rname")
