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


# ---------------------------------------------------------------------------
# link_records_edit (edit-distance scoring over the same blocking)
# ---------------------------------------------------------------------------

class TestLinkRecordsEdit:
    def _link(self, spark, lrows, rrows, **kw):
        from context_aware_rag_spark.operators.linkage import link_records_edit

        left = spark.createDataFrame(lrows, "lid: long, ltext: string")
        right = spark.createDataFrame(rrows, "rid: long, rtext: string")
        return {
            (r.lid, r.rid): (r.edit_dist, r.sim_ppm)
            for r in link_records_edit(
                left, right, "lid", "ltext", "rid", "rtext", **kw
            ).collect()
        }

    def test_typo_match_that_jaccard_misses(self, spark):
        from context_aware_rag_spark.operators.linkage import link_records

        lrows = [(1, "acme corp supply")]
        rrows = [(10, "acme crop supply"), (11, "zenith metals inc")]
        got = self._link(spark, lrows, rrows, min_sim_ppm=800_000)
        # "corp" vs "crop" = 2 edits over 16 chars -> sim 875000
        assert got == {(1, 10): (2, 875_000)}
        # the token-jaccard linker scores the same pair at only 2/4
        left = spark.createDataFrame(lrows, "lid: long, ltext: string")
        right = spark.createDataFrame(rrows, "rid: long, rtext: string")
        j = {
            (r.lid, r.rid): r.jaccard_ppm
            for r in link_records(
                left, right, "lid", "ltext", "rid", "rtext",
                min_jaccard_ppm=0,
            ).collect()
        }
        assert j[(1, 10)] == 500_000

    def test_blocking_contract_no_shared_token_no_pair(self, spark):
        # 1-edit-apart strings with NO intact shared token are out of
        # scope by the blocking contract
        got = self._link(
            spark, [(1, "abcdef")], [(10, "abcdeg")], min_sim_ppm=0
        )
        assert got == {}

    def test_mutual_best_resolves_contention(self, spark):
        lrows = [(1, "northern star trading"), (2, "northern star traders")]
        rrows = [(10, "northern star trading")]
        got = self._link(spark, lrows, rrows, min_sim_ppm=500_000)
        # both left rows match r10, but 1 is the exact (0-edit) best
        assert set(got) == {(1, 10)}
        assert got[(1, 10)][0] == 0
        both = self._link(
            spark, lrows, rrows, min_sim_ppm=500_000, mutual_best=False
        )
        assert set(both) == {(1, 10), (2, 10)}

    def test_normalization_and_validation(self, spark):
        import pytest as _pytest

        got = self._link(
            spark, [(1, "ACME-Corp!!")], [(10, "acme corp")],
            min_sim_ppm=900_000,
        )
        assert got == {(1, 10): (0, 1_000_000)}
        from context_aware_rag_spark.operators.linkage import link_records_edit

        left = spark.createDataFrame([(1, "x")], "a: long, t: string")
        with _pytest.raises(ValueError):
            link_records_edit(left, left, "a", "t", "a", "t")


# ---------------------------------------------------------------------------
# pairwise clustering metrics (ER evaluation)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.operators.linkage import clustering_pair_metrics


def _assign(spark, col, pairs):
    return spark.createDataFrame(
        pairs, f"node_id: long, {col}: string"
    )


class TestClusteringPairMetrics:
    def test_hand_computed(self, spark):
        pred = _assign(
            spark, "pred_label",
            [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")],
        )
        gold = _assign(
            spark, "gold_label",
            [(1, "X"), (2, "X"), (3, "Y"), (4, "Y"), (5, "Y")],
        )
        r = clustering_pair_metrics(pred, gold).collect()[0]
        # cells: (A,X)=2, (A,Y)=1, (B,Y)=2 -> TP = 1 + 0 + 1 = 2
        assert (r.n_items, r.tp_pairs, r.pred_pairs, r.gold_pairs) == (5, 2, 4, 4)
        assert (r.fp_pairs, r.fn_pairs) == (2, 2)
        assert r.precision_ppm == r.recall_ppm == r.f1_ppm == 500_000

    def test_perfect_match(self, spark):
        pred = _assign(spark, "pred_label", [(i, "c" + str(i // 3)) for i in range(9)])
        gold = _assign(spark, "gold_label", [(i, "z" + str(i // 3)) for i in range(9)])
        r = clustering_pair_metrics(pred, gold).collect()[0]
        assert r.fp_pairs == r.fn_pairs == 0
        assert r.precision_ppm == r.recall_ppm == r.f1_ppm == 1_000_000

    def test_all_singletons_precision_null(self, spark):
        pred = _assign(spark, "pred_label", [(i, str(i)) for i in range(4)])
        gold = _assign(spark, "gold_label", [(i, "one") for i in range(4)])
        r = clustering_pair_metrics(pred, gold).collect()[0]
        assert r.precision_ppm is None
        assert r.tp_pairs == 0 and r.recall_ppm == 0
        assert r.f1_ppm == 0  # denominator 6 > 0

    def test_inner_join_scopes_to_shared_ids(self, spark):
        pred = _assign(spark, "pred_label", [(1, "A"), (2, "A"), (99, "A")])
        gold = _assign(spark, "gold_label", [(1, "X"), (2, "X"), (42, "X")])
        r = clustering_pair_metrics(pred, gold).collect()[0]
        assert r.n_items == 2 and r.tp_pairs == 1
        assert r.precision_ppm == 1_000_000

    def test_one_sided_merge_recall_vs_precision(self, spark):
        # pred merges everything: recall 1, precision = gold_pairs/all
        pred = _assign(spark, "pred_label", [(i, "all") for i in range(4)])
        gold = _assign(
            spark, "gold_label",
            [(0, "X"), (1, "X"), (2, "Y"), (3, "Y")],
        )
        r = clustering_pair_metrics(pred, gold).collect()[0]
        assert r.recall_ppm == 1_000_000
        assert r.pred_pairs == 6 and r.tp_pairs == 2
        assert r.precision_ppm == 2_000_000 // 6


# ---------------------------------------------------------------------------
# blocking-quality metrics
# ---------------------------------------------------------------------------

from context_aware_rag_spark.operators.linkage import blocking_metrics


class TestBlockingMetrics:
    def test_hand_computed(self, spark):
        # gold: {1,2,3} in A, {4,5} in B -> 4 true pairs
        gold = spark.createDataFrame(
            [(i, "A") for i in (1, 2, 3)] + [(i, "B") for i in (4, 5)],
            "node_id: long, gold_label: string",
        )
        # candidates: (1,2) true, (1,4) false, (2,3) true, (4,5) true
        cands = spark.createDataFrame(
            [(1, 2), (1, 4), (2, 3), (4, 5)], "a: long, b: long"
        )
        r = blocking_metrics(cands, gold).collect()[0]
        assert (r.n_candidates, r.n_true_pairs, r.n_candidate_true) == (4, 4, 3)
        assert r.n_total_pairs == 10
        assert r.pair_completeness_ppm == 750_000
        assert r.reduction_ratio_ppm == 600_000

    def test_canonicalization_and_unknown_ids(self, spark):
        gold = spark.createDataFrame(
            [(1, "A"), (2, "A")], "node_id: long, gold_label: string"
        )
        cands = spark.createDataFrame(
            # dup in both orders + self-pair + an id outside gold
            [(1, 2), (2, 1), (1, 1), (1, 99)], "a: long, b: long"
        )
        r = blocking_metrics(cands, gold).collect()[0]
        # canonical distinct: (1,2) and (1,99) -> 2 candidates, 1 true
        assert r.n_candidates == 2
        assert r.n_candidate_true == 1 and r.n_true_pairs == 1
        assert r.pair_completeness_ppm == 1_000_000

    def test_zero_true_pairs_null_completeness(self, spark):
        gold = spark.createDataFrame(
            [(1, "A"), (2, "B")], "node_id: long, gold_label: string"
        )
        cands = spark.createDataFrame([(1, 2)], "a: long, b: long")
        r = blocking_metrics(cands, gold).collect()[0]
        assert r.pair_completeness_ppm is None
