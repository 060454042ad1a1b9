"""Unit tests: rouge_n_scores (the SQL twin lives in entry_queries
and is swept by test_entry_contract)."""

import pytest

from context_aware_rag_spark.operators import texteval
from context_aware_rag_spark.operators.texteval import rouge_n_scores


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id: long, cand_text: string, ref_text: string"
    )


def _one(spark, cand, ref, n=2):
    out = rouge_n_scores(_pairs(spark, [(1, cand, ref)]), n=n).collect()
    assert len(out) == 1
    return out[0]


class TestRougeN:
    def test_identical_texts_score_one(self, spark):
        r = _one(spark, "the cat sat on the mat", "the cat sat on the mat")
        assert r.cand_grams == r.ref_grams == r.clipped_overlap == 5
        assert r.precision_ppm == r.recall_ppm == r.f_ppm == 1_000_000

    def test_hand_computed_partial_overlap(self, spark):
        # cand bigrams: {a b, b c}; ref bigrams: {a b, b d}
        r = _one(spark, "a b c", "a b d")
        assert (r.cand_grams, r.ref_grams, r.clipped_overlap) == (2, 2, 1)
        assert r.precision_ppm == r.recall_ppm == r.f_ppm == 500_000

    def test_clipping_caps_repeats(self, spark):
        # cand repeats "a b" 3x (grams: a b, b a, a b, b a, a b);
        # ref has ONE "a b" -> clipped counts: min(3,1) + min(2,0) = 1
        r = _one(spark, "a b a b a b", "a b")
        assert r.cand_grams == 5 and r.ref_grams == 1
        assert r.clipped_overlap == 1
        assert r.precision_ppm == 1_000_000 // 5
        assert r.recall_ppm == 1_000_000

    def test_normalization_matches(self, spark):
        # punctuation/case fold away before gramming
        r = _one(spark, "The CAT, sat!", "the cat sat")
        assert r.f_ppm == 1_000_000

    def test_short_text_empty_grams(self, spark):
        r = _one(spark, "single", "the ref text here")
        assert r.cand_grams == 0 and r.clipped_overlap == 0
        assert r.precision_ppm is None
        assert r.recall_ppm == 0

    def test_rouge1_unigrams(self, spark):
        r = _one(spark, "a b c", "a x c", n=1)
        assert (r.cand_grams, r.clipped_overlap) == (3, 2)
        assert r.f_ppm == 4_000_000 // 6

    def test_multiple_pairs_stay_separate(self, spark):
        out = {
            r.pair_id: r
            for r in rouge_n_scores(
                _pairs(
                    spark,
                    [(1, "a b c", "a b c"), (2, "x y", "p q")],
                )
            ).collect()
        }
        assert out[1].f_ppm == 1_000_000
        assert out[2].clipped_overlap == 0 and out[2].f_ppm == 0

    def test_validation(self, spark):
        df = _pairs(spark, [(1, "a", "b")])
        with pytest.raises(ValueError, match="n >= 1"):
            rouge_n_scores(df, n=0)
        with pytest.raises(ValueError, match="id column"):
            rouge_n_scores(df, id_cols=())


# ---------------------------------------------------------------------------
# TextRank extractive summarization
# ---------------------------------------------------------------------------

from context_aware_rag_spark.operators.textrank import textrank_summary
from context_aware_rag_spark.oracle.precompute import textrank_py


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: string, text: string")


class TestTextrankSummary:
    def test_matches_python(self, spark):
        rows = [
            ("d1", "The cat sat on the mat. The cat sat near the mat! "
                   "A dog barked loudly? Nothing shared here at all. "
                   "The mat was sat on by the cat."),
            ("d2", "Alpha beta gamma. Delta epsilon zeta. Alpha beta delta."),
            ("d3", "One sentence only"),
        ]
        got = sorted(
            (r.doc_id, r.sent_idx, r.sentence, r.rank_micro, r.rk)
            for r in textrank_summary(
                _docs(spark, rows), top_k=2, threshold_ppm=150_000
            ).collect()
        )
        exp = sorted(textrank_py(rows, top_k=2, threshold_ppm=150_000))
        assert got == exp

    def test_central_sentence_wins(self, spark):
        # s0 overlaps both s1 and s2; s1 and s2 share nothing: the
        # hub sentence s0 must rank first
        rows = [("d", "apple banana cherry. apple banana mango. "
                      "cherry plum kiwi.")]
        out = textrank_summary(
            _docs(spark, rows), top_k=1, threshold_ppm=100_000
        ).collect()
        assert len(out) == 1 and out[0].sent_idx == 0

    def test_isolated_sentences_sort_last_but_survive(self, spark):
        rows = [("d", "shared words here. shared words there. "
                      "totally disjoint clause!")]
        out = {
            r.sent_idx: (r.rank_micro, r.rk)
            for r in textrank_summary(
                _docs(spark, rows), top_k=3, threshold_ppm=300_000
            ).collect()
        }
        assert out[2][0] is None and out[2][1] == 3
        assert out[0][1] in (1, 2) and out[1][1] in (1, 2)

    def test_single_sentence_doc_survives(self, spark):
        out = textrank_summary(
            _docs(spark, [("d", "just one line")]), top_k=3
        ).collect()
        assert len(out) == 1 and out[0].rk == 1 and out[0].rank_micro is None

    def test_validation(self, spark):
        d = _docs(spark, [("d", "a. b.")])
        with pytest.raises(ValueError, match="top_k"):
            textrank_summary(d, top_k=0)
        with pytest.raises(ValueError, match="threshold"):
            textrank_summary(d, threshold_ppm=2_000_000)


def _chrf_py(cand, ref, max_n=6, beta_sq=4):
    """Pure-Python chrF twin: repo normalization, space-stripped char
    n-grams, exact-integer level scores, trunc mean over included
    levels."""
    import re
    from collections import Counter

    def chars(t):
        t = re.sub(r"[^\w\s]", " ", (t or "").lower(), flags=re.UNICODE)
        t = re.sub(r"\s+", " ", t).strip()
        return t.replace(" ", "")

    c, r = chars(cand), chars(ref)
    fs = []
    tot = [0, 0, 0]
    for n in range(1, max_n + 1):
        cg = Counter(c[i:i + n] for i in range(len(c) - n + 1))
        rg = Counter(r[i:i + n] for i in range(len(r) - n + 1))
        tc, tr = sum(cg.values()), sum(rg.values())
        clip = sum(min(cnt, rg[g]) for g, cnt in cg.items())
        tot[0] += tc
        tot[1] += tr
        tot[2] += clip
        den = beta_sq * tr + tc
        if den > 0:
            fs.append(((1 + beta_sq) * clip * 1_000_000) // den)
    chrf = sum(fs) // len(fs) if fs else None
    return len(fs), tot[0], tot[1], tot[2], chrf


class TestChrf:
    def _score(self, spark, cand, ref, **kw):
        df = spark.createDataFrame(
            [(1, cand, ref)], "pair_id int, cand_text string, ref_text string"
        )
        return texteval.chrf_scores(df, **kw).collect()[0]

    def test_identical_texts_score_unity(self, spark):
        row = self._score(spark, "the cat sat", "the cat sat")
        assert row["chrf_ppm"] == 1_000_000
        assert row["n_levels"] == 6

    def test_hand_computed_single_order(self, spark):
        # chars: cand "ab" vs ref "abb" at n=1 only:
        # cand {a:1, b:1}, ref {a:1, b:2} -> clip 2, tc 2, tr 3
        # F = 5*2*1e6 // (4*3 + 2) = 1e7 // 14
        row = self._score(spark, "ab", "abb", max_n=1)
        assert row["n_levels"] == 1
        assert row["cand_grams"] == 2
        assert row["ref_grams"] == 3
        assert row["clipped_overlap"] == 2
        assert row["chrf_ppm"] == (5 * 2 * 1_000_000) // 14

    def test_python_replication_battery(self, spark):
        cases = [
            ("The quick brown fox", "the quick brown foxes jumped"),
            ("Hello, world!", "hello world"),
            ("abc", "xyz"),
            ("a", "a longer reference text"),
            ("short", "s"),
            ("répétition répétée", "repetition repeated"),
        ]
        df = spark.createDataFrame(
            [(i, c, r) for i, (c, r) in enumerate(cases)],
            "pair_id int, cand_text string, ref_text string",
        )
        got = {
            row["pair_id"]: (
                row["n_levels"], row["cand_grams"], row["ref_grams"],
                row["clipped_overlap"], row["chrf_ppm"],
            )
            for row in texteval.chrf_scores(df).collect()
        }
        for i, (c, r) in enumerate(cases):
            assert got[i] == _chrf_py(c, r), (i, c, r)

    def test_effective_order_excludes_short_levels(self, spark):
        # both sides 3 chars -> levels 4..6 have zero grams on BOTH
        # sides and are excluded, not scored as zero
        row = self._score(spark, "abc", "abc")
        assert row["n_levels"] == 3
        assert row["chrf_ppm"] == 1_000_000

    def test_one_sided_empty_level_scores_zero(self, spark):
        # cand 2 chars, ref 6: levels 3..6 exist only on the ref side
        # -> included with an honest 0, dragging the mean down
        row = self._score(spark, "ab", "abcdef")
        assert row["n_levels"] == 6
        py = _chrf_py("ab", "abcdef")
        assert row["chrf_ppm"] == py[4]
        assert row["chrf_ppm"] < 500_000

    def test_both_empty_unscorable_null(self, spark):
        row = self._score(spark, "", "...")
        assert row["n_levels"] == 0
        assert row["chrf_ppm"] is None

    def test_space_stripping_crosses_word_boundaries(self, spark):
        # "ab cd" vs "abcd" are IDENTICAL after space removal
        row = self._score(spark, "ab cd", "abcd")
        assert row["chrf_ppm"] == 1_000_000

    def test_recall_weighting_is_asymmetric(self, spark):
        # truncating the reference hurts recall 4x more than adding
        # noise hurts precision -> swapping sides changes the score
        a = self._score(spark, "the cat", "the cat sat on the mat")
        b = self._score(spark, "the cat sat on the mat", "the cat")
        assert a["chrf_ppm"] < b["chrf_ppm"]

    def test_validation(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "b")], "pair_id int, cand_text string, ref_text string"
        )
        import pytest as _pt
        with _pt.raises(ValueError):
            texteval.chrf_scores(df, max_n=0)
        with _pt.raises(ValueError):
            texteval.chrf_scores(df, beta_sq=-1)
        with _pt.raises(ValueError):
            texteval.chrf_scores(df, id_cols=())
