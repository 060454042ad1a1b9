"""n-gram language ID and multimodal resize-plan behavior tests."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators.multimodal import (
    resize_plan,
    synthesize_media,
)
from context_aware_rag_spark.operators.textmetrics import language_id_ngram


def test_language_id_ngram_separates_languages(spark):
    rows = [
        (1, "the thing and the other thing going along the end of the song"),
        (2, "le chat de la maison est dans le jardin de la grande dame"),
        (3, "die kinder singen ein schoenes lied in der schule und der kirche"),
        (4, "zzz qqq xxx www"),  # no profile trigrams at all
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["lang_pred"] for r in language_id_ngram(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "unknown"


def test_language_id_ngram_scores_sum_sane(spark):
    df = spark.createDataFrame([(1, "the and ing of the and")], ["doc_id", "text"])
    r = language_id_ngram(df).collect()[0]
    assert 0.0 <= r["score_fr"] <= r["score_en"] <= 1.0


def test_resize_plan_clamps_and_never_upscales(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "b"), (300, "c")], ["doc_id", "text"]
    )
    media = synthesize_media(spark, docs)
    plans = {r["media_id"]: r for r in resize_plan(media, max_side=256).collect()}
    # only image rows (doc_id % 3 == 0) appear
    assert set(plans) == {0, 300}
    for r in plans.values():
        assert max(r["dst_w"], r["dst_h"]) <= 256
        assert r["scale"] <= 1.0
        # aspect preserved within rounding
        src_ar = r["src_w"] / r["src_h"]
        dst_ar = r["dst_w"] / r["dst_h"]
        assert abs(src_ar - dst_ar) / src_ar < 0.05
    # small image (64+0=64 wide, 48 tall) is NOT upscaled
    assert plans[0]["scale"] == 1.0
    assert plans[0]["dst_w"] == plans[0]["src_w"]


def test_repetition_signals_hand_computed(spark):
    from context_aware_rag_spark.operators.textmetrics import repetition_signals

    rows = [
        # bigrams: "a b","b a","a b" -> 3 grams, "a b"x2 dup
        (1, "a b a b"),
        # all bigrams distinct
        (2, "w x y z"),
        # fully degenerate: "r r" x4
        (3, "r r r r r"),
        (4, "solo"),       # < 2 words: no output row
        (5, ""),           # empty: no output row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_grams"] == 3
    assert got[1]["dup_gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[1]["top_gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[2]["n_grams"] == 3
    assert got[2]["dup_gram_frac"] == 0.0
    assert got[2]["top_gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["n_grams"] == 4
    assert got[3]["dup_gram_frac"] == 1.0
    assert got[3]["top_gram_frac"] == 1.0


def test_repetition_signals_trigram_mode(spark):
    from context_aware_rag_spark.operators.textmetrics import repetition_signals

    df = spark.createDataFrame([(1, "a b c a b c a b"), (2, "a b c")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_signals(df, n=3).collect()}
    # doc1 trigrams: abc, bca, cab, abc, bca, cab -> all 6 duplicated
    assert got[1]["n_grams"] == 6
    assert got[1]["dup_gram_frac"] == 1.0
    assert got[1]["top_gram_frac"] == pytest.approx(2 / 6, abs=1e-6)
    # doc2: exactly one trigram
    assert got[2]["n_grams"] == 1
    assert got[2]["dup_gram_frac"] == 0.0
    assert got[2]["top_gram_frac"] == 1.0


def test_pii_scrub_redacts_and_counts(spark):
    from context_aware_rag_spark.operators.textmetrics import pii_scrub

    rows = [
        (1, "mail alice.b-1@sub.example.org now"),
        (2, "call 415-555-0042 or 212-555-9999"),
        (3, "host 192.168.1.254 up"),
        (4, "a@b.co 10.0.0.1 650-555-1234 mixed"),
        (5, "clean text with no pii at all"),
        (6, "not-a-phone 1234-555-0000 and not-an-ip 1.2.3.4.5"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["scrubbed"]) == (1, "mail <EMAIL> now")
    assert got[2]["n_phones"] == 2
    assert got[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert (got[3]["n_ips"], got[3]["scrubbed"]) == (1, "host <IP> up")
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (1, 1, 1)
    assert got[4]["scrubbed"] == "<EMAIL> <IP> <PHONE> mixed"
    assert (got[5]["n_emails"], got[5]["n_phones"], got[5]["n_ips"]) == (0, 0, 0)
    assert got[5]["scrubbed"] == rows[4][1]
    # \b guards: 4-digit prefix blocks the phone; 5-dotted run still
    # contains a legal leading 4-dotted IPv4 match (documented greedy-left)
    assert got[6]["n_phones"] == 0
    assert got[6]["n_ips"] == 1


def test_c4_line_filter_rules(spark):
    from context_aware_rag_spark.operators.textmetrics import c4_line_filter

    rows = [
        # keepable sentence + non-terminal line + short line + js line
        (1, "The quick brown fox jumps high.\nno terminal punct here\nToo short.\nenable JavaScript now please."),
        # page kills: lorem ipsum / curly brace
        (2, "A fine long sentence right here.\nlorem ipsum dolor sit amet."),
        (3, "A fine long sentence right here.\nvar x = { a: 1 }"),
        # question + exclamation + quote terminals all count
        (4, 'Is this a real question?\nWhat a great day indeed!\nHe said "stop right there."'),
        # nothing survives -> doc absent
        (5, "word\nanother word"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert set(got) == {1, 4}
    assert got[1]["n_lines"] == 4
    assert got[1]["n_kept"] == 1
    assert got[1]["cleaned"] == "The quick brown fox jumps high."
    assert got[4]["n_kept"] == 3
    assert got[4]["cleaned"] == rows[3][1]


def test_c4_line_filter_min_kept_threshold(spark):
    from context_aware_rag_spark.operators.textmetrics import c4_line_filter

    df = spark.createDataFrame(
        [(1, "Only one good sentence here.\nbad line")], ["doc_id", "text"]
    )
    assert c4_line_filter(df, min_kept_lines=2).count() == 0
    assert c4_line_filter(df, min_kept_lines=1).count() == 1


def test_c4_line_filter_closing_brace_kills_page(spark):
    from context_aware_rag_spark.operators.textmetrics import c4_line_filter

    df = spark.createDataFrame(
        [(1, "A fine long sentence right here.\n} end of template")],
        ["doc_id", "text"],
    )
    assert c4_line_filter(df).count() == 0


def test_gopher_filter_rules(spark):
    from context_aware_rag_spark.operators.textmetrics import gopher_filter

    base = "the words be to of and that have with " + "content " * 45
    rows = [
        (1, base),                                   # passes everything
        (2, "too short to pass"),                    # word count
        (3, base + " ## ## ## ## ## ## ## ## ## ## ## ## ##"),   # symbols
        (4, base + ("\n- b" * 10)),                  # bullet wall
        (5, base + "\nwait..." + "\nmore..."),       # ellipsis endings
        (6, "zz " * 60),                             # no required stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_filter(df).collect()}
    assert got[1]["keep"]
    assert not got[2]["ok_words"] and not got[2]["keep"]
    assert not got[3]["ok_symbols"] and got[3]["ok_words"]
    assert not got[4]["ok_bullets"] and got[4]["ok_stopwords"]
    assert not got[5]["ok_bullets"]
    assert not got[6]["ok_stopwords"] and got[6]["ok_words"]
    # rule columns are the complete explanation of keep
    for r in got.values():
        assert r["keep"] == all(
            r[c] for c in ("ok_words", "ok_mean_len", "ok_symbols",
                           "ok_bullets", "ok_alpha", "ok_stopwords")
        )
