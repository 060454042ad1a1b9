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
