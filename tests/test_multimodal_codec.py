"""Real BMP/PPM codec tests (VERDICT r2 item 8): pure-numpy decode of
planted payloads with KNOWN pixels, round-trips, and the media_features
real-decode branch for image rows."""

import numpy as np
import pytest

from context_aware_rag_spark.operators import multimodal


def test_bmp_roundtrip_known_pixels():
    # 3x2 image with distinct corner values, non-multiple-of-4 row size
    px = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )
    data = multimodal.encode_bmp(px)
    assert data[:2] == b"BM"
    # size field = 54 + padded rows: row = (3*3+3)//4*4 = 12, h=2
    assert len(data) == 54 + 12 * 2
    out = multimodal.decode_bmp(data)
    assert out.shape == (2, 3, 3)
    assert (out == px).all()


def test_bmp_synthesized_deterministic():
    a, b = multimodal.synthesize_bmp(42), multimodal.synthesize_bmp(42)
    assert a == b
    w, h = multimodal.bmp_thumb_dims(42)
    assert multimodal.decode_bmp(a).shape == (h, w, 3)


def test_ppm_decode_with_comment():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    data = b"P6\n# a comment\n2 2\n255\n" + px.tobytes()
    out = multimodal.decode_ppm(data)
    assert (out == px).all()


def test_histogram_feature_known_values():
    # all-black image: every pixel lands in bin 0
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    feats = multimodal.decode_image_batch(
        __import__("pandas").Series([multimodal.encode_bmp(px)])
    )
    assert feats.shape == (1, 32)
    assert feats[0, 0] == pytest.approx(1.0)
    assert feats[0, 1:].sum() == 0.0


def test_unknown_magic_raises_without_fake():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_batch(pd.Series([b"JPEGnope"]), fake=False)
    # fake=True falls back to the deterministic double
    f = multimodal.decode_image_batch(pd.Series([b"JPEGnope"]), fake=True)
    assert f.shape == (1, 32)


def test_media_features_real_decode_for_images(spark):
    docs = spark.createDataFrame(
        [(0, "img row"), (1, "audio row"), (2, "video row")],
        ["doc_id", "text"],
    )
    media = multimodal.synthesize_media(spark, docs)
    rows = {
        r["media_id"]: r
        for r in multimodal.extract_media_features(media, fake=True).collect()
    }
    # image row: n_bytes equals the BMP size arithmetic, feature is the
    # real histogram (L1 sums to ~1), not the unit-norm fake
    w, h = multimodal.bmp_thumb_dims(0)
    assert rows[0]["n_bytes"] == 54 + h * ((3 * w + 3) // 4 * 4)
    assert sum(rows[0]["feature"]) == pytest.approx(1.0, abs=1e-3)
    assert rows[1]["n_bytes"] == len("audio row")
    # histogram matches an independent driver-side decode
    feats = multimodal.decode_image_batch(
        __import__("pandas").Series([multimodal.synthesize_bmp(0)])
    )
    assert list(rows[0]["feature"]) == pytest.approx(list(feats[0]))


def test_magic_false_positive_falls_back_to_fake():
    """A text payload that happens to start with 'BM'/'P6' must not
    crash the fake path (the 2-byte sniff can false-positive); strict
    mode still raises."""
    import pandas as pd

    bad = pd.Series([b"BMW is a carmaker, not a bitmap header at all"])
    feats = multimodal.decode_image_batch(bad, fake=True)
    assert feats.shape == (1, 32)
    with pytest.raises(Exception):
        multimodal.decode_image_batch(bad, fake=False)

