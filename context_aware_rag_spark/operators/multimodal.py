"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns
with a typed metadata struct. The Spark-side plumbing — schema,
partition-preserving mapInPandas, Arrow batch shape, size accounting —
is real and tested; the actual codec work is STUBBED (the container has
no image/audio libraries): :func:`decode_image_batch` raises
``NotImplementedError`` unless ``fake=True``, in which case a clearly
marked deterministic fake produces stable feature vectors from the
payload bytes so downstream operators (dedup, ANN) are exercisable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
            T.StructField("codec", T.StringType(), True),
        ]), True),
    ]
)

_FEATURE_DIM = 32


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> np.ndarray:
    """STUB: real implementation would Pillow-decode + resize + embed.

    With ``fake=True`` returns a deterministic sha1-seeded feature matrix
    (n, 32) — stable across executors/runs, suitable for plumbing tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires Pillow/torchvision — not in this container; "
            "pass fake=True for the deterministic test double"
        )
    feats = []
    for p in payloads:
        b = bytes(p) if p is not None else b""
        seed = int.from_bytes(hashlib.sha1(b).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(_FEATURE_DIM).astype(np.float32)
        feats.append(v / np.linalg.norm(v))
    return np.stack(feats) if feats else np.zeros((0, _FEATURE_DIM), np.float32)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media(MEDIA_SCHEMA) -> (media_id, kind, n_bytes, feature array<float>).

    mapInPandas: partition-preserving, Arrow-batched, no shuffle.
    """
    out_schema = (
        "media_id long, kind string, n_bytes int, feature array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["payload"], fake=fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (the decode itself is the stub above). Pure JVM explode — shows the
    batch shape a real sampler would fill."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
        )
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: target dimensions + scale factor computed
    JVM-side from metadata (aspect-preserving, clamp longest side to
    ``max_side``, never upscale). The pixel work itself belongs in the
    stubbed decode path; this is the part a 100 TB job plans and
    shuffles by, and it is exactly SQL-twin-able."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("src_w"),
        h.alias("src_h"),
        F.round(scale, 6).alias("scale"),
        F.greatest(F.round(w * scale).cast("int"), F.lit(1)).alias("dst_w"),
        F.greatest(F.round(h * scale).cast("int"), F.lit(1)).alias("dst_h"),
    )


def synthesize_media(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    utf-8 bytes of the text (opaque to the engine, stable for tests)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 64).cast("int").alias("width"),
            (F.col(id_col) % 480 + 48).cast("int").alias("height"),
            (F.col(id_col) % 9000 + 1000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
