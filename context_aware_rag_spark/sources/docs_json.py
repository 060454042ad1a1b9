"""S2/S3 sources: DC-file JSON chunks and SRT subtitles.

S2 — the reference accepts a JSON file of VLM chunks with per-chunk
metadata (service/service.py:405-445: streamId, chunkIdx, pts/ntp
bounds, is_first/is_last). Spark shape: ``spark.read.json`` with an
EXPLICIT schema (never inferSchema in production) + a projection into
the transcripts contract.

S3 — SRT subtitle text (ingestion/base.py:627-726 parses
``index\\nHH:MM:SS,mmm --> HH:MM:SS,mmm\\ntext``). Spark shape: one
``wholetext`` read per file, split on blank lines, regexp_extract the
time bounds, arithmetic to seconds (C4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DC_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("streamId", T.StringType(), True),
        T.StructField("chunkIdx", T.IntegerType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pts_offset_ns", T.LongType(), True),
        T.StructField("start_pts", T.LongType(), True),
        T.StructField("end_pts", T.LongType(), True),
        T.StructField("start_ntp", T.StringType(), True),
        T.StructField("end_ntp", T.StringType(), True),
        T.StructField("is_first", T.BooleanType(), True),
        T.StructField("is_last", T.BooleanType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_dc_chunks(spark: SparkSession, path: str) -> DataFrame:
    """S2: JSON chunk file -> transcripts-shaped DataFrame.

    conv_id <- streamId, turn_idx <- chunkIdx, ts <- start_pts ns.
    """
    raw = spark.read.schema(DC_CHUNK_SCHEMA).json(path)
    return raw.select(
        F.col("streamId").alias("conv_id"),
        F.col("chunkIdx").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_micros((F.col("start_pts") / 1000).cast("long")).alias("ts"),
    )


_SRT_TIME = r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})"
_SRT_BLOCK = rf"(?s)\s*(\d+)\s*\n{_SRT_TIME}\s*-->\s*{_SRT_TIME}\s*\n(.*)"


def _t_to_seconds(h, m, s, ms):
    # C4: h*3600 + m*60 + s + ms/1000 (base.py:627-630)
    return (
        h.cast("double") * 3600 + m.cast("double") * 60 + s.cast("double")
        + ms.cast("double") / 1000
    )


def read_srt(spark: SparkSession, path: str) -> DataFrame:
    """S3: SRT files -> (file, seq, start_s, end_s, text) frames."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    blocks = raw.select(
        "file",
        F.explode(F.split(F.col("value"), r"\n\s*\n")).alias("block"),
    ).filter(F.trim("block") != "")
    g = lambda i: F.regexp_extract("block", _SRT_BLOCK, i)
    return blocks.select(
        "file",
        g(1).cast("int").alias("seq"),
        F.round(_t_to_seconds(g(2), g(3), g(4), g(5)), 3).alias("start_s"),
        F.round(_t_to_seconds(g(6), g(7), g(8), g(9)), 3).alias("end_s"),
        F.trim(g(10)).alias("text"),
    ).filter(F.col("seq").isNotNull())
