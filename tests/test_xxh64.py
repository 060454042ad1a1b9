"""The pure-Python XXH64 oracle must match Spark's xxhash64 expression
bit-for-bit — string payloads across every tail-length class (0..100
covers the 32-byte stripe loop, the 8-byte, 4-byte and byte tails),
unicode, the multi-arg left fold, and the int-vs-long argument paths.
The precomputed oracle parquet's independence rests on this equality.
"""

import random
import string

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.oracle.xxh64 import (
    spark_xxhash64_str,
    spark_xxhash64_str_int,
    spark_xxhash64_str_long,
)
from context_aware_rag_spark.oracle.precompute import normalize_py


def test_xxh64_matches_spark(spark):
    rng = random.Random(5)
    rows = [
        (n, "".join(rng.choice(string.printable) for _ in range(n)),
         rng.randrange(0, 64))
        for n in range(0, 101)
    ]
    rows.append((200, "héllo wörld 北京 — naïve", 3))
    df = spark.createDataFrame(rows, ["i", "s", "k"])
    got = df.select(
        "s", "k",
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.col("k").cast("int")).alias("h2"),
        F.xxhash64("s", F.col("k").cast("long")).alias("h3"),
    ).collect()
    for r in got:
        assert spark_xxhash64_str(r["s"]) == r["h1"]
        assert spark_xxhash64_str_int(r["s"], r["k"]) == r["h2"]
        assert spark_xxhash64_str_long(r["s"], r["k"]) == r["h3"]


@pytest.mark.parametrize("text", [
    "",
    "Hello,  World!!  ",
    "北京是中国的首都 and some ASCII 123",
    "tabs\tand\nnewlines\x0bhere",
    "punct-only !!! ...",
    "MiXeD CaSe ÉLAN déjà",
])
def test_normalize_matches_spark(spark, text):
    from context_aware_rag_spark.operators.dedup import normalized_text

    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(normalized_text(F.col("text")).alias("n")).collect()[0]["n"]
    assert got == normalize_py(text)
