"""Winnowing fingerprint goldens (rolling_fingerprints) and the C7
entity-text compose fixture."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators.textmetrics import rolling_fingerprints


def _spark_xxhash64(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    return {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}


def test_fingerprints_match_hand_spans(spark):
    # 14 words, window 8, every 4 -> starts 0, 4, 6?? no: sequence(0, 14-8=6, 4)
    # = [0, 4] plus the greatest() keeps 6 out (6 not a multiple of 4 from 0
    # within stop=6 -> sequence(0,6,4) = [0,4])
    words = [f"w{i}" for i in range(14)]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = rolling_fingerprints(df, window=8, every=4).collect()[0]
    expected_spans = [
        " ".join(words[0:8]),
        " ".join(words[4:12]),
    ]
    hmap = _spark_xxhash64(spark, expected_spans)
    assert got["fingerprints"] == [hmap[s] for s in expected_spans]
    assert got["n_fingerprints"] == 2


def test_fingerprints_short_doc_single_span(spark):
    df = spark.createDataFrame([(1, "only three words")], ["doc_id", "text"])
    got = rolling_fingerprints(df, window=8, every=4).collect()[0]
    hmap = _spark_xxhash64(spark, ["only three words"])
    assert got["fingerprints"] == [hmap["only three words"]]


def test_containment_shares_fingerprints(spark):
    """A doc embedded at an ``every``-aligned offset shares span hashes
    with its container — the containment-join property winnowing exists
    for."""
    base = [f"t{i}" for i in range(32)]
    container = " ".join(base)
    contained = " ".join(base[8:24])  # aligned to every=4, window=8
    df = spark.createDataFrame(
        [(1, container), (2, contained)], ["doc_id", "text"]
    )
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in rolling_fingerprints(df, window=8, every=4).collect()
    }
    shared = fps[1] & fps[2]
    assert len(shared) >= 2  # spans [8:16] and [12:20] appear in both
    assert not fps[2] - fps[1]  # every contained span exists in container


def test_compose_entity_text_c7(spark):
    from context_aware_rag_spark.functions.text import compose_entity_text

    df = spark.createDataFrame(
        [("Ada", "a mathematician"), ("Bob", None)], ["name", "description"]
    )
    got = [
        r["t"]
        for r in df.select(
            compose_entity_text(F.col("name"), F.col("description")).alias("t")
        ).collect()
    ]
    # reference: e.name + coalesce(' ' + e.description, '') (neo4j_db.py:682)
    assert got == ["Ada a mathematician", "Bob"]
