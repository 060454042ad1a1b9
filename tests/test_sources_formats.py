"""JSONL/CSV transcript sources: explicit-schema reads, corrupt-record
quarantine, and write→read roundtrips against the deterministic
generator (per-turn text equality under stable ordering — the
north-rule invariant — must survive the format hop)."""

import os

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.sources import transcripts as tr


def _rows(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return tr.generate_transcripts(spark, 3).localCheckpoint()


def test_jsonl_roundtrip(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jsonl") / "t")
    corpus.write.json(out)
    back, bad = tr.split_corrupt(tr.read_transcripts_jsonl(spark, out))
    assert bad.count() == 0
    assert _rows(back) == _rows(corpus)
    assert [f.name for f in back.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]


def test_jsonl_corrupt_quarantine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("badjson")
    p = str(d / "feed.jsonl")
    good = (
        '{"conv_id":"c0","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2026-01-01T00:00:00Z"}'
    )
    with open(p, "w") as f:
        f.write(good + "\n")
        f.write("{not json at all\n")
        f.write(good.replace('"c0"', '"c1"') + "\n")
    df = tr.read_transcripts_jsonl(spark, p)
    ok, bad = tr.split_corrupt(df)
    assert ok.count() == 2
    assert sorted(r.conv_id for r in ok.collect()) == ["c0", "c1"]
    quarantined = [r.raw for r in bad.collect()]
    assert quarantined == ["{not json at all"]
    # ingest-gate mode fails loudly instead
    with pytest.raises(Exception):
        tr.read_transcripts_jsonl(spark, p, mode="FAILFAST").count()


def test_csv_roundtrip_with_hostile_text(spark, corpus, tmp_path_factory):
    # embedded delimiter, quote, and newline in text must survive
    hostile = spark.createDataFrame(
        [("cX", 0, "user", 'line one\nwith, "comma"', None,
          corpus.select("ts").first()["ts"])],
        tr.TRANSCRIPT_SCHEMA,
    )
    src = corpus.unionByName(hostile)
    out = str(tmp_path_factory.mktemp("csv") / "t")
    (src.write.option("header", "true").option("escape", '"')
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")
        .csv(out))
    back, bad = tr.split_corrupt(tr.read_transcripts_csv(spark, out))
    assert bad.count() == 0
    assert _rows(back) == _rows(src)


def test_csv_corrupt_quarantine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("badcsv")
    p = str(d / "feed.csv")
    with open(p, "w") as f:
        f.write("conv_id,turn_idx,role,text,tool,ts\n")
        f.write("c0,0,user,hi,,2026-01-01T00:00:00Z\n")
        f.write("c1,NOT_AN_INT,user,hi,,2026-01-01T00:00:00Z\n")
    ok, bad = tr.split_corrupt(tr.read_transcripts_csv(spark, p))
    assert [r.conv_id for r in ok.collect()] == ["c0"]
    assert ok.first()["turn_idx"] == 0
    assert bad.count() == 1
