"""Streaming dedup ingest: cross-epoch anti-join semantics, replay
idempotence, and equivalence with the batch incremental operator."""

import os

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import dedup
from context_aware_rag_spark.streaming.dedup_ingest import (
    dedup_microbatch,
    read_deduped,
    read_prior_hashes,
    start_streaming_dedup,
)


def _write_batches(spark, in_dir, batches):
    # the file stream source wants FLAT files in input_dir — write each
    # batch to a staging dir and move its part file up as b<i>.parquet
    import glob
    import shutil

    for i, rows in enumerate(batches):
        stage = os.path.join(in_dir, f"_stage{i}")
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(in_dir, f"b{i}.parquet"))
        shutil.rmtree(stage)


BATCHES = [
    [(0, "alpha beta gamma"), (1, "delta epsilon"), (2, "ALPHA, beta gamma!")],
    # 10 duplicates batch 0's doc 0 (cross-epoch); 11/12 duplicate
    # each other (within-epoch)
    [(10, "alpha beta gamma"), (11, "zeta eta"), (12, "zeta eta")],
    [(20, "delta epsilon"), (21, "unique final doc")],
]


def test_streaming_dedup_end_to_end(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("sd_in"))
    out_dir = str(tmp_path_factory.mktemp("sd_out"))
    _write_batches(spark, in_dir, BATCHES)
    # one file per trigger -> one epoch per written batch (order of the
    # file source is not guaranteed to match write order, so assert
    # hash-level invariants, not specific epoch assignments)
    q = start_streaming_dedup(spark, in_dir, out_dir)
    q.awaitTermination(120)

    got = read_deduped(spark, out_dir)
    rows = got.collect()
    # survivors carry distinct normalized hashes, and every distinct
    # input hash is represented exactly once
    all_docs = spark.createDataFrame(
        [r for b in BATCHES for r in b], ["doc_id", "text"]
    )
    n_distinct = (
        dedup.hash_docs(all_docs).select("text_hash").distinct().count()
    )
    hashes = dedup.hash_docs(got).select("text_hash").collect()
    assert len(rows) == len(hashes) == n_distinct
    assert len({r["text_hash"] for r in hashes}) == n_distinct
    # normalized dedup: doc 2 ("ALPHA, beta gamma!") never survives
    # alongside doc 0 — exactly one of the alpha-beta-gamma family
    fam = {r["doc_id"] for r in rows} & {0, 2, 10}
    assert len(fam) == 1


def test_replay_epoch_is_idempotent(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sd_replay"))
    b0 = spark.createDataFrame(BATCHES[0], ["doc_id", "text"])
    b1 = spark.createDataFrame(BATCHES[1], ["doc_id", "text"])
    dedup_microbatch(b0, out, epoch_id=0)
    dedup_microbatch(b1, out, epoch_id=1)
    first = sorted(tuple(r) for r in read_deduped(spark, out).collect())
    dedup_microbatch(b1, out, epoch_id=1)  # foreachBatch replay
    second = sorted(tuple(r) for r in read_deduped(spark, out).collect())
    assert first == second
    # replay must not have seen its own epoch's hashes as "prior"
    assert read_prior_hashes(spark, out, before_epoch=1).count() == 2


def test_sequential_epochs_match_batch_incremental(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sd_equiv"))
    b0 = spark.createDataFrame(BATCHES[0], ["doc_id", "text"])
    b1 = spark.createDataFrame(BATCHES[1], ["doc_id", "text"])
    dedup_microbatch(b0, out, epoch_id=0)
    dedup_microbatch(b1, out, epoch_id=1)
    streamed = {
        r["doc_id"]
        for r in read_deduped(spark, out).join(
            b1.select("doc_id"), "doc_id", "left_semi"
        ).collect()
    }
    batch = {
        r["doc_id"]
        for r in dedup.exact_dedup_incremental(b1, b0).collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# streaming NEAR-dup ingest (MinHash)
# ---------------------------------------------------------------------------

from context_aware_rag_spark.streaming.dedup_ingest import (  # noqa: E402
    neardup_microbatch,
    read_prior_signatures,
    start_streaming_neardup,
)


def _near(text, i):
    """A near-duplicate of `text`: one word in ~8 rewritten."""
    words = text.split()
    words[min(i, len(words) - 1)] = f"repl{i}"
    return " ".join(words)


_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon")
_BASE2 = ("one two three four five six seven eight nine ten eleven "
          "twelve thirteen fourteen fifteen sixteen seventeen eighteen")
NEAR_BATCHES = [
    [(0, _BASE), (1, "totally different first content here words")],
    # 10 near-dups batch 0's doc 0 (cross-epoch); 11 is novel;
    # 12 near-dups 11 (within-epoch; one word changed in ~18)
    [(10, _near(_BASE, 3)), (11, _BASE2), (12, _near(_BASE2, 7))],
    [(20, "third wave fresh unrelated content entirely")],
]


def test_streaming_neardup_end_to_end(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("nd_in"))
    out_dir = str(tmp_path_factory.mktemp("nd_out"))
    _write_batches(spark, in_dir, NEAR_BATCHES)
    q = start_streaming_neardup(spark, in_dir, out_dir, threshold=0.5)
    q.awaitTermination(120)
    got = {r["doc_id"] for r in read_deduped(spark, out_dir).collect()}
    # doc 10 near-dups doc 0 across epochs -> dropped; doc 12 near-dups
    # 11 within its epoch -> dropped (file order is epoch order here in
    # id terms regardless of assignment: 0 < 10, 11 < 12)
    assert 0 in got and 1 in got and 11 in got and 20 in got
    assert 10 not in got and 12 not in got
    # the accumulated signature index covers exactly the survivors
    sigs = read_prior_signatures(spark, out_dir, before_epoch=10**6)
    assert {r["doc_id"] for r in sigs.collect()} == got


def test_neardup_replay_is_idempotent(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("nd_replay"))
    b0 = spark.createDataFrame(NEAR_BATCHES[0], ["doc_id", "text"])
    b1 = spark.createDataFrame(NEAR_BATCHES[1], ["doc_id", "text"])
    neardup_microbatch(b0, out_dir, 0, threshold=0.5)
    neardup_microbatch(b1, out_dir, 1, threshold=0.5)
    first = sorted(
        tuple(r) for r in read_deduped(spark, out_dir).collect()
    )
    neardup_microbatch(b1, out_dir, 1, threshold=0.5)  # replay epoch 1
    assert sorted(
        tuple(r) for r in read_deduped(spark, out_dir).collect()
    ) == first


def test_neardup_epochs_match_batch_incremental(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("nd_eq"))
    dfs = [spark.createDataFrame(b, ["doc_id", "text"]) for b in NEAR_BATCHES]
    for i, df in enumerate(dfs):
        neardup_microbatch(df, out_dir, i, threshold=0.5)
    got = {r["doc_id"] for r in read_deduped(spark, out_dir).collect()}
    # sequential batch-mode incremental over the same batch order
    idx = spark.createDataFrame([], "doc_id long, signature array<bigint>")
    want = set()
    for df in dfs:
        surv = dedup.minhash_dedup_incremental(df, idx, threshold=0.5)
        want |= {r["doc_id"] for r in surv.select("doc_id").collect()}
        idx = idx.unionByName(surv).localCheckpoint()
    assert got == want
