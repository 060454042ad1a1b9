"""Distributed BPE trainer: exact parity with the pure-Python
reference trainer (tools/gen_bpe_vocab.py) and with the vendored merge
table it produced, plus the overlapping-pair counting convention."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.functions.bpe_merges import MERGES
from context_aware_rag_spark.operators import bpe_train

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "gen_bpe_vocab", os.path.join(REPO, "tools", "gen_bpe_vocab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_trainer_matches_pure_python_to_convergence(spark):
    texts = [
        "the cat sat on the mat", "the dog ate the cat food",
        "low lower lowest", "new newer newest", "wider wide widest",
        "abc abc abc!! 123 456 123", "aaa aaaa aa",
    ]
    want = _tool().train(texts, 50)  # converges early (< 50)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = bpe_train.train_bpe(bpe_train.word_frequencies(docs), 50)
    assert got == want
    assert len(got) < 50  # proves the min_freq stop triggered


def test_trainer_reproduces_vendored_table_prefix(spark):
    # BPE merges are prefix-stable: the first k merges of a long run
    # equal a k-merge run. 20 merges against the committed table
    # certifies the distributed trainer against the exact artifact
    # the engine's token counting uses.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = bpe_train.train_bpe(bpe_train.word_frequencies(docs), 20)
    assert got == MERGES[:20]


def test_overlapping_pairs_counted(spark):
    # 'aaaa' x1 contributes (a,a) three times — the reference trainer's
    # convention (count every adjacent occurrence, overlapping included)
    words = spark.createDataFrame([("aaaa", 5)], ["piece", "freq"])
    rows = bpe_train.pair_counts(
        bpe_train.initial_symbols(words)
    ).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["a"]) == b"a" and bytes(rows[0]["b"]) == b"a"
    assert rows[0]["n"] == 15


def test_single_symbol_pieces_drop_out(spark):
    words = spark.createDataFrame(
        [("x", 100), ("ab", 2)], ["piece", "freq"]
    )
    merges = bpe_train.train_bpe(words, 10)
    # 'x' never merges; 'ab' merges once then leaves the state
    assert merges == [(b"a", b"b")]


def test_validation(spark):
    words = spark.createDataFrame([("ab", 2)], ["piece", "freq"])
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train.train_bpe(words, 0)
    with pytest.raises(ValueError, match="min_freq"):
        bpe_train.train_bpe(words, 1, min_freq=0)


def test_word_frequencies_null_safe(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, None)], ["doc_id", "text"]
    )
    rows = {
        r["piece"]: r["freq"]
        for r in bpe_train.word_frequencies(docs).collect()
    }
    assert rows == {"a": 1, "b": 1}
