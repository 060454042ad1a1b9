"""Distributed BPE tokenizer training.

The vendored merge table (functions/bpe_merges.py) is trained by a
single-process tool (tools/gen_bpe_vocab.py) — fine at sf0.001,
impossible at 100 TB. This is the Spark-native trainer: the corpus is
touched ONCE (pre-tokenize + word frequency aggregation, the only
corpus-sized job); the training loop then runs entirely over the
distinct-piece table, whose size is vocabulary-bounded (a 100 TB
corpus still has ~1e8 distinct pre-tokens — a small frame by Spark
standards), with one pair-count aggregation + one top-1 action per
merge.

Semantics are EXACTLY the classic algorithm (Sennrich et al. 2016)
as implemented by the pure-Python tool: count every adjacent symbol
pair occurrence (overlapping included) weighted by piece frequency,
merge the (count, pair-bytes)-max pair via a left-to-right scan with
skip-after-merge, stop when the best count drops below ``min_freq``.
Parity with the vendored table is pinned by test (the distributed
trainer reproduces functions/bpe_merges.py MERGES on the same
corpus), which also certifies the JVM fold below against the Python
reference scan.

Scale notes: per-iteration cost is O(distinct pieces) with a
``n_buckets``-free full aggregation — the pair-count key space is at
most (current vocab)^2 but in practice tiny; the state frame is
localCheckpointed every iteration so the 100s-of-iterations loop
never accretes lineage. The per-merge driver action (one top-1 row)
is inherent to BPE's sequential dependency — each merge changes the
next iteration's pair counts.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bpe import BPE_TOKEN_RE


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(piece, freq) over the corpus: pre-tokenize with the canonical
    BPE_TOKEN_RE (JVM regexp — the ONE corpus-sized scan) and count.
    NULL texts contribute nothing."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(BPE_TOKEN_RE),
                    F.lit(0),
                )
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(syms: array<binary>, freq): every piece split into single
    UTF-8 bytes — BPE's byte-level start state. Pieces already at one
    symbol can never merge and are dropped from the training state."""
    b = F.encode(F.col("piece"), "UTF-8")
    syms = F.transform(
        F.sequence(F.lit(1), F.length(b)),
        lambda i: F.substr(b, i, F.lit(1)),
    )
    return (
        words.select(syms.alias("syms"), F.col("freq"))
        .filter(F.size("syms") >= 2)
    )


def pair_counts(state: DataFrame) -> DataFrame:
    """(a, b, n): every adjacent symbol pair occurrence (overlapping
    included — 'aaa' counts (a,a) twice, matching the reference
    trainer), weighted by piece frequency."""
    with_pairs = state.filter(F.size("syms") >= 2).select(
        # sequence(1, size-1) is safe under the >= 2 guard (sequence
        # with stop < start DESCENDS — it must never see size 1)
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i-1] AS a, syms[i] AS b))"
            )
        ).alias("p"),
        "freq",
    )
    return with_pairs.groupBy("p.a", "p.b").agg(
        F.sum("freq").alias("n")
    )


def _apply_merge(state: DataFrame, a: bytes, b: bytes) -> DataFrame:
    """Left-to-right merge scan with skip-after-merge, as a JVM
    aggregate fold (no Python in the loop): state is (acc, skip) —
    skip consumes the second element of a just-merged pair."""
    a_lit = F.lit(bytearray(a))
    b_lit = F.lit(bytearray(b))
    merged_lit = F.lit(bytearray(a + b))
    syms = F.col("syms")
    n = F.size(syms)

    def step(s, i):
        is_pair = (
            (i < n - 1)
            & (F.element_at(syms, i + 1) == a_lit)
            & (F.element_at(syms, i + 2) == b_lit)
        )
        return (
            F.when(
                s.skip,
                F.struct(s.acc.alias("acc"), F.lit(False).alias("skip")),
            )
            .when(
                is_pair,
                F.struct(
                    F.concat(s.acc, F.array(merged_lit)).alias("acc"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        s.acc, F.array(F.element_at(syms, i + 1))
                    ).alias("acc"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    new_syms = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.struct(
            F.array().cast("array<binary>").alias("acc"),
            F.lit(False).alias("skip"),
        ),
        step,
        lambda s: s.acc,
    )
    return state.select(new_syms.alias("syms"), "freq").filter(
        F.size("syms") >= 2
    )


def train_bpe(
    words: DataFrame, n_merges: int, min_freq: int = 2
) -> List[Tuple[bytes, bytes]]:
    """Learn up to ``n_merges`` BPE merges from a (piece, freq) frame
    (see :func:`word_frequencies`). Returns the ordered merge list —
    byte-identical to tools/gen_bpe_vocab.py's pure-Python trainer on
    the same corpus (pinned by test against the vendored table).

    Tie-break matches the reference: highest count, then the
    byte-lexicographically GREATEST pair. Stops early when the best
    pair's count falls below ``min_freq``.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    state = initial_symbols(words).localCheckpoint()
    merges: List[Tuple[bytes, bytes]] = []
    try:
        for _ in range(n_merges):
            best = (
                pair_counts(state)
                .orderBy(
                    F.desc("n"), F.desc("a"), F.desc("b")
                )
                .first()
            )
            if best is None or best["n"] < min_freq:
                break
            a, b = bytes(best["a"]), bytes(best["b"])
            merges.append((a, b))
            prev = state
            state = _apply_merge(state, a, b).localCheckpoint()
            prev.unpersist()
    finally:
        state.unpersist()
    return merges
