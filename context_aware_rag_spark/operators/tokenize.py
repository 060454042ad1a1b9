"""Tokenize-and-pack: documents → fixed-length training examples.

The last mile of a pretraining data pipeline: BPE-encode every
document (the package's vendored byte-level BPE, functions/bpe.py),
concatenate all token streams in stable ``doc_id`` order, and cut the
global stream into ``max_tokens``-sized examples — exact
concat-then-chunk semantics (GPT-2/LLaMA style packing, no padding;
document boundaries ride across example boundaries).

Distributed shape: encoding is one Arrow-batched pandas UDF pass
(token ids, never Python-per-row); global offsets come from
packing.pack_sequences' two-phase prefix sum (no Exchange
SinglePartition); then each document emits ONE ROW PER TRAINING
EXAMPLE IT TOUCHES — ceil(n_tokens/max_tokens)+1 rows at most,
carrying an array SLICE, not per-token rows — and examples assemble
with a single groupBy(example_id) whose input is already
example-sized. At 100 TB the example-assembly shuffle moves each token
exactly once, packed in Arrow/Tungsten arrays rather than 8-byte rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import pack_sequences


def tokenize_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, tokens: array<int>, n_tokens) via the vendored BPE."""

    @F.pandas_udf("array<int>")
    def _enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ..functions.bpe import bpe_encode

        for s in it:
            yield s.map(bpe_encode)

    return docs.select(
        F.col(id_col),
        _enc(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))


def tokenize_and_pack(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(example_id, n_tokens, tokens_csv) — the packed training stream.

    ``tokens_csv`` is the comma-joined token-id sequence (string form
    keeps the cross-engine comparison format-exact). Every example has
    exactly ``max_tokens`` tokens except the final partial one, which
    is kept (drop it downstream for a strict fixed-shape epoch).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    L = int(max_tokens)
    tok = tokenize_docs(docs, id_col, text_col)
    packed = pack_sequences(tok, L, token_col="n_tokens", order_cols=[id_col])
    # a document spanning global positions [cum, cum+n) touches
    # examples cum div L .. (cum+n-1) div L; per touched example emit
    # the corresponding slice of its token array plus the slice's
    # offset inside the example. sequence() would run DESCENDING for
    # n=0 docs — they contribute nothing, so they are filtered first.
    pieces = (
        packed.filter(F.col("n_tokens") >= 1)
        .select(
            F.col(id_col),
            "tokens",
            "n_tokens",
            F.col("cum_before").alias("cum"),
            F.expr("cum_before div " + str(L)).alias("b0"),
            F.expr(f"(cum_before + n_tokens - 1) div {L}").alias("b1"),
        )
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.col("b0"), F.col("b1")),
                    lambda b: F.struct(
                        b.alias("example_id"),
                        (F.greatest(F.col("cum"), b * L) - b * L).alias(
                            "offset"
                        ),
                        F.slice(
                            F.col("tokens"),
                            F.greatest(F.lit(0), b * L - F.col("cum")) + 1,
                            F.least(
                                F.col("n_tokens"), (b + 1) * L - F.col("cum")
                            )
                            - F.greatest(F.lit(0), b * L - F.col("cum")),
                        ).alias("piece"),
                    ),
                )
            ).alias("p")
        )
        .select("p.example_id", "p.offset", "p.piece")
    )
    assembled = (
        pieces.groupBy("example_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("offset", "piece"))
                    ),
                    lambda s: s.piece,
                )
            ).alias("tokens")
        )
        .select(
            "example_id",
            F.size("tokens").cast("long").alias("n_tokens"),
            F.concat_ws(
                ",", F.transform("tokens", lambda x: x.cast("string"))
            ).alias("tokens_csv"),
        )
    )
    return assembled
