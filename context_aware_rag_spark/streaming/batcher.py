"""Stateful streaming batcher — the reference's count-based Batcher
(utils/ctx_rag_batcher.py:53-139) as a custom stateful operator.

Semantics reproduced:
- batch identity ``batch_id = turn_idx // batch_size`` (batcher.py:53)
- a batch fires when it holds ``batch_size`` contiguous turns, OR when
  it contains an ``is_last`` turn and is contiguous up to it
  (batcher.py:76-82); out-of-order arrival within a batch is tolerated
  (dict keyed by doc_i, sorted on read — batcher.py:100-104)
- a batch that never completes never fires (no watermark in the
  reference either — SURVEY.md §2.8)

Spark shape: ``groupBy(conv_id, batch_id).applyInPandasWithState`` —
state per (conv, batch) holds the turns seen so far; on completion the
operator emits ONE row with the ordered concatenated batch text (A1)
and clears state. Used when micro-batches may split a batch across
triggers (batch_size > 1); at batch_size=1 the stateless path in
streaming/ingest.py is the right plan (no state, no shuffle).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, batch_id long, batch_text string, "
    "n_turns int, min_turn int, max_turn int"
)
STATE_SCHEMA = "turn_idxs array<int>, texts array<string>, saw_last boolean"


def make_batch_assembler(batch_size: int):
    """Returns the applyInPandasWithState function for this batch size."""

    def assemble(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        conv_id, batch_id = key
        if state.exists:
            turn_idxs, texts, saw_last = state.get
            turn_idxs = list(turn_idxs)
            texts = list(texts)
        else:
            turn_idxs, texts, saw_last = [], [], False

        for pdf in pdfs:
            for turn_idx, text, is_last in zip(
                pdf["turn_idx"], pdf["text"], pdf["is_last"]
            ):
                if int(turn_idx) in turn_idxs:
                    continue  # duplicate doc_i: reference raises; we dedupe
                turn_idxs.append(int(turn_idx))
                texts.append(text if text is not None else "")
                saw_last = saw_last or bool(is_last)

        base = int(batch_id) * batch_size
        order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
        sorted_idx = [turn_idxs[i] for i in order]
        # full batch: batch_size distinct turns within the batch range
        # are necessarily exactly [base, base+batch_size)
        full = len(sorted_idx) == batch_size and sorted_idx == list(
            range(base, base + len(sorted_idx))
        )
        # final batch: the reference anchors contiguity at the first
        # PRESENT doc (is_full, ctx_rag_batcher.py:76-82: len(batch) ==
        # last_idx - first_idx + 1), so a missing LEADING turn does not
        # hold the conversation's last batch hostage
        last_complete = (
            saw_last
            and bool(sorted_idx)
            and sorted_idx
            == list(range(sorted_idx[0], sorted_idx[0] + len(sorted_idx)))
        )

        if full or last_complete:
            batch_text = " ".join(
                texts[i] for i in order if texts[i] != "."
            )
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "batch_id": [int(batch_id)],
                    "batch_text": [batch_text],
                    "n_turns": [len(sorted_idx)],
                    "min_turn": [min(sorted_idx)],
                    "max_turn": [max(sorted_idx)],
                }
            )
        else:
            state.update((turn_idxs, texts, saw_last))
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "batch_id": pd.Series([], dtype="int64"),
                    "batch_text": pd.Series([], dtype="object"),
                    "n_turns": pd.Series([], dtype="int32"),
                    "min_turn": pd.Series([], dtype="int32"),
                    "max_turn": pd.Series([], dtype="int32"),
                }
            )

    return assemble


def streaming_batches(stream_df, batch_size: int):
    """turns stream (conv_id, turn_idx, text, is_last) -> completed
    batches stream. Caller picks source/sink."""
    from pyspark.sql import functions as F

    keyed = stream_df.withColumn(
        "batch_id", (F.col("turn_idx") / batch_size).cast("long")
    )
    return keyed.groupBy("conv_id", "batch_id").applyInPandasWithState(
        make_batch_assembler(batch_size),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
