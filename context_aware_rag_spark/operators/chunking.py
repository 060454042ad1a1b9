"""Stage 1 — turn-window chunking: transcripts -> chunks.

Reference semantics: per-batch document list (``doc_i // batch_size``,
ctx_rag_batcher.py:53-74), drop ``"."`` docs (base.py:319-325), split
each doc with RecursiveCharacterTextSplitter(500, 10) (base.py:153-161),
stable chunk ordering by chunkIdx (base.py:370-374).

Spark shape (scale-first):

- ``batch_size == 1`` (the reference's graph-ingestion default,
  globals.py:16): every turn chunks independently → ``mapInPandas``,
  ZERO shuffle; chunking is embarrassingly parallel and the plan is a
  single scan→project stage whatever the corpus size.
- ``batch_size > 1``: membership is a pure function of ``turn_idx``, so
  we shuffle once on ``(conv_id, batch_id)`` — bounded group size (≤
  batch_size turns), so long conversations do NOT create long
  partitions here; skew from huge convs is structurally impossible.

Output columns keep the full ordering key ``(conv_id, batch_id,
turn_idx, split_pos)``; downstream linking (stage 2) derives position /
offsets with a per-conv window.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.splitter import split_text
from ..functions import hashing

CHUNK_COLUMNS = [
    "conv_id", "batch_id", "turn_idx", "split_pos", "text", "length", "ts",
]
_CHUNK_SCHEMA = (
    "conv_id string, batch_id long, turn_idx int, split_pos int, "
    "text string, length int, ts timestamp"
)


def _split_batch(
    pdf: pd.DataFrame, chunk_size: int, chunk_overlap: int,
    timestamp_prefix: bool = False,
) -> pd.DataFrame:
    """Pure per-group transform: sorted turns of one batch -> chunk rows.

    The C2 timestamp prefix is rendered HERE in Python (f"{x:.2f}",
    round-half-even on the binary value — the reference's formatting,
    utils.py:86-95) rather than with Spark's format_string, whose Java
    Formatter rounds HALF_UP on the decimal representation: 0.125
    formats as "0.13" in Java but "0.12" in Python, which would flip
    sha1 chunk ids on fractional timestamps. The '.'-doc check runs
    before prefixing — the transcripts contract treats "." as an
    empty-doc marker regardless of prefix mode (documented divergence
    from the reference's file path, which prefixes first; mirrored in
    oracle/reference_oracle.py so parity is checked like-for-like).
    """
    pdf = pdf.sort_values("turn_idx")
    out: dict[str, List] = {k: [] for k in CHUNK_COLUMNS}
    for row in pdf.itertuples(index=False):
        if row.text == "." or row.text is None:
            continue
        text = row.text
        if timestamp_prefix:
            epoch = row.ts.timestamp()
            text = f"<{epoch:.2f}> <{epoch:.2f}> {text}"
        for pos, piece in enumerate(split_text(text, chunk_size, chunk_overlap)):
            out["conv_id"].append(row.conv_id)
            out["batch_id"].append(row.batch_id)
            out["turn_idx"].append(row.turn_idx)
            out["split_pos"].append(pos)
            out["text"].append(piece)
            out["length"].append(len(piece))
            out["ts"].append(row.ts)
    df = pd.DataFrame(out)
    if df.empty:
        # a batch whose docs were ALL dropped ("." bait) yields empty
        # lists; pandas defaults empty columns to float64 and Arrow
        # refuses the double->timestamp cast back to Spark
        df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def chunk_transcripts(transcripts: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig()
    # C2 — "<start> <end> " prefixing (graph_ingestion.py:155-164) is
    # rendered inside _split_batch (Python f-string — see its docstring
    # for the Java-vs-Python rounding parity hazard). The transcripts
    # contract carries one ts per turn, used for both bounds; applied
    # before splitting so it participates in chunk ids exactly as in
    # the reference.
    df = transcripts.withColumn(
        "batch_id", (F.col("turn_idx") / cfg.batch_size).cast("long")
    ).select("conv_id", "batch_id", "turn_idx", "text", "ts")

    if cfg.batch_size == 1:
        # No shuffle: each row expands independently.
        def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                pdf = pdf.sort_values("turn_idx")
                texts = pdf["text"]
                # vectorized fast path: for text with len <= chunk_size
                # the recursive splitter provably returns [text.strip()]
                # (or [] when whitespace-only) — all splits merge back
                # into one chunk, validated against split_text on 20k
                # randomized <=500-char inputs. Batches containing any
                # long text (or prefix mode, which changes lengths)
                # take the exact per-row loop.
                if cfg.timestamp_prefix or bool(
                    (texts.fillna("").str.len() > cfg.chunk_size).any()
                ):
                    yield _split_batch(
                        pdf, cfg.chunk_size, cfg.chunk_overlap,
                        timestamp_prefix=cfg.timestamp_prefix,
                    )
                    continue
                keep = texts.notna() & (texts != ".")
                sub = pdf[keep]
                piece = sub["text"].str.strip()
                ok = piece != ""
                sub, piece = sub[ok], piece[ok]
                out = pd.DataFrame(
                    {
                        "conv_id": sub["conv_id"].to_numpy(),
                        "batch_id": sub["batch_id"].to_numpy(),
                        "turn_idx": sub["turn_idx"].to_numpy(),
                        "split_pos": np.zeros(len(sub), dtype="int32"),
                        "text": piece.to_numpy(),
                        "length": piece.str.len().to_numpy().astype("int32"),
                        "ts": sub["ts"].to_numpy(),
                    }
                )
                if out.empty:
                    out["ts"] = out["ts"].astype("datetime64[us]")
                yield out

        chunks = df.mapInPandas(expand, schema=_CHUNK_SCHEMA)
    else:
        chunks = df.groupBy("conv_id", "batch_id").applyInPandas(
            lambda pdf: _split_batch(
                pdf, cfg.chunk_size, cfg.chunk_overlap,
                timestamp_prefix=cfg.timestamp_prefix,
            ),
            schema=_CHUNK_SCHEMA,
        )

    # chunk id = sha1(chunk_text + conv_id) — base.py:381-387, JVM-side.
    return chunks.withColumn(
        "chunk_id", hashing.chunk_id_col(F.col("text"), F.col("conv_id"))
    )


def chunk_transcripts_topic(
    transcripts: DataFrame, cfg: "PipelineConfig | None" = None
) -> DataFrame:
    """Topic-chunking front-end for the pipeline (cfg.chunking =
    "topic"): TextTiling segments become the chunk rows, under the
    SAME stage contract as chunk_transcripts — `_CHUNK_SCHEMA` +
    chunk_id — so every downstream stage (extraction, linking,
    materialize) is untouched. Mapping: batch_id = seg_idx (the
    ingestion batch IS the topic), turn_idx = the segment's first
    turn, split_pos = 0 (one chunk per segment — the content decides
    the boundary, not a character budget), ts = the first turn's
    timestamp. Ordering contract (conv_id, batch_id, turn_idx,
    split_pos) stays monotone in conversation order because seg_idx
    is. One conv-keyed Exchange end-to-end (segmentation plan), vs
    the splitter's zero — the price of content-awareness.
    """
    from .segmentation import texttiling_segments

    cfg = cfg or PipelineConfig()
    seg = texttiling_segments(
        transcripts,
        block_turns=cfg.texttiling_block_turns,
        depth_window=cfg.texttiling_depth_window,
        cutoff_ppm=cfg.texttiling_cutoff_ppm,
    )
    chunks = (
        seg.groupBy("conv_id", F.col("seg_idx").cast("long").alias("batch_id"))
        .agg(
            F.min("turn_idx").cast("int").alias("turn_idx"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("turn_idx").alias("_o"),
                                F.col("text").alias("_t"),
                            )
                        )
                    ),
                    lambda s: s["_t"],
                ),
            ).alias("text"),
            F.min_by("ts", "turn_idx").alias("ts"),
        )
        .withColumn("split_pos", F.lit(0).cast("int"))
        .withColumn("length", F.length("text").cast("int"))
        .select(
            "conv_id", "batch_id", "turn_idx", "split_pos",
            "text", "length", "ts",
        )
    )
    return chunks.withColumn(
        "chunk_id", hashing.chunk_id_col(F.col("text"), F.col("conv_id"))
    )
