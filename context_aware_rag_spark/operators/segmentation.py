"""Topic segmentation of multi-turn transcripts (TextTiling).

Hearst's TextTiling (CL 1997, block-comparison variant) applied at the
TURN grain of the reference's ingestion payload: a lexical-cohesion
score at every inter-turn gap, a depth score against the surrounding
cohesion peaks, and a boundary flag where the depth clears a cutoff.
Topic boundaries are the principled chunking unit for KG ingestion —
the reference chunks by character count (graph_ingestion.py:68-69);
this gives the engine a content-aware alternative whose segments never
split a topically coherent span.

Determinism discipline: token sets reuse dedup.normalized_text (the
Unicode-aware Java-regex normalizer the twin replicates char-for-char),
cohesion is integer trunc-ppm Jaccard over DISTINCT token sets, and the
depth windows are positional (rowsBetween over the gap sequence), so
the pure-Python twin matches bit-for-bit — no floats anywhere.

100 TB shape: everything is one conversation-keyed Exchange — the
block-assembly window, the gap filter, and the depth window all share
the same partitioning+ordering, so Catalyst plans a single sort-based
window chain per conversation; the only wide op is that one shuffle.
Per-row cost is bounded by k turns of tokens (array_distinct of a
flattened k-window), never the conversation length, so the planted
50×-long conversations cost 50× rows, not 50² work. No driver actions,
no Python UDFs (split/filter/flatten/array_* are all codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text


def texttiling_gaps(
    turns: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    block_turns: int = 3,
    depth_window: int = 2,
    cutoff_ppm: int = 500_000,
) -> DataFrame:
    """Score every inter-turn gap of every conversation for topic
    cohesion and flag topic boundaries.

    For the gap after turn ``i`` (one row per turn that HAS a
    successor, keyed ``gap_after`` = that turn's ``order_col``):

    - ``score_ppm`` — trunc-ppm Jaccard between the distinct token set
      of the ``block_turns`` turns ending at ``i`` and that of the
      ``block_turns`` turns starting at ``i+1`` (clipped at the
      conversation edges); NULL when both blocks are token-free (an
      empty union is unscorable, never a fake 0).
    - ``depth_ppm`` — ``lpeak + rpeak - 2*score`` where lpeak/rpeak are
      the max score over the ``depth_window`` positionally preceding /
      following gaps (inclusive of the gap itself, Hearst's valley
      depth against both surrounding peaks); NULL when score is NULL.
    - ``is_boundary`` — ``depth_ppm >= cutoff_ppm`` AND the gap is the
      valley FLOOR: strictly below every scored gap in the
      ``depth_window`` before it and <= every one after (<=, so a flat
      valley floor flags exactly its first gap). Without the floor
      gate the slopes flanking a deep valley clear the depth cutoff
      too (their depth borrows the peak on one side) and a single
      topic shift emits a boundary run. False on NULL.

    Low score = little lexical overlap across the gap; a boundary needs
    the gap to be a deep VALLEY, not merely low (a uniformly low-cohesion
    region yields low depths everywhere — Hearst's key insight).
    """
    if block_turns < 1:
        raise ValueError(f"need block_turns >= 1: {block_turns}")
    if depth_window < 1:
        raise ValueError(f"need depth_window >= 1: {depth_window}")
    if not (0 <= cutoff_ppm <= 2_000_000):
        raise ValueError(f"need 0 <= cutoff_ppm <= 2e6: {cutoff_ppm}")

    toks = turns.select(
        F.col(group_col).alias("conv_id"),
        F.col(order_col).alias("gap_after"),
        F.array_remove(
            F.array_distinct(
                F.split(normalized_text(F.col(text_col)), " ")
            ),
            "",
        ).alias("_toks"),
    )
    w = Window.partitionBy("conv_id").orderBy(F.col("gap_after").asc())
    left = F.array_distinct(
        F.flatten(
            F.collect_list("_toks").over(
                w.rowsBetween(-(block_turns - 1), 0)
            )
        )
    )
    right = F.array_distinct(
        F.flatten(
            F.collect_list("_toks").over(w.rowsBetween(1, block_turns))
        )
    )
    gaps = (
        toks.select(
            "conv_id",
            "gap_after",
            left.alias("_l"),
            right.alias("_r"),
            F.lead("gap_after").over(w).alias("_next"),
        )
        .filter(F.col("_next").isNotNull())
        .withColumn(
            "score_ppm",
            F.when(
                (F.size("_l") + F.size("_r")) > 0,
                F.expr(
                    "(size(array_intersect(_l, _r)) * 1000000) div "
                    "(size(_l) + size(_r) - size(array_intersect(_l, _r)))"
                ),
            ),
        )
        .drop("_l", "_r", "_next")
    )
    gw = Window.partitionBy("conv_id").orderBy(F.col("gap_after").asc())
    lpeak = F.max("score_ppm").over(gw.rowsBetween(-depth_window, 0))
    rpeak = F.max("score_ppm").over(gw.rowsBetween(0, depth_window))
    prev_min = F.min("score_ppm").over(gw.rowsBetween(-depth_window, -1))
    next_min = F.min("score_ppm").over(gw.rowsBetween(1, depth_window))
    is_floor = (
        F.coalesce(F.col("score_ppm") < prev_min, F.lit(True))
        & F.coalesce(F.col("score_ppm") <= next_min, F.lit(True))
    )
    return gaps.select(
        "conv_id",
        "gap_after",
        "score_ppm",
        (lpeak + rpeak - 2 * F.col("score_ppm")).alias("depth_ppm"),
        is_floor.alias("_floor"),
    ).withColumn(
        "is_boundary",
        F.coalesce(
            (F.col("depth_ppm") >= F.lit(cutoff_ppm)) & F.col("_floor"),
            F.lit(False),
        ),
    ).drop("_floor")


def texttiling_segments(
    turns: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    block_turns: int = 3,
    depth_window: int = 2,
    cutoff_ppm: int = 500_000,
) -> DataFrame:
    """Assign every turn its topic-segment index: ``seg_idx`` = number
    of boundaries at strictly earlier gaps (0-based; a boundary after
    turn i puts turn i+1 in the next segment). Adds one window pass on
    the SAME conversation partitioning (running sum over the boundary
    flags joined back by (conv_id, order)).
    """
    gaps = texttiling_gaps(
        turns, group_col, order_col, text_col,
        block_turns, depth_window, cutoff_ppm,
    )
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    flagged = turns.join(
        gaps.select(
            F.col("conv_id").alias(group_col),
            F.col("gap_after").alias(order_col),
            F.col("is_boundary").cast("long").alias("_cut"),
        ),
        on=[group_col, order_col],
        how="left",
    )
    seg = (
        F.sum(F.coalesce(F.col("_cut"), F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    return flagged.withColumn(
        "seg_idx", F.coalesce(seg, F.lit(0)).cast("int")
    ).drop("_cut")
