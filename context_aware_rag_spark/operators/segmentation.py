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
    return (
        _gap_scored(
            turns, group_col, order_col, text_col,
            block_turns, depth_window, cutoff_ppm,
        )
        .filter(F.col("__tt_has_next"))
        .select(
            F.col(group_col).alias("conv_id"),
            F.col(order_col).alias("gap_after"),
            F.col("__tt_score").alias("score_ppm"),
            F.col("__tt_depth").alias("depth_ppm"),
            F.col("__tt_boundary").alias("is_boundary"),
        )
    )


def _gap_scored(
    turns: DataFrame,
    group_col: str,
    order_col: str,
    text_col: str,
    block_turns: int,
    depth_window: int,
    cutoff_ppm: int,
) -> DataFrame:
    """Append gap scores to the FULL-WIDTH turn frame: __tt_score /
    __tt_depth / __tt_boundary / __tt_has_next per turn (the gap AFTER
    that turn). The conversation's last turn has no gap — it stays as
    one trailing NULL-score position, which the positional min/max
    peak windows skip, so the scored sequence is positionally
    identical to the gaps-only view. Keeping every turn row is what
    lets texttiling_segments run join-free on ONE conv-keyed
    Exchange.
    """
    if block_turns < 1:
        raise ValueError(f"need block_turns >= 1: {block_turns}")
    if depth_window < 1:
        raise ValueError(f"need depth_window >= 1: {depth_window}")
    if not (0 <= cutoff_ppm <= 2_000_000):
        raise ValueError(f"need 0 <= cutoff_ppm <= 2e6: {cutoff_ppm}")

    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    toks = turns.withColumn(
        "__tt_toks",
        F.array_remove(
            F.array_distinct(
                F.split(normalized_text(F.col(text_col)), " ")
            ),
            "",
        ),
    )
    left = F.array_distinct(
        F.flatten(
            F.collect_list("__tt_toks").over(
                w.rowsBetween(-(block_turns - 1), 0)
            )
        )
    )
    right = F.array_distinct(
        F.flatten(
            F.collect_list("__tt_toks").over(w.rowsBetween(1, block_turns))
        )
    )
    scored = (
        toks.withColumn("__tt_l", left)
        .withColumn("__tt_r", right)
        .withColumn(
            "__tt_has_next",
            F.lead(order_col).over(w).isNotNull(),
        )
        # the intersection is projected ONCE: CollapseProject does not
        # inline a non-cheap expression referenced twice, so the score
        # below computes array_intersect half as often as the previous
        # duplicated-subexpression form (array functions are
        # CodegenFallback — no codegen CSE to catch it); identical
        # arithmetic (measured ~7% off the operator wall at the 100x
        # corpus in an interleaved A/B)
        .withColumn(
            "__tt_inter",
            F.size(F.array_intersect(F.col("__tt_l"), F.col("__tt_r"))),
        )
        .withColumn(
            "__tt_score",
            F.when(
                F.col("__tt_has_next")
                & ((F.size("__tt_l") + F.size("__tt_r")) > 0),
                F.expr(
                    "(__tt_inter * 1000000) div "
                    "(size(__tt_l) + size(__tt_r) - __tt_inter)"
                ),
            ),
        )
        .drop("__tt_toks", "__tt_l", "__tt_r", "__tt_inter")
    )
    lpeak = F.max("__tt_score").over(w.rowsBetween(-depth_window, 0))
    rpeak = F.max("__tt_score").over(w.rowsBetween(0, depth_window))
    prev_min = F.min("__tt_score").over(w.rowsBetween(-depth_window, -1))
    next_min = F.min("__tt_score").over(w.rowsBetween(1, depth_window))
    is_floor = (
        F.coalesce(F.col("__tt_score") < prev_min, F.lit(True))
        & F.coalesce(F.col("__tt_score") <= next_min, F.lit(True))
    )
    return scored.withColumn(
        "__tt_depth",
        lpeak + rpeak - 2 * F.col("__tt_score"),
    ).withColumn(
        "__tt_boundary",
        F.coalesce(
            (F.col("__tt_depth") >= F.lit(cutoff_ppm)) & is_floor,
            F.lit(False),
        ),
    )


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
    turn i puts turn i+1 in the next segment). Join-free: the gap
    scorer keeps the full-width turn frame, so the running boundary
    sum is one more window on the SAME conv-keyed Exchange — the
    whole operator is a single shuffle (plan-asserted in tests).
    """
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    scored = _gap_scored(
        turns, group_col, order_col, text_col,
        block_turns, depth_window, cutoff_ppm,
    )
    seg = F.sum(
        F.col("__tt_boundary").cast("long")
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    return scored.withColumn(
        "seg_idx", F.coalesce(seg, F.lit(0)).cast("int")
    ).drop(
        "__tt_has_next", "__tt_score", "__tt_depth", "__tt_boundary"
    )


def topic_chunks(
    turns: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    block_turns: int = 3,
    depth_window: int = 2,
    cutoff_ppm: int = 500_000,
) -> DataFrame:
    """Assemble topic segments into KG-ingestion chunks: one row per
    (conversation, topic segment) with the segment's turn texts joined
    in turn order — the content-aware alternative to the reference's
    character-count splitter, sharing its chunk-id rule
    (``sha1(chunk_text + conv_id)``, base.py:381-387) so topic chunks
    drop into the same downstream tables.

    Output: (group_col, seg_idx, chunk_id, chunk_text, n_turns,
    first_turn, last_turn). NULL turn texts contribute nothing to
    chunk_text (concat_ws semantics, mirrored by the twin) but still
    count in n_turns — the turn belongs to the segment even when its
    text is empty.

    100 TB shape: texttiling_segments' single conv-keyed Exchange also
    serves the (group, seg) groupBy — hash(conv) co-locates every
    segment of a conversation, so Catalyst plans the aggregate without
    a second shuffle (plan-asserted in tests). Chunk text size is
    bounded by segment length; a degenerate no-boundary conversation
    yields ONE chunk of the whole conversation — the cutoff knob, not
    the engine, owns that trade-off.
    """
    seg = texttiling_segments(
        turns, group_col, order_col, text_col,
        block_turns, depth_window, cutoff_ppm,
    )
    out = (
        seg.groupBy(group_col, "seg_idx")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("_o"),
                                F.col(text_col).alias("_t"),
                            )
                        )
                    ),
                    lambda s: s["_t"],
                ),
            ).alias("chunk_text"),
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.min(order_col).alias("first_turn"),
            F.max(order_col).alias("last_turn"),
        )
    )
    return out.select(
        group_col,
        "seg_idx",
        F.sha1(
            F.concat(F.col("chunk_text"), F.col(group_col))
        ).alias("chunk_id"),
        "chunk_text",
        "n_turns",
        "first_turn",
        "last_turn",
    )
