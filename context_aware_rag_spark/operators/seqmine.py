"""Sequential-pattern mining over ordered event / tool-call streams.

Agent transcripts are SEQUENCES — each conversation is an ordered
stream of turns with tool invocations (the reference's transcripts
carry a ``tool`` column; BASELINE input_hint pins (conv_id, turn_idx,
role, text, tool, ts)). The behavioural signals a KG-construction
pipeline wants from that stream are (a) which contiguous tool/event
chains recur across conversations (frequent n-gram patterns — the
GSP/PrefixSpan support semantics restricted to contiguous windows,
which is what tool-call chains actually are), and (b) the first-order
transition structure (the Markov matrix of what follows what — the
edge weights of a behavioural KG).

Determinism discipline: sequence order is pinned by an explicit
ORDER-COLUMN LIST (ties in a timestamp alone would make lead()
nondeterministic — callers pass a tie-breaking id as the second
column); transition probabilities are integer trunc-ppm
(``n_obs * 1e6 div from_total``), so any partitioning and the DuckDB
twin agree exactly.

100 TB shape: both operators are ONE per-group window (a single
group-keyed Exchange; within-group sort is per-conversation, bounded
by conversation length) + ONE map-side-combined aggregation over
gram/transition keys. No self-joins, no explode beyond the n-gram
lead chain (n-1 lead columns, narrow), no driver actions. Hot event
types concentrate in the AGG keys (map-side combine absorbs them);
the window key is the conversation/user id, which is naturally
high-cardinality — the good kind of key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x1f"


def _seq_window(group: str, order_by: Sequence[str]):
    if not order_by:
        raise ValueError("sequence_ngrams: need at least one order column")
    return Window.partitionBy(group).orderBy(*order_by)


def sequence_ngrams(
    events: DataFrame,
    group: str = "user_id",
    order_by: Sequence[str] = ("ts", "event_id"),
    token: str = "event_type",
    n: int = 3,
    min_groups: int = 2,
) -> DataFrame:
    """Frequent contiguous token n-grams across sequences:
    (gram, n_groups, n_occurrences), gram = SEP-joined tokens,
    n_groups = how many distinct sequences contain it (the classic
    sequential-pattern SUPPORT), n_occurrences = total count; rows
    with support < ``min_groups`` are cut.

    A gram never crosses a group boundary (lead() is per-window), and
    sequences shorter than ``n`` simply emit nothing.
    """
    if n < 1:
        raise ValueError(f"sequence_ngrams: need n >= 1, got {n}")
    if min_groups < 1:
        raise ValueError(
            f"sequence_ngrams: need min_groups >= 1, got {min_groups}"
        )
    w = _seq_window(group, order_by)
    tok = F.col(token).cast("string")
    parts = [tok] + [F.lead(tok, i).over(w) for i in range(1, n)]
    grams = events.select(
        F.col(group).alias("_g"),
        F.concat_ws(SEP, *parts).alias("gram"),
        # concat_ws silently skips NULLs — detect truncated tail grams
        # by the part count instead of the NULL they swallowed
        sum(
            (p.isNotNull().cast("int") for p in parts), F.lit(0)
        ).alias("_np"),
    ).filter(F.col("_np") == n)
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("_g").alias("n_groups"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_groups") >= min_groups)
    )


def markov_transitions(
    events: DataFrame,
    group: str = "user_id",
    order_by: Sequence[str] = ("ts", "event_id"),
    token: str = "event_type",
) -> DataFrame:
    """First-order transition matrix over within-sequence consecutive
    token pairs: (from_token, to_token, n_obs, from_total, p_ppm) with
    p_ppm = n_obs * 1e6 div from_total — the behavioural-KG edge
    weights of "what tool/event follows what". Terminal occurrences
    (last token of a sequence) contribute to no transition, so
    from_total sums transitions OUT of from_token, not its raw
    frequency.
    """
    w = _seq_window(group, order_by)
    tok = F.col(token).cast("string")
    pairs = (
        events.select(
            tok.alias("from_token"),
            F.lead(tok, 1).over(w).alias("to_token"),
        )
        .filter(F.col("to_token").isNotNull())
        .groupBy("from_token", "to_token")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    totals = pairs.groupBy("from_token").agg(
        F.sum("n_obs").alias("from_total")
    )
    return pairs.join(totals, "from_token").select(
        "from_token",
        "to_token",
        "n_obs",
        "from_total",
        F.expr("n_obs * 1000000 div from_total").alias("p_ppm"),
    )


def eventually_follows(
    events: DataFrame,
    group: str = "user_id",
    order_by: Sequence[str] = ("ts", "event_id"),
    token: str = "event_type",
    max_distance: int = 10,
    min_groups: int = 1,
) -> DataFrame:
    """Eventually-follows matrix (the process-mining EF relation, van
    der Aalst 2016 §6): (from_token, to_token, n_groups) where
    n_groups counts sequences containing ``from`` at SOME position
    strictly before ``to`` within ``max_distance`` steps — the
    transitive behavioural signal :func:`markov_transitions`'
    directly-follows counts miss (A -> X -> B never shows an A->B
    direct transition).

    Each sequence contributes AT MOST ONE count per (from, to) pair
    (the standard per-case support), so hot chains cannot inflate the
    relation. ``max_distance`` bounds the per-sequence pair fan-out
    at L * d (None would be the quadratic L^2 — allowed but the
    caller owns it, documented not defaulted).

    100 TB shape: one group-keyed window assigns positions, one
    position-banded self-join per group (fan-out <= max_distance per
    row), one distinct + one map-side-combined count.
    """
    if max_distance is not None and max_distance < 1:
        raise ValueError(f"need max_distance >= 1, got {max_distance}")
    if min_groups < 1:
        raise ValueError(f"need min_groups >= 1, got {min_groups}")
    w = _seq_window(group, order_by)
    pos = events.select(
        F.col(group).alias("_g"),
        F.col(token).cast("string").alias("tok"),
        F.row_number().over(w).alias("pos"),
    ).localCheckpoint()  # self-joined
    a, b = pos.alias("a"), pos.alias("b")
    cond = (F.col("a._g") == F.col("b._g")) & (
        F.col("a.pos") < F.col("b.pos")
    )
    if max_distance is not None:
        cond = cond & (
            F.col("b.pos") - F.col("a.pos") <= max_distance
        )
    return (
        a.join(b, cond)
        .select(
            F.col("a._g").alias("_g"),
            F.col("a.tok").alias("from_token"),
            F.col("b.tok").alias("to_token"),
        )
        .dropDuplicates()
        .groupBy("from_token", "to_token")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .filter(F.col("n_groups") >= min_groups)
    )
