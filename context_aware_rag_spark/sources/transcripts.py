"""Transcripts source: schema, readers, and a deterministic generator.

Input contract (BASELINE.json input_hint): an Iceberg table of
multi-turn conversation / agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``.

This sandbox image has no Iceberg runtime jar, so :func:`read_transcripts`
prefers the Iceberg catalog path and falls back to parquet — the engine
code is format-agnostic (pure DataFrame in, DataFrame out).

The generator is seed-per-row deterministic (sha1-derived seeds, never
Python's salted ``hash``), so the SAME corpus materializes regardless of
partitioning, ordering, executor count, or generation path (pure-Python
rows for unit tests vs distributed ``spark.range → applyInPandas`` for
benchmarks). Skew is generated on purpose: Zipf-weighted entity aliases
(hot keys) and a small fraction of 50×-longer conversations (long
partitions) — exercising the salting paths (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extractor import ENTITY_GROUPS, RELATION_KEYWORDS

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

# Flattened alias list with Zipf-ish weights: group rank r gets weight 1/r,
# spread over its aliases — a few hot entities dominate, as FIXTURES.md asks.
_GROUP_KEYS = list(ENTITY_GROUPS.keys())
_ALIASES: List[Tuple[str, str]] = []  # (alias, type)
_WEIGHTS: List[float] = []
for _r, _k in enumerate(_GROUP_KEYS, start=1):
    _etype, _forms = ENTITY_GROUPS[_k]
    for _a in _forms:
        _ALIASES.append((_a, _etype))
        _WEIGHTS.append(1.0 / (_r * len(_forms)))
_WEIGHTS_NP = np.array(_WEIGHTS) / np.sum(_WEIGHTS)
_REL_SURFACES = list(RELATION_KEYWORDS.keys())

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "calculator", "browser", None]


def _rng(conv_i: int, turn_idx: int, salt: str = "") -> np.random.Generator:
    digest = hashlib.sha1(f"42:{conv_i}:{turn_idx}:{salt}".encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "big"))


def conv_length(conv_i: int) -> int:
    """8–64 turns normally; every 40th conversation is ~50× longer."""
    rng = _rng(conv_i, -1, "len")
    base = int(rng.integers(8, 65))
    if conv_i % 40 == 7:
        return base * 50
    return base


def turn_text(conv_i: int, turn_idx: int) -> str:
    """Deterministic turn content over the closed vocabulary."""
    rng = _rng(conv_i, turn_idx)
    r = rng.random()
    if r < 0.02:
        return "."  # empty-doc bait (dropped by F1, base.py:319-325)
    n_sent = int(rng.integers(1, 5))
    if r > 0.97:
        n_sent = int(rng.integers(12, 25))  # long turn → multi-chunk split
    sentences = []
    for s in range(n_sent):
        i1, i2 = rng.choice(len(_ALIASES), size=2, replace=False, p=_WEIGHTS_NP)
        a1, _ = _ALIASES[i1]
        a2, _ = _ALIASES[i2]
        rel = _REL_SURFACES[int(rng.integers(0, len(_REL_SURFACES)))]
        extra = ""
        rr = rng.random()
        if rr < 0.01:
            extra = " ~blank~"
        elif rr < 0.03:
            extra = " ~glitch~"
        sentences.append(f"{a1} {rel} {a2}{extra}.")
    sep = "\n" if rng.random() < 0.5 else " "
    text = sep.join(sentences)
    if rng.random() < 0.03:
        text = f"<think>internal {conv_i}-{turn_idx} deliberation</think>" + text
    if rng.random() < 0.02:
        text = sentences[0] + "\n\n" + text
    return text


def turn_row(conv_i: int, turn_idx: int) -> Tuple[str, int, str, str, str, datetime]:
    rng = _rng(conv_i, turn_idx, "meta")
    role = _ROLES[turn_idx % 2] if rng.random() < 0.9 else _ROLES[int(rng.integers(0, 4))]
    tool = _TOOLS[int(rng.integers(0, 4))] if role == "tool" else None
    # day wraps at 100 years: a conv_i-days offset unbounded would pass
    # pandas' datetime64[ns] ceiling (year 2262) beyond ~86k convs and
    # crash every Arrow conversion — real transcripts span years, not
    # centuries. Identity for conv_i < 36500, so every correctness-scale
    # corpus (and its hashed ids) is unchanged.
    ts = _EPOCH + timedelta(seconds=(conv_i % 36500) * 86400 + turn_idx * 7)
    return (
        f"conv{conv_i:05d}",
        turn_idx,
        role,
        turn_text(conv_i, turn_idx),
        tool,
        ts,
    )


def generate_rows(n_convs: int) -> List[Tuple]:
    """Driver-side generation for unit-test scale."""
    rows = []
    for c in range(n_convs):
        for t in range(conv_length(c)):
            rows.append(turn_row(c, t))
    return rows


def generate_transcripts(
    spark: SparkSession, n_convs: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation: one task per conv-range slice.

    Uses ``spark.range`` over conv ids + ``mapInPandas`` expansion, so a
    10^12-turn corpus never touches the driver.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
            for conv_i in pdf["id"]:
                conv_i = int(conv_i)
                for t in range(conv_length(conv_i)):
                    row = turn_row(conv_i, t)
                    for k, v in zip(out.keys(), row):
                        out[k].append(v)
            ts = pd.Series(out.pop("ts"), dtype="datetime64[us, UTC]")
            yield pd.DataFrame(out).assign(ts=ts)

    return (
        spark.range(0, n_convs, 1, partitions)
        .mapInPandas(expand, schema=TRANSCRIPT_SCHEMA)
    )


def read_transcripts(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the transcripts table: Iceberg table name or parquet path.

    On a production cluster this is ``spark.read.format("iceberg")
    .load(table)`` — partition pruning on conv_id buckets and snapshot
    isolation come from the table format. The sandbox image lacks the
    Iceberg jar, so dotted names without a filesystem path fall back to
    ``spark.table`` and paths to parquet.
    """
    looks_like_path = "/" in path_or_table or path_or_table.endswith(".parquet")
    if not looks_like_path:
        try:
            return spark.read.format("iceberg").load(path_or_table)
        except Exception as iceberg_exc:
            # fall back to a registered table only when the Iceberg
            # DATA SOURCE itself is unavailable (no jar in this image);
            # a real catalog/auth failure must surface, not silently
            # resolve to some other table with the same name
            msg = str(iceberg_exc)
            source_missing = (
                "DATA_SOURCE_NOT_FOUND" in msg
                or "ClassNotFound" in msg
                or "Failed to find" in msg
            )
            if not source_missing:
                raise
            try:
                return spark.table(path_or_table)
            except Exception as table_exc:
                raise RuntimeError(
                    f"could not read {path_or_table!r} as an Iceberg table "
                    f"({msg[:200]}) nor as a registered table"
                ) from table_exc
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path_or_table)


def _schema_with_corrupt(corrupt_col: str) -> T.StructType:
    fields = [
        # nullable: a PERMISSIVE reader nulls fields on malformed rows
        T.StructField(f.name, f.dataType, True)
        for f in TRANSCRIPT_SCHEMA.fields
    ]
    return T.StructType(fields + [T.StructField(corrupt_col, T.StringType(), True)])


def read_transcripts_jsonl(
    spark: SparkSession,
    path: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines transcript feed (the common chat/agent-log export
    format) under the EXPLICIT transcript schema — never inference: an
    inference pass is a second full read at 100 TB and silently
    type-drifts between drops (one feed where every `turn_idx` happens
    to be quoted would flip the column to string corpus-wide).

    ``mode="PERMISSIVE"`` (default) quarantines malformed lines into
    ``corrupt_col`` instead of dropping them — split with
    :func:`split_corrupt` and route the bad side to a quarantine sink
    (silently-dropped input is the unrecoverable failure mode of a
    10^12-turn ingest). ``mode="FAILFAST"`` is the ingest-gate variant.
    Timestamps parse as ISO-8601 (Spark's JSON default).
    """
    return (
        spark.read.schema(_schema_with_corrupt(corrupt_col))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_transcripts_csv(
    spark: SparkSession,
    path: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    sep: str = ",",
) -> DataFrame:
    """CSV transcript feed under the explicit schema — same
    no-inference / quarantine contract as :func:`read_transcripts_jsonl`.
    Quoted multi-line text fields are handled (``multiLine``), headers
    are required and validated against the schema by position."""
    return (
        spark.read.schema(_schema_with_corrupt(corrupt_col))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")
        .csv(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> Tuple[DataFrame, DataFrame]:
    """(good, quarantine) split of a PERMISSIVE read. ``good`` carries
    exactly the transcript schema columns; ``quarantine`` carries the
    raw offending line for replay after a parser fix.

    The parsed frame is pinned (``localCheckpoint``) before splitting:
    Spark refuses plans that read ONLY the internal corrupt-record
    column from a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and its documented remedy is to persist the parsed result — which
    also guarantees both branches see the same parse. At ingest scale
    the same contract holds macroscopically: write the parsed batch to
    a staging table and split from that scan, never from two
    independent re-reads of the raw feed.
    """
    df = df.localCheckpoint()
    good = df.filter(F.col(corrupt_col).isNull()).select(
        *[f.name for f in TRANSCRIPT_SCHEMA.fields]
    )
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, bad
