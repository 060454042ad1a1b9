"""Stage 2 — mention / triple extraction: chunks -> triples_raw + mentions.

The extraction core is the engine's only unavoidable Python hot path
(reference: LLMGraphTransformer per chunk, base.py:208-262). It runs as
``mapInPandas`` — Arrow-batched, one extractor call per chunk text, no
per-row Python UDF — followed by pure-DataFrame cleaning (validity
filter + backtick strip, base.py:112-151) and JVM-side sha1 identity
(base.py:182-197).

At 100 TB the stage is embarrassingly parallel: no shuffle is introduced
(extraction preserves the scan partitioning); Catalyst prunes the chunk
table scan to (conv_id, chunk_id, text).
"""

from __future__ import annotations

from typing import Callable, Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions import hashing
from ..functions.extractor import (
    RawTriple,
    llm_json_extract,
    null_extract,
    rule_based_extract,
)

_RAW_SCHEMA = (
    "conv_id string, chunk_id string, subj_name string, subj_type string, "
    "pred string, obj_name string, obj_type string"
)

EXTRACTORS: dict[str, Callable[[str], List[RawTriple]]] = {
    "rule_based": rule_based_extract,
    "null": null_extract,
    # the reference's LLM path: parse (and repair) a JSON graph response
    "json_llm": llm_json_extract,
}


def extract_triples_raw(chunks: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """chunks(conv_id, chunk_id, text, ...) -> uncleaned triple rows."""
    cfg = cfg or PipelineConfig()
    extract = EXTRACTORS[cfg.extractor]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, List] = {
                k: []
                for k in (
                    "conv_id", "chunk_id", "subj_name", "subj_type",
                    "pred", "obj_name", "obj_type",
                )
            }
            for conv_id, chunk_id, text in zip(
                pdf["conv_id"], pdf["chunk_id"], pdf["text"]
            ):
                for t in extract(text or ""):
                    out["conv_id"].append(conv_id)
                    out["chunk_id"].append(chunk_id)
                    out["subj_name"].append(t.head)
                    out["subj_type"].append(t.head_type)
                    out["pred"].append(t.relation)
                    out["obj_name"].append(t.tail)
                    out["obj_type"].append(t.tail_type)
            yield pd.DataFrame(out)

    return chunks.select("conv_id", "chunk_id", "text").mapInPandas(
        run, schema=_RAW_SCHEMA
    )


def clean_triples(raw: DataFrame, allowed_nodes: list[str] | None = None) -> DataFrame:
    """Validity filter + backtick strip (base.py:112-151), JVM-side.

    ``allowed_nodes``: when given (description mode — base.py:74-87),
    both endpoint types must be in the allow-list.
    """
    nonblank = (
        (F.trim("pred") != "")
        & (F.trim("subj_name") != "")
        & (F.trim("subj_type") != "")
        & (F.trim("obj_name") != "")
        & (F.trim("obj_type") != "")
    )
    from ..functions.text import strip_backticks

    out = (
        raw.filter(nonblank)
        .withColumn("subj_type", strip_backticks(F.col("subj_type")))
        .withColumn("obj_type", strip_backticks(F.col("obj_type")))
        .withColumn("pred", strip_backticks(F.col("pred")))
    )
    if allowed_nodes:
        out = out.filter(
            F.col("subj_type").isin(*allowed_nodes)
            & F.col("obj_type").isin(*allowed_nodes)
        )
    return out


def hash_triples(cleaned: DataFrame) -> DataFrame:
    """Attach reference-parity entity ids (base.py:182-197)."""
    return cleaned.withColumn(
        "subj_id",
        hashing.entity_id_col(F.col("subj_name"), F.col("subj_type"), F.col("conv_id")),
    ).withColumn(
        "obj_id",
        hashing.entity_id_col(F.col("obj_name"), F.col("obj_type"), F.col("conv_id")),
    )


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Distinct (chunk, node) mention rows from triple endpoints.

    ``unionByName`` of the two endpoint projections + dropDuplicates —
    the MERGE set-semantics of the reference sink (neo4j_db.py:596-608).
    """
    subj = triples.select(
        "conv_id", "chunk_id",
        F.col("subj_id").alias("node_id"), F.col("subj_name").alias("name"),
        F.col("subj_type").alias("type"),
    )
    obj = triples.select(
        "conv_id", "chunk_id",
        F.col("obj_id").alias("node_id"), F.col("obj_name").alias("name"),
        F.col("obj_type").alias("type"),
    )
    return subj.unionByName(obj).dropDuplicates(["conv_id", "chunk_id", "node_id"])


def extract_stage(chunks: DataFrame, cfg: PipelineConfig | None = None):
    """Full stage-2: returns (triples, mentions)."""
    cfg = cfg or PipelineConfig()
    allowed = cfg.allowed_nodes if cfg.enforce_allowed_nodes else None
    triples = hash_triples(
        clean_triples(extract_triples_raw(chunks, cfg), allowed_nodes=allowed)
    )
    return triples, mentions_from_triples(triples)
