"""Gazetteer mention detection: dictionary entity tagging at scale.

The reference's mention detection is LLM extraction (U1,
graph_extraction.py prompts); the symbolic counterpart every
production KG also runs is DICTIONARY tagging — match a curated entity
gazetteer (vendors, products, drugs, tickers) against the corpus and
emit typed mention spans that feed the same linking /canonicalization
stages. The naive spelling is per-entity LIKE scans (O(|docs| x
|entities|)); the scalable one is a single corpus pass with the
gazetteer compiled into a token trie.

Spark shape: the gazetteer is the provably-BOUNDED side (a curated
dictionary — guarded by ``max_entities``, the decontaminate
broadcast-side discipline): collected once, compiled to a token trie
on the driver, broadcast to executors. Tokenization happens JVM-side
(the shared ``dedup.normalized_text`` normal form + split), so the
Arrow-batched ``mapInPandas`` UDF does ONLY the trie walk — pure
index arithmetic per token, no string munging in Python, O(doc
tokens x max entity length) per doc, one corpus scan total.

Match policy: leftmost-longest non-overlapping (the standard
gazetteer convention). At each token the longest terminal trie path
wins; the scan resumes after the matched span; shorter or overlapping
later candidates inside a taken span are suppressed. Entities sharing
one surface form all fire on that span (emitted in entity_id order —
disambiguation is the downstream linker's job).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("start_tok", T.IntegerType()),
        T.StructField("end_tok", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("entity_id", T.StringType()),
    ]
)


def _build_trie(entries: "list[tuple[str, str]]") -> dict:
    """(entity_id, normalized name) -> token trie; terminal node key
    None holds the sorted entity-id list for that surface."""
    root: dict = {}
    for entity_id, name in entries:
        toks = name.split(" ")
        if not toks or toks == [""]:
            continue
        node = root
        for tk in toks:
            node = node.setdefault(tk, {})
        node.setdefault(None, []).append(entity_id)
    def _sort(node: dict) -> None:
        if None in node:
            node[None] = sorted(set(node[None]))
        for k, child in node.items():
            if k is not None:
                _sort(child)
    _sort(root)
    return root


def tag_mentions(
    docs: DataFrame,
    gazetteer: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    entity_id_col: str = "entity_id",
    name_col: str = "name",
    max_entities: int = 1_000_000,
) -> DataFrame:
    """Tag every leftmost-longest gazetteer mention:
    (id_col, start_tok, end_tok, surface, entity_id), token offsets
    into the normalized token sequence, end exclusive."""
    from .dedup import normalized_text

    entries = [
        (r["eid"], r["nm"])
        for r in gazetteer.select(
            F.col(entity_id_col).cast("string").alias("eid"),
            normalized_text(F.col(name_col)).alias("nm"),
        ).collect()
    ]
    if len(entries) > max_entities:
        raise ValueError(
            f"gazetteer has {len(entries)} entries > max_entities="
            f"{max_entities}: a dictionary this large should be blocked "
            "via the inverted-index join family instead of broadcast"
        )
    trie = _build_trie(entries)
    bc = docs.sparkSession.sparkContext.broadcast(trie)

    tokenized = docs.select(
        F.col(id_col).cast("string").alias("doc_key"),
        F.split(normalized_text(F.col(text_col)), " ").alias("toks"),
    )

    def scan(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        root = bc.value
        for pdf in batches:
            out = {
                "doc_key": [], "start_tok": [], "end_tok": [],
                "surface": [], "entity_id": [],
            }
            for key, toks in zip(pdf["doc_key"], pdf["toks"]):
                toks = list(toks)
                n = len(toks)
                i = 0
                while i < n:
                    node = root
                    best_end, best_ids = -1, None
                    j = i
                    while j < n and toks[j] in node:
                        node = node[toks[j]]
                        j += 1
                        if None in node:
                            best_end, best_ids = j, node[None]
                    if best_end > 0:
                        surface = " ".join(toks[i:best_end])
                        for eid in best_ids:
                            out["doc_key"].append(key)
                            out["start_tok"].append(i)
                            out["end_tok"].append(best_end)
                            out["surface"].append(surface)
                            out["entity_id"].append(eid)
                        i = best_end
                    else:
                        i += 1
            # explicit dtypes: an all-miss batch otherwise yields object
            # columns that Arrow refuses to cast (the documented
            # empty-batch hazard from the chunking UDF)
            yield pd.DataFrame(out).astype(
                {"start_tok": "int32", "end_tok": "int32"}
            )

    tagged = tokenized.mapInPandas(scan, schema=_OUT_SCHEMA)
    return tagged.select(
        F.col("doc_key").alias(id_col),
        "start_tok", "end_tok", "surface", "entity_id",
    )
