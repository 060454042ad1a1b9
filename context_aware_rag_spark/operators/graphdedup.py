"""Structural conversation dedup: canonical per-conversation KG
fingerprints.

Text-level dedup (exact / MinHash / SimHash — dedup.py) misses a class
of duplicates a transcript corpus is full of: two conversations whose
WORDING differs (paraphrase, reordered turns, different filler) but
which assert the IDENTICAL set of facts. After extraction, such
conversations are indistinguishable to the KG — keeping both just
double-counts evidence and doubles training-pair volume. The canonical
form of a conversation's knowledge is its distinct name-level triple
set; hashing that set (sorted, separator-framed, md5) gives a
fingerprint equal iff the asserted subgraphs are equal — the
graph-level analogue of dedup.exact_duplicates' normalized-text hash,
and step zero of the WL-hierarchy (wl_labels, graph.py, refines
structure WITHIN a graph; this fingerprints the graph as a whole).

PRECONDITION: names/predicates must not contain tab or newline (the
frame separators). Pipeline names are token-level surface forms
(extraction.py) — post-canonicalization vocabularies satisfy this; for
foreign vocabularies route names through sources/ntriples.py-style
url-encoding first.

100 TB shape: one distinct on (conv, subj, pred, obj) + one conv-keyed
aggregation (map-side combinable collect_set; a conversation's
distinct fact set is bounded by its own length, so no hot key) → one
fingerprint-keyed window over conversation-count rows for family
sizes. Three exchanges total, each on a key no finer than the data
grain; the md5 and the sort are JVM-side whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SEP_FIELD = "\t"
_SEP_LINE = "\n"


def conversation_fingerprints(
    triples: DataFrame,
    conv_col: str = "conv_id",
    subj_col: str = "subj_name",
    pred_col: str = "pred",
    obj_col: str = "obj_name",
) -> DataFrame:
    """One row per conversation:

    (conv_id, n_facts, fingerprint, family_size, is_struct_dup)

    where ``fingerprint`` = md5 of the newline-joined sorted distinct
    ``subj\\tpred\\tobj`` lines (binary string order — identical in
    Spark's sort_array and the DuckDB twin's ORDER BY), ``family_size``
    counts conversations sharing the fingerprint, and
    ``is_struct_dup`` flags members of non-singleton families (the
    keep-one-per-family choice is the caller's, same contract as
    dedup.duplicate_families).
    """
    key = F.concat_ws(
        _SEP_FIELD, F.col(subj_col), F.col(pred_col), F.col(obj_col)
    )
    per_conv = (
        triples.select(F.col(conv_col).alias("conv_id"), key.alias("_key"))
        .dropDuplicates()
        .groupBy("conv_id")
        .agg(
            F.size(F.collect_set("_key")).cast("long").alias("n_facts"),
            F.md5(
                F.array_join(F.sort_array(F.collect_set("_key")), _SEP_LINE)
            ).alias("fingerprint"),
        )
    )
    fam = Window.partitionBy("fingerprint")
    return per_conv.select(
        "conv_id",
        "n_facts",
        "fingerprint",
        F.count(F.lit(1)).over(fam).alias("family_size"),
        (F.count(F.lit(1)).over(fam) > 1).alias("is_struct_dup"),
    )
