"""N-Triples interchange sink/source for the extracted KG.

The reference ships its graph to a database over a wire protocol
(Neo4j Bolt / Arango HTTP — ``tools/storage/neo4j_db.py``,
``arango_db.py``); the wire clients are out of scope here (no network,
BASELINE.md), but the *interchange* capability — "hand the triple set
to another system and get the identical graph back" — is a first-class
sink/source this engine expresses as W3C N-Triples lines, the
line-oriented RDF format every graph store imports. Line-oriented
matters at 100 TB: a text file of independent lines splits on byte
ranges, so both the write and the re-read parallelize with zero
coordination (same property that makes JSONL the dump format of
choice).

Encoding: each name travels inside an IRI as
``<urn:x-ent:{enc}>`` / ``<urn:x-rel:{enc}>`` where ``enc`` is
``F.url_encode`` (application/x-www-form-urlencoded). That encoding
escapes every structural character — ``<``, ``>``, space, newline,
tab, ``%``, ``+`` — so NO name can break the ``<...> <...> <...> .``
framing, and ``F.url_decode`` inverts it exactly (property-tested with
adversarial names in tests/test_ntriples.py). Both directions are
single JVM-side narrow projections: no UDF, no shuffle, whole-stage
codegen.

Determinism/round-trip contract: ``parse_ntriples(to_ntriples(df))``
equals ``df`` row-for-row on the three name columns (non-NULL
precondition: N-Triples has no NULL; the extraction pipeline emits
non-NULL names — extraction.py drops invalid rows before this sink).
The EXTRA query ``kg_ntriples_roundtrip`` pins serialize→parse
identity against the pure-Python oracle snapshot of the same triple
set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LINE_RE = r"^<urn:x-ent:([^>]*)> <urn:x-rel:([^>]*)> <urn:x-ent:([^>]*)> \.$"


def to_ntriples(
    triples: DataFrame,
    subj_col: str = "subj_name",
    pred_col: str = "pred",
    obj_col: str = "obj_name",
) -> DataFrame:
    """Serialize (subj, pred, obj) rows to one N-Triples ``line`` each.

    Narrow map only — partition-preserving, so a bucketed/range-laid
    triple table serializes without a shuffle and ``write.text``
    emits one file per partition.
    """
    enc = lambda c: F.url_encode(F.col(c))  # noqa: E731
    return triples.select(
        F.concat(
            F.lit("<urn:x-ent:"), enc(subj_col),
            F.lit("> <urn:x-rel:"), enc(pred_col),
            F.lit("> <urn:x-ent:"), enc(obj_col),
            F.lit("> ."),
        ).alias("line")
    )


def parse_ntriples(
    lines: DataFrame,
    line_col: str = "line",
    on_invalid: str = "error",
) -> DataFrame:
    """Parse N-Triples ``line`` rows back to (subj_name, pred, obj_name).

    Blank lines and ``#`` comments (legal N-Triples) are skipped.
    Remaining lines must match the ``<...> <...> <...> .`` frame this
    sink writes: ``on_invalid="error"`` (default) fails the job with
    the offending line in the message — a corrupt interchange file
    must not silently drop facts; ``"drop"`` discards them (foreign
    files with constructs we don't model, e.g. literals).
    """
    if on_invalid not in ("error", "drop"):
        raise ValueError(f"on_invalid must be error|drop: {on_invalid}")
    line = F.col(line_col)
    body = lines.where(
        ~(F.trim(line) == "") & ~F.trim(line).startswith("#")
    )
    ok = line.rlike(_LINE_RE)
    if on_invalid == "drop":
        body = body.where(ok)
    dec = lambda g: F.url_decode(F.regexp_extract(line, _LINE_RE, g))  # noqa: E731
    subj = dec(1)
    if on_invalid == "error":
        # The raise lives INSIDE an output expression — an assertion in
        # a dropped helper column would be pruned away by Catalyst.
        subj = F.when(ok, subj).otherwise(
            F.raise_error(F.concat(F.lit("invalid N-Triples line: "), line))
        )
    return body.select(
        subj.alias("subj_name"),
        dec(2).alias("pred"),
        dec(3).alias("obj_name"),
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text-file N-Triples sink (one line per triple, splittable)."""
    to_ntriples(triples).withColumnRenamed("line", "value").write.mode(
        mode
    ).text(path)


def read_ntriples(
    spark: SparkSession, path: str, on_invalid: str = "error"
) -> DataFrame:
    """Text-file N-Triples source: byte-range-splittable parallel scan."""
    return parse_ntriples(
        spark.read.text(path).withColumnRenamed("value", "line"),
        on_invalid=on_invalid,
    )
