"""Column-level text scrubbing functions (JVM-side, codegen-friendly).

Each mirrors a reference cleaning rule; all are built-in
``pyspark.sql.functions`` compositions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The 19 Lucene special characters the reference scrubs
# (/root/reference/src/vss_ctx_rag/utils/utils.py:36-74).
LUCENE_SPECIAL = '+-&|!(){}[]^"~*?:\\/'


def remove_think_tags(col: Column) -> Column:
    """Strip <think>...</think> spans; if only a closing tag is present,
    drop everything before it (utils.py:26-33)."""
    stripped = F.regexp_replace(col, r"(?s)<think>.*?</think>", "")
    return F.when(
        ~stripped.contains("<think>") & stripped.contains("</think>"),
        F.regexp_replace(stripped, r"(?s).*?</think>", ""),
    ).otherwise(stripped)


def remove_lucene_chars(col: Column) -> Column:
    """Replace Lucene special chars with spaces, then trim (utils.py:36-74)."""
    return F.trim(F.translate(col, LUCENE_SPECIAL, " " * len(LUCENE_SPECIAL)))


def strip_backticks(col: Column) -> Column:
    """Backtick scrub on node/relation types (ingestion/base.py:133-147)."""
    return F.regexp_replace(col, "`", "")


def timestamp_prefix(text: Column, start_s: Column, end_s: Column) -> Column:
    """``"<12.00> <18.50> " + doc`` prefixing (utils.py:77-101;
    graph_ingestion.py:155-164), seconds rendered with two decimals."""
    return F.format_string(
        "<%.2f> <%.2f> %s", start_s.cast("double"), end_s.cast("double"), text
    )


def compose_entity_text(name: Column, description: Column) -> Column:
    """``e.name + coalesce(' ' + e.description, '')`` (neo4j_db.py:682)."""
    return F.concat(
        name, F.coalesce(F.concat(F.lit(" "), description), F.lit(""))
    )
