"""Identity/hashing rules — byte-parity with the reference pipeline.

Both a Spark Column form (F.sha1 over the exact concatenation) and a
pure-Python form (for the reference-semantics oracle) of each rule:

- chunk id  = sha1(chunk_text + conv_id)
  (reference: base.py:381-387, ``sha1(page_content + uuid)``)
- entity id = sha1(f"{description}_{node_type}_{surface}_{conv_id}")
  with ``node_type`` falling back to "Entity" when blank and
  ``description`` defaulting to "" (reference: base.py:182-197)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- pure-Python (oracle) ----------------------------------------------------

def chunk_id_py(chunk_text: str, conv_id: str) -> str:
    return hashlib.sha1((chunk_text + conv_id).encode()).hexdigest()


def entity_id_py(
    surface: str, node_type: str, conv_id: str, description: str = ""
) -> str:
    node_type = node_type if node_type else "Entity"
    return hashlib.sha1(
        f"{description}_{node_type}_{surface}_{conv_id}".encode()
    ).hexdigest()


# -- Spark Column form -------------------------------------------------------

def chunk_id_col(chunk_text: Column, conv_id: Column) -> Column:
    return F.sha1(F.concat(chunk_text, conv_id))


def entity_id_col(
    surface: Column, node_type: Column, conv_id: Column, description: Column | None = None
) -> Column:
    """Byte-parity with :func:`entity_id_py`: the Entity fallback fires
    only on NULL/empty type (Python truthiness — a whitespace type is
    kept, base.py:186), and the concatenation uses NULL-propagating
    concat so a NULL surface/conv yields a NULL id (visible downstream)
    instead of concat_ws silently skipping the field and letting
    distinct rows collide on one hash."""
    desc = description if description is not None else F.lit("")
    typ = F.when(
        F.coalesce(node_type, F.lit("")) == "", F.lit("Entity")
    ).otherwise(node_type)
    return F.sha1(
        F.concat(
            F.coalesce(desc, F.lit("")), F.lit("_"), typ, F.lit("_"),
            surface, F.lit("_"), conv_id,
        )
    )
