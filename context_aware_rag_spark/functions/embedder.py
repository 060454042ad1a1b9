"""Deterministic embedding backends (pure functions, vectorized-friendly).

The reference precedent is ``NullEmbedding`` — hash-seeded random
vectors, dim 1024, seed 42 (/root/reference/src/vss_ctx_rag/tools/
embedding/embedding_tool.py:30-109). Python's builtin ``hash()`` is
per-process salted, so we derive the RNG seed from sha1 instead: the
same text embeds identically on every executor, every run.

Two backends:

- :func:`hash_embed` — NullEmbedding analog for arbitrary text
  (chunks, summaries).
- :func:`entity_embed` — alias-aware test double for entity names:
  aliases of the same canonical entity (extractor.ENTITY_GROUPS) land
  within cosine > 0.9 of each other, distinct entities below 0.8 —
  simulating a semantic model so the similarity join + canonicalization
  path (reference duplicate threshold cosine > 0.9, constants.py:43)
  is exercisable deterministically.

Production swaps in a real embedding-endpoint callable; the Spark
operators only require ``texts -> np.ndarray[n, dim]``.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

import numpy as np

DEFAULT_DIM = 64  # shrunk from the reference's 1024 for test speed
_ALIAS_NOISE = 0.04  # small deterministic perturbation per alias surface


def _seed(text: str) -> int:
    return int.from_bytes(hashlib.sha1(text.encode("utf-8")).digest()[:8], "big")


def _unit_vec(text: str, dim: int) -> np.ndarray:
    rng = np.random.default_rng(_seed(text))
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def hash_embed(texts: Iterable[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic sha1-seeded unit embeddings, one row per text."""
    return np.stack([_unit_vec(t if t is not None else "", dim) for t in texts])


def _canonical_key(name: str) -> str | None:
    from .extractor import ALIAS_INDEX

    hit = ALIAS_INDEX.get((name or "").lower())
    return hit[2] if hit else None


def entity_embed(names: Iterable[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Alias-aware deterministic embeddings for entity surface forms.

    base vector is seeded by the canonical key (or the name itself if
    unknown) plus a small noise vector seeded by the exact surface form,
    keeping within-group cosine > 0.9 while cross-group stays < 0.8
    (random 64-dim unit vectors concentrate near cosine 0).
    """
    out: List[np.ndarray] = []
    for name in names:
        name = name or ""
        key = _canonical_key(name)
        base = _unit_vec(f"entity::{key}" if key else f"surface::{name}", dim)
        noise = _unit_vec(f"alias-noise::{name}", dim)
        v = base + _ALIAS_NOISE * noise
        out.append(v / np.linalg.norm(v))
    return np.stack(out)
