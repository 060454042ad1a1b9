"""Pluggable mention / triple extractor with a deterministic test backend.

The reference drives extraction through an LLM
(``LLMGraphTransformer.aconvert_to_graph_documents`` — see
/root/reference/src/vss_ctx_rag/functions/rag/graph_rag/ingestion/
base.py:88-95, 208-262). LLM output is nondeterministic, so — following
the reference's own testability precedent of injectable tools
(``NullEmbedding``, tools swapped via YAML config) — the engine takes a
pure ``extract(text) -> [RawTriple]`` callable. Production would plug an
LLM-endpoint-backed callable (batched inside the pandas UDF, with retry);
tests and benchmarks use :func:`rule_based_extract`, a deterministic
rule-based extractor over a closed vocabulary.

Post-formatting reproduces public langchain-experimental 0.4.1
``LLMGraphTransformer`` conventions (the contract the reference relies
on at base.py:88-95): title-cased node ids, capitalized node types
(fallback handled downstream), UPPER_SNAKE relation types.
"""

from __future__ import annotations

import re
from typing import Callable, List, NamedTuple, Tuple


class RawTriple(NamedTuple):
    head: str
    head_type: str
    relation: str
    tail: str
    tail_type: str


Extractor = Callable[[str], List[RawTriple]]

# ---------------------------------------------------------------------------
# Closed vocabulary (seed corpus). Alias groups share a canonical key so the
# deterministic embedder can place aliases within cosine > 0.9 of each other
# (exercises entity linking + connected-components canonicalization).
# ---------------------------------------------------------------------------

# canonical_key -> (type, [surface forms / aliases])
ENTITY_GROUPS = {
    "alice": ("Person", ["Alice", "Alice Johnson", "Ms. Johnson"]),
    "bob": ("Person", ["Bob", "Bob Smith", "Mr. Smith"]),
    "carol": ("Person", ["Carol", "Carol Diaz"]),
    "dave": ("Person", ["Dave", "David Lee"]),
    "erin": ("Person", ["Erin", "Erin Park"]),
    "acme": ("Object", ["ACME Corp", "Acme Corporation", "ACME"]),
    "globex": ("Object", ["Globex", "Globex Inc"]),
    "initech": ("Object", ["Initech", "Initech LLC"]),
    "truck": ("Vehicle", ["Red Truck", "The Red Truck"]),
    "sedan": ("Vehicle", ["Blue Sedan", "The Blue Sedan"]),
    "van": ("Vehicle", ["White Van"]),
    "berlin": ("Location", ["Berlin", "Berlin City"]),
    "tokyo": ("Location", ["Tokyo"]),
    "warehouse": ("Location", ["Warehouse 13", "The Warehouse"]),
    "plaza": ("Location", ["Central Plaza", "The Plaza"]),
    "airport": ("Location", ["Gateway Airport"]),
}

# relation keyword (surface) -> relation label (pre-formatting)
RELATION_KEYWORDS = {
    "drives": "drives",
    "drove": "drives",
    "owns": "owns",
    "met": "met",
    "visited": "visited",
    "works at": "works at",
    "located in": "located in",
    "parked at": "parked at",
    "delivered to": "delivered to",
    "manages": "manages",
}

# alias surface (lowercased) -> (surface, type, canonical_key)
ALIAS_INDEX = {
    alias.lower(): (alias, etype, key)
    for key, (etype, aliases) in ENTITY_GROUPS.items()
    for alias in aliases
}

# Longest-alias-first so "Alice Johnson" wins over "Alice".
_ALIAS_PATTERN = re.compile(
    "|".join(
        re.escape(a)
        for a in sorted(ALIAS_INDEX, key=len, reverse=True)
    ),
    re.IGNORECASE,
)
_REL_PATTERN = re.compile(
    "|".join(re.escape(k) for k in sorted(RELATION_KEYWORDS, key=len, reverse=True)),
    re.IGNORECASE,
)
_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


def format_node_id(surface: str) -> str:
    """langchain-experimental formatting: str.title() on node ids."""
    return surface.title()


def format_node_type(t: str) -> str:
    return t.capitalize()


def format_relation(r: str) -> str:
    return r.replace(" ", "_").upper()


def rule_based_extract(text: str) -> List[RawTriple]:
    """Deterministic extraction: within each sentence, emit a triple for
    every (mention, relation-keyword, mention) pattern where the keyword
    lies strictly between two consecutive vocabulary mentions.

    Cleaning bait (exercises the reference's validity filters,
    base.py:112-151): a sentence containing ``~glitch~`` gets its node
    types wrapped in backticks (filter must strip, keep the triple); one
    containing ``~blank~`` additionally emits a triple with a blank tail
    id (filter must drop it).
    """
    triples: List[RawTriple] = []
    for sentence in _SENTENCE_SPLIT.split(text):
        glitch = "~glitch~" in sentence
        blank = "~blank~" in sentence
        if blank:
            triples.append(RawTriple("Bait", "Person", "MET", "  ", "Person"))
        mentions: List[Tuple[int, str, str]] = []  # (pos, surface, type)
        for m in _ALIAS_PATTERN.finditer(sentence):
            surface, etype, _ = ALIAS_INDEX[m.group(0).lower()]
            mentions.append((m.start(), surface, etype))
        if len(mentions) < 2:
            continue
        rels = [(m.start(), m.group(0).lower()) for m in _REL_PATTERN.finditer(sentence)]
        if not rels:
            continue
        for (p1, s1, t1), (p2, s2, t2) in zip(mentions, mentions[1:]):
            between = [kw for pos, kw in rels if p1 < pos < p2]
            if not between:
                continue
            rel = RELATION_KEYWORDS[between[0]]
            ht = format_node_type(t1)
            tt = format_node_type(t2)
            if glitch:
                ht, tt = f"`{ht}`", f"`{tt}`"
            triples.append(
                RawTriple(
                    head=format_node_id(s1),
                    head_type=ht,
                    relation=format_relation(rel),
                    tail=format_node_id(s2),
                    tail_type=tt,
                )
            )
    return triples


def null_extract(text: str) -> List[RawTriple]:
    """Entity-extraction bypass (reference base.py:264-275): chunks only."""
    return []
