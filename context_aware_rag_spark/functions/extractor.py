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


# precomputed formatted lookups over the closed vocabulary — values are
# exactly format_node_id/format_node_type/format_relation applied to the
# alias surfaces/types/relations; the per-triple calls were ~25% of the
# extractor's per-chunk wall at corpus scale
_ALIAS_FMT = {
    alias_lower: (format_node_id(surface), format_node_type(etype))
    for alias_lower, (surface, etype, _key) in ALIAS_INDEX.items()
}
_REL_FMT = {
    kw: format_relation(label) for kw, label in RELATION_KEYWORDS.items()
}


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
        # mentions carry PRE-FORMATTED (title-cased surface, capitalized
        # type) from the module-level lookup — identical values to the
        # per-triple format_* calls this replaces
        mentions: List[Tuple[int, str, str]] = []  # (pos, fmt_surface, fmt_type)
        for m in _ALIAS_PATTERN.finditer(sentence):
            fmt = _ALIAS_FMT[m.group(0).lower()]
            mentions.append((m.start(), fmt[0], fmt[1]))
        if len(mentions) < 2:
            continue
        rels = [(m.start(), m.group(0).lower()) for m in _REL_PATTERN.finditer(sentence)]
        if not rels:
            continue
        for (p1, s1, ht), (p2, s2, tt) in zip(mentions, mentions[1:]):
            between = [kw for pos, kw in rels if p1 < pos < p2]
            if not between:
                continue
            if glitch:
                hty, tty = f"`{ht}`", f"`{tt}`"
            else:
                hty, tty = ht, tt
            triples.append(
                RawTriple(
                    head=s1,
                    head_type=hty,
                    relation=_REL_FMT[between[0]],
                    tail=s2,
                    tail_type=tty,
                )
            )
    return triples


def null_extract(text: str) -> List[RawTriple]:
    """Entity-extraction bypass (reference base.py:264-275): chunks only."""
    return []


# ---------------------------------------------------------------------------
# json_llm extractor: the reference's LLM graph-extraction response cycle
# ---------------------------------------------------------------------------

def fake_llm_graph_response(text: str) -> str:
    """Deterministic stand-in for the LLM graph-extraction call: returns
    the JSON document shape the reference's extraction chain receives
    (nodes + relationships, LLMGraphTransformer-style) — deliberately
    MALFORMED in one of the classic LLM output styles, chosen by a hash
    of the text, so the parse path must repair it (the reference depends
    on json-repair for exactly this, pyproject.toml:48).

    Content-preserving failure modes only (fences/prose, single quotes,
    unquoted keys, trailing commas, Python constants); the ground truth
    is the rule-based extraction of the same text, so parity against
    ``rule_based_extract`` is exact by construction.
    """
    import hashlib as _hashlib
    import json as _json

    triples = rule_based_extract(text)
    doc = {
        "nodes": sorted(
            {(t.head, t.head_type) for t in triples}
            | {(t.tail, t.tail_type) for t in triples}
        ),
        "relationships": [
            {"source": t.head, "source_type": t.head_type,
             "type": t.relation,
             "target": t.tail, "target_type": t.tail_type}
            for t in triples
        ],
    }
    doc["nodes"] = [{"id": n, "type": ty} for n, ty in doc["nodes"]]
    s = _json.dumps(doc)
    mode = int.from_bytes(_hashlib.sha1(text.encode()).digest()[:2], "big") % 5
    if mode == 0:
        return "Here is the extracted graph:\n```json\n" + s + "\n```\nDone."
    if mode == 1:
        # single quotes throughout (content has no quotes in vocabulary)
        return s.replace('"', "'")
    if mode == 2:
        # trailing commas before every closer
        return s.replace("}", ",}").replace("]", ",]")
    if mode == 3:
        # unquoted keys
        for k in ("nodes", "relationships", "id", "type",
                  "source", "source_type", "target", "target_type"):
            s = s.replace(f'"{k}":', f"{k}:")
        return s
    # Python-repr constants sprinkled in (parsed back to null and dropped)
    return s.replace('"relationships":', '"confidence": None, "relationships":')


def llm_json_extract(text: str) -> List[RawTriple]:
    """U1 via the LLM-JSON path: call the (fake) LLM, repair the
    malformed JSON response, convert relationships to RawTriples —
    the reference's graph-extraction parse cycle end to end."""
    from .jsonrepair import repair_json

    doc = repair_json(fake_llm_graph_response(text))
    if not isinstance(doc, dict):
        return []
    out: List[RawTriple] = []
    for rel in doc.get("relationships") or []:
        if not isinstance(rel, dict):
            continue
        head, tail = rel.get("source"), rel.get("target")
        relation = rel.get("type")
        if not head or not tail or not relation:
            continue
        out.append(RawTriple(
            head=str(head), head_type=str(rel.get("source_type") or ""),
            relation=str(relation),
            tail=str(tail), tail_type=str(rel.get("target_type") or ""),
        ))
    return out
