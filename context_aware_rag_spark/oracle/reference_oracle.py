"""Reference-semantics oracle: straight-line Python transcription of the
reference ingestion pipeline, used as the golden source for parity tests
(triple P/R >= 0.95; expected 1.0 since both sides share the extractor).

Transcribed semantics (citations into /root/reference/):
- batch assignment ``doc_i // batch_size`` — utils/ctx_rag_batcher.py:53-74
- batch->Documents drops docs == "." — ingestion/base.py:319-325
- split via RecursiveCharacterTextSplitter(["\\n\\n","\\n"], 500, 10) —
  base.py:153-161; defaults graph_ingestion.py:68-69
- validity filter + backtick strip — base.py:112-151
- entity id sha1(f"{desc}_{type}_{surface}_{uuid}"), type fallback
  "Entity", surface preserved as name — base.py:182-197
- chunk id sha1(chunk_text + uuid); FIRST_CHUNK / NEXT_CHUNK via running
  previous_chunk_id seeded "0"; 1-based position; content_offset =
  prefix sum of previous chunk lengths; sort by chunkIdx — base.py:362-476
- HAS_ENTITY / PART_OF edges — base.py:511-540, neo4j_db.py:515-608
- duplicate groups = same-type pairs with cosine > 0.9, transitively
  closed — constants.py:43, neo4j_db.py:1575-1615 (our closure is the
  documented superset of the reference's LIMIT-100-per-pass merge)

The oracle is deliberately sequential/naive — its job is to be obviously
correct, not fast.
"""

from __future__ import annotations

import itertools
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..functions import hashing
from ..functions.embedder import entity_embed
from ..functions.extractor import RawTriple, rule_based_extract
from ..functions.splitter import split_text


@dataclass
class OracleResult:
    chunks: List[dict] = field(default_factory=list)     # per-chunk rows
    mentions: List[dict] = field(default_factory=list)   # (conv, chunk, node)
    triples: List[dict] = field(default_factory=list)    # parity artifact
    edges: List[dict] = field(default_factory=list)      # structural + predicates
    canonical_map: Dict[str, str] = field(default_factory=dict)


def _clean_triples(raw: Sequence[RawTriple]) -> List[RawTriple]:
    """Validity filter + backtick strip (base.py:112-151).

    A relationship survives only if type and BOTH endpoint ids/types are
    non-blank after strip; surviving types get backticks removed.
    """
    out = []
    for t in raw:
        if (
            t.relation.strip()
            and t.head.strip()
            and t.head_type.strip()
            and t.tail.strip()
            and t.tail_type.strip()
        ):
            out.append(
                RawTriple(
                    head=t.head,
                    head_type=t.head_type.replace("`", ""),
                    relation=t.relation.replace("`", ""),
                    tail=t.tail,
                    tail_type=t.tail_type.replace("`", ""),
                )
            )
    return out


def run_oracle(
    rows: Sequence[Tuple],
    batch_size: int = 1,
    chunk_size: int = 500,
    chunk_overlap: int = 10,
    extract: Callable[[str], List[RawTriple]] = rule_based_extract,
    deduplicate_nodes: bool = False,
    duplicate_score: float = 0.9,
    embedding_dim: int = 64,
    timestamp_prefix: bool = False,
    allowed_nodes: Sequence[str] | None = None,
) -> OracleResult:
    """rows: (conv_id, turn_idx, role, text, tool, ts) tuples."""
    res = OracleResult()
    by_conv: Dict[str, List[Tuple]] = defaultdict(list)
    for r in rows:
        by_conv[r[0]].append(r)

    seen_nodes: Dict[str, dict] = {}

    for conv_id in sorted(by_conv):
        turns = sorted(by_conv[conv_id], key=lambda r: r[1])
        # ---- batching + splitting (chunk order = (batch, doc, split)) ----
        chunk_texts: List[Tuple[str, int]] = []  # (text, first_turn_idx)
        for _, batch_turns in itertools.groupby(
            turns, key=lambda r: r[1] // batch_size
        ):
            for r in batch_turns:
                text = r[3]
                if text == ".":
                    continue
                if timestamp_prefix:
                    epoch = r[5].timestamp()
                    text = f"<{epoch:.2f}> <{epoch:.2f}> {text}"
                for piece in split_text(text, chunk_size, chunk_overlap):
                    chunk_texts.append((piece, r[1]))

        # ---- chunk ids + linking (base.py:362-476) ----
        previous_chunk_id = "0"
        position = 0
        offset = 0
        for i, (text, turn_idx) in enumerate(chunk_texts):
            chunk_id = hashing.chunk_id_py(text, conv_id)
            position += 1
            if i > 0:
                offset += len(chunk_texts[i - 1][0])
            res.chunks.append(
                {
                    "conv_id": conv_id,
                    "chunk_id": chunk_id,
                    "turn_idx": turn_idx,
                    "text": text,
                    "position": position,
                    "content_offset": offset,
                    "length": len(text),
                }
            )
            if i == 0:
                res.edges.append(
                    {"src": conv_id, "dst": chunk_id, "rel_type": "FIRST_CHUNK",
                     "conv_id": conv_id}
                )
            else:
                res.edges.append(
                    {"src": previous_chunk_id, "dst": chunk_id,
                     "rel_type": "NEXT_CHUNK", "conv_id": conv_id}
                )
            res.edges.append(
                {"src": chunk_id, "dst": conv_id, "rel_type": "PART_OF",
                 "conv_id": conv_id}
            )
            previous_chunk_id = chunk_id

            # ---- extraction + cleaning + hashing ----
            cleaned = _clean_triples(extract(text))
            if allowed_nodes:
                cleaned = [
                    t for t in cleaned
                    if t.head_type in allowed_nodes and t.tail_type in allowed_nodes
                ]
            for t in cleaned:
                sid = hashing.entity_id_py(t.head, t.head_type, conv_id)
                oid = hashing.entity_id_py(t.tail, t.tail_type, conv_id)
                for nid, name, typ in ((sid, t.head, t.head_type),
                                       (oid, t.tail, t.tail_type)):
                    if nid not in seen_nodes:
                        seen_nodes[nid] = {
                            "node_id": nid, "name": name,
                            "type": typ if typ else "Entity", "conv_id": conv_id,
                        }
                    res.mentions.append(
                        {"conv_id": conv_id, "chunk_id": chunk_id,
                         "node_id": nid, "name": name, "type": typ}
                    )
                    res.edges.append(
                        {"src": chunk_id, "dst": nid, "rel_type": "HAS_ENTITY",
                         "conv_id": conv_id}
                    )
                res.triples.append(
                    {
                        "conv_id": conv_id, "chunk_id": chunk_id,
                        "subj_id": sid, "subj_name": t.head,
                        "subj_type": t.head_type, "pred": t.relation,
                        "obj_id": oid, "obj_name": t.tail,
                        "obj_type": t.tail_type,
                    }
                )
                res.edges.append(
                    {"src": sid, "dst": oid, "rel_type": t.relation,
                     "conv_id": conv_id}
                )

    # ---- canonicalization golden: transitive closure of same-type
    #      cosine>threshold pairs over deterministic embeddings ----
    if deduplicate_nodes and seen_nodes:
        nodes = list(seen_nodes.values())
        vecs = entity_embed([n["name"] for n in nodes], dim=embedding_dim)
        parent = {n["node_id"]: n["node_id"] for n in nodes}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(nodes)):
            for j in range(i + 1, len(nodes)):
                if nodes[i]["type"] != nodes[j]["type"]:
                    continue
                if float(np.dot(vecs[i], vecs[j])) > duplicate_score:
                    ri, rj = find(nodes[i]["node_id"]), find(nodes[j]["node_id"])
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        res.canonical_map = {nid: find(nid) for nid in parent}
    return res


def triple_prf(
    golden: Sequence[dict], produced: Sequence[dict]
) -> Tuple[float, float, float]:
    """Precision / recall / F1 over (conv_id, subj, type, pred, obj, type)
    multisets reduced to sets (the reference persists via MERGE, i.e.
    set semantics)."""
    key = lambda t: (
        t["conv_id"], t["subj_name"], t["subj_type"], t["pred"],
        t["obj_name"], t["obj_type"],
    )
    g = {key(t) for t in golden}
    p = {key(t) for t in produced}
    if not p or not g:
        return (0.0, 0.0, 0.0)
    prec = len(g & p) / len(p)
    rec = len(g & p) / len(g)
    f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
    return (prec, rec, f1)
