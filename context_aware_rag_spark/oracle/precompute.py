"""Precomputed oracle tables for the driver's DuckDB correctness gate.

The kg_* pipeline queries (and the MinHash/SimHash near-dup operators)
are not expressible in ANSI SQL — but every one of them is
DETERMINISTIC: the transcripts corpus is seed-per-row synthesized, the
extractor is rule-based, the hashes are fixed-seed xxhash64, and the
embedder is sha1-seeded. So their expected outputs can be computed ONCE
by this module — a straight-line pure-Python implementation, sharing no
Spark code with the engine (the independent reference-semantics oracle,
reference_oracle.py, plus the from-scratch XXH64 in xxh64.py) — and
snapshotted to parquet. The DuckDB twin for each query is then simply
``SELECT ... FROM read_parquet('oracle_data/sf0.01/<name>.parquet')``,
which upgrades those queries from rows-only checks to full
rows+schema+value-hash gates (VERDICT.md round-2 item 1).

Regenerate with ``python tools/gen_oracle_data.py`` (pure Python — no
Spark session needed); tests/test_precompute_parity.py asserts the
Spark queries reproduce these tables bit-for-bit.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import re
import unicodedata
from collections import defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from .reference_oracle import run_oracle
from .xxh64 import MASK, spark_xxhash64_str, xxh64, xxh64_int

# Java regex \s (no UNICODE_CHARACTER_CLASS): exactly these six chars
_JAVA_WS = " \t\n\x0b\f\r"
_WS_RUN = re.compile("[" + _JAVA_WS + "]+")


def normalize_py(text: str | None) -> str:
    """Replicates dedup.normalized_text: lower, non-[letter/digit/ws]
    to space, collapse whitespace runs, trim. Unicode-aware exactly like
    Java's \\p{L}/\\p{N} (general categories L* and N*)."""
    out = []
    for c in (text or "").lower():
        cat = unicodedata.category(c)
        if cat[0] in ("L", "N") or c in _JAVA_WS:
            out.append(c)
        else:
            out.append(" ")
    return _WS_RUN.sub(" ", "".join(out)).strip(" ")


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _shingles(text: str, n: int) -> List[str]:
    words = normalize_py(text).split(" ")
    if len(words) >= n:
        seen = dict.fromkeys(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        return list(seen)
    return [" ".join(words)]


def minhash_pairs_py(
    docs: Iterable[Tuple[int, str]],
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> List[Tuple[int, int, float]]:
    """Independent recomputation of dedup.minhash_dedup: same shingles,
    same xxhash64(shingle, seed k) signature (the string hash is
    computed once per shingle, then folded with each INTEGER seed via
    the 4-byte hashInt path — the exact left-fold Spark's multi-arg
    xxhash64 performs on a sequence(0, 63) element), same banded
    candidate generation, same signature-agreement estimate. est is
    k/num_hashes with num_hashes a power of two, so the double is exact
    and hash-comparable."""
    sigs: Dict[int, List[int]] = {}
    for doc_id, text in docs:
        base = [xxh64(s.encode("utf-8"), 42) for s in _shingles(text, n)]
        sig = [
            min(_to_signed(xxh64_int(k, h)) for h in base)
            for k in range(num_hashes)
        ]
        sigs[int(doc_id)] = sig
    rows_per_band = num_hashes // bands
    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            bh = spark_xxhash64_str(",".join(str(x) for x in chunk))
            buckets[(b, bh)].append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / num_hashes
        if est >= threshold:
            out.append((a, b, est))
    return out


def simhash_pairs_py(
    docs: Iterable[Tuple[int, str]], max_hamming: int = 3
) -> List[Tuple[int, int, int]]:
    """Independent recomputation of dedup.simhash_near_dups: per-doc
    64-bit SimHash over distinct normalized tokens, then a complete
    all-pairs Hamming scan (the engine's d+1-block pigeonhole blocking
    is complete, so the candidate restriction changes nothing)."""
    fps: Dict[int, int] = {}
    jbits = np.arange(64, dtype=np.uint64)
    for doc_id, text in docs:
        words = list(dict.fromkeys(normalize_py(text).split(" ")))
        hs = np.array(
            [xxh64(w.encode("utf-8"), 42) for w in words], dtype=np.uint64
        )
        bits = (hs[:, None] >> jbits) & np.uint64(1)
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(hs)
        fp = 0
        for j in range(64):
            if votes[j] > 0:
                fp |= 1 << j
        fps[int(doc_id)] = fp
    ids = sorted(fps)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = (fps[ids[i]] ^ fps[ids[j]]).bit_count()
            if h <= max_hamming:
                out.append((ids[i], ids[j], h))
    return out


# ---------------------------------------------------------------------------
# kg_* pipeline tables (over the deterministic transcripts corpus)
# ---------------------------------------------------------------------------

def _canon_of(cmap: Dict[str, str]):
    return lambda nid: cmap.get(nid, nid)


def kg_tables(n_convs: int) -> Dict[str, List[tuple]]:
    """All kg_* query outputs for a generate_rows(n_convs) corpus."""
    from ..sources.transcripts import generate_rows

    rows = generate_rows(n_convs)
    res = run_oracle(rows)
    res_d = run_oracle(rows, deduplicate_nodes=True)
    tables: Dict[str, List[tuple]] = {}

    # kg_triples / kg_triples_json_llm: distinct named triples (the
    # json_llm extraction mode is pytest-proven identical to rule_based)
    tables["kg_triples"] = sorted(
        {
            (t["conv_id"], t["subj_name"], t["subj_type"], t["pred"],
             t["obj_name"], t["obj_type"])
            for t in res.triples
        }
    )

    # kg_chunk_stats: per-conv chunk aggregates
    by_conv: Dict[str, list] = defaultdict(list)
    for c in res.chunks:
        by_conv[c["conv_id"]].append(c)
    tables["kg_chunk_stats"] = [
        (
            conv,
            len(cs),
            max(c["position"] for c in cs),
            sum(c["length"] for c in cs),
            max(c["content_offset"] + c["length"] for c in cs),
        )
        for conv, cs in sorted(by_conv.items())
    ]

    # kg_nodes_canonical: build_nodes(mentions, canonical_map) —
    # name/type of the min mention node_id in the canon group,
    # mention_chunks = distinct chunk count
    canon = _canon_of(res_d.canonical_map)
    groups: Dict[str, list] = defaultdict(list)
    for m in res_d.mentions:
        groups[canon(m["node_id"])].append(m)
    nodes_rows = []
    for cid, ms in sorted(groups.items()):
        lead = min(ms, key=lambda m: m["node_id"])
        nodes_rows.append(
            (cid, lead["name"], lead["type"] or "Entity",
             len({m["chunk_id"] for m in ms}))
        )
    tables["kg_nodes_canonical"] = nodes_rows

    # kg_canonical_incremental: the incremental update equals the
    # full-batch transitive closure (pytest-proven) = the oracle map
    tables["kg_canonical_incremental"] = sorted(
        (nid, cid) for nid, cid in res_d.canonical_map.items() if nid != cid
    )

    # kg_cluster_purity: canonicalize.cluster_purity over the node
    # grain (mentions deduped on node_id) under the oracle map —
    # majority type elected by (member count DESC, type ASC NULLS
    # LAST), NULL type its own class, integer trunc-div ppm
    node_rows = {}
    for m in res_d.mentions:
        node_rows.setdefault(m["node_id"], (m["name"], m["type"]))
    clusters: Dict[str, list] = defaultdict(list)
    for nid, (nm, ty) in node_rows.items():
        clusters[canon(nid)].append((nid, nm, ty))
    purity_rows = []
    for cid, ms in sorted(clusters.items()):
        if len(ms) < 2:
            continue
        names = {nm for _n, nm, _t in ms}
        types = {ty for _n, _nm, ty in ms}
        by_type: Dict[object, int] = defaultdict(int)
        for _n, _nm, ty in ms:
            by_type[ty] += 1
        maj_ty, maj_n = sorted(
            by_type.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )[0]
        purity_rows.append(
            (
                cid,
                len(ms),
                len(names),
                len(types),
                maj_ty,
                maj_n,
                maj_n * 1_000_000 // len(ms),
            )
        )
    tables["kg_cluster_purity"] = purity_rows

    # kg_nodes_with_tools: source_tools set-union across merged aliases
    chunk_turns: Dict[str, set] = defaultdict(set)
    for c in res.chunks:
        chunk_turns[c["chunk_id"]].add((c["conv_id"], c["turn_idx"]))
    tool_at = {(r[0], r[1]): r[4] for r in rows if r[4] is not None}
    node_tools: Dict[str, set] = defaultdict(set)
    for m in res_d.mentions:
        for key in chunk_turns[m["chunk_id"]]:
            t = tool_at.get(key)
            if t is not None:
                node_tools[canon(m["node_id"])].add(t)
    tools_rows = []
    for cid, ms in sorted(groups.items()):
        lead = min(ms, key=lambda m: m["node_id"])
        tools = sorted(node_tools.get(cid, set()))
        tools_rows.append(
            (cid, lead["name"], lead["type"] or "Entity",
             ",".join(tools), len(tools))
        )
    tables["kg_nodes_with_tools"] = tools_rows

    # kg_similar_chunk_edges: LSH-banded KNN + sequential degree gate
    tables["kg_similar_chunk_edges"] = knn_edges_py(res.chunks)

    # a10_tree_summarize over the linked chunks
    tables["a10_tree_summarize"] = tree_summarize_py(res.chunks)

    # s6_batch_summaries over the raw transcript rows
    tables["s6_batch_summaries"] = s6_batches_py(rows)

    # kg_fact_assertions: distinct timed assertions feeding the
    # valid-time operators (operators/facts.py). Assertion time = MIN
    # turn timestamp over the chunk rows bearing the triple's chunk id
    # (a chunk id repeats when identical text recurs in a conversation),
    # emitted as integer epoch seconds so both engines hash the same.
    ts_at = {(r[0], r[1]): r[5] for r in rows}
    chunk_min_ts: Dict[tuple, "object"] = {}
    for c in res.chunks:
        key = (c["conv_id"], c["chunk_id"])
        t = ts_at[(c["conv_id"], c["turn_idx"])]
        if key not in chunk_min_ts or t < chunk_min_ts[key]:
            chunk_min_ts[key] = t
    tables["kg_fact_assertions"] = sorted(
        {
            (
                t["subj_name"],
                t["pred"],
                t["obj_name"],
                int(chunk_min_ts[(t["conv_id"], t["chunk_id"])].timestamp()),
            )
            for t in res.triples
        }
    )

    return tables


def tree_summarize_py(
    chunk_rows: Sequence[dict], cap: int = 500
) -> List[Tuple[str, str, int]]:
    """Replicates operators.treeagg.tree_summarize (rank-based pairwise
    reduce, pass-through singletons, global level counter)."""
    state: Dict[str, List[Tuple[int, str]]] = defaultdict(list)
    for c in chunk_rows:
        state[c["conv_id"]].append((c["position"], c["text"]))
    state = {g: sorted(v) for g, v in state.items()}
    level = 0
    while state and max(len(v) for v in state.values()) > 1:
        new_state: Dict[str, List[Tuple[int, str]]] = {}
        for g, items in state.items():
            if len(items) == 1:
                new_state[g] = [(0, items[0][1])]
                continue
            items = sorted(items)
            buckets: Dict[int, List[Tuple[int, str]]] = defaultdict(list)
            for rnk, (_pos, txt) in enumerate(items, start=1):
                buckets[(rnk - 1) // 2].append((rnk, txt))
            new_state[g] = [
                (ppos, " ".join(t for _, t in sorted(buckets[ppos]))[:cap])
                for ppos in sorted(buckets)
            ]
        state = new_state
        level += 1
    return [(g, state[g][0][1], level) for g in sorted(state)]


def s6_batches_py(
    rows: Sequence[tuple], batch_size: int = 6, cap: int = 400
) -> List[Tuple[str, int, str, int, int]]:
    """Replicates summarize_batches + the s6 query projection:
    (conv_id, batch_id, summary, n_turns, n_turn_idxs)."""
    groups: Dict[Tuple[str, int], list] = defaultdict(list)
    for r in rows:
        if r[3] == ".":
            continue
        groups[(r[0], r[1] // batch_size)].append((r[1], r[3]))
    out = []
    for (conv, batch), turns in sorted(groups.items()):
        turns.sort()
        batch_text = " ".join(t for _, t in turns)
        summary = ("[SUM] " + batch_text)[: cap + 6]
        out.append((conv, batch, summary, len(turns),
                    len({i for i, _ in turns})))
    return out


def knn_edges_py(
    chunk_rows: Sequence[dict],
    min_score: float = 0.8,
    top_k: int = 6,
    max_degree: int = 5,
    dim: int = 64,
    bands: int = 32,
    bits_per_band: int = 12,
) -> List[Tuple[str, str, float]]:
    """Replicates similarity.knn_similar_edges over unique chunks: LSH
    band candidates, einsum scoring, per-src top-k, then the
    reference-sequential degree gate (the engine's fixpoint is
    pytest-proven equal to this sequential semantics)."""
    from ..functions.embedder import hash_embed
    from ..operators.similarity import _lsh_planes

    uniq: Dict[str, str] = {}
    for c in chunk_rows:
        uniq.setdefault(c["chunk_id"], c["text"])
    ids = list(uniq)
    embs = hash_embed([uniq[i] for i in ids], dim=dim).astype(np.float32)
    planes = _lsh_planes(dim, bands * bits_per_band)
    bits = (embs @ planes.T) > 0
    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for row_i in range(len(ids)):
        for b in range(bands):
            chunk = bits[row_i, b * bits_per_band : (b + 1) * bits_per_band]
            val = int(sum(int(v) << i for i, v in enumerate(chunk)))
            buckets[(b, val)].append(row_i)
    cand = set()
    for members in buckets.values():
        for i, j in itertools.permutations(members, 2):
            if ids[i] != ids[j]:
                cand.add((i, j))
    if not cand:
        return []
    cand = sorted(cand)
    ia = np.array([c[0] for c in cand])
    ib = np.array([c[1] for c in cand])
    m64 = embs.astype(np.float64)
    scores = np.einsum("ij,ij->i", m64[ia], m64[ib])
    ranked: Dict[str, List[Tuple[str, float]]] = defaultdict(list)
    for (i, j), sc in zip(cand, scores):
        if sc >= min_score:
            ranked[ids[i]].append((ids[j], float(sc)))
    ranked_rows = []
    for src in ranked:
        ranked[src].sort(key=lambda t: (-t[1], t[0]))
        for dst, sc in ranked[src][:top_k]:
            ranked_rows.append((src, dst, sc))
    # sequential reference gate (neo4j_db.py:633-641 semantics)
    topk: Dict[str, List[Tuple[str, float]]] = defaultdict(list)
    for src, dst, sc in ranked_rows:
        topk[src].append((dst, sc))
    edges: Dict[Tuple[str, str], Tuple[str, str, float]] = {}
    deg: Dict[str, int] = defaultdict(int)
    for src in sorted(topk):
        if deg[src] >= max_degree:
            continue
        for dst, sc in topk[src]:
            key = (min(src, dst), max(src, dst))
            if key in edges:
                continue
            edges[key] = (src, dst, sc)
            deg[src] += 1
            deg[dst] += 1
    return sorted(edges.values())


# ---------------------------------------------------------------------------
# EP3 retrieval + contextual compression expected table
# ---------------------------------------------------------------------------

def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _seq_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc += float(x) * float(x)
    return acc ** 0.5


def ep3_tables(n_convs: int) -> Dict[str, List[tuple]]:
    """Independent recomputation of the ep3_compressed_context query:
    the full EP3 assembly (vector top-5, per-doc entity top-40,
    band-gated 2-hop expansion, reference text format) followed by
    contextual compression (splitter 500/10, embedding filter 0.10),
    with every cosine computed as the LEFT-TO-RIGHT sequential fold the
    JVM aggregate uses. Returns both the ASSEMBLED context table
    (source, text, score, n_chunks, n_entities, n_rels, length) and the
    COMPRESSED one (source, compressed_text, n_pieces_kept,
    best_piece_sim, compressed_length)."""
    from ..functions.embedder import entity_embed, hash_embed
    from ..functions.splitter import split_text
    from ..sources.transcripts import generate_rows

    STRUCTURAL = {"PART_OF", "FIRST_CHUNK", "NEXT_CHUNK", "HAS_ENTITY", "SIMILAR"}
    rows = generate_rows(n_convs)
    res = run_oracle(rows)

    # unique chunks (dropDuplicates on chunk_id keeps one row; rows with
    # the same chunk_id are content-identical)
    uniq: Dict[str, Tuple[str, str]] = {}
    for c in res.chunks:
        uniq.setdefault(c["chunk_id"], (c["conv_id"], c["text"]))
    chunk_ids = sorted(uniq)
    embs = {
        cid: hash_embed([uniq[cid][1]], dim=64)[0].astype(np.float32)
        for cid in chunk_ids
    }

    # deterministic query vector: embedding of the min chunk_id
    qvec = [float(x) for x in embs[chunk_ids[0]]]
    qnorm = _seq_norm(qvec)

    # ---- vector top-k (brute force, k=5) ------------------------------
    scored = []
    for cid in chunk_ids:
        v = embs[cid]
        cos = _seq_dot(v, qvec) / (_seq_norm(v) * qnorm)
        scored.append((cid, cos))
    scored.sort(key=lambda t: (-t[1], t[0]))
    hits = [(cid, round(cos, 6)) for cid, cos in scored[:5]]
    hit_set = {cid for cid, _ in hits}

    # ---- edges (build_edges dedup on (src, dst, rel_type, conv_id)) ---
    edge_rows = {
        (e["src"], e["dst"], e["rel_type"], e["conv_id"]) for e in res.edges
    }
    has_ent = {(s, d) for s, d, r, _ in edge_rows if r == "HAS_ENTITY"}
    pred_edges_all = {
        (s, d, r) for s, d, r, _ in edge_rows if r not in STRUCTURAL
    }

    # ---- nodes (build_nodes without canonical map) ---------------------
    groups: Dict[str, list] = defaultdict(list)
    for m in res.mentions:
        groups[m["node_id"]].append(m)
    node_label: Dict[str, str] = {}
    node_name: Dict[str, str] = {}
    for nid, ms in groups.items():
        lead = min(ms, key=lambda m: m["node_id"])
        typ = lead["type"] or "Entity"
        node_label[nid] = f"{typ}:{lead['name']}"
        node_name[nid] = lead["name"]

    # ---- per-document text block + avg score --------------------------
    by_conv: Dict[str, list] = defaultdict(list)
    for cid, sc in hits:
        conv, text = uniq[cid]
        by_conv[conv].append((sc, cid, text))
    doc_text: Dict[str, Tuple[str, float, int]] = {}
    for conv, items in by_conv.items():
        items.sort(key=lambda t: (-t[0], t[1], t[2]))
        block = "\n----\n".join(t for _, _, t in items)
        score = sum(t[0] for t in items) / len(items)
        doc_text[conv] = (block, score, len(items))

    # ---- per-document top-40 entities ----------------------------------
    doc_ents: Dict[str, list] = {}
    for conv, items in by_conv.items():
        counts: Dict[str, int] = defaultdict(int)
        for _, cid, _ in items:
            for s, d in has_ent:
                if s == cid:
                    counts[d] += 1
        ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:40]
        doc_ents[conv] = [nid for nid, _ in ranked]

    # ---- band gate [0.3, 0.9) on entity-vs-query cosine ----------------
    qn = qnorm or 1.0
    qunit = [x / qn for x in qvec]
    names_sorted = sorted(node_label)
    ents_mat = entity_embed([node_name[n] for n in names_sorted], dim=64)
    in_band = set()
    for nid, vec in zip(names_sorted, ents_mat.astype(np.float32)):
        cos = _seq_dot(vec, qunit)
        if 0.3 <= cos < 0.9:
            in_band.add(nid)
    pred_edges = {(s, d, r) for s, d, r in pred_edges_all if d in in_band}

    # ---- per-seed 2-hop expansion --------------------------------------
    expanded: set = set()  # (seed, src, dst, rel)
    for conv, seeds in doc_ents.items():
        frontier = set(seeds)
        for _hop in (1, 2):
            step = {(conv, s, d, r) for s, d, r in pred_edges if s in frontier}
            expanded |= step
            frontier = {d for _, _, d, _ in step}

    # ---- assembly -------------------------------------------------------
    ctx_rows = []
    for conv in doc_text:
        exp = [(s, d, r) for cv, s, d, r in expanded if cv == conv]
        rel_lines = sorted(
            {f"{node_label[s]} {r} {node_label[d]}" for s, d, r in exp}
        )
        n_rels = len({(s, d, r) for s, d, r in exp})
        ent_ids = set(doc_ents.get(conv, []))
        ent_ids |= {s for s, _, _ in exp} | {d for _, d, _ in exp}
        ent_labels = sorted({node_label[n] for n in ent_ids if n in node_label})
        block, score, n_chunks = doc_text[conv]
        text = (
            "Text Content:\n" + block
            + "\n----\nEntities:\n" + "\n".join(ent_labels)
            + "\n----\nRelationships:\n" + "\n".join(rel_lines)
        )
        n_entities = len({n for n in ent_ids if n in node_label})
        ctx_rows.append(
            (conv, text, round(score, 6), n_chunks, n_entities, n_rels,
             len(text))
        )

    # ---- compression query vector: first piece of the min source -------
    ctx_rows.sort(key=lambda t: t[0])
    seps = ["Text:", "\n\n", "\n", "\n-"]
    first_piece = split_text(
        ctx_rows[0][1], chunk_size=500, chunk_overlap=10, separators=seps
    )[0]
    q2 = [float(x) for x in hash_embed([first_piece], dim=64)[0].astype(np.float32)]
    q2n = _seq_norm(q2) or 1.0
    q2unit = [x / q2n for x in q2]

    out = []
    for source, text, *_rest in ctx_rows:
        pieces = split_text(
            text, chunk_size=500, chunk_overlap=10, separators=seps
        )
        kept = []
        best = None
        for idx, piece in enumerate(pieces):
            v = hash_embed([piece], dim=64)[0].astype(np.float32)
            sim = _seq_dot(v, q2unit)
            if sim >= 0.10:
                kept.append((idx, piece))
                best = sim if best is None else max(best, sim)
        if not kept:
            continue
        kept.sort()
        compressed = "\n\n".join(p for _, p in kept)
        out.append(
            (source, compressed, len(kept), round(best, 6), len(compressed))
        )
    return {"assembled": ctx_rows, "compressed": sorted(out)}


# ---------------------------------------------------------------------------
# ANN IVF expected table (over embeddings.parquet)
# ---------------------------------------------------------------------------

def ivf_topk_py(
    vectors: Sequence[Tuple[int, Sequence[float]]],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 20000,
    query_cutoff: int = 5,
) -> List[Tuple[int, int, float, int]]:
    """Independent recomputation of the ann_ivf_topk query: same
    hash-ordered sample (via the XXH64 reimplementation), the same
    deterministic Lloyd's k-means, the same cell assignment / probe
    restriction, and cosine scored with the LEFT-TO-RIGHT sequential
    fold the JVM aggregate uses (bit-identical to round(cosine, 6))."""
    from .xxh64 import spark_xxhash64_str

    corpus = [(i, np.asarray(v, dtype=np.float32)) for i, v in vectors
              if i >= query_cutoff]
    queries = [(i, np.asarray(v, dtype=np.float32)) for i, v in vectors
               if i < query_cutoff]

    ordered = sorted(corpus, key=lambda t: (spark_xxhash64_str(str(t[0])), t[0]))
    sample = np.stack([v for _, v in ordered[:sample_size]]).astype(np.float32)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1

    cents = _kmeans_centroids_py(sample / norms, n_clusters)

    def seq_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def seq_norm(a) -> float:
        acc = 0.0
        for x in a:
            acc += float(x) * float(x)
        return acc ** 0.5

    cmat = np.stack([v for _, v in corpus]).astype(np.float32)
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0] = 1
    cells = np.argmax((cmat / cn) @ cents.T, axis=1)

    out: List[Tuple[int, int, float, int]] = []
    for qid, qv in queries:
        qn = np.linalg.norm(qv.reshape(1, -1), axis=1, keepdims=True)
        qn[qn == 0] = 1
        sims = (qv.reshape(1, -1) / qn) @ cents.T
        probe = set(np.argsort(-sims, axis=1)[0, :nprobe].tolist())
        qnorm = seq_norm(qv)
        scored = []
        for (cid, cv), cell in zip(corpus, cells):
            if int(cell) not in probe:
                continue
            cos = seq_dot(cv, qv) / (seq_norm(cv) * qnorm)
            scored.append((cid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (cid, cos) in enumerate(scored[:k], start=1):
            out.append((qid, cid, round(cos, 6), rank))
    return out


# ---------------------------------------------------------------------------
# c10_json_repair expected table (over events.parquet)
# ---------------------------------------------------------------------------

def c10_repair_table(
    events: Sequence[Tuple[int, str]],
) -> List[Tuple[int | None, int, int]]:
    """Replicates the c10_json_repair query's deterministic mangle
    (JVM-side SQL expressions) + repair + group-by-k aggregation.
    The repair itself reuses functions.jsonrepair (shared by design —
    this table pins the Spark DISTRIBUTION of the repair, the repair
    rules are independently pytest-golden-verified)."""
    from ..functions.jsonrepair import canonical_json

    agg: Dict[int | None, List[int]] = defaultdict(lambda: [0, 0])
    for event_id, props in events:
        m = event_id % 5
        if m == 0:
            mangled = "Here is the JSON:\n```json\n" + props + "\n```"
        elif m == 1:
            mangled = props.replace('"', "'")
        elif m == 2:
            mangled = re.sub(r"\}$", ",}", props)
        elif m == 3:
            mangled = props[: max(8, int(len(props) * 0.6))]
        else:
            mangled = props.replace("true", "True")
        fixed = canonical_json(mangled)
        k = None
        if fixed is not None:
            try:
                obj = json.loads(fixed)
                if isinstance(obj, dict) and isinstance(obj.get("k"), int):
                    k = obj["k"]
            except ValueError:
                pass
        agg[k][0] += 1
        if fixed is None:
            agg[k][1] += 1
    return sorted(
        ((k, n, bad) for k, (n, bad) in agg.items()),
        key=lambda t: (t[0] is None, t[0]),
    )


# ---------------------------------------------------------------------------
# semantic_dedup expected table (over embeddings.parquet) — SemDeDup
# ---------------------------------------------------------------------------

def semantic_dedup_py(
    vectors: Sequence[Tuple[int, Sequence[float]]],
    threshold: float = 0.95,
    n_clusters: int = 16,
    sample_size: int = 20000,
) -> List[Tuple[int, int, int, bool]]:
    """Independent recomputation of the semantic_dedup query (SemDeDup,
    Abbas et al. 2023): same hash-ordered centroid sample (via the XXH64
    reimplementation), same fixed-seed Lloyd's k-means, same float32
    nearest-centroid assignment, and the same sorted-by-id within-cluster
    float32 GEMM + union-find + farthest-from-centroid keeper — so every
    float comparison sees bit-identical values."""

    def norm32(mat: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1
        return mat / n

    ordered = sorted(
        ((i, np.asarray(v, dtype=np.float32)) for i, v in vectors),
        key=lambda t: (spark_xxhash64_str(str(t[0])), t[0]),
    )
    sample = np.stack([v for _, v in ordered[:sample_size]]).astype(np.float32)
    cents = _kmeans_centroids_py(norm32(sample), n_clusters)

    ids_all = np.array([i for i, _ in vectors], dtype="int64")
    mat_all = norm32(np.stack([np.asarray(v, dtype=np.float32) for _, v in vectors]))
    cells = np.argmax(mat_all @ cents.T, axis=1)

    out: List[Tuple[int, int, int, bool]] = []
    for cid in np.unique(cells):
        sel = np.nonzero(cells == cid)[0]
        order = np.argsort(ids_all[sel], kind="stable")
        sel = sel[order]
        ids = ids_all[sel]
        mat = mat_all[sel]
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold

        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(iu[hit].tolist(), ju[hit].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.array([find(i) for i in range(len(ids))])
        cent_sim = mat @ cents[int(cid)]
        keep = np.zeros(len(ids), dtype=bool)
        for root in np.unique(roots):
            members = np.nonzero(roots == root)[0]
            keep[members[np.argmin(cent_sim[members])]] = True
        for k in range(len(ids)):
            out.append(
                (int(ids[k]), int(cid), int(ids[roots[k]]), bool(keep[k]))
            )
    out.sort(key=lambda t: t[0])
    return out


# ---------------------------------------------------------------------------
# decontaminate_bloom expected table — Bloom-filter decontamination
# ---------------------------------------------------------------------------

def _bloom_positions_py(gram: str, m_bits: int, k: int) -> List[int]:
    """Replicates dedup._bloom_positions: Kirsch–Mitzenmacher double
    hashing with h1 = xxhash64(gram), h2 = xxhash64(gram, int 7), both
    reduced mod m first (Python % on the signed value == Spark pmod)."""
    from .xxh64 import spark_xxhash64_str, spark_xxhash64_str_int

    p1 = spark_xxhash64_str(gram) % m_bits
    p2 = spark_xxhash64_str_int(gram, 7) % m_bits
    return [(p1 + i * p2) % m_bits for i in range(k)]


def _word_grams_py(text: str, ns: Sequence[int]) -> List[str]:
    """Replicates dedup._norm_grams_col: normalized word n-grams for
    every size in ns, concatenated (docs shorter than a size contribute
    nothing at that size)."""
    words = normalize_py(text).split(" ")
    out: List[str] = []
    for n in ns:
        if len(words) >= n:
            out.extend(
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            )
    return out


def decontaminate_bloom_py(
    docs: Sequence[Tuple[int, str]],
    bench_texts: Sequence[str],
    n: "int | Sequence[int]" = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> List[Tuple[int, int]]:
    """Independent recomputation of decontaminate_bloom — including the
    filter's deterministic false positives."""
    ns = sorted({int(x) for x in (n if isinstance(n, (list, tuple)) else [n])})
    bloom: set = set()
    for t in bench_texts:
        for g in set(_word_grams_py(t, ns)):
            bloom.update(_bloom_positions_py(g, m_bits, k))
    out: List[Tuple[int, int]] = []
    for doc_id, text in docs:
        n_flagged = sum(
            1
            for g in set(_word_grams_py(text, ns))
            if all(p in bloom for p in _bloom_positions_py(g, m_bits, k))
        )
        if n_flagged:
            out.append((doc_id, n_flagged))
    out.sort(key=lambda t: t[0])
    return out


# ---------------------------------------------------------------------------
# ann_ivfpq_topk expected table (over embeddings.parquet) — IVF-PQ
# ---------------------------------------------------------------------------

def ivfpq_topk_py(
    vectors: Sequence[Tuple[int, Sequence[float]]],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    m_sub: int = 16,
    n_codes: int = 32,
    sample_size: int = 20000,
    query_cutoff: int = 5,
) -> List[Tuple[int, int, float, int]]:
    """Independent recomputation of the ann_ivfpq_topk query: same
    hash-ordered sample, same fixed-seed spherical+Euclidean Lloyd's,
    same float32 PQ encode and fixed-order ADC accumulation — every
    float comparison sees bit-identical values."""

    corpus = [(i, np.asarray(v, dtype=np.float32)) for i, v in vectors
              if i >= query_cutoff]
    queries = [(i, np.asarray(v, dtype=np.float32)) for i, v in vectors
               if i < query_cutoff]

    ordered = sorted(corpus, key=lambda t: (spark_xxhash64_str(str(t[0])), t[0]))
    sample = np.stack([v for _, v in ordered[:sample_size]]).astype(np.float32)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1
    unit_sample = sample / norms
    cents = _kmeans_centroids_py(unit_sample, n_clusters)
    books = _pq_train_py(unit_sample, m_sub, n_codes)

    cmat = np.stack([v for _, v in corpus]).astype(np.float32)
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0] = 1
    cmat = cmat / cn
    cells = np.argmax(cmat @ cents.T, axis=1)
    codes = _pq_encode_py(cmat, books)

    out: List[Tuple[int, int, float, int]] = []
    for qid, qv in queries:
        n = np.linalg.norm(qv)
        q = qv / n if n else qv
        w = q.shape[0] // m_sub
        lut = np.stack(
            [books[j] @ q[j * w : (j + 1) * w] for j in range(m_sub)]
        ).astype(np.float32)
        probe = set(np.argsort(-(q @ cents.T))[:nprobe].tolist())
        scored = []
        for (cid, _), cell, code in zip(corpus, cells, codes):
            if int(cell) not in probe:
                continue
            acc = np.float32(0.0)
            for j in range(m_sub):
                acc += lut[j][code[j]]
            scored.append((cid, float(np.float64(acc))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (cid, s) in enumerate(scored[:k], start=1):
            out.append((qid, cid, round(s, 6), rank))
    return out


# ---------------------------------------------------------------------------
# dsir_select expected table (over documents.parquet) — importance resampling
# ---------------------------------------------------------------------------

def dsir_select_py(
    docs: Sequence[Tuple[int, str]],
    target_texts: Sequence[str],
    k: int = 50,
    n: "int | Sequence[int]" = (1, 2),
    n_buckets: int = 2048,
    alpha: float = 0.5,
    temperature: float = 1.0,
) -> List[Tuple[int, int, int, int, int, int]]:
    """Independent recomputation of operators/dsir.dsir_select (Xie et
    al. 2023 Gumbel-top-k importance resampling): same normalized
    grams, same xxhash64 bucket trick, same micro-nat integer
    arithmetic, same hash-derived Gumbel noise."""
    import math
    from collections import Counter

    from .xxh64 import _to_signed, spark_xxhash64_str, xxh64_long

    ns = sorted({int(x) for x in (n if isinstance(n, (list, tuple)) else [n])})

    def buckets_of(text: str) -> List[int]:
        return [
            spark_xxhash64_str(g) % n_buckets for g in _word_grams_py(text, ns)
        ]

    doc_buckets = {doc_id: buckets_of(text) for doc_id, text in docs}
    raw_counts: Counter = Counter()
    for bs in doc_buckets.values():
        raw_counts.update(bs)
    tgt_counts: Counter = Counter()
    for t in target_texts:
        tgt_counts.update(buckets_of(t))
    t_raw, t_tgt = sum(raw_counts.values()), sum(tgt_counts.values())
    denom = alpha * n_buckets
    lr = {
        b: int(
            round(
                (
                    math.log((tgt_counts.get(b, 0) + alpha) / (t_tgt + denom))
                    - math.log((raw_counts.get(b, 0) + alpha) / (t_raw + denom))
                )
                * 1000000
            )
        )
        for b in set(raw_counts) | set(tgt_counts)
    }
    keyed = []
    for doc_id, bs in doc_buckets.items():
        if not bs:
            continue
        logw = sum(lr[b] for b in bs)
        h = _to_signed(xxh64_long(doc_id)) % (1 << 53)
        u = (h + 0.5) / float(1 << 53)
        gum = int(round(-math.log(-math.log(u)) * 1000000))
        key = int(round(logw / temperature)) + gum
        keyed.append((doc_id, len(bs), logw, gum, key))
    keyed.sort(key=lambda t: (-t[4], t[0]))
    return [
        (doc_id, ng, logw, gum, key, rank)
        for rank, (doc_id, ng, logw, gum, key) in enumerate(keyed[:k], start=1)
    ]


# ---------------------------------------------------------------------------
# quality_classifier expected table (over documents.parquet)
# ---------------------------------------------------------------------------

def quality_classifier_py(
    docs: Sequence[Tuple[int, str]],
) -> List[Tuple[int, int, int, float, float, bool]]:
    """Independent recomputation of textmetrics.quality_classifier:
    same vendored micro-int weights, same xxhash64 bucketing, same
    fixed operation order for the mean-bag logit and sigmoid."""
    import math

    from ..functions import quality_clf_weights as qw
    from .xxh64 import spark_xxhash64_str

    out: List[Tuple[int, int, int, float, float, bool]] = []
    for doc_id, text in docs:
        buckets = [
            spark_xxhash64_str(g) % qw.B_BUCKETS
            for g in _word_grams_py(text, list(qw.NS))
        ]
        if not buckets:
            continue
        dot = sum(qw.W_MICRO[b] for b in buckets)
        n = len(buckets)
        logit = qw.BIAS_MICRO / 1000000.0 + (dot / n) / 1000000.0
        prob = 1.0 / (1.0 + math.exp(-logit))
        out.append(
            (doc_id, n, dot, round(logit, 6), round(prob, 6), logit >= 0)
        )
    out.sort(key=lambda t: t[0])
    return out


# ---------------------------------------------------------------------------
# kg_graph_pagerank expected table — integer PageRank + degrees over the
# canonicalized KG edge list
# ---------------------------------------------------------------------------

def pagerank_py(
    pairs: Sequence[Tuple[str, str]],
    iterations: int = 10,
    damping_pct: int = 85,
) -> Dict[str, int]:
    """Independent recomputation of operators/graph.pagerank: identical
    integer micro-unit recurrence (Python // on non-negative values ==
    Spark ``div``)."""
    from collections import Counter, defaultdict

    ps = sorted(set(pairs))
    out_deg = Counter(s for s, _ in ps)
    nodes = sorted({s for s, _ in ps} | {d for _, d in ps})
    n = len(nodes)
    if n == 0:
        return {}
    teleport = ((100 - damping_pct) * 1_000_000) // 100
    r = {v: 1_000_000 for v in nodes}
    for _ in range(iterations):
        share = {u: r[u] // out_deg[u] for u in out_deg}
        inbound: Dict[str, int] = defaultdict(int)
        for s, d in ps:
            inbound[d] += share[s]
        dang = sum(r[v] for v in nodes if v not in out_deg)
        ds = dang // n
        r = {
            v: teleport + (damping_pct * (inbound.get(v, 0) + ds)) // 100
            for v in nodes
        }
    return r


def kg_graph_pagerank_table(n_convs: int) -> List[Tuple[str, int, int, int]]:
    """(node_id, rank_micro, out_deg, in_deg) over the canonicalized KG
    edge list of a generate_rows(n_convs) corpus — edge endpoints pass
    through the canonical map exactly as the Spark pipeline's
    endpoint-rewrite stage (J6) does."""
    from collections import Counter

    from ..sources.transcripts import generate_rows
    from .reference_oracle import run_oracle

    res = run_oracle(generate_rows(n_convs), deduplicate_nodes=True)
    canon = _canon_of(res.canonical_map or {})
    pairs = sorted(
        {(canon(e["src"]), canon(e["dst"])) for e in res.edges}
    )
    ranks = pagerank_py(pairs)
    out_deg = Counter(s for s, _ in pairs)
    in_deg = Counter(d for _, d in pairs)
    return [
        (v, ranks[v], out_deg.get(v, 0), in_deg.get(v, 0))
        for v in sorted(ranks)
    ]


# ---------------------------------------------------------------------------
# kg_graph_ppr expected table — seed-personalized integer PageRank over the
# canonicalized KG edge list
# ---------------------------------------------------------------------------

def ppr_py(
    pairs: Sequence[Tuple[str, str]],
    seeds: Sequence[str],
    iterations: int = 10,
    damping_pct: int = 85,
) -> Dict[str, int]:
    """Independent recomputation of operators/graph.personalized_pagerank:
    identical integer recurrence — teleport AND dangling mass return to
    the seed set only."""
    from collections import Counter, defaultdict

    ps = sorted(set(pairs))
    out_deg = Counter(a for a, _ in ps)
    nodes = sorted({a for a, _ in ps} | {b for _, b in ps})
    seed_set = set(seeds)
    missing = seed_set - set(nodes)
    if missing:
        raise ValueError(f"seeds not in graph: {sorted(missing)}")
    s = len(seed_set)
    teleport = ((100 - damping_pct) * 1_000_000) // 100
    r = {v: (1_000_000 if v in seed_set else 0) for v in nodes}
    for _ in range(iterations):
        share = {u: r[u] // out_deg[u] for u in out_deg}
        inbound: Dict[str, int] = defaultdict(int)
        for a, b in ps:
            inbound[b] += share[a]
        dang = sum(r[v] for v in nodes if v not in out_deg)
        r = {
            v: (teleport if v in seed_set else 0)
            + (
                damping_pct
                * (inbound.get(v, 0) + (dang // s if v in seed_set else 0))
            )
            // 100
            for v in nodes
        }
    return r


def kg_graph_ppr_table(n_convs: int) -> List[Tuple[str, int]]:
    """(node_id, ppr_micro) over the canonicalized KG edge list of a
    generate_rows(n_convs) corpus, seeded on the 3 lexicographically
    smallest node ids (the Spark query derives the same seeds with a
    bounded sort-limit collect)."""
    from ..sources.transcripts import generate_rows
    from .reference_oracle import run_oracle

    res = run_oracle(generate_rows(n_convs), deduplicate_nodes=True)
    canon = _canon_of(res.canonical_map or {})
    pairs = sorted(
        {(canon(e["src"]), canon(e["dst"])) for e in res.edges}
    )
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    seeds = nodes[:3]
    ranks = ppr_py(pairs, seeds)
    return [(v, ranks[v]) for v in sorted(ranks)]


# ---------------------------------------------------------------------------
# graph_kcore expected table — k-core peeling over the thresholded supplier
# co-occurrence graph
# ---------------------------------------------------------------------------

def k_core_py(
    pairs: Sequence[Tuple[int, int]], k: int
) -> List[Tuple[int, int]]:
    """Independent recomputation of operators/graph.k_core: peel nodes
    of degree < k to fixpoint; returns sorted (node, core_degree)."""
    from collections import Counter

    und = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    while True:
        deg = Counter()
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        low = {v for v, d in deg.items() if d < k}
        if not low:
            return sorted(deg.items())
        und = {(a, b) for a, b in und if a not in low and b not in low}


# ---------------------------------------------------------------------------
# tokenize_and_pack expected table (over documents.parquet)
# ---------------------------------------------------------------------------

def tokenize_and_pack_py(
    docs: Sequence[Tuple[int, str]], max_tokens: int = 512
) -> List[Tuple[int, int, str]]:
    """Independent recomputation of operators/tokenize.tokenize_and_pack:
    the naive semantics — encode every doc with the vendored BPE,
    concatenate in doc_id order, chunk the global stream."""
    from ..functions.bpe import bpe_encode

    stream: List[int] = []
    for _, text in sorted(docs, key=lambda t: t[0]):
        stream.extend(bpe_encode(text))
    out: List[Tuple[int, int, str]] = []
    for b in range((len(stream) + max_tokens - 1) // max_tokens):
        chunk = stream[b * max_tokens : (b + 1) * max_tokens]
        out.append((b, len(chunk), ",".join(map(str, chunk))))
    return out


# ---------------------------------------------------------------------------
# training_data_pipeline expected table — the composed curation capstone
# ---------------------------------------------------------------------------

def training_data_pipeline_py(
    docs: Sequence[Tuple[int, str]],
    k: int = 200,
    n_buckets: int = 2048,
    max_tokens: int = 256,
) -> List[Tuple[int, int, str]]:
    """Independent recomputation of the composed pipeline: learned
    quality gate -> DSIR top-k selection (target = every 7th KEPT doc)
    -> tokenize-and-pack in doc_id order. Each stage reuses the same
    pure-Python replication the per-stage oracles are built on, so the
    COMPOSITION is what this checks."""
    kept_ids = {r[0] for r in quality_classifier_py(docs) if r[5]}
    kept = [(i, t) for i, t in docs if i in kept_ids]
    target_texts = [t for i, t in kept if i % 7 == 0]
    selected = {
        r[0]
        for r in dsir_select_py(
            kept, target_texts, k=k, n_buckets=n_buckets
        )
    }
    chosen = [(i, t) for i, t in kept if i in selected]
    return tokenize_and_pack_py(chosen, max_tokens=max_tokens)


# ---------------------------------------------------------------------------
# Pinned centroid/codebook fitting for the ANN/SemDeDup oracles.
#
# These deliberately do NOT import operators/ann.py: the oracle must be
# a fixed, engine-independent reference, so an (accidental) change to
# the engine's k-means/PQ helpers surfaces as a snapshot hash mismatch
# here instead of silently propagating into the oracle and blinding the
# parity gate. The procedures below are the operator's published
# parameter-derivation spec (fixed-seed Lloyd's, 8 iters, float32 in /
# float64 centroid accumulation for the spherical variant).
# ---------------------------------------------------------------------------

def _kmeans_centroids_py(
    sample: "np.ndarray", n_clusters: int, iters: int = 8
) -> "np.ndarray":
    """Spherical Lloyd's on unit rows: seed-42 choice init, argmax-dot
    assignment, re-normalized float64 mean update, float32 result."""
    rng = np.random.default_rng(42)
    pick = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[pick].astype(np.float64)
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents.astype(np.float32)


def _lloyd_l2_py(sample: "np.ndarray", n_codes: int, iters: int = 8) -> "np.ndarray":
    """Euclidean Lloyd's (PQ subvectors are not unit): seed-42 init,
    squared-distance argmin assignment, float32 mean update."""
    rng = np.random.default_rng(42)
    pick = rng.choice(len(sample), size=min(n_codes, len(sample)), replace=False)
    cents = sample[pick].astype(np.float32)
    for _ in range(iters):
        d = (
            np.sum(sample**2, axis=1, keepdims=True)
            - 2.0 * (sample @ cents.T)
            + np.sum(cents**2, axis=1)
        )
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.astype(np.float32)


def _pq_train_py(sample: "np.ndarray", m_sub: int, n_codes: int):
    w = sample.shape[1] // m_sub
    return [
        _lloyd_l2_py(np.ascontiguousarray(sample[:, j * w : (j + 1) * w]), n_codes)
        for j in range(m_sub)
    ]


def _pq_encode_py(mat: "np.ndarray", books) -> "np.ndarray":
    m_sub = len(books)
    w = mat.shape[1] // m_sub
    cols = []
    for j, book in enumerate(books):
        sub = mat[:, j * w : (j + 1) * w]
        d = (
            np.sum(sub**2, axis=1, keepdims=True)
            - 2.0 * (sub @ book.T)
            + np.sum(book**2, axis=1)
        )
        cols.append(np.argmin(d, axis=1).astype("int32"))
    return np.stack(cols, axis=1)


def lpa_py(
    pairs: Sequence[Tuple[int, int]], max_iter: int = 10
) -> List[Tuple[int, int, int]]:
    """Independent recomputation of operators/graph.label_propagation:
    deterministic synchronous LPA, min-label tie-break, early stop at
    fixpoint. Returns sorted (node, label, n_iter)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    n_iter = 0
    for _ in range(max_iter):
        n_iter += 1
        new = {}
        for n in adj:
            counts = Counter(labels[z] for z in adj[n])
            top = max(counts.values())
            new[n] = min(lbl for lbl, c in counts.items() if c == top)
        changed = new != labels
        labels = new
        if not changed:
            break
    return sorted((n, lbl, n_iter) for n, lbl in labels.items())


def mmr_topk_py(
    vectors: Sequence[Tuple[int, Sequence[float]]],
    n_candidates: int = 25,
    k: int = 10,
    lambda_pct: int = 70,
    query_cutoff: int = 5,
) -> List[Tuple[int, int, float, int, int]]:
    """Independent recomputation of the ann_mmr_topk query: brute-force
    cosine top-n_candidates per query (sequential left-to-right fold,
    bit-identical to the JVM aggregate at round 6), then the
    deterministic MMR greedy sweep with integer-micro comparison and
    vec_id tie-break."""
    corpus = [(i, np.asarray(v, dtype=np.float32)) for i, v in vectors
              if i >= query_cutoff]
    queries = [(i, np.asarray(v, dtype=np.float32)) for i, v in vectors
               if i < query_cutoff]
    lam = lambda_pct / 100.0

    def seq_cosine(a, b) -> float:
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            x = float(x)
            y = float(y)
            dot += x * y
            na += x * x
            nb += y * y
        denom = (na ** 0.5) * (nb ** 0.5)
        return round(dot / denom, 6) if denom > 0 else 0.0

    out: List[Tuple[int, int, float, int, int]] = []
    for qid, qv in sorted(queries, key=lambda t: t[0]):
        scored = sorted(
            ((seq_cosine(cv, qv), cid, cv) for cid, cv in corpus),
            key=lambda t: (-t[0], t[1]),
        )[:n_candidates]
        # greedy MMR over the candidate set, intake in vec_id order
        cands = sorted(scored, key=lambda t: t[1])
        ids = [cid for _, cid, _ in cands]
        rels = [rel for rel, _, _ in cands]
        vecs = [cv for _, _, cv in cands]
        remaining = list(range(len(ids)))
        max_sim = [0.0] * len(ids)
        picked: List[Tuple[int, int, float, int, int]] = []
        for rank in range(1, min(k, len(ids)) + 1):
            best = None
            best_key = None
            for i in remaining:
                mmr = lam * rels[i] - (1.0 - lam) * (
                    max_sim[i] if picked else 0.0
                )
                key = (-round(mmr * 1_000_000), ids[i])
                if best_key is None or key < best_key:
                    best_key = key
                    best = i
            picked.append((qid, ids[best], rels[best], -best_key[0], rank))
            remaining.remove(best)
            for i in remaining:
                s = seq_cosine(vecs[i], vecs[best])
                if s > max_sim[i]:
                    max_sim[i] = s
        out.extend(picked)
    return out


def compression_ratio_py(docs: "list[tuple]") -> "list[tuple]":
    """Pure-Python twin of textmetrics.compression_signals: zlib
    level-6 compressed size per document — same CPython zlib as the
    Spark-side pandas UDF, so parity is bit-exact by construction
    (pinned to level 6; a zlib version change would shift both sides
    together inside one container)."""
    import zlib

    out = []
    for doc_id, text in docs:
        if text is None:
            continue
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        ratio = (comp * 1_000_000) // len(raw) if raw else 0
        out.append((doc_id, len(raw), comp, ratio))
    return out


def pca_project_py(
    vectors: Sequence[Tuple[int, Sequence[float]]],
    dim: int = 64,
    k: int = 8,
) -> List[Tuple[int, int, int]]:
    """Independent replication of operators/pca.py fit+project:
    (vec_id, pc, value_micro) rows.

    The distributed parts — micro-truncated mean sums, per-row
    micro-truncated Gram products, the sequential projection fold —
    are re-derived here as plain Python loops over plain floats (no
    numpy vectorization), matching the Spark side bit-for-bit because
    every float op is the same IEEE-754 double op in the same order
    and every truncation is toward zero on both sides. The one shared
    dependency is ``numpy.linalg.eigh``: eigendecomposition is a
    deterministic driver-local function of the (independently
    verified) integer Gram matrix on BOTH sides, so sharing it does
    not launder any distributed-arithmetic bug.
    """
    micro = 1_000_000
    n = len(vectors)
    if n == 0:
        raise ValueError("empty input")
    msum = [0] * dim
    for _, v in vectors:
        for i in range(dim):
            msum[i] += int(float(v[i]) * micro)
    mean = [float(msum[i]) / float(n * micro) for i in range(dim)]

    tri = [[0] * dim for _ in range(dim)]
    for _, v in vectors:
        c = [float(v[i]) - mean[i] for i in range(dim)]
        for a in range(dim):
            ca = c[a]
            row = tri[a]
            for b in range(a, dim):
                row[b] += int((ca * c[b]) * micro)
    g = np.zeros((dim, dim), dtype=np.float64)
    for a in range(dim):
        for b in range(a, dim):
            g[a, b] = g[b, a] = float(tri[a][b])

    eigvals, eigvecs = np.linalg.eigh(g)
    comps = []
    for j in range(dim - 1, dim - 1 - k, -1):
        col = [float(eigvecs[i, j]) for i in range(dim)]
        pivot = max(range(dim), key=lambda i: (abs(col[i]), -i))
        if col[pivot] < 0:
            col = [-x for x in col]
        comps.append(col)

    out: List[Tuple[int, int, int]] = []
    for vec_id, v in vectors:
        c = [float(v[i]) - mean[i] for i in range(dim)]
        for j, comp in enumerate(comps):
            acc = 0.0
            for i in range(dim):
                acc = acc + c[i] * comp[i]
            out.append((vec_id, j, int(acc * micro)))
    return out


# ---------------------------------------------------------------------------
# distributed quality-classifier TRAINING — pure-Python replication of
# operators/clf_train.train_quality_classifier (same integer-micro
# state, same floor-truncated gradient terms, same float op order)
# ---------------------------------------------------------------------------

def train_quality_clf_py(
    labeled_docs: Sequence[Tuple[int, str, float]],
    n_buckets: int = 1024,
    ns: Sequence[int] = (1, 2),
    epochs: int = 20,
    lr_ppm: int = 2_000_000,
) -> List[Tuple[int, int]]:
    """(doc_id, text, label) -> [(bucket, w_micro)] with bucket -1 =
    bias. Gram-less docs are excluded, exactly like the Spark trainer."""
    import math

    from .xxh64 import spark_xxhash64_str

    feats: List[Tuple[dict, int, float]] = []  # (bucket->cnt, n_grams, y)
    for _doc_id, text, y in labeled_docs:
        grams = _word_grams_py(text, list(ns))
        if not grams:
            continue
        cnts: dict = {}
        for g in grams:
            bkt = spark_xxhash64_str(g) % n_buckets
            cnts[bkt] = cnts.get(bkt, 0) + 1
        feats.append((cnts, len(grams), float(y)))
    if not feats:
        raise ValueError("no trainable documents")
    n_docs = len(feats)
    w = [0] * n_buckets
    b = 0
    denom = 1_000_000 * n_docs
    for _ in range(epochs):
        gsum = [0] * n_buckets
        gbias = 0
        for cnts, n_grams, y in feats:
            dot = sum(c * w[k] for k, c in cnts.items())
            logit = b / 1000000.0 + (dot / n_grams) / 1000000.0
            g = 1.0 / (1.0 + math.exp(-logit)) - y
            for k, c in cnts.items():
                gsum[k] += math.floor(g * c / n_grams * 1000000.0)
            gbias += math.floor(g * 1000000.0)
        for k in range(n_buckets):
            w[k] -= (lr_ppm * gsum[k]) // denom
        b -= (lr_ppm * gbias) // denom
    out = [(k, int(x)) for k, x in enumerate(w)]
    out.append((-1, int(b)))
    return out


# ---------------------------------------------------------------------------
# distributed TransE training — pure-Python replication of
# operators/kge.train_transe (same md5 init + corruption, same integer
# gradients, same trunc-toward-zero divisions, same isqrt normalize)
# ---------------------------------------------------------------------------

def _md5_u32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _tdiv(a: int, b: int) -> int:
    """Trunc-toward-zero integer division (Spark SQL `div`), b > 0."""
    q = abs(a) // b
    return q if a >= 0 else -q


def transe_py(
    triples: "Sequence[Tuple[str, str, str]]",
    dim: int = 16,
    epochs: int = 5,
    lr_ppm: int = 100_000,
    margin_micro2: int = 1_000_000_000_000,
    init: int = 1_000_000,
    sides: "Sequence[str]" = ("src", "dst"),
) -> "List[Tuple[str, str, int, int]]":
    """(src, rel, dst) strings -> [(kind, node_id, d, v_micro)]."""
    import math

    SEP = "\x1f"
    tri = sorted(set(triples))
    n_triples = len(tri)
    ents = sorted({h for h, _r, _t in tri} | {t for _h, _r, t in tri})
    rels = sorted({r for _h, r, _t in tri})
    n_ents = len(ents)
    true_set = set(tri)

    # per-epoch negative slices (negative_samples with k=epochs)
    neg_terms: "List[List[Tuple[str, str, str, str, str]]]" = [
        [] for _ in range(epochs)
    ]
    for h, r, t in tri:
        for side in sides:
            for j in range(epochs):
                key = SEP.join([side, h, r, t, str(j)])
                neg = ents[_md5_u32_py(key) % n_ents]  # idx+1, 1-based
                if side == "src":
                    if neg == h or (neg, r, t) in true_set:
                        continue
                else:
                    if neg == t or (h, r, neg) in true_set:
                        continue
                neg_terms[j].append((h, r, t, side, neg))

    emb: "dict" = {}
    for e in ents:
        emb[("e", e)] = [
            _md5_u32_py(SEP.join(["e", e, str(i)])) % (2 * init + 1) - init
            for i in range(dim)
        ]
    for r in rels:
        emb[("r", r)] = [
            _md5_u32_py(SEP.join(["r", r, str(i)])) % (2 * init + 1) - init
            for i in range(dim)
        ]

    def normalize_entities() -> None:
        for e in ents:
            v = emb[("e", e)]
            ss = sum(x * x for x in v)
            norm = max(1, math.floor(math.sqrt(float(ss))))
            emb[("e", e)] = [_tdiv(x * 1_000_000, norm) for x in v]

    denom = 1_000_000 * n_triples
    for epoch in range(epochs):
        normalize_entities()
        gsum: "dict" = {}
        for h, r, t, side, neg in neg_terms[epoch]:
            eh, er, et = emb[("e", h)], emb[("r", r)], emb[("e", t)]
            en = emb[("e", neg)]
            dp = [eh[i] + er[i] - et[i] for i in range(dim)]
            if side == "src":
                dn = [en[i] + er[i] - et[i] for i in range(dim)]
            else:
                dn = [eh[i] + er[i] - en[i] for i in range(dim)]
            hinge = (
                margin_micro2
                + sum(x * x for x in dp)
                - sum(x * x for x in dn)
            )
            if hinge <= 0:
                continue

            def add(kind: str, node: str, g: "List[int]") -> None:
                acc = gsum.setdefault((kind, node), [0] * dim)
                for i in range(dim):
                    acc[i] += g[i]

            if side == "dst":
                add("e", h, [2 * dp[i] - 2 * dn[i] for i in range(dim)])
            else:
                add("e", h, [2 * dp[i] for i in range(dim)])
            add("r", r, [2 * dp[i] - 2 * dn[i] for i in range(dim)])
            if side == "src":
                add("e", t, [2 * dn[i] - 2 * dp[i] for i in range(dim)])
            else:
                add("e", t, [-2 * dp[i] for i in range(dim)])
            if side == "src":
                add("e", neg, [-2 * dn[i] for i in range(dim)])
            else:
                add("e", neg, [2 * dn[i] for i in range(dim)])
        for key, g in gsum.items():
            v = emb[key]
            emb[key] = [
                v[i] - _tdiv(g[i] * lr_ppm, denom) for i in range(dim)
            ]
    normalize_entities()
    out: "List[Tuple[str, str, int, int]]" = []
    for (kind, node), v in sorted(emb.items()):
        for i, x in enumerate(v):
            out.append((kind, node, i, int(x)))
    return out


# ---------------------------------------------------------------------------
# gazetteer mention detection — independent naive matcher (try every
# entry at every position; the operator walks a token trie)
# ---------------------------------------------------------------------------

def gazetteer_tag_py(
    docs: Sequence[Tuple[int, str]],
) -> List[Tuple[int, int, int, str, str]]:
    """Dictionary = the first two normalized words of every 10th doc
    with >= 2 words (entity_id = 'g<doc_id>'); tags ALL docs with the
    leftmost-longest policy. Returns (doc_id, start_tok, end_tok,
    surface, entity_id) sorted."""
    entries: List[Tuple[str, List[str]]] = []
    for doc_id, text in docs:
        if doc_id % 10 == 0:
            toks = normalize_py(text).split(" ")
            if len(toks) >= 2 and toks[0]:
                entries.append((f"g{doc_id}", toks[:2]))
    out: List[Tuple[int, int, int, str, str]] = []
    for doc_id, text in docs:
        toks = normalize_py(text).split(" ")
        if toks == [""]:
            toks = []
        i = 0
        while i < len(toks):
            best_len = 0
            best_ids: List[str] = []
            for eid, etoks in entries:
                if toks[i : i + len(etoks)] == etoks:
                    if len(etoks) > best_len:
                        best_len, best_ids = len(etoks), [eid]
                    elif len(etoks) == best_len:
                        best_ids.append(eid)
            if best_len:
                surface = " ".join(toks[i : i + best_len])
                for eid in sorted(set(best_ids)):
                    out.append((doc_id, i, i + best_len, surface, eid))
                i += best_len
            else:
                i += 1
    out.sort()
    return out


# ---------------------------------------------------------------------------
# operators/kge.rank_metrics (filtered link-prediction ranking; same
# integer energies and cand < true_id tie-break)
# ---------------------------------------------------------------------------

def rank_metrics_py(
    emb_rows: "List[Tuple[str, str, int, int]]",
    test_triples: "Sequence[Tuple[str, str, str]]",
    known_triples: "Sequence[Tuple[str, str, str]]",
    sides: "Sequence[str]" = ("src", "dst"),
) -> "List[Tuple[str, str, str, str, int, int, int]]":
    """(kind, node_id, d, v_micro) rows + test/known triples ->
    [(side, src, rel, dst, true_energy, rank_pos, rr_ppm)] sorted."""
    emb: "dict" = {}
    for kind, node, d, v in emb_rows:
        emb.setdefault((kind, node), {})[d] = v
    vecs = {
        k: [ds[i] for i in range(len(ds))] for k, ds in emb.items()
    }
    ents = sorted(n for (k, n) in vecs if k == "e")
    known = set(tuple(t) for t in known_triples)
    out = []
    for h, r, t in sorted(set(test_triples)):
        eh, er, et = vecs[("e", h)], vecs[("r", r)], vecs[("e", t)]
        dim = len(eh)
        for side in sides:
            if side == "dst":
                q = [eh[i] + er[i] for i in range(dim)]
                true_id, true_vec = t, et
            else:
                q = [et[i] - er[i] for i in range(dim)]
                true_id, true_vec = h, eh
            te = sum((q[i] - true_vec[i]) ** 2 for i in range(dim))
            rank = 1
            for c in ents:
                if c == true_id:
                    continue
                corrupt = (h, r, c) if side == "dst" else (c, r, t)
                if corrupt in known:
                    continue
                ec = vecs[("e", c)]
                ce = sum((q[i] - ec[i]) ** 2 for i in range(dim))
                if ce < te or (ce == te and c < true_id):
                    rank += 1
            out.append((side, h, r, t, te, rank, 1_000_000 // rank))
    out.sort()
    return out


def msf_py(
    edges: "Sequence[tuple]",
) -> "List[Tuple[str, str, int]]":
    """Kruskal minimum spanning forest under the (w, lo, hi) strict
    total order — the algorithm-independent twin of
    operators/graph.minimum_spanning_forest (which is Boruvka; both
    compute the UNIQUE forest once the edge order is total).

    ``edges``: (a, b, w) triples, any direction, dups/self-loops
    allowed; endpoints are canonicalized as strings (lo = min, hi =
    max, string order — matching the Spark operator's least/greatest
    on string-cast columns), duplicate pairs keep their min weight.
    Returns sorted (src, dst, weight) rows.
    """
    best: Dict[Tuple[str, str], int] = {}
    for a, b, w in edges:
        sa, sb = str(a), str(b)
        if sa == sb:
            continue
        lo, hi = (sa, sb) if sa < sb else (sb, sa)
        w = int(w)
        if (lo, hi) not in best or w < best[(lo, hi)]:
            best[(lo, hi)] = w
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    out: List[Tuple[str, str, int]] = []
    for (lo, hi), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(lo), find(hi)
        if ra != rb:
            parent[ra] = rb
            out.append((lo, hi, w))
    out.sort()
    return out


def node2vec_py(
    edges: "Sequence[tuple]",
    walk_length: int = 4,
    walks_per_node: int = 1,
    ret_w: int = 1,
    in_w: int = 1,
    out_w: int = 1,
) -> "List[Tuple[str, int, int, str]]":
    """Pure-Python replication of operators/walks.node2vec_walks:
    md5-drawn second-order biased walks over the distinct directed
    edge set. Returns sorted (start, walk_id, pos, node) rows."""
    adj: Dict[str, List[str]] = {}
    nodes = set()
    eset = set()
    for a, b in {(str(a), str(b)) for a, b, *_ in edges}:
        adj.setdefault(a, []).append(b)
        eset.add((a, b))
        nodes.add(a)
        nodes.add(b)
    for k in adj:
        adj[k].sort()
    out: List[Tuple[str, int, int, str]] = []
    for start in sorted(nodes):
        for wid in range(walks_per_node):
            node, prev = start, None
            out.append((start, wid, 0, node))
            for t in range(walk_length - 1):
                cands = adj.get(node)
                if not cands:
                    break
                draw = _md5_u32_py(
                    "\x1f".join((start, str(wid), str(t)))
                )
                if prev is None:
                    nxt = cands[draw % len(cands)]
                else:
                    ws = [
                        ret_w if d == prev
                        else in_w if (prev, d) in eset
                        else out_w
                        for d in cands
                    ]
                    total = sum(ws)
                    if total == 0:
                        break
                    pick = draw % total
                    cum = 0
                    nxt = None
                    for d, w in zip(cands, ws):
                        cum += w
                        if pick < cum:
                            nxt = d
                            break
                prev, node = node, nxt
                out.append((start, wid, t + 1, node))
    out.sort()
    return out


def mis_py(edges: "Sequence[tuple]") -> "List[Tuple[str, int]]":
    """Pure-Python replication of
    operators/graph.maximal_independent_set: deterministic Luby with
    (md5_u32(node), node) priorities. Returns sorted
    (node_id, mis_round) rows."""
    adj: Dict[str, set] = {}
    for a, b in {(str(a), str(b)) for a, b in edges}:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    key = {n: (_md5_u32_py(n), n) for n in adj}
    live = set(adj)
    out: List[Tuple[str, int]] = []
    r = 0
    while live:
        winners = {
            n
            for n in live
            if all(
                key[n] < key[m] for m in adj[n] if m in live
            )
        }
        out.extend((n, r) for n in winners)
        dead = set(winners)
        for n in winners:
            dead |= adj[n] & live
        live -= dead
        r += 1
    out.sort()
    return out


def k_truss_py(
    edges: "Sequence[tuple]", k: int
) -> "List[Tuple[str, str, int]]":
    """Pure-Python replication of operators/graph.k_truss: iterative
    support peeling on the canonical undirected simple graph. Returns
    sorted (src, dst, support) survivors."""
    cur = set()
    for a, b in {(str(a), str(b)) for a, b in edges}:
        if a != b:
            cur.add((min(a, b), max(a, b)))
    while True:
        adj: Dict[str, set] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        support = {
            (a, b): len(adj[a] & adj[b]) for a, b in cur
        }
        dropped = {e for e, s in support.items() if s < k - 2}
        if not dropped:
            return sorted((a, b, s) for (a, b), s in support.items())
        cur -= dropped


def conv_metrics_table(n_convs: int) -> "List[tuple]":
    """Pure-Python replication of operators/convstats.conv_turn_metrics
    over the generate_rows(n_convs) corpus: per-conversation role mix,
    tool usage, span/cadence and user->assistant response latency in
    integer epoch-micros (trunc div)."""
    from ..sources.transcripts import generate_rows

    by_conv: Dict[str, list] = {}
    for conv_id, turn_idx, role, _text, tool, ts in generate_rows(n_convs):
        by_conv.setdefault(conv_id, []).append((turn_idx, role, tool, ts))
    out = []
    for conv_id in sorted(by_conv):
        rows = sorted(by_conv[conv_id])
        # naive-minus-naive subtraction: TZ-independent epoch micros
        # (ts.timestamp() would reinterpret the naive datetime in the
        # host's local zone; Spark's side is pinned to UTC sessions)
        from datetime import datetime, timedelta, timezone

        naive_epoch = datetime(1970, 1, 1)
        aware_epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
        us = [
            (ts - (aware_epoch if ts.tzinfo is not None else naive_epoch))
            // timedelta(microseconds=1)
            for (_, _, _, ts) in rows
        ]
        roles = [r for (_, r, _, _) in rows]
        tools = [t for (_, _, t, _) in rows if t is not None]
        gaps = [us[i] - us[i - 1] for i in range(1, len(us))]
        resp = [
            us[i] - us[i - 1]
            for i in range(1, len(rows))
            if roles[i] == "assistant" and roles[i - 1] == "user"
        ]
        out.append(
            (
                conv_id,
                len(rows),
                sum(1 for r in roles if r == "user"),
                sum(1 for r in roles if r == "assistant"),
                sum(1 for r in roles if r == "tool"),
                sum(1 for r in roles if r == "system"),
                len(tools),
                len(set(tools)),
                max(us) - min(us),
                max(gaps) if gaps else None,
                len(resp),
                _tdiv(sum(resp), len(resp)) if resp else None,
            )
        )
    return out


def sgns_py(
    pairs: "Sequence[tuple]",
    dim: int = 8,
    epochs: int = 3,
    k_neg: int = 2,
    lr_ppm: int = 500_000,
    init: int = 100_000,
    epoch_offset: int = 0,
    init_emb: "dict | None" = None,
) -> "List[Tuple[str, str, tuple]]":
    """Pure-Python bit-for-bit replication of
    operators/sgns.train_sgns. ``pairs``: (center, context) with
    multiplicity. Returns sorted (kind, node_id, emb-tuple)."""
    import math

    cnt: Dict[Tuple[str, str], int] = {}
    for c, x in pairs:
        cnt[(str(c), str(x))] = cnt.get((str(c), str(x)), 0) + 1
    ctxs = sorted({x for (_, x) in cnt})
    nodes = sorted({c for (c, _) in cnt} | set(ctxs))
    n_ctx = len(ctxs)

    def init_vec(kind: str, node: str):
        return [
            _md5_u32_py("\x1f".join([kind, node, str(i)])) % (2 * init + 1)
            - init
            for i in range(dim)
        ]

    emb = {("in", n): init_vec("in", n) for n in nodes}
    emb.update({("out", n): init_vec("out", n) for n in nodes})
    if init_emb:
        for key, vec in init_emb.items():
            if key in emb:
                emb[key] = list(vec)
    # negatives keyed by ABSOLUTE epoch + draw index (resume contract)
    negs: Dict[int, list] = {e: [] for e in range(epochs)}
    for (c, x), w in sorted(cnt.items()):
        for e in range(epochs):
            for j in range(k_neg):
                key = "\x1f".join(
                    [c, x, str(epoch_offset + e), str(j)]
                )
                v = ctxs[_md5_u32_py(key) % n_ctx]
                if v != x:
                    negs[e].append((c, v, w))
    for epoch in range(epochs):
        terms = [(c, x, w, 1) for (c, x), w in sorted(cnt.items())]
        terms += [(c, v, w, 0) for (c, v, w) in negs[epoch]]
        n_terms = sum(w for (_, _, w, _) in terms)
        grads: Dict[Tuple[str, str, int], int] = {}
        for c, x, w, y in terms:
            ein, eout = emb[("in", c)], emb[("out", x)]
            dot = sum(a * b for a, b in zip(ein, eout))
            g = 1.0 / (1.0 + math.exp(-(float(dot) / 1e12))) - float(y)
            for d in range(dim):
                grads[("in", c, d)] = grads.get(("in", c, d), 0) + int(
                    math.floor(g * eout[d])
                ) * w
                grads[("out", x, d)] = grads.get(("out", x, d), 0) + int(
                    math.floor(g * ein[d])
                ) * w
        denom = 1_000_000 * n_terms
        for (kind, node, d), gsum in grads.items():
            emb[(kind, node)][d] -= _tdiv(gsum * lr_ppm, denom)
    return sorted(
        (kind, node, tuple(v)) for (kind, node), v in emb.items()
    )


def skipgram_pairs_py(
    walk_rows: "Sequence[tuple]", window: int = 2
) -> "List[Tuple[str, str]]":
    """(center, context) multiset from walk rows (start, walk_id, pos,
    node) — the pure-Python twin of operators/walks.skipgram_pairs
    (multiplicity preserved; order irrelevant to SGNS's weighted
    collapse)."""
    seqs: Dict[Tuple[str, int], list] = {}
    for start, wid, pos, node in walk_rows:
        seqs.setdefault((start, wid), []).append((pos, node))
    out: List[Tuple[str, str]] = []
    for key in sorted(seqs):
        seq = [n for _, n in sorted(seqs[key])]
        for i, c in enumerate(seq):
            for j in range(max(0, i - window), min(len(seq), i + window + 1)):
                if j != i:
                    out.append((c, seq[j]))
    return out


def hits_py(
    edges: "Sequence[tuple]", iterations: int = 5
) -> "List[Tuple[str, int, int]]":
    """Pure-Python replication of operators/graph.hits (integer-micro
    max-normalized power iteration). Returns sorted
    (node_id, hub_micro, auth_micro)."""
    pairs = {
        (str(a), str(b))
        for a, b in edges
        if str(a) != str(b)
    }
    nodes = sorted({n for e in pairs for n in e})
    h = {n: 1_000_000 for n in nodes}
    a = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        a_new = {n: 0 for n in nodes}
        for u, v in pairs:
            a_new[v] += h[u]
        mx = max(1, max(a_new.values()))
        a = {n: _tdiv(a_new[n] * 1_000_000, mx) for n in nodes}
        h_new = {n: 0 for n in nodes}
        for u, v in pairs:
            h_new[u] += a[v]
        mx = max(1, max(h_new.values()))
        h = {n: _tdiv(h_new[n] * 1_000_000, mx) for n in nodes}
    return sorted((n, h[n], a[n]) for n in nodes)


def katz_py(
    edges: "Sequence[tuple]",
    iterations: int = 8,
    alpha_ppm: int = 100_000,
) -> "List[Tuple[str, int]]":
    """Pure-Python replication of operators/graph.katz_centrality
    (integer-micro unnormalized truncated Katz expansion). Returns
    sorted (node_id, katz_micro)."""
    pairs = {
        (str(a), str(b))
        for a, b in edges
        if str(a) != str(b)
    }
    nodes = sorted({n for e in pairs for n in e})
    x = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        s = {n: 0 for n in nodes}
        for u, v in pairs:
            s[v] += x[u]
        x = {
            n: 1_000_000 + _tdiv(alpha_ppm * s[n], 1_000_000)
            for n in nodes
        }
    return sorted(x.items())


def gdv_py(edges: "Sequence[tuple]") -> "List[tuple]":
    """Pure-Python replication of operators/graph.graphlet_orbits
    (per-node graphlet degree vector, Przulj orbits 0-14, via the
    same non-induced aggregate formulas + containment-matrix
    inversion). Returns sorted (node_id, o0, ..., o14)."""
    import itertools as _it

    und = {
        (min(str(a), str(b)), max(str(a), str(b)))
        for a, b in edges
        if str(a) != str(b)
    }
    adj: "Dict[str, set]" = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    V = sorted(adj)
    d = {v: len(adj[v]) for v in V}
    tris = []
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:
                tris.append((a, b, c))
    t_v = {v: 0 for v in V}
    t_e: "Dict[tuple, int]" = {}
    for tri in tris:
        for v in tri:
            t_v[v] += 1
        for e in _it.combinations(tri, 2):
            t_e[e] = t_e.get(e, 0) + 1
    cod: "Dict[tuple, int]" = {}
    for v in V:
        for p, q in _it.combinations(sorted(adj[v]), 2):
            cod[(p, q)] = cod.get((p, q), 0) + 1
    s = {v: sum(d[u] - 1 for u in adj[v]) for v in V}
    t2 = {v: sum(s[a] for a in adj[v]) for v in V}
    k4_v = {v: 0 for v in V}
    for a, b, c in tris:
        for z in adj[a] & adj[b] & adj[c]:
            if z > c:
                for v in (a, b, c, z):
                    k4_v[v] += 1
    out = []
    for v in V:
        o = [0] * 15
        o[0] = d[v]
        o[1] = s[v] - 2 * t_v[v]
        o[2] = d[v] * (d[v] - 1) // 2 - t_v[v]
        o[3] = t_v[v]
        n4 = t2[v] - d[v] * (d[v] - 1) - 2 * t_v[v]
        n5 = sum(
            (d[v] - 1) * (d[u] - 1)
            - t_e.get((min(v, u), max(v, u)), 0)
            for u in adj[v]
        )
        n6 = sum((d[u] - 1) * (d[u] - 2) // 2 for u in adj[v])
        n7 = d[v] * (d[v] - 1) * (d[v] - 2) // 6
        n8 = sum(
            c * (c - 1) // 2 for (p, q), c in cod.items() if v in (p, q)
        )
        n9 = sum(
            t_v[u] - t_e.get((min(v, u), max(v, u)), 0) for u in adj[v]
        )
        n10 = sum(
            d[u] - 2 for tri in tris if v in tri for u in tri if u != v
        )
        n11 = t_v[v] * (d[v] - 2)
        n12 = sum(
            t_e[tuple(sorted(set(tri) - {v}))] - 1
            for tri in tris
            if v in tri
        )
        n13 = sum(
            c * (c - 1) // 2 for (a, b), c in t_e.items() if v in (a, b)
        )
        i14 = k4_v[v]
        i13 = n13 - 3 * i14
        i12 = n12 - 3 * i14
        o[8] = n8 - i12 - i13 - 3 * i14
        o[11] = n11 - 2 * i13 - 3 * i14
        o[10] = n10 - 2 * i12 - 2 * i13 - 6 * i14
        o[9] = n9 - 2 * i12 - 3 * i14
        o[5] = (n5 - 2 * o[8] - o[10] - 2 * o[11] - 2 * i12
                - 4 * i13 - 6 * i14)
        o[4] = (n4 - 2 * o[8] - 2 * o[9] - o[10] - 4 * i12
                - 2 * i13 - 6 * i14)
        o[7] = n7 - o[11] - i13 - i14
        o[6] = n6 - o[9] - o[10] - 2 * i12 - i13 - 3 * i14
        o[12], o[13], o[14] = i12, i13, i14
        out.append((v, *o))
    return out


def densest_py(
    edges: "Sequence[tuple]", eps_ppm: int = 100_000
) -> "List[Tuple[str, int, int, int, int]]":
    """Pure-Python replication of operators/graph.densest_subgraph
    (Bahmani et al. 2012 greedy peeling). Returns sorted
    (node_id, density_ppm, n_nodes, n_edges, found_round)."""
    cur = set()
    for a, b in {(str(a), str(b)) for a, b in edges}:
        if a != b:
            cur.add((min(a, b), max(a, b)))
    live = {n for e in cur for n in e}
    best = None
    r = 0
    while live:
        n_s, e_s = len(live), len(cur)
        density = (e_s * 1_000_000) // n_s
        if best is None or density > best[0]:
            best = (density, sorted(live), n_s, e_s, r)
        if e_s == 0:
            break
        deg: Dict[str, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        thresh = 2 * e_s * (1_000_000 + eps_ppm)
        live = {
            n for n in live
            if deg.get(n, 0) * n_s * 1_000_000 > thresh
        }
        cur = {(a, b) for a, b in cur if a in live and b in live}
        r += 1
    density, nodes, n_s, e_s, r = best
    return sorted((n, density, n_s, e_s, r) for n in nodes)


def textrank_py(
    docs: "Sequence[tuple]",
    top_k: int = 3,
    threshold_ppm: int = 200_000,
    iterations: int = 10,
    damping_pct: int = 85,
) -> "List[Tuple[str, int, str, int, int]]":
    """Pure-Python replication of operators/textrank.textrank_summary.
    ``docs``: (doc_id, text). Returns sorted
    (doc_id, sent_idx, sentence, rank_micro_or_None, rk)."""
    import re

    sents = []  # (doc_id, idx, sentence, wordset)
    for doc_id, text in docs:
        for idx, s in enumerate(re.split(r"(?<=[.!?])\s+", text or "")):
            if s.strip():
                words = frozenset(
                    w for w in normalize_py(s).split(" ") if w
                )
                sents.append((str(doc_id), idx, s, words))
    pairs = []
    by_doc: Dict[str, list] = {}
    for row in sents:
        by_doc.setdefault(row[0], []).append(row)
    for doc_id, rows in by_doc.items():
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (_, ia, _, wa), (_, ib, _, wb) = rows[i], rows[j]
                uni = len(wa | wb)
                if uni == 0:
                    continue
                jac = (len(wa & wb) * 1_000_000) // uni
                if jac >= threshold_ppm:
                    a = f"{doc_id}\x1f{ia}"
                    b = f"{doc_id}\x1f{ib}"
                    pairs.append((a, b))
                    pairs.append((b, a))
    ranks = pagerank_py(pairs, iterations=iterations,
                        damping_pct=damping_pct)
    out = []
    for doc_id, rows in by_doc.items():
        keyed = [
            (ranks.get(f"{doc_id}\x1f{idx}"), idx, s)
            for (_, idx, s, _) in rows
        ]
        # rank desc NULLS LAST, idx asc
        keyed.sort(key=lambda t: (t[0] is None, -(t[0] or 0), t[1]))
        for rk, (r, idx, s) in enumerate(keyed[:top_k], start=1):
            out.append((doc_id, idx, s, r, rk))
    out.sort(key=lambda t: (t[0], t[4]))
    return out


def coloring_py(edges: "Sequence[tuple]") -> "List[Tuple[str, int]]":
    """Pure-Python replication of operators/graph.greedy_coloring:
    iterated deterministic-Luby MIS classes. Returns sorted
    (node_id, color)."""
    adj: Dict[str, set] = {}
    for a, b in {(str(a), str(b)) for a, b in edges}:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = set(adj)
    out: List[Tuple[str, int]] = []
    color = 0
    while live:
        sub = [
            (a, b) for a in live for b in adj[a] if b in live and a < b
        ]
        if sub:
            cls = {n for n, _ in mis_py(sub)}
        else:
            cls = set()
        # residual-isolated nodes join unconditionally
        cls |= {n for n in live if not (adj[n] & live)}
        out.extend((n, color) for n in cls)
        live -= cls
        color += 1
    out.sort()
    return out


def pagerank_weighted_py(
    edges: "Sequence[tuple]",
    iterations: int = 10,
    damping_pct: int = 85,
) -> "Dict[str, int]":
    """Independent recomputation of operators/graph.pagerank_weighted
    (per-edge trunc share; parallel edges sum)."""
    from collections import defaultdict

    w: Dict[Tuple[str, str], int] = defaultdict(int)
    for a, b, ww in edges:
        w[(str(a), str(b))] += int(ww)
    w_out: Dict[str, int] = defaultdict(int)
    nodes = set()
    for (a, b), ww in w.items():
        w_out[a] += ww
        nodes.add(a)
        nodes.add(b)
    nodes = sorted(nodes)
    n = len(nodes)
    if n == 0:
        return {}
    teleport = ((100 - damping_pct) * 1_000_000) // 100
    r = {v: 1_000_000 for v in nodes}
    for _ in range(iterations):
        inbound: Dict[str, int] = defaultdict(int)
        for (a, b), ww in w.items():
            inbound[b] += _tdiv(r[a] * ww, w_out[a])
        dang = sum(r[v] for v in nodes if v not in w_out)
        ds = _tdiv(dang, n)
        r = {
            v: teleport
            + _tdiv(damping_pct * (inbound.get(v, 0) + ds), 100)
            for v in nodes
        }
    return r


def tool_chains_table(
    n_convs: int, n: int = 2, min_groups: int = 2
) -> "List[Tuple[str, int, int]]":
    """Pure-Python replication of seqmine.sequence_ngrams over the
    generate_rows corpus' TOOL stream (tool-bearing turns in turn_idx
    order per conversation): (gram, n_groups, n_occurrences)."""
    from ..sources.transcripts import generate_rows

    seqs: Dict[str, list] = {}
    for conv_id, turn_idx, _role, _text, tool, _ts in generate_rows(n_convs):
        if tool is not None:
            seqs.setdefault(conv_id, []).append((turn_idx, tool))
    support: Dict[str, set] = {}
    occs: Dict[str, int] = {}
    for conv_id, rows in seqs.items():
        toks = [t for _, t in sorted(rows)]
        for i in range(len(toks) - n + 1):
            gram = "\x1f".join(toks[i:i + n])
            support.setdefault(gram, set()).add(conv_id)
            occs[gram] = occs.get(gram, 0) + 1
    return sorted(
        (g, len(cs), occs[g])
        for g, cs in support.items()
        if len(cs) >= min_groups
    )


def texttiling_py(
    rows: "Sequence[tuple]",
    block_turns: int = 3,
    depth_window: int = 2,
    cutoff_ppm: int = 500_000,
) -> "List[tuple]":
    """Pure-Python replication of operators/segmentation.texttiling_gaps
    over (conv_id, turn_idx, text) rows: [(conv_id, gap_after,
    score_ppm, depth_ppm, is_boundary)], trunc-ppm integer Jaccard of
    distinct normalized-token block sets + positional peak windows."""
    def toks(text):
        return set(
            t for t in normalize_py(text or "").split(" ") if t
        )

    by_conv: Dict[str, list] = {}
    for conv_id, turn_idx, text in rows:
        by_conv.setdefault(conv_id, []).append((turn_idx, text))
    out = []
    for conv_id, turns in by_conv.items():
        turns.sort()
        idxs = [i for i, _ in turns]
        tok = [toks(t) for _, t in turns]
        n = len(turns)
        scores = []
        for g in range(n - 1):  # gap after position g
            lo = max(0, g - (block_turns - 1))
            left = set().union(*tok[lo:g + 1]) if g + 1 > lo else set()
            hi = min(n, g + 1 + block_turns)
            right = set().union(*tok[g + 1:hi]) if hi > g + 1 else set()
            if len(left) + len(right) > 0:
                inter = len(left & right)
                scores.append(
                    inter * 1_000_000
                    // (len(left) + len(right) - inter)
                )
            else:
                scores.append(None)
        for g in range(n - 1):
            s = scores[g]
            if s is None:
                out.append((conv_id, idxs[g], None, None, False))
                continue
            window_l = [x for x in scores[max(0, g - depth_window):g + 1]
                        if x is not None]
            window_r = [x for x in scores[g:g + 1 + depth_window]
                        if x is not None]
            depth = max(window_l) + max(window_r) - 2 * s
            prevs = [x for x in scores[max(0, g - depth_window):g]
                     if x is not None]
            nexts = [x for x in scores[g + 1:g + 1 + depth_window]
                     if x is not None]
            floor = (not prevs or s < min(prevs)) and (
                not nexts or s <= min(nexts)
            )
            out.append(
                (conv_id, idxs[g], s, depth,
                 depth >= cutoff_ppm and floor)
            )
    return sorted(out)


def texttiling_table(n_convs: int) -> "List[tuple]":
    """texttiling_py over the generate_rows transcript corpus at the
    operator defaults — the snapshot behind the `conv_topic_gaps`
    EXTRA query."""
    from ..sources.transcripts import generate_rows

    return texttiling_py(
        [(c, i, t) for c, i, _r, t, _tool, _ts in generate_rows(n_convs)]
    )


def sft_pairs_py(
    rows: "Sequence[tuple]",
    context_turns: int = 4,
    response_role: str = "assistant",
) -> "List[tuple]":
    """Pure-Python replication of operators/sftpairs.sft_pairs over
    (conv_id, turn_idx, role, text) rows: [(conv_id, pair_id,
    prev_role, prompt, n_context_turns, response, n_response_turns)]
    — maximal response-role runs, last-k-turns rendered prompt."""
    by_conv: Dict[str, list] = {}
    for conv_id, turn_idx, role, text in rows:
        by_conv.setdefault(conv_id, []).append((turn_idx, role, text))
    out = []
    for conv_id, turns in by_conv.items():
        turns.sort()
        i = 0
        n = len(turns)
        while i < n:
            _, role, _ = turns[i]
            if role != response_role:
                i += 1
                continue
            j = i
            while j < n and turns[j][1] == response_role:
                j += 1
            ctx = turns[max(0, i - context_turns):i]
            prompt = (
                "\n".join(
                    ": ".join(
                        x for x in ((r if r is not None else ""), t)
                        if x is not None
                    )
                    for _, r, t in ctx
                )
                if ctx
                else None
            )
            prev_role = turns[i - 1][1] if i > 0 else None
            response = "\n".join(
                t for _, _, t in turns[i:j] if t is not None
            )
            out.append(
                (conv_id, turns[i][0], prev_role, prompt, len(ctx),
                 response, j - i)
            )
            i = j
    return sorted(out)


def sft_pairs_table(n_convs: int, context_turns: int = 4) -> "List[tuple]":
    """sft_pairs_py over the generate_rows transcript corpus — the
    snapshot behind the `sft_pairs` EXTRA query."""
    from ..sources.transcripts import generate_rows

    return sft_pairs_py(
        [(c, i, r, t) for c, i, r, t, _tool, _ts in generate_rows(n_convs)],
        context_turns=context_turns,
    )


def topic_chunks_py(
    rows: "Sequence[tuple]",
    block_turns: int = 3,
    depth_window: int = 2,
    cutoff_ppm: int = 500_000,
) -> "List[tuple]":
    """Pure-Python replication of segmentation.topic_chunks over
    (conv_id, turn_idx, text) rows: [(conv_id, seg_idx, chunk_id,
    chunk_text, n_turns, first_turn, last_turn)]."""
    gaps = {
        (c, g): b
        for c, g, _s, _d, b in texttiling_py(
            rows, block_turns, depth_window, cutoff_ppm
        )
    }
    by_conv: Dict[str, list] = {}
    for conv_id, turn_idx, text in rows:
        by_conv.setdefault(conv_id, []).append((turn_idx, text))
    out = []
    for conv_id, turns in by_conv.items():
        turns.sort()
        seg = 0
        cur: list = []
        segs = []
        for i, (idx, text) in enumerate(turns):
            cur.append((idx, text))
            last = i == len(turns) - 1
            if last or gaps.get((conv_id, idx), False):
                segs.append((seg, cur))
                seg += 1
                cur = []
        for seg_idx, items in segs:
            chunk_text = "\n".join(
                t for _, t in items if t is not None
            )
            out.append(
                (
                    conv_id,
                    seg_idx,
                    hashlib.sha1(
                        (chunk_text + conv_id).encode("utf-8")
                    ).hexdigest(),
                    chunk_text,
                    len(items),
                    items[0][0],
                    items[-1][0],
                )
            )
    return sorted(out)


def topic_chunks_table(n_convs: int) -> "List[tuple]":
    """topic_chunks_py over the generate_rows corpus — the snapshot
    behind the `kg_topic_chunks` EXTRA query."""
    from ..sources.transcripts import generate_rows

    return topic_chunks_py(
        [(c, i, t) for c, i, _r, t, _tool, _ts in generate_rows(n_convs)]
    )


# ---------------------------------------------------------------------------
# Agentic planner-retrieval trace (operators/planner.py twin)
# ---------------------------------------------------------------------------

def planner_trace_table(n_convs: int, query: str) -> "List[tuple]":
    """Independent pure-Python replay of the scripted planner loop
    (reference retrieval/planner.py:166-601): the same fake-LLM plan
    script and XML parse path (functions/plannerscript.py — shared, it
    is the loop's INPUT), with every tool leg recomputed sequentially —
    chunk/entity cosines as left-to-right folds (_seq_dot), BFS and
    NEXT_CHUNK walks over the oracle edge set, the time filter over
    the turn timestamps — so the snapshot gates the engine's
    distributed legs AND the observe→replan scalar flow.

    Rows: (iteration, step, tool, arg, rank, result_id, score, detail).
    """
    from ..functions import plannerscript as ps
    from ..functions.embedder import entity_embed, hash_embed
    from ..sources.transcripts import generate_rows

    rows = generate_rows(n_convs)
    res = run_oracle(rows)

    # ---- unique chunks with min-ts keeper (engine dedupes the same way)
    ts_by_turn = {(r[0], r[1]): r[5] for r in rows}
    uniq: Dict[str, dict] = {}
    for c in res.chunks:
        ts = ts_by_turn[(c["conv_id"], c["turn_idx"])]
        prev = uniq.get(c["chunk_id"])
        if prev is None or ts < prev["ts"]:
            uniq[c["chunk_id"]] = {
                "conv_id": c["conv_id"], "text": c["text"], "ts": ts,
            }
    chunk_ids = sorted(uniq)
    chunk_embs = {
        cid: hash_embed([uniq[cid]["text"]], dim=64)[0].astype(np.float32)
        for cid in chunk_ids
    }

    # ---- nodes (build_nodes, no canonical map) + entity embeddings ----
    groups: Dict[str, list] = defaultdict(list)
    for m in res.mentions:
        groups[m["node_id"]].append(m)
    node_rows = {}
    for nid, ms in groups.items():
        lead = min(ms, key=lambda m: m["node_id"])
        node_rows[nid] = (lead["name"], lead["type"] or "Entity")
    node_ids = sorted(node_rows)
    ent_mat = entity_embed([node_rows[n][0] for n in node_ids], dim=64)
    ent_embs = {
        nid: vec.astype(np.float32) for nid, vec in zip(node_ids, ent_mat)
    }

    # ---- edge set (build_edges dedup key) -----------------------------
    edge_set = {
        (e["src"], e["dst"], e["rel_type"]) for e in res.edges
    }
    next_chunk = defaultdict(set)
    for s, d, r in edge_set:
        if r == "NEXT_CHUNK":
            next_chunk[s].add(d)

    # ---- subtitle track (planner.subtitles_from_transcripts) ----------
    subs = {}
    for r in rows:
        sub_id = f"{r[0]}:{r[1]}"
        subs[sub_id] = {
            "conv_id": r[0], "start_s": r[1] * 7, "end_s": r[1] * 7 + 5,
            "text": r[3],
        }
    sub_ids = sorted(subs)
    sub_embs = {
        sid: hash_embed([subs[sid]["text"]], dim=64)[0].astype(np.float32)
        for sid in sub_ids
    }

    def chunk_search(qtext: str, topk: int):
        qvec = hash_embed([qtext], dim=64)[0].astype(np.float32)
        qn = _seq_norm(qvec)
        scored = []
        for cid in chunk_ids:
            v = chunk_embs[cid]
            cos = _seq_dot(v, qvec) / (_seq_norm(v) * qn)
            scored.append((cid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return [
            (rank, cid, round(cos, 6), uniq[cid]["conv_id"])
            for rank, (cid, cos) in enumerate(scored[:topk], start=1)
        ]

    def entity_search(qtext: str, topk: int):
        qvec = hash_embed([qtext], dim=64)[0].astype(np.float32)
        qn = _seq_norm(qvec) or 1.0
        scored = []
        for nid in node_ids:
            v = ent_embs[nid]
            cos = _seq_dot(v, qvec) / (_seq_norm(v) * qn)
            scored.append((nid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        name_type = node_rows
        return [
            (rank, nid, round(cos, 6), f"{name_type[nid][1]}:{name_type[nid][0]}")
            for rank, (nid, cos) in enumerate(scored[:topk], start=1)
        ]

    def bfs(node_id: str):
        hop = set()
        for s, d, r in edge_set:
            if s == node_id:
                hop.add((d, r, "out"))
            elif d == node_id:
                hop.add((s, r, "in"))
        ranked = sorted(hop, key=lambda t: (t[1], t[2], t[0]))
        return [
            (rank, nid, None, f"{rel}:{direction}")
            for rank, (nid, rel, direction) in enumerate(ranked, start=1)
        ]

    def next_chunk_walk(chunk_id: str, hops: int):
        out = []
        frontier = {chunk_id}
        for hop in range(1, max(hops, 0) + 1):
            step = set()
            for c in frontier:
                step |= next_chunk.get(c, set())
            for cid in sorted(step):
                out.append((hop, cid, None, None))
            frontier = step
        return out

    def chunk_filter(range_str: str, camera: str, chunk_size_s: float = 10.0):
        lo_s, hi_s = range_str.split(":")
        lo = int(ps.round_down_to_chunk(float(lo_s), chunk_size_s))
        hi = int(ps.round_up_to_chunk(float(hi_s), chunk_size_s))
        hits = []
        for cid in chunk_ids:
            c = uniq[cid]
            epoch = int(c["ts"].timestamp())
            if lo <= epoch <= hi and (not camera or c["conv_id"] == camera):
                hits.append((epoch, cid))
        hits.sort()
        return [
            (rank, cid, None, str(epoch))
            for rank, (epoch, cid) in enumerate(hits, start=1)
        ]

    def subtitle_search(qtext: str, topk: int):
        qvec = hash_embed([qtext], dim=64)[0].astype(np.float32)
        qn = _seq_norm(qvec)
        scored = []
        for sid in sub_ids:
            v = sub_embs[sid]
            cos = _seq_dot(v, qvec) / (_seq_norm(v) * qn)
            scored.append((sid, cos))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return [
            (rank, sid, round(cos, 6),
             f"{subs[sid]['start_s']}:{subs[sid]['end_s']}")
            for rank, (sid, cos) in enumerate(scored[:topk], start=1)
        ]

    def subtitle_filter(range_str: str, chunk_size_s: float = 10.0):
        lo_s, hi_s = range_str.split(":")
        lo = int(ps.round_down_to_chunk(float(lo_s), chunk_size_s))
        hi = int(ps.round_up_to_chunk(float(hi_s), chunk_size_s))
        hits = sorted(
            (subs[sid]["start_s"], sid)
            for sid in sub_ids
            if subs[sid]["start_s"] >= lo and subs[sid]["end_s"] <= hi
        )
        return [
            (rank, sid, None, f"{subs[sid]['start_s']}:{subs[sid]['end_s']}")
            for rank, (_s, sid) in enumerate(hits, start=1)
        ]

    def chunk_reader(chunk_id: str, qtext: str, k: int = 3):
        c = uniq.get(chunk_id)
        if c is None:
            return []
        out = [(0, chunk_id, None, ps.fake_vlm_answer(c["text"], qtext))]
        total = ps.chunk_reader_frame_census(len(c["text"]))
        for i, idx in enumerate(ps.uniform_sample_indices(total, k), start=1):
            out.append((i, chunk_id, None, f"frame_{idx}"))
        return out

    # ---- the loop -----------------------------------------------------
    trace: List[tuple] = []
    observations: Dict[str, object] = {}
    for iteration in range(5):
        plan = ps.scripted_plan(query, iteration, observations, topk=5)
        trace.append((iteration, 0, "think", "", 0, None, None, plan))
        if ps.thinking_complete(plan):
            break
        calls = ps.parse_plan(plan)
        results = []
        for step, (tool, input_data) in enumerate(calls, start=1):
            arg = ps.call_arg_string(input_data)
            if tool == "chunk_search":
                rows_t = chunk_search(
                    input_data["query"], int(input_data.get("topk", 5))
                )
            elif tool == "entity_search":
                rows_t = entity_search(input_data["query"], 5)
            elif tool == "bfs":
                rows_t = bfs(input_data["node_id"])
            elif tool == "next_chunk":
                rows_t = next_chunk_walk(
                    input_data["chunk_id"],
                    int(input_data.get("number_of_hops", 1)),
                )
            elif tool == "chunk_filter":
                rows_t = chunk_filter(
                    input_data["range"], input_data.get("camera_id") or ""
                )
            elif tool == "subtitle_search":
                rows_t = subtitle_search(
                    input_data["query"], int(input_data.get("topk", 5))
                )
            elif tool == "subtitle_filter":
                rows_t = subtitle_filter(input_data["range"])
            elif tool == "chunk_reader":
                rows_t = chunk_reader(
                    input_data["chunk_id"], input_data["query"]
                )
            else:
                continue
            for rank, rid, score, detail in rows_t:
                trace.append(
                    (iteration, step, tool, arg, rank, rid, score, detail)
                )
            results.append((tool, rows_t))

        if iteration == 0:
            for tool, rows_t in results:
                if tool == "chunk_search" and "top_chunk" not in observations:
                    if rows_t:
                        _rank, cid, _score, conv = rows_t[0]
                        observations["top_chunk"] = cid
                        observations["top_chunk_conv"] = conv
                        observations["top_chunk_epoch_s"] = int(
                            uniq[cid]["ts"].timestamp()
                        )
                elif tool == "entity_search" and "top_entity" not in observations:
                    if rows_t:
                        observations["top_entity"] = rows_t[0][1]
        elif iteration == 1:
            for tool, rows_t in results:
                if (
                    tool == "subtitle_search"
                    and "top_subtitle_start_s" not in observations
                ):
                    if rows_t:
                        observations["top_subtitle_start_s"] = int(
                            rows_t[0][3].split(":")[0]
                        )
    return trace


def community_reports_table(
    n_convs: int,
    max_members: int = 12,
    cap: int = 400,
    min_count: int = 10,
) -> List[tuple]:
    """Independent recomputation of operators/communities.py
    entity_graph + community_reports over the real extraction
    pipeline's DISTINCT triples (the kg_triples grain): node key =
    name :: coalesce(type, 'Entity'), undirected co-assertion edges
    kept at >= min_count distinct assertions, deterministic
    synchronous min-tie-break LPA (same sweep as lpa_py, string keys),
    members ordered by node_id, listing clamped at max_members,
    summary = ("[SUM] " + "name (type); ...")[:cap + 6] — the
    lossless fake-LLM cycle's pinned content. Returns sorted
    (community, n_members, n_listed, summary).
    """
    from collections import Counter

    from ..sources.transcripts import generate_rows

    res = run_oracle(generate_rows(n_convs))
    distinct = {
        (t["conv_id"], t["subj_name"], t["subj_type"], t["pred"],
         t["obj_name"], t["obj_type"])
        for t in res.triples
        if t["subj_name"] is not None and t["obj_name"] is not None
    }
    nodes: Dict[str, Tuple[str, str]] = {}
    ec: Dict[Tuple[str, str], int] = defaultdict(int)
    for _conv, sn, st, _pred, on, ot in distinct:
        st = st if st is not None else "Entity"
        ot = ot if ot is not None else "Entity"
        sk = f"{sn}::{st}"
        ok = f"{on}::{ot}"
        nodes[sk] = (sn, st)
        nodes[ok] = (on, ot)
        if sk != ok:
            ec[(min(sk, ok), max(sk, ok))] += 1
    edges = {e for e, c in ec.items() if c >= min_count}

    adj: Dict[str, set] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(10):
        new = {}
        for n in adj:
            counts = Counter(labels[z] for z in adj[n])
            top = max(counts.values())
            new[n] = min(lbl for lbl, c in counts.items() if c == top)
        changed = new != labels
        labels = new
        if not changed:
            break

    groups: Dict[str, List[str]] = defaultdict(list)
    for n, lbl in labels.items():
        groups[lbl].append(n)
    out = []
    for lbl, ms in sorted(groups.items()):
        ms = sorted(ms)
        listed = ms[:max_members]
        text = "; ".join(
            f"{nodes[m][0]} ({nodes[m][1]})" for m in listed
        )
        out.append(
            (lbl, len(ms), len(listed), ("[SUM] " + text)[: cap + 6])
        )
    return out


def community_hierarchy_table(
    pairs: Sequence[Tuple[int, int]], max_iter: int = 10
) -> List[Tuple[int, int, int]]:
    """Independent recomputation of operators/communities.py
    community_hierarchy: deterministic synchronous min-tie-break LPA
    on the base graph (level 0), the same sweep on the community
    quotient graph (an edge where any base edge crosses two level-0
    communities), isolated communities their own parent. Returns
    sorted (node_id, community, parent)."""
    from collections import Counter

    def lpa(edge_iter):
        adj: Dict[int, set] = defaultdict(set)
        for a, b in edge_iter:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        labels = {n: n for n in adj}
        for _ in range(max_iter):
            new = {}
            for n in adj:
                counts = Counter(labels[z] for z in adj[n])
                top = max(counts.values())
                new[n] = min(lbl for lbl, c in counts.items() if c == top)
            changed = new != labels
            labels = new
            if not changed:
                break
        return labels

    l0 = lpa(pairs)
    quotient = {
        (min(l0[a], l0[b]), max(l0[a], l0[b]))
        for a, b in pairs
        if a != b and l0[a] != l0[b]
    }
    l1 = lpa(quotient)
    return sorted(
        (n, c, l1.get(c, c)) for n, c in l0.items()
    )


def community_members_table(
    n_convs: int, min_count: int = 10
) -> List[Tuple[str, str]]:
    """(node_id, community) level-0 LPA membership of the entity
    co-assertion graph — the same sweep community_reports_table runs,
    exposed at the node grain so the GraphRAG local-search twin can be
    pure SQL over snapshots. Returns sorted pairs; only edge-connected
    entities appear (isolated vocabulary nodes have no community)."""
    from collections import Counter

    from ..sources.transcripts import generate_rows

    res = run_oracle(generate_rows(n_convs))
    distinct = {
        (t["conv_id"], t["subj_name"], t["subj_type"], t["pred"],
         t["obj_name"], t["obj_type"])
        for t in res.triples
        if t["subj_name"] is not None and t["obj_name"] is not None
    }
    ec: Dict[Tuple[str, str], int] = defaultdict(int)
    for _conv, sn, st, _pred, on, ot in distinct:
        st = st if st is not None else "Entity"
        ot = ot if ot is not None else "Entity"
        sk = f"{sn}::{st}"
        ok = f"{on}::{ot}"
        if sk != ok:
            ec[(min(sk, ok), max(sk, ok))] += 1
    adj: Dict[str, set] = defaultdict(set)
    for (a, b), c in ec.items():
        if c >= min_count:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(10):
        new = {}
        for n in adj:
            counts = Counter(labels[z] for z in adj[n])
            top = max(counts.values())
            new[n] = min(lbl for lbl, c in counts.items() if c == top)
        changed = new != labels
        labels = new
        if not changed:
            break
    return sorted(labels.items())


def betweenness_py(
    pairs: "Sequence[Tuple[int, int]]",
    n_pivots: int = 32,
    max_depth: int = 10,
) -> "List[Tuple[int, int, int]]":
    """Independent recomputation of graph.betweenness_centrality:
    per-pivot level-synchronous BFS with integer sigma, then Brandes
    backward accumulation under the IDENTICAL floored-micro arithmetic
    ((sigma_pred * (1e6 + delta_succ)) // sigma_succ per DAG edge,
    floored BEFORE the sum). Pivots = first n_pivots nodes under
    (md5(str(node)), node). Returns sorted
    (node, betweenness_micro, n_pivots_used)."""
    import hashlib
    from collections import defaultdict

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    pivots = sorted(
        nodes, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:n_pivots]
    bc = {v: 0 for v in nodes}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        frontier = [s]
        t = 0
        while frontier and t < max_depth:
            t += 1
            acc = defaultdict(int)
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        acc[w] += sigma[u]
            if not acc:
                break
            for w, sg in acc.items():
                dist[w] = t
                sigma[w] = sg
            frontier = sorted(acc)
            levels.append(frontier)
        delta = defaultdict(int)
        for t in range(len(levels) - 1, 0, -1):
            for w in levels[t]:
                for p in adj[w]:
                    if dist.get(p) == t - 1:
                        delta[p] += (
                            sigma[p] * (1_000_000 + delta[w])
                        ) // sigma[w]
        for v, d in delta.items():
            if v != s:
                bc[v] += d
    k_used = len(pivots)
    return sorted((v, bc[v], k_used) for v in nodes)
