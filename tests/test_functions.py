"""Unit tests for extractor, embedder, hashing pure functions."""

import hashlib

import numpy as np

from context_aware_rag_spark.functions import hashing
from context_aware_rag_spark.functions.embedder import entity_embed, hash_embed
from context_aware_rag_spark.functions.extractor import (
    ENTITY_GROUPS,
    rule_based_extract,
)


def test_extract_simple_triple():
    out = rule_based_extract("Alice drives Red Truck.")
    assert out == [("Alice", "Person", "DRIVES", "Red Truck", "Vehicle")]


def test_extract_multi_sentence_and_alias():
    out = rule_based_extract("Bob Smith works at ACME Corp. Carol visited Tokyo.")
    assert ("Bob Smith", "Person", "WORKS_AT", "Acme Corp", "Object") in out
    assert ("Carol", "Person", "VISITED", "Tokyo", "Location") in out


def test_extract_longest_alias_wins():
    out = rule_based_extract("Alice Johnson met Bob.")
    assert out[0].head == "Alice Johnson"


def test_extract_no_relation_keyword():
    assert rule_based_extract("Alice and Bob.") == []


def test_extract_glitch_bait_backticks():
    out = rule_based_extract("Alice met Bob ~glitch~.")
    assert out[0].head_type == "`Person`"


def test_extract_blank_bait():
    out = rule_based_extract("Alice met Bob ~blank~.")
    tails = [t.tail for t in out]
    assert "  " in tails  # the blank-tail bait triple is present pre-cleaning


def test_chunk_id_byte_parity():
    text, conv = "some chunk text", "conv00001"
    assert hashing.chunk_id_py(text, conv) == hashlib.sha1(
        (text + conv).encode()
    ).hexdigest()


def test_entity_id_reference_formula():
    # base.py:186: sha1(f"{description}_{node_type}_{old_id}_{uuid}")
    got = hashing.entity_id_py("Alice", "Person", "conv1")
    assert got == hashlib.sha1("_Person_Alice_conv1".encode()).hexdigest()
    # blank type falls back to "Entity" (base.py:184)
    got2 = hashing.entity_id_py("Alice", "", "conv1")
    assert got2 == hashlib.sha1("_Entity_Alice_conv1".encode()).hexdigest()


def test_hash_embed_deterministic_unit():
    a = hash_embed(["hello", "world"])
    b = hash_embed(["hello", "world"])
    np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-6)
    assert abs(float(a[0] @ a[1])) < 0.5  # distinct texts not similar


def test_entity_embed_alias_geometry():
    # within-group cosine > 0.9; cross-group < 0.8 (FIXTURES.md §4)
    for key, (etype, aliases) in ENTITY_GROUPS.items():
        vecs = entity_embed(aliases)
        for i in range(len(aliases)):
            for j in range(i + 1, len(aliases)):
                assert float(vecs[i] @ vecs[j]) > 0.9, (key, aliases[i], aliases[j])
    reps = entity_embed([ENTITY_GROUPS[k][1][0] for k in ENTITY_GROUPS])
    n = len(reps)
    for i in range(n):
        for j in range(i + 1, n):
            assert float(reps[i] @ reps[j]) < 0.8
