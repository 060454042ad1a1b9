"""Gazetteer mention detection (operators/gazetteer.py): the
leftmost-longest policy against hand geometries and an independent
naive pure-Python matcher (try-every-entry-at-every-position vs the
operator's trie walk)."""

import random
import re
import unicodedata

import pytest

from context_aware_rag_spark.operators import gazetteer


def _norm_py(text):
    out = []
    for c in (text or "").lower():
        cat = unicodedata.category(c)
        if cat[0] in ("L", "N") or c.isspace():
            out.append(c)
        else:
            out.append(" ")
    return re.sub(r"\s+", " ", "".join(out)).strip()


def _naive_py(docs, entries):
    """Independent replication: at each token try EVERY entry, take the
    longest match (all entity ids sharing it), skip past it."""
    norm_entries = []
    for eid, name in entries:
        toks = _norm_py(name).split(" ")
        if toks and toks != [""]:
            norm_entries.append((eid, toks))
    out = set()
    for doc_id, text in docs:
        toks = _norm_py(text).split(" ")
        if toks == [""]:
            toks = []
        i = 0
        while i < len(toks):
            best_len, best_ids = 0, []
            for eid, etoks in norm_entries:
                if toks[i : i + len(etoks)] == etoks:
                    if len(etoks) > best_len:
                        best_len, best_ids = len(etoks), [eid]
                    elif len(etoks) == best_len:
                        best_ids.append(eid)
            if best_len:
                surface = " ".join(toks[i : i + best_len])
                for eid in best_ids:
                    out.add((str(doc_id), i, i + best_len, surface, str(eid)))
                i += best_len
            else:
                i += 1
    return out


def _tag(spark, docs, entries, **kw):
    d = spark.createDataFrame(docs, "doc_id: long, text: string")
    g = spark.createDataFrame(entries, "entity_id: string, name: string")
    return {
        tuple(r)
        for r in gazetteer.tag_mentions(d, g, **kw).collect()
    }


def test_leftmost_longest_policy(spark):
    docs = [(1, "in New York City today"), (2, "york is a word")]
    entries = [("e1", "new york"), ("e2", "new york city"), ("e3", "york")]
    got = _tag(spark, docs, entries)
    # the longest match wins and suppresses everything inside its span
    assert got == {
        ("1", 1, 4, "new york city", "e2"),
        ("2", 0, 1, "york", "e3"),
    }


def test_adjacent_ambiguous_and_punctuation(spark):
    docs = [(1, "ACME-Corp bought Acme Corp!")]
    entries = [("a", "acme corp"), ("b", "acme corp"), ("c", "bought")]
    got = _tag(spark, docs, entries)
    assert got == {
        ("1", 0, 2, "acme corp", "a"),
        ("1", 0, 2, "acme corp", "b"),
        ("1", 2, 3, "bought", "c"),
        ("1", 3, 5, "acme corp", "a"),
        ("1", 3, 5, "acme corp", "b"),
    }


def test_matches_naive_python_random(spark):
    rng = random.Random(83)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(60)
    ]
    entries = []
    for k in range(15):
        ln = rng.randrange(1, 4)
        entries.append(
            (f"e{k}", " ".join(rng.choice(vocab) for _ in range(ln)))
        )
    assert _tag(spark, docs, entries) == _naive_py(docs, entries)


def test_empty_docs_and_empty_gazetteer(spark):
    assert _tag(spark, [(1, ""), (2, "plain text")], [("e", "zzz")]) == set()
    assert _tag(spark, [(1, "anything")], []) == set()


def test_max_entities_guard(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    g = spark.createDataFrame(
        [(str(i), f"n{i}") for i in range(5)], "entity_id: string, name: string"
    )
    with pytest.raises(ValueError, match="max_entities"):
        gazetteer.tag_mentions(docs, g, max_entities=4)
