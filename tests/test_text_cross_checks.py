"""Cross-implementation checks for the new text-culling operators: a
seeded adversarial corpus (boundary-poking tokens, ASCII whitespace,
planted PII fragments) is run through the Spark operators ONCE and
compared row-by-row against an independent pure-Python recomputation.
The corpus alphabet is ASCII so Java's \\d/\\s/\\b and Python's agree;
the DuckDB sweep already pins the dialects on the real tables — this
guards the operators on inputs the synthetic corpus never produces.
"""

import random
import re

import pytest

from context_aware_rag_spark.operators.textmetrics import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    pii_scrub,
    repetition_signals,
)

TOKENS = [
    "alice@example.com", "x@y.co", "a.b-c_d%e+f@sub.domain.org",
    "@nodomain", "user@", "a@b", "a@b.c",            # non-matching shapes
    "415-555-0042", "1234-555-0000", "415-555-00423", "41-555-0042",
    "10.0.0.1", "1.2.3.4.5", "999.999.999.999", "1.2.3",
    "word", "the", "end.", "x,y", "(a)", "a-b", "3.14", "v2",
    "", " ", "\t", "\n", "  ",
]


def corpus(seed=7, n=300):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(TOKENS) for _ in range(k))))
    return rows


@pytest.fixture(scope="module")
def rows():
    return corpus()


@pytest.fixture(scope="module")
def df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()


def test_pii_scrub_matches_python_re(df, rows):
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert len(got) == len(rows)
    for i, text in rows:
        scrub = re.sub(PII_EMAIL_RE, "<EMAIL>", text)
        scrub = re.sub(PII_PHONE_RE, "<PHONE>", scrub)
        scrub = re.sub(PII_IP_RE, "<IP>", scrub)
        r = got[i]
        assert r["scrubbed"] == scrub, (i, text)
        assert r["n_emails"] == len(re.findall(PII_EMAIL_RE, text)), (i, text)
        assert r["n_phones"] == len(re.findall(PII_PHONE_RE, text)), (i, text)
        assert r["n_ips"] == len(re.findall(PII_IP_RE, text)), (i, text)


def test_repetition_signals_match_python(df, rows):
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for i, text in rows:
        # mirror F.trim (space-only) + split('\s+'): Java and Python
        # agree on ASCII \s for this alphabet
        words = re.split(r"\s+", text.strip(" ").lower())
        grams = [" ".join(words[j : j + 2]) for j in range(len(words) - 1)]
        if len(words) < 2:
            assert i not in got, (i, text)
            continue
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        total = len(grams)
        r = got[i]
        assert r["n_grams"] == total, (i, text)
        dup = sum(c for c in counts.values() if c > 1)
        assert r["dup_gram_frac"] == round(dup / total, 6), (i, text)
        assert r["top_gram_frac"] == round(max(counts.values()) / total, 6), (i, text)
