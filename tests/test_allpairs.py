"""AllPairs prefix-filtered exact Jaccard (dedup.allpairs_jaccard_pairs):
bit-equality with the uncapped inverted-index join at several
thresholds (the prefix theorem's completeness is exactly what equality
proves), plus boundary geometries."""

import random
import warnings

import pytest

from context_aware_rag_spark.operators import dedup


def _pairs(df):
    return {(r.a, r.b): r.jaccard for r in df.collect()}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _reference(spark, rows, threshold, n=3):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return _pairs(
            dedup.ngram_jaccard_pairs(
                _docs(spark, rows), threshold=threshold, n=n, df_cap=None
            )
        )


def test_allpairs_equals_uncapped_inverted_index_random(spark):
    rng = random.Random(57)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25))))
        for i in range(80)
    ]
    # clones with light edits to plant high-jaccard pairs
    for i in range(0, 80, 9):
        words = rows[i][1].split()
        words[len(words) // 2] = "edited"
        rows.append((1000 + i, " ".join(words)))
    for t in (0.3, 0.5, 0.8, 1.0):
        got = _pairs(
            dedup.allpairs_jaccard_pairs(_docs(spark, rows), threshold=t)
        )
        want = _reference(spark, rows, t)
        assert got == want, (t, len(got), len(want))


def test_allpairs_exact_duplicates_and_threshold_boundary(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),          # J = 1.0 with 1
        (3, "alpha beta gamma delta zeta"),             # 2/4 = 0.5 with 1
        (4, "unrelated words entirely here now"),
    ]
    got = _pairs(dedup.allpairs_jaccard_pairs(_docs(spark, rows), threshold=0.5))
    assert got[(1, 2)] == 1.0
    assert got[(2, 3)] == 0.5 and got[(1, 3)] == 0.5
    assert not any(4 in p for p in got)
    # just above the boundary the 0.5 pairs must vanish
    got_hi = _pairs(
        dedup.allpairs_jaccard_pairs(_docs(spark, rows), threshold=0.51)
    )
    assert set(got_hi) == {(1, 2)}


def test_allpairs_short_docs_single_shingle(spark):
    # docs shorter than n words collapse to one whole-text shingle
    rows = [(1, "hi there"), (2, "hi there"), (3, "bye now")]
    got = _pairs(dedup.allpairs_jaccard_pairs(_docs(spark, rows), threshold=0.9))
    assert got == {(1, 2): 1.0}


def test_allpairs_hot_shingle_stays_exact(spark):
    # a boilerplate prefix shared by EVERY doc: df_cap would truncate
    # the universe, the prefix filter must not — scores stay exact
    boiler = "the quick brown fox jumps over"
    rows = [(i, f"{boiler} unique{i} tail{i} words{i}") for i in range(30)]
    rows.append((100, f"{boiler} unique1 tail1 words1"))
    got = _pairs(dedup.allpairs_jaccard_pairs(_docs(spark, rows), threshold=0.9))
    assert got == {(1, 100): 1.0}
    want = _reference(spark, rows, 0.9)
    assert got == want


def test_allpairs_validation(spark):
    df = _docs(spark, [(1, "a b c d")])
    with pytest.raises(ValueError):
        dedup.allpairs_jaccard_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        dedup.allpairs_jaccard_pairs(df, threshold=1.5)
