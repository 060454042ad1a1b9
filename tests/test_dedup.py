"""Golden tests for the near-dup suite (MinHash+LSH, SimHash, n-gram
Jaccard skew cap).

Strategy (VERDICT.md round-1 item 1): plant a corpus with KNOWN
similarity structure — base docs plus copies with a controlled number
of word replacements — and verify the approximate operators against
the exact, oracle-verified paths:

- MinHash candidates / est_jaccard vs ``ngram_jaccard_pairs`` (the
  DuckDB-checked exact twin);
- SimHash pairs vs a brute-force Hamming scan over the same
  fingerprints (the 16-bit-quarter blocking is *complete* for
  distance <= 3 by pigeonhole: 3 differing bits touch at most 3 of 4
  quarters, so the pair agrees on >= 1 quarter);
- a bit-level SimHash fixture: a one-token document's fingerprint is
  exactly xxhash64(token) (each bit votes +1 iff set, so the sign
  pattern reproduces the hash bits).

Everything is deterministic: xxhash64 seeds are fixed and the corpus
is built with random.Random(seed).
"""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import dedup


def _make_corpus(spark, n_base=10, words_per_doc=60, vocab_size=400, seed=7):
    """Base docs + near-dups at controlled word-replacement distances.

    Returns (df, planted) where planted maps (a, b) -> n_replaced.
    doc ids: base i -> 2*i, its near-dup -> 2*i+1 (so a < b pairing is
    (2i, 2i+1)).
    """
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vocab_size)]
    rows, planted = [], {}
    # replacement counts cycle: 2 words ~ J>=0.85, 30 words ~ J<0.4
    repl_cycle = [2, 4, 8, 30]
    for i in range(n_base):
        base = [rng.choice(vocab) for _ in range(words_per_doc)]
        rows.append((2 * i, " ".join(base)))
        n_repl = repl_cycle[i % len(repl_cycle)]
        dup = list(base)
        for pos in rng.sample(range(words_per_doc), n_repl):
            dup[pos] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(dup)))
        planted[(2 * i, 2 * i + 1)] = n_repl
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df, planted


@pytest.fixture(scope="module")
def corpus(spark):
    df, planted = _make_corpus(spark)
    df = df.localCheckpoint()
    # exact Jaccard over ALL candidate pairs (threshold ~0 keeps any
    # pair sharing a shingle) — this path is DuckDB-oracle-verified
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.01, n=3).collect()
    }
    return df, planted, exact


class TestMinHash:
    def test_planted_structure(self, corpus):
        _, planted, exact = corpus
        # sanity: small replacements give high Jaccard, 30/60 gives low
        highs = [p for p, n in planted.items() if n == 2]
        lows = [p for p, n in planted.items() if n == 30]
        assert highs and lows
        assert all(exact[p] >= 0.8 for p in highs)
        assert all(exact.get(p, 0.0) < 0.5 for p in lows)

    def test_candidate_recall_vs_exact(self, corpus):
        df, _, exact = corpus
        sig = dedup.minhash_signatures(dedup.with_shingles(df, n=3)).select(
            "doc_id", "signature"
        )
        cand = {
            (r["a"], r["b"]): r["est_jaccard"]
            for r in dedup.minhash_lsh_candidates(sig).collect()
        }
        # every truly-similar pair (J >= 0.8) must be a candidate:
        # P(miss) = (1 - J^4)^16 < 0.0013 at J=0.8 — and the fixed
        # xxhash64 seeds make this deterministic, not probabilistic
        high = {p for p, j in exact.items() if j >= 0.8}
        assert high, "corpus must plant high-similarity pairs"
        missed = high - set(cand)
        assert not missed, f"LSH missed high-J pairs: {missed}"
        # signature agreement estimates Jaccard: 64 hashes -> sd ~0.05
        for p in high:
            assert abs(cand[p] - exact[p]) < 0.2, (p, cand[p], exact[p])

    def test_dedup_end_to_end(self, corpus):
        df, _, exact = corpus
        got = {
            (r["a"], r["b"]): r["est_jaccard"]
            for r in dedup.minhash_dedup(df, threshold=0.8).collect()
        }
        # recall: every exact J >= 0.9 pair survives an 0.8 estimate cut
        for p, j in exact.items():
            if j >= 0.9:
                assert p in got, f"missed near-dup {p} (J={j})"
        # precision: nothing truly-dissimilar sneaks past the estimate
        for p in got:
            assert exact.get(p, 0.0) >= 0.6, (p, got[p], exact.get(p))

    def test_identical_docs_est_one(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta"),
             (1, "alpha beta gamma delta epsilon zeta")],
            ["doc_id", "text"],
        )
        rows = dedup.minhash_dedup(df, threshold=0.99).collect()
        assert len(rows) == 1
        assert rows[0]["a"] == 0 and rows[0]["b"] == 1
        assert rows[0]["est_jaccard"] == 1.0


class TestDfCap:
    def test_hot_shingle_dropped_by_cap(self, spark):
        # 30 docs share exactly one hot shingle; all their unique-word
        # shingles are disjoint -> every pair's only support is the hot
        # shingle, so capping its df removes every candidate pair
        rows = [(i, f"hot hot hot u{i} v{i} w{i}") for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
        uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.1, n=3, df_cap=None)
        assert uncapped.count() == 30 * 29 // 2
        capped = dedup.ngram_jaccard_pairs(df, threshold=0.1, n=3, df_cap=10)
        assert capped.count() == 0

    def test_default_cap_is_finite_and_non_binding_small(self, spark):
        assert dedup.DEFAULT_DF_CAP is not None
        rows = [(i, f"hot hot hot u{i} v{i} w{i}") for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
        # df <= n_docs < DEFAULT_DF_CAP -> default == exact uncapped
        default = {tuple(r) for r in dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()}
        exact = {
            tuple(r)
            for r in dedup.ngram_jaccard_pairs(df, threshold=0.1, df_cap=None).collect()
        }
        assert default == exact

    def test_uncapped_warns(self, spark):
        import warnings as _w

        df = spark.createDataFrame([(0, "a b c d"), (1, "a b c e")], ["doc_id", "text"])
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            dedup.ngram_jaccard_pairs(df, threshold=0.9, df_cap=None)
        assert any("uncapped" in str(x.message) for x in rec)


class TestSimHash:
    def test_single_token_fingerprint_is_xxhash64(self, spark):
        # one token: bit j of the fingerprint = (bit j of xxhash64(tok))
        # because the single +/-1 vote per bit IS the bit
        df = spark.createDataFrame([(0, "hello"), (1, "world")], ["doc_id", "text"])
        got = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
        want = {
            r["doc_id"]: r["h"]
            for r in df.select("doc_id", F.xxhash64(F.lit("hello")).alias("h"))
            .filter("doc_id = 0")
            .union(
                df.select("doc_id", F.xxhash64(F.lit("world")).alias("h")).filter(
                    "doc_id = 1"
                )
            )
            .collect()
        }
        assert got == want

    def test_pairs_equal_bruteforce_hamming(self, spark):
        # 200 docs over a small vocab -> some natural near-collisions,
        # plus planted exact dups and 1-word edits
        rng = random.Random(13)
        vocab = [f"t{i}" for i in range(30)]
        rows = []
        for i in range(200):
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(12))))
        rows.append((200, rows[0][1]))                       # exact dup of 0
        edit = rows[1][1].split()
        edit[0] = "zzz"
        rows.append((201, " ".join(edit)))                   # 1-word edit of 1
        df = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()

        fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
        ids = sorted(fps)
        arr = np.array([fps[i] for i in ids], dtype=np.int64).view(np.uint64)
        brute = set()
        for ii in range(len(ids)):
            ham = np.array(
                [bin(int(arr[ii] ^ arr[jj])).count("1") for jj in range(len(ids))]
            )
            for jj in np.where(ham <= 3)[0]:
                if ids[ii] < ids[jj]:
                    brute.add((ids[ii], ids[jj], int(ham[jj])))

        got = {
            (r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(df, max_hamming=3).collect()
        }
        # quarter blocking is complete for distance <= 3 => set EQUALITY
        assert got == brute
        # the planted exact dup must be there at distance 0
        assert (0, 200, 0) in got

    def test_identical_docs_hamming_zero(self, spark):
        df = spark.createDataFrame(
            [(0, "the quick brown fox"), (1, "the quick brown fox"),
             (2, "completely different text entirely")],
            ["doc_id", "text"],
        )
        got = dedup.simhash_near_dups(df, max_hamming=0).collect()
        assert [(r["a"], r["b"], r["hamming"]) for r in got] == [(0, 1, 0)]


class TestReviewRegressions:
    """Round-2 high-effort review findings pinned as regressions."""

    def test_multilingual_docs_not_merged(self, spark):
        # ASCII-only normalization collapsed every non-Latin doc to ''
        rows = [(0, "北京是中国的首都"), (1, "東京は日本の首都"),
                (2, "совершенно другой текст"), (3, "北京是中国的首都")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        groups = dedup.exact_duplicates_normalized(df).collect()
        # only the genuine duplicate pair (0, 3) merges
        assert len(groups) == 1 and groups[0]["n_docs"] == 2
        norm = df.select(dedup.normalized_text(F.col("text")).alias("n")).collect()
        assert all(r["n"] != "" for r in norm)

    def test_minhash_bands_validated(self, spark):
        df = spark.createDataFrame([(0, "a b c d e f"), (1, "a b c d e g")],
                                   ["doc_id", "text"])
        with pytest.raises(ValueError, match="bands"):
            dedup.minhash_dedup(df, num_hashes=8, bands=16)
        with pytest.raises(ValueError, match="bands"):
            dedup.minhash_dedup(df, num_hashes=64, bands=7)  # non-divisor

    def test_simhash_blocking_complete_at_hamming_5(self, spark):
        """Generalized d+1-block pigeonhole: set equality vs brute force
        at max_hamming=5 (the old 4-quarter scheme missed d >= 4)."""
        rng = random.Random(99)
        vocab = [f"q{i}" for i in range(25)]
        rows = []
        for i in range(60):
            words = [rng.choice(vocab) for _ in range(12)]
            rows.append((2 * i, " ".join(words)))
            edit = list(words)
            edit[rng.randrange(12)] = rng.choice(vocab)  # 1-word twin
            rows.append((2 * i + 1, " ".join(edit)))
        df = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
        fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
        ids = sorted(fps)
        brute = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = bin((fps[ids[i]] ^ fps[ids[j]]) & ((1 << 64) - 1)).count("1")
                if h <= 5:
                    brute.add((ids[i], ids[j], h))
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(df, max_hamming=5).collect()
        }
        assert got == brute
        assert brute, "corpus must contain hamming<=5 pairs"

    def test_minhash_banded_exchange_drops_signature(self, spark):
        """Round-2 verdict scale item: the ×bands banding self-join must
        shuffle only (id, band, band_hash); the 64-long signature array
        re-joins by id AFTER pair dedup, never riding the wide exchange."""
        df = spark.createDataFrame(
            [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3} common words here")
             for i in range(20)],
            ["doc_id", "text"],
        )
        sig = dedup.minhash_signatures(dedup.with_shingles(df, n=3)).select(
            "doc_id", "signature"
        ).localCheckpoint()
        cand = dedup.minhash_lsh_candidates(sig)
        jvm = spark.sparkContext._jvm
        plan = cand._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        band_exchanges = [
            blk for blk in plan.split("\n\n")
            if ") Exchange" in blk and "hashpartitioning(band" in blk
        ]
        assert band_exchanges, "expected banded exchanges in the plan"
        for blk in band_exchanges:
            assert "signature" not in blk, blk

    def test_minhash_no_action_before_collect(self, spark):
        """ADVICE r2: building the candidate plan must not launch jobs
        (the old bands validation ran .first() on the signature frame)."""
        df = spark.createDataFrame([(0, "a b c d e"), (1, "a b c d f")],
                                   ["doc_id", "text"])
        sig = dedup.minhash_signatures(dedup.with_shingles(df, n=3)).select(
            "doc_id", "signature"
        ).localCheckpoint()
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        dedup.minhash_lsh_candidates(sig)  # plan only — no action
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before

    def test_simhash_quarter_case_unchanged(self, spark):
        # d=3 must still use 4 blocks of 16 bits (the classic scheme)
        df = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "alpha beta gamma")], ["doc_id", "text"]
        )
        got = dedup.simhash_near_dups(df, max_hamming=3).collect()
        assert [(r["a"], r["b"], r["hamming"]) for r in got] == [(0, 1, 0)]


class TestSharedSpans:
    def test_planted_shared_span(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
        rows = [
            (0, shared + " unique tail zero zero0 zero1 zero2 zero3 zero4"),
            (1, shared + " other ending one one1 one2 one3 one4 one5"),
            (2, "totally different words nothing in common here at all ok"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r["a"], r["b"]): r["shared_spans"]
               for r in dedup.shared_span_pairs(df).collect()}
        assert (0, 1) in got and got[(0, 1)] >= 1
        assert not any(2 in k for k in got)

    def test_df_cap_drops_boilerplate_span(self, spark):
        # the same 8-word header in every doc: capping df kills the pair
        header = "w1 w2 w3 w4 w5 w6 w7 w8"
        rows = [(i, header + f" tail{i} a{i} b{i} c{i} d{i} e{i} f{i} g{i}")
                for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        assert dedup.shared_span_pairs(df, df_cap=5).count() == 0
        assert dedup.shared_span_pairs(df, df_cap=None).count() == 10 * 9 // 2


# ---------------------------------------------------------------------------
# duplicate-family clustering + keeper election
# ---------------------------------------------------------------------------


class TestDedupClusters:
    def test_families_and_keepers(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "aa"),
                (2, "bbbbb"),   # longest in family {1,2,3} -> keeper
                (3, "cc"),
                (4, "solo"),    # in no pair -> singleton keeper
                (5, "xx"),      # ties with 6 on length -> smaller id wins
                (6, "yy"),
            ],
            ["doc_id", "text"],
        )
        # transitive chain 1-2, 2-3 must land in ONE family
        pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["a", "b"])
        rows = {r["doc_id"]: r for r in dedup.dedup_clusters(docs, pairs).collect()}
        assert len(rows) == 6  # every doc labeled exactly once
        assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"] == 1
        assert rows[5]["cluster_id"] == rows[6]["cluster_id"] == 5
        assert rows[4]["cluster_id"] == 4
        keepers = {i for i, r in rows.items() if r["is_keeper"]}
        assert keepers == {2, 4, 5}

    def test_exactly_one_keeper_per_family(self, spark):
        docs = spark.createDataFrame(
            [(i, "t" * (i % 3 + 1)) for i in range(20)], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 18, 2)], ["a", "b"]
        )
        out = dedup.dedup_clusters(docs, pairs)
        per = out.groupBy("cluster_id").agg(
            F.sum(F.col("is_keeper").cast("int")).alias("k")
        )
        assert per.filter(F.col("k") != 1).count() == 0


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, spark):
        docs = spark.createDataFrame(
            [
                # contains the benchmark 4-gram verbatim
                (1, "intro words the quick brown fox jumps outro"),
                # same 4-gram but split by punctuation -> normalization
                # strips it and the gram STILL matches
                (2, "the quick, brown fox!! and more padding here"),
                # no overlap
                (3, "completely unrelated content with many words"),
                # shares the gram TWICE but must count once (distinct)
                (4, "the quick brown fox again the quick brown fox"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [("The Quick Brown Fox",)], ["text"]
        )
        got = {
            r["doc_id"]: r["n_contaminated_grams"]
            for r in dedup.decontaminate(docs, bench, n=4).collect()
        }
        assert got == {1: 1, 2: 1, 4: 1}

    def test_short_docs_and_empty_benchmark(self, spark):
        docs = spark.createDataFrame(
            [(1, "too short"), (2, "a b c d e")], ["doc_id", "text"]
        )
        bench = spark.createDataFrame([("x y z w",)], ["text"])
        assert dedup.decontaminate(docs, bench, n=4).count() == 0
        empty_bench = bench.filter(F.lit(False))
        assert dedup.decontaminate(docs, empty_bench, n=4).count() == 0


class TestSignatureLengthGuard:
    def test_mismatched_signature_frame_raises(self, spark):
        import pyspark

        sh = dedup.with_shingles(
            spark.createDataFrame(
                [(1, "a b c d e f"), (2, "a b c d e g")], ["doc_id", "text"]
            )
        )
        sig128 = dedup.minhash_signatures(sh, num_hashes=128)
        # correct usage works
        dedup.minhash_lsh_candidates(sig128, bands=16, num_hashes=128).collect()
        # a 128-long signature frame against the default num_hashes=64
        # must fail LOUDLY, not half recall / inflate est_jaccard
        with pytest.raises(Exception, match="does not match num_hashes"):
            dedup.minhash_lsh_candidates(sig128, bands=16, num_hashes=64).collect()


class TestExactDedupIncremental:
    def test_cross_batch_and_within_batch(self, spark):
        existing = spark.createDataFrame(
            [(0, "old text one"), (2, "old text two")], ["doc_id", "text"]
        )
        new = spark.createDataFrame(
            [
                (11, "OLD, text one!"),   # normalized == existing -> dropped
                (13, "fresh text"),
                (15, "fresh text"),        # within-batch dup -> 13 kept
                (17, "another new doc"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"] for r in dedup.exact_dedup_incremental(new, existing).collect()}
        assert got == {13, 17}
        # normalized=False: punctuation differences survive the anti-join
        raw = {
            r["doc_id"]
            for r in dedup.exact_dedup_incremental(
                new, existing, normalized=False
            ).collect()
        }
        assert 11 in raw


    def test_null_text_rows_are_excluded(self, spark):
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ])
        new = spark.createDataFrame(
            [(1, None), (2, None), (3, "real content")], schema
        )
        existing = spark.createDataFrame([(0, "old")], schema)
        got = {r["doc_id"] for r in dedup.exact_dedup_incremental(new, existing).collect()}
        # null-text rows neither survive nor collapse each other
        assert got == {3}


class TestEmbeddingNearDupAutoEscalation:
    """VERDICT r3 scale item 1: embedding_near_dups blocking="auto" must
    pick the exact blocked GEMM below the corpus-size threshold and the
    banded-LSH path above it — same planted pair set either way — so
    the engine's last quadratic-by-default path is gone."""

    @pytest.fixture(scope="class")
    def emb_docs(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        for g in range(6):
            base = rng.standard_normal(16)
            for a in range(3):  # 3 near-identical vectors per family
                v = base + (0.01 * rng.standard_normal(16) if a else 0.0)
                rows.append((g * 10 + a, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "doc_id long, embedding array<double>"
        ).localCheckpoint()

    def _run(self, monkeypatch, emb_docs, **kw):
        from context_aware_rag_spark.operators import similarity

        seen = {"path": None}
        real_gemm = similarity._gemm_pairs_exact
        real_sp = similarity.similarity_pairs

        def spy_gemm(*a, **k):
            seen["path"] = "exact"
            return real_gemm(*a, **k)

        def spy_sp(*a, **k):
            seen["path"] = "lsh"
            return real_sp(*a, **k)

        monkeypatch.setattr(similarity, "_gemm_pairs_exact", spy_gemm)
        monkeypatch.setattr(similarity, "similarity_pairs", spy_sp)
        out = dedup.embedding_near_dups(emb_docs, threshold=0.9, **kw)
        return seen["path"], {(r["a"], r["b"]) for r in out.collect()}

    def test_below_threshold_uses_exact_gemm(self, monkeypatch, emb_docs):
        path, pairs = self._run(monkeypatch, emb_docs)  # default auto
        assert path == "exact"
        assert pairs  # planted families found

    def test_above_threshold_escalates_to_lsh(self, monkeypatch, emb_docs):
        path, _ = self._run(monkeypatch, emb_docs, auto_lsh_threshold=4)
        assert path == "lsh"

    def test_pair_sets_equal_across_escalation(self, monkeypatch, emb_docs):
        _, exact = self._run(monkeypatch, emb_docs)
        _, lsh = self._run(monkeypatch, emb_docs, auto_lsh_threshold=4)
        # every planted within-family pair present on both paths
        expected = {
            (str(g * 10 + i), str(g * 10 + j))
            for g in range(6)
            for i in range(3)
            for j in range(i + 1, 3)
        }
        assert exact == lsh
        assert expected <= exact

    def test_forced_overrides(self, monkeypatch, emb_docs):
        p1, m1 = self._run(monkeypatch, emb_docs, blocking="exact",
                           auto_lsh_threshold=1)
        p2, m2 = self._run(monkeypatch, emb_docs, blocking="lsh")
        assert (p1, p2) == ("exact", "lsh")
        assert m1 == m2

    def test_unknown_blocking_raises(self, emb_docs):
        with pytest.raises(ValueError, match="blocking"):
            dedup.embedding_near_dups(emb_docs, blocking="nope")


class TestRemoveSharedSpans:
    """Span REMOVAL (Lee et al. 2022): duplicated windows are cut,
    first global occurrence kept; coverage-set semantics on overlaps."""

    def test_planted_span_cut_from_later_doc(self, spark):
        span = "alpha beta gamma delta eps zeta eta theta"  # 8 words
        docs = spark.createDataFrame(
            [
                (1, f"unique one two three {span} tail words here now"),
                (2, f"{span} completely different suffix content words x y"),
                (3, "no shared content in this document at all ok"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in
               dedup.remove_shared_spans(docs, window=8, every=4).collect()}
        # doc 1 owns the first occurrence (scan starts land on multiples
        # of 4: "unique one two three" shifts the span to index 4)
        assert out[1]["n_spans_cut"] == 0
        assert span in out[1]["cleaned_text"]
        # doc 2's copy starts at index 0 (a multiple of 4) -> cut
        assert out[2]["n_spans_cut"] >= 1
        assert "alpha" not in out[2]["cleaned_text"]
        assert "completely different suffix" in out[2]["cleaned_text"]
        assert out[2]["n_words_removed"] >= 8
        # untouched doc round-trips (lowercased single-space normal form)
        assert out[3]["cleaned_text"] == docs.filter(
            F.col("doc_id") == 3
        ).collect()[0]["text"].lower()
        assert out[3]["n_spans_cut"] == 0 and out[3]["n_words_removed"] == 0

    def test_within_doc_repeat_keeps_first(self, spark):
        span = " ".join(f"s{i}" for i in range(8))
        filler = " ".join(f"f{i}" for i in range(4))
        docs = spark.createDataFrame(
            [(7, f"{span} {filler} {span} trailing bits")],
            ["doc_id", "text"],
        )
        out = dedup.remove_shared_spans(docs, window=8, every=4).collect()[0]
        # second in-doc occurrence (start=12, a multiple of 4) is cut
        assert out["n_spans_cut"] == 1
        assert out["cleaned_text"].count("s0") == 1
        assert "trailing bits" in out["cleaned_text"]

    def test_overlapping_cuts_counted_once(self, spark):
        # doc 2 repeats doc 1's 12-word run: two overlapping 8-word
        # windows (starts 0 and 4) both duplicated -> covered word set
        # is 12 positions, not 16
        run = " ".join(f"r{i}" for i in range(12))
        docs = spark.createDataFrame(
            [
                (1, f"{run} owner suffix padding words"),
                (2, f"{run} other suffix distinct words"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in
               dedup.remove_shared_spans(docs, window=8, every=4).collect()}
        assert out[2]["n_spans_cut"] == 2
        assert out[2]["n_words_removed"] == 12
        assert out[2]["cleaned_text"] == "other suffix distinct words"
        assert out[1]["n_words_removed"] == 0


class TestQualityAwareKeeper:
    def test_keeper_is_best_quality_not_longest(self, spark):
        from context_aware_rag_spark.operators.textmetrics import quality_score_col

        # doc 1: long but junk (no stopwords, heavy punctuation);
        # doc 2: shorter but clean English -> higher composite
        junk = ";;;" + " %$#@!" * 40
        clean = "the quick brown fox is a very good clean document indeed"
        docs = spark.createDataFrame(
            [(1, junk), (2, clean)], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
        by_len = {r["doc_id"]: r["is_keeper"]
                  for r in dedup.dedup_clusters(docs, pairs).collect()}
        by_q = {r["doc_id"]: r["is_keeper"]
                for r in dedup.dedup_clusters(
                    docs, pairs,
                    keeper_score=F.round(quality_score_col("text"), 2),
                ).collect()}
        assert by_len == {1: True, 2: False}     # longest wins by default
        assert by_q == {1: False, 2: True}       # quality flips the keeper

    def test_score_ties_break_by_min_id(self, spark):
        docs = spark.createDataFrame(
            [(5, "same quality text here ok"), (3, "same quality text here ok")],
            ["doc_id", "text"],
        )
        pairs = spark.createDataFrame([(3, 5)], ["a", "b"])
        out = {r["doc_id"]: r["is_keeper"]
               for r in dedup.dedup_clusters(
                   docs, pairs, keeper_score=F.lit(1.0)).collect()}
        assert out == {3: True, 5: False}


class TestDecontaminateMultiN:
    def test_flags_or_across_sizes(self, spark):
        w = lambda k, p: " ".join(f"{p}{i}" for i in range(k))  # noqa: E731
        docs = spark.createDataFrame(
            [
                (1, "lead in " + w(8, "a") + " trailing words here"),    # 8-gram hit
                (2, "other " + w(13, "b") + " suffix"),                  # 13-gram hit
                (3, "totally clean document with no overlap at all ok"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [(w(8, "a"),), (w(13, "b"),)], ["text"]
        )
        single8 = {r["doc_id"] for r in
                   dedup.decontaminate(docs, bench, n=8).collect()}
        multi = {r["doc_id"]: r["n_contaminated_grams"] for r in
                 dedup.decontaminate(docs, bench, n=(8, 13)).collect()}
        # at n=8 alone, doc 2 is ALSO hit (the 13-word bench row sheds
        # 8-grams); at (8,13) doc 2 additionally collides on the 13-gram
        assert single8 == {1, 2}
        assert set(multi) == {1, 2}
        assert multi[2] == 6 + 1  # six 8-grams + one 13-gram
        assert multi[1] == 1

    def test_validation(self, spark):
        docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            dedup.decontaminate(docs, docs, n=[])
        with pytest.raises(ValueError):
            dedup.decontaminate(docs, docs, n=0)


class TestParagraphDedup:
    def test_boilerplate_kept_once_globally(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "unique intro one\nSubscribe to our newsletter!\nbody text a"),
                (2, "unique intro two\nSubscribe to our newsletter!\nbody text b"),
                (3, "unique intro three\nSubscribe to our newsletter!"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in
               dedup.dedup_exact_paragraphs(docs).collect()}
        assert "Subscribe" in out[1]["cleaned_text"]      # first occurrence kept
        assert "Subscribe" not in out[2]["cleaned_text"]
        assert "Subscribe" not in out[3]["cleaned_text"]
        assert out[2]["cleaned_text"] == "unique intro two\nbody text b"
        assert out[3]["cleaned_text"] == "unique intro three"
        assert out[1]["n_paras_removed"] == 0
        assert out[2]["n_paras_removed"] == 1 and out[2]["n_paras"] == 3

    def test_within_doc_repeat_and_empty_exemption(self, spark):
        docs = spark.createDataFrame(
            [(9, "same line\n\nsame line\n\nother line")],
            ["doc_id", "text"],
        )
        out = dedup.dedup_exact_paragraphs(docs).collect()[0]
        # second 'same line' dropped; BOTH empty paragraphs survive
        assert out["cleaned_text"] == "same line\n\n\nother line"
        assert out["n_paras_removed"] == 1


class TestMinHashIncremental:
    """Incremental near-dup ingest == full-batch pair decisions
    restricted to new-touching pairs (the exact_dedup_incremental
    contract lifted to MinHash)."""

    @pytest.fixture(scope="class")
    def split_corpus(self, spark):
        df, _ = _make_corpus(spark, n_base=14, words_per_doc=60, seed=13)
        # ids are 0..27; index = first half, new batch = second half —
        # planted near-dup pairs (2i, 2i+1) straddle the boundary at 14
        existing = df.filter(F.col("doc_id") < 14)
        new = df.filter(F.col("doc_id") >= 14)
        return df, existing.localCheckpoint(), new.localCheckpoint()

    def test_equivalence_with_full_batch(self, split_corpus):
        df, existing, new = split_corpus
        idx = dedup.minhash_signatures(
            dedup.with_shingles(existing), id_col="doc_id"
        ).select("doc_id", "signature")
        got = {
            r["doc_id"]
            for r in dedup.minhash_dedup_incremental(
                new, idx, threshold=0.5
            ).collect()
        }
        # full-batch pairs (a < b): a new doc survives iff it is never
        # the larger side of a pair
        pairs = dedup.minhash_dedup(df, threshold=0.5).collect()
        new_ids = {r["doc_id"] for r in new.collect()}
        killed = {r["b"] for r in pairs if r["b"] in new_ids}
        assert got == new_ids - killed
        assert killed  # planted dups actually straddle the split

    def test_survivors_carry_appendable_signatures(self, split_corpus):
        _, existing, new = split_corpus
        idx = dedup.minhash_signatures(
            dedup.with_shingles(existing), id_col="doc_id"
        ).select("doc_id", "signature")
        out = dedup.minhash_dedup_incremental(new, idx, threshold=0.5)
        row = out.first()
        assert row is not None and len(row["signature"]) == 64
        # appending survivors and re-ingesting the SAME batch drops all
        idx2 = idx.unionByName(out)
        again = dedup.minhash_dedup_incremental(
            new.join(out.select("doc_id"), "doc_id", "left_semi"),
            idx2, threshold=0.5,
        )
        assert again.count() == 0


def test_incremental_index_length_guard(spark):
    """A stored index written with a different num_hashes must fail
    loudly (review finding: silent recall halving otherwise)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    new = spark.createDataFrame(
        [(100, "some new document text here")], ["doc_id", "text"]
    )
    bad_idx = spark.createDataFrame(
        [(1, [11, 22, 33])], "doc_id long, signature array<bigint>"
    )
    with pytest.raises(SparkRuntimeException, match="num_hashes"):
        dedup.minhash_dedup_incremental(new, bad_idx).collect()
    # static banding validation fires BEFORE any cluster work
    ok_idx = spark.createDataFrame([], "doc_id long, signature array<bigint>")
    with pytest.raises(ValueError, match="must divide"):
        dedup.minhash_dedup_incremental(new, ok_idx, bands=10)


def test_paragraph_sep_is_literal_not_regex(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta|gamma delta|alpha beta"), (2, "alpha beta|other")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           dedup.dedup_exact_paragraphs(docs, sep="|").collect()}
    # '|' as a regex would split between every character; literally it
    # yields 3 segments for doc 1, with the repeated 'alpha beta'
    # deduped at its later occurrences
    assert out[1]["cleaned_text"] == "alpha beta|gamma delta"
    assert out[1]["n_paras"] == 3 and out[1]["n_paras_removed"] == 1
    assert out[2]["cleaned_text"] == "other"


class TestDecontaminateBloom:
    def _docs(self, spark):
        rows = [
            (1, "intro words the quick brown fox jumps outro"),
            (2, "the quick, brown fox!! and more padding here"),
            (3, "completely unrelated content with many words"),
            (4, "the quick brown fox again the quick brown fox"),
            (5, "some other words entirely about different topics"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"]), rows

    def test_no_false_negatives_and_matches_exact_at_large_m(self, spark):
        docs, _ = self._docs(spark)
        bench = spark.createDataFrame([("The Quick Brown Fox",)], ["text"])
        exact = {
            r["doc_id"]: r["n_contaminated_grams"]
            for r in dedup.decontaminate(docs, bench, n=4).collect()
        }
        bloom = {
            r["doc_id"]: r["n_flagged_grams"]
            for r in dedup.decontaminate_bloom(docs, bench, n=4).collect()
        }
        # at m=2^20 with a handful of grams, FP probability ~ 0:
        # bloom == exact, and every exact hit is present (no false negs)
        assert bloom == exact == {1: 1, 2: 1, 4: 1}

    def test_tiny_filter_false_positives_match_pure_python(self, spark):
        # m=32 forces collisions; the oracle must reproduce the exact
        # same (deterministic) false positives, including counts
        from context_aware_rag_spark.oracle import precompute

        docs, rows = self._docs(spark)
        bench_texts = ["the quick brown fox", "different topics entirely"]
        bench = spark.createDataFrame([(t,) for t in bench_texts], ["text"])
        got = sorted(
            (r["doc_id"], r["n_flagged_grams"])
            for r in dedup.decontaminate_bloom(
                docs, bench, n=3, m_bits=32, k=2
            ).collect()
        )
        want = precompute.decontaminate_bloom_py(
            rows, bench_texts, n=3, m_bits=32, k=2
        )
        assert got == want
        # superset of the exact operator's flags (bloom never misses)
        exact_ids = {
            r["doc_id"] for r in dedup.decontaminate(docs, bench, n=3).collect()
        }
        assert exact_ids <= {d for d, _ in got}

    def test_multi_n_and_validation(self, spark):
        docs, rows = self._docs(spark)
        bench = spark.createDataFrame([("the quick brown fox jumps",)], ["text"])
        from context_aware_rag_spark.oracle import precompute

        got = sorted(
            (r["doc_id"], r["n_flagged_grams"])
            for r in dedup.decontaminate_bloom(docs, bench, n=(3, 5)).collect()
        )
        want = precompute.decontaminate_bloom_py(
            rows, ["the quick brown fox jumps"], n=(3, 5)
        )
        assert got == want
        import pytest as _pytest

        with _pytest.raises(ValueError):
            dedup.decontaminate_bloom(docs, bench, m_bits=1)
        with _pytest.raises(ValueError):
            dedup.decontaminate_bloom(docs, bench, k=0)


class TestContainment:
    """ngram_containment_pairs: asymmetric containment C = inter/min(sz)
    in exact integer ppm — validated against a pure-Python set
    replication and hand-computed fixtures."""

    @staticmethod
    def _shingles_py(text: str, n: int = 3) -> set:
        from context_aware_rag_spark.oracle.precompute import normalize_py

        words = normalize_py(text).split(" ")
        if len(words) < n:
            return {" ".join(words)}
        return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}

    def _python_pairs(self, rows, threshold_ppm, n=3):
        sets = {i: self._shingles_py(t, n) for i, t in rows}
        out = {}
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                inter = len(sets[a] & sets[b])
                if not inter:
                    continue
                ppm = inter * 1_000_000 // min(len(sets[a]), len(sets[b]))
                if ppm >= threshold_ppm:
                    contained = a if len(sets[a]) <= len(sets[b]) else b
                    out[(a, b)] = (contained, ppm)
        return out

    def test_quote_scores_full_containment_jaccard_misses(self, spark):
        host_words = [f"h{i}" for i in range(60)]
        quote = " ".join(host_words[10:26])  # 16 words inside the host
        df = spark.createDataFrame(
            [(1, " ".join(host_words)), (2, quote)], ["doc_id", "text"]
        )
        got = {
            (r["a"], r["b"]): (r["contained"], r["containment_ppm"])
            for r in dedup.ngram_containment_pairs(df, threshold=0.9).collect()
        }
        assert got == {(1, 2): (2, 1_000_000)}
        # the same pair is invisible to symmetric Jaccard at any
        # ordinary threshold: J = 14/58 < 0.25
        jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
        assert jac == []

    def test_exact_ppm_arithmetic(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d x")], ["doc_id", "text"]
        )
        rows = dedup.ngram_containment_pairs(df, threshold=0.6).collect()
        assert len(rows) == 1
        r = rows[0]
        # shingle sets {abc,bcd,cde} vs {abc,bcd,cdx}: inter=2, min sz=3
        assert (r["a"], r["b"], r["containment_ppm"]) == (1, 2, 666_666)
        # equal sizes -> contained ties to a
        assert r["contained"] == 1

    def test_matches_python_replication_uncapped(self, spark):
        df, _ = _make_corpus(spark, n_base=8, words_per_doc=40, seed=11)
        rows = [(r["doc_id"], r["text"]) for r in df.collect()]
        import pytest as _pytest

        with _pytest.warns(UserWarning):
            got = {
                (r["a"], r["b"]): (r["contained"], r["containment_ppm"])
                for r in dedup.ngram_containment_pairs(
                    df, threshold=0.3, df_cap=None
                ).collect()
            }
        assert got == self._python_pairs(rows, 300_000)

    def test_df_cap_reduces_universe(self, spark):
        # one shingle shared by 3 docs is dropped at df_cap=2, removing
        # the only overlap
        df = spark.createDataFrame(
            [
                (1, "x y z p q r"),
                (2, "x y z a b c"),
                (3, "x y z d e f"),
            ],
            ["doc_id", "text"],
        )
        full = dedup.ngram_containment_pairs(df, threshold=0.2, df_cap=1000)
        assert full.count() == 3  # each pair shares the "x y z" shingle
        capped = dedup.ngram_containment_pairs(df, threshold=0.2, df_cap=2)
        assert capped.count() == 0
