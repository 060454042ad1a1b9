"""Document deduplication operators for large-scale training-data pipelines.

All exact paths are pure built-in DataFrame ops (hash → groupBy — one
shuffle, map-side partial agg for the counts). The near-dup paths
(MinHash+LSH, SimHash, n-gram Jaccard) follow the standard shingle →
signature → band → bucket-join shape: candidate generation is an
equi-join on (band, hash) buckets — linear in documents × bands, never
an all-pairs comparison — and only candidate pairs pay the exact
verification cost.
"""

from __future__ import annotations

import warnings

# module-top: string-annotated pandas UDFs resolve their type hints
# against the defining module's globals (see textmetrics.py)
from typing import Iterator  # noqa: F401

import pandas as pd  # noqa: F401

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default document-frequency cap for the n-gram Jaccard inverted index.
# A shingle appearing in d documents fans out to d^2/2 join rows, and
# Zipf-hot shingles make the uncapped self-join quadratic at corpus
# scale — so the skew guard is ON by default. The cap never binds on
# corpora smaller than DEFAULT_DF_CAP documents (any df <= n_docs), so
# small-scale results are unchanged; pass df_cap=None to force the
# exact uncapped join (verification twin only).
DEFAULT_DF_CAP = 1000

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (text_hash, keep_id, n_dups).

    Representative = min id (deterministic); single shuffle on the hash.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def normalized_text(text_col) -> "F.Column":
    """lower + collapse whitespace + strip punctuation — shared normal
    form for near-dup preprocessing. Unicode-aware: letters/digits of
    ANY script survive (an ASCII-only class would collapse every
    non-Latin document to the same empty normal form and mass-merge a
    multilingual corpus). DuckDB oracle twin: `[^a-z0-9\\p{L}\\p{N}\\s]`
    (RE2 and Java agree on the property classes)."""
    c = F.lower(text_col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def exact_duplicates_normalized(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return exact_duplicates(
        docs.select(F.col(id_col), normalized_text(F.col(text_col)).alias(text_col))
    )


# ---------------------------------------------------------------------------
# shingles / MinHash + LSH
# ---------------------------------------------------------------------------

def with_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Word n-gram shingle set per doc (array<string>, distinct).

    Built by ONE regex pass over the normalized text (r6): the
    normal form is single-spaced, so ``(?:^| )(?=(w w .. w))`` fires a
    capturing lookahead at every word boundary — overlapping n-grams in
    document order from a single codegen'd ``regexp_extract_all``, no
    per-element interpreted lambdas. (History: ``transform(sequence, i
    -> slice(words, i, n))`` is O(words^2) — measured 14.5 s on 5000
    docs; the r6-interim ``zip_with``-chain was O(words) but still one
    interpreted lambda per word per level — 0.42 s noop-isolated on the
    50k bench corpus vs 0.15 s for the regex form, equality-pinned in
    tests/test_r06_optimizations.py.) Empty/NULL normal forms keep the
    single-[""]-shingle convention via the ``otherwise`` branch (the
    regex path never sees an empty word: the normal form is trimmed and
    single-spaced, and the empty-string corner routes to ``otherwise``
    for every n).
    """
    # project the normal form once: it is referenced three times below
    # (condition + both branches) and CollapseProject keeps a non-cheap
    # multiply-referenced projection separate instead of inlining the
    # two regexp_replace passes per reference
    normed = docs.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("_norm")
    )
    norm = F.col("_norm")
    words = F.split(norm, " ")
    pat = "(?:^| )(?=(" + " ".join(["[^ ]+"] * n) + "))"
    shingles = F.when(
        (norm != "") & (F.size(words) >= n),
        F.regexp_extract_all(norm, F.lit(pat), 1),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return normed.select(
        F.col(id_col), F.array_distinct(shingles).alias("shingles")
    )


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per doc:

    sig[k] = min over shingles of xxhash64(shingle, seed=k).

    Shape (r6): Spark's multi-arg ``xxhash64(s, k)`` folds left — the
    string's hash (seed 42) SEEDS the int argument's 4-byte-path hash
    (oracle/xxh64.py pins both halves bit-for-bit against Spark). So the
    seed-INDEPENDENT string hash is computed once per shingle in the JVM
    (``transform(shingles, s -> xxhash64(s))`` — n evaluations instead
    of the old nested form's num_hashes x n interpreted lambdas), and
    the num_hashes seed hashes + per-doc min run VECTORIZED in numpy on
    the whole Arrow batch (~13 uint64 array ops per seed). Exactness:
    ``xxh64_int(k, seed=xxh64(s))`` is replicated literally on uint64
    arrays (wrapping arithmetic == the JVM's long arithmetic), the min
    is taken on the SIGNED int64 view (Spark compares longs signed), a
    null shingle JVM-hashes to the untouched seed 42 exactly as the old
    ``xxhash64(s, k)`` skipped it, and empty/null shingle arrays yield
    the old form's array-of-num_hashes-nulls. Pinned bit-identical to
    the old expression in tests/test_r06_optimizations.py.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    MASK = (1 << 64) - 1
    P1, P2, P3, P5 = (
        11400714785074694791,
        14029467366897019727,
        1609587929392839161,
        2870177450012600261,
    )
    # per-seed 4-byte-path constants, precomputed as python ints
    k_mix = [np.uint64((k * P1) & MASK) for k in range(num_hashes)]
    c_add = np.uint64((P5 + 4) & MASK)
    u23, u41 = np.uint64(23), np.uint64(41)
    u33, u29, u32 = np.uint64(33), np.uint64(29), np.uint64(32)
    uP2, uP3 = np.uint64(P2), np.uint64(P3)
    null_sig = [None] * num_hashes

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(it: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
        for s in it:
            vals = s.to_numpy()
            lens = np.array(
                [0 if a is None else len(a) for a in vals], dtype=np.int64
            )
            out = [null_sig] * len(vals)
            nz = lens > 0
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in vals[nz]]
                ).view(np.uint64)
                nzlens = lens[nz]
                starts = np.zeros(len(nzlens), dtype=np.int64)
                np.cumsum(nzlens[:-1], out=starts[1:])
                sig = np.empty((len(nzlens), num_hashes), dtype=np.int64)
                base = flat + c_add  # (seed + P5 + 4), wraps mod 2^64
                for k in range(num_hashes):
                    h = base ^ k_mix[k]
                    h = (h << u23) | (h >> u41)  # rotl 23
                    h = h * uP2 + uP3
                    h ^= h >> u33
                    h *= uP2
                    h ^= h >> u29
                    h *= uP3
                    h ^= h >> u32
                    sig[:, k] = np.minimum.reduceat(h.view(np.int64), starts)
                for j, i in enumerate(np.nonzero(nz)[0]):
                    out[i] = sig[j]
            yield pd.Series(out, dtype=object)

    base_hashes = F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    return shingled.select(
        F.col(id_col), _sig(base_hashes).alias("signature"), "shingles"
    )


def _validate_bands(bands: int, num_hashes: int) -> int:
    """rows_per_band, after the static banding-parameter checks."""
    if bands > num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}; "
            "bands > num_hashes degenerates the banding join to all-pairs"
        )
    return num_hashes // bands


def _guard_signature_length(
    signatures: DataFrame, num_hashes: int, where: str
) -> DataFrame:
    """In-plan (lazy, per-row assert_true — no driver action) guard that
    the frame actually carries ``num_hashes``-long signatures: a
    mismatched stored index would otherwise silently halve recall and
    deflate est_jaccard instead of failing loudly."""
    return signatures.filter(
        F.assert_true(
            F.size("signature") == F.lit(num_hashes),
            F.concat(
                F.lit(f"{where}: signature length "),
                F.size("signature").cast("string"),
                F.lit(f" does not match num_hashes={num_hashes}"),
            ),
        ).isNull()
    )


def banded_signatures(
    signatures: DataFrame,
    bands: int = 16,
    num_hashes: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_hash) banding of a signature frame — the NARROW
    exchange form every LSH join shuffles, and the form a production
    index store persists once at append time (so later batches never
    re-band history). Includes the signature-length guard."""
    rows_per_band = _validate_bands(bands, num_hashes)
    guarded = _guard_signature_length(signatures, num_hashes, "banded_signatures")
    return guarded.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                "signature", b * rows_per_band + 1, rows_per_band
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )


def _sig_agreement(col_a: str, col_b: str, num_hashes: int):
    """Estimated Jaccard = fraction of agreeing signature positions."""
    return (
        F.size(
            F.filter(
                F.zip_with(col_a, col_b, lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(num_hashes)
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    id_col: str = "doc_id",
    num_hashes: int = 64,
) -> DataFrame:
    """Band the signature; candidate pair = same (band, band_hash).

    Returns (a, b) candidate pairs with estimated Jaccard from full
    signature agreement. With 64 hashes / 16 bands (r=4):
    P(candidate) = 1-(1-J^4)^16 — ~0.97 at J=0.8, ~0.03 at J=0.3.

    Shuffle discipline (the widest exchange in the operator): the banded
    self-join carries ONLY (id, band, band_hash) — the 512-byte
    signature array does NOT ride through the ×bands explode. Estimated
    Jaccard is computed after pair dedup by re-joining the signatures
    frame by id twice: two narrow id-keyed joins on the (much smaller)
    deduped pair set instead of replicating the payload ``bands`` times
    through the hot exchange.

    PRECONDITION: ``id_col`` must be unique in ``signatures`` (one
    signature row per document — what minhash_signatures produces from
    a unique-id corpus). The post-dedup signature re-join fans out one
    row per duplicate id, so duplicated ids would emit repeated (a, b)
    rows where the pre-refactor shape collapsed them; dedupe ids
    upstream rather than paying a defensive shuffle here.

    ``bands`` must divide ``num_hashes`` (the signature length — a
    static parameter, validated without touching the data: bands >
    num_hashes would make every band hash empty and degenerate the join
    to all-pairs; a non-divisor would silently ignore trailing hashes).
    That the FRAME actually carries ``num_hashes``-long signatures is
    enforced lazily in-plan (per-row ``assert_true``, no driver action)
    so a mismatched signatures frame fails loudly instead of silently
    halving recall / inflating est_jaccard.
    """
    banded = banded_signatures(
        signatures, bands=bands, num_hashes=num_hashes, id_col=id_col
    )
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
        )
        .dropDuplicates(["a", "b"])
    )
    sig_a = signatures.select(
        F.col(id_col).alias("a"), F.col("signature").alias("sig_a")
    )
    sig_b = signatures.select(
        F.col(id_col).alias("b"), F.col("signature").alias("sig_b")
    )
    est = _sig_agreement("sig_a", "sig_b", num_hashes)
    return (
        pairs.join(sig_a, "a")
        .join(sig_b, "b")
        .select("a", "b", est.alias("est_jaccard"))
    )


def minhash_dedup(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs (a, b, est_jaccard >= threshold).

    Signatures are materialized (localCheckpoint here; an Iceberg stage
    table in production) at the stage boundary: both sides of the
    banding self-join and the est_jaccard re-joins read the signature
    frame, and without the break each consumer would re-run the whole
    text -> shingles -> signature computation. The shingle stage itself
    is NOT materialized any more (r6): under the numpy signature form
    the shingle array has exactly ONE consumer — the per-shingle
    xxhash64 base-hash transform feeding the signature UDF — so
    CollapseProject inlining it is harmless (it used to be inlined into
    all 64 per-seed lambdas, re-evaluating it 64x per row — measured
    70 s vs 0.5 s on 500 docs — which is why a persist() barrier sat
    here through r5; dropping it also drops the shingle-array cache
    write, the single largest phase of the r5 operator at 50k docs).
    The input is repartitioned: a text corpus often arrives in few fat
    partitions and the per-row array work is CPU-bound.
    """
    from .skew import spread_for_cpu

    sh = with_shingles(
        spread_for_cpu(docs, id_col), n=n, id_col=id_col, text_col=text_col
    )
    sig = minhash_signatures(sh, num_hashes=num_hashes, id_col=id_col).select(
        id_col, "signature"
    ).localCheckpoint()
    cand = minhash_lsh_candidates(
        sig, bands=bands, id_col=id_col, num_hashes=num_hashes
    )
    return cand.filter(F.col("est_jaccard") >= threshold)


def minhash_dedup_incremental(
    new_docs: DataFrame,
    sig_index: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    index_banded: DataFrame | None = None,
) -> DataFrame:
    """Near-dup survivors of a NEW batch against a STORED MinHash
    signature index — the approximate counterpart of
    :func:`exact_dedup_incremental` (same ingest contract: cost scales
    with the new batch, old text is never re-read).

    ``sig_index`` is any frame with (id_col, signature) — the
    accumulated signatures of prior batches. Returns
    (id_col, signature) for the new docs safe to append.

    ``index_banded``: optionally the index's STORED banded form
    ((id_col, band, band_hash) — what :func:`banded_signatures`
    produces, written once per append by the streaming ingest). Without
    it the index is re-banded here each call, which is O(history) work
    per batch; with it the per-batch cost is the batch's own banding
    plus one pruned scan of the stored bands.

    Drop policy (deterministic, order-free): a new doc is dropped iff
    it has estimated Jaccard >= ``threshold`` with ANY index doc, or
    with a smaller-id doc of its own batch (the min-id-wins election
    of exact_dedup_incremental lifted to near-dups — the smallest
    member of every duplicate family always survives). Candidate
    generation is the banding equi-join restricted to pairs touching
    >= 1 new doc, so the full-batch pair set restricted the same way
    yields the identical decision (pytest-proven equivalence).
    """
    _validate_bands(bands, num_hashes)  # static — before any cluster work
    # the index's signature length is guarded in-plan wherever its rows
    # are read (banding below and the est re-join): a stored index
    # written with a different num_hashes must fail loudly, not halve
    # recall / deflate estimates silently
    sig_index = _guard_signature_length(
        sig_index.select(F.col(id_col), "signature"),
        num_hashes,
        "minhash_dedup_incremental(sig_index)",
    )
    from .skew import spread_for_cpu

    sh = with_shingles(
        spread_for_cpu(new_docs, id_col),
        n=n, id_col=id_col, text_col=text_col,
    ).persist()
    try:
        new_sigs = (
            minhash_signatures(sh, num_hashes=num_hashes, id_col=id_col)
            .select(id_col, "signature")
            .localCheckpoint()
        )
    finally:
        sh.unpersist(False)
    new_banded = banded_signatures(
        new_sigs, bands=bands, num_hashes=num_hashes, id_col=id_col
    ).localCheckpoint()
    if index_banded is None:
        index_banded = banded_signatures(
            sig_index, bands=bands, num_hashes=num_hashes, id_col=id_col
        )
    banded = (
        index_banded.select(
            F.col(id_col), "band", "band_hash", F.lit(True).alias("_existing")
        )
        .unionByName(
            new_banded.select(
                F.col(id_col), "band", "band_hash", F.lit(False).alias("_existing")
            )
        )
    )
    # probe side = new docs only: per-bucket fan-out is
    # bucket_new x bucket_all — work scales with the batch, never old^2
    cand = (
        banded.alias("l")
        .join(
            new_banded.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                # keep (other, new) pairs where other is an index doc
                # or a smaller-id new doc — exactly the pairs that can
                # kill the new doc. Index-side SAME-id pairs are kept
                # deliberately: a replayed batch collides with its own
                # appended signatures and drops out (idempotent
                # re-ingest, the exactly-once contract). New-side
                # self-pairs are already excluded (id < id is false).
                F.col("l._existing")
                | (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("other"),
            F.col(f"r.{id_col}").alias("new_id"),
        )
        .dropDuplicates(["other", "new_id"])
    )
    # lazy union for the est lookup — never materialized: the candidate
    # set joins it BY ID, so the index side costs one id-pruned scan at
    # query time, not a per-batch checkpoint of all history. (A
    # replayed batch id present on both sides fans the join out to two
    # identical rows; dropped.distinct() collapses them.)
    all_sigs = sig_index.unionByName(new_sigs)
    sig_o = all_sigs.select(F.col(id_col).alias("other"), F.col("signature").alias("sig_o"))
    sig_n = new_sigs.select(F.col(id_col).alias("new_id"), F.col("signature").alias("sig_n"))
    est = _sig_agreement("sig_o", "sig_n", num_hashes)
    dropped = (
        cand.join(sig_o, "other")
        .join(sig_n, "new_id")
        .withColumn("_est", est)
        .filter(F.col("_est") >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_sigs.join(dropped, id_col, "left_anti").select(id_col, "signature")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification path / small-scale golden)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = DEFAULT_DF_CAP,
) -> DataFrame:
    """Exact Jaccard over shared-shingle candidate pairs.

    Candidates come from an inverted index (explode shingles →
    self-equi-join on shingle) — only pairs sharing >= 1 shingle are
    scored, intersection counts fall out of the join group sizes, and
    union = |A| + |B| - inter. Zipf-hot shingles are the skew risk:
    ``df_cap`` drops shingles appearing in more than that many docs from
    the universe ENTIRELY (both the index and the set sizes), bounding
    the self-join fan-out per bucket at df_cap^2 while keeping Jaccard a
    true set similarity on the reduced universe. The cap defaults ON
    (``DEFAULT_DF_CAP``); ``df_cap=None`` is the exact-uncapped
    verification twin and warns, because its hot-bucket fan-out is
    unbounded at corpus scale.
    """
    if df_cap is None:
        warnings.warn(
            "ngram_jaccard_pairs(df_cap=None): uncapped inverted-index "
            "self-join is quadratic on hot shingles; use the default "
            f"df_cap={DEFAULT_DF_CAP} (or MinHash) beyond verification runs",
            stacklevel=2,
        )
    from .skew import spread_for_cpu

    sh = with_shingles(
        spread_for_cpu(docs, id_col), n=n, id_col=id_col, text_col=text_col
    ).localCheckpoint()  # stage boundary: see minhash_dedup docstring
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    if df_cap is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("shingle")
        )
        inv = inv.join(rare, "shingle", "left_semi").localCheckpoint()
        sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    else:
        sizes = sh.select(F.col(id_col), F.size("shingles").alias("sz"))
    l, r = inv.alias("l"), inv.alias("r")
    inter = (
        l.join(
            r,
            on=[
                F.col("l.shingle") == F.col("r.shingle"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = DEFAULT_DF_CAP,
) -> DataFrame:
    """Asymmetric shingle containment C = |A∩B| / min(|A|, |B|) — the
    near-dup signal symmetric Jaccard structurally misses: a short doc
    quoted verbatim inside a much longer one has Jaccard ≈ |A|/|B| → 0
    as the host grows, while its containment stays 1.0 (Broder 1997's
    "containment" companion to resemblance). The standard curation use
    is dropping snippet/quote/boilerplate documents that are wholly
    embedded in a longer family member.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (explode
    distinct shingles → rare-filtered self-equi-join → group-size
    intersection counts), same default-on ``df_cap`` skew guard, and
    the same candidate completeness argument: a pair with containment
    > 0 shares >= 1 surviving shingle, so the equi-join enumerates
    every scorable pair. The score is EXACT integer ppm
    (``inter * 1e6 div min(sz)``) — no float division anywhere, so any
    partitioning and the DuckDB twin agree bit-for-bit.

    Returns (a, b, contained, containment_ppm) with a < b;
    ``contained`` is the smaller-set side (ties → a), i.e. the
    duplicate candidate whose shingles are covered by the other doc.
    """
    if df_cap is None:
        warnings.warn(
            "ngram_containment_pairs(df_cap=None): uncapped inverted-index "
            "self-join is quadratic on hot shingles; use the default "
            f"df_cap={DEFAULT_DF_CAP} beyond verification runs",
            stacklevel=2,
        )
    threshold_ppm = int(round(threshold * 1_000_000))
    from .skew import spread_for_cpu

    sh = with_shingles(
        spread_for_cpu(docs, id_col), n=n, id_col=id_col, text_col=text_col
    ).localCheckpoint()  # stage boundary: see minhash_dedup docstring
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    if df_cap is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("shingle")
        )
        inv = inv.join(rare, "shingle", "left_semi").localCheckpoint()
        sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    else:
        sizes = sh.select(F.col(id_col), F.size("shingles").alias("sz"))
    l, r = inv.alias("l"), inv.alias("r")
    inter = (
        l.join(
            r,
            on=[
                F.col("l.shingle") == F.col("r.shingle"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .withColumn(
            "containment_ppm",
            F.expr("(inter * 1000000) div least(sz_a, sz_b)"),
        )
        .filter(F.col("containment_ppm") >= F.lit(threshold_ppm))
        .select(
            "a",
            "b",
            F.when(F.col("sz_a") <= F.col("sz_b"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("contained"),
            "containment_ppm",
        )
    )


# ---------------------------------------------------------------------------
# substring-level duplication (shared spans)
# ---------------------------------------------------------------------------

def shared_span_pairs(
    docs: DataFrame,
    window: int = 8,
    every: int = 4,
    min_shared: int = 1,
    df_cap: int | None = DEFAULT_DF_CAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level duplication signal: document pairs sharing
    >= ``min_shared`` duplicated ``window``-word spans (the span-dedup
    idea of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", reduced to the winnowing fingerprints the
    engine already computes).

    Shape: rolling span fingerprints (textmetrics.rolling_fingerprints,
    pure JVM) → inverted index on the span hash → self-equi-join with
    a < b → count shared spans per pair. ``df_cap`` drops spans present
    in more than that many docs (boilerplate headers would otherwise
    fan out quadratically) — the same skew guard as the n-gram Jaccard
    index, ON by default.
    """
    from .textmetrics import rolling_fingerprints

    fp = rolling_fingerprints(
        docs, window=window, every=every, id_col=id_col, text_col=text_col
    )
    inv = fp.select(F.col(id_col), F.explode("fingerprints").alias("span"))
    if df_cap is not None:
        rare = (
            inv.groupBy("span")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("span")
        )
        inv = inv.join(rare, "span", "left_semi")
    inv = inv.localCheckpoint()
    l, r = inv.alias("l"), inv.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l.span") == F.col("r.span"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_spans"))
        .filter(F.col("shared_spans") >= min_shared)
    )


def remove_shared_spans(
    docs: DataFrame,
    window: int = 8,
    every: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span REMOVAL (Lee et al. 2022 §3, completing the family whose
    signal is :func:`shared_span_pairs`): cut every duplicated
    ``window``-word span from the text, keeping the FIRST occurrence —
    global order (doc_id, start) — and dropping all others. Overlapping
    cut spans remove their covered word positions once (coverage-set
    semantics).

    Returns (id_col, cleaned_text, n_spans_cut, n_words_removed) for
    every input doc. ``cleaned_text`` is the lowercased single-spaced
    reconstruction from the surviving word positions (the operator works
    on the same normalized word split as the fingerprint index;
    original casing/whitespace of surviving words is not preserved —
    document-level dedup upstream is unaffected).

    Distributed shape — linear, no self-join: explode span occurrences
    (doc, start, span) → ONE groupBy(span) electing the min
    (doc_id, start) owner and counting occurrences → non-owner
    occurrences of duplicated spans join back per doc (collect the cut
    starts) → per-row word filter against the cut set. The span groupBy
    is the only wide exchange and is map-side combinable; a
    boilerplate span hot key costs one skewed reduce task (AQE splits
    it), never a quadratic fan-out like the pair join would.
    """
    from .textmetrics import _words

    words = _words(F.col(text_col))
    base = docs.select(F.col(id_col), words.alias("_words")).localCheckpoint()
    occ = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("_words") - window, F.lit(0)),
                    F.lit(every),
                ),
                lambda i: F.struct(
                    i.alias("start"),
                    F.concat_ws(
                        " ", F.slice("_words", i + 1, window)
                    ).alias("span"),
                ),
            )
        ).alias("_o"),
    ).select(F.col(id_col), F.col("_o.start").alias("start"), F.col("_o.span").alias("span"))
    owners = occ.groupBy("span").agg(
        F.min(F.struct(F.col(id_col).alias("oid"), F.col("start").alias("ostart"))).alias("_owner"),
        F.count(F.lit(1)).alias("_n_occ"),
    )
    cuts = (
        occ.join(owners, "span")
        .filter(
            (F.col("_n_occ") >= 2)
            & ~(
                (F.col(id_col) == F.col("_owner.oid"))
                & (F.col("start") == F.col("_owner.ostart"))
            )
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("start")).alias("_cut_starts"))
    )
    joined = base.join(cuts, id_col, "left").select(
        F.col(id_col),
        "_words",
        F.coalesce(F.col("_cut_starts"), F.array().cast("array<int>")).alias("_cuts"),
    )
    covered = lambda i: F.exists(  # noqa: E731 — word index i inside any cut span
        F.col("_cuts"), lambda s: (i >= s) & (i < s + window)
    )
    kept = F.filter(
        F.col("_words"), lambda w, i: ~covered(i)
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("cleaned_text"),
        F.size("_cuts").cast("long").alias("n_spans_cut"),
        (F.size("_words") - F.size(kept)).cast("long").alias("n_words_removed"),
    )


def dedup_exact_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Exact PARAGRAPH-level dedup (the line/paragraph pass of C4 and
    Lee et al. 2022 §2: boilerplate lines repeat across pages far more
    than whole documents do): drop every repeated paragraph except its
    first global occurrence — ordered by (doc_id, paragraph index) —
    and reassemble each document from its surviving paragraphs.

    Paragraphs shorter than ``min_chars`` are exempt (never deduped):
    empty segments from consecutive separators would otherwise all
    collapse into the corpus's first empty line.

    Returns (id_col, cleaned_text, n_paras, n_paras_removed).

    Distributed shape — linear: posexplode paragraphs → one
    map-side-combinable groupBy(paragraph) electing the min
    (doc_id, idx) owner + occurrence count → non-owner occurrences of
    repeated paragraphs anti-select → per-doc ordered reassembly (one
    groupBy(doc) whose skew is bounded by paragraphs-per-doc). The
    paragraph groupBy is the only wide exchange; a boilerplate hot key
    is one skewed reduce task (AQE splits it), never a pair join.
    """
    # F.split takes a Java REGEX but the reassembly joins with the
    # LITERAL separator — quote it (\Q...\E) so sep='.' or '|' splits
    # literally instead of exploding per character
    split_pat = "\\Q" + sep + "\\E"
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_pat, -1)).alias("idx", "para"),
    )
    owners = paras.filter(F.length("para") >= min_chars).groupBy("para").agg(
        F.min(F.struct(F.col(id_col).alias("oid"), F.col("idx").alias("oidx"))).alias(
            "_owner"
        ),
        F.count(F.lit(1)).alias("_n_occ"),
    )
    marked = paras.join(owners, "para", "left").withColumn(
        "_drop",
        (F.col("_n_occ") >= 2)
        & ~(
            (F.col(id_col) == F.col("_owner.oid"))
            & (F.col("idx") == F.col("_owner.oidx"))
        ),
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.coalesce(F.col("_drop"), F.lit(False)),
                                F.struct("idx", "para"),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("cleaned_text"),
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum(
                F.coalesce(F.col("_drop"), F.lit(False)).cast("long")
            ).alias("n_paras_removed"),
        )
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(
    docs_with_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    blocking: str = "auto",
    bands: int = 8,
    bits_per_band: int = 16,
    auto_lsh_threshold: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine > threshold.

    ``blocking`` picks the candidate generator:

    - ``"exact"`` — blocked-GEMM triangle join (similarity.
      _gemm_pairs_exact): exact all-pairs scoring, per-task memory
      bounded by the block size but TOTAL scoring work O(n^2) — the
      verification / small-corpus path.
    - ``"lsh"`` — sign-random-projection banding (similarity.
      similarity_pairs blocking="lsh"): near-linear candidate
      generation; candidates are exactly re-scored, so precision is
      1.0 and only recall is approximate (>0.999 for true near-dups at
      cosine >= 0.9 with the default fine 8x16 bands).
    - ``"auto"`` (default) — count the corpus (one agg on the
      already-checkpointed normalized frame) and escalate to LSH at
      ``auto_lsh_threshold`` docs (default canonicalize.
      AUTO_LSH_THRESHOLD, the measured exact/LSH crossover), so a
      100 TB corpus cannot silently get the quadratic plan because a
      caller took the defaults (VERDICT r3 scale item 1).

    PRECONDITION: ``id_col`` unique (the LSH path re-joins embeddings
    by id after pair dedup — see minhash_lsh_candidates).
    """
    from .canonicalize import AUTO_LSH_THRESHOLD
    from .similarity import _gemm_pairs_exact, similarity_pairs

    if blocking not in ("auto", "exact", "lsh"):
        raise ValueError(f"unknown blocking strategy: {blocking!r}")
    if auto_lsh_threshold is None:
        auto_lsh_threshold = AUTO_LSH_THRESHOLD

    # two-step normalize with a checkpoint between: inlining the O(dim)
    # norm aggregate into the per-element divide lambda would make
    # normalization O(dim^2)/row (CollapseProject re-inlines it — the
    # same hazard minhash_dedup documents)
    with_norm = docs_with_emb.select(
        F.col(id_col).cast("string").alias("node_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
        F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        ).alias("_norm"),
    ).localCheckpoint()
    nodes = with_norm.select(
        "node_id",
        F.lit("doc").alias("type"),
        F.transform(F.col("_vec"), lambda x: x / F.col("_norm")).alias("embedding"),
    ).localCheckpoint()
    if blocking == "auto":
        blocking = "lsh" if nodes.count() >= auto_lsh_threshold else "exact"
    if blocking == "exact":
        pairs = _gemm_pairs_exact(nodes, threshold, n_blocks=n_blocks)
    else:
        # dim read from the frame schema would still be unknown until
        # runtime for array columns; one first() on the checkpointed
        # frame is a bounded driver action (1 row)
        first = nodes.select(F.size("embedding").alias("d")).first()
        dim = int(first["d"]) if first is not None else 0
        if dim == 0:
            return nodes.sparkSession.createDataFrame(
                [], "a string, b string, cosine double"
            )
        pairs = similarity_pairs(
            nodes,
            threshold=threshold,
            blocking="lsh",
            bands=bands,
            bits_per_band=bits_per_band,
            dim=dim,
        )
    # ids come back as strings (the GEMM path's id type), pair-ordered
    # lexicographically; callers with typed ids cast + reorder themselves
    return pairs.select("a", "b", F.round("score", 6).alias("cosine"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc, fully JVM-side.

    bit j of the fingerprint = sign of sum over tokens of
    (bit j of xxhash64(token) ? +1 : -1).
    """
    # Shape: token hashes stay JVM-side xxhash64 (one interpreted
    # transform — value-identical to the old form), and the 64-bit
    # vote/threshold runs VECTORIZED in numpy on the whole Arrow batch
    # (unpackbits -> per-doc reduceat -> packbits). The previous
    # one-expression form ran 64 x n_tokens interpreted lambdas per row
    # (nested ``aggregate``/``zip_with`` HOFs are not codegen'd) —
    # measured 5.8 s for simhash_near_dups on the 50k bench corpus with
    # ~2.7 s in the fingerprint alone. Exactness: bit j is set iff the
    # integer vote sum over tokens of +/-1 is > 0 — i.e. iff
    # 2 * popcount_j > n_tokens — pure integer logic, order-free; docs
    # with no usable tokens (NULL text) fingerprint to 0 as before.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .skew import spread_for_cpu

    words = F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))

    @F.pandas_udf(T.LongType())
    def _fp(it: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
        for s in it:
            vals = s.to_numpy()
            lens = np.array(
                [0 if a is None else len(a) for a in vals], dtype=np.int64
            )
            out = np.zeros(len(vals), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in vals[nz]]
                )
                # little-endian platform: byte j//8 / bit j%8 of the
                # int64 view IS bit j of the hash
                bits = np.unpackbits(
                    flat.view(np.uint8).reshape(-1, 8),
                    axis=1, bitorder="little",
                ).astype(np.int64)
                nzlens = lens[nz]
                starts = np.zeros(len(nzlens), dtype=np.int64)
                np.cumsum(nzlens[:-1], out=starts[1:])
                pop = np.add.reduceat(bits, starts, axis=0)
                set_bits = (2 * pop > nzlens[:, None]).astype(np.uint8)
                out[nz] = (
                    np.packbits(set_bits, axis=1, bitorder="little")
                    .view(np.int64)
                    .ravel()
                )
            yield pd.Series(out)

    with_hashes = spread_for_cpu(docs, id_col).select(
        F.col(id_col),
        F.transform(words, lambda w: F.xxhash64(w)).alias("_hashes"),
    )
    return with_hashes.select(F.col(id_col), _fp("_hashes").alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on
    ``max_hamming + 1`` bit-ranges of the 64-bit fingerprint: a pair
    within distance d differs in at most d blocks, so it must agree on
    >= 1 of d+1 (pigeonhole — the generalized Charikar/Manku blocking,
    complete for ANY max_hamming, linear candidate generation; the
    classic 16-bit quarters are the d=3 case)."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_blocks = max_hamming + 1
    width = 64 // n_blocks  # last block absorbs the remainder bits
    sh = simhash64(docs, id_col=id_col, text_col=text_col)
    if n_blocks == 1:
        blocks_expr = "array(simhash)"  # d=0: equality on the full hash
    else:
        blocks_expr = (
            f"transform(sequence(0, {n_blocks - 1}), q -> "
            f"IF(q = {n_blocks - 1}, shiftrightunsigned(simhash, q * {width}), "
            f"shiftrightunsigned(simhash, q * {width}) & {(1 << width) - 1}L))"
        )
    # materialize the banded fingerprints ONCE: both sides of the
    # self-join read this frame, and without the break each branch
    # re-runs the whole fingerprint computation (measured: the join
    # stage costs ~1 s from a materialized frame vs ~4.8 s recomputing
    # simhash64 twice on the 50k bench corpus)
    quarters = sh.select(
        F.col(id_col),
        "simhash",
        F.posexplode(F.expr(blocks_expr)).alias("quarter", "qval"),
    ).localCheckpoint()
    l, r = quarters.alias("l"), quarters.alias("r")
    # the Hamming predicate sits INSIDE the join: on (quarter, qval)
    # equi-keys it runs as the sort-merge join's streamed filter, so
    # false-positive bucket-mates (the vast majority of candidates —
    # a 16-bit block over N docs holds ~N/65k mates each, probed once
    # per agreeing quarter) are dropped in the join loop and never
    # materialized; dropDuplicates then shuffles only TRUE pairs
    # (output-sized) instead of the ~(d+1)× candidate set. Same rows
    # out; at 1.2M docs this is the difference between deduping ~40M
    # candidate rows and ~200k near-dup rows.
    hamming_lr = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            on=[
                F.col("l.quarter") == F.col("r.quarter"),
                F.col("l.qval") == F.col("r.qval"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
                hamming_lr <= max_hamming,
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            hamming_lr.alias("hamming"),
        )
        .dropDuplicates(["a", "b"])
    )


# ---------------------------------------------------------------------------
# duplicate-family clustering + keeper election
# ---------------------------------------------------------------------------

def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keeper_score=None,
    cc_algorithm: str = "label",
) -> DataFrame:
    """Collapse near-duplicate PAIRS (from any candidate generator —
    MinHash, SimHash, n-gram Jaccard, embedding cosine) into duplicate
    FAMILIES via connected components, then elect exactly one keeper
    per family: by default the longest document, ties broken by
    smallest id (the "keep one representative per cluster" step of
    Lee et al. 2022 / SlimPajama-style dedup; the reference merges
    duplicate entities the same way via CC over similarity edges,
    graph_rag/base.py:319-360).

    ``keeper_score``: optional Column over the docs frame's columns —
    the keeper becomes the family member with the HIGHEST score (ties
    -> smallest id), so curation can keep the best-quality member
    (e.g. the textmetrics quality composite) instead of merely the
    longest. The election stays one window shuffle either way.

    ``cc_algorithm``: ``"label"`` (default — pair graphs from
    threshold dedup are near-cliques, diameter 2-3) or ``"lss"``
    (large-star/small-star, O(log n) rounds — use when the pair graph
    may contain long chains, e.g. shared-span filaments at web scale).

    Returns (id_col, cluster_id, is_keeper) for EVERY input document;
    docs in no pair are singleton families (cluster_id = own id,
    is_keeper = true).

    Distributed shape: CC iterates only over the pair graph (tiny
    vs the corpus — near-dup pairs, not documents); the corpus joins
    the resulting label map once (left join, broadcast-able since the
    map is bounded by 2x pair count), and keeper election is a single
    window shuffle on cluster_id whose skew is bounded by the largest
    duplicate family, not corpus size.
    """
    from pyspark.sql import Window

    from .canonicalize import connected_components

    cc = connected_components(
        pairs.select("a", "b"), algorithm=cc_algorithm
    ).withColumnRenamed("node_id", id_col)
    score = keeper_score if keeper_score is not None else F.length(text_col)
    labeled = (
        docs.select(F.col(id_col), score.alias("_score"))
        .join(cc, id_col, "left")
        .select(
            id_col,
            "_score",
            F.coalesce(F.col("canon_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return labeled.select(
        F.col(id_col),
        F.col("cluster_id"),
        (F.row_number().over(w) == 1).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def _gram_sizes(n: "int | tuple[int, ...] | list[int]") -> "list[int]":
    ns = sorted({int(x) for x in (n if isinstance(n, (tuple, list)) else [n])})
    if not ns or ns[0] < 1:
        raise ValueError(f"n must be >= 1 gram sizes, got {n!r}")
    return ns


def _size_grams(words, k: int):
    # zip_with chain over shifted copies — O(words) per doc, same trick
    # as with_shingles. (The previous transform(sequence, i ->
    # concat_ws(slice(words, i, k))) shape copies a slice per index and
    # is interpreted per element: measured 5.27 s vs 0.70 s for the
    # (1,2)-gram scan of the 50k bench corpus.) Output is identical:
    # split() never yields NULL elements, so concat == concat_ws here,
    # and the trailing zip_with null-pads are cut by the final slice.
    if k == 1:
        # k=1 grams ARE the words; the guard keeps the NULL-text result
        # an empty array (as before), not NULL
        return F.when(F.size(words) >= 1, words).otherwise(
            F.array().cast("array<string>")
        )
    acc = words
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(words, j + 1, F.size(words)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(
        F.size(words) >= k,
        F.slice(acc, 1, F.size(words) - (k - 1)),
    ).otherwise(F.array().cast("array<string>"))


def _norm_grams_col(tcol: str, ns: "list[int]"):
    """Normalized word n-gram arrays for every size in ``ns``, concatenated
    in ONE projection (one narrow scan regardless of size count)."""
    words = F.split(normalized_text(F.col(tcol)), " ")
    per_size = [_size_grams(words, k) for k in ns]
    return per_size[0] if len(per_size) == 1 else F.concat(*per_size)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: "int | tuple[int, ...] | list[int]" = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """GPT-3-style eval-set decontamination (Brown et al. 2020 App. C):
    flag training documents that share any normalized word ``n``-gram
    with a benchmark / eval corpus. Returns (id_col,
    n_contaminated_grams) for FLAGGED docs only — the count is over the
    doc's DISTINCT shared grams.

    ``n`` may be a single gram size or a collection (Brown et al. use
    8–13-gram collisions — pass e.g. ``(8, 13)``): a doc is flagged if
    it collides at ANY size (the per-size flags OR together), and the
    count sums the distinct shared grams across sizes (gram strings of
    different word counts never collide, so one union-ed gram universe
    preserves per-size distinctness).

    Distributed shape: both sides normalize (lower / strip punct /
    collapse whitespace) and shingle into word n-grams — per-size gram
    arrays concatenated in ONE projection, so multiple sizes still cost
    one narrow scan of each side; the benchmark side is distinct-ed
    and BROADCAST (eval sets are thousands of rows, never
    corpus-scale), so the corpus pays one broadcast-hash join + a
    map-side-combined count — no wide shuffle at any size.
    """
    ns = _gram_sizes(n)

    def grams_col(tcol: str):
        return _norm_grams_col(tcol, ns)

    bench_grams = benchmark.select(
        F.explode(grams_col(bench_text_col)).alias("gram")
    ).distinct()
    doc_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(grams_col(text_col))).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated_grams"))
    )


def _bloom_positions(gram_col, m_bits: int, k: int):
    """k Bloom bit positions per gram via Kirsch–Mitzenmacher double
    hashing: pos_i = (h1 + i·h2) mod m, with h1/h2 reduced mod m FIRST
    so the arithmetic never overflows a long (Spark 4 runs ANSI mode —
    a raw h1 + i·h2 on full-range xxhash64 longs would throw)."""
    p1 = F.pmod(F.xxhash64(gram_col), F.lit(m_bits))
    p2 = F.pmod(F.xxhash64(gram_col, F.lit(7)), F.lit(m_bits))
    return F.array(*[F.pmod(p1 + F.lit(i) * p2, F.lit(m_bits)) for i in range(k)])


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: "int | tuple[int, ...] | list[int]" = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Bloom-filter decontamination — the bounded-memory scale path.

    Same semantics as :func:`decontaminate` (flag docs sharing any
    normalized word n-gram with the benchmark) except membership is
    tested through an m-bit / k-hash Bloom filter of the benchmark
    grams: a gram is flagged iff ALL k of its bit positions are set.
    NO false negatives ever (every truly shared gram is flagged); false
    positives occur at the classic (1 - e^{-kg/m})^k rate (g = distinct
    benchmark grams) and are DETERMINISTIC — fixed-seed xxhash64, so
    the pure-Python oracle reproduces them bit-for-bit.

    Why it scales where :func:`decontaminate` stops: the broadcast side
    here is the SET BIT POSITIONS — at most min(k·g, m) longs, bounded
    by ``m_bits`` no matter how large the benchmark suite grows —
    whereas the exact operator broadcasts the gram strings themselves
    (unbounded width: 13-gram strings easily average >80 bytes). On a
    real cluster the position set ships once per executor as a
    broadcast-hash-join build side; the corpus still pays exactly one
    narrow scan + map-side-combined count. Returns
    (id_col, n_flagged_grams) for flagged docs — counts include the
    (deterministic) false positives by design; chase with the exact
    operator over the flagged subset to confirm, the standard
    bloom-then-verify cascade.
    """
    ns = _gram_sizes(n)
    if m_bits < 2 or k < 1:
        raise ValueError(f"need m_bits >= 2 and k >= 1, got {m_bits=}, {k=}")
    bloom = (
        benchmark.select(F.explode(_norm_grams_col(bench_text_col, ns)).alias("gram"))
        .distinct()
        .select(F.explode(_bloom_positions(F.col("gram"), m_bits, k)).alias("pos"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_norm_grams_col(text_col, ns))).alias("gram"),
    )
    doc_pos = doc_grams.select(
        F.col(id_col),
        F.col("gram"),
        F.explode(_bloom_positions(F.col("gram"), m_bits, k)).alias("pos"),
    )
    # gram flagged iff all k exploded positions hit (duplicate positions
    # within one gram's k-set hit or miss together, so count==k is exact)
    flagged = (
        doc_pos.join(F.broadcast(bloom), "pos")
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") == k)
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_flagged_grams")
    )


def exact_dedup_incremental(
    new_docs: DataFrame,
    existing_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """Survivors of a NEW batch against an EXISTING corpus: drop every
    new doc whose (optionally normalized) text hash is already present,
    then keep one representative (min id) per within-batch duplicate
    group. Returns (id_col, text_hash) — the rows safe to append.

    The batch-mode counterpart of the reference's MERGE-on-ingest
    semantics (new chunks fold into the live graph without re-reading
    old ones). Cost scales with the new batch plus the hash INDEX: the
    existing side reduces to distinct hashes — at production scale
    that is the stored hash table from prior runs, never a re-scan of
    old text — and the anti-join ships only 16-byte keys.

    NULL-text rows are EXCLUDED on both sides (they have no content
    hash; without the filter every null row would collapse into one
    survivor group, silently dropping distinct docs).
    """
    return dedup_against_index(
        new_docs,
        hash_docs(existing_docs, id_col, text_col, normalized),
        id_col=id_col,
        text_col=text_col,
        normalized=normalized,
    )


def hash_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """(id, text) -> (id, text_hash) content keys; NULL-text dropped."""
    t = normalized_text(F.col(text_col)) if normalized else F.col(text_col)
    return docs.select(F.col(id_col), F.md5(t).alias("text_hash")).filter(
        F.col("text_hash").isNotNull()
    )


def dedup_against_index(
    new_docs: DataFrame,
    hash_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """Core of the incremental path, taking the STORED hash index
    directly (any frame with a ``text_hash`` column — e.g. the
    accumulated streaming stage table) instead of re-hashing old docs.
    """
    return (
        hash_docs(new_docs, id_col, text_col, normalized)
        .join(hash_index.select("text_hash").distinct(), "text_hash", "left_anti")
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "text_hash")
    )


def allpairs_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via prefix filtering — the AllPairs
    candidate generation of Bayardo, Ma & Srikant, "Scaling Up All
    Pairs Similarity Search" (WWW 2007), with the size filter of
    Arasu et al.; same output contract as
    :func:`ngram_jaccard_pairs` with ``df_cap=None`` (bit-identical
    pair set and scores), but sub-quadratic candidate generation that
    needs NO universe truncation.

    Tokenization wrapper: shingles the text (word n-grams) and
    delegates to :func:`allpairs_jaccard_pairs_sets` — see there for
    the algorithm and the 100 TB shape.
    """
    from .skew import spread_for_cpu

    sh = with_shingles(
        spread_for_cpu(docs, id_col), n=n, id_col=id_col,
        text_col=text_col,
    ).localCheckpoint()  # stage boundary: see minhash_dedup docstring
    return allpairs_jaccard_pairs_sets(
        sh, threshold=threshold, id_col=id_col, tokens_col="shingles"
    )


def allpairs_jaccard_pairs_sets(
    sets: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """EXACT Jaccard pairs (a, b, jaccard >= threshold) over arbitrary
    TOKEN SETS (``tokens_col``: array<string>, treated as distinct) —
    the set-similarity core behind :func:`allpairs_jaccard_pairs`, also
    driving predicate canonicalization (distributional similarity over
    (subj, obj) pair sets).

    Why it scales where the plain inverted index stops: order every
    set's tokens by ASCENDING global document frequency (rarest first;
    token string breaks ties, so the order is total and
    deterministic). A pair with J >= t must share at least
    ceil(t*|A|) tokens with either side, so each side must expose
    at least one of its first |A| - ceil(t*|A|) + 1 ordered tokens
    — the PREFIX. Indexing only prefixes (a) shrinks the index to
    ~(1-t) of the token stream and (b) structurally avoids hot
    buckets: a Zipf-hot token sits at the END of every set's
    frequency order and almost never enters a prefix, so the
    equi-join's skew guard is the ordering itself, not a df_cap that
    changes the measured universe. Candidates then pass the size
    filter (J >= t forces t*max(|A|,|B|) <= min) before ONE exact
    re-scoring join on the full token sets (array_intersect,
    JVM-side) — precision comes from exact verification, recall from
    the prefix theorem, so the result is exact at any corpus shape.

    The prefix length uses integer-ppm floor arithmetic (alpha =
    (t_ppm * sz) div 1e6, one token longer than the ceil-tight
    prefix in the non-integral case) — conservatively MORE candidates,
    never fewer, and no float partition-order hazard.

    100 TB shape: one token scan for df, one token-keyed shuffle
    to rank, one prefix-index equi-join (buckets bounded by prefix df,
    i.e. rare tokens), one candidate-keyed verification join. The
    PPJoin positional filter would cut candidates further; it prunes
    constants, not the asymptotics, and is left out for plan clarity.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"need 0 < threshold <= 1, got {threshold}")
    t_ppm = int(round(threshold * 1_000_000))
    sh = sets.select(
        F.col(id_col), F.array_distinct(F.col(tokens_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    inv = sh.select(F.col(id_col), F.explode("_toks").alias("token"))
    dfreq = inv.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    # rarest-first total order per set, then cut the prefix
    prefix_idx = (
        inv.join(dfreq, "token")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("token")))
            ).alias("_ord")
        )
        .select(
            F.col(id_col),
            F.size("_ord").alias("sz"),
            F.expr(
                f"slice(transform(_ord, x -> x.token), 1, "
                f"cast(size(_ord) - (size(_ord) * {t_ppm}) div 1000000 + 1 "
                f"as int))"
            ).alias("_prefix"),
        )
        .select(F.col(id_col), "sz", F.explode("_prefix").alias("token"))
        .localCheckpoint()
    )
    l, r = prefix_idx.alias("l"), prefix_idx.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.token") == F.col("r.token"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
                # size filter: J >= t forces t * max <= min (integer ppm)
                F.least(F.col("l.sz"), F.col("r.sz")) * 1_000_000
                >= F.greatest(F.col("l.sz"), F.col("r.sz")) * t_ppm,
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .dropDuplicates(["a", "b"])
    )
    sets_a = sh.select(F.col(id_col).alias("a"), F.col("_toks").alias("_sa"))
    sets_b = sh.select(F.col(id_col).alias("b"), F.col("_toks").alias("_sb"))
    scored = (
        cand.join(sets_a, "a")
        .join(sets_b, "b")
        .withColumn("inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("_sa") + F.size("_sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return scored.select("a", "b", F.round("jaccard", 6).alias("jaccard"))
