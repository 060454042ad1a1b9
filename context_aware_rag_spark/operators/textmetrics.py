"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side built-ins (whole-stage codegen);
designed so each has an exact ANSI-SQL twin for DuckDB oracle checks.
"""

from __future__ import annotations

# module-top imports: string-annotated pandas UDFs resolve their type
# hints against the defining module's globals — function-local imports
# break with UNSUPPORTED_SIGNATURE
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# top English stopwords used by the n-gram-free heuristic language ID
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was", "it",
    "for", "on", "with", "as", "at", "by", "this", "that", "are", "be",
]


def _words(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


# BPE-ish pre-tokenizer: word pieces, digit runs, and individual
# punctuation — the GPT-2-style regex shape (letters | numbers | other),
# minus the lookaheads JVM regex shares with DuckDB. Canonical
# definition lives in functions.bpe (pyspark-free) — re-exported here
# for the JVM/SQL twins.
from ..functions.bpe import BPE_TOKEN_RE  # noqa: E402


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens, a chars/4 proxy, and a BPE-ish regex
    pre-tokenizer count (letter runs | digit runs | punct) — all cheap,
    all SQL-twin-able."""
    words = _words(F.col(text_col))
    # long casts: DuckDB len()/length() are BIGINT — keep oracle schemas equal
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.length(text_col).cast("long").alias("n_chars"),
        (F.length(text_col) / 4).cast("int").alias("approx_bpe_tokens"),
        # function API, not F.expr: a SQL string literal would eat the
        # backslash in \s and silently match spaces
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("regex_tokens"),
    )


def token_counts_bpe(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """REAL byte-level BPE token counts (functions/bpe.py, vendored
    merge table) — the pluggable-tokenizer slot upgraded from the
    chars/4 proxy (VERDICT.md round-2 item 5). Arrow-batched pandas UDF
    (the merge loop is pure Python, so it runs vectorized per batch,
    never per-row on the JVM path); the DuckDB twin is a precomputed
    oracle parquet built by the same tokenizer driver-side."""

    @F.pandas_udf(T.LongType())
    def _count(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ..functions.bpe import bpe_token_count

        for s in it:
            yield s.map(bpe_token_count)

    return docs.select(
        F.col(id_col), _count(F.col(text_col)).alias("bpe_tokens")
    )


def quality_score_col(text_col) -> "F.Column":
    """The composite quality score in [0,1] as a bare Column — shared
    by :func:`quality_scores` and score-pluggable consumers (e.g. the
    quality-aware dedup keeper)."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    mean_word_len = (
        F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(n_words, F.lit(1))
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    return (
        F.when((n_words >= 5) & (n_words <= 100000), F.lit(0.4)).otherwise(0.0)
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), F.lit(0.3)).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(0.0)
        + F.when(stop_ratio >= 0.01, F.lit(0.1)).otherwise(0.0)
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + a composite
    quality score in [0,1] (Gopher-style filters, simplified)."""
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*EN_STOPWORDS))
    )
    mean_word_len = (
        F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(n_words, F.lit(1))
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    score = quality_score_col(text)
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic: 'en' if >= 8% of tokens are
    English stopwords, else 'unknown' (n-gram profiles would slot in the
    same shape; the scoring stays a JVM-side array filter)."""
    words = _words(F.col(text_col))
    stop_ratio = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS))) / F.greatest(
        F.size(words), F.lit(1)
    )
    return docs.select(
        F.col(id_col),
        F.round(stop_ratio, 4).alias("en_stop_ratio"),
        F.when(stop_ratio >= 0.08, F.lit("en")).otherwise("unknown").alias("lang_pred"),
    )


# character-trigram profiles (Cavnar-Trenkle style, truncated to the
# highest-frequency trigrams per language; space-padded word boundaries)
TRIGRAM_PROFILES = {
    "en": [" th", "the", "he ", "ing", "ng ", "and", "nd ", " an",
           "ed ", " of", "of ", "ion"],
    "fr": [" de", "de ", "es ", "le ", " le", "ent", "nt ", "que",
           " qu", "la ", " la", "ais"],
    "de": ["en ", "er ", " de", "der", "ie ", "die", "ch ", "ein",
           " ei", "ung", "ng ", "sch"],
}


def language_id_ngram(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_ratio: float = 0.05,
) -> DataFrame:
    """Character-trigram language ID (the n-gram heuristic variant of
    :func:`language_id`): score(lang) = fraction of the doc's trigrams
    that appear in the language's profile; predict the argmax when it
    clears ``min_ratio``, else 'unknown'.

    Entirely JVM-side: one transform() builds the trigram array once,
    one size(filter(...)) per profile scores it — no shuffle, codegen
    end to end; profiles are literal IN-lists (broadcast-free).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z ]", " ")
    norm = F.regexp_replace(norm, r" +", " ")
    # substring with a COLUMN start position needs the SQL form
    tri = F.expr(
        "transform(sequence(1, greatest(length(_norm) - 2, 1)),"
        " i -> substring(_norm, i, 3))"
    )
    base = docs.select(F.col(id_col), norm.alias("_norm")).withColumn("_tri", tri)
    n_tri = F.greatest(F.size("_tri"), F.lit(1))
    scores = {
        lang: (
            F.size(F.filter(F.col("_tri"), lambda t: t.isin(*prof))) / n_tri
        )
        for lang, prof in TRIGRAM_PROFILES.items()
    }
    best_score = F.greatest(*scores.values())
    pred = F.when(best_score < min_ratio, F.lit("unknown"))
    # deterministic tie-break: language order en, fr, de
    for lang in TRIGRAM_PROFILES:
        pred = pred.when(scores[lang] == best_score, F.lit(lang))
    return base.select(
        F.col(id_col),
        *[F.round(scores[lang], 6).alias(f"score_{lang}") for lang in TRIGRAM_PROFILES],
        pred.otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, word-level):
    per document, the fraction of word ``n``-grams that are duplicated
    (``dup_gram_frac``) and the fraction claimed by the single most
    frequent ``n``-gram (``top_gram_frac``). High values flag boilerplate
    / degenerate repetition for training-data culling.

    Distributed shape: explode n-grams → partial-agg count on
    (doc, gram) → final agg on doc. Both aggregations map-side combine;
    the only shuffle keys on (doc, gram), so skew is bounded by the
    document length cap, not corpus size. Docs with fewer than ``n``
    words emit no n-grams and are absent from the output (same on the
    DuckDB twin).
    """
    words = _words(F.col(text_col))
    # guard the sequence: sequence(1, 0) is DESCENDING [1, 0], not empty
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.sum("cnt")
    return counts.groupBy(id_col).agg(
        total.cast("long").alias("n_grams"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)) / total, 6
        ).alias("dup_gram_frac"),
        F.round(F.max("cnt") / total, 6).alias("top_gram_frac"),
    )


# PII patterns shared verbatim with the DuckDB oracle twins — restricted
# to the Java-regex ∩ RE2 dialect (no lookarounds, no backrefs)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4/Dolma-style PII redaction: replace emails / NANP-style phone
    numbers / IPv4 addresses with typed placeholder tokens and report
    per-document match counts (counted on the ORIGINAL text, so
    overlapping rewrites can't hide matches).

    Pure JVM regexp_replace / regexp_extract_all — narrow, no shuffle,
    whole-stage codegen; scales as a map over the corpus.
    """
    text = F.col(text_col)

    def _n(pat: str):
        return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")

    scrubbed = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")
    scrubbed = F.regexp_replace(scrubbed, PII_IP_RE, "<IP>")
    return docs.select(
        F.col(id_col),
        _n(PII_EMAIL_RE).alias("n_emails"),
        _n(PII_PHONE_RE).alias("n_phones"),
        _n(PII_IP_RE).alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


# the stopword list of Gopher's rule A1.1 #6 (Rae et al. 2021):
# a doc must contain at least two of these
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021 §A1.1) as a per-rule
    boolean breakdown plus the composite ``keep``:

    1. ``ok_words``      — word count in [min_words, max_words];
    2. ``ok_mean_len``   — mean word length in [3, 10];
    3. ``ok_symbols``    — (# + ellipsis) to word ratio <= 0.1;
    4. ``ok_bullets``    — < 90% of lines bullet-started AND < 30%
                           ellipsis-ended;
    5. ``ok_alpha``      — >= 80% of words contain a letter;
    6. ``ok_stopwords``  — >= 2 distinct required stopwords present.

    (The repetition rules of the same table live in
    :func:`repetition_signals` — compose them as in the curation
    pipeline.) Pure JVM expressions — narrow map, no shuffle.
    """
    text = F.col(text_col)
    words = _words(text)
    n_words = F.greatest(F.size(words), F.lit(1))
    mean_wl = F.length(F.regexp_replace(F.lower(F.trim(text)), r"\s", "")) / n_words
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    lines = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
            )
        )
        / n_lines
    )
    ell_frac = F.size(F.filter(lines, lambda l: l.endswith("..."))) / n_lines
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / n_words
    )
    n_req_stops = F.size(
        F.array_intersect(
            words, F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
        )
    )
    rules = {
        "ok_words": (F.size(words) >= min_words) & (F.size(words) <= max_words),
        "ok_mean_len": (mean_wl >= 3) & (mean_wl <= 10),
        "ok_symbols": ((n_hash + n_ell) / n_words) <= 0.1,
        "ok_bullets": (bullet_frac < 0.9) & (ell_frac < 0.3),
        "ok_alpha": alpha_frac >= 0.8,
        "ok_stopwords": n_req_stops >= 2,
    }
    keep = F.lit(True)
    for c in rules.values():
        keep = keep & c
    return docs.select(
        F.col(id_col),
        *[c.alias(name) for name, c in rules.items()],
        keep.alias("keep"),
    )


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation, have at least
    ``min_words_per_line`` words, and don't mention "javascript"; drop
    whole pages containing "lorem ipsum" or a curly brace, or whose
    kept-line count falls below ``min_kept_lines``.

    Returns (id, n_lines, n_kept, cleaned) for SURVIVING docs only.
    Pure JVM higher-order array functions over a line split — a narrow
    map + filter with no shuffle; scales as a single pass over the
    corpus with full predicate pushdown upstream.
    """
    lines = F.transform(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l)
    )
    kept = F.filter(
        lines,
        lambda l: (
            l.rlike(r'[.!?"]$')
            & (F.size(F.split(l, r"\s+")) >= min_words_per_line)
            & ~F.lower(l).contains("javascript")
        ),
    )
    page_bad = (
        F.lower(F.col(text_col)).contains("lorem ipsum")
        | F.col(text_col).contains("{")
        | F.col(text_col).contains("}")
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(lines).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, "\n").alias("cleaned"),
            page_bad.alias("_bad"),
        )
        .filter(~F.col("_bad") & (F.col("n_kept") >= min_kept_lines))
        .drop("_bad")
    )


def rolling_fingerprints(
    docs: DataFrame,
    window: int = 8,
    every: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing-style document fingerprints: hash every ``window``-word
    span starting at multiples of ``every`` — an array column of span
    hashes per doc, usable for containment/plagiarism joins.

    JVM-side: sequence → transform(slice → concat_ws → xxhash64).
    """
    words = _words(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - window, F.lit(0)),
        F.lit(every),
    )
    prints = F.transform(
        starts,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window))),
    )
    return docs.select(
        F.col(id_col),
        F.array_distinct(prints).alias("fingerprints"),
        F.size(F.array_distinct(prints)).alias("n_fingerprints"),
    )


def quality_classifier(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """fastText-style learned quality filter (CCNet / LLaMA data prep:
    a linear classifier over hashed n-gram bags separates curated from
    garbage text; Joulin et al. 2016 for the model shape).

    Applies the VENDORED logistic-regression weights trained by
    tools/gen_quality_clf.py (positives = the documents corpus,
    negatives = deterministic word-salad/letter-scramble corruptions).
    Scoring is exact cross-engine arithmetic: the hashed-bucket dot
    product is an integer sum of ``count * w_micro[bucket]``; the
    mean-bag division, bias, and sigmoid happen once per doc in a
    fixed operation order, so the pure-Python oracle reproduces every
    float bit-for-bit.

    Returns (id_col, n_grams, dot_micro, logit, prob, keep).

    100 TB shape: identical to DSIR scoring — the weight table is
    ``B_BUCKETS`` rows broadcast once per executor; the corpus pays one
    narrow gram scan + map-side-combined (doc, bucket) agg + one
    broadcast-hash join. No Python UDF; the hash trick bounds the
    feature space regardless of corpus vocabulary.
    """
    from ..functions import quality_clf_weights as qw
    from .clf_train import apply_quality_weights

    return apply_quality_weights(
        docs,
        qw.W_MICRO,
        qw.BIAS_MICRO,
        ns=qw.NS,
        id_col=id_col,
        text_col=text_col,
    )


def tfidf_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction (the classic corpus-
    statistics summarizer the reference's LLM prompts approximate with
    "notable entities" asks — here computed exactly, corpus-wide).

    Tokens are lowercase letter/digit runs. Scores use the integer
    micro-unit discipline (idf_micro = round(1e6 * ln(N / df)) is an
    exact integer per token BEFORE the per-doc multiply, so results are
    partition-order independent); top_k tokens per doc are chosen by
    (score_micro DESC, token ASC) — a total order, so the cut is
    deterministic.

    Returns (id_col, token, tf, idf_micro, score_micro, rk).

    100 TB shape: one narrow token scan; tf via map-side-combined
    (doc, token) agg; df derived FROM the tf frame (no second scan —
    count over distinct (doc, token) pairs); corpus size N attached as
    a broadcast 1-row crossJoin (no driver action). The df join keys on
    token — stopword keys are hot but values are 1-row each side after
    the aggs, and AQE handles the residual skew. No Python UDF.
    """
    if top_k < 1:
        raise ValueError(f"need top_k >= 1, got {top_k}")
    tokens = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("token"),
    )
    tf = (
        tokens.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("_n_docs")
    )
    idf = df_counts.crossJoin(F.broadcast(n_docs)).select(
        "token",
        F.round(F.lit(1_000_000) * F.log(F.col("_n_docs") / F.col("df")))
        .cast("long")
        .alias("idf_micro"),
    )
    scored = tf.join(idf, "token").select(
        F.col(id_col),
        "token",
        "tf",
        "idf_micro",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
    )


def compression_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style compressibility quality signal: zlib level-6
    compressed size per document. Highly repetitive machine text
    compresses far below natural language (ratio ~0.2-0.3 vs ~0.45+),
    so low ratio_ppm is a cheap boilerplate/spam detector that needs
    no trained model.

    Returns (id_col, raw_bytes, compressed_bytes, ratio_ppm) with
    ratio_ppm = compressed * 1e6 div raw (integer; NULL-safe: null
    text rows are dropped). raw_bytes is the UTF-8 OCTET length
    (octet_length, not character length). The zlib call runs in an
    Arrow-batched pandas UDF; the oracle (oracle/precompute.py) calls
    the same CPython zlib at the same level, so results are bit-equal
    by construction.

    100 TB shape: embarrassingly parallel scan — one pandas UDF
    projection, no shuffle.
    """

    @F.pandas_udf(T.LongType())
    def _zlen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        ).astype("int64")

    out = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.octet_length(F.col(text_col)).cast("long").alias("raw_bytes"),
        _zlen(F.col(text_col)).alias("compressed_bytes"),
    )
    return out.select(
        id_col,
        "raw_bytes",
        "compressed_bytes",
        F.when(
            F.col("raw_bytes") > 0,
            F.expr("compressed_bytes * 1000000 div raw_bytes"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ratio_ppm"),
    )
