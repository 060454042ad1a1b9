"""Deterministic JVM-side document corpus synthesizer for benchmarks.

Doc k's words are vocab[xxhash64(k, position) mod V] (~60 words/doc);
every ``near_dup_every``-th doc reuses the PREVIOUS doc's seed with one
word in eight rewritten from its own id — a true planted near-dup — so
LSH paths produce real candidate load, not empty band buckets. No
Python rides in the generator: pure codegen expressions, so corpus
synthesis never contaminates what the benchmark measures.

Shared by bench.py (scaled dedup-family entries) and
bench_scaling_dedup.py (two-parallelism scaling evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthesize_docs(
    spark,
    n_docs: int,
    vocab_size: int = 500,
    words_per_doc: int = 60,
    near_dup_every: int = 7,
    n_partitions: int = 256,
) -> DataFrame:
    """(doc_id long, text string) with planted 1-in-``near_dup_every``
    near-duplicates."""
    vocab = [f"w{i}" for i in range(vocab_size)]
    varr = F.array(*[F.lit(w) for w in vocab])
    df = spark.range(0, n_docs, 1, n_partitions).select(
        F.col("id").alias("doc_id")
    )
    is_dup = (F.col("doc_id") % near_dup_every == 0) & (F.col("doc_id") > 0)
    seed = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda k: F.element_at(
            varr, (F.pmod(F.xxhash64(seed, k), vocab_size) + 1).cast("int")
        ),
    )
    words = F.when(
        is_dup,
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda w, k: F.when(
                k % 8 == 0,
                F.element_at(
                    varr,
                    (F.pmod(F.xxhash64(F.col("doc_id"), k), vocab_size) + 1).cast("int"),
                ),
            ).otherwise(w),
        ),
    ).otherwise(words)
    return df.select("doc_id", F.concat_ws(" ", words).alias("text"))
