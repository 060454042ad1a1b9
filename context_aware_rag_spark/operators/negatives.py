"""Deterministic negative sampling for KG-embedding training.

Knowledge-graph embedding models (TransE, Bordes et al. 2013, and
descendants) train on contrastive pairs: each true (head, rel, tail)
triple is matched with corrupted negatives where one endpoint is
replaced by a random entity, under the FILTERED protocol — a
corruption that happens to be a true triple is discarded, never
trained as a negative. The reference materializes its graph for
downstream consumers (src/vss_ctx_rag/functions/rag/graph_rag.py
builds from the same node/edge tables); this operator is the
training-data last mile for learning embeddings over that graph.

Determinism: the "random" entity for (triple, side, j) is
md5-derived — the first 32 bits of md5 over a chr(31)-joined key —
so any cluster size, partitioning, or replay yields the same sample
set, and a SQL twin reproduces it exactly (Spark and DuckDB md5
agree byte-for-byte; the portable-hash discipline of
operators/sampling.py).

100 TB shape: the entity vocabulary gets a dense 1..n index via the
two-phase ``global_index`` (no Exchange SinglePartition); corruption
is one equi-join of k-exploded triples against that index on the
hashed slot — hash-partitioned, linear in k * |triples|; the filtered
protocol is one anti-join on the triple key. Nothing quadratic,
nothing driver-side, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .skew import global_index

SEP = "\x1f"


def _md5_u32(col):
    """First 32 bits of md5 as an unsigned integer — identical in
    DuckDB as CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    sides: tuple = ("src", "dst"),
) -> DataFrame:
    """k corruption attempts per triple per side, filtered.

    Returns (src, rel, dst, side, sample_idx, neg_entity): the
    original triple, which endpoint was corrupted, the attempt index
    j in [0, k), and the replacement entity. Attempts are DROPPED
    (not resampled) when the corruption is degenerate (equals the
    original endpoint) or is itself a true triple — the filtered
    protocol; callers wanting exactly-k can raise ``k`` and rank.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    bad = set(sides) - {"src", "dst"}
    if bad or not sides:
        raise ValueError(f"sides must be non-empty subset of src/dst: {sides}")
    tri = (
        triples.select(
            F.col(src).cast("string").alias("src"),
            F.col(rel).cast("string").alias("rel"),
            F.col(dst).cast("string").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    ents = tri.select(F.col("src").alias("e")).union(
        tri.select(F.col("dst").alias("e"))
    ).distinct()
    vocab = global_index(ents, ["e"], index_col="idx").localCheckpoint()
    n_row = vocab.agg(F.count(F.lit(1)).alias("n"))
    attempts = (
        tri.crossJoin(F.broadcast(n_row))
        .select(
            "*",
            F.explode(F.array(*[F.lit(s) for s in sides])).alias("side"),
        )
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("sample_idx"),
        )
        .withColumn(
            "neg_idx",
            F.pmod(
                _md5_u32(
                    F.concat_ws(
                        SEP, "side", "src", "rel", "dst",
                        F.col("sample_idx").cast("string"),
                    )
                ),
                F.col("n"),
            )
            + 1,
        )
    )
    sampled = (
        attempts.join(vocab, attempts.neg_idx == vocab.idx)
        .select("src", "rel", "dst", "side", "sample_idx",
                F.col("e").alias("neg_entity"))
        # degenerate: corruption equals the endpoint it replaces
        .filter(
            F.when(F.col("side") == "src", F.col("neg_entity") != F.col("src"))
            .otherwise(F.col("neg_entity") != F.col("dst"))
        )
    )
    # filtered protocol: the corrupted triple must not be true
    corrupt_key = sampled.select(
        "*",
        F.when(F.col("side") == "src", F.col("neg_entity"))
        .otherwise(F.col("src")).alias("_cs"),
        F.when(F.col("side") == "dst", F.col("neg_entity"))
        .otherwise(F.col("dst")).alias("_cd"),
    )
    true_keys = tri.select(
        F.col("src").alias("_cs"), F.col("rel").alias("rel"),
        F.col("dst").alias("_cd"),
    )
    return corrupt_key.join(
        true_keys, ["_cs", "rel", "_cd"], "left_anti"
    ).select("src", "rel", "dst", "side", "sample_idx", "neg_entity")


def mine_hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    gold: DataFrame,
    k_neg: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """BM25 hard negatives for contrastive retrieval training (the DPR
    recipe, Karpukhin et al. 2020 §4.2: the strongest lexical matches
    that are NOT labeled positives are the negatives that teach a dense
    retriever the most): per query, rank the corpus by BM25, anti-join
    the query's GOLD positives, keep the ``k_neg`` hardest.

    ``gold`` is (query_id_col, id_col) labeled-positive pairs. Returns
    (query_id, doc_id, neg_rank, score_micro) with neg_rank 1..k_neg
    over the NON-gold ranking (deterministic: score DESC, id ASC).

    100 TB shape: inherits bm25_scores' one-tokenize-scan /
    broadcast-query-side plan; the gold anti-join and the per-query
    top-k window key on query_id — bounded by the (small by
    construction) query set, exactly like bm25_topk.
    """
    from .bm25 import bm25_scores

    if k_neg < 1:
        raise ValueError(f"need k_neg >= 1, got {k_neg}")
    scored = bm25_scores(
        docs, queries, k1=k1, b=b, id_col=id_col, text_col=text_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
    )
    non_gold = scored.join(
        gold.select(
            F.col(query_id_col).alias("query_id"), F.col(id_col)
        ).dropDuplicates(),
        ["query_id", id_col],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        non_gold.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k_neg)
        .select("query_id", id_col, "neg_rank", "score_micro")
    )
