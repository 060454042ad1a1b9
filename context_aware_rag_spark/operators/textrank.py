"""TextRank extractive summarization.

The reference's summarization family is generative (LLM batch /
structured inference — mapped by operators/summarize.py's pluggable
slot); TextRank (Mihalcea & Tarau, EMNLP 2004) is the classic
EXTRACTIVE complement a corpus pipeline wants when no model is in the
loop: rank each document's sentences by PageRank over the
sentence-similarity graph and keep the top k as the summary — cheap,
deterministic, and a strong baseline reference summarizer to grade
the generative path against (texteval.rouge_n_scores closes that
loop).

Spark-first shape: sentence split and word-set extraction are narrow
JVM maps; the similarity graph is a PER-DOCUMENT self-join (fan-out
bounded by sentence count per doc — the hot-doc caveat is a long
document, the corpus' planted 50x conversations being exactly that
probe); ranking REUSES graph.pagerank on the block-diagonal
all-documents sentence graph at once — symmetric edges mean zero
dangling mass, so per-document ranks are provably independent of
other documents and one corpus-wide power iteration ranks every
document simultaneously. Integer ppm similarity, integer micro
ranks — the pure-Python oracle (oracle/precompute.textrank_py)
replays everything bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text

SEP = "\x1f"
SENT_SPLIT = r"(?<=[.!?])\s+"


def textrank_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    threshold_ppm: int = 200_000,
    iterations: int = 10,
    damping_pct: int = 85,
) -> DataFrame:
    """Top-``top_k`` sentences per document by TextRank:
    (doc_id, sent_idx, sentence, rank_micro, rk).

    Sentences split on ``(?<=[.!?])\\s+`` (0-indexed, whitespace-only
    pieces dropped); similarity = Jaccard-ppm over distinct
    normalized words (the engine-wide normalization), an edge when
    >= ``threshold_ppm``; ranks = graph.pagerank's exact integer
    recurrence over the symmetric sentence graph. Sentences with no
    similar sibling are isolated (NULL rank) and sort AFTER ranked
    ones, tie-break sent_idx ASC — a one-sentence document still
    yields its sentence.
    """
    if top_k < 1:
        raise ValueError(f"need top_k >= 1, got {top_k}")
    if not (0 <= threshold_ppm <= 1_000_000):
        raise ValueError(f"need 0 <= threshold_ppm <= 1e6: {threshold_ppm}")
    from . import graph

    sents = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), SENT_SPLIT)).alias(
                "sent_idx", "sentence"
            ),
        )
        .filter(F.length(F.trim("sentence")) > 0)
        .withColumn(
            "words",
            F.array_remove(
                F.array_distinct(
                    F.split(normalized_text(F.col("sentence")), " ")
                ),
                "",
            ),
        )
        .localCheckpoint()  # self-joined + rank re-join + output
    )
    a, b = sents.alias("a"), sents.alias("b")
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    uni = (
        F.size(F.col("a.words")) + F.size(F.col("b.words")) - inter
    )
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sent_idx") < F.col("b.sent_idx")),
        )
        .filter(uni > 0)
        .withColumn("jac_ppm", F.expr(
            "(size(array_intersect(a.words, b.words)) * 1000000) div "
            "(size(a.words) + size(b.words) "
            "- size(array_intersect(a.words, b.words)))"
        ))
        .filter(F.col("jac_ppm") >= threshold_ppm)
        .select(
            F.concat_ws(
                SEP, "a.doc_id", F.col("a.sent_idx").cast("string")
            ).alias("src"),
            F.concat_ws(
                SEP, "b.doc_id", F.col("b.sent_idx").cast("string")
            ).alias("dst"),
        )
    )
    sym = pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # sentence graphs are document-local and similarity-thresholded —
    # edge count tracks documents' sentence pairs, tiny next to the
    # corpus: elect the exact driver pagerank replica below the cap
    # (distributed fallback above it; graph.SMALL_LPA_EDGE_CAP pattern)
    ranks = graph.pagerank(
        sym, iterations=iterations, damping_pct=damping_pct,
        small_graph_cap=graph.SMALL_LPA_EDGE_CAP,
    ).select(
        F.col("node_id"), F.col("rank_micro")
    )
    scored = sents.join(
        ranks,
        F.concat_ws(SEP, "doc_id", F.col("sent_idx").cast("string"))
        == F.col("node_id"),
        "left",
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("rank_micro").desc_nulls_last(), F.col("sent_idx").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "sent_idx", "sentence", "rank_micro", "rk")
    )
