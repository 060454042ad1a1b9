"""Vector-RAG entry point (reference functions/rag/vector_rag/
vector_retrieval_func.py:1-354): embed the question, retrieve top-k
caption documents from the vector store, format the stuffed context,
and render the citation block.

Reference compose (setup(), vector_retrieval_func.py:82-110 +
get_semantic_sim_response :117-160):

- retriever = db.as_retriever(expr "content_metadata['doc_type'] ==
  'caption'", k=top_k) — a metadata equality filter UNDER the vector
  top-k, so non-caption rows never enter the ranking;
- context = format_docs(docs) = "\\n\\n".join(page_content) in rank
  order (utils/utils.py:234-235);
- citations: template "[{file}] {chunkIdx}\\n" over citation_fields
  with a snippet of ``snippet_length`` chars (:61-75, 163-178,
  format_citations_display :180-230).

The engine twin: one broadcast 1-row query against the embedding
column (ann.cosine_topk_bruteforce — corpus scanned once, no corpus
shuffle), metadata filter pushed below the ranking, then pure-JVM
string formatting. Both stages are ANSI-SQL-expressible, so the EXTRA
queries are directly DuckDB-checked (no snapshot needed).

The DB wire clients themselves (Milvus/Elasticsearch,
tools/storage/milvus_db.py:1-547, elasticsearch_db.py:1-665) are out
of scope by the same rule as Bolt/AQL — the engine's storage is the
lakehouse table the embeddings already live in.

100 TB shape: the query side is always a broadcast literal; the corpus
scan prunes to (id, text metadata, embedding) columns and the
metadata filter reaches the scan (PushedFilters). Per-question work is
independent — a question batch becomes one crossJoin(broadcast(q))
with q small, exactly the ann module's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import cosine_topk_bruteforce


def vector_rag_search(
    docs_with_emb: DataFrame,
    query_vec: "list[float]",
    top_k: int = 5,
    snippet_length: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    file_col: str = "source",
    filter_expr=None,
) -> DataFrame:
    """Per-document retrieval rows: (rank, doc_id, file, score,
    snippet, citation).

    ``filter_expr`` is the doc_type-style metadata gate — applied
    BEFORE ranking like the reference's retriever ``expr``
    (vector_retrieval_func.py:96-101)."""
    corpus = docs_with_emb
    if filter_expr is not None:
        corpus = corpus.filter(filter_expr)
    spark = corpus.sparkSession
    q = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])], ["query_id", "embedding"]
    )
    hits = cosine_topk_bruteforce(
        corpus.select(F.col(id_col), "embedding"), q, k=top_k, id_col=id_col
    )
    meta = corpus.select(
        F.col(id_col),
        F.col(file_col).alias("file"),
        F.substring(F.col(text_col), 1, snippet_length).alias("snippet"),
    )
    return (
        hits.join(meta, id_col)
        .select(
            "rank",
            F.col(id_col),
            "file",
            F.col("cosine").alias("score"),
            "snippet",
            # citation_template "[{file}] {chunkIdx}" with the doc id
            # standing in for chunkIdx (vector_retrieval_func.py:70-72)
            F.concat(
                F.lit("["), F.col("file"), F.lit("] "),
                F.col(id_col).cast("string"),
            ).alias("citation"),
        )
    )


def vector_rag_context(
    retrieved: DataFrame,
    question: str,
    doc_texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One stuffed-context row per question: format_docs over the
    retrieval rows in rank order plus the Sources block
    (format_citations_display, vector_retrieval_func.py:180-230).

    Returns (question, context, sources, n_docs, context_length)."""
    joined = retrieved.join(
        doc_texts.select(F.col(id_col), F.col(text_col).alias("_full")),
        id_col,
    )
    return (
        joined.groupBy()
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rank", F.col("_full")))
                    ),
                    lambda s: s["_full"],
                ),
            ).alias("context"),
            F.concat(
                F.lit("\n**Sources:**\n"),
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("rank", "citation"))
                        ),
                        lambda s: s["citation"],
                    ),
                ),
            ).alias("sources"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select(
            F.lit(question).alias("question"),
            "context",
            "sources",
            "n_docs",
            F.length("context").cast("long").alias("context_length"),
        )
    )
