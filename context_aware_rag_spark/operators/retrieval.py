"""Retrieval-side operators: the EP3 graph-vector search re-expressed
as DataFrame joins (reference VECTOR_GRAPH_SEARCH_QUERY,
constants.py:54-232: vector top-k chunks ⇒ HAS_ENTITY ⇒ entity
frequency top-40 ⇒ similarity-banded 1-2-hop expansion ⇒ dedupe ⇒
context assembly).

Each hop is one equi-join of the frontier against the edges table —
the edges scan is filter-pruned to the relevant rel_types, the frontier
is broadcast when small, and hop count is a bounded Python loop (no
driver-side row data).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ann import cosine_topk_bruteforce


def topk_chunks_for_query(
    chunks_with_emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
) -> DataFrame:
    """Vector retriever: top-k chunks by cosine for one query vector."""
    spark = chunks_with_emb.sparkSession
    q = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])], ["query_id", "embedding"]
    )
    hits = cosine_topk_bruteforce(
        chunks_with_emb, q, k=k, id_col="chunk_id", vec_col="embedding"
    )
    return hits.select("chunk_id", F.col("cosine").alias("chunk_score"))


def entities_for_chunks(
    edges: DataFrame, chunk_hits: DataFrame, top_entities: int = 40
) -> DataFrame:
    """HAS_ENTITY join + A4 frequency ranking (count DESC LIMIT 40)."""
    has_ent = edges.filter(F.col("rel_type") == "HAS_ENTITY").select(
        F.col("src").alias("chunk_id"), F.col("dst").alias("node_id")
    )
    return (
        has_ent.join(F.broadcast(chunk_hits), "chunk_id")
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("num_chunks"))
        .orderBy(F.desc("num_chunks"), F.asc("node_id"))
        .limit(top_entities)
    )


def expand_hops(
    edges: DataFrame,
    seed_nodes: DataFrame,
    hops: int = 2,
    structural: tuple = ("PART_OF", "FIRST_CHUNK", "NEXT_CHUNK", "HAS_ENTITY", "SIMILAR"),
    nodes: DataFrame | None = None,
    query_vec: list[float] | None = None,
    band: tuple = (0.3, 0.9),
    embedding_dim: int = 64,
    per_seed: bool = False,
) -> DataFrame:
    """J8 — bounded-hop expansion over extracted predicate edges.

    Returns (src, dst, rel_type, hop). Each iteration joins the frontier
    (small, broadcast) to the pruned edge scan; visited accumulates via
    union + dropDuplicates. Hop count is bounded (reference uses 1-2).

    Similarity-band gating (reference VECTOR_GRAPH_SEARCH_QUERY,
    constants.py:54-232): when ``nodes`` (node_id, name) and
    ``query_vec`` are given, an expansion target is kept only if the
    cosine between its entity embedding and the query lies in ``band``
    [0.3, 0.9) — excluding both near-duplicates of the query (already
    retrieved) and unrelated entities.
    """
    pred_edges = edges.filter(~F.col("rel_type").isin(*structural)).select(
        "src", "dst", "rel_type"
    ).localCheckpoint()

    if nodes is not None and query_vec is not None:
        from .similarity import with_entity_embeddings

        q = [float(x) for x in query_vec]
        qn = float(sum(x * x for x in q)) ** 0.5 or 1.0
        with_emb = with_entity_embeddings(
            nodes.select("node_id", "name").dropDuplicates(["node_id"]),
            dim=embedding_dim,
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(x / qn) for x in q]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        in_band = with_emb.select(
            "node_id", dot.alias("_qcos")
        ).filter(
            (F.col("_qcos") >= band[0]) & (F.col("_qcos") < band[1])
        ).select("node_id").localCheckpoint()
        pred_edges = (
            pred_edges.join(
                in_band.withColumnRenamed("node_id", "dst"), "dst", "left_semi"
            ).localCheckpoint()
        )
    if hops < 1:
        empty = edges.sparkSession.createDataFrame(
            [], "seed string, src string, dst string, rel_type string, hop int"
        )
        return empty if per_seed else empty.drop("seed")
    if per_seed:
        # carry a "seed" attribution column so callers can group the
        # expansion per retrieval document (context assembly); fan-out
        # multiplies by |seeds| but retrieval frontiers are query-bounded
        frontier = seed_nodes.select("node_id", "seed").distinct()
    else:
        frontier = seed_nodes.select(F.col("node_id")).distinct().withColumn(
            "seed", F.lit("_")
        )
    out: Optional[DataFrame] = None
    for hop in range(1, hops + 1):
        # no forced broadcast: hop-1 frontier is <= top_entities rows but
        # later frontiers scale with graph fan-out — AQE picks broadcast
        # vs shuffle from the frontier's measured size at runtime
        step = (
            pred_edges.join(frontier, pred_edges.src == frontier.node_id)
            .select("seed", "src", "dst", "rel_type", F.lit(hop).alias("hop"))
        )
        out = step if out is None else out.unionByName(step)
        out = out.dropDuplicates(["seed", "src", "dst", "rel_type"]).localCheckpoint()
        frontier = out.select(F.col("dst").alias("node_id"), "seed").distinct()
    return out if per_seed else out.drop("seed")


def assemble_context(
    chunks_with_emb: DataFrame,
    edges: DataFrame,
    nodes: DataFrame,
    query_vec: list[float],
    k: int = 5,
    top_entities: int = 40,
    hops: int = 2,
    band: tuple = (0.3, 0.9),
) -> DataFrame:
    """EP3 context assembly — one row per retrieved document with the
    reference's assembled text (VECTOR_GRAPH_SEARCH_QUERY_SUFFIX,
    constants.py:98-168):

        Text Content:\\n<chunk texts joined by \\n----\\n>
        \\n----\\nEntities:\\n<sorted "type:name" lines>
        \\n----\\nRelationships:\\n<sorted "type:name REL type:name" lines>

    plus score = avg chunk score and metadata counts. Chunk texts are
    ordered by (score DESC, chunk_id) — the vector index's return order,
    made deterministic; entity/relationship lines are sorted
    (apoc.coll.sort parity). Entity selection and hop expansion are
    attributed per document (the reference's per-document CALL block).

    ``chunks_with_emb`` needs (chunk_id, conv_id, text, embedding);
    ``nodes`` (node_id, name, type).
    """
    hits = topk_chunks_for_query(chunks_with_emb, query_vec, k=k).localCheckpoint()
    cmeta = chunks_with_emb.select("chunk_id", "conv_id", "text")
    hit_chunks = cmeta.join(hits, "chunk_id").localCheckpoint()

    # per-document chunk text block + avg score
    doc_text = (
        hit_chunks.groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n----\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("chunk_score")).alias("neg"),
                                F.col("chunk_id"),
                                F.col("text"),
                            )
                        )
                    ),
                    lambda s: s["text"],
                ),
            ).alias("texts_block"),
            F.avg("chunk_score").alias("score"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )

    # per-document top entities (A4 per doc)
    has_ent = edges.filter(F.col("rel_type") == "HAS_ENTITY").select(
        F.col("src").alias("chunk_id"), F.col("dst").alias("node_id")
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("num_chunks"), F.asc("node_id")
    )
    doc_ents = (
        has_ent.join(hit_chunks.select("chunk_id", "conv_id"), "chunk_id")
        .groupBy("conv_id", "node_id")
        .agg(F.count(F.lit(1)).alias("num_chunks"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_entities)
        .select(F.col("conv_id").alias("seed"), "node_id")
        .localCheckpoint()
    )

    # band=None disables the similarity gate (expansion follows all
    # predicate edges — used by hand-computable fixtures)
    expanded = expand_hops(
        edges, doc_ents, hops=hops,
        nodes=None if band is None else nodes,
        query_vec=None if band is None else query_vec,
        band=band or (0.3, 0.9), per_seed=True,
    )

    names = nodes.select(
        "node_id",
        F.concat_ws(":", F.col("type"), F.col("name")).alias("label"),
    )
    rels = (
        expanded.join(names.withColumnRenamed("node_id", "src"), "src")
        .withColumnRenamed("label", "src_label")
        .join(
            names.select(F.col("node_id").alias("dst"),
                         F.col("label").alias("dst_label")),
            "dst",
        )
    )
    doc_rels = rels.groupBy(F.col("seed").alias("conv_id")).agg(
        F.concat_ws(
            "\n",
            F.array_sort(
                F.array_distinct(
                    F.collect_list(
                        F.concat_ws(" ", "src_label", "rel_type", "dst_label")
                    )
                )
            ),
        ).alias("rels_block"),
        F.size(
            F.array_distinct(
                F.collect_list(F.struct("src", "dst", "rel_type"))
            )
        ).cast("long").alias("n_rels"),
    )
    # entity lines: the seed entities plus every expanded endpoint
    ent_ids = (
        doc_ents.select(F.col("seed").alias("conv_id"), "node_id")
        .unionByName(
            expanded.select(F.col("seed").alias("conv_id"),
                            F.col("src").alias("node_id"))
        )
        .unionByName(
            expanded.select(F.col("seed").alias("conv_id"),
                            F.col("dst").alias("node_id"))
        )
        .distinct()
    )
    doc_nodes = (
        ent_ids.join(names, "node_id")
        .groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n", F.array_sort(F.array_distinct(F.collect_list("label")))
            ).alias("ents_block"),
            F.countDistinct("node_id").alias("n_entities"),
        )
    )

    return (
        doc_text.join(doc_nodes, "conv_id", "left")
        .join(doc_rels, "conv_id", "left")
        .select(
            F.col("conv_id").alias("source"),
            F.concat(
                F.lit("Text Content:\n"),
                F.col("texts_block"),
                F.lit("\n----\nEntities:\n"),
                F.coalesce(F.col("ents_block"), F.lit("")),
                F.lit("\n----\nRelationships:\n"),
                F.coalesce(F.col("rels_block"), F.lit("")),
            ).alias("text"),
            F.round("score", 6).alias("score"),
            F.col("n_chunks"),
            F.coalesce(F.col("n_entities"), F.lit(0)).cast("long").alias("n_entities"),
            F.coalesce(F.col("n_rels"), F.lit(0)).cast("long").alias("n_rels"),
        )
        .withColumn("length", F.length("text").cast("long"))
    )


def compress_context(
    context: DataFrame,
    query_vec: list[float],
    similarity_threshold: float = 0.10,
    chunk_size: int = 500,
    chunk_overlap: int = 10,
    embedding_dim: int = 64,
    text_col: str = "text",
    key_col: str = "source",
) -> DataFrame:
    """Contextual compression (reference create_document_retriever,
    neo4j_db.py:1274-1299): re-split each assembled context with the
    recursive splitter (500/10, separators ["Text:", "\\n\\n", "\\n",
    "\\n-"]), embedding-filter the pieces against the query
    (EmbeddingsFilter, CHAT_EMBEDDING_FILTER_SCORE_THRESHOLD = 0.10),
    and reassemble survivors in original order.

    Splitting runs in an Arrow-batched pandas UDF (the splitter is
    Python); scoring is a JVM dot product against the normalized query
    literal; reassembly is an ordered collect per document.
    """
    from ..functions.splitter import split_text
    from .similarity import with_text_embeddings

    seps = ["Text:", "\n\n", "\n", "\n-"]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def split_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in texts:
            yield s.fillna("").map(
                lambda t: split_text(
                    t, chunk_size=chunk_size, chunk_overlap=chunk_overlap,
                    separators=seps,
                )
            )

    pieces = (
        context.withColumn("_pieces", split_udf(F.col(text_col)))
        .select(
            key_col,
            F.posexplode("_pieces").alias("piece_idx", "piece"),
        )
        .localCheckpoint()  # stage boundary: splitter UDF runs once
    )
    scored = with_text_embeddings(pieces, text_col="piece", dim=embedding_dim)
    q = [float(x) for x in query_vec]
    qn = float(sum(x * x for x in q)) ** 0.5 or 1.0
    cos = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(x / qn) for x in q]),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    kept = scored.withColumn("_sim", cos).filter(
        F.col("_sim") >= similarity_threshold
    )
    return (
        kept.groupBy(key_col)
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("piece_idx", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("compressed_text"),
            F.count(F.lit(1)).cast("long").alias("n_pieces_kept"),
            F.round(F.max("_sim"), 6).alias("best_piece_sim"),
        )
        .withColumn(
            "compressed_length", F.length("compressed_text").cast("long")
        )
    )


def graph_vector_search(
    chunks_with_emb: DataFrame,
    edges: DataFrame,
    query_vec: list[float],
    k: int = 5,
    top_entities: int = 40,
    hops: int = 2,
    nodes: DataFrame | None = None,
    band: tuple = (0.3, 0.9),
) -> DataFrame:
    """EP3 end-to-end: returns the expanded context edge set with
    provenance columns (hop, seed entity frequency). Pass ``nodes``
    (node_id, name) to enable the reference's similarity-band gating."""
    hits = topk_chunks_for_query(chunks_with_emb, query_vec, k=k).localCheckpoint()
    ents = entities_for_chunks(edges, hits, top_entities=top_entities).localCheckpoint()
    expanded = expand_hops(
        edges, ents, hops=hops, nodes=nodes, query_vec=query_vec, band=band
    )
    return expanded.join(
        F.broadcast(ents.select("node_id", "num_chunks")),
        expanded.src == F.col("node_id"),
        "left",
    ).drop("node_id")
