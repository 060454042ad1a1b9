#!/usr/bin/env python
"""Generate the precomputed oracle parquet tables under oracle_data/.

Pure Python — no Spark session. Everything is deterministic (seeded
corpus synthesis, fixed-seed hashing), so the outputs are stable and
committed; the driver's DuckDB oracle reads them via read_parquet().

Usage: python tools/gen_oracle_data.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 (the driver's correctness scale).
"""

from __future__ import annotations

import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from context_aware_rag_spark.oracle import precompute  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCHEMAS = {
    "kg_triples": pa.schema(
        [("conv_id", pa.string()), ("subj_name", pa.string()),
         ("subj_type", pa.string()), ("pred", pa.string()),
         ("obj_name", pa.string()), ("obj_type", pa.string())]
    ),
    "kg_chunk_stats": pa.schema(
        [("conv_id", pa.string()), ("n_chunks", pa.int64()),
         ("max_position", pa.int32()), ("total_chars", pa.int64()),
         ("end_offset", pa.int64())]
    ),
    "kg_nodes_canonical": pa.schema(
        [("node_id", pa.string()), ("name", pa.string()),
         ("type", pa.string()), ("mention_chunks", pa.int64())]
    ),
    "kg_canonical_incremental": pa.schema(
        [("node_id", pa.string()), ("canon_id", pa.string())]
    ),
    "kg_cluster_purity": pa.schema(
        [("canon_id", pa.string()), ("n_members", pa.int64()),
         ("n_names", pa.int64()), ("n_types", pa.int64()),
         ("majority_type", pa.string()), ("majority_n", pa.int64()),
         ("purity_ppm", pa.int64())]
    ),
    "kg_nodes_with_tools": pa.schema(
        [("node_id", pa.string()), ("name", pa.string()),
         ("type", pa.string()), ("tools", pa.string()),
         ("n_tools", pa.int32())]
    ),
    "kg_similar_chunk_edges": pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("score", pa.float64())]
    ),
    "kg_fact_assertions": pa.schema(
        [("subj_name", pa.string()), ("pred", pa.string()),
         ("obj_name", pa.string()), ("ts_s", pa.int64())]
    ),
    "a10_tree_summarize": pa.schema(
        [("conv_id", pa.string()), ("summary", pa.string()),
         ("n_levels", pa.int32())]
    ),
    "s6_batch_summaries": pa.schema(
        [("conv_id", pa.string()), ("batch_id", pa.int64()),
         ("summary", pa.string()), ("n_turns", pa.int64()),
         ("n_turn_idxs", pa.int32())]
    ),
    "minhash_near_dups": pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("est_jaccard", pa.float64())]
    ),
    "simhash_near_dups": pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int32())]
    ),
    "c10_json_repair": pa.schema(
        [("k", pa.int32()), ("n", pa.int64()), ("n_unparsed", pa.int64())]
    ),
    "token_count_bpe": pa.schema(
        [("doc_id", pa.int64()), ("bpe_tokens", pa.int64())]
    ),
    "ep3_graph_vector_search": pa.schema(
        [("source", pa.string()), ("text", pa.string()),
         ("score", pa.float64()), ("n_chunks", pa.int64()),
         ("n_entities", pa.int64()), ("n_rels", pa.int64()),
         ("length", pa.int64())]
    ),
    "ep3_compressed_context": pa.schema(
        [("source", pa.string()), ("compressed_text", pa.string()),
         ("n_pieces_kept", pa.int64()), ("best_piece_sim", pa.float64()),
         ("compressed_length", pa.int64())]
    ),
    "ep3_planner_trace": pa.schema(
        [("iteration", pa.int32()), ("step", pa.int32()),
         ("tool", pa.string()), ("arg", pa.string()),
         ("rank", pa.int32()), ("result_id", pa.string()),
         ("score", pa.float64()), ("detail", pa.string())]
    ),
    "kg_community_reports": pa.schema(
        [("community", pa.string()), ("n_members", pa.int64()),
         ("n_listed", pa.int64()), ("summary", pa.string())]
    ),
    "ann_ivf_topk": pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()),
         ("cosine", pa.float64()), ("rank", pa.int32())]
    ),
    "semantic_dedup": pa.schema(
        [("vec_id", pa.int64()), ("cluster_id", pa.int32()),
         ("family_id", pa.int64()), ("keep", pa.bool_())]
    ),
    "decontaminate_bloom": pa.schema(
        [("doc_id", pa.int64()), ("n_flagged_grams", pa.int64())]
    ),
    "training_data_pipeline": pa.schema(
        [("example_id", pa.int64()), ("n_tokens", pa.int64()),
         ("tokens_csv", pa.string())]
    ),
    "tokenize_and_pack": pa.schema(
        [("example_id", pa.int64()), ("n_tokens", pa.int64()),
         ("tokens_csv", pa.string())]
    ),
    "kg_graph_pagerank": pa.schema(
        [("node_id", pa.string()), ("rank_micro", pa.int64()),
         ("out_deg", pa.int64()), ("in_deg", pa.int64())]
    ),
    "kg_graph_ppr": pa.schema(
        [("node_id", pa.string()), ("ppr_micro", pa.int64())]
    ),
    "graph_kcore": pa.schema(
        [("node_id", pa.int64()), ("core_degree", pa.int64())]
    ),
    "graph_betweenness": pa.schema(
        [("node_id", pa.int64()), ("betweenness_micro", pa.int64()),
         ("n_pivots_used", pa.int32())]
    ),
    "graph_msf": pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("weight", pa.int64())]
    ),
    "doc_textrank": pa.schema(
        [("doc_id", pa.string()), ("sent_idx", pa.int32()),
         ("sentence", pa.string()), ("rank_micro", pa.int64()),
         ("rk", pa.int32())]
    ),
    "graph_pagerank_weighted": pa.schema(
        [("node_id", pa.string()), ("rank_micro", pa.int64())]
    ),
    "graph_coloring": pa.schema(
        [("node_id", pa.string()), ("color", pa.int32())]
    ),
    "graph_densest": pa.schema(
        [("node_id", pa.string()), ("density_ppm", pa.int64()),
         ("n_nodes", pa.int64()), ("n_edges", pa.int64()),
         ("found_round", pa.int32())]
    ),
    "graph_hits": pa.schema(
        [("node_id", pa.string()), ("hub_micro", pa.int64()),
         ("auth_micro", pa.int64())]
    ),
    "graph_katz": pa.schema(
        [("node_id", pa.string()), ("katz_micro", pa.int64())]
    ),
    "graph_orbits": pa.schema(
        [("node_id", pa.string())]
        + [(f"o{i}", pa.int64()) for i in range(15)]
    ),
    "kg_sgns_embeddings": pa.schema(
        [("kind", pa.string()), ("node_id", pa.string()),
         ("d", pa.int32()), ("v_micro", pa.int64())]
    ),
    "tool_chains": pa.schema(
        [("gram", pa.string()), ("n_groups", pa.int64()),
         ("n_occurrences", pa.int64())]
    ),
    "sft_pairs": pa.schema(
        [("conv_id", pa.string()), ("pair_id", pa.int32()),
         ("prev_role", pa.string()), ("prompt", pa.string()),
         ("n_context_turns", pa.int32()), ("response", pa.string()),
         ("n_response_turns", pa.int32())]
    ),
    "topic_chunks": pa.schema(
        [("conv_id", pa.string()), ("seg_idx", pa.int32()),
         ("chunk_id", pa.string()), ("chunk_text", pa.string()),
         ("n_turns", pa.int32()), ("first_turn", pa.int32()),
         ("last_turn", pa.int32())]
    ),
    "texttiling_gaps": pa.schema(
        [("conv_id", pa.string()), ("gap_after", pa.int32()),
         ("score_ppm", pa.int64()), ("depth_ppm", pa.int64()),
         ("is_boundary", pa.bool_())]
    ),
    "conv_metrics": pa.schema(
        [("conv_id", pa.string()), ("n_turns", pa.int64()),
         ("n_user", pa.int64()), ("n_assistant", pa.int64()),
         ("n_tool_role", pa.int64()), ("n_system", pa.int64()),
         ("n_tool_calls", pa.int64()), ("n_distinct_tools", pa.int32()),
         ("span_us", pa.int64()), ("max_gap_us", pa.int64()),
         ("n_responses", pa.int64()), ("mean_response_us", pa.int64())]
    ),
    "graph_ktruss": pa.schema(
        [("src", pa.string()), ("dst", pa.string()),
         ("support", pa.int64())]
    ),
    "graph_mis": pa.schema(
        [("node_id", pa.string()), ("mis_round", pa.int32())]
    ),
    "graph_node2vec": pa.schema(
        [("start", pa.string()), ("walk_id", pa.int32()),
         ("pos", pa.int32()), ("node", pa.string())]
    ),
    "graph_lpa": pa.schema(
        [("node_id", pa.int64()), ("label", pa.int64()),
         ("n_iter", pa.int64())]
    ),
    "kg_community_members": pa.schema(
        [("node_id", pa.string()), ("community", pa.string())]
    ),
    "kg_community_hierarchy": pa.schema(
        [("node_id", pa.int64()), ("community", pa.int64()),
         ("parent", pa.int64())]
    ),
    "compression_ratio": pa.schema(
        [("doc_id", pa.int64()), ("raw_bytes", pa.int64()),
         ("compressed_bytes", pa.int64()), ("ratio_ppm", pa.int64())]
    ),
    "quality_classifier": pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()),
         ("dot_micro", pa.int64()), ("logit", pa.float64()),
         ("prob", pa.float64()), ("keep", pa.bool_())]
    ),
    "clf_train_weights": pa.schema(
        [("bucket", pa.int64()), ("w_micro", pa.int64())]
    ),
    "gazetteer_mentions": pa.schema(
        [("doc_id", pa.int64()), ("start_tok", pa.int32()),
         ("end_tok", pa.int32()), ("surface", pa.string()),
         ("entity_id", pa.string())]
    ),
    "kg_transe_embeddings": pa.schema(
        [("kind", pa.string()), ("node_id", pa.string()),
         ("d", pa.int32()), ("v_micro", pa.int64())]
    ),
    "kg_transe_ranks": pa.schema(
        [("side", pa.string()), ("src", pa.string()),
         ("rel", pa.string()), ("dst", pa.string()),
         ("true_energy", pa.int64()), ("rank_pos", pa.int32()),
         ("rr_ppm", pa.int64())]
    ),
    "dsir_select": pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()),
         ("logw_micro", pa.int64()), ("gumbel_micro", pa.int64()),
         ("key_micro", pa.int64()), ("rank", pa.int32())]
    ),
    "ann_ivfpq_topk": pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()),
         ("approx_score", pa.float64()), ("rank", pa.int32())]
    ),
    "ann_mmr_topk": pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()),
         ("rel", pa.float64()), ("mmr_micro", pa.int64()),
         ("sel_rank", pa.int32())]
    ),
    "embedding_pca": pa.schema(
        [("vec_id", pa.int64()), ("pc", pa.int32()),
         ("value_micro", pa.int64())]
    ),
}


def write(out_dir: str, name: str, rows: list[tuple]) -> None:
    schema = SCHEMAS[name]
    cols = {
        f.name: [r[i] for r in rows] for i, f in enumerate(schema)
    }
    table = pa.table(cols, schema=schema)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {len(rows)} rows")


def n_convs_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(6, int(1200 * sf))


def main(sf_dirs: list[str]) -> None:
    import duckdb

    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        out_dir = os.path.join(REPO, "oracle_data", tag)
        print(f"== {tag} -> {out_dir}")

        con = duckdb.connect()
        docs = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
            " ORDER BY doc_id"
        ).fetchall()
        events = con.execute(
            f"SELECT event_id, props FROM read_parquet('{sf_dir}/events.parquet')"
            " ORDER BY event_id"
        ).fetchall()

        write(out_dir, "minhash_near_dups",
              precompute.minhash_pairs_py(docs, threshold=0.8))
        write(out_dir, "simhash_near_dups",
              precompute.simhash_pairs_py(docs, max_hamming=3))
        write(out_dir, "c10_json_repair", precompute.c10_repair_table(events))

        vecs = con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
            " ORDER BY vec_id"
        ).fetchall()
        write(out_dir, "ann_ivf_topk", precompute.ivf_topk_py(vecs))
        write(out_dir, "ann_ivfpq_topk", precompute.ivfpq_topk_py(vecs))
        write(out_dir, "semantic_dedup",
              precompute.semantic_dedup_py(vecs, threshold=0.4))
        write(out_dir, "ann_mmr_topk", precompute.mmr_topk_py(vecs))
        write(out_dir, "embedding_pca",
              precompute.pca_project_py(vecs, dim=64, k=8))

        # benchmark planted exactly like the decontaminate query: words
        # 5-12 (1-based) of every 10th doc with >= 12 normalized words
        bench_texts = []
        for doc_id, text in docs:
            if doc_id % 10 == 0:
                words = precompute.normalize_py(text).split(" ")
                if len(words) >= 12:
                    bench_texts.append(" ".join(words[4:12]))
        write(out_dir, "decontaminate_bloom",
              precompute.decontaminate_bloom_py(docs, bench_texts, n=8))

        # target corpus planted exactly like the dsir_select query:
        # every 7th doc's full text is the "high-quality" target set
        target_texts = [text for doc_id, text in docs if doc_id % 7 == 0]
        write(out_dir, "dsir_select",
              precompute.dsir_select_py(docs, target_texts, k=50))
        write(out_dir, "quality_classifier",
              precompute.quality_classifier_py(docs))
        # distributed trainer parity fixture: parity labels (doc_id % 2)
        # exercise the full integer-micro training recurrence without
        # needing a semantic negative corpus in SQL
        write(out_dir, "clf_train_weights",
              precompute.train_quality_clf_py(
                  [(doc_id, text, float(doc_id % 2))
                   for doc_id, text in docs],
                  n_buckets=256, epochs=6))
        write(out_dir, "gazetteer_mentions",
              precompute.gazetteer_tag_py(docs))
        write(out_dir, "compression_ratio",
              precompute.compression_ratio_py(docs))
        write(out_dir, "doc_textrank",
              precompute.textrank_py(docs, top_k=3,
                                     threshold_ppm=150_000))
        write(out_dir, "tokenize_and_pack",
              precompute.tokenize_and_pack_py(docs, max_tokens=512))
        write(out_dir, "training_data_pipeline",
              precompute.training_data_pipeline_py(docs))

        from context_aware_rag_spark.functions.bpe import bpe_token_counts

        write(out_dir, "token_count_bpe",
              [(doc_id, n) for doc_id, n in
               zip([d[0] for d in docs],
                   bpe_token_counts([d[1] for d in docs]))])

        write(out_dir, "kg_graph_pagerank",
              precompute.kg_graph_pagerank_table(n_convs_for(sf_dir)))
        write(out_dir, "kg_graph_ppr",
              precompute.kg_graph_ppr_table(n_convs_for(sf_dir)))

        # thresholded supplier co-occurrence graph (same SQL shape as
        # the kg_graph_triangles / kg_link_prediction twins but at the
        # sparser >= 28 gate so the core is PROPER: 63 of 100 nodes
        # survive a real multi-round cascade), peeled by the
        # pure-Python fixpoint
        supp_pairs = con.execute(
            f"""
            SELECT a, b FROM (
              SELECT x.l_suppkey AS a, y.l_suppkey AS b,
                     count(DISTINCT x.l_orderkey) AS n_orders
              FROM read_parquet('{sf_dir}/lineitem.parquet') x
              JOIN read_parquet('{sf_dir}/lineitem.parquet') y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_suppkey < y.l_suppkey
              GROUP BY 1, 2
            ) WHERE n_orders >= 28
            """
        ).fetchall()
        write(out_dir, "graph_kcore", precompute.k_core_py(supp_pairs, k=12))

        # pivot-sampled Brandes betweenness over the same >= 28 graph:
        # the replica shares the operator's floored-micro dependency
        # arithmetic, so equality is bit-exact, not approximate
        write(
            out_dir,
            "graph_betweenness",
            precompute.betweenness_py(supp_pairs, n_pivots=32, max_depth=10),
        )

        # weighted co-occurrence backbone: the >= 15-gated supplier
        # graph with inverse-strength costs (stronger co-occurrence =
        # cheaper edge), spanned by pure-Python Kruskal — the
        # algorithm-independent twin of the Boruvka operator
        msf_edges = con.execute(
            f"""
            SELECT a, b, 1000000 // n_orders AS w FROM (
              SELECT x.l_suppkey AS a, y.l_suppkey AS b,
                     count(DISTINCT x.l_orderkey) AS n_orders
              FROM read_parquet('{sf_dir}/lineitem.parquet') x
              JOIN read_parquet('{sf_dir}/lineitem.parquet') y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_suppkey < y.l_suppkey
              GROUP BY 1, 2
            ) WHERE n_orders >= 15
            """
        ).fetchall()
        write(out_dir, "graph_msf", precompute.msf_py(msf_edges))

        # weighted PageRank over the same graph with n_orders pull
        # (weight = 1e6 div w of the MSF costs, i.e. the raw
        # co-occurrence strength), both directions
        wpr_edges = [
            (str(a), str(b), 1_000_000 // w) for a, b, w in msf_edges
        ]
        wpr_edges += [(b, a, w) for a, b, w in wpr_edges]
        wpr = precompute.pagerank_weighted_py(wpr_edges)
        write(out_dir, "graph_pagerank_weighted", sorted(wpr.items()))

        # node2vec corpus over the heterogeneous c->o->s->n KG (the
        # kg_random_walks edge list), biased toward in-neighborhood
        # (BFS-ish): ret 2 / in 5 / out 1
        n2v_edges = con.execute(
            f"""
            SELECT 'c:' || o_custkey, 'o:' || o_orderkey
            FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE o_orderkey % 100 = 0
            UNION ALL
            SELECT 'o:' || l_orderkey, 's:' || l_suppkey
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            WHERE l_orderkey % 100 = 0
            UNION ALL
            SELECT 's:' || s_suppkey, 'n:' || s_nationkey
            FROM read_parquet('{sf_dir}/supplier.parquet')
            """
        ).fetchall()
        write(out_dir, "graph_node2vec",
              precompute.node2vec_py(
                  n2v_edges, walk_length=4, walks_per_node=2,
                  ret_w=2, in_w=5, out_w=1))

        # DeepWalk end-to-end: uniform walks (node2vec_py with unit
        # weights IS random_walks — equality pytest-proven) ->
        # skip-gram pairs -> SGNS training, flattened to
        # (kind, node_id, d, v_micro) rows
        dw_corpus = precompute.node2vec_py(
            n2v_edges, walk_length=4, walks_per_node=2,
            ret_w=1, in_w=1, out_w=1)
        dw_pairs = precompute.skipgram_pairs_py(dw_corpus, window=2)
        sgns_emb = precompute.sgns_py(
            dw_pairs, dim=8, epochs=2, k_neg=2)
        write(out_dir, "kg_sgns_embeddings",
              [(kind, node, d, v)
               for (kind, node, vec) in sgns_emb
               for d, v in enumerate(vec)])

        # Luby MIS anchors over the same heterogeneous layered KG —
        # sparse and multi-typed, so the MIS is large and the
        # simultaneous sweep needs several real rounds (the dense
        # co-occurrence graph collapses to ~2 anchors in 1 round,
        # structurally boring)
        write(out_dir, "graph_mis", precompute.mis_py(n2v_edges))

        # densest core of the same layered KG (real peeling: the
        # best snapshot lands at round 1)
        write(out_dir, "graph_densest", precompute.densest_py(n2v_edges))

        # 10-truss of the >= 25-gated co-occurrence graph: 1271 of
        # 1782 edges survive a real peeling cascade
        ktruss_pairs = con.execute(
            f"""
            SELECT a, b FROM (
              SELECT x.l_suppkey AS a, y.l_suppkey AS b,
                     count(DISTINCT x.l_orderkey) AS n_orders
              FROM read_parquet('{sf_dir}/lineitem.parquet') x
              JOIN read_parquet('{sf_dir}/lineitem.parquet') y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_suppkey < y.l_suppkey
              GROUP BY 1, 2
            ) WHERE n_orders >= 25
            """
        ).fetchall()
        write(out_dir, "graph_ktruss",
              precompute.k_truss_py(ktruss_pairs, k=10))

        # conflict-free update waves over the dense co-occurrence
        # graph (>= 25 gate: a near-clique needs MANY classes — a
        # real iterated-MIS exercise)
        write(out_dir, "graph_coloring",
              precompute.coloring_py(ktruss_pairs))


        # TransE corpus: two relations over the supplier entity space —
        # 'cooccurs' (undirected co-occurrence at the >= 32 gate, both
        # directions emitted) and 'precedes' (the directed succession
        # graph at the >= 10 gate; lead() ordered by the unique
        # (linenumber, partkey, suppkey) triple)
        transe_rows = con.execute(
            f"""
            WITH co AS (
              SELECT x.l_suppkey AS a, y.l_suppkey AS b
              FROM read_parquet('{sf_dir}/lineitem.parquet') x
              JOIN read_parquet('{sf_dir}/lineitem.parquet') y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_suppkey < y.l_suppkey
              GROUP BY 1, 2
              HAVING count(DISTINCT x.l_orderkey) >= 32
            ),
            succ AS (
              SELECT l_suppkey,
                     lead(l_suppkey) OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_suppkey
                     ) AS nxt
              FROM read_parquet('{sf_dir}/lineitem.parquet')
            ),
            prec AS (
              SELECT l_suppkey AS a, nxt AS b FROM succ
              WHERE nxt IS NOT NULL AND nxt <> l_suppkey
              GROUP BY 1, 2 HAVING count(*) >= 10
            )
            SELECT CAST(a AS VARCHAR) AS h, 'cooccurs' AS r,
                   CAST(b AS VARCHAR) AS t FROM co
            UNION ALL
            SELECT CAST(b AS VARCHAR), 'cooccurs', CAST(a AS VARCHAR) FROM co
            UNION ALL
            SELECT CAST(a AS VARCHAR), 'precedes', CAST(b AS VARCHAR) FROM prec
            """
        ).fetchall()
        transe_triples = [tuple(r) for r in transe_rows]
        transe_emb = precompute.transe_py(transe_triples, dim=8, epochs=3)
        write(out_dir, "kg_transe_embeddings", transe_emb)

        # HITS over the directed 'precedes' succession slice of the
        # same KG (hubs = suppliers that lead sequences, authorities =
        # suppliers that follow them)
        hits_edges = [
            (h, t) for (h, r, t) in transe_triples if r == "precedes"
        ]
        write(out_dir, "graph_hits",
              precompute.hits_py(hits_edges, iterations=5))

        # Katz over the same directed succession slice: the
        # attenuated-walk salience lens next to pagerank/HITS
        write(out_dir, "graph_katz",
              precompute.katz_py(hits_edges, iterations=8,
                                 alpha_ppm=100_000))

        # filtered link-prediction ranking over the trained table: test
        # probes = the deterministic md5 % 5 == 0 slice of the training
        # triples (the Spark query replicates the selection with the
        # same first-32-bits-of-md5 over the \x1f-joined key)
        transe_test = [
            t for t in sorted(set(transe_triples))
            if precompute._md5_u32_py("\x1f".join(t)) % 5 == 0
        ]
        write(out_dir, "kg_transe_ranks",
              precompute.rank_metrics_py(
                  transe_emb, transe_test, transe_triples))

        # sparser >= 35 gate for LPA: 63 nodes / 56 edges splits into
        # 26 communities and exercises the max_iter bound (synchronous
        # LPA 2-cycles on bipartite fragments; >= 28 collapses to one
        # giant community in 4 rounds — structurally boring)
        lpa_pairs = con.execute(
            f"""
            SELECT a, b FROM (
              SELECT x.l_suppkey AS a, y.l_suppkey AS b,
                     count(DISTINCT x.l_orderkey) AS n_orders
              FROM read_parquet('{sf_dir}/lineitem.parquet') x
              JOIN read_parquet('{sf_dir}/lineitem.parquet') y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_suppkey < y.l_suppkey
              GROUP BY 1, 2
            ) WHERE n_orders >= 35
            """
        ).fetchall()
        write(out_dir, "graph_lpa", precompute.lpa_py(lpa_pairs, max_iter=10))
        write(out_dir, "kg_community_hierarchy",
              precompute.community_hierarchy_table(lpa_pairs))

        write(out_dir, "conv_metrics",
              precompute.conv_metrics_table(n_convs_for(sf_dir)))
        write(out_dir, "tool_chains",
              precompute.tool_chains_table(
                  n_convs_for(sf_dir), min_groups=1))
        write(out_dir, "texttiling_gaps",
              precompute.texttiling_table(n_convs_for(sf_dir)))
        write(out_dir, "sft_pairs",
              precompute.sft_pairs_table(n_convs_for(sf_dir)))
        write(out_dir, "topic_chunks",
              precompute.topic_chunks_table(n_convs_for(sf_dir)))

        kg = precompute.kg_tables(n_convs_for(sf_dir))
        write(out_dir, "kg_triples", kg["kg_triples"])
        write(out_dir, "kg_chunk_stats", kg["kg_chunk_stats"])
        write(out_dir, "kg_nodes_canonical", kg["kg_nodes_canonical"])
        write(out_dir, "kg_canonical_incremental", kg["kg_canonical_incremental"])
        write(out_dir, "kg_cluster_purity", kg["kg_cluster_purity"])
        write(out_dir, "kg_nodes_with_tools", kg["kg_nodes_with_tools"])
        write(out_dir, "kg_similar_chunk_edges", kg["kg_similar_chunk_edges"])
        write(out_dir, "kg_fact_assertions", kg["kg_fact_assertions"])

        # per-node graphlet degree vectors over the extracted entity
        # graph (undirected collapse of subj-obj pairs)
        gdv_edges = [(r[1], r[4]) for r in kg["kg_triples"]]
        write(out_dir, "graph_orbits", precompute.gdv_py(gdv_edges))
        write(out_dir, "a10_tree_summarize", kg["a10_tree_summarize"])
        write(out_dir, "s6_batch_summaries", kg["s6_batch_summaries"])
        write(out_dir, "kg_community_reports",
              precompute.community_reports_table(n_convs_for(sf_dir)))
        write(out_dir, "kg_community_members",
              precompute.community_members_table(n_convs_for(sf_dir)))
        ep3 = precompute.ep3_tables(n_convs_for(sf_dir))
        write(out_dir, "ep3_graph_vector_search", ep3["assembled"])
        write(out_dir, "ep3_compressed_context", ep3["compressed"])

        from context_aware_rag_spark.functions.plannerscript import (
            DEFAULT_PLANNER_QUERY,
        )
        write(out_dir, "ep3_planner_trace",
              precompute.planner_trace_table(
                  n_convs_for(sf_dir), DEFAULT_PLANNER_QUERY))


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.01"])
