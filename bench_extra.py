#!/usr/bin/env python
"""Focused per-operator benchmark harness for optimization work.

NOT the driver's bench (bench.py is frozen for measurement) — this file
reproduces bench.py's input setup and times a chosen SUBSET of the same
operator calls over N rounds, optionally dumping .explain("formatted")
plans.  Usage:

    python bench_extra.py minhash simhash knn --rounds 2
    python bench_extra.py --list
    python bench_extra.py dsir --explain plans/r06/dsir_after.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from context_aware_rag_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="operator groups to time")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--explain", default=None,
                    help="write .explain(formatted) of each timed frame here")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    spark = build_session(
        app_name="bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from context_aware_rag_spark.deploy import ensure_on_executors

    ensure_on_executors(spark)

    from pyspark.sql import functions as F

    from context_aware_rag_spark.config import PipelineConfig
    from context_aware_rag_spark.plans import entry_queries as eq
    from context_aware_rag_spark.plans.pipeline import run_pipeline
    from context_aware_rag_spark.operators import dedup as dedup_ops
    from context_aware_rag_spark.operators import similarity as sim_ops
    from context_aware_rag_spark.operators import dsir as dsir_ops
    from context_aware_rag_spark.operators import lm as lm_ops
    from context_aware_rag_spark.operators import textmetrics as tm_ops
    from context_aware_rag_spark.operators import bm25 as bm25_ops
    from context_aware_rag_spark.operators import sketches as sk_ops
    from context_aware_rag_spark.operators import communities as comm_ops
    from context_aware_rag_spark.operators.chunking import chunk_transcripts
    from context_aware_rag_spark.sources.synth_docs import synthesize_docs
    from context_aware_rag_spark.sources.transcripts import generate_transcripts

    from bench import drop_persisted, force, persisted_ids, settle

    # ---- inputs (identical to bench.py's setup) -------------------------
    n_dedup_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DEDUP_DOCS", "50000"))
    docs50k = synthesize_docs(spark, n_dedup_docs).localCheckpoint()
    docs50k.count()

    transcripts = eq.transcripts_for(spark, sf_dir).localCheckpoint()
    transcripts.count()

    need = set(args.names)

    def mk_big100():
        big100 = generate_transcripts(
            spark, 100 * eq.n_convs_for(sf_dir)
        ).localCheckpoint()
        big100.count()
        return big100

    big100 = None
    if need & {"pipeline100x", "communities", "entity_reports", "texttiling",
               "conv_metrics", "sft_pairs"}:
        big100 = mk_big100()

    triples100 = None
    if need & {"communities", "entity_reports"}:
        triples100 = (
            run_pipeline(spark, big100, PipelineConfig())
            .triples.select(
                "conv_id", "subj_name", "subj_type", "pred",
                "obj_name", "obj_type",
            )
            .distinct()
            .localCheckpoint()
        )
        triples100.count()

    knn_chunks = None
    if need & {"knn"}:
        knn_input = chunk_transcripts(transcripts).dropDuplicates(
            ["chunk_id"]
        ).select("chunk_id", "text")
        knn_chunks = sim_ops.with_text_embeddings(knn_input).localCheckpoint()
        knn_chunks.count()

    words50k = docs50k.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    )

    # ---- operator table -------------------------------------------------
    def t_minhash():
        return dedup_ops.minhash_dedup(docs50k, threshold=0.4)

    def t_simhash():
        return dedup_ops.simhash_near_dups(docs50k)

    def t_knn():
        return sim_ops.knn_similar_edges(knn_chunks, id_col="chunk_id")

    def t_clf():
        return tm_ops.quality_classifier(docs50k).filter("keep")

    def t_dsir():
        return dsir_ops.dsir_select(
            docs50k, docs50k.filter(F.col("doc_id") % 7 == 0),
            k=1000, n_buckets=65536,
        )

    def t_lm():
        return lm_ops.bigram_lm_scores(docs50k)

    def t_bm25():
        return bm25_ops.bm25_topk(
            docs50k,
            bm25_ops.sample_doc_queries(docs50k, list(range(8)), n_words=5),
            k=10,
        )

    def t_hll():
        return sk_ops.hll_count_distinct(
            words50k.select(F.lit("all").alias("g"), "word"), ["g"], "word",
            p=12,
        )

    def t_cms():
        cms = sk_ops.cms_build(words50k, "word", depth=4, width=4096)
        probe_keys = words50k.dropDuplicates().limit(64)
        return sk_ops.cms_query(cms, probe_keys, "word", depth=4, width=4096)

    def t_pipeline():
        return run_pipeline(spark, transcripts, PipelineConfig()).triples

    def t_pipeline_dedup():
        return run_pipeline(
            spark, transcripts, PipelineConfig(deduplicate_nodes=True)
        ).nodes

    def t_pipeline100x():
        return run_pipeline(spark, big100, PipelineConfig()).triples

    def t_communities():
        c_nodes, c_edges = comm_ops.entity_graph(triples100, min_count=10)
        r = comm_ops.community_reports(c_nodes, c_edges, max_members=12)
        h = (
            comm_ops.community_hierarchy(c_edges)
            .select("parent").distinct()
        )
        return (r, h)

    def t_entity_reports():
        return comm_ops.entity_reports(triples100, max_facts=12, min_facts=3)

    def t_texttiling():
        from context_aware_rag_spark.operators.segmentation import (
            texttiling_gaps,
        )
        return texttiling_gaps(big100).filter(F.col("is_boundary"))

    def t_conv_metrics():
        from context_aware_rag_spark.operators.convstats import (
            conv_turn_metrics,
        )
        return conv_turn_metrics(big100)

    def t_sft_pairs():
        from context_aware_rag_spark.operators.sftpairs import sft_pairs
        return sft_pairs(big100)

    def t_textrank():
        from context_aware_rag_spark.operators.textrank import (
            textrank_summary,
        )
        docs2k = docs50k.filter(F.col("doc_id") < 2000)
        return textrank_summary(docs2k, top_k=3, threshold_ppm=150_000)

    def t_ngram():
        fn = {**eq.EXTRA_QUERIES, **eq.QUERIES}["ngram_jaccard_pairs"]
        return fn(spark, sf_dir)

    def t_range_join():
        from context_aware_rag_spark.operators import intervals as iv_ops
        pts2m = spark.range(2_000_000).select(
            F.col("id").alias("pid"), ((F.col("id") * 7) % 40_000_000).alias("p")
        )
        ivs200k = spark.range(200_000).select(
            F.col("id").alias("iid"),
            ((F.col("id") * 131) % 40_000_000).alias("s"),
            (((F.col("id") * 131) % 40_000_000) + F.col("id") % 600).alias("e"),
        )
        return iv_ops.range_join_points(
            pts2m, ivs200k, "p", "s", "e", bucket_width=512
        )

    table = {
        "minhash": t_minhash, "simhash": t_simhash, "knn": t_knn,
        "clf": t_clf, "dsir": t_dsir, "lm": t_lm, "bm25": t_bm25,
        "hll": t_hll, "cms": t_cms,
        "pipeline": t_pipeline, "pipeline_dedup": t_pipeline_dedup,
        "pipeline100x": t_pipeline100x,
        "communities": t_communities, "entity_reports": t_entity_reports,
        "texttiling": t_texttiling, "conv_metrics": t_conv_metrics,
        "sft_pairs": t_sft_pairs, "textrank": t_textrank,
        "ngram": t_ngram, "range_join": t_range_join,
    }
    if args.list or not args.names:
        print("groups:", " ".join(sorted(table)))
        spark.stop()
        return

    keep = persisted_ids(spark)
    samples: dict[str, list] = {n: [] for n in args.names}
    counts: dict[str, int] = {}
    for rnd in range(args.rounds):
        for name in args.names:
            settle(spark, keep)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            out = table[name]()
            if isinstance(out, tuple):
                n = sum(df.count() for df in out)
            else:
                n = force(out)
            samples[name].append(round(time.monotonic() - t0, 3))
            counts[name] = n
            if args.explain and rnd == 0:
                with open(args.explain, "a") as f:
                    frames = out if isinstance(out, tuple) else (out,)
                    for df in frames:
                        f.write(f"== {name} ==\n")
                        f.write(df._sc._jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"))
                        f.write("\n")
            drop_persisted(spark, keep)
    print(json.dumps({
        "mins": {n: min(v) for n, v in samples.items()},
        "samples": samples,
        "counts": counts,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
