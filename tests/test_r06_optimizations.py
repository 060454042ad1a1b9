"""Focused equivalence tests for the round-6 optimization rewrites.

Each optimized internal is pinned against a straightforward reference
implementation of the shape it replaced, on inputs that include the
edge cases the rewrite had to preserve (NULL text, empty/short docs,
long texts, the "." drop marker).
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from context_aware_rag_spark.operators import dedup
from context_aware_rag_spark.operators.dedup import (
    _gram_sizes,
    _norm_grams_col,
    normalized_text,
)


EDGE_ROWS = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, "."),
    (5, "one"),
    (6, "two words"),
    (7, "a b c d e f"),
    (8, "Alice, met? Bob!  extra   spaces\nand a newline"),
    (9, "x!  y,, z"),
]


def _ref_grams(ns):
    """The pre-r6 gram builder: transform(sequence, i ->
    concat_ws(slice(words, i, k))) — the semantics oracle for
    _size_grams' zip_with rewrite."""
    words = F.split(normalized_text(F.col("text")), " ")

    def size_grams(k):
        return F.when(
            F.size(words) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    per = [size_grams(k) for k in ns]
    return per[0] if len(per) == 1 else F.concat(*per)


class TestGramRewrite:
    @pytest.mark.parametrize("ns", [(1,), (2,), (1, 2), (3,), (2, 3)])
    def test_norm_grams_match_reference(self, spark, ns):
        df = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
        got = df.select("doc_id", _norm_grams_col("text", _gram_sizes(ns)).alias("g")).collect()
        want = df.select("doc_id", _ref_grams(list(ns)).alias("g")).collect()
        assert got == want


class TestSimhashRewrite:
    def test_matches_expression_reference(self, spark):
        """numpy bit-vote fingerprint == the pre-r6 one-expression form
        (nested aggregate/zip_with), including NULL text -> 0."""
        rows = EDGE_ROWS + [(10, "alice bob alice bob carol"),
                            (11, "The Quick brown FOX")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}

        words = F.array_distinct(F.split(normalized_text(F.col("text")), " "))
        ref = (
            df.select(
                "doc_id",
                F.transform(words, lambda w: F.xxhash64(w)).alias("_hashes"),
            )
            .select(
                "doc_id",
                F.expr(
                    """
                    aggregate(
                      zip_with(
                        transform(sequence(0, 63), j ->
                          aggregate(_hashes, 0,
                            (acc, h) -> acc + IF((h & shiftleft(1L, j)) != 0L, 1, -1))),
                        sequence(0, 63),
                        (v, j) -> IF(v > 0, shiftleft(1L, j), 0L)),
                      0L, (acc, x) -> acc | x)
                    """
                ).alias("simhash"),
            )
        )
        want = {r["doc_id"]: r["simhash"] for r in ref.collect()}
        # the old expression yields NULL for NULL text where the rewrite
        # yields 0 — both "no usable tokens"; normalize for comparison
        want = {k: (v if v is not None else 0) for k, v in want.items()}
        assert got == want


class TestMinhashSigRewrite:
    @pytest.mark.parametrize("num_hashes", [4, 64])
    def test_matches_expression_reference(self, spark, num_hashes):
        """numpy seed-hash + reduceat-min signature == the pre-r6
        nested-transform form ``transform(seeds, k ->
        array_min(transform(shingles, s -> xxhash64(s, k))))``,
        including unicode shingles, the single-shingle short-doc path
        and the NULL/empty -> array-of-nulls signature."""
        import random

        rng = random.Random(1234)
        vocab = ["alice", "bob", "café", "東京", "naïve", "x", "", "Zebra!"]
        rows = list(EDGE_ROWS) + [
            (100 + i, " ".join(rng.choices(vocab, k=rng.randint(1, 30))))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = dedup.with_shingles(df, n=3)
        got = {
            r["doc_id"]: r["signature"]
            for r in dedup.minhash_signatures(
                sh, num_hashes=num_hashes
            ).collect()
        }
        seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
        ref_sig = F.transform(
            seeds,
            lambda k: F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s, k))
            ),
        )
        want = {
            r["doc_id"]: r["signature"]
            for r in sh.select(
                "doc_id", ref_sig.alias("signature")
            ).collect()
        }
        assert got == want

    def test_null_and_empty_shingle_arrays(self, spark):
        """Frames minhash_signatures could see in general use: a NULL
        shingles column and an empty array both signature to
        [NULL] * num_hashes, exactly like the old expression."""
        sh = spark.createDataFrame(
            [(1, None), (2, []), (3, ["a", None])],
            "doc_id long, shingles array<string>",
        )
        got = {
            r["doc_id"]: r["signature"]
            for r in dedup.minhash_signatures(sh, num_hashes=8).collect()
        }
        seeds = F.sequence(F.lit(0), F.lit(7))
        ref_sig = F.transform(
            seeds,
            lambda k: F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s, k))
            ),
        )
        want = {
            r["doc_id"]: r["signature"]
            for r in sh.select("doc_id", ref_sig.alias("signature")).collect()
        }
        assert got == want


class TestChunkingFastPath:
    def test_mixed_batch_matches_slow_path(self, spark):
        """A batch mixing short texts, a >chunk_size text, '.' markers
        and NULLs: the vectorized fast path must be bypassed for the
        long-text batch and produce identical rows everywhere."""
        from context_aware_rag_spark.config import PipelineConfig
        from context_aware_rag_spark.operators.chunking import (
            _split_batch,
            chunk_transcripts,
        )

        import datetime as dt

        ts = dt.datetime(2031, 3, 1, 12, 0, 0)
        # > 500 chars WITH newline separators so the recursive splitter
        # actually produces multiple pieces
        long_text = ("sentence with words.\n" * 40).strip()
        rows = [
            ("c1", 0, "Alice met Bob.", ts),
            ("c1", 1, ".", ts),
            ("c1", 2, None, ts),
            ("c1", 3, "   ", ts),
            ("c1", 4, long_text, ts),
            ("c2", 0, "short", ts),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string, ts timestamp"
        )
        cfg = PipelineConfig()
        got = sorted(
            map(tuple, chunk_transcripts(df, cfg).collect())
        )
        # reference: the exact per-row loop over the same batch grain
        pdf = df.withColumn(
            "batch_id", (F.col("turn_idx") / cfg.batch_size).cast("long")
        ).select("conv_id", "batch_id", "turn_idx", "text", "ts").toPandas()
        ref = _split_batch(pdf, cfg.chunk_size, cfg.chunk_overlap)
        from context_aware_rag_spark.functions import hashing

        ref_df = spark.createDataFrame(ref).withColumn(
            "chunk_id", hashing.chunk_id_col(F.col("text"), F.col("conv_id"))
        )
        want = sorted(map(tuple, ref_df.collect()))
        assert got == want
        # the long text really did split (fast path must not swallow it)
        assert any(r[3] > 0 for r in got), "expected a split_pos > 0 chunk"


class TestSmallGraphCC:
    """connected_components(small_graph_cap=...) — driver union-find
    election with distributed fallback (r6)."""

    def _brute(self, edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    def test_matches_distributed_and_brute(self, spark):
        import random

        from context_aware_rag_spark.operators.canonicalize import (
            connected_components,
        )

        rng = random.Random(99)
        edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "a: long, b: long")
        fast = {
            (r["node_id"], r["canon_id"])
            for r in connected_components(
                pairs, small_graph_cap=10_000
            ).collect()
        }
        dist = {
            (r["node_id"], r["canon_id"])
            for r in connected_components(pairs).collect()
        }
        assert fast == dist == set(self._brute(edges).items())

    def test_string_ids_and_schema(self, spark):
        from context_aware_rag_spark.operators.canonicalize import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [("b", "c"), ("c", "d"), ("x", "y")], "a: string, b: string"
        )
        out = connected_components(pairs, small_graph_cap=100)
        assert [f.name for f in out.schema.fields] == ["node_id", "canon_id"]
        assert out.schema["node_id"].dataType.typeName() == "string"
        got = {(r["node_id"], r["canon_id"]) for r in out.collect()}
        assert got == {("b", "b"), ("c", "b"), ("d", "b"), ("x", "x"), ("y", "x")}

    def test_cap_exceeded_falls_back(self, spark):
        from context_aware_rag_spark.operators.canonicalize import (
            connected_components,
        )

        edges = [(i, i + 1) for i in range(10)]
        pairs = spark.createDataFrame(edges, "a: long, b: long")
        out = {
            (r["node_id"], r["canon_id"])
            for r in connected_components(pairs, small_graph_cap=3).collect()
        }
        assert out == set(self._brute(edges).items())

    def test_lss_with_cap_takes_fast_path(self, spark):
        from context_aware_rag_spark.operators.canonicalize import (
            connected_components,
        )

        # long path + tiny max_iter would raise on the distributed lss
        # rounds; the elected fast path converges regardless
        edges = [(i, i + 1) for i in range(64)]
        pairs = spark.createDataFrame(edges, "a: long, b: long")
        out = {
            r["canon_id"]
            for r in connected_components(
                pairs, max_iter=1, algorithm="lss", small_graph_cap=1_000
            ).collect()
        }
        assert out == {0}


class TestSmallGraphLPA:
    """label_propagation(small_graph_cap=...) — exact driver replica of
    the synchronous distributed rounds (r6)."""

    def _both(self, spark, edges, schema, max_iter=10):
        from context_aware_rag_spark.operators.graph import label_propagation

        df = spark.createDataFrame(edges, schema)
        fast = sorted(
            map(
                tuple,
                label_propagation(
                    df, max_iter=max_iter, small_graph_cap=100_000
                ).collect(),
            )
        )
        dist = sorted(
            map(tuple, label_propagation(df, max_iter=max_iter).collect())
        )
        return fast, dist

    def test_random_graph_rows_and_niter(self, spark):
        import random

        rng = random.Random(31)
        edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(200)]
        fast, dist = self._both(spark, edges, "src long, dst long")
        assert fast == dist

    def test_bipartite_two_cycle_hits_max_iter(self, spark):
        # complete bipartite K2,2: synchronous LPA oscillates, so the
        # loop runs to max_iter — n_iter accounting must match exactly
        edges = [(0, 10), (0, 11), (1, 10), (1, 11)]
        fast, dist = self._both(spark, edges, "src long, dst long", max_iter=4)
        assert fast == dist
        assert all(r[2] == 4 for r in fast)

    def test_string_ids_and_schema(self, spark):
        from context_aware_rag_spark.operators.graph import label_propagation

        df = spark.createDataFrame(
            [("b", "c"), ("c", "d"), ("x", "y"), ("y", None)],
            "src string, dst string",
        )
        fast_df = label_propagation(df, small_graph_cap=100)
        dist_df = label_propagation(df)
        assert [
            (f.name, f.dataType.typeName()) for f in fast_df.schema.fields
        ] == [
            (f.name, f.dataType.typeName()) for f in dist_df.schema.fields
        ]
        assert sorted(map(tuple, fast_df.collect())) == sorted(
            map(tuple, dist_df.collect())
        )

    def test_cap_exceeded_falls_back(self, spark):
        from context_aware_rag_spark.operators.graph import label_propagation

        edges = [(i, (i + 1) % 30) for i in range(30)]
        df = spark.createDataFrame(edges, "src long, dst long")
        fast = sorted(
            map(
                tuple,
                label_propagation(df, small_graph_cap=5).collect(),
            )
        )
        dist = sorted(map(tuple, label_propagation(df).collect()))
        assert fast == dist


class TestSmallGraphPagerank:
    """pagerank(small_graph_cap=...) — exact integer driver replica."""

    def test_random_graph_matches_distributed(self, spark):
        import random

        from context_aware_rag_spark.operators.graph import pagerank

        rng = random.Random(17)
        edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
        df = spark.createDataFrame(edges, "src long, dst long")
        fast = sorted(
            map(tuple, pagerank(df, small_graph_cap=10_000).collect())
        )
        dist = sorted(map(tuple, pagerank(df).collect()))
        assert fast == dist
        assert fast  # non-degenerate

    def test_dangling_and_string_ids(self, spark):
        from context_aware_rag_spark.operators.graph import pagerank

        # b and d are dangling (no out-edges): the dang term must match
        df = spark.createDataFrame(
            [("a", "b"), ("c", "d"), ("a", "d")], "src string, dst string"
        )
        fast_df = pagerank(df, small_graph_cap=100)
        dist_df = pagerank(df)
        assert [
            (f.name, f.dataType.typeName()) for f in fast_df.schema.fields
        ] == [
            (f.name, f.dataType.typeName()) for f in dist_df.schema.fields
        ]
        assert sorted(map(tuple, fast_df.collect())) == sorted(
            map(tuple, dist_df.collect())
        )

    def test_empty_graph(self, spark):
        from context_aware_rag_spark.operators.graph import pagerank

        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank(df, small_graph_cap=100).collect() == []
        assert pagerank(df).collect() == []

    def test_textrank_unchanged(self, spark):
        """textrank (which now elects the fast pagerank) must produce
        identical rows to a distributed-pagerank run."""
        from unittest import mock

        from context_aware_rag_spark.operators import graph
        from context_aware_rag_spark.operators.textrank import (
            textrank_summary,
        )

        docs = spark.createDataFrame(
            [
                (1, "Alice met Bob. Alice met Bob again! Tokyo is big."),
                (2, "One sentence only"),
                (3, "Red truck drove. The red truck drove fast. Truck."),
            ],
            "doc_id long, text string",
        )
        got = sorted(map(tuple, textrank_summary(docs, top_k=2).collect()))
        orig = graph.pagerank

        def no_cap(edges, **kw):
            kw.pop("small_graph_cap", None)
            return orig(edges, **kw)

        with mock.patch.object(graph, "pagerank", side_effect=no_cap):
            want = sorted(
                map(tuple, textrank_summary(docs, top_k=2).collect())
            )
        assert got == want


class TestSmallGraphGate:
    """rank_and_gate's driver fixpoint election (r6) — identical rows
    and iteration telemetry vs the forced-distributed rounds."""

    def test_fast_equals_distributed(self, spark):
        from context_aware_rag_spark.operators.similarity import (
            knn_similar_edges,
            rank_and_gate,
            with_text_embeddings,
        )

        rows = []
        for cluster in range(3):
            for i in range(10):
                rows.append(
                    (f"c{cluster}-{i:02d}", f"cluster {cluster} same text")
                )
        for i in range(4):
            rows.append((f"solo-{i}", f"unique text number {i} xyz"))
        emb = with_text_embeddings(
            spark.createDataFrame(rows, ["chunk_id", "text"])
        ).localCheckpoint()
        # ungated knn_similar_edges returns ranked (src, dst, score)
        cand = knn_similar_edges(emb, max_degree=None)
        stats_fast: dict = {}
        stats_dist: dict = {}
        fast = sorted(
            map(
                tuple,
                rank_and_gate(cand, max_degree=5, stats=stats_fast).collect(),
            )
        )
        dist = sorted(
            map(
                tuple,
                rank_and_gate(
                    cand, max_degree=5, stats=stats_dist, small_graph_cap=0
                ).collect(),
            )
        )
        assert fast == dist and fast
        assert stats_fast["iterations"] == stats_dist["iterations"]

    def test_cap_exceeded_falls_back(self, spark):
        from context_aware_rag_spark.operators.similarity import rank_and_gate

        cand = spark.createDataFrame(
            [(f"s{i}", f"s{(i + 1) % 8}", 0.95) for i in range(8)],
            "src string, dst string, score double",
        )
        fast = sorted(map(tuple, rank_and_gate(cand, max_degree=2).collect()))
        dist = sorted(
            map(
                tuple,
                rank_and_gate(cand, max_degree=2, small_graph_cap=3).collect(),
            )
        )
        assert fast == dist


class TestSymmetrizeRewrite:
    def test_cc_and_lpa_unchanged(self, spark):
        """The one-pass explode symmetrization yields the same CC map
        and LPA labels as before on a two-component graph."""
        from context_aware_rag_spark.operators.canonicalize import (
            connected_components,
        )
        from context_aware_rag_spark.operators.graph import label_propagation

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("d", "e"), ("e", "d")],
            "a string, b string",
        )
        cc = {
            (r["node_id"], r["canon_id"])
            for r in connected_components(pairs).collect()
        }
        assert cc == {
            ("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"),
        }
        edges = pairs.withColumnRenamed("a", "src").withColumnRenamed(
            "b", "dst"
        )
        labs = {
            (r["node_id"], r["label"])
            for r in label_propagation(edges, max_iter=10).collect()
        }
        # pin against the pre-r6 reference implementation (window
        # argmax + union symmetrization + per-round checkpoint/count)
        from pyspark.sql import Window

        und = (
            edges.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .dropDuplicates(["a", "b"])
        )
        sym = und.select(
            F.col("a").alias("n"), F.col("b").alias("z")
        ).unionAll(
            und.select(F.col("b").alias("n"), F.col("a").alias("z"))
        ).localCheckpoint()
        labels = (
            sym.select(F.col("n").alias("node_id"))
            .dropDuplicates()
            .withColumn("label", F.col("node_id"))
            .localCheckpoint()
        )
        pick = Window.partitionBy("n").orderBy(
            F.col("cnt").desc(), F.col("nbr_label").asc()
        )
        for _ in range(10):
            nbr = sym.join(
                labels.select(
                    F.col("node_id").alias("z"),
                    F.col("label").alias("nbr_label"),
                ),
                "z",
            )
            new_labels = (
                nbr.groupBy("n", "nbr_label")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .withColumn("_rk", F.row_number().over(pick))
                .filter(F.col("_rk") == 1)
                .select(
                    F.col("n").alias("node_id"),
                    F.col("nbr_label").alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("x")
                .join(labels.alias("y"), "node_id")
                .filter(F.col("x.label") != F.col("y.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        want = {(r["node_id"], r["label"]) for r in labels.collect()}
        assert labs == want


class TestSpreadForCpu:
    """spread_for_cpu: split fat inputs (old repartition behavior),
    bounded no-shuffle coalesce for already-spread inputs, and
    partition-layout independence of the dedup outputs it feeds."""

    def test_few_fat_partitions_repartitions(self, spark):
        from context_aware_rag_spark.operators.skew import spread_for_cpu

        par = spark.sparkContext.defaultParallelism
        df = spark.range(1000).coalesce(1).select(
            F.col("id").alias("doc_id"), F.lit("a b c d").alias("text")
        )
        out = spread_for_cpu(df, "doc_id")
        assert out.rdd.getNumPartitions() == par
        assert "Exchange" in out._jdf.queryExecution().executedPlan().toString()

    def test_spread_input_avoids_exchange(self, spark):
        from context_aware_rag_spark.operators.skew import spread_for_cpu

        par = spark.sparkContext.defaultParallelism
        df = spark.range(1000).repartition(par * 8).select(
            F.col("id").alias("doc_id"), F.lit("a b c d").alias("text")
        ).localCheckpoint()
        out = spread_for_cpu(df, "doc_id")
        assert out.rdd.getNumPartitions() >= par
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Coalesce" in plan

    def test_minhash_pairs_layout_independent(self, spark):
        rows = [
            (i, f"alpha beta gamma delta w{i % 7} epsilon zeta eta theta")
            for i in range(40)
        ] + [(100, None), (101, ""), (102, "one")]
        fat = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        par = spark.sparkContext.defaultParallelism
        spread = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(par * 8)
        got_fat = {
            (r["a"], r["b"], r["est_jaccard"])
            for r in dedup.minhash_dedup(fat, threshold=0.3).collect()
        }
        got_spread = {
            (r["a"], r["b"], r["est_jaccard"])
            for r in dedup.minhash_dedup(spread, threshold=0.3).collect()
        }
        assert got_fat == got_spread and got_fat
