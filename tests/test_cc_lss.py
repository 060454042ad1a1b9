"""Large-star/small-star connected components: equivalence with the
label-propagation fixpoint on adversarial graph shapes, plus the
dedup_clusters plumbing."""

import random

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import dedup
from context_aware_rag_spark.operators.canonicalize import connected_components


def _cc_maps(spark, edges, max_iter_lss=30):
    pairs = spark.createDataFrame(edges, "a: long, b: long")
    label = {
        r["node_id"]: r["canon_id"]
        for r in connected_components(pairs, algorithm="label").collect()
    }
    lss = {
        r["node_id"]: r["canon_id"]
        for r in connected_components(
            pairs, max_iter=max_iter_lss, algorithm="lss"
        ).collect()
    }
    return label, lss


def _brute_cc(edges):
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


class TestLssEquivalence:
    def test_path_graph_long_diameter(self, spark):
        # diameter 199: label-prop would need ~200 rounds (it RAISES at
        # max_iter=50 on this graph — exactly the case lss exists for);
        # max_iter=12 PROVES the lss round count is logarithmic
        edges = [(i, i + 1) for i in range(200)]
        pairs = spark.createDataFrame(edges, "a: long, b: long")
        lss = {
            r["node_id"]: r["canon_id"]
            for r in connected_components(
                pairs, max_iter=12, algorithm="lss"
            ).collect()
        }
        assert lss == _brute_cc(edges)
        assert set(lss.values()) == {0}

    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(42)
        nodes = list(range(500))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(400)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        label, lss = _cc_maps(spark, edges)
        brute = _brute_cc(edges)
        assert lss == brute
        assert label == brute

    def test_hub_skew_max_id_hub(self, spark):
        # one hot node with the LARGEST id: large-star rewires its
        # whole fan-in to the minimum in one round
        hub = 10_000
        edges = [(hub, leaf) for leaf in range(300)]
        label, lss = _cc_maps(spark, edges, max_iter_lss=6)
        assert lss == label
        assert set(lss.values()) == {0}

    def test_string_ids(self, spark):
        pairs = spark.createDataFrame(
            [("b", "c"), ("c", "d"), ("x", "y")], "a: string, b: string"
        )
        out = {
            r["node_id"]: r["canon_id"]
            for r in connected_components(pairs, algorithm="lss").collect()
        }
        assert out == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}

    def test_two_cliques_bridged(self, spark):
        edges = (
            [(i, j) for i in range(5) for j in range(i + 1, 5)]
            + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
            + [(4, 10)]
        )
        label, lss = _cc_maps(spark, edges)
        assert lss == label
        assert set(lss.values()) == {0}

    def test_unknown_algorithm_raises(self, spark):
        pairs = spark.createDataFrame([(1, 2)], "a: long, b: long")
        with pytest.raises(ValueError, match="unknown cc algorithm"):
            connected_components(pairs, algorithm="banana")

    def test_nonconvergence_raises(self, spark):
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "a: long, b: long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iter=1, algorithm="lss")


class TestDedupClustersLss:
    def test_cluster_labels_match_default(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc text {i % 3} repeated") for i in range(30)],
            "doc_id: long, text: string",
        )
        pairs = spark.createDataFrame(
            [(0, 3), (3, 6), (6, 9), (1, 4), (4, 7)], "a: long, b: long"
        )
        base = dedup.dedup_clusters(docs, pairs).orderBy("doc_id").collect()
        lss = (
            dedup.dedup_clusters(docs, pairs, cc_algorithm="lss")
            .orderBy("doc_id")
            .collect()
        )
        assert [tuple(r) for r in base] == [tuple(r) for r in lss]
        by_id = {r["doc_id"]: r for r in lss}
        assert by_id[9]["cluster_id"] == 0 and by_id[7]["cluster_id"] == 1
