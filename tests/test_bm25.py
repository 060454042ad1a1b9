"""BM25: hand-computed parity on a tiny corpus, ranking semantics,
and the broadcast shape of the postings join."""

import math

from pyspark.sql import functions as F

from context_aware_rag_spark.operators import bm25

K1, B = 1.2, 0.75


def _py_bm25(corpus: dict, query: str) -> dict:
    """Straight-line reference implementation (same micro-nat
    rounding; HALF_UP == floor(x + .5) for the positive Lucene idf)."""
    toks = {d: t.lower().strip().split() for d, t in corpus.items()}
    n_docs = len(toks)
    sum_dl = sum(len(w) for w in toks.values())
    scores = {}
    for term in dict.fromkeys(query.lower().strip().split()):
        df = sum(1 for w in toks.values() if term in w)
        if df == 0:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for d, w in toks.items():
            tf = w.count(term)
            if tf == 0:
                continue
            dl = len(w)
            c = (
                idf
                * (tf * (K1 + 1.0))
                / (tf + K1 * ((1.0 - B) + B * (dl * n_docs) / sum_dl))
                * 1000000.0
            )
            scores[d] = scores.get(d, 0) + int(math.floor(c + 0.5))
    return scores


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick blue hare sleeps",
    3: "brown foxes and brown bears share the brown forest",
    4: "completely unrelated text about spark shuffles",
}


class TestBm25Parity:
    def test_scores_match_reference_implementation(self, spark):
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        queries = spark.createDataFrame(
            [(100, "quick brown fox")], "query_id: long, query_text: string"
        )
        got = {
            r["doc_id"]: r["score_micro"]
            for r in bm25.bm25_scores(docs, queries).collect()
        }
        assert got == _py_bm25(CORPUS, "quick brown fox")

    def test_topk_order_and_tiebreak(self, spark):
        # identical docs -> identical scores -> ascending doc_id ties
        docs = spark.createDataFrame(
            [(i, "same words here") for i in range(5)] + [(9, "other stuff")],
            "doc_id: long, text: string",
        )
        queries = spark.createDataFrame(
            [(0, "same words")], "query_id: long, query_text: string"
        )
        rows = (
            bm25.bm25_topk(docs, queries, k=3).orderBy("rank").collect()
        )
        assert [r["doc_id"] for r in rows] == [0, 1, 2]
        assert [r["rank"] for r in rows] == [1, 2, 3]
        assert len({r["score_micro"] for r in rows}) == 1

    def test_query_term_absent_everywhere(self, spark):
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        queries = spark.createDataFrame(
            [(1, "zzzz qqqq")], "query_id: long, query_text: string"
        )
        assert bm25.bm25_scores(docs, queries).count() == 0

    def test_sample_doc_queries_first_words(self, spark):
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        qs = {
            r["query_id"]: r["query_text"]
            for r in bm25.sample_doc_queries(docs, [1, 3], n_words=3).collect()
        }
        assert qs == {1: "the quick brown", 3: "brown foxes and"}

    def test_postings_join_is_broadcast(self, spark):
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        queries = spark.createDataFrame(
            [(0, "quick brown")], "query_id: long, query_text: string"
        )
        plan = bm25.bm25_scores(docs, queries)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastHashJoin" in plan
        # the query side never drives a shuffled join of the corpus
        assert "SortMergeJoin" not in plan


MU = 2000.0


def _r_half_away(x: float) -> int:
    # Spark F.round = HALF_UP (away from zero), live here because the
    # QL smoothing normalizer is negative
    import math as _m

    return int(_m.copysign(_m.floor(abs(x) + 0.5), x))


def _py_ql(corpus: dict, query: str, mu: float = MU) -> dict:
    """Straight-line Dirichlet query-likelihood reference (rank-
    equivalent decomposition, same micro-nat rounding order)."""
    from collections import Counter

    toks = {d: t.lower().strip().split() for d, t in corpus.items()}
    total_cf = sum(len(w) for w in toks.values())
    cf = Counter(t for w in toks.values() for t in w)
    q = query.lower().strip().split()
    qtf = Counter(q)
    n_q = len(q)
    scores = {}
    for term, qn in qtf.items():
        if cf[term] == 0:
            continue
        for d, w in toks.items():
            tf = w.count(term)
            if tf == 0:
                continue
            c = qn * math.log(1.0 + (tf * total_cf) / (mu * cf[term]))
            scores[d] = scores.get(d, 0) + _r_half_away(c * 1000000.0)
    return {
        d: s
        + _r_half_away(
            n_q * math.log(mu / (len(toks[d]) + mu)) * 1000000.0
        )
        for d, s in scores.items()
    }


class TestQlParity:
    def test_scores_match_reference_implementation(self, spark):
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        queries = spark.createDataFrame(
            [(100, "quick brown fox")], "query_id: long, query_text: string"
        )
        got = {
            r["doc_id"]: r["score_micro"]
            for r in bm25.ql_scores(docs, queries).collect()
        }
        assert got == _py_ql(CORPUS, "quick brown fox")
        # the smoothing normalizer drags weak matches below zero
        # (negative integer scores are live, not a degenerate case)
        assert min(got.values()) < 0

    def test_query_term_multiplicity_counts(self, spark):
        # unlike BM25's distinct terms, repeating a query term doubles
        # its matched contribution AND grows n_q for the normalizer
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        single = spark.createDataFrame(
            [(0, "brown fox")], "query_id: long, query_text: string"
        )
        doubled = spark.createDataFrame(
            [(0, "brown brown fox")], "query_id: long, query_text: string"
        )
        s1 = {
            r["doc_id"]: r["score_micro"]
            for r in bm25.ql_scores(docs, single).collect()
        }
        s2 = {
            r["doc_id"]: r["score_micro"]
            for r in bm25.ql_scores(docs, doubled).collect()
        }
        assert s2 == _py_ql(CORPUS, "brown brown fox")
        assert s1 != s2

    def test_length_normalizer_prefers_shorter_doc(self, spark):
        # same matched tf, different dl: the shorter doc pays less
        # smoothing mass and must rank first
        docs = spark.createDataFrame(
            [
                (1, "target word"),
                (2, "target word plus lots of extra unrelated padding here"),
            ],
            "doc_id: long, text: string",
        )
        queries = spark.createDataFrame(
            [(0, "target")], "query_id: long, query_text: string"
        )
        rows = bm25.ql_topk(docs, queries, k=2).orderBy("rank").collect()
        assert [r["doc_id"] for r in rows] == [1, 2]

    def test_topk_contract_matches_bm25(self, spark):
        docs = spark.createDataFrame(
            [(i, "same words here") for i in range(5)],
            "doc_id: long, text: string",
        )
        queries = spark.createDataFrame(
            [(0, "same words")], "query_id: long, query_text: string"
        )
        rows = bm25.ql_topk(docs, queries, k=3).orderBy("rank").collect()
        assert [r["doc_id"] for r in rows] == [0, 1, 2]
        assert rows[0].asDict().keys() == {
            "query_id", "doc_id", "rank", "score_micro",
        }

    def test_postings_join_is_broadcast(self, spark):
        docs = spark.createDataFrame(
            list(CORPUS.items()), "doc_id: long, text: string"
        )
        queries = spark.createDataFrame(
            [(0, "quick brown")], "query_id: long, query_text: string"
        )
        plan = bm25.ql_scores(docs, queries)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
