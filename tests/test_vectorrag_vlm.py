"""Vector-RAG entry point (operators/vectorrag.py) and VLM frame
assembly (operators/vlmretrieval.py) — unit + reference-parity tests.

The SQL twins live in entry_queries (vector_rag_search /
vector_rag_context / vlm_frame_assembly, swept by
test_entry_contract); these tests pin the reference semantics the SQL
cannot see: the retriever's metadata gate ordering, the uniform-
sampling index formula vs Python's round() (image_fetcher.py:281-284),
and the message-list ordering contract.
"""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import multimodal, vectorrag, vlmretrieval


def _docs(spark):
    rows = [
        # doc_id, text, source, lang, embedding (unit-ish, hand-picked)
        (1, "alpha " * 50, "srcA", "en", [1.0, 0.0, 0.0]),
        (2, "beta " * 50, "srcB", "en", [0.9, 0.1, 0.0]),
        (3, "gamma " * 50, "srcC", "de", [1.0, 0.0, 0.0]),  # filtered out
        (4, "delta " * 50, "srcD", "en", [0.0, 1.0, 0.0]),
        (5, "epsilon " * 50, "srcE", "en", [0.5, 0.5, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, "
              "embedding array<float>"
    )


class TestVectorRag:
    def test_metadata_filter_under_topk(self, spark):
        # doc 3 ties doc 1 at cosine 1.0 but is not a "caption" — it
        # must never enter the ranking (reference retriever expr,
        # vector_retrieval_func.py:96-101), not merely be dropped after
        out = vectorrag.vector_rag_search(
            _docs(spark), [1.0, 0.0, 0.0], top_k=3,
            filter_expr=F.col("lang") == "en",
        ).collect()
        ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ids == [1, 2, 5]
        assert all(r["doc_id"] != 3 for r in out)

    def test_citation_and_snippet(self, spark):
        out = {
            r["doc_id"]: r
            for r in vectorrag.vector_rag_search(
                _docs(spark), [1.0, 0.0, 0.0], top_k=2,
                filter_expr=F.col("lang") == "en",
            ).collect()
        }
        assert out[1]["citation"] == "[srcA] 1"
        assert len(out[1]["snippet"]) == 200  # snippet_length default

    def test_context_rank_order_and_sources(self, spark):
        docs = _docs(spark)
        retrieved = vectorrag.vector_rag_search(
            docs, [1.0, 0.0, 0.0], top_k=3,
            filter_expr=F.col("lang") == "en",
        )
        row = vectorrag.vector_rag_context(retrieved, "q?", docs).collect()[0]
        # format_docs order == rank order (utils.py:234-235)
        first, second, third = row["context"].split("\n\n")
        assert first.startswith("alpha") and second.startswith("beta")
        assert third.startswith("epsilon")
        assert row["sources"] == (
            "\n**Sources:**\n[srcA] 1\n[srcB] 2\n[srcE] 5"
        )
        assert row["n_docs"] == 3
        assert row["context_length"] == len(row["context"])


def _ref_indices(total: int, k: int):
    """Straight transcription of image_fetcher.py:265-287."""
    if total > 0 and k > 0 and total > k:
        if k == 1:
            return [total // 2]
        return [int(round(i * (total - 1) / (k - 1))) for i in range(k)]
    return list(range(total))


class TestVlmSampling:
    @pytest.mark.parametrize("total,k", [
        (6, 3),    # hits 2.5 -> banker's 2 (half-up would say 3)
        (10, 4), (13, 4), (30, 4), (97, 30), (5, 1), (4, 4), (3, 4),
        (11, 3),   # hits 5.0 exactly
        (8, 5),    # 1.75, 3.5 -> banker's 4, 5.25
    ])
    def test_index_formula_matches_python_round(self, spark, total, k):
        media = spark.createDataFrame(
            [(2, "video", b"x", (0, 0, total * 1000, "fake"))],
            "media_id long, kind string, payload binary, "
            "meta struct<width:int,height:int,duration_ms:int,codec:string>",
        )
        retrieved = spark.createDataFrame([(1, 2)], "rank int, doc_id long")
        out = vlmretrieval.vlm_frame_assembly(
            retrieved, media, num_frames_per_chunk=k, every_ms=1000
        )
        got = [
            r["frame_idx"]
            for r in out.filter(F.col("msg_type") == "image_url")
            .orderBy("msg_idx").collect()
        ]
        assert got == _ref_indices(total, k), (total, k, got)

    def test_message_ordering_and_metadata(self, spark):
        docs = spark.range(0, 9).select(F.col("id").alias("doc_id"),
                                        F.lit("t").alias("text"))
        media = multimodal.synthesize_media(spark, docs)
        # ids 2, 5, 8 are video-kind; retrieve 5 (video) and 4 (audio)
        retrieved = spark.createDataFrame(
            [(1, 5), (2, 4)], "rank int, doc_id long"
        )
        out = vlmretrieval.vlm_frame_assembly(
            retrieved, media, num_frames_per_chunk=2, every_ms=1000
        ).orderBy("rank", "msg_idx").collect()
        # audio doc contributes nothing (no asset_dir analog,
        # vlm_retrieval_func.py:139-147)
        assert {r["media_id"] for r in out} == {5}
        # duration 5 % 9000 + 1000 = 1005 ms -> a single available frame
        assert [r["msg_type"] for r in out] == ["text", "image_url"]
        meta = out[0]
        # media_id 5: start 5s, duration 5%9000+1000 = 1005ms -> end 6s
        assert meta["content"] == (
            "Image metadata: (Timestamp: 00:00:05 to 00:00:06)\n"
        )
        assert out[1]["content"].startswith("data:image/jpeg;base64,")
        assert "\r" not in out[1]["content"]  # RFC 4648, not MIME

    def test_frame_count_bounded_by_k(self, spark):
        docs = spark.range(0, 300).select(F.col("id").alias("doc_id"),
                                          F.lit("t").alias("text"))
        media = multimodal.synthesize_media(spark, docs)
        vids = [
            r["media_id"]
            for r in media.filter(F.col("kind") == "video")
            .select("media_id").limit(20).collect()
        ]
        retrieved = spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(vids)], "rank int, doc_id long"
        )
        out = vlmretrieval.vlm_frame_assembly(
            retrieved, media, num_frames_per_chunk=3, every_ms=100
        )
        per_doc = (
            out.filter(F.col("msg_type") == "image_url")
            .groupBy("media_id").count().collect()
        )
        assert per_doc and all(r["count"] <= 3 for r in per_doc)
