

class TestCompressionSignals:
    def test_matches_python_zlib(self, spark):
        import zlib

        from context_aware_rag_spark.operators.textmetrics import (
            compression_signals,
        )

        rows = [
            (1, "hello world " * 50),           # highly repetitive
            (2, "The quick brown fox jumps over the lazy dog."),
            (3, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
            (4, None),                            # dropped
            (5, "unicode: éèê 你好"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        got = {
            r.doc_id: (r.raw_bytes, r.compressed_bytes, r.ratio_ppm)
            for r in compression_signals(df).collect()
        }
        assert 4 not in got
        for doc_id, text in rows:
            if text is None:
                continue
            raw = text.encode("utf-8")
            comp = len(zlib.compress(raw, 6))
            assert got[doc_id] == (
                len(raw), comp, comp * 1_000_000 // len(raw)
            )
        # the repetitive doc compresses much harder than natural text
        assert got[1][2] < got[2][2]
