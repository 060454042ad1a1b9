"""Goldens for the lenient JSON repair path (C10 — reference depends on
the json-repair package; ours is an original bounded reimplementation)."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.functions.jsonrepair import (
    canonical_json,
    repair_json,
)


class TestRepairJson:
    def test_valid_passthrough(self):
        assert repair_json('{"a": 1, "b": [2, 3]}') == {"a": 1, "b": [2, 3]}

    def test_code_fence_and_prose(self):
        s = 'Sure! Here is the JSON you asked for:\n```json\n{"k": 7}\n```\nHope it helps.'
        assert repair_json(s) == {"k": 7}

    def test_fence_without_close(self):
        assert repair_json('```json\n{"k": 7}') == {"k": 7}

    def test_python_constants(self):
        s = "{'ok': True, 'bad': False, 'missing': None, 'x': NaN}"
        assert repair_json(s) == {"ok": True, "bad": False, "missing": None, "x": None}

    def test_single_quotes_with_embedded_double(self):
        s = "{'say': 'he said \"hi\" twice'}"
        assert repair_json(s) == {"say": 'he said "hi" twice'}

    def test_unquoted_keys(self):
        assert repair_json("{subj: \"ada\", pred-x: 3}") == {"subj": "ada", "pred-x": 3}

    def test_trailing_commas(self):
        assert repair_json('{"a": [1, 2,], "b": 3,}') == {"a": [1, 2], "b": 3}

    def test_truncated_object(self):
        assert repair_json('{"a": 1, "b": {"c": [1, 2') == {"a": 1, "b": {"c": [1, 2]}}

    def test_truncated_mid_string(self):
        assert repair_json('{"a": "unfinished tex') == {"a": "unfinished tex"}

    def test_truncated_dangling_key(self):
        assert repair_json('{"a": 12, "b":') == {"a": 12}

    def test_hopeless_input_is_none(self):
        assert repair_json("no structured content here at all") is None
        assert repair_json("") is None
        assert repair_json(None) is None

    def test_canonical_form_sorted_compact(self):
        assert canonical_json("{'b': 1, 'a': 2}") == '{"a":2,"b":1}'

    def test_quoted_braces_not_keys(self):
        # content inside strings must never be rewritten as keys
        assert repair_json('{"t": "keep {x: 1} literal"}') == {
            "t": "keep {x: 1} literal"
        }


def test_udf_batch(spark):
    from context_aware_rag_spark.functions.jsonrepair import parse_json_lenient_udf

    rows = [
        (0, '{"k": 1}'),
        (1, "```json\n{'k': 2,}\n```"),
        (2, '{"k": 3, "rest": [tru'),
        (3, "not json"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["i", "raw"])
    out = {
        r["i"]: r["fixed"]
        for r in df.withColumn("fixed", parse_json_lenient_udf()(F.col("raw"))).collect()
    }
    assert out[0] == '{"k":1}'
    assert out[1] == '{"k":2}'
    assert '"k":3' in out[2]
    assert out[3] is None and out[4] is None


class TestJsonLlmExtractor:
    """The json_llm extraction mode (repair a malformed LLM graph
    response, reference pyproject.toml:48 json-repair dependency) must
    reproduce the rule-based extraction exactly, through the full
    pipeline."""

    def test_all_mangle_modes_roundtrip(self):
        from context_aware_rag_spark.functions.extractor import (
            fake_llm_graph_response,
            llm_json_extract,
            rule_based_extract,
        )

        # vocabulary sentences (non-empty extraction) hitting all 5
        # deterministic mangle modes
        texts = [f"Alice met Bob in Tokyo round {i}." for i in range(16)]
        import hashlib
        modes = {
            int.from_bytes(hashlib.sha1(t.encode()).digest()[:2], "big") % 5
            for t in texts
        }
        assert modes == {0, 1, 2, 3, 4}, modes
        for t in texts:
            want = set(rule_based_extract(t))
            assert want, "vocabulary sentence must extract triples"
            assert set(llm_json_extract(t)) == want

    def test_pipeline_parity_with_rule_based(self, spark):
        from context_aware_rag_spark.config import PipelineConfig
        from context_aware_rag_spark.plans.pipeline import run_pipeline
        from context_aware_rag_spark.sources.transcripts import (
            TRANSCRIPT_SCHEMA,
            generate_rows,
        )

        df = spark.createDataFrame(generate_rows(4), schema=TRANSCRIPT_SCHEMA)
        key = ["conv_id", "chunk_id", "subj_id", "pred", "obj_id"]
        rb = {
            tuple(r[k] for k in key)
            for r in run_pipeline(spark, df, PipelineConfig()).triples.collect()
        }
        jl = {
            tuple(r[k] for k in key)
            for r in run_pipeline(
                spark, df, PipelineConfig(extractor="json_llm")
            ).triples.collect()
        }
        assert jl == rb and len(rb) > 0


class TestReviewRegressions:
    """Round-2 code-review findings pinned as regressions."""

    def test_constants_inside_strings_untouched(self):
        assert repair_json('{"a": True, "note": "True story",}') == {
            "a": True, "note": "True story",
        }

    def test_key_like_pattern_inside_string_untouched(self):
        assert repair_json('{"note": "x, foo: bar", }') == {"note": "x, foo: bar"}

    def test_unfenced_trailing_prose(self):
        assert repair_json('The graph is {"a": 1}. Hope that helps!') == {"a": 1}

    def test_escaped_apostrophe_in_single_quotes(self):
        assert repair_json("{'msg': 'it\\'s done'}") == {"msg": "it's done"}

    def test_apostrophe_inside_double_quoted_value(self):
        assert repair_json('prose {"msg": "it\'s fine"} more prose') == {
            "msg": "it's fine"
        }

    def test_trailing_comma_pattern_inside_string(self):
        assert repair_json('{"s": "a ,} b", "t": 1,}') == {"s": "a ,} b", "t": 1}
