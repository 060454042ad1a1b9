"""N-Triples sink/source: round-trip identity, adversarial names,
invalid-line contract, and the narrow-plan assertion."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.sources.ntriples import (
    parse_ntriples,
    read_ntriples,
    to_ntriples,
    write_ntriples,
)

NASTY = [
    ("plain", "hosted_on", "rack-7"),
    ("with space", "has tool", "obj with spaces"),
    ("angle<brackets>", "p<>", "><"),
    ("new\nline", "tab\there", "both\n\t"),
    ("percent%20literal", "plus+sign", "%2B"),
    ("quote\"and'", "back\\slash", "`tick`"),
    ("unicode-é-漢字", "emoji-🙂", "ümlaut"),
    (". trailing dot .", "> .", "< urn:x-ent:fake>"),
    ("", "empty_subj_ok", ""),  # empty string is a valid (non-NULL) name
]


class TestRoundTrip:
    def test_nasty_names_roundtrip(self, spark):
        df = spark.createDataFrame(
            NASTY, "subj_name string, pred string, obj_name string"
        )
        back = parse_ntriples(to_ntriples(df))
        assert sorted(map(tuple, back.collect())) == sorted(NASTY)

    def test_framing_never_broken(self, spark):
        # every serialized line matches the frame exactly once
        df = spark.createDataFrame(
            NASTY, "subj_name string, pred string, obj_name string"
        )
        lines = [r.line for r in to_ntriples(df).collect()]
        import re

        frame = re.compile(
            r"^<urn:x-ent:[^>]*> <urn:x-rel:[^>]*> <urn:x-ent:[^>]*> \.$"
        )
        for ln in lines:
            assert frame.match(ln), ln
            assert ln.count(">") == 3 and ln.count("<") == 3, ln

    def test_file_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            NASTY, "subj_name string, pred string, obj_name string"
        )
        p = str(tmp_path / "nt")
        write_ntriples(df, p)
        back = read_ntriples(spark, p)
        assert sorted(map(tuple, back.collect())) == sorted(NASTY)


class TestParseContract:
    def test_comments_and_blanks_skipped(self, spark):
        lines = spark.createDataFrame(
            [
                ("# a comment",),
                ("",),
                ("   ",),
                ("<urn:x-ent:a> <urn:x-rel:p> <urn:x-ent:b> .",),
            ],
            "line string",
        )
        got = parse_ntriples(lines).collect()
        assert [tuple(r) for r in got] == [("a", "p", "b")]

    def test_invalid_line_errors_by_default(self, spark):
        lines = spark.createDataFrame(
            [("<urn:x-ent:a> <urn:x-rel:p> missing-dot",)], "line string"
        )
        with pytest.raises(Exception, match="invalid N-Triples line"):
            parse_ntriples(lines).collect()

    def test_invalid_line_drop_mode(self, spark):
        lines = spark.createDataFrame(
            [
                ('<urn:x-ent:a> <urn:x-rel:p> "a literal" .',),  # unmodeled
                ("<urn:x-ent:a> <urn:x-rel:p> <urn:x-ent:b> .",),
            ],
            "line string",
        )
        got = parse_ntriples(lines, on_invalid="drop").collect()
        assert [tuple(r) for r in got] == [("a", "p", "b")]

    def test_bad_mode_rejected(self, spark):
        df = spark.createDataFrame([("x",)], "line string")
        with pytest.raises(ValueError, match="on_invalid"):
            parse_ntriples(df, on_invalid="ignore")


class TestPlanShape:
    def test_serialize_parse_no_exchange(self, spark):
        """Both directions are narrow maps: no shuffle in the plan."""
        df = spark.createDataFrame(
            [("a", "p", "b")], "subj_name string, pred string, obj_name string"
        )
        plan = (
            parse_ntriples(to_ntriples(df))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
