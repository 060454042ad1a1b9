"""Structural conversation dedup + entity timeline."""

import hashlib

from pyspark.sql import functions as F

from context_aware_rag_spark.operators import facts
from context_aware_rag_spark.operators.graphdedup import (
    conversation_fingerprints,
)


def _fp(keys):
    return hashlib.md5("\n".join(sorted(set(keys))).encode()).hexdigest()


class TestConversationFingerprints:
    def test_paraphrase_duplicates_detected(self, spark):
        # c1 and c3 assert the same fact set in different order /
        # with intra-conv repetition; c2 differs by one fact.
        rows = [
            ("c1", "vm", "hosted_on", "rack7"),
            ("c1", "db", "owned_by", "alice"),
            ("c1", "db", "owned_by", "alice"),  # repeated extraction
            ("c2", "vm", "hosted_on", "rack7"),
            ("c3", "db", "owned_by", "alice"),
            ("c3", "vm", "hosted_on", "rack7"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, subj_name string, pred string, obj_name string"
        )
        got = {
            r.conv_id: r.asDict()
            for r in conversation_fingerprints(df).collect()
        }
        assert got["c1"]["fingerprint"] == got["c3"]["fingerprint"]
        assert got["c1"]["fingerprint"] != got["c2"]["fingerprint"]
        assert got["c1"]["family_size"] == 2 and got["c1"]["is_struct_dup"]
        assert got["c2"]["family_size"] == 1 and not got["c2"]["is_struct_dup"]
        assert got["c1"]["n_facts"] == 2 and got["c2"]["n_facts"] == 1

    def test_fingerprint_matches_pure_python_md5(self, spark):
        rows = [
            ("c1", "a", "p", "b"),
            ("c1", "b", "q", "c"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, subj_name string, pred string, obj_name string"
        )
        [r] = conversation_fingerprints(df).collect()
        assert r.fingerprint == _fp(["a\tp\tb", "b\tq\tc"])

    def test_partitioning_invariance(self, spark):
        rows = [
            ("c%d" % (i % 7), "s%d" % (i % 11), "p%d" % (i % 3), "o%d" % (i % 5))
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, subj_name string, pred string, obj_name string"
        )
        a = sorted(map(tuple, conversation_fingerprints(df).collect()))
        b = sorted(
            map(tuple, conversation_fingerprints(df.repartition(13)).collect())
        )
        assert a == b


class TestEntityTimeline:
    def _mk(self, spark):
        triples = spark.createDataFrame(
            [
                ("c1", "k1", "vm", "hosted_on", "rack7"),
                ("c1", "k2", "vm", "hosted_on", "rack9"),
                ("c2", "k3", "alice", "owns", "vm"),
            ],
            "conv_id string, chunk_id string, subj_name string, "
            "pred string, obj_name string",
        )
        chunks = spark.createDataFrame(
            [("c1", "k1", 100), ("c1", "k2", 300), ("c2", "k3", 200)],
            "conv_id string, chunk_id string, ts long",
        )
        return triples, chunks

    def test_feed_order_and_roles(self, spark):
        triples, chunks = self._mk(spark)
        rows = [
            tuple(r)
            for r in facts.entity_timeline(triples, chunks)
            .where(F.col("entity") == "vm")
            .orderBy("seq")
            .collect()
        ]
        assert rows == [
            ("vm", 1, 100, "subj", "hosted_on", "rack7"),
            ("vm", 2, 200, "obj", "owns", "alice"),
            ("vm", 3, 300, "subj", "hosted_on", "rack9"),
        ]

    def test_last_k_keeps_true_seq(self, spark):
        triples, chunks = self._mk(spark)
        rows = [
            tuple(r)
            for r in facts.entity_timeline(triples, chunks, last_k=2)
            .where(F.col("entity") == "vm")
            .orderBy("seq")
            .collect()
        ]
        assert [r[1] for r in rows] == [2, 3]  # seq from FULL history

    def test_no_single_partition(self, spark):
        triples, chunks = self._mk(spark)
        plan = (
            facts.entity_timeline(triples, chunks, last_k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" not in plan, plan

    def test_last_k_validation(self, spark):
        import pytest

        triples, chunks = self._mk(spark)
        with pytest.raises(ValueError, match="last_k"):
            facts.entity_timeline(triples, chunks, last_k=0)
