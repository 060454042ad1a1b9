"""Streaming community maintenance: stream == batch over the
accumulated distinct-triple index, cross-epoch dedup (incl. NULL-safe
matching), replay idempotence."""

import glob
import os
import shutil

from context_aware_rag_spark.operators import communities
from context_aware_rag_spark.streaming.community_ingest import (
    community_microbatch,
    read_community_reports,
    read_distinct_triples,
    start_streaming_communities,
)

COLS = [
    "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type",
]
SCHEMA = (
    "conv_id: string, subj_name: string, subj_type: string, "
    "pred: string, obj_name: string, obj_type: string"
)
# clique {A, B, C}; the A-B edge is asserted in B0 AND (duplicate row)
# B1, plus a NULL-typed triple duplicated across epochs
B0 = [
    ("c1", "A", "P", "K", "B", "P"),
    ("c1", "A", "P", "K", "C", "P"),
    ("c1", "A", "P", "K", "D", None),
]
B1 = [
    ("c1", "A", "P", "K", "B", "P"),      # exact dup of a B0 row
    ("c1", "B", "P", "K", "C", "P"),
    ("c1", "A", "P", "K", "D", None),     # NULL-typed dup of a B0 row
    ("c2", "A", "P", "K", "B", "P"),      # new conv -> new distinct row
]


def _write_batches(spark, in_dir, batches):
    for i, rows in enumerate(batches):
        stage = os.path.join(in_dir, f"_stage{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(in_dir, f"b{i}.parquet"))
        shutil.rmtree(stage)


def test_stream_equals_batch(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("cm_in"))
    out_dir = str(tmp_path_factory.mktemp("cm_out"))
    ckpt = str(tmp_path_factory.mktemp("cm_ckpt"))
    _write_batches(spark, in_dir, [B0, B1])
    q = start_streaming_communities(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    # index = globally distinct triples: 5 (3 + the one new B1 conv +
    # B1's genuinely new B-C edge), not 7
    idx = [tuple(r) for r in read_distinct_triples(spark, out_dir).collect()]
    assert len(idx) == 5 and len(set(idx)) == 5

    batch_triples = spark.createDataFrame(B0 + B1, SCHEMA).dropDuplicates()
    b_nodes, b_edges = communities.entity_graph(batch_triples, min_count=1)
    want_reports = sorted(
        map(tuple, communities.community_reports(b_nodes, b_edges).collect())
    )
    reports, hierarchy = read_community_reports(
        spark, out_dir, min_count=1
    )
    assert sorted(map(tuple, reports.collect())) == want_reports
    assert {(r.node_id, r.community, r.parent)
            for r in hierarchy.collect()} == {
        (n, "A::P", "A::P")
        for n in ("A::P", "B::P", "C::P", "D::Entity")
    }

    # edge weights deduped across epochs: A-B asserted by 2 DISTINCT
    # rows (c1 + c2), never 3 (the exact dup must not count)
    _, edges2 = communities.entity_graph(
        read_distinct_triples(spark, out_dir), min_count=2
    )
    assert {(r.src, r.dst) for r in edges2.collect()} == {
        ("A::P", "B::P")
    }


def test_replay_idempotent(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("cm_replay"))
    b0 = spark.createDataFrame(B0, SCHEMA)
    b1 = spark.createDataFrame(B1, SCHEMA)
    community_microbatch(b0, out_dir, 0)
    community_microbatch(b1, out_dir, 1)
    before = sorted(
        tuple(r) for r in read_distinct_triples(spark, out_dir).collect()
    )
    # foreachBatch may replay an epoch: epoch 1 reruns against the same
    # strictly-prior index and rewrites the same rows
    community_microbatch(b1, out_dir, 1)
    after = sorted(
        tuple(r) for r in read_distinct_triples(spark, out_dir).collect()
    )
    assert before == after
