"""Streaming SIMILAR-edge maintenance: stream == batch over the
concatenated chunk stream, NEW x ALL candidate discovery (each pair
scored in exactly one epoch), replay idempotence."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from context_aware_rag_spark.operators.similarity import (
    knn_similar_edges,
    with_text_embeddings,
)
from context_aware_rag_spark.streaming.knn_ingest import (
    knn_microbatch,
    read_candidates,
    read_similar_edges,
    start_streaming_knn,
)

# duplicate-text families spread ACROSS batches: edges must connect
# chunks first seen in different epochs
_FAMILIES = {
    "alpha": "the vm was migrated to rack seven yesterday evening",
    "beta": "alice owns the production database cluster",
    "gamma": "the billing service calls the ledger api",
}
_PLAN = [  # (batch, family, count)
    (0, "alpha", 3), (0, "beta", 2),
    (1, "alpha", 4), (1, "gamma", 2),
    (2, "alpha", 2), (2, "beta", 5), (2, "gamma", 1),
]


def _corpus(spark):
    rows, i = [], 0
    for b, fam, n in _PLAN:
        for _ in range(n):
            rows.append((b, f"c{i:03d}", _FAMILIES[fam]))
            i += 1
    df = spark.createDataFrame(rows, "batch int, chunk_id string, text string")
    return with_text_embeddings(df).select("batch", "chunk_id", "embedding")


def _edges(df):
    return {(r.src, r.dst, float(r.score)) for r in df.collect()}


def test_stream_equals_batch(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("knn_in"))
    out_dir = str(tmp_path_factory.mktemp("knn_out"))
    ckpt = str(tmp_path_factory.mktemp("knn_ckpt"))
    items = _corpus(spark).localCheckpoint()
    for b in range(3):
        stage = os.path.join(in_dir, f"_stage{b}")
        items.filter(F.col("batch") == b).select(
            "chunk_id", "embedding"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(in_dir, f"b{b}.parquet"))
        shutil.rmtree(stage)

    q = start_streaming_knn(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    batch_edges = knn_similar_edges(
        items.select("chunk_id", "embedding"), top_k=3, max_degree=4
    )
    stream_edges = read_similar_edges(spark, out_dir, top_k=3, max_degree=4)
    assert _edges(stream_edges) == _edges(batch_edges)
    assert stream_edges.count() > 0

    # each ordered candidate pair was discovered in exactly one epoch
    cand = read_candidates(spark, out_dir)
    assert cand.count() == cand.dropDuplicates(["src", "dst"]).count()


def test_replay_idempotence(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("knn_replay"))
    items = _corpus(spark).localCheckpoint()
    b0 = items.filter(F.col("batch") == 0).select("chunk_id", "embedding")
    b1 = items.filter(F.col("batch") == 1).select("chunk_id", "embedding")
    knn_microbatch(b0, out_dir, 0)
    knn_microbatch(b1, out_dir, 1)
    before = _edges(read_similar_edges(spark, out_dir))
    n_cand = read_candidates(spark, out_dir).count()
    # crash-after-write replay of epoch 1
    knn_microbatch(b1, out_dir, 1)
    assert _edges(read_similar_edges(spark, out_dir)) == before
    assert read_candidates(spark, out_dir).count() == n_cand
    # duplicate chunk ids re-sent in a LATER epoch are MERGE-dropped
    knn_microbatch(b1, out_dir, 2)
    assert read_candidates(spark, out_dir).count() == n_cand
    assert (
        spark.read.parquet(os.path.join(out_dir, "items_new", "epoch=2"))
        .count() == 0
    )


def test_read_side_plan_no_single_partition(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("knn_plan"))
    items = _corpus(spark)
    knn_microbatch(
        items.filter(F.col("batch") == 0).select("chunk_id", "embedding"),
        out_dir, 0,
    )
    df = read_similar_edges(spark, out_dir, max_degree=None)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
