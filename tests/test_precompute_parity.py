"""The precomputed oracle parquet must equal the Spark query outputs
BIT-FOR-BIT — stricter than the DuckDB canon comparison (which rounds
floats to 6 decimals): float payloads (similarity scores, IVF cosines,
MinHash estimates) are compared on their raw IEEE bytes. This is the
guarantee that makes the driver's value-hash gate safe regardless of
its float formatting.
"""

import os
import struct

import duckdb
import pytest

from context_aware_rag_spark.plans import entry_queries as eq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def _bits(v):
    return struct.pack("d", v) if isinstance(v, float) else v


def _table(name, cols):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {cols} FROM read_parquet('{eq._pq(name)}')"
    ).fetchall()
    return sorted(tuple(_bits(v) for v in r) for r in rows)


@pytest.mark.parametrize("name,cols", [
    ("minhash_near_dups", "a, b, est_jaccard"),
    ("kg_similar_chunk_edges", "src, dst, score"),
    ("ann_ivf_topk", "query_id, vec_id, cosine, rank"),
    ("ep3_compressed_context",
     "source, compressed_text, n_pieces_kept, best_piece_sim, compressed_length"),
])
def test_float_tables_bit_exact(spark, name, cols):
    # merged registry: driver-surface rotation moves entries between
    # QUERIES and EXTRA_QUERIES without changing their semantics
    registry = {**eq.EXTRA_QUERIES, **eq.QUERIES}
    sdf = registry[name](spark, SF_DIR)
    got = sorted(
        tuple(_bits(v) for v in r) for r in (tuple(r) for r in sdf.collect())
    )
    want = _table(name, cols)
    assert got == want
