"""Driver-contract query registry: Spark implementations + DuckDB oracles.

Every SURVEY.md §2 operator family is represented by a SQL-checkable
query: either over the driver's testdata tables (events / orders /
lineitem / documents / embeddings), or — for pandas-UDF-backed stages
ANSI SQL cannot express (chunking, extraction, canonicalization,
MinHash/SimHash) — against PRECOMPUTED pure-Python oracle parquet
(oracle/precompute.py, snapshotted by tools/gen_oracle_data.py and
verified bit-exact in tests). ALL 50 driver
queries are SQL-checked.

Column names are aliased identically on both sides; floats are rounded
identically on both sides (the driver hash is exact).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import (
    ann,
    bm25,
    dedup,
    lm,
    multimodal,
    sampling,
    similarity,
    textmetrics,
)
from ..plans.pipeline import run_pipeline
from ..sources.transcripts import generate_transcripts

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

# Secondary registry: queries NOT exported to the driver (it runs at
# most 50 registered queries, in registration order — CORRECTNESS_r02
# recorded exactly the first 50 of 59). Demoted here are redundant
# variants whose operator already has a primary driver row; they stay
# fully swept by tests/test_entry_contract.py.
EXTRA_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA_ORACLES: Dict[str, str] = {}

# Precomputed pure-Python oracle tables (oracle/precompute.py — the
# independent reference-semantics implementation snapshotted to
# parquet by tools/gen_oracle_data.py). The snapshot scale defaults to
# sf0.01 — the driver's correctness scale per contract — and is
# selectable via SPARK_GRAFT_ORACLE_SF for local sweeps at other
# scales (generate the matching snapshot first). A missing snapshot
# fails HERE with instructions instead of surfacing later as an opaque
# oracle hash mismatch against the wrong-scale parquet.
ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "0.01")
ORACLE_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "oracle_data",
    f"sf{ORACLE_SF}",
)


def _pq(name: str) -> str:
    path = os.path.join(ORACLE_DATA, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"precomputed oracle snapshot missing: {path} — run "
            f"`python tools/gen_oracle_data.py /root/testdata/sf{ORACLE_SF}` "
            "(or unset SPARK_GRAFT_ORACLE_SF to use the committed sf0.01 "
            "snapshots). Snapshot-backed oracles are only valid when the "
            "correctness run's sf_dir matches this scale."
        )
    return path


def _fresh(name: str) -> None:
    # a duplicate registration would SILENTLY overwrite the earlier
    # query (and, worse, could pair one leg's Spark plan with the
    # other's oracle) — fail at import time instead
    if name in QUERIES or name in EXTRA_QUERIES:
        raise ValueError(f"duplicate query registration: {name!r}")


def q(name: str, oracle: str | None = None):
    def reg(fn):
        _fresh(name)
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


def xq(name: str, oracle: str | None = None):
    def reg(fn):
        _fresh(name)
        EXTRA_QUERIES[name] = fn
        if oracle is not None:
            EXTRA_ORACLES[name] = oracle
        return fn
    return reg


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def n_convs_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(6, int(1200 * sf))


def transcripts_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generate_transcripts(spark, n_convs_for(sf_dir))


# =========================================================================
# TPC-H-style relational core (scan/filter/agg/join pushdown showcase)
# =========================================================================

@q(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@xq(
    "tpch_q3_top10",
    """
    SELECT o.o_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_top10(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # (r6 note: an orders-first join reorder was tried and measured
    # SLOWER at bench scale — the lineitem shuffle is cheap there and
    # the reorder only added a step; reverted to the r5 shape.)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@q(
    "j1_revenue_per_nation",
    """
    SELECT n.n_name AS nation,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j1_revenue_per_nation(spark, sf_dir):
    # J1 shape: fact joins broadcast dims (customer, nation are tiny)
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@xq(
    "j7_customers_without_orders",
    """
    SELECT c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j7_customers_without_orders(spark, sf_dir):
    # J7 orphan anti-join (reference delete path, constants.py:406-443)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# =========================================================================
# Reference filters / scalar functions (F1, F8, F9, C2)
# =========================================================================

@q(
    "f1_empty_doc_filter",
    "SELECT doc_id, n_chars FROM documents WHERE text <> '.' AND length(text) > 0",
)
def f1_empty_doc_filter(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.filter((F.col("text") != ".") & (F.length("text") > 0)).select(
        "doc_id", "n_chars"
    )


@xq(
    "f8_lucene_scrub",
    """
    SELECT doc_id,
           trim(translate(text, '+-&|!(){}[]^"~*?:\\/',
                          '                   ')) AS scrubbed
    FROM documents WHERE doc_id < 100
    """,
)
def f8_lucene_scrub(spark, sf_dir):
    from ..functions.text import remove_lucene_chars

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", remove_lucene_chars(F.col("text")).alias("scrubbed"))


@q(
    "f9_think_scrub",
    r"""
    SELECT doc_id,
           regexp_replace(text, '(?s)<think>.*?</think>', '', 'g') AS cleaned
    FROM documents WHERE doc_id < 100
    """,
)
def f9_think_scrub(spark, sf_dir):
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_replace("text", r"(?s)<think>.*?</think>", "").alias("cleaned"),
    )


@q(
    "c2_timestamp_prefix",
    """
    SELECT event_id,
           printf('<%.2f> <%.2f> %s', value, value + 5.0, event_type) AS prefixed
    FROM events WHERE event_id < 500
    """,
)
def c2_timestamp_prefix(spark, sf_dir):
    from ..functions.text import timestamp_prefix

    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        timestamp_prefix(
            F.col("event_type"), F.col("value"), F.col("value") + 5.0
        ).alias("prefixed"),
    )


# =========================================================================
# Window operators (W2/W3/W4/W5) over events
# =========================================================================

@q(
    "w2_event_linking",
    """
    SELECT user_id, event_id,
           lag(event_id) OVER w AS prev_event_id,
           (row_number() OVER w = 1) AS is_first
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_event_linking(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (F.row_number().over(w) == 1).alias("is_first"),
    )


@xq(
    "w3_running_offset",
    """
    SELECT user_id, event_id,
           row_number() OVER w AS position,
           coalesce(sum(length(event_type)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS content_offset
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w3_running_offset(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("position"),
        F.coalesce(
            F.sum(F.length("event_type")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("content_offset"),
    )


@q(
    "w4_global_index",
    """
    SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS doc_index
    FROM events WHERE event_type = 'error'
    """,
)
def w4_global_index(spark, sf_dir):
    # two-phase rank (range partition + local id + prefix offsets) —
    # value-identical to row_number() OVER (ORDER BY ts, event_id) but
    # with no Exchange SinglePartition (operators/skew.py:global_index)
    from ..operators.skew import global_index

    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    return global_index(e, ["ts", "event_id"]).select("event_id", "doc_index")


@q(
    "w5_topk_per_user",
    """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events) t WHERE rn <= 3
    """,
)
def w5_topk_per_user(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )


# =========================================================================
# Aggregations (A1/A2/A4/A7/A9, O2)
# =========================================================================

@q(
    "a1_ordered_concat",
    """
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS concat_types
    FROM events WHERE user_id < 10 GROUP BY user_id
    """,
)
def a1_ordered_concat(spark, sf_dir):
    # A1 batch assembly: order-stable concat via sort_array of structs
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("concat_types")
    )


@xq(
    "a2_time_bounds",
    """
    SELECT user_id,
           round(epoch(min(ts)), 6) AS ts_min,
           round(epoch(max(ts)), 6) AS ts_max,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def a2_time_bounds(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    # parquet ts is TIMESTAMP_NTZ; go through timestamp (session TZ = UTC)
    epoch = F.col("ts").cast("timestamp").cast("double")
    return e.groupBy("user_id").agg(
        F.round(F.min(epoch), 6).alias("ts_min"),
        F.round(F.max(epoch), 6).alias("ts_max"),
        F.count(F.lit(1)).alias("n_events"),
    )


@q(
    "a4_entity_frequency",
    """
    SELECT event_type, count(*) AS n_chunks
    FROM events GROUP BY event_type
    ORDER BY n_chunks DESC, event_type ASC LIMIT 40
    """,
)
def a4_entity_frequency(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .orderBy(F.desc("n_chunks"), F.asc("event_type"))
        .limit(40)
    )


@xq(
    "a7_last_event_per_user",
    """
    SELECT user_id, event_id AS last_event_id, value AS last_value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t WHERE rn = 1
    """,
)
def a7_last_event_per_user(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
    )


@xq(
    "a9_distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def a9_distinct_users_per_type(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@xq(
    "o2_order_limit",
    """
    SELECT event_id, value FROM events
    ORDER BY value DESC, event_id ASC LIMIT 100
    """,
)
def o2_order_limit(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.orderBy(F.desc("value"), F.asc("event_id")).limit(100).select(
        "event_id", "value"
    )


@xq(
    "word_explode_topk",
    """
    SELECT word, count(*) AS n FROM (
      SELECT unnest(string_split(lower(trim(text)), ' ')) AS word
      FROM documents) t
    WHERE word <> '' GROUP BY word ORDER BY n DESC, word ASC LIMIT 50
    """,
)
def word_explode_topk(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower(F.trim("text")), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


# =========================================================================
# Training-data ops: dedup / text metrics / ANN
# =========================================================================

@xq(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_docs
    FROM documents GROUP BY md5(text) HAVING count(*) > 1
    """,
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(load(spark, sf_dir, "documents"))


# unicode-aware like dedup.normalized_text: letters/digits of any script
# survive (RE2 and Java regex agree on \p{L}/\p{N})
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@q(
    "dedup_exact_normalized",
    f"""
    SELECT md5({_NORM_SQL}) AS text_hash, min(doc_id) AS keep_id,
           count(*) AS n_docs
    FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
)
def dedup_exact_normalized(spark, sf_dir):
    return dedup.exact_duplicates_normalized(load(spark, sf_dir, "documents"))


@xq(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT a, b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = a
    JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    # relies on the default df_cap (skew guard ON); the exact-uncapped
    # SQL twin is equivalent because df <= n_docs < DEFAULT_DF_CAP at
    # every correctness scale, so the cap cannot bind
    return dedup.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.5, n=3
    )


@xq(
    "ngram_jaccard_capped",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
    ),
    inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    rare AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) <= 20),
    inv AS (SELECT doc_id, shingle FROM inv0 WHERE shingle IN (SELECT shingle FROM rare)),
    sz AS (SELECT doc_id, count(*) AS sz FROM inv GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT a, b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = a
    JOIN sz sb ON sb.doc_id = b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    """,
)
def ngram_jaccard_capped(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.5, n=3, df_cap=20
    )


@xq(
    "ngram_containment",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(words[5:20], ' ') AS text
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
      WHERE doc_id % 7 = 0 AND len(words) >= 24
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM corpus)
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT a, b,
           CASE WHEN sa.sz <= sb.sz THEN a ELSE b END AS contained,
           (inter * 1000000) // least(sa.sz, sb.sz) AS containment_ppm
    FROM inter
    JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = a
    JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = b
    WHERE (inter * 1000000) // least(sa.sz, sb.sz) >= 900000
    """,
)
def ngram_containment_q(spark, sf_dir):
    """Asymmetric containment near-dup (Broder 1997): a quote wholly
    embedded in a longer host scores 1.0 here while its symmetric
    Jaccard tends to 0. Contained snippets are PLANTED (every 7th
    sufficiently long doc contributes a 16-word verbatim excerpt as a
    new 'quote' doc), so the pair set provably includes rows the
    Jaccard operator would miss; the DuckDB twin replicates the
    planting and the exact integer-ppm score. Relies on the default
    df_cap (cannot bind: df <= n_docs < DEFAULT_DF_CAP at correctness
    scales, the ngram_jaccard_pairs argument)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(dedup.normalized_text(F.col("text")), " ")
    quotes = (
        load(spark, sf_dir, "documents")
        .select("doc_id", words.alias("words"))
        .filter((F.col("doc_id") % 7 == 0) & (F.size("words") >= 24))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat_ws(" ", F.slice("words", 5, 16)).alias("text"),
        )
    )
    return dedup.ngram_containment_pairs(
        docs.unionByName(quotes), threshold=0.9, n=3
    )


@xq(
    "token_count",
    """
    SELECT doc_id,
           len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_words,
           length(text) AS n_chars,
           CAST(floor(length(text) / 4) AS INT) AS approx_bpe_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
             AS regex_tokens
    FROM documents
    """,
)
def token_count(spark, sf_dir):
    return textmetrics.token_counts(load(spark, sf_dir, "documents"))


@q(
    "token_count_bpe",
    f"""
    SELECT doc_id, bpe_tokens FROM read_parquet('{_pq("token_count_bpe")}')
    """,
)
def token_count_bpe(spark, sf_dir):
    """REAL byte-level BPE token counts (functions/bpe.py, vendored
    merge table — VERDICT r2 item 5). The DuckDB twin is a precomputed
    oracle parquet produced by the same pure-Python tokenizer run
    directly over the parquet (tools/gen_oracle_data.py)."""
    return textmetrics.token_counts_bpe(load(spark, sf_dir, "documents"))


@xq(
    "bpe_pair_counts",
    r"""
    WITH pieces AS (
      SELECT piece, count(*) AS freq FROM (
        SELECT unnest(regexp_extract_all(
                 text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS piece
        FROM documents) GROUP BY piece
    ),
    ap AS (
      SELECT piece, freq FROM pieces
      WHERE regexp_matches(piece, '^[ -~]+$') AND length(piece) >= 2
    ),
    pairs AS (
      SELECT substring(piece, i, 1) AS a,
             substring(piece, i + 1, 1) AS b, freq
      FROM (SELECT piece, freq,
                   unnest(range(1, length(piece))) AS i FROM ap)
    )
    SELECT a, b, sum(freq)::BIGINT AS n
    FROM pairs GROUP BY a, b
    ORDER BY n DESC, a DESC, b DESC LIMIT 30
    """,
)
def bpe_pair_counts_q(spark, sf_dir):
    """The distributed BPE trainer's first-iteration pair-count
    aggregation (operators/bpe_train.py) over the documents corpus:
    top-30 adjacent byte pairs by weighted frequency, the exact
    statistic the first merge election reads. ASCII pieces only so the
    char-level DuckDB twin equals byte-level counting; tie-break
    mirrors the trainer's (count DESC, pair bytes DESC)."""
    from ..operators import bpe_train

    words = bpe_train.word_frequencies(
        load(spark, sf_dir, "documents")
    ).filter(F.col("piece").rlike("^[ -~]+$"))
    counts = bpe_train.pair_counts(bpe_train.initial_symbols(words))
    return (
        counts.select(
            F.decode("a", "UTF-8").alias("a"),
            F.decode("b", "UTF-8").alias("b"),
            "n",
        )
        .orderBy(F.desc("n"), F.desc("a"), F.desc("b"))
        .limit(30)
    )


@xq(
    "pack_sequences_bins",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
               AS tok
      FROM documents),
    c AS (
      SELECT doc_id,
             coalesce(sum(tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM t)
    SELECT doc_id, cum_before,
           (cum_before // 512)::BIGINT AS bin_id,
           (cum_before % 512)::BIGINT AS bin_offset
    FROM c
    """,
)
def pack_sequences_bins(spark, sf_dir):
    """Sequence packing (concat-and-chunk layout for training examples)
    over the regex token counts, 512-token bins — two-phase distributed
    prefix sum (operators/packing.py), no Exchange SinglePartition; the
    DuckDB twin is the naive global window cumsum."""
    from ..operators.packing import pack_sequences

    toks = textmetrics.token_counts(load(spark, sf_dir, "documents")).select(
        "doc_id", F.col("regex_tokens").alias("n_tokens")
    )
    packed = pack_sequences(toks, max_tokens=512, token_col="n_tokens")
    return packed.select("doc_id", "cum_before", "bin_id", "bin_offset")


@xq(
    "shared_span_pairs",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents),
    spans AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(0, greatest(len(words) - 8, 0) + 1, 4),
               i -> array_to_string(words[i+1:i+8], ' ')))) AS span
      FROM w),
    rare AS (SELECT span FROM spans GROUP BY span HAVING count(*) <= 1000),
    inv AS (SELECT doc_id, span FROM spans
            WHERE span IN (SELECT span FROM rare))
    SELECT l.doc_id AS a, r.doc_id AS b, count(*)::BIGINT AS shared_spans
    FROM inv l JOIN inv r ON l.span = r.span AND l.doc_id < r.doc_id
    GROUP BY 1, 2
    """,
)
def shared_span_pairs(spark, sf_dir):
    """Substring-level duplication signal (Lee et al. 2022 span dedup,
    over the winnowing fingerprints): pairs sharing duplicated 8-word
    spans. The twin counts shared distinct span STRINGS — identical to
    shared hashes on this corpus (same injectivity argument as
    doc_fingerprints)."""
    return dedup.shared_span_pairs(load(spark, sf_dir, "documents"))


@xq(
    "remove_shared_spans",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents),
    occ0 AS (SELECT doc_id, words,
                    unnest(range(0, greatest(len(words) - 8, 0) + 1, 4)) AS start
             FROM w),
    occ AS (SELECT doc_id, start,
                   array_to_string(words[start+1:start+8], ' ') AS span
            FROM occ0),
    ranked AS (SELECT doc_id, start,
                      row_number() OVER (PARTITION BY span
                                         ORDER BY doc_id, start) AS rn,
                      count(*) OVER (PARTITION BY span) AS cnt
               FROM occ),
    cuts AS (SELECT doc_id, start FROM ranked WHERE cnt >= 2 AND rn > 1),
    widx AS (SELECT doc_id, unnest(words) AS word,
                    unnest(range(0, len(words))) AS i
             FROM w),
    kept AS (SELECT wi.doc_id, wi.word, wi.i FROM widx wi
             WHERE NOT EXISTS (SELECT 1 FROM cuts c
                               WHERE c.doc_id = wi.doc_id
                                 AND wi.i >= c.start AND wi.i < c.start + 8)),
    agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS cleaned_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id),
    ncuts AS (SELECT doc_id, count(*) AS n_spans_cut FROM cuts GROUP BY doc_id)
    SELECT w.doc_id,
           coalesce(a.cleaned_text, '') AS cleaned_text,
           coalesce(n.n_spans_cut, 0)::BIGINT AS n_spans_cut,
           (len(w.words) - coalesce(a.n_kept, 0))::BIGINT AS n_words_removed
    FROM w LEFT JOIN agg a USING (doc_id) LEFT JOIN ncuts n USING (doc_id)
    """,
)
def remove_shared_spans_q(spark, sf_dir):
    """Span REMOVAL (Lee et al. 2022 §3) — duplicated 8-word windows cut
    from all but the first global occurrence; CLEANED TEXT ITSELF is
    hash-checked (the pii_scrub pattern), plus cut/removed counts."""
    return dedup.remove_shared_spans(load(spark, sf_dir, "documents"))


_STOPS_SQL = "(" + ",".join(f"'{w}'" for w in textmetrics.EN_STOPWORDS) + ")"


@q(
    "quality_scores",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS words,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
               AS n_punct
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(words) AS n_words,
             length(regexp_replace(text, '\\s+', '', 'g'))
               / greatest(len(words), 1) AS mean_word_len,
             n_punct / greatest(n_chars, 1) AS punct_ratio,
             len(list_filter(words, w -> w IN {_STOPS_SQL}))
               / greatest(len(words), 1) AS stop_ratio
      FROM base
    )
    SELECT doc_id, n_words,
           round(mean_word_len, 4) AS mean_word_len,
           round(punct_ratio, 4) AS punct_ratio,
           round(stop_ratio, 4) AS stop_ratio,
           round((
             (CASE WHEN n_words BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
           + (CASE WHEN stop_ratio >= 0.01 THEN 0.1 ELSE 0.0 END))::DOUBLE, 2)
             AS quality_score
    FROM m
    """,
)
def quality_scores(spark, sf_dir):
    return textmetrics.quality_scores(load(spark, sf_dir, "documents"))


@q(
    "language_id",
    f"""
    SELECT doc_id,
           round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                 w -> w IN {_STOPS_SQL}))
                 / greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1),
                 4) AS en_stop_ratio,
           CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                     w -> w IN {_STOPS_SQL}))
                     / greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1)
                     >= 0.08
                THEN 'en' ELSE 'unknown' END AS lang_pred
    FROM documents
    """,
)
def language_id(spark, sf_dir):
    return textmetrics.language_id(load(spark, sf_dir, "documents"))


_TRI_EN = "' th','the','he ','ing','ng ','and','nd ',' an','ed ',' of','of ','ion'"
_TRI_FR = "' de','de ','es ','le ',' le','ent','nt ','que',' qu','la ',' la','ais'"
_TRI_DE = "'en ','er ',' de','der','ie ','die','ch ','ein',' ei','ung','ng ','sch'"


@xq(
    "language_id_ngram",
    f"""
    WITH t AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'),
                            ' +', ' ', 'g') AS s
      FROM documents),
    tri AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(s) - 2, 1) + 1),
                            i -> s[i:i+2]) AS tg
      FROM t),
    sc AS (
      SELECT doc_id,
             len(list_filter(tg, x -> x IN ({_TRI_EN})))
                 / greatest(len(tg), 1) AS raw_en,
             len(list_filter(tg, x -> x IN ({_TRI_FR})))
                 / greatest(len(tg), 1) AS raw_fr,
             len(list_filter(tg, x -> x IN ({_TRI_DE})))
                 / greatest(len(tg), 1) AS raw_de
      FROM tri)
    SELECT doc_id,
           round(raw_en, 6) AS score_en,
           round(raw_fr, 6) AS score_fr,
           round(raw_de, 6) AS score_de,
           CASE WHEN greatest(raw_en, raw_fr, raw_de) < 0.05 THEN 'unknown'
                WHEN raw_en = greatest(raw_en, raw_fr, raw_de) THEN 'en'
                WHEN raw_fr = greatest(raw_en, raw_fr, raw_de) THEN 'fr'
                ELSE 'de' END AS lang_pred
    FROM sc
    """,
)
def language_id_ngram(spark, sf_dir):
    return textmetrics.language_id_ngram(load(spark, sf_dir, "documents"))


@q(
    "doc_fingerprints",
    """
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\\s+') AS words
               FROM documents),
    spans AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(words) - 8, 0) + 1, 4),
               i -> array_to_string(words[i+1:i+8], ' '))) AS sp
      FROM w)
    SELECT doc_id, len(sp)::BIGINT AS n_fingerprints FROM spans
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Winnowing fingerprint cardinality, SQL-checked: xxhash64 itself
    is not expressible in DuckDB, but distinct-hash count == distinct-
    span count (hash is deterministic and injective on this corpus), so
    the oracle counts distinct span STRINGS."""
    fp = textmetrics.rolling_fingerprints(load(spark, sf_dir, "documents"))
    return fp.select("doc_id", F.col("n_fingerprints").cast("long"))


@xq(
    "repetition_signals",
    """
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\\s+') AS words
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(words)),
                                       i -> words[i] || ' ' || words[i+1])) AS gram
          FROM w WHERE len(words) >= 2),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
    SELECT doc_id,
           sum(cnt)::BIGINT AS n_grams,
           round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / sum(cnt), 6)
             AS dup_gram_frac,
           round(max(cnt) / sum(cnt), 6) AS top_gram_frac
    FROM c GROUP BY doc_id
    """,
)
def repetition_signals(spark, sf_dir):
    """Gopher repetition filters (duplicate / top word-bigram char-free
    fractions) — training-data culling signal over documents."""
    return textmetrics.repetition_signals(load(spark, sf_dir, "documents"))


# PII is planted deterministically from doc_id in BOTH twins so the
# scrub demonstrably rewrites text (the synthetic corpus itself has no
# emails/phones/IPs); patterns are interpolated from the shared module
# constants so the two sides can never drift.
_PII_PLANT_SQL = (
    "SELECT doc_id, text || ' contact u' || doc_id::VARCHAR"
    " || '@example.com tel 415-555-'"
    " || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    " || ' ip 10.0.' || (doc_id % 256)::VARCHAR || '.7' AS text"
    " FROM documents"
)


@xq(
    "pii_scrub",
    "WITH planted AS (" + _PII_PLANT_SQL + ")\n"
    "SELECT doc_id,\n"
    "  len(regexp_extract_all(text, '" + textmetrics.PII_EMAIL_RE + "'))::BIGINT AS n_emails,\n"
    "  len(regexp_extract_all(text, '" + textmetrics.PII_PHONE_RE + "'))::BIGINT AS n_phones,\n"
    "  len(regexp_extract_all(text, '" + textmetrics.PII_IP_RE + "'))::BIGINT AS n_ips,\n"
    "  regexp_replace(regexp_replace(regexp_replace(text,\n"
    "      '" + textmetrics.PII_EMAIL_RE + "', '<EMAIL>', 'g'),\n"
    "      '" + textmetrics.PII_PHONE_RE + "', '<PHONE>', 'g'),\n"
    "      '" + textmetrics.PII_IP_RE + "', '<IP>', 'g') AS scrubbed\n"
    "FROM planted",
)
def pii_scrub(spark, sf_dir):
    """C4/Dolma-style PII redaction over documents with deterministic
    planted PII (email + phone + IPv4 derived from doc_id); the twin
    plants identically and scrubs with the same RE2∩Java patterns."""
    planted = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 415-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return textmetrics.pii_scrub(planted)


@xq(
    "dedup_clusters",
    f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    p AS (
      SELECT a, b
      FROM inter
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = a
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = b
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    ),
    edges AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    lab AS (SELECT d.doc_id,
                   coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
                   length(d.text) AS l
            FROM documents d LEFT JOIN cc ON cc.node = d.doc_id)
    SELECT doc_id, cluster_id,
           (row_number() OVER (PARTITION BY cluster_id
                               ORDER BY l DESC, doc_id ASC)) = 1 AS is_keeper
    FROM lab
    """,
)
def dedup_clusters_q(spark, sf_dir):
    """Duplicate-family clustering: connected components over the
    n-gram-Jaccard near-dup pairs, one keeper per family (longest text,
    ties -> smallest id); the twin recomputes the closure with a
    recursive min-label CTE."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    return dedup.dedup_clusters(docs, pairs)


@xq(
    "dedup_clusters_quality",
    f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    p AS (
      SELECT a, b
      FROM inter
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = a
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = b
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    ),
    edges AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    qm AS (
      SELECT doc_id,
             len(words) AS n_words,
             length(regexp_replace(text, '\\s+', '', 'g'))
               / greatest(len(words), 1) AS mean_word_len,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / greatest(length(text), 1) AS punct_ratio,
             len(list_filter(words, w -> w IN {_STOPS_SQL}))
               / greatest(len(words), 1) AS stop_ratio
      FROM (SELECT doc_id, text,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM documents)
    ),
    qual AS (
      SELECT doc_id, round((
               (CASE WHEN n_words BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN stop_ratio >= 0.01 THEN 0.1 ELSE 0.0 END))::DOUBLE,
             2) AS qs
      FROM qm
    ),
    lab AS (SELECT d.doc_id,
                   coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
                   q.qs
            FROM documents d
            LEFT JOIN cc ON cc.node = d.doc_id
            JOIN qual q ON q.doc_id = d.doc_id)
    SELECT doc_id, cluster_id,
           (row_number() OVER (PARTITION BY cluster_id
                               ORDER BY qs DESC, doc_id ASC)) = 1 AS is_keeper
    FROM lab
    """,
)
def dedup_clusters_quality_q(spark, sf_dir):
    """Quality-aware keeper election (VERDICT r3 item 5): same duplicate
    families, keeper = highest textmetrics quality composite (ties ->
    smallest id) — curation keeps the BEST member, not the longest."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    return dedup.dedup_clusters(
        docs, pairs,
        keeper_score=F.round(textmetrics.quality_score_col("text"), 2),
    )


# Line structure is planted deterministically from doc_id in BOTH twins
# (the synthetic corpus is single-line): one keepable sentence, one
# too-short line, one javascript line, and — for doc_id % 7 == 0 /
# % 11 == 0 — a lorem-ipsum / curly-brace page-kill line.
_C4_PLANT_SQL = (
    "SELECT doc_id, text"
    " || chr(10) || 'Document ' || doc_id::VARCHAR || ' has useful content here.'"
    " || chr(10) || 'Too short.'"
    " || chr(10) || 'please enable javascript to view.'"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'config { x }' ELSE '' END"
    " AS text FROM documents"
)


@xq(
    "c4_line_filter",
    "WITH planted AS (" + _C4_PLANT_SQL + "),\n"
    r"""
    l AS (SELECT doc_id, text,
                 list_transform(string_split(text, chr(10)), x -> trim(x)) AS lines
          FROM planted),
    k AS (SELECT doc_id, text, lines,
                 list_filter(lines, x ->
                   regexp_matches(x, '[.!?"]$')
                   AND len(regexp_split_to_array(x, '\s+')) >= 3
                   AND NOT contains(lower(x), 'javascript')) AS kept
          FROM l)
    SELECT doc_id,
           len(lines)::BIGINT AS n_lines,
           len(kept)::BIGINT AS n_kept,
           array_to_string(kept, chr(10)) AS cleaned
    FROM k
    WHERE NOT contains(lower(text), 'lorem ipsum')
      AND NOT contains(text, '{')
      AND NOT contains(text, '}')
      AND len(kept) >= 1
    """,
)
def c4_line_filter_q(spark, sf_dir):
    """C4 line-level cleaning over documents with deterministically
    planted line structure; the twin plants identically and applies the
    same keep/kill rules with DuckDB list functions."""
    planted = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nDocument "),
            F.col("doc_id").cast("string"),
            F.lit(" has useful content here."),
            F.lit("\nToo short."),
            F.lit("\nplease enable javascript to view."),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("\nlorem ipsum dolor sit amet.")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit("\nconfig { x }")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return textmetrics.c4_line_filter(planted)


@xq(
    "dedup_paragraphs",
    f"""
    WITH planted AS ({_C4_PLANT_SQL}),
    p0 AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM planted),
    paras AS (SELECT doc_id, unnest(parts) AS para,
                     unnest(range(0, len(parts))) AS idx
              FROM p0),
    rk AS (SELECT doc_id, idx,
                  row_number() OVER (PARTITION BY para
                                     ORDER BY doc_id, idx) AS rn,
                  count(*) OVER (PARTITION BY para) AS cnt
           FROM paras WHERE length(para) >= 1),
    drops AS (SELECT doc_id, idx FROM rk WHERE cnt >= 2 AND rn > 1),
    marked AS (
      SELECT p.doc_id, p.idx, p.para,
             EXISTS (SELECT 1 FROM drops d
                     WHERE d.doc_id = p.doc_id AND d.idx = p.idx) AS dropped
      FROM paras p)
    SELECT doc_id,
           string_agg(para, chr(10) ORDER BY idx)
             FILTER (WHERE NOT dropped) AS cleaned_text,
           count(*)::BIGINT AS n_paras,
           sum(dropped::INT)::BIGINT AS n_paras_removed
    FROM marked GROUP BY doc_id
    """,
)
def dedup_paragraphs_q(spark, sf_dir):
    """Exact paragraph dedup (C4/Lee et al. line pass) over the planted
    multi-line corpus: boilerplate lines ('Too short.', the javascript
    notice, lorem every 7th doc) survive only in their first global
    occurrence; the CLEANED text itself is hash-checked."""
    planted = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nDocument "),
            F.col("doc_id").cast("string"),
            F.lit(" has useful content here."),
            F.lit("\nToo short."),
            F.lit("\nplease enable javascript to view."),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("\nlorem ipsum dolor sit amet.")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit("\nconfig { x }")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup.dedup_exact_paragraphs(planted)


@xq(
    "decontaminate",
    f"""
    WITH norm AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
                  FROM documents),
    bench AS (SELECT DISTINCT array_to_string(words[5:12], ' ') AS gram
              FROM norm WHERE doc_id % 10 = 0 AND len(words) >= 12),
    g AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(words) >= 8
                   THEN list_transform(range(1, len(words) - 6),
                        i -> array_to_string(words[i:i+7], ' '))
                   ELSE [] END) AS grams
          FROM norm),
    dg AS (SELECT doc_id, unnest(grams) AS gram FROM g)
    SELECT doc_id, count(*)::BIGINT AS n_contaminated_grams
    FROM dg JOIN bench USING (gram)
    GROUP BY doc_id
    """,
)
def decontaminate_q(spark, sf_dir):
    """Eval-set decontamination with a benchmark planted from the corpus
    itself (words 5-12 of every 10th doc as one 8-gram "eval question");
    the twin plants and shingles identically, so both sides must flag
    the same docs with the same distinct-gram counts."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(dedup.normalized_text(F.col("text")), " ")
    bench = (
        docs.filter((F.col("doc_id") % 10 == 0) & (F.size(words) >= 12))
        .select(F.concat_ws(" ", F.slice(words, 5, 8)).alias("text"))
    )
    return dedup.decontaminate(docs, bench, n=8)


@xq(
    "decontaminate_multi",
    f"""
    WITH norm AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
                  FROM documents),
    plants AS (
        SELECT words[5:12] AS pw
        FROM norm WHERE doc_id % 10 = 0 AND len(words) >= 12
        UNION ALL
        SELECT words[3:15] AS pw
        FROM norm WHERE doc_id % 15 = 0 AND len(words) >= 15),
    bench AS (
      SELECT DISTINCT unnest(
        (CASE WHEN len(pw) >= 8
          THEN list_transform(range(1, len(pw) - 6),
               i -> array_to_string(pw[i:i+7], ' '))
          ELSE [] END)
        ||
        (CASE WHEN len(pw) >= 13
          THEN list_transform(range(1, len(pw) - 11),
               i -> array_to_string(pw[i:i+12], ' '))
          ELSE [] END)) AS gram
      FROM plants),
    g AS (SELECT doc_id,
                 list_distinct(
                   (CASE WHEN len(words) >= 8
                     THEN list_transform(range(1, len(words) - 6),
                          i -> array_to_string(words[i:i+7], ' '))
                     ELSE [] END)
                   ||
                   (CASE WHEN len(words) >= 13
                     THEN list_transform(range(1, len(words) - 11),
                          i -> array_to_string(words[i:i+12], ' '))
                     ELSE [] END)) AS grams
          FROM norm),
    dg AS (SELECT doc_id, unnest(grams) AS gram FROM g)
    SELECT doc_id, count(*)::BIGINT AS n_contaminated_grams
    FROM dg JOIN bench USING (gram)
    GROUP BY doc_id
    """,
)
def decontaminate_multi_q(spark, sf_dir):
    """Brown et al. use 8-13-gram collisions: decontamination at
    n=(8,13) with contamination planted at BOTH sizes (words 5-12 of
    every 10th doc; words 3-15 of every 15th doc). Per-size flags OR
    together; counts sum distinct shared grams across sizes."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(dedup.normalized_text(F.col("text")), " ")
    bench8 = (
        docs.filter((F.col("doc_id") % 10 == 0) & (F.size(words) >= 12))
        .select(F.concat_ws(" ", F.slice(words, 5, 8)).alias("text"))
    )
    bench13 = (
        docs.filter((F.col("doc_id") % 15 == 0) & (F.size(words) >= 15))
        .select(F.concat_ws(" ", F.slice(words, 3, 13)).alias("text"))
    )
    return dedup.decontaminate(docs, bench8.unionByName(bench13), n=(8, 13))


@xq(
    "deterministic_split",
    """
    SELECT doc_id,
           CASE WHEN md5(doc_id::VARCHAR) < 'cc' THEN 'train'
                WHEN md5(doc_id::VARCHAR) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def deterministic_split_q(spark, sf_dir):
    """Stable train/val/test assignment from md5(doc_id) — Spark and
    DuckDB compute the identical lowercase hex, so the twin re-derives
    every assignment exactly."""
    return sampling.deterministic_split(
        load(spark, sf_dir, "documents").select("doc_id")
    )


@xq(
    "hash_sample",
    "SELECT doc_id FROM documents ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 50",
)
def hash_sample_q(spark, sf_dir):
    """Deterministic 50-row uniform sample: smallest md5(doc_id) values;
    reproducible across engines, planned as TakeOrdered, not a sort."""
    return sampling.hash_sample(
        load(spark, sf_dir, "documents").select("doc_id"), k=50
    )


@xq(
    "weighted_sample",
    """
    WITH h AS (
      SELECT doc_id, n_chars,
             substring(md5(doc_id::VARCHAR), 1, 13) AS hx
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    v AS (
      SELECT doc_id, n_chars,
             sum((strpos('0123456789abcdef',
                         substring(hx, i, 1)) - 1)::BIGINT
                 << (4 * (13 - i))) AS vv
      FROM (SELECT doc_id, n_chars, hx,
                   unnest(range(1, 14)) AS i FROM h)
      GROUP BY doc_id, n_chars
    ),
    keyed AS (
      SELECT doc_id, n_chars,
             CAST(round(ln((vv + 1) / 4503599627370496.0)
                        / n_chars * 1000000.0) AS BIGINT) AS k
      FROM v
    )
    SELECT doc_id, n_chars FROM keyed ORDER BY k DESC, doc_id LIMIT 40
    """,
)
def weighted_sample_q(spark, sf_dir):
    """A-ES weighted sample (Efraimidis-Spirakis): 40 documents drawn
    proportionally to n_chars with md5-derived randomness — no RNG
    state, same sample on any cluster size. The twin re-derives u from
    the same 13 hex digits (bit-shift fold), the ln(u)/w key in the
    same IEEE operation order, and the micro rounding; ordering
    divergence would need a last-ulp libm split landing exactly on a
    .5 micro boundary."""
    from ..operators.sampling import weighted_sample

    return weighted_sample(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        k=40,
        weight_col="n_chars",
    )


@xq(
    "stratified_sample",
    """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 20
    """,
)
def stratified_sample_q(spark, sf_dir):
    """Per-source deterministic sample (20 smallest md5(doc_id) per
    stratum), run through the two-phase salted path (pre_salts=4) — the
    twin is the single-phase window rank, so the hash-match doubles as
    the two-phase == one-phase equality proof on real data."""
    return sampling.stratified_sample(
        load(spark, sf_dir, "documents").select("doc_id", "source"),
        k=20,
        strata_col="source",
        pre_salts=4,
    )


# domain-mix weights exercised by the query: a 2x up-sample, a
# fractional 1.5x, a 0.5x down-sample, a dropped source, and the
# implicit 1.0 default for every other source; thresholds are derived
# by the SAME _hex8_threshold on both sides so they cannot drift
_MIX_WEIGHTS = {"src0": 2.0, "src1": 1.5, "src2": 0.5, "src3": 0.0}


def _mix_case(fmt) -> str:
    return (
        "CASE source "
        + " ".join(
            f"WHEN '{s}' THEN {fmt(w)}" for s, w in sorted(_MIX_WEIGHTS.items())
        )
        + f" ELSE {fmt(1.0)} END"
    )


@xq(
    "mix_corpus",
    f"""
    WITH m AS (
      SELECT doc_id, source,
             {_mix_case(lambda w: int(w))}
             + CASE WHEN substring(md5(doc_id::VARCHAR), 1, 8)
                    < {_mix_case(lambda w: "'" + sampling._hex8_threshold(w - int(w)) + "'")}
               THEN 1 ELSE 0 END AS n
      FROM documents)
    SELECT doc_id, source, unnest(range(1, n + 1))::INT AS copy_idx
    FROM m WHERE n >= 1
    """,
)
def mix_corpus_q(spark, sf_dir):
    """Deterministic domain mixing: per-source epoch weights realized as
    md5-thresholded replication; the twin recomputes every copy count
    from the same hash and thresholds."""
    return sampling.mix_corpus(
        load(spark, sf_dir, "documents").select("doc_id", "source"),
        weights=_MIX_WEIGHTS,
    )


# plant rule-violating structure deterministically: hashes (symbol
# rule) for doc_id % 5 == 0, ten bullet lines for % 6 == 0, an
# ellipsis-ended line for % 9 == 0
_GOPHER_PLANT_SQL = (
    "SELECT doc_id, text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ######## ########' ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN repeat(chr(10) || '- bullet item', 10)"
    "    ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'to be continued...'"
    "    ELSE '' END"
    " AS text FROM documents"
)

_GOPHER_STOPS_SQL = "['the','be','to','of','and','that','have','with']"


@xq(
    "gopher_filter",
    "WITH planted AS (" + _GOPHER_PLANT_SQL + "),\n"
    r"""
    t AS (SELECT doc_id, text,
                 regexp_split_to_array(lower(trim(text)), '\s+') AS words,
                 list_transform(string_split(text, chr(10)), x -> trim(x)) AS lines
          FROM planted),
    m AS (SELECT doc_id, text, words, lines,
                 greatest(len(words), 1) AS nw,
                 greatest(len(lines), 1) AS nl,
                 length(regexp_replace(lower(trim(text)), '\s', '', 'g'))
                   / greatest(len(words), 1) AS mean_wl,
                 length(text) - length(replace(text, '#', '')) AS n_hash,
                 (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
          FROM t)
    SELECT doc_id,
           len(words) >= 50 AND len(words) <= 100000 AS ok_words,
           mean_wl >= 3 AND mean_wl <= 10 AS ok_mean_len,
           (n_hash + n_ell) / nw <= 0.1 AS ok_symbols,
           (len(list_filter(lines, x -> starts_with(x, '-')
                OR starts_with(x, '*') OR starts_with(x, chr(8226)))) / nl < 0.9)
             AND (len(list_filter(lines, x -> ends_with(x, '...'))) / nl < 0.3)
             AS ok_bullets,
           len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) / nw >= 0.8
             AS ok_alpha,
    """
    f"       len(list_intersect(words, {_GOPHER_STOPS_SQL})) >= 2 AS ok_stopwords,\n"
    r"""
           (len(words) >= 50 AND len(words) <= 100000)
             AND (mean_wl >= 3 AND mean_wl <= 10)
             AND ((n_hash + n_ell) / nw <= 0.1)
             AND ((len(list_filter(lines, x -> starts_with(x, '-')
                  OR starts_with(x, '*') OR starts_with(x, chr(8226)))) / nl < 0.9)
                  AND (len(list_filter(lines, x -> ends_with(x, '...'))) / nl < 0.3))
             AND (len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) / nw >= 0.8)
    """
    f"       AND (len(list_intersect(words, {_GOPHER_STOPS_SQL})) >= 2) AS keep\n"
    "FROM m",
)
def gopher_filter_q(spark, sf_dir):
    """Gopher rule-set breakdown over documents with deterministically
    planted rule violations (symbol runs, bullet walls, ellipsis
    endings); the twin plants identically and re-derives every rule."""
    planted = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" ######## ########")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 6 == 0, F.lit("\n- bullet item" * 10)).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 9 == 0, F.lit("\nto be continued...")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return textmetrics.gopher_filter(planted)


@xq(
    "dedup_exact_incremental",
    f"""
    WITH newb AS (
      SELECT o.doc_id,
             CASE WHEN o.doc_id % 25 = 9 THEN 'planted canary duplicate text'
                  WHEN o.doc_id % 3 = 1 THEN e.text
                  ELSE o.text END AS text
      FROM documents o LEFT JOIN documents e ON e.doc_id = o.doc_id - 1
      WHERE o.doc_id % 2 = 1),
    keyed AS (SELECT doc_id, md5({_NORM_SQL}) AS text_hash FROM newb),
    seen AS (SELECT DISTINCT md5({_NORM_SQL}) AS text_hash
             FROM documents WHERE doc_id % 2 = 0)
    SELECT min(doc_id) AS doc_id, text_hash
    FROM keyed WHERE text_hash NOT IN (SELECT text_hash FROM seen)
    GROUP BY text_hash
    """,
)
def dedup_exact_incremental_q(spark, sf_dir):
    """Incremental exact dedup: odd doc_ids are the NEW batch (with a
    planted cross-batch copy of the preceding even doc for id % 3 == 1
    and a planted within-batch canary for id % 25 == 9), even ids the
    EXISTING corpus; survivors must drop the cross-batch copies and
    collapse the canary group to its min id."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    prev = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("prev_text")
    )
    new = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 25 == 9,
                F.lit("planted canary duplicate text"),
            )
            .when(F.col("doc_id") % 3 == 1, F.col("prev_text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    return dedup.exact_dedup_incremental(new, existing)


@xq(
    "curation_pipeline",
    f"""
    WITH RECURSIVE wds AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(words)),
                                        i -> words[i] || ' ' || words[i+1])) AS gram
           FROM wds WHERE len(words) >= 2),
    bgc AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY 1, 2),
    keepdocs AS (SELECT doc_id FROM bgc GROUP BY doc_id
                 HAVING sum(cnt) >= 30
                    AND round(max(cnt) / sum(cnt), 6) <= 0.2),
    f AS (SELECT d.doc_id, d.text FROM documents d JOIN keepdocs USING (doc_id)),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM f)
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    p AS (
      SELECT a, b FROM inter
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = a
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = b
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    ),
    edges AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    lab AS (SELECT f.doc_id,
                   coalesce(cc.cluster_id, f.doc_id) AS cluster_id,
                   length(f.text) AS l
            FROM f LEFT JOIN cc ON cc.node = f.doc_id),
    keepers AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY l DESC, doc_id ASC) AS rn
        FROM lab) WHERE rn = 1)
    SELECT doc_id,
           CASE WHEN md5(doc_id::VARCHAR) < 'cc' THEN 'train'
                WHEN md5(doc_id::VARCHAR) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM keepers
    """,
)
def curation_pipeline_q(spark, sf_dir):
    """End-to-end corpus curation composed ENTIRELY from the operator
    library: Gopher repetition/length gate (>= 31 words,
    top_gram_frac <= 0.2) -> near-dup family clustering with keeper
    election -> deterministic train/val/test split. The twin re-derives
    every stage in one assembled SQL pipeline — the composition, not
    just each stage, is hash-checked."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    rep = textmetrics.repetition_signals(docs)
    keep_ids = rep.filter(
        (F.col("n_grams") >= 30) & (F.col("top_gram_frac") <= 0.2)
    ).select("doc_id")
    filtered = docs.join(keep_ids, "doc_id", "left_semi")
    pairs = dedup.ngram_jaccard_pairs(filtered, threshold=0.5, n=3)
    fams = dedup.dedup_clusters(filtered, pairs)
    keepers = fams.filter(F.col("is_keeper")).select("doc_id")
    return sampling.deterministic_split(keepers)


@xq(
    "curation_pipeline_v2",
    f"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\\s+') AS words
               FROM documents),
    occ0 AS (SELECT doc_id, words,
                    unnest(range(0, greatest(len(words) - 8, 0) + 1, 4)) AS start
             FROM w),
    occ AS (SELECT doc_id, start,
                   array_to_string(words[start+1:start+8], ' ') AS span
            FROM occ0),
    rk AS (SELECT doc_id, start,
                  row_number() OVER (PARTITION BY span
                                     ORDER BY doc_id, start) AS rn,
                  count(*) OVER (PARTITION BY span) AS cnt
           FROM occ),
    cuts AS (SELECT doc_id, start FROM rk WHERE cnt >= 2 AND rn > 1),
    widx AS (SELECT doc_id, unnest(words) AS word,
                    unnest(range(0, len(words))) AS i
             FROM w),
    keptw AS (SELECT wi.doc_id, wi.word, wi.i FROM widx wi
              WHERE NOT EXISTS (SELECT 1 FROM cuts c
                                WHERE c.doc_id = wi.doc_id
                                  AND wi.i >= c.start AND wi.i < c.start + 8)),
    agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS cleaned_text
            FROM keptw GROUP BY doc_id),
    cleaned AS (SELECT w.doc_id, coalesce(a.cleaned_text, '') AS text
                FROM w LEFT JOIN agg a USING (doc_id)),
    orignorm AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
                 FROM documents),
    plants AS (
        SELECT words[5:12] AS pw FROM orignorm
        WHERE doc_id % 10 = 0 AND len(words) >= 12
        UNION ALL
        SELECT words[3:15] AS pw FROM orignorm
        WHERE doc_id % 15 = 0 AND len(words) >= 15),
    bench AS (
      SELECT DISTINCT unnest(
        (CASE WHEN len(pw) >= 8
          THEN list_transform(range(1, len(pw) - 6),
               i -> array_to_string(pw[i:i+7], ' '))
          ELSE [] END)
        ||
        (CASE WHEN len(pw) >= 13
          THEN list_transform(range(1, len(pw) - 11),
               i -> array_to_string(pw[i:i+12], ' '))
          ELSE [] END)) AS gram
      FROM plants),
    cnorm AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
              FROM cleaned),
    g AS (SELECT doc_id,
                 list_distinct(
                   (CASE WHEN len(words) >= 8
                     THEN list_transform(range(1, len(words) - 6),
                          i -> array_to_string(words[i:i+7], ' '))
                     ELSE [] END)
                   ||
                   (CASE WHEN len(words) >= 13
                     THEN list_transform(range(1, len(words) - 11),
                          i -> array_to_string(words[i:i+12], ' '))
                     ELSE [] END)) AS grams
          FROM cnorm),
    dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    flagged AS (SELECT DISTINCT doc_id FROM dg JOIN bench USING (gram)),
    qm AS (
      SELECT doc_id,
             len(words) AS n_words,
             length(regexp_replace(text, '\\s+', '', 'g'))
               / greatest(len(words), 1) AS mean_word_len,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               / greatest(length(text), 1) AS punct_ratio,
             len(list_filter(words, x -> x IN {_STOPS_SQL}))
               / greatest(len(words), 1) AS stop_ratio
      FROM (SELECT doc_id, text,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS words
            FROM cleaned)),
    qual AS (
      SELECT doc_id, round((
               (CASE WHEN n_words BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN stop_ratio >= 0.01 THEN 0.1 ELSE 0.0 END))::DOUBLE,
             2) AS qs
      FROM qm),
    survivors AS (
      SELECT c.doc_id FROM cleaned c JOIN qual q USING (doc_id)
      WHERE c.doc_id NOT IN (SELECT doc_id FROM flagged) AND q.qs >= 0.7)
    SELECT doc_id,
           CASE WHEN md5(doc_id::VARCHAR) < 'cc' THEN 'train'
                WHEN md5(doc_id::VARCHAR) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM survivors
    """,
)
def curation_pipeline_v2_q(spark, sf_dir):
    """Round-4 curation composition chaining the three NEW operators:
    span removal (cleaned text) -> multi-n decontamination (n=8,13,
    plants from the ORIGINAL corpus — planted docs self-flag and drop
    out, the correct behavior) -> quality gate on the CLEANED text ->
    deterministic split. The assembled CTE hash-checks the COMPOSITION
    end to end, not just each stage."""
    from ..operators import textmetrics as tm

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cleaned = dedup.remove_shared_spans(docs).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    words = F.split(dedup.normalized_text(F.col("text")), " ")
    bench8 = (
        docs.filter((F.col("doc_id") % 10 == 0) & (F.size(words) >= 12))
        .select(F.concat_ws(" ", F.slice(words, 5, 8)).alias("text"))
    )
    bench13 = (
        docs.filter((F.col("doc_id") % 15 == 0) & (F.size(words) >= 15))
        .select(F.concat_ws(" ", F.slice(words, 3, 13)).alias("text"))
    )
    flagged = dedup.decontaminate(
        cleaned, bench8.unionByName(bench13), n=(8, 13)
    ).select("doc_id")
    survivors = cleaned.join(flagged, "doc_id", "left_anti")
    kept = survivors.filter(
        F.round(tm.quality_score_col("text"), 2) >= F.lit(0.7)
    )
    return sampling.deterministic_split(kept.select("doc_id")).select(
        "doc_id", "split"
    )


@q(
    "ann_cosine_topk",
    """
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                      * sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))),
                   6) AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                      * sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))
                 DESC, c.vec_id ASC) AS rank
      FROM embeddings c, embeddings q
      WHERE q.vec_id < 5 AND c.vec_id >= 5) t
    WHERE rank <= 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.cosine_topk_bruteforce(corpus, queries, k=10)


@xq(
    "embedding_norm_stats",
    """
    SELECT label,
           round(avg(sqrt(list_inner_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[]))), 6) AS avg_norm,
           count(*) AS n
    FROM embeddings GROUP BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda a, x: a + x * x,
        )
    )
    return (
        e.select("label", norm.alias("_n"))
        .groupBy("label")
        .agg(F.round(F.avg("_n"), 6).alias("avg_norm"), F.count(F.lit(1)).alias("n"))
    )


@q(
    "f3_time_range_filter",
    """
    SELECT event_id, user_id, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
      AND ts <= TIMESTAMP '2024-01-05 00:00:00'
      AND event_type = 'click'
    """,
)
def f3_time_range_filter(spark, sf_dir):
    # F3 chunk time/camera filter shape: range + equality, partition-prunable
    e = load(spark, sf_dir, "events")
    return e.filter(
        (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") <= F.lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
        & (F.col("event_type") == "click")
    ).select("event_id", "user_id", "value")


@xq(
    "c10_json_parse",
    """
    SELECT CAST(json_extract(props, '$.k') AS INT) AS k, count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def c10_json_parse(spark, sf_dir):
    # C10 JSON parse of semi-structured props (reference json-repair path)
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@q(
    "a5_user_set_union",
    """
    SELECT event_type,
           array_to_string(list_sort(list_distinct(list(user_id))), ',') AS users
    FROM events WHERE user_id < 20 GROUP BY event_type
    """,
)
def a5_user_set_union(spark, sf_dir):
    # A5 camera-id set-union-on-merge shape
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return e.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("user_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("users")
    )


@xq(
    "a8_max_span_per_user",
    """
    SELECT user_id, round(max(value) - min(value), 2) AS value_span
    FROM events GROUP BY user_id
    """,
)
def a8_max_span_per_user(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.round(F.max("value") - F.min("value"), 2).alias("value_span")
    )


@xq(
    "o4_set_except",
    """
    SELECT user_id FROM events WHERE event_type = 'error'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 40
    """,
)
def o4_set_except(spark, sf_dir):
    # O4 set-subtract (apoc.coll.subtract / AQL MINUS analog)
    e = load(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("user_id")
    big_buyers = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 40)
    ).select("user_id")
    return err.subtract(big_buyers)


@xq(
    "tpch_q1_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def tpch_q1_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@xq(
    "f5_batch_range_filter",
    """
    SELECT event_id, user_id, CAST(floor(event_id / 100) AS BIGINT) AS batch_i
    FROM events WHERE floor(event_id / 100) BETWEEN 3 AND 7
    """,
)
def f5_batch_range_filter(spark, sf_dir):
    """F5 — batch-index range fetch (reference get_text_data batch_i
    windows, neo4j_db.py GET_TEXT_QUERY batch range): membership is a
    pure function of the id, so the filter folds into the scan."""
    e = load(spark, sf_dir, "events")
    batch = F.floor(F.col("event_id") / 100).cast("long")
    return (
        e.withColumn("batch_i", batch)
        .filter((F.col("batch_i") >= 3) & (F.col("batch_i") <= 7))
        .select("event_id", "user_id", "batch_i")
    )


@xq(
    "f4_subtitle_time_filter",
    """
    SELECT (i + 1)::INT AS seq,
           round(2 * i + ((i * 37) % 1000) / 1000.0, 3) AS start_s,
           round(2 * i + 1 + ((i * 53) % 1000) / 1000.0, 3) AS end_s,
           'subtitle line ' || i::VARCHAR || ' spoken here' AS text
    FROM range(0, 120) t(i)
    WHERE round(2 * i + ((i * 37) % 1000) / 1000.0, 3) >= 30.0
      AND round(2 * i + 1 + ((i * 53) % 1000) / 1000.0, 3) <= 150.0
    """,
)
def f4_subtitle_time_filter(spark, sf_dir):
    """F4 — subtitle time-window filter over the SRT source (reference
    subtitle fetch by start/end seconds, base.py:627-645). The SRT file
    is synthesized deterministically, so the DuckDB twin recomputes the
    expected rows from the same arithmetic (the parse itself is also
    parity-tested in test_sources_retrieval)."""
    import os
    import tempfile

    from ..sources.docs_json import read_srt

    srt_dir = os.path.join(tempfile.gettempdir(), "spark_graft_srt_v1")
    path = os.path.join(srt_dir, "fixture.srt")
    if not os.path.exists(path):
        os.makedirs(srt_dir, exist_ok=True)
        blocks = []
        for i in range(120):
            s = i * 2
            e = s + 1
            blocks.append(
                f"{i + 1}\n"
                f"00:{s // 60:02d}:{s % 60:02d},{(i * 37) % 1000:03d} --> "
                f"00:{e // 60:02d}:{e % 60:02d},{(i * 53) % 1000:03d}\n"
                f"subtitle line {i} spoken here\n"
            )
        with open(path, "w") as f:
            f.write("\n".join(blocks))
    subs = read_srt(spark, path)
    return subs.filter(
        (F.col("start_s") >= 30.0) & (F.col("end_s") <= 150.0)
    ).select("seq", "start_s", "end_s", "text")


@xq(
    "s8_jsonl_source",
    """
    SELECT 'c' || (i % 4)::VARCHAR AS conv_id,
           (i // 4)::INT AS turn_idx,
           CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
           'jsonl turn ' || i::VARCHAR || ' payload' AS text,
           CASE WHEN i % 5 = 0 THEN 'search' ELSE NULL END AS tool,
           epoch(TIMESTAMP '2026-01-01 00:00:00'
                 + to_minutes(i))::BIGINT AS ts_epoch
    FROM range(0, 40) t(i)
    """,
)
def s8_jsonl_source_q(spark, sf_dir):
    """JSON-lines transcript source under the explicit schema: the
    fixture is synthesized deterministically WITH two planted corrupt
    lines, so the twin (recomputing the good rows arithmetically)
    passes only if the reader parses every valid line AND quarantines
    exactly the bad ones. Timestamps surface as epoch seconds (integer
    compare, no tz-canon ambiguity); parse fidelity itself is covered
    in tests/test_sources_formats.py."""
    import os
    import tempfile

    from ..sources.transcripts import read_transcripts_jsonl, split_corrupt

    d = os.path.join(tempfile.gettempdir(), "spark_graft_jsonl_v1")
    path = os.path.join(d, "feed.jsonl")
    if not os.path.exists(path):
        os.makedirs(d, exist_ok=True)
        lines = []
        for i in range(40):
            tool = '"search"' if i % 5 == 0 else "null"
            role = "user" if i % 2 == 0 else "assistant"
            lines.append(
                f'{{"conv_id":"c{i % 4}","turn_idx":{i // 4},'
                f'"role":"{role}","text":"jsonl turn {i} payload",'
                f'"tool":{tool},'
                f'"ts":"2026-01-01T00:{i:02d}:00Z"}}'
            )
            if i % 17 == 0:
                lines.append(f"{{corrupt line {i}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    good, _bad = split_corrupt(read_transcripts_jsonl(spark, path))
    return good.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


@xq(
    "a11_merged_count",
    f"""
    SELECT count(*)::BIGINT AS merge_groups,
           coalesce(sum(n_docs - 1), 0)::BIGINT AS merged_nodes,
           coalesce(sum(n_docs), 0)::BIGINT AS total_merged
    FROM (
      SELECT count(*) AS n_docs
      FROM (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000, text FROM documents)
      GROUP BY md5({_NORM_SQL}) HAVING count(*) > 1
    )
    """,
)
def a11_merged_count(spark, sf_dir):
    """A11 — totalMerged (reference apoc.refactor.mergeNodes metric,
    neo4j_db.py:1665-1684: sum of merge-group sizes). Exercised on the
    exact-normalized dedup groups of the documents table unioned with an
    id-shifted copy (testdata has no natural dups, so the shifted copy
    plants one real merge group per distinct text) — DuckDB twin; the
    KG-side analog is canonicalize.merged_counts over the pipeline
    canonical_map (pytest parity)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    groups = dedup.exact_duplicates_normalized(doubled)
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("merge_groups"),
        F.coalesce(F.sum(F.col("n_docs") - 1), F.lit(0))
        .cast("long")
        .alias("merged_nodes"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("total_merged"),
    )


@q(
    "delete_orphan_cleanup",
    """
    WITH del AS (SELECT o_orderkey FROM orders WHERE o_custkey % 29 = 3),
    docs AS (
      SELECT 'O' || o_orderkey::VARCHAR AS node_id, 'Document' AS node_type
      FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)),
    chunks AS (
      SELECT 'L' || l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR AS node_id,
             'Chunk' AS node_type
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del)),
    ents AS (
      SELECT DISTINCT 'P' || l_partkey::VARCHAR AS node_id, 'Entity' AS node_type
      FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey
                      AND l2.l_orderkey NOT IN (SELECT o_orderkey FROM del)))
    SELECT node_id, node_type FROM docs
    UNION ALL SELECT node_id, node_type FROM chunks
    UNION ALL SELECT node_id, node_type FROM ents
    """,
)
def delete_orphan_cleanup(spark, sf_dir):
    """Per-document delete + orphan-entity cleanup (reference
    QUERY_TO_DELETE_UUID_GRAPH, constants.py:406-443) exercised on a
    KG shaped from TPC-H: order=Document, lineitem=Chunk (PART_OF),
    part=Entity (HAS_ENTITY). Surviving nodes are hash-checked against
    the DuckDB DELETE + NOT EXISTS twin."""
    from ..operators import delete as delete_ops

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    okey = F.col("o_orderkey").cast("string")
    lkey = F.col("l_orderkey").cast("string")
    chunk_id = F.concat(F.lit("L"), lkey, F.lit("-"), F.col("l_linenumber").cast("string"))
    ent_id = F.concat(F.lit("P"), F.col("l_partkey").cast("string"))
    nodes = (
        orders.select(F.concat(F.lit("O"), okey).alias("node_id"),
                      F.lit("Document").alias("node_type"))
        .unionByName(li.select(chunk_id.alias("node_id"),
                               F.lit("Chunk").alias("node_type")))
        .unionByName(li.select(ent_id.alias("node_id"),
                               F.lit("Entity").alias("node_type")).distinct())
    )
    edges = (
        li.select(chunk_id.alias("src"),
                  F.concat(F.lit("O"), lkey).alias("dst"),
                  F.lit("PART_OF").alias("rel_type"))
        .unionByName(li.select(chunk_id.alias("src"), ent_id.alias("dst"),
                               F.lit("HAS_ENTITY").alias("rel_type")))
    )
    del_docs = orders.filter(F.col("o_custkey") % 29 == 3).select(
        F.concat(F.lit("O"), okey).alias("node_id")
    )
    return delete_ops.delete_documents(nodes, edges, del_docs).nodes


# =========================================================================
# Rows-only queries (pandas-UDF stages the SQL oracle cannot express)
# =========================================================================


@xq(
    "s6_batch_summaries",
    f"""
    SELECT conv_id, batch_id, summary, n_turns, n_turn_idxs
    FROM read_parquet('{_pq("s6_batch_summaries")}')
    """,
)
def s6_batch_summaries(spark, sf_dir):
    from ..operators.summarize import summarize_batches

    s = summarize_batches(transcripts_for(spark, sf_dir), batch_size=6)
    return s.select(
        "conv_id", "batch_id", "summary", "n_turns",
        F.size("turn_idxs").alias("n_turn_idxs"),
    )


@q(
    "s6_batch_summaries_llm",
    f"""
    SELECT conv_id, batch_id, summary, n_turns, n_turn_idxs
    FROM read_parquet('{_pq("s6_batch_summaries")}')
    """,
)
def s6_batch_summaries_llm(spark, sf_dir):
    """U4 closed: batch summarization through the fake-LLM structured
    JSON response cycle (malform -> repair C10 -> parse — reference
    functions/summarization/batch.py:122-145 +
    structured_inference.py:105-348). Output must equal the direct
    stub path, so the DuckDB twin is the SAME precomputed s6 oracle
    parquet (the sanctioned kg_triples_json_llm pattern) plus
    pytest-asserted parity per response mode."""
    from ..operators.summarize import llm_summarize_udf, summarize_batches

    s = summarize_batches(
        transcripts_for(spark, sf_dir), batch_size=6,
        summarize_udf=llm_summarize_udf(400),
    )
    return s.select(
        "conv_id", "batch_id", "summary", "n_turns",
        F.size("turn_idxs").alias("n_turn_idxs"),
    )


@xq(
    "summary_retrieval",
    f"""
    WITH in_range AS (
      SELECT conv_id, batch_id, summary
      FROM read_parquet('{_pq("s6_batch_summaries")}')
      WHERE batch_id BETWEEN 1 AND 3),
    stitched AS (
      SELECT conv_id,
             string_agg(summary, ' ' ORDER BY batch_id) AS ctx,
             count(*)::BIGINT AS n_batches,
             min(batch_id) AS batch_lo, max(batch_id) AS batch_hi
      FROM in_range GROUP BY conv_id)
    SELECT conv_id, substr('[SUM] ' || ctx, 1, 406) AS summary,
           n_batches, batch_lo, batch_hi
    FROM stitched
    """,
)
def summary_retrieval(spark, sf_dir):
    """Summary retriever entry point (reference
    summary_retriever.py:72-105): batch-range fetch over the stored
    summaries table, batch-ordered stuff, U4 summarization chain over
    the stitched context. The twin replicates the fetch+stitch on the
    s6 snapshot and the stub summary arithmetic in SQL."""
    from ..operators.summarize import retrieve_summary, summarize_batches

    s = summarize_batches(transcripts_for(spark, sf_dir), batch_size=6)
    return retrieve_summary(s, batch_lo=1, batch_hi=3)


def _ep3_inputs(spark, sf_dir):
    from ..operators import similarity

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    chunks = res.chunks.dropDuplicates(["chunk_id"]).select(
        "chunk_id", "conv_id", "text"
    )
    with_emb = similarity.with_text_embeddings(chunks).localCheckpoint()
    # deterministic query row: limit(1) without ordering varies with
    # partition layout / core count and would break the driver hash
    qvec = [
        float(x)
        for x in with_emb.orderBy("chunk_id").limit(1).collect()[0]["embedding"]
    ]
    return res, with_emb, qvec


@xq(
    "ep3_graph_vector_search",
    f"""
    SELECT source, text, score, n_chunks, n_entities, n_rels, length
    FROM read_parquet('{_pq("ep3_graph_vector_search")}')
    """,
)
def ep3_graph_vector_search(spark, sf_dir):
    """EP3 end-to-end: assembled per-document context rows (text block +
    sorted entity/relationship lines + avg score), reference
    VECTOR_GRAPH_SEARCH_QUERY_SUFFIX constants.py:98-168."""
    from ..operators import retrieval

    res, with_emb, qvec = _ep3_inputs(spark, sf_dir)
    return retrieval.assemble_context(
        with_emb, res.edges, res.nodes, qvec, k=5, hops=2
    )


@q(
    "ep3_compressed_context",
    f"""
    SELECT source, compressed_text, n_pieces_kept, best_piece_sim,
           compressed_length
    FROM read_parquet('{_pq("ep3_compressed_context")}')
    """,
)
def ep3_compressed_context(spark, sf_dir):
    """EP3 + contextual compression (splitter 500/10 + embedding filter
    at 0.10 — reference neo4j_db.py:1274-1299). Hash-checked against
    the full pure-Python EP3 replication
    (oracle/precompute.py:ep3_compressed_py — verified exact, every
    cosine a sequential fold)."""
    from ..operators import retrieval

    from ..functions.embedder import hash_embed
    from ..functions.splitter import split_text

    res, with_emb, qvec = _ep3_inputs(spark, sf_dir)
    ctx = retrieval.assemble_context(
        with_emb, res.edges, res.nodes, qvec, k=5, hops=2
    ).localCheckpoint()
    # query = embedding of an actual context piece (the "asks about
    # retrieved content" case): the hash embedder decorrelates any
    # non-identical text, so a raw chunk query would filter every
    # re-split piece out — a real embedder keeps semantic neighbors
    first_text = ctx.orderBy("source").limit(1).collect()[0]["text"]
    piece = split_text(first_text, chunk_size=500, chunk_overlap=10,
                       separators=["Text:", "\n\n", "\n", "\n-"])[0]
    qvec2 = [float(x) for x in hash_embed([piece], dim=64)[0]]
    return retrieval.compress_context(ctx, qvec2)


@q(
    "ep3_planner_trace",
    f"""
    SELECT iteration, step, tool, arg, rank, result_id, score, detail
    FROM read_parquet('{_pq("ep3_planner_trace")}')
    """,
)
def ep3_planner_trace(spark, sf_dir):
    """Agentic planner retrieval — the reference's main Q&A mode
    (retrieval/planner.py:1-601, planner_retrieval.py:1-315,
    graph_search_tool.py:199-527): the scripted fake-LLM planner drives
    the full think→execute→observe loop over the ChunkSearch /
    EntitySearch / BFS / NextChunk / ChunkFilter tool twins; the driver
    hash gates the COMPLETE trace (plan texts + every tool result row)
    against the pure-Python replay of the loop
    (oracle/precompute.planner_trace_table)."""
    from ..functions.plannerscript import DEFAULT_PLANNER_QUERY
    from ..operators import planner

    transcripts = transcripts_for(spark, sf_dir)
    res = run_pipeline(spark, transcripts, PipelineConfig())
    # unique chunks with a deterministic min-ts keeper (duplicate
    # chunk_id rows are content-identical but their ts differ)
    chunks = res.chunks.groupBy("chunk_id").agg(
        F.min("conv_id").alias("conv_id"),
        F.min("text").alias("text"),
        F.min("ts").alias("ts"),
    )
    with_emb = similarity.with_text_embeddings(chunks)
    return planner.planner_retrieve(
        with_emb, res.edges, res.nodes, DEFAULT_PLANNER_QUERY,
        subtitles=planner.subtitles_from_transcripts(transcripts),
    )


# ---- Vector-RAG entry point (vector_retrieval_func.py:1-354) ----------
# corpus = documents joined to their embeddings, metadata-filtered to
# the "caption" analog (lang = 'en'); query = the vec_id-0 embedding.
_VRAG_COS = (
    "list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])"
    " / (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))"
    " * sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))"
)

_VRAG_RANKED = f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    ranked AS (
      SELECT d.doc_id, d.source AS file, d.text,
             round({_VRAG_COS}, 6) AS score,
             row_number() OVER (
               ORDER BY {_VRAG_COS} DESC, c.vec_id ASC) AS rank
      FROM embeddings c
      JOIN documents d ON d.doc_id = c.vec_id, q
      WHERE c.vec_id >= 5 AND d.lang = 'en')
"""


@xq(
    "vector_rag_search",
    _VRAG_RANKED + """
    SELECT rank, doc_id, file, score,
           substr(text, 1, 200) AS snippet,
           '[' || file || '] ' || CAST(doc_id AS VARCHAR) AS citation
    FROM ranked WHERE rank <= 5
    """,
)
def vector_rag_search_q(spark, sf_dir):
    """Vector-RAG retrieval rows (vector_retrieval_func.py:82-110):
    metadata filter under the vector top-k, citation template
    "[{file}] {chunkIdx}", 200-char snippets."""
    from ..operators import vectorrag

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).filter(
        F.col("vec_id") >= 5
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return vectorrag.vector_rag_search(
        corpus, qvec, top_k=5, filter_expr=F.col("lang") == "en"
    )


@xq(
    "vector_rag_context",
    _VRAG_RANKED + """
    , hits AS (SELECT * FROM ranked WHERE rank <= 5)
    SELECT 'what changed in the slow table scan' AS question,
           string_agg(text, chr(10) || chr(10) ORDER BY rank) AS context,
           chr(10) || '**Sources:**' || chr(10) ||
             string_agg('[' || file || '] ' || CAST(doc_id AS VARCHAR),
                        chr(10) ORDER BY rank) AS sources,
           count(*)::BIGINT AS n_docs,
           length(string_agg(text, chr(10) || chr(10) ORDER BY rank))::BIGINT
             AS context_length
    FROM hits
    """,
)
def vector_rag_context_q(spark, sf_dir):
    """The stuffed QA context + Sources block (format_docs,
    utils.py:234-235; format_citations_display,
    vector_retrieval_func.py:180-230)."""
    from ..operators import vectorrag

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).filter(
        F.col("vec_id") >= 5
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    retrieved = vectorrag.vector_rag_search(
        corpus, qvec, top_k=5, filter_expr=F.col("lang") == "en"
    )
    return vectorrag.vector_rag_context(
        retrieved, "what changed in the slow table scan", docs
    )


@xq(
    "vlm_frame_assembly",
    _VRAG_RANKED + """
    , hits AS (SELECT doc_id, rank FROM ranked WHERE rank <= 10),
    vids AS (
      SELECT h.rank, d.doc_id AS media_id, d.text,
             (d.doc_id % 9000 + 1000) AS duration_ms,
             d.doc_id * 1000000000 AS start_ns,
             d.doc_id * 1000000000 + (d.doc_id % 9000 + 1000) * 1000000
               AS end_ns,
             greatest(CAST(floor((d.doc_id % 9000 + 1000) / 100.0) AS INT), 1)
               AS t
      FROM hits h JOIN documents d ON d.doc_id = h.doc_id
      WHERE d.doc_id % 3 = 2),
    hms AS (
      SELECT *,
             lpad(CAST(start_ns // 1000000000 // 3600 AS VARCHAR), 2, '0')
               || ':' ||
             lpad(CAST(start_ns // 1000000000 % 3600 // 60 AS VARCHAR), 2, '0')
               || ':' ||
             lpad(CAST(start_ns // 1000000000 % 60 AS VARCHAR), 2, '0')
               AS start_time,
             lpad(CAST(end_ns // 1000000000 // 3600 AS VARCHAR), 2, '0')
               || ':' ||
             lpad(CAST(end_ns // 1000000000 % 3600 // 60 AS VARCHAR), 2, '0')
               || ':' ||
             lpad(CAST(end_ns // 1000000000 % 60 AS VARCHAR), 2, '0')
               AS end_time
      FROM vids),
    meta_rows AS (
      SELECT rank, media_id, 0 AS msg_idx, 'text' AS msg_type,
             'Image metadata: (Timestamp: ' || start_time || ' to '
               || end_time || ')' || chr(10) AS content,
             start_time, end_time, CAST(NULL AS INT) AS frame_idx
      FROM hms),
    exploded AS (
      SELECT h.*, CAST(u.i AS BIGINT) AS i
      FROM hms h, unnest(range(least(4, h.t))) AS u(i)),
    idx AS (
      -- round-half-even(i*(t-1)/3): Python int(round()) parity
      SELECT *,
             CASE WHEN t > 4 THEN
               CAST(i * (t - 1) // 3
                 + CASE WHEN 2 * (i * (t - 1) % 3) > 3
                          OR (2 * (i * (t - 1) % 3) = 3
                              AND (i * (t - 1) // 3) % 2 = 1)
                        THEN 1 ELSE 0 END AS INT)
             ELSE CAST(i AS INT) END AS frame_idx
      FROM exploded),
    frame_rows AS (
      SELECT rank, media_id, CAST(i + 1 AS INT) AS msg_idx,
             'image_url' AS msg_type,
             'data:image/jpeg;base64,' ||
               to_base64(encode(text || '#frame_'
                                || CAST(frame_idx AS VARCHAR))) AS content,
             start_time, end_time, frame_idx
      FROM idx)
    SELECT * FROM meta_rows UNION ALL SELECT * FROM frame_rows
    """,
)
def vlm_frame_assembly_q(spark, sf_dir):
    """VLM retrieval frame assembly (vlm_retrieval_func.py:116-252 +
    image_fetcher.py:241-287): vector top-10 docs, video-kind rows
    only, 100 ms frame census, 4 uniformly-sampled frames per doc
    (banker's-rounding index parity), reference message ordering."""
    from ..operators import multimodal, vectorrag, vlmretrieval

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).filter(
        F.col("vec_id") >= 5
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    retrieved = vectorrag.vector_rag_search(
        corpus, qvec, top_k=10, filter_expr=F.col("lang") == "en"
    )
    media = multimodal.synthesize_media(spark, docs)
    return vlmretrieval.vlm_frame_assembly(
        retrieved.select("rank", "doc_id"), media,
        num_frames_per_chunk=4, every_ms=100,
    )


@q(
    "a10_tree_summarize",
    f"""
    SELECT conv_id, summary, n_levels
    FROM read_parquet('{_pq("a10_tree_summarize")}')
    """,
)
def a10_tree_summarize(spark, sf_dir):
    from ..operators.chunking import chunk_transcripts
    from ..operators.linking import link_chunks
    from ..operators.treeagg import tree_summarize

    chunks = link_chunks(chunk_transcripts(transcripts_for(spark, sf_dir)))
    return tree_summarize(chunks)


@xq(
    "a10_tree_summarize_llm",
    f"""
    SELECT conv_id, summary, n_levels
    FROM read_parquet('{_pq("a10_tree_summarize")}')
    """,
)
def a10_tree_summarize_llm(spark, sf_dir):
    """A10 recursion with the U4 fake-LLM combine at every tree level —
    the per-level summary rides the structured-JSON malform/repair
    cycle; equal to the expression-combine tree, so the twin is the
    same a10 snapshot."""
    from ..operators.chunking import chunk_transcripts
    from ..operators.linking import link_chunks
    from ..operators.summarize import llm_tree_combine
    from ..operators.treeagg import tree_summarize

    chunks = link_chunks(chunk_transcripts(transcripts_for(spark, sf_dir)))
    return tree_summarize(chunks, combine=llm_tree_combine(500))

@q(
    "kg_triples",
    f"""
    SELECT conv_id, subj_name, subj_type, pred, obj_name, obj_type
    FROM read_parquet('{_pq("kg_triples")}')
    """,
)
def kg_triples(spark, sf_dir):
    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    return res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()


@xq(
    "kg_triples_json_llm",
    f"""
    SELECT conv_id, subj_name, subj_type, pred, obj_name, obj_type
    FROM read_parquet('{_pq("kg_triples")}')
    """,
)
def kg_triples_json_llm(spark, sf_dir):
    """U1 via the LLM-JSON response path: every chunk's (fake) LLM graph
    response is malformed in one of 5 styles, repaired (C10), and parsed
    to triples — output must equal kg_triples, so the DuckDB twin is
    the SAME precomputed oracle parquet (plus pytest-asserted parity)."""
    res = run_pipeline(
        spark, transcripts_for(spark, sf_dir), PipelineConfig(extractor="json_llm")
    )
    return res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()


@xq(
    "kg_fact_intervals",
    f"""
    WITH r AS (
        SELECT subj_name, pred, obj_name, ts_s,
               row_number() OVER (PARTITION BY subj_name, pred
                                  ORDER BY ts_s, obj_name) AS rn_all,
               row_number() OVER (PARTITION BY subj_name, pred, obj_name
                                  ORDER BY ts_s, obj_name) AS rn_obj
        FROM read_parquet('{_pq("kg_fact_assertions")}')
    ),
    g AS (
        SELECT subj_name, pred, obj_name,
               min(ts_s) AS valid_from,
               count(*) AS n_asserts,
               min(rn_all) AS start_rn
        FROM r
        GROUP BY subj_name, pred, obj_name, rn_all - rn_obj
    )
    SELECT subj_name, pred, obj_name, valid_from,
           lead(valid_from) OVER (PARTITION BY subj_name, pred
                                  ORDER BY start_rn) AS valid_to,
           n_asserts
    FROM g
    """,
)
def kg_fact_intervals(spark, sf_dir):
    """Valid-time intervals over the extracted KG (operators/facts.py):
    the Spark leg runs the WHOLE pipeline (transcripts → chunks →
    triples), joins assertion timestamps, and run-length-encodes each
    (subj, pred) slot; the DuckDB twin re-derives the same islands
    independently from the precomputed assertion snapshot."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    return facts_ops.fact_intervals(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )


@xq(
    "kg_functional_violations",
    f"""
    WITH base AS (
        SELECT DISTINCT subj_name, pred, obj_name
        FROM read_parquet('{_pq("kg_triples")}')
    ),
    prof AS (
        SELECT pred, count(DISTINCT subj_name) AS n_subj_pred,
               count(*) AS n_pairs_pred
        FROM base GROUP BY pred
    ),
    slots AS (
        SELECT pred, subj_name, count(*) AS n_objects,
               string_agg(obj_name, ',' ORDER BY obj_name) AS objects
        FROM base GROUP BY pred, subj_name
        HAVING count(*) >= 2
    )
    SELECT s.pred, s.subj_name, s.n_objects, s.objects,
           p.n_subj_pred, p.n_pairs_pred
    FROM slots s JOIN prof p USING (pred)
    """,
)
def kg_functional_violations(spark, sf_dir):
    """AMIE-style consistency census (operators/facts.py): every
    (pred, subj) slot asserted with ≥2 distinct objects, under the
    predicate's integer functionality profile."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    return facts_ops.functional_violations(res.triples)


_FACT_ISLANDS_SQL = f"""
    WITH r AS (
        SELECT subj_name, pred, obj_name, ts_s,
               row_number() OVER (PARTITION BY subj_name, pred
                                  ORDER BY ts_s, obj_name) AS rn_all,
               row_number() OVER (PARTITION BY subj_name, pred, obj_name
                                  ORDER BY ts_s, obj_name) AS rn_obj
        FROM read_parquet('{_pq("kg_fact_assertions")}')
    ),
    g AS (
        SELECT subj_name, pred, obj_name,
               min(ts_s) AS valid_from,
               count(*) AS n_asserts,
               min(rn_all) AS start_rn
        FROM r
        GROUP BY subj_name, pred, obj_name, rn_all - rn_obj
    ),
    iv AS (
        SELECT subj_name, pred, obj_name, valid_from,
               lead(valid_from) OVER (PARTITION BY subj_name, pred
                                      ORDER BY start_rn) AS valid_to,
               n_asserts
        FROM g
    )
"""


@xq(
    "kg_facts_as_of",
    _FACT_ISLANDS_SQL
    + """
    , probe AS (
        SELECT (min(valid_from) + max(valid_from)) // 2 AS as_of_s FROM iv
    )
    SELECT subj_name, pred, obj_name, valid_from, valid_to, probe.as_of_s
    FROM iv, probe
    WHERE valid_from <= probe.as_of_s
      AND (valid_to IS NULL OR valid_to > probe.as_of_s)
    """,
)
def kg_facts_as_of(spark, sf_dir):
    """Point-in-time KG snapshot (operators/facts.py): the facts valid
    at the derived mid-history instant. Spark runs the whole pipeline
    (transcripts -> chunks -> triples -> assertions -> intervals) and
    filters to the half-open-interval containment; the twin re-derives
    the islands AND the probe independently over the assertion
    snapshot. The in-plan probe derivation (global agg -> broadcast
    cross join, no collect) is what the hash pins."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    iv = facts_ops.fact_intervals(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return facts_ops.facts_as_of(iv).drop("n_asserts")


@xq(
    "kg_slot_churn",
    _FACT_ISLANDS_SQL
    + """
    , slots AS (
        SELECT pred, subj_name, count(*) AS n_iv,
               sum(CASE WHEN valid_to IS NOT NULL
                        THEN valid_to - valid_from ELSE 0 END) AS closed_s
        FROM iv GROUP BY pred, subj_name
    )
    SELECT pred,
           count(*) AS n_slots,
           sum(n_iv) AS n_intervals,
           sum(n_iv) - count(*) AS n_changes,
           sum(CASE WHEN n_iv >= 2 THEN 1 ELSE 0 END) AS n_churned_slots,
           max(n_iv) AS max_intervals_per_slot,
           sum(closed_s) AS closed_duration_s
    FROM slots GROUP BY pred
    """,
)
def kg_slot_churn(spark, sf_dir):
    """Per-predicate slot-volatility census (operators/facts.py): how
    often each predicate's (subj, pred) slots flipped objects over the
    transcript history, with the closed validity mass in integer
    seconds — the volatility companion to kg_functional_violations
    (which profiles multi-valuedness, not change-over-time)."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    iv = facts_ops.fact_intervals(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return facts_ops.slot_churn(iv)


@xq(
    "kg_interval_flickers",
    _FACT_ISLANDS_SQL
    + """
    , x AS (
        SELECT subj_name, pred, obj_name, valid_from, valid_to, n_asserts,
               lag(obj_name) OVER w AS prev_obj,
               lead(obj_name) OVER w AS next_obj
        FROM iv
        WINDOW w AS (PARTITION BY subj_name, pred
                     ORDER BY valid_from, obj_name)
    )
    SELECT subj_name, pred, obj_name, valid_from, valid_to,
           valid_to - valid_from AS duration_s,
           prev_obj AS surrounding_obj, n_asserts
    FROM x
    WHERE prev_obj IS NOT NULL AND prev_obj = next_obj
      AND obj_name <> prev_obj
    """,
)
def kg_interval_flickers(spark, sf_dir):
    """Sandwiched-interloper detection (facts.interval_flickers): a
    slot reading A…B(brief)…A witnessed one bad extraction of B, not a
    real change and a reversion — the temporal-KG noise-triage row the
    static functional census cannot see. Spark runs the whole pipeline
    → intervals → slot-ordered lag/lead sandwich filter; the twin
    re-derives islands AND the window independently over the assertion
    snapshot."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    iv = facts_ops.fact_intervals(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return facts_ops.interval_flickers(iv)


@xq(
    "kg_pred_drift",
    _FACT_ISLANDS_SQL
    + """
    , probe AS (
        SELECT (2 * min(valid_from) + max(valid_from)) // 3 AS t1_s,
               (min(valid_from) + 2 * max(valid_from)) // 3 AS t2_s
        FROM iv
    ),
    facts AS (
        SELECT subj_name, pred, obj_name, probe.t1_s, probe.t2_s,
               max(CASE WHEN valid_from <= probe.t1_s
                         AND (valid_to IS NULL OR valid_to > probe.t1_s)
                        THEN 1 ELSE 0 END) AS a,
               max(CASE WHEN valid_from <= probe.t2_s
                         AND (valid_to IS NULL OR valid_to > probe.t2_s)
                        THEN 1 ELSE 0 END) AS b
        FROM iv, probe
        GROUP BY subj_name, pred, obj_name, probe.t1_s, probe.t2_s
        HAVING max(CASE WHEN valid_from <= probe.t1_s
                         AND (valid_to IS NULL OR valid_to > probe.t1_s)
                        THEN 1 ELSE 0 END) = 1
            OR max(CASE WHEN valid_from <= probe.t2_s
                         AND (valid_to IS NULL OR valid_to > probe.t2_s)
                        THEN 1 ELSE 0 END) = 1
    )
    SELECT pred,
           sum(a) AS n_t1, sum(b) AS n_t2,
           sum(CASE WHEN b = 1 AND a = 0 THEN 1 ELSE 0 END) AS n_added,
           sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n_removed,
           sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n_retained,
           sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) * 1000000
             // (sum(a) + sum(b)
                 - sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END))
             AS stability_ppm,
           t1_s, t2_s
    FROM facts GROUP BY pred, t1_s, t2_s
    """,
)
def kg_pred_drift(spark, sf_dir):
    """Per-predicate KG drift census between the in-plan 1/3- and
    2/3-point snapshots (facts.snapshot_diff): added / removed /
    retained fact counts + integer-Jaccard stability per predicate —
    the maintenance monitor for a continuously-ingested graph (the KG
    sibling of the diff.psi_* corpus monitors). The twin re-derives
    islands, probes, containment flags, and the census independently
    over the assertion snapshot."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    iv = facts_ops.fact_intervals(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return facts_ops.snapshot_diff(iv)


@xq(
    "kg_triple_evidence",
    f"""
    WITH time_ev AS (
        SELECT subj_name, pred, obj_name,
               count(*) AS n_timepoints,
               min(ts_s) AS first_ts_s,
               max(ts_s) AS last_ts_s
        FROM read_parquet('{_pq("kg_fact_assertions")}')
        GROUP BY subj_name, pred, obj_name
    ),
    conv_ev AS (
        SELECT subj_name, pred, obj_name,
               count(DISTINCT conv_id) AS n_convs
        FROM read_parquet('{_pq("kg_triples")}')
        GROUP BY subj_name, pred, obj_name
    )
    SELECT t.subj_name, t.pred, t.obj_name, c.n_convs, t.n_timepoints,
           t.first_ts_s, t.last_ts_s,
           t.last_ts_s - t.first_ts_s AS span_s
    FROM time_ev t JOIN conv_ev c
      ON t.subj_name = c.subj_name AND t.pred = c.pred
     AND t.obj_name = c.obj_name
    """,
)
def kg_triple_evidence(spark, sf_dir):
    """Per-triple provenance census (operators/facts.py): conversation
    corroboration + assertion-time window per distinct name-level fact
    — the trust/edge-weight table. Spark runs the full pipeline and
    aggregates; the twin joins the assertion and triple snapshots."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    return facts_ops.triple_evidence(res.triples, res.chunks)


@xq(
    "kg_ntriples_roundtrip",
    f"""
    SELECT DISTINCT subj_name, pred, obj_name
    FROM read_parquet('{_pq("kg_triples")}')
    """,
)
def kg_ntriples_roundtrip(spark, sf_dir):
    """N-Triples interchange round trip (sources/ntriples.py): the
    distinct name-level triple set serialized to W3C N-Triples lines
    (url-encoded IRIs — framing unbreakable by any name) and parsed
    back. The twin is the same triple set straight from the oracle
    snapshot, so the hash pins serialize→parse identity on the real
    corpus; adversarial names are property-tested in pytest."""
    from ..sources.ntriples import parse_ntriples, to_ntriples

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    tri = res.triples.select("subj_name", "pred", "obj_name").dropDuplicates()
    return parse_ntriples(to_ntriples(tri))


@xq(
    "kg_entity_timeline",
    f"""
    WITH ev AS (
        SELECT subj_name AS entity, 'subj' AS role, ts_s, pred,
               obj_name AS other
        FROM read_parquet('{_pq("kg_fact_assertions")}')
        UNION ALL
        SELECT obj_name, 'obj', ts_s, pred, subj_name
        FROM read_parquet('{_pq("kg_fact_assertions")}')
    )
    SELECT entity,
           row_number() OVER (
               PARTITION BY entity ORDER BY ts_s, pred, role, other
           ) AS seq,
           ts_s, role, pred, other
    FROM ev
    """,
)
def kg_entity_timeline(spark, sf_dir):
    """Per-entity chronological assertion feed (operators/facts.py:
    entity_timeline) — each assertion under both its subject and its
    object with a deterministic per-entity rank; the "entity memory"
    view context assembly reads. One entity-keyed window."""
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    return facts_ops.entity_timeline(res.triples, res.chunks)


@xq(
    "conv_struct_dedup",
    f"""
    WITH d AS (
        SELECT DISTINCT conv_id,
               subj_name || chr(9) || pred || chr(9) || obj_name AS key
        FROM read_parquet('{_pq("kg_triples")}')
    ),
    f AS (
        SELECT conv_id, count(*) AS n_facts,
               md5(string_agg(key, chr(10) ORDER BY key)) AS fingerprint
        FROM d GROUP BY conv_id
    )
    SELECT conv_id, n_facts, fingerprint,
           count(*) OVER (PARTITION BY fingerprint) AS family_size,
           count(*) OVER (PARTITION BY fingerprint) > 1 AS is_struct_dup
    FROM f
    """,
)
def conv_struct_dedup(spark, sf_dir):
    """Structural conversation dedup (operators/graphdedup.py):
    canonical md5 fingerprint of each conversation's distinct asserted
    triple set + family sizes — catches paraphrase duplicates that
    text-level dedup misses. The twin recomputes the same canonical
    hash in DuckDB (binary sort order, chr(9)/chr(10) framing)."""
    from ..operators.graphdedup import conversation_fingerprints

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    return conversation_fingerprints(res.triples)


@q(
    "kg_triad_census",
    f"""
    WITH arcs AS (
        SELECT DISTINCT subj_name AS s, obj_name AS d
        FROM read_parquet('{_pq("kg_triples")}')
        WHERE subj_name <> obj_name
    ),
    dy AS (
        SELECT lo, hi, fwd, rev,
               CASE WHEN fwd + rev = 2 THEN 1 ELSE 0 END AS mut
        FROM (
            SELECT least(s, d) AS lo, greatest(s, d) AS hi,
                   max(CASE WHEN s < d THEN 1 ELSE 0 END) AS fwd,
                   max(CASE WHEN s > d THEN 1 ELSE 0 END) AS rev
            FROM arcs GROUP BY 1, 2
        )
    ),
    nn AS (
        SELECT count(*) AS n_nodes FROM (
            SELECT lo AS v FROM dy UNION SELECT hi FROM dy
        )
    ),
    per_node AS (
        SELECT v, sum(o) AS n_out, sum(i) AS n_in, sum(m) AS n_mut FROM (
            SELECT lo AS v, fwd * (1 - mut) AS o, rev * (1 - mut) AS i,
                   mut AS m FROM dy
            UNION ALL
            SELECT hi, rev * (1 - mut), fwd * (1 - mut), mut FROM dy
        ) GROUP BY v
    ),
    center AS (
        SELECT '021D' AS clazz, sum(n_out * (n_out - 1) // 2) AS n FROM per_node
        UNION ALL SELECT '021U', sum(n_in * (n_in - 1) // 2) FROM per_node
        UNION ALL SELECT '021C', sum(n_in * n_out) FROM per_node
        UNION ALL SELECT '111D', sum(n_mut * n_in) FROM per_node
        UNION ALL SELECT '111U', sum(n_mut * n_out) FROM per_node
        UNION ALL SELECT '201', sum(n_mut * (n_mut - 1) // 2) FROM per_node
    ),
    tri AS (
        SELECT d12.lo AS n1, d12.hi AS n2, d13.hi AS n3,
               d12.fwd AS f12, d12.rev AS r12, d12.mut AS m12,
               d13.fwd AS f13, d13.rev AS r13, d13.mut AS m13,
               d23.fwd AS f23, d23.rev AS r23, d23.mut AS m23,
               d12.mut + d13.mut + d23.mut AS mm
        FROM dy d12
        JOIN dy d13 ON d13.lo = d12.lo AND d13.hi > d12.hi
        JOIN dy d23 ON d23.lo = d12.hi AND d23.hi = d13.hi
    ),
    closed AS (
        SELECT clazz, count(*) AS n FROM (
            SELECT CASE
                WHEN mm = 3 THEN '300'
                WHEN mm = 2 THEN '210'
                WHEN mm = 1 THEN (CASE
                    WHEN (CASE WHEN m12 = 1 THEN r13 + r23
                               WHEN m13 = 1 THEN r12 + f23
                               ELSE f12 + f13 END) = 2 THEN '120D'
                    WHEN (CASE WHEN m12 = 1 THEN f13 + f23
                               WHEN m13 = 1 THEN f12 + r23
                               ELSE r12 + r13 END) = 2 THEN '120U'
                    ELSE '120C' END)
                WHEN f12 * f23 * r13 + f13 * r23 * r12 > 0 THEN '030C'
                ELSE '030T' END AS clazz
            FROM tri
        ) GROUP BY clazz
    ),
    closed_pairs AS (
        SELECT clazz, count(*) AS n FROM (
            SELECT CASE key
                WHEN 'oo' THEN '021D' WHEN 'ii' THEN '021U'
                WHEN 'io' THEN '021C' WHEN 'im' THEN '111D'
                WHEN 'mo' THEN '111U' ELSE '201' END AS clazz
            FROM (
                SELECT least(t1, t2) || greatest(t1, t2) AS key FROM (
                    SELECT
                        CASE WHEN m12 = 1 THEN 'm' WHEN f12 = 1 THEN 'o'
                             ELSE 'i' END AS t1,
                        CASE WHEN m13 = 1 THEN 'm' WHEN f13 = 1 THEN 'o'
                             ELSE 'i' END AS t2
                    FROM tri
                    UNION ALL
                    SELECT
                        CASE WHEN m12 = 1 THEN 'm' WHEN r12 = 1 THEN 'o'
                             ELSE 'i' END,
                        CASE WHEN m23 = 1 THEN 'm' WHEN f23 = 1 THEN 'o'
                             ELSE 'i' END
                    FROM tri
                    UNION ALL
                    SELECT
                        CASE WHEN m13 = 1 THEN 'm' WHEN r13 = 1 THEN 'o'
                             ELSE 'i' END,
                        CASE WHEN m23 = 1 THEN 'm' WHEN r23 = 1 THEN 'o'
                             ELSE 'i' END
                    FROM tri
                )
            )
        ) GROUP BY clazz
    ),
    common AS (
        SELECT lo, hi, count(*) AS cmn FROM (
            SELECT n1 AS lo, n2 AS hi FROM tri
            UNION ALL SELECT n1, n3 FROM tri
            UNION ALL SELECT n2, n3 FROM tri
        ) GROUP BY 1, 2
    ),
    deg AS (
        SELECT v, count(*) AS du FROM (
            SELECT lo AS v FROM dy UNION ALL SELECT hi FROM dy
        ) GROUP BY v
    ),
    disc AS (
        SELECT CASE WHEN dy.mut = 1 THEN '102' ELSE '012' END AS clazz,
               sum(nn.n_nodes - 2
                   - (dl.du + dh.du - 2 - coalesce(c.cmn, 0))) AS n
        FROM dy
        LEFT JOIN common c ON c.lo = dy.lo AND c.hi = dy.hi
        JOIN deg dl ON dl.v = dy.lo
        JOIN deg dh ON dh.v = dy.hi
        CROSS JOIN nn
        GROUP BY 1
    ),
    positives AS (
        SELECT clazz, n FROM center
        UNION ALL SELECT clazz, -n FROM closed_pairs
        UNION ALL SELECT clazz, n FROM closed
        UNION ALL SELECT clazz, n FROM disc
    ),
    seed AS (
        SELECT unnest(['003','012','102','021D','021U','021C','111D',
                       '111U','030T','030C','201','120D','120U','120C',
                       '210','300']) AS clazz, 0 AS n
    ),
    total3 AS (
        SELECT '003' AS clazz,
               n_nodes * (n_nodes - 1) * (n_nodes - 2) // 6 AS n
        FROM nn
    ),
    neg003 AS (SELECT '003' AS clazz, -n AS n FROM positives)
    SELECT clazz, CAST(sum(n) AS BIGINT) AS n FROM (
        SELECT * FROM seed UNION ALL SELECT * FROM positives
        UNION ALL SELECT * FROM total3 UNION ALL SELECT * FROM neg003
    ) GROUP BY clazz
    """,
)
def kg_triad_census_q(spark, sf_dir):
    """Davis–Leinhardt 16-class triad census (operators/triads.py,
    Batagelj & Mrvar 2001 arithmetic + compact-forward triangle
    listing) over the extracted entity digraph — the structural QA
    fingerprint: inverse-predicate pairs inflate the mutual classes,
    direction bugs surface as 030C mass. The twin replicates the FULL
    algorithm in DuckDB (dyads, center-pair counting, triangle
    classification, complement arithmetic), and pytest pins the
    operator against a brute-force isomorphism-canonical classifier
    on random digraphs."""
    from ..operators.triads import triad_census

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    arcs = (
        res.triples.where(F.col("subj_name") != F.col("obj_name"))
        .select(F.col("subj_name").alias("src"), F.col("obj_name").alias("dst"))
        .dropDuplicates()
    )
    return triad_census(arcs)


_CLOSURE_SQL_HEAD = f"""
    WITH et AS (
        SELECT least(subj_name, obj_name) AS lo,
               greatest(subj_name, obj_name) AS hi,
               min(ts_s) AS t
        FROM read_parquet('{_pq("kg_fact_assertions")}')
        WHERE subj_name <> obj_name
        GROUP BY 1, 2
    ),
    tri AS (
        SELECT e12.lo AS n1, e12.hi AS n2, e13.hi AS n3,
               e12.t AS t12, e13.t AS t13, e23.t AS t23
        FROM et e12
        JOIN et e13 ON e13.lo = e12.lo AND e13.hi > e12.hi
        JOIN et e23 ON e23.lo = e12.hi AND e23.hi = e13.hi
    ),
    ev AS (
        SELECT
            CASE WHEN (t23, n2, n3) >= (t12, n1, n2)
                  AND (t23, n2, n3) >= (t13, n1, n3) THEN n2
                 ELSE n1 END AS node_a,
            CASE WHEN (t23, n2, n3) >= (t12, n1, n2)
                  AND (t23, n2, n3) >= (t13, n1, n3) THEN n1
                 WHEN (t13, n1, n3) >= (t12, n1, n2) THEN n2
                 ELSE n3 END AS broker,
            CASE WHEN (t12, n1, n2) > (t13, n1, n3)
                  AND (t12, n1, n2) > (t23, n2, n3) THEN n2
                 ELSE n3 END AS node_c,
            CASE WHEN (t12, n1, n2) > (t13, n1, n3)
                  AND (t12, n1, n2) > (t23, n2, n3)
                     THEN greatest(t13, t23)
                 WHEN (t13, n1, n3) > (t12, n1, n2)
                  AND (t13, n1, n3) > (t23, n2, n3)
                     THEN greatest(t12, t23)
                 ELSE greatest(t12, t13) END AS t_open_s,
            greatest(t12, t13, t23) AS t_close_s
        FROM tri
    )
"""


@xq(
    "kg_closure_events",
    _CLOSURE_SQL_HEAD
    + """
    SELECT node_a, broker, node_c, t_open_s, t_close_s,
           t_close_s - t_open_s AS delay_s
    FROM ev
    """,
)
def kg_closure_events(spark, sf_dir):
    """Temporal triadic-closure events of the co-assertion entity graph
    (operators/closure.py): each triangle is exactly one closure — the
    last-arriving edge (total order (t, lo, hi)) closes the wedge the
    other two formed, the bypassed wedge center is the broker, delay is
    integer seconds from wedge completion to closure. The Spark leg
    runs the whole pipeline and enumerates via the skew-bounded
    compact-forward orientation; the DuckDB twin re-derives dyad
    first-times, triangles, and the tuple-comparison closer pick
    independently from the assertion snapshot."""
    from ..operators import closure as cl
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return cl.closure_events(et)


@xq(
    "kg_closure_census",
    _CLOSURE_SQL_HEAD
    + """
    , deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT lo AS node FROM et UNION ALL SELECT hi FROM et
        ) GROUP BY node
    ),
    tri_at AS (
        SELECT node, count(*) AS n_closed FROM (
            SELECT node_a AS node FROM ev
            UNION ALL SELECT broker FROM ev
            UNION ALL SELECT node_c FROM ev
        ) GROUP BY node
    ),
    brk AS (
        SELECT broker AS node, count(*) AS n_brokered FROM ev GROUP BY broker
    )
    SELECT d.node, d.degree,
           d.degree * (d.degree - 1) // 2 AS n_wedges,
           coalesce(n_closed, 0) AS n_closed,
           d.degree * (d.degree - 1) // 2
               - coalesce(n_closed, 0) AS n_open,
           coalesce(n_brokered, 0) AS n_brokered
    FROM deg d
    LEFT JOIN tri_at USING (node)
    LEFT JOIN brk USING (node)
    """,
)
def kg_closure_census(spark, sf_dir):
    """Per-entity triadic-closure scorecard (operators/closure.py):
    degree, wedge count C(d,2), closed (triangle memberships), still
    open (node-local arithmetic — a hub's open wedges are never
    enumerated), and brokered closures. Twin derives the same integers
    from the assertion snapshot."""
    from ..operators import closure as cl
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return cl.closure_census(et)


@xq(
    "kg_closure_rate",
    _CLOSURE_SQL_HEAD
    + """
    , eb AS (
        SELECT (t // 86400) * 86400 AS bucket_s,
               count(*) AS n_new_edges
        FROM et GROUP BY 1
    ),
    cb AS (
        SELECT (t_close_s // 86400) * 86400 AS bucket_s,
               count(*) AS n_closures,
               sum(CASE WHEN t_close_s = t_open_s THEN 1 ELSE 0 END)
                   AS n_zero_delay,
               sum(t_close_s - t_open_s) AS sum_delay_s
        FROM ev GROUP BY 1
    )
    SELECT coalesce(eb.bucket_s, cb.bucket_s) AS bucket_s,
           CAST(coalesce(n_new_edges, 0) AS BIGINT) AS n_new_edges,
           CAST(coalesce(n_closures, 0) AS BIGINT) AS n_closures,
           CAST(coalesce(n_zero_delay, 0) AS BIGINT) AS n_zero_delay,
           CAST(coalesce(sum_delay_s, 0) AS BIGINT) AS sum_delay_s,
           CAST(sum(coalesce(n_closures, 0)) OVER (
               ORDER BY coalesce(eb.bucket_s, cb.bucket_s)
           ) AS BIGINT) AS cum_closures
    FROM eb FULL JOIN cb ON eb.bucket_s = cb.bucket_s
    """,
)
def kg_closure_rate(spark, sf_dir):
    """Daily graph-growth series (operators/closure.py:
    closure_rate_series): edges formed vs wedges closed per bucket,
    zero-delay (single-chunk clique) closures isolated, cumulative
    closure curve. The cumulative window runs over BUCKET rows — the
    audited bounded-input exemption. Twin re-derives the buckets and
    the running sum from the assertion snapshot."""
    from ..operators import closure as cl
    from ..operators import facts as facts_ops

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return cl.closure_rate_series(et, bucket_s=86400)


@xq(
    "kg_graph_summary",
    f"""
    WITH raw AS (
        SELECT DISTINCT subj_name AS s, obj_name AS d
        FROM read_parquet('{_pq("kg_triples")}')
    ),
    loops AS (
        SELECT count(*) AS n_self_loops FROM raw WHERE s = d
    ),
    dy AS (
        SELECT least(s, d) AS lo, greatest(s, d) AS hi,
               max(CASE WHEN s < d THEN 1 ELSE 0 END) AS fwd,
               max(CASE WHEN s > d THEN 1 ELSE 0 END) AS rev
        FROM raw WHERE s <> d GROUP BY 1, 2
    ),
    dyagg AS (
        SELECT count(*) AS n_dyads,
               coalesce(sum(CASE WHEN fwd + rev = 2 THEN 1 ELSE 0 END), 0)
                   AS n_mutual,
               coalesce(sum(fwd + rev), 0) AS n_arcs
        FROM dy
    ),
    nodeagg AS (
        SELECT count(*) AS n_nodes,
               coalesce(sum(du * (du - 1) // 2), 0) AS n_wedges
        FROM (
            SELECT v, count(*) AS du FROM (
                SELECT lo AS v FROM dy UNION ALL SELECT hi FROM dy
            ) GROUP BY v
        )
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM dy d12
        JOIN dy d13 ON d13.lo = d12.lo AND d13.hi > d12.hi
        JOIN dy d23 ON d23.lo = d12.hi AND d23.hi = d13.hi
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_self_loops AS BIGINT) AS n_self_loops,
           CAST(n_arcs AS BIGINT) AS n_arcs,
           CAST(n_dyads AS BIGINT) AS n_dyads,
           CAST(n_mutual AS BIGINT) AS n_mutual,
           CAST(n_dyads - n_mutual AS BIGINT) AS n_asym,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CASE WHEN n_arcs > 0
                THEN CAST((2000000 * n_mutual) // n_arcs AS BIGINT) END
               AS reciprocity_e6,
           CASE WHEN n_nodes > 1
                THEN CAST((1000000 * n_arcs)
                          // (n_nodes * (n_nodes - 1)) AS BIGINT) END
               AS density_e6,
           CASE WHEN n_wedges > 0
                THEN CAST((3000000 * n_triangles) // n_wedges AS BIGINT) END
               AS transitivity_e6
    FROM dyagg CROSS JOIN nodeagg CROSS JOIN tri CROSS JOIN loops
    """,
)
def kg_graph_summary(spark, sf_dir):
    """One-row structural scorecard of the extracted entity digraph
    (operators/triads.py:graph_summary): reciprocity (inverse-predicate
    inflation alarm), density, global transitivity — exact counts plus
    floor-micro integer ratios, so the hash pins the arithmetic in both
    engines. Open wedges come from degree arithmetic, triangles from
    the skew-bounded oriented listing."""
    from ..operators.triads import graph_summary

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    arcs = res.triples.select(
        F.col("subj_name").alias("src"), F.col("obj_name").alias("dst")
    )
    return graph_summary(arcs)


def _hb_bucket(col: str) -> str:
    return f"CAST(concat('0x', substr(md5({col}), 1, 8)) AS BIGINT) % 256"


def _hb_rho(col: str) -> str:
    v = f"CAST(concat('0x', substr(md5({col}), 9, 12)) AS BIGINT)"
    return f"CASE WHEN {v} = 0 THEN 49 ELSE 49 - length(bin({v})) END"


_HB_N_ITER = 4
_HB_ITERS = "\n".join(
    f"""    r{t} AS (
        SELECT node, bucket, max(m_j) AS m_j FROM (
            SELECT node, bucket, m_j FROM r{t - 1}
            UNION ALL
            SELECT e.x AS node, r.bucket, r.m_j
            FROM e JOIN r{t - 1} r ON r.node = e.y
        ) GROUP BY 1, 2
    ),"""
    for t in range(1, _HB_N_ITER + 1)
)
_HB_STATES = "\n        UNION ALL ".join(
    f"SELECT {t} AS t, node, bucket, m_j FROM r{t}"
    for t in range(_HB_N_ITER + 1)
)
_HB_RAW = (
    "(0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * 562949953421312.0"
    " / CAST(harmonic_s49 AS DOUBLE)"
)


_HB_SQL_HEAD = f"""
    WITH et AS (
        SELECT least(subj_name, obj_name) AS lo,
               greatest(subj_name, obj_name) AS hi
        FROM read_parquet('{_pq("kg_fact_assertions")}')
        WHERE subj_name <> obj_name
        GROUP BY 1, 2
    ),
    e AS (
        SELECT lo AS x, hi AS y FROM et
        UNION ALL SELECT hi, lo FROM et
    ),
    r0 AS (
        SELECT node, {_hb_bucket("node")} AS bucket, {_hb_rho("node")} AS m_j
        FROM (SELECT DISTINCT x AS node FROM e)
    ),
{_HB_ITERS}
    states AS (
        {_HB_STATES}
    ),
    agg AS (
        SELECT t, node, count(*) AS n_registers,
               sum(1::BIGINT << (49 - m_j)) AS s_present
        FROM states GROUP BY 1, 2
    ),
    est AS (
        SELECT t, node,
               s_present + (256 - n_registers) * (1::BIGINT << 49)
                   AS harmonic_s49,
               256 - n_registers AS n_empty
        FROM agg
    ),
    pe AS (
        SELECT t, node,
               CAST(round(round(
                   CASE WHEN n_empty > 0 AND {_HB_RAW} <= 640.0
                        THEN 256.0 * ln(256.0 / CAST(n_empty AS DOUBLE))
                        ELSE {_HB_RAW} END, 4) * 10000) AS BIGINT) AS e4
        FROM est
    )
"""


@xq(
    "kg_effective_diameter",
    _HB_SQL_HEAD
    + f"""
    , nf AS (SELECT t, sum(e4) AS nf_e4 FROM pe GROUP BY t),
    nf2 AS (
        SELECT t, nf_e4, lag(nf_e4) OVER (ORDER BY t) AS nf_prev FROM nf
    ),
    base AS (
        SELECT max(nf_e4) AS nf_max,
               sum(CASE WHEN t = 0 THEN nf_e4 END) AS nf0,
               sum(CASE WHEN t > 0 THEN t * (nf_e4 - nf_prev) END) AS growth
        FROM nf2
    ),
    cand AS (
        SELECT nf2.t AS ct, nf_prev, nf_e4
        FROM nf2 CROSS JOIN base
        WHERE 1000000 * nf_e4 >= 900000 * nf_max
        ORDER BY nf2.t LIMIT 1
    )
    SELECT CAST({_HB_N_ITER} AS BIGINT) AS n_iter,
           CAST(900000 AS BIGINT) AS q_e6,
           CAST(nf0 AS BIGINT) AS nf0_e4,
           CAST(nf_max AS BIGINT) AS nf_max_e4,
           CASE WHEN nf_max > nf0
                THEN CAST((1000000 * growth) // (nf_max - nf0) AS BIGINT) END
               AS avg_distance_e6,
           CASE WHEN ct IS NULL THEN NULL
                WHEN ct = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((ct - 1) * 1000000
                          + (900000 * nf_max - 1000000 * nf_prev)
                            // (nf_e4 - nf_prev) AS BIGINT) END
               AS eff_diameter_e6
    FROM base LEFT JOIN cand ON TRUE
    """,
)
def kg_effective_diameter(spark, sf_dir):
    """HyperBall distance summary of the co-assertion entity graph
    (operators/graph.py:effective_diameter, Boldi-Vigna 2013 /
    Palmer ANF 2002): neighborhood function NF(t) summed in integer
    1e-4 units from per-node HLL ball estimates, then horizon-bounded
    average distance and the q=0.9 interpolated effective diameter as
    floor-micro integers. The twin unrolls ALL {n} HyperBall
    iterations in DuckDB — register init, edge max-merge, the full
    estimator, the NF lag window, and the quantile interpolation — so
    the hash gates the entire derivation, not just the output
    shape.""".replace("{n}", str(_HB_N_ITER))
    from ..operators import closure as cl_ops
    from ..operators import facts as facts_ops
    from ..operators.graph import effective_diameter

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl_ops.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return effective_diameter(
        et.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        p=8,
        n_iter=_HB_N_ITER,
        q_e6=900_000,
    )


@xq(
    "kg_harmonic_centrality",
    _HB_SQL_HEAD
    + """
    SELECT node,
           CAST(sum((greatest(e4 - prev, 0) * (1000000 // t)) // 10000)
                AS BIGINT) AS harmonic_e6
    FROM (
        SELECT t, node, e4,
               lag(e4) OVER (PARTITION BY node ORDER BY t) AS prev
        FROM pe
    )
    WHERE t > 0
    GROUP BY node
    """,
)
def kg_harmonic_centrality(spark, sf_dir):
    """Approximate harmonic centrality of every entity in the
    co-assertion graph (operators/graph.py:harmonic_centrality,
    Boldi-Vigna's flagship HyperBall application): newly-reached
    ball mass at distance t contributes 1/t, evaluated with the
    deterministic clamped-delta integer formula. The twin rides the
    same fully-unrolled HyperBall head as kg_effective_diameter and
    replicates the per-node lag + weighted floor sum."""
    from ..operators import closure as cl_ops
    from ..operators import facts as facts_ops
    from ..operators.graph import harmonic_centrality

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl_ops.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return harmonic_centrality(
        et.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        p=8,
        n_iter=_HB_N_ITER,
    )


@xq(
    "kg_path_explain",
    f"""
    WITH RECURSIVE t AS (
        SELECT DISTINCT subj_name AS s, pred AS p, obj_name AS o
        FROM read_parquet('{_pq("kg_triples")}')
    ),
    et AS (SELECT DISTINCT s, o FROM t WHERE s <> o),
    adj AS (SELECT s AS u, o AS v FROM et UNION SELECT o, s FROM et),
    walk(node, dist) AS (
        SELECT 'Berlin', 0
        UNION
        SELECT a.v, w.dist + 1
        FROM walk w JOIN adj a ON a.u = w.node
        WHERE w.dist < 10
    ),
    d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node),
    pmin AS (
        SELECT dv.node AS v, min(a.u) AS pr
        FROM d dv JOIN adj a ON a.v = dv.node
        JOIN d du ON du.node = a.u AND du.dist = dv.dist - 1
        GROUP BY dv.node
    ),
    path(step, node) AS (
        SELECT dist, node FROM d WHERE node = 'Central Plaza'
        UNION ALL
        SELECT p.step - 1, pm.pr
        FROM path p JOIN pmin pm ON pm.v = p.node
        WHERE p.step > 0
    ),
    hops AS (
        SELECT a.step AS step, a.node AS u, b.node AS v
        FROM path a JOIN path b ON b.step = a.step + 1
    )
    SELECT CAST(step AS INT) AS step, u AS src_name, t.p AS pred,
           v AS dst_name, 'forward' AS direction
    FROM hops JOIN t ON t.s = hops.u AND t.o = hops.v
    UNION ALL
    SELECT CAST(step AS INT), u, t.p, v, 'backward'
    FROM hops JOIN t ON t.s = hops.v AND t.o = hops.u
    """,
)
def kg_path_explain(spark, sf_dir):
    """Relation-chain explanation between two entities
    (graph.shortest_path_triples): the deterministic min-predecessor
    shortest path Berlin -> Central Plaza with every hop labeled by
    ALL asserting predicates and the assertion direction — the answer
    shape of the reference's graph-BFS Q&A tool. The twin re-derives
    BFS, election, backward walk, AND both label-join orientations in
    one recursive-CTE query over the kg_triples snapshot."""
    from ..operators.graph import shortest_path_triples

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    tri = res.triples.select("subj_name", "pred", "obj_name")
    return shortest_path_triples(tri, "Berlin", "Central Plaza")


@xq(
    "kg_quad_census",
    f"""
    WITH et AS (
        SELECT DISTINCT least(subj_name, obj_name) AS a,
               greatest(subj_name, obj_name) AS b
        FROM read_parquet('{_pq("kg_triples")}')
        WHERE subj_name <> obj_name
    ),
    deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM et UNION ALL SELECT b FROM et
        ) GROUP BY v
    ),
    tri AS (
        SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
        FROM et e1
        JOIN et e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN et e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    tv AS (
        SELECT v, count(*) AS tv FROM (
            SELECT n1 AS v FROM tri UNION ALL SELECT n2 FROM tri
            UNION ALL SELECT n3 FROM tri
        ) GROUP BY v
    ),
    te AS (
        SELECT a, b, count(*) AS te FROM (
            SELECT n1 AS a, n2 AS b FROM tri
            UNION ALL SELECT n1, n3 FROM tri
            UNION ALL SELECT n2, n3 FROM tri
        ) GROUP BY 1, 2
    ),
    adj AS (SELECT a AS v, b AS w FROM et UNION ALL SELECT b, a FROM et),
    cod AS (
        SELECT x.w AS p, y.w AS q, count(*) AS c
        FROM adj x JOIN adj y ON y.v = x.v AND x.w < y.w
        GROUP BY 1, 2
    ),
    ea AS (
        SELECT n1 AS a, n2 AS b, n3 AS apex FROM tri
        UNION ALL SELECT n1, n3, n2 FROM tri
        UNION ALL SELECT n2, n3, n1 FROM tri
    ),
    k4 AS (
        SELECT count(*) // 6 AS n_k4
        FROM ea x
        JOIN ea y ON y.a = x.a AND y.b = x.b AND x.apex < y.apex
        JOIN et ON et.a = x.apex AND et.b = y.apex
    ),
    sc AS (
        SELECT (SELECT count(*) FROM deg) AS n,
               (SELECT count(*) FROM et) AS m,
               (SELECT coalesce(sum(d * (d - 1) // 2), 0) FROM deg) AS w,
               (SELECT coalesce(sum(d * (d - 1) * (d - 2) // 6), 0)
                FROM deg) AS claw,
               (SELECT count(*) FROM tri) AS t,
               (SELECT coalesce(sum(tv.tv * (deg.d - 2)), 0)
                FROM tv JOIN deg ON deg.v = tv.v) AS n_paw,
               (SELECT coalesce(sum(te * (te - 1) // 2), 0) FROM te)
                   AS n_dia,
               (SELECT coalesce(sum((da.d - 1) * (db.d - 1)), 0)
                FROM et JOIN deg da ON da.v = et.a
                JOIN deg db ON db.v = et.b) AS p4_raw,
               (SELECT coalesce(sum(c * (c - 1) // 2), 0) // 2 FROM cod)
                   AS n_c4,
               (SELECT n_k4 FROM k4) AS n_k4
    ),
    i1 AS (SELECT *, n_k4 AS i_k4, n_dia - 6 * n_k4 AS i_dia FROM sc),
    i2 AS (
        SELECT *, n_paw - 4 * i_dia - 12 * i_k4 AS i_paw,
               n_c4 - i_dia - 3 * i_k4 AS i_c4
        FROM i1
    ),
    i3 AS (
        SELECT *, t * (n - 3) - 2 * i_dia - i_paw - 4 * i_k4 AS i_t3,
               p4_raw - 3 * t - 6 * i_dia - 2 * i_paw - 4 * i_c4
                   - 12 * i_k4 AS i_p4,
               claw - 2 * i_dia - i_paw - 4 * i_k4 AS i_s3
        FROM i2
    ),
    i4 AS (
        SELECT *, w * (n - 3) - 3 * i_s3 - 2 * i_p4 - 3 * i_t3
                   - 4 * i_c4 - 5 * i_paw - 8 * i_dia - 12 * i_k4 AS i_w2,
               m * (m - 1) // 2 - w - i_p4 - 2 * i_c4 - i_paw
                   - 2 * i_dia - 3 * i_k4 AS i_m2
        FROM i3
    ),
    i5 AS (
        SELECT *, m * (n - 2) * (n - 3) // 2 - 2 * i_m2 - 2 * i_w2
                   - 3 * (i_s3 + i_p4 + i_t3) - 4 * (i_c4 + i_paw)
                   - 5 * i_dia - 6 * i_k4 AS i_e1
        FROM i4
    ),
    i6 AS (
        SELECT *, n * (n - 1) * (n - 2) * (n - 3) // 24 - i_e1 - i_m2
                   - i_w2 - i_s3 - i_p4 - i_t3 - i_c4 - i_paw - i_dia
                   - i_k4 AS i_e0
        FROM i5
    )
    SELECT clazz, CAST(n AS HUGEINT) AS n FROM (
        SELECT 'empty' AS clazz, i_e0 AS n FROM i6
        UNION ALL SELECT 'one_edge', i_e1 FROM i6
        UNION ALL SELECT 'two_matching', i_m2 FROM i6
        UNION ALL SELECT 'two_wedge', i_w2 FROM i6
        UNION ALL SELECT 'three_triangle', i_t3 FROM i6
        UNION ALL SELECT 'three_path', i_p4 FROM i6
        UNION ALL SELECT 'three_star', i_s3 FROM i6
        UNION ALL SELECT 'four_cycle', i_c4 FROM i6
        UNION ALL SELECT 'four_tailed', i_paw FROM i6
        UNION ALL SELECT 'five_diamond', i_dia FROM i6
        UNION ALL SELECT 'six_clique', i_k4 FROM i6
    )
    """,
)
def kg_quad_census(spark, sf_dir):
    """Exact induced 11-class quad census (operators/triads.py
    quad_census — ESCAPE WWW'17 / Ortmann & Brandes 2017 arithmetic:
    triangle listing is the only enumeration, every other non-induced
    count is an aggregate, then the hand-derived containment-matrix
    inversion) over the extracted undirected entity graph — the
    4-node graphlet signature one order above kg_triad_census:
    over-canonicalization inflates clique/diamond mass, hub-spoke
    extraction shows as star dominance. The twin replicates the FULL
    pipeline in DuckDB (dyads, triangle join, codegree wedge join,
    per-edge apex K4 join, the same inversion); pytest pins the
    operator against a brute-force 4-subset classifier on random
    graphs."""
    from ..operators.triads import quad_census

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    und = res.triples.select(
        F.col("subj_name").alias("src"), F.col("obj_name").alias("dst")
    )
    return quad_census(und)


@xq(
    "kg_graphlet_orbits",
    f"""
    SELECT node_id, {", ".join(f"o{i}" for i in range(15))}
    FROM read_parquet('{_pq("graph_orbits")}')
    """,
)
def kg_graphlet_orbits(spark, sf_dir):
    """Per-entity graphlet degree vectors (Przulj 2007 orbits 0-14;
    operators/graph.graphlet_orbits — triangle + K4 enumeration only,
    every other orbit a node-keyed aggregate, then the brute-force-
    pinned containment inversion) over the extracted entity graph:
    the node-ROLE signature that separates hub-spoke anchors
    (claw-center o7) from clique cores (o13/o14) from chain relays
    (o5) at per-entity resolution — quad_census' node-level
    companion. Twin = precomputed pure-Python replication
    (precompute.gdv_py over the same subj-obj pairs), bit-exact;
    pytest additionally pins BOTH against a brute-force 3-/4-subset
    orbit enumerator on random graphs."""
    from ..operators.graph import graphlet_orbits

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    und = res.triples.select(
        F.col("subj_name").alias("src"), F.col("obj_name").alias("dst")
    )
    return graphlet_orbits(und)


@xq(
    "kg_role_census",
    f"""
    SELECT {", ".join(f"CAST(floor(log2(o{i} + 1)) AS INT) AS dlog{i}"
                      for i in range(15))},
           CAST(count(*) AS BIGINT) AS n_nodes,
           min(node_id) AS exemplar
    FROM read_parquet('{_pq("graph_orbits")}')
    GROUP BY {", ".join(f"dlog{i}" for i in range(15))}
    ORDER BY n_nodes DESC, exemplar ASC
    LIMIT 50
    """,
)
def kg_role_census(spark, sf_dir):
    """Structural-role equivalence census (graph.gdv_role_census):
    entities grouped by their damped floor-log2 GDV signature — the
    corpus-level reading of kg_graphlet_orbits (role-class
    populations; over-canonicalization collapses the census into few
    clique-core classes). One narrow projection + one bounded-key
    groupBy + TakeOrderedAndProject; the twin derives the identical
    signature arithmetic in DuckDB from the graph_orbits snapshot."""
    from ..operators.graph import gdv_role_census, graphlet_orbits

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    und = res.triples.select(
        F.col("subj_name").alias("src"), F.col("obj_name").alias("dst")
    )
    return gdv_role_census(graphlet_orbits(und))


@xq(
    "kg_degree_concentration",
    f"""
    WITH et AS (
        SELECT least(subj_name, obj_name) AS lo,
               greatest(subj_name, obj_name) AS hi
        FROM read_parquet('{_pq("kg_fact_assertions")}')
        WHERE subj_name <> obj_name
        GROUP BY 1, 2
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT lo AS node FROM et UNION ALL SELECT hi FROM et
        ) GROUP BY 1
    ),
    ranked AS (
        SELECT d, row_number() OVER (ORDER BY d, node) AS i FROM deg
    ),
    nn AS (SELECT count(*) AS n FROM deg)
    SELECT CAST(n AS BIGINT) AS n_nodes,
           CAST(sum(d) // 2 AS BIGINT) AS n_edges,
           CAST(max(d) AS BIGINT) AS max_degree,
           CAST(max(CASE WHEN i = (n + 1) // 2 THEN d END)
               AS BIGINT) AS median_degree,
           CAST(max(CASE WHEN i = (99 * n + 99) // 100 THEN d END)
               AS BIGINT) AS p99_degree,
           CAST((2 * sum(i * d) - (n + 1) * sum(d)) * 1000000
                // (n * sum(d)) AS BIGINT) AS gini_ppm,
           CAST(sum(CASE WHEN i > n - (n + 99) // 100 THEN d
                         ELSE 0 END) * 1000000
                // sum(d) AS BIGINT) AS top1pct_share_ppm
    FROM ranked CROSS JOIN nn
    GROUP BY n
    """,
)
def kg_degree_concentration(spark, sf_dir):
    """Hub-skew scorecard of the co-assertion entity graph
    (operators/graph.py:degree_concentration): exact-integer Gini,
    median/p99 degree, and top-1% endpoint share — the measured
    answer to 'does this key need salting' that the skew.py machinery
    acts on. Rank derivation is the two-phase global_rank (no
    SinglePartition on the node stream); the twin re-derives degrees,
    ranks, and the rank-formula Gini over the assertion snapshot."""
    from ..operators import closure as cl_ops
    from ..operators import facts as facts_ops
    from ..operators.graph import degree_concentration

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl_ops.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return degree_concentration(
        et.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
    )


@xq(
    "kg_lin_centrality",
    _HB_SQL_HEAD
    + f"""
    , x AS (
        SELECT t, node, e4,
               lag(e4) OVER (PARTITION BY node ORDER BY t) AS prev
        FROM pe
    ),
    a AS (
        SELECT node,
               sum(CASE WHEN t > 0
                        THEN t * greatest(e4 - prev, 0) END) AS sumdist_e4,
               max(CASE WHEN t = {_HB_N_ITER} THEN e4 END) AS reach_e4
        FROM x GROUP BY node
    )
    SELECT node,
           CAST(reach_e4 AS BIGINT) AS reach_e4,
           CAST(sumdist_e4 AS BIGINT) AS sumdist_e4,
           CASE WHEN sumdist_e4 > 0
                THEN CAST(CAST(reach_e4 AS HUGEINT) * reach_e4 * 100
                          // sumdist_e4 AS BIGINT) END AS lin_e6
    FROM a
    """,
)
def kg_lin_centrality(spark, sf_dir):
    """Approximate Lin centrality of every entity in the co-assertion
    graph (operators/graph.py:lin_centrality, Boldi-Vigna 2014 §7 —
    the disconnection-proof closeness: reach^2 over distance mass,
    so big-component nodes outrank isolated islands). The twin rides
    the shared fully-unrolled HyperBall head and replicates the
    clamped-delta distance sum, horizon reach, and DECIMAL floor
    ratio."""
    from ..operators import closure as cl_ops
    from ..operators import facts as facts_ops
    from ..operators.graph import lin_centrality

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    et = cl_ops.coassertion_edge_times(
        facts_ops.fact_assertions(res.triples, res.chunks)
    )
    return lin_centrality(
        et.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
        p=8,
        n_iter=_HB_N_ITER,
    )


@xq(
    "kg_inverse_predicates",
    f"""
    WITH tri AS (
        SELECT DISTINCT subj_name AS h, pred AS p, obj_name AS t
        FROM read_parquet('{_pq("kg_triples")}')
        WHERE subj_name <> obj_name
    ),
    sizes AS (SELECT p, count(*) AS n_pairs FROM tri GROUP BY p),
    ov AS (
        SELECT a.p AS pred, b.p AS pred_inv, count(*) AS n_overlap
        FROM tri a JOIN tri b ON a.h = b.t AND a.t = b.h
        GROUP BY a.p, b.p
    )
    SELECT pred, pred_inv, n_overlap,
           sp.n_pairs AS n_pairs_p, sq.n_pairs AS n_pairs_q,
           n_overlap * 1000000 // sp.n_pairs AS confidence_ppm
    FROM ov
    JOIN sizes sp ON sp.p = ov.pred
    JOIN sizes sq ON sq.p = ov.pred_inv
    """,
)
def kg_inverse_predicates(spark, sf_dir):
    """AMIE inverse-rule census (operators/rules.py): support and CWA
    confidence of p(x,y) => q(y,x) for every ordered predicate pair
    with any reversed overlap — the cross-predicate companion to
    kg_relation_profile's within-predicate symmetry column. Name-level
    entity identity (same as kg_functional_violations): inverse-pair
    detection is about surface co-assertion, typed identity would
    split legitimate reversals across type variants."""
    from ..operators import rules

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    tri = res.triples.select(
        F.col("subj_name").alias("src"),
        F.col("pred").alias("rel"),
        F.col("obj_name").alias("dst"),
    )
    return rules.inverse_rule_census(tri, "src", "rel", "dst")


@q(
    "kg_chunk_stats",
    f"""
    SELECT conv_id, n_chunks, max_position, total_chars, end_offset
    FROM read_parquet('{_pq("kg_chunk_stats")}')
    """,
)
def kg_chunk_stats(spark, sf_dir):
    from ..operators.chunking import chunk_transcripts
    from ..operators.linking import link_chunks

    chunks = link_chunks(chunk_transcripts(transcripts_for(spark, sf_dir)))
    return chunks.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("position").alias("max_position"),
        F.sum("length").alias("total_chars"),
        F.max(F.col("content_offset") + F.col("length")).alias("end_offset"),
    )


@q(
    "kg_nodes_canonical",
    f"""
    SELECT node_id, name, type, mention_chunks
    FROM read_parquet('{_pq("kg_nodes_canonical")}')
    """,
)
def kg_nodes_canonical(spark, sf_dir):
    res = run_pipeline(
        spark,
        transcripts_for(spark, sf_dir),
        PipelineConfig(deduplicate_nodes=True),
    )
    return res.nodes.select("node_id", "name", "type", "mention_chunks")


@xq(
    "kg_cluster_purity",
    f"""
    SELECT canon_id, n_members, n_names, n_types,
           majority_type, majority_n, purity_ppm
    FROM read_parquet('{_pq("kg_cluster_purity")}')
    """,
)
def kg_cluster_purity_q(spark, sf_dir):
    """Canonicalization-quality census (canonicalize.cluster_purity):
    per-canonical-cluster member/alias/type stats with the majority
    type elected by (count DESC, type ASC NULLS LAST) and integer
    trunc-div purity — a cluster below 1e6 mixes entity types, the
    highest-precision merge-error signal. Spark runs the real pipeline
    (mentions → canonicalize_nodes map → census); the twin reads the
    pure-Python replication of the full census under the oracle's
    transitive-closure map."""
    from ..operators.canonicalize import cluster_purity

    res = run_pipeline(
        spark,
        transcripts_for(spark, sf_dir),
        PipelineConfig(deduplicate_nodes=True),
    )
    nodes = res.mentions.select("node_id", "name", "type").dropDuplicates(
        ["node_id"]
    )
    return cluster_purity(nodes, res.canonical_map)


@xq(
    "kg_canonical_incremental",
    f"""
    SELECT node_id, canon_id
    FROM read_parquet('{_pq("kg_canonical_incremental")}')
    """,
)
def kg_canonical_incremental(spark, sf_dir):
    """Incremental canonicalization: first half of the conversations
    builds the map, the second half folds in incrementally — output is
    the updated full canonical map (pytest-asserted equal to the
    full-batch closure; rows-only here, extraction is Python)."""
    from ..operators.canonicalize import (
        canonicalize_incremental,
        canonicalize_nodes,
    )
    from ..sources.transcripts import generate_rows

    n = n_convs_for(sf_dir)
    rows_all = generate_rows(n)
    half_rows = [r for r in rows_all if int(r[0][4:]) < n // 2]
    rest_rows = [r for r in rows_all if int(r[0][4:]) >= n // 2]
    from ..sources.transcripts import TRANSCRIPT_SCHEMA

    def nodes_of(rows):
        df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
        res = run_pipeline(spark, df, PipelineConfig())
        return res.mentions.select("node_id", "name", "type").dropDuplicates(
            ["node_id"]
        ).localCheckpoint()

    n1, n2 = nodes_of(half_rows), nodes_of(rest_rows)
    cfg = PipelineConfig()
    map1 = canonicalize_nodes(n1, threshold=cfg.duplicate_score).localCheckpoint()
    return canonicalize_incremental(n1, map1, n2, threshold=cfg.duplicate_score)


@xq(
    "kg_nodes_with_tools",
    f"""
    SELECT node_id, name, type, tools, n_tools
    FROM read_parquet('{_pq("kg_nodes_with_tools")}')
    """,
)
def kg_nodes_with_tools(spark, sf_dir):
    """A5 camera-analog on real node properties: source_tools set-union
    across merged aliases (neo4j_db.py:1674 camera_id:'combine')."""
    res = run_pipeline(
        spark,
        transcripts_for(spark, sf_dir),
        PipelineConfig(deduplicate_nodes=True, node_source_tools=True),
    )
    return res.nodes.select(
        "node_id", "name", "type",
        F.concat_ws(",", "source_tools").alias("tools"),
        F.size("source_tools").alias("n_tools"),
    )


@q(
    "kg_similar_chunk_edges",
    f"""
    SELECT src, dst, score
    FROM read_parquet('{_pq("kg_similar_chunk_edges")}')
    """,
)
def kg_similar_chunk_edges(spark, sf_dir):
    from ..operators.chunking import chunk_transcripts

    chunks = chunk_transcripts(transcripts_for(spark, sf_dir)).dropDuplicates(
        ["chunk_id"]
    )
    with_emb = similarity.with_text_embeddings(chunks.select("chunk_id", "text"))
    return similarity.knn_similar_edges(
        with_emb, id_col="chunk_id", min_score=0.8, top_k=6
    )


@q(
    "embedding_near_dups",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_inner_product(a.v, b.v)
                 / (sqrt(list_inner_product(a.v, a.v))
                    * sqrt(list_inner_product(b.v, b.v))), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.v, b.v)
          / (sqrt(list_inner_product(a.v, a.v))
             * sqrt(list_inner_product(b.v, b.v))) > 0.4
    """,
)
def embedding_near_dups(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dups(emb, threshold=0.4, id_col="vec_id")
    # operator returns stringified ids in lexicographic pair order;
    # normalize to numeric a < b to match the SQL oracle
    ai, bi = F.col("a").cast("long"), F.col("b").cast("long")
    return pairs.select(
        F.least(ai, bi).alias("a"), F.greatest(ai, bi).alias("b"), "cosine"
    )


@q(
    "minhash_near_dups",
    f"""
    SELECT a, b, est_jaccard FROM read_parquet('{_pq("minhash_near_dups")}')
    """,
)
def minhash_near_dups(spark, sf_dir):
    return dedup.minhash_dedup(load(spark, sf_dir, "documents"), threshold=0.8)


@xq(
    "minhash_dedup_incremental",
    f"""
    WITH newdocs AS (SELECT doc_id FROM documents WHERE doc_id >= 250),
    pairs AS (SELECT a, b
              FROM read_parquet('{_pq("minhash_near_dups")}'))
    -- index ids are all < 250 and snapshot pairs are a < b, so a new
    -- doc is dropped iff it is the LARGER side of any near-dup pair
    -- (smaller side = an index doc or an earlier new doc — exactly the
    -- incremental drop policy)
    SELECT doc_id FROM newdocs
    WHERE doc_id NOT IN (SELECT b FROM pairs)
    """,
)
def minhash_dedup_incremental_q(spark, sf_dir):
    """Incremental near-dup ingest: the 500-doc corpus split into a
    stored index (doc_id < 250; its SIGNATURES are the only thing the
    operator reads) and a new batch (>= 250). The twin derives the
    same survivor set from the full-batch minhash snapshot — valid
    because incremental banding restricted to new-touching pairs
    equals full banding restricted the same way."""
    docs = load(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    idx = dedup.minhash_signatures(
        dedup.with_shingles(existing), id_col="doc_id"
    ).select("doc_id", "signature")
    return dedup.minhash_dedup_incremental(new, idx).select("doc_id")


@xq(
    "simhash_near_dups",
    f"""
    SELECT a, b, hamming FROM read_parquet('{_pq("simhash_near_dups")}')
    """,
)
def simhash_near_dups(spark, sf_dir):
    return dedup.simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=3)


@xq(
    "ann_ivf_topk",
    f"""
    SELECT query_id, vec_id, cosine, rank
    FROM read_parquet('{_pq("ann_ivf_topk")}')
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k — hash-checked against the precomputed
    pure-Python replication (oracle/precompute.py:ivf_topk_py: same
    hash-ordered sample via the XXH64 reimplementation, same
    deterministic k-means, same probe restriction, sequential-fold
    cosine; verified bit-exact)."""
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.cosine_topk_ivf(corpus, queries, k=10, n_clusters=16, nprobe=4)


@q(
    "c10_json_repair",
    f"""
    SELECT k, n, n_unparsed FROM read_parquet('{_pq("c10_json_repair")}')
    """,
)
def c10_json_repair(spark, sf_dir):
    """C10 malformed-JSON repair (reference json-repair dependency,
    pyproject.toml:48): deterministically mangle events.props into the
    classic LLM failure modes (fences+prose, single quotes, trailing
    comma, truncation, Python constants), repair in one Arrow batch
    pass, then extract typed fields JVM-side. The DuckDB twin is a
    precomputed table from the pure-Python replication of the same
    mangle+repair (oracle/precompute.py — it pins the Spark
    distribution; the repair rules are pytest-golden-verified)."""
    from ..functions.jsonrepair import parse_json_lenient_udf

    e = load(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(5))
    mangled = (
        F.when(m == 0, F.concat(F.lit("Here is the JSON:\n```json\n"),
                                F.col("props"), F.lit("\n```")))
        .when(m == 1, F.translate("props", '"', "'"))
        .when(m == 2, F.regexp_replace("props", r"\}$", ",}"))
        .when(m == 3, F.substring(
            F.col("props"), 1,
            F.greatest(F.lit(8), (F.length("props") * 0.6).cast("int"))))
        .otherwise(F.regexp_replace("props", "true", "True"))
    )
    fixed = e.withColumn("fixed", parse_json_lenient_udf()(mangled))
    return (
        fixed.withColumn("k", F.get_json_object("fixed", "$.k").cast("int"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("fixed").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unparsed"),
        )
    )


@q(
    "media_features",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CASE WHEN doc_id % 3 = 0
                THEN (54 + (doc_id % 12 + 4)
                           * ((3 * (doc_id % 16 + 4) + 3) // 4 * 4))::INT
                ELSE strlen(text)::INT END AS n_bytes,
           32::INT AS dim
    FROM documents
    """,
)
def media_features(spark, sf_dir):
    """Multimodal features: image rows carry REAL synthesized BMP
    payloads decoded by the pure-numpy codec (histogram features —
    pytest-verified against known pixels); audio/video stay behind the
    deterministic stub. SQL-checked: payload byte size (the BMP header
    + padded-row arithmetic for images, utf-8 length otherwise), kind
    routing, feature dim."""
    media = multimodal.synthesize_media(spark, load(spark, sf_dir, "documents"))
    feats = multimodal.extract_media_features(media, fake=True)
    return feats.select("media_id", "kind", "n_bytes", F.size("feature").alias("dim"))


@xq(
    "media_frame_plan",
    """
    SELECT doc_id AS media_id, i::INT AS frame_idx, (i * 1000)::INT AS ts_ms
    FROM documents, unnest(range(0,
         greatest(((doc_id % 9000 + 1000) / 1000)::INT, 1))) AS t(i)
    WHERE doc_id % 3 = 2
    """,
)
def media_frame_plan(spark, sf_dir):
    """Video frame-sampling plan (one row per planned frame) — pure JVM
    explode, SQL-checked against the metadata arithmetic."""
    media = multimodal.synthesize_media(spark, load(spark, sf_dir, "documents"))
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    return plan.select(
        "media_id",
        F.col("frame_idx").cast("int"),
        F.col("ts_ms").cast("int"),
    )


@xq(
    "media_resize_plan",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             (doc_id % 640 + 64)::INT AS src_w,
             (doc_id % 480 + 48)::INT AS src_h
      FROM documents WHERE doc_id % 3 = 0)
    SELECT media_id, src_w, src_h,
           round(least(1.0, 256.0 / greatest(src_w, src_h)), 6) AS scale,
           greatest(round(src_w * least(1.0, 256.0 / greatest(src_w, src_h)))::INT, 1) AS dst_w,
           greatest(round(src_h * least(1.0, 256.0 / greatest(src_w, src_h)))::INT, 1) AS dst_h
    FROM img
    """,
)
def media_resize_plan(spark, sf_dir):
    """Aspect-preserving resize plan (clamp longest side to 256, never
    upscale) — metadata arithmetic SQL-checked; pixel work stays behind
    the stub-gated decode."""
    media = multimodal.synthesize_media(spark, load(spark, sf_dir, "documents"))
    return multimodal.resize_plan(media, max_side=256)


# =========================================================================
# Corpus-trained LM perplexity (CCNet-style quality split)
# =========================================================================

@xq(
    "lm_perplexity",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents),
    p AS (SELECT doc_id,
                 unnest(words[1:len(words)-1]) AS w1,
                 unnest(words[2:len(words)]) AS w2
          FROM w WHERE len(words) >= 2),
    cb AS (SELECT w1, w2, count(*) AS c_big FROM p GROUP BY 1, 2),
    cc AS (SELECT w1, count(*) AS c_ctx FROM p GROUP BY 1),
    v AS (SELECT count(DISTINCT word) AS vocab
          FROM (SELECT unnest(words) AS word FROM w)),
    s AS (SELECT p.doc_id,
                 CAST(round(ln((cb.c_big + 0.5) / (cc.c_ctx + 0.5 * v.vocab))
                            * 1000000) AS BIGINT) AS lp
          FROM p JOIN cb USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v)
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           sum(lp)::BIGINT AS logprob_micro,
           round(exp(-(sum(lp) / 1000000.0) / count(*)), 4) AS ppl
    FROM s GROUP BY doc_id
    """,
)
def lm_perplexity(spark, sf_dir):
    """Corpus-trained add-alpha bigram LM perplexity per document
    (CCNet quality split, Wenzek et al. 2020 §4.3). Per-occurrence
    log-probs are rounded to integer micro-nats BEFORE the per-doc sum,
    so the aggregate is exact integer arithmetic on both engines."""
    return lm.bigram_lm_scores(load(spark, sf_dir, "documents"))


# =========================================================================
# As-of (point-in-time) join
# =========================================================================

@xq(
    "asof_latest_order",
    """
    WITH r AS (SELECT o_custkey, o_orderdate,
                      max(o_orderkey) AS o_orderkey,
                      max_by(o_totalprice, o_orderkey) AS o_totalprice
               FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, r.o_orderkey, r.o_totalprice
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey
     AND e.ts >= CAST(r.o_orderdate AS TIMESTAMP)
    """,
)
def asof_latest_order_q(spark, sf_dir):
    """Backward as-of join: each event enriched with the customer's
    latest order at event time — the union-window formulation checked
    against DuckDB's NATIVE ASOF LEFT JOIN. Right side deduplicated
    per (key, ts) first (max order key) so the match is unambiguous
    on both engines."""
    from ..operators import asof

    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    r = asof.dedup_right_latest(orders, "o_custkey", "o_orderdate", "o_orderkey")
    return asof.asof_join_backward(
        events.select("event_id", "user_id", "ts"),
        r,
        key_col_left="user_id",
        key_col_right="o_custkey",
        left_ts_col="ts",
        right_ts_col="o_orderdate",
        right_value_cols=["o_orderkey", "o_totalprice"],
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice")


# =========================================================================
# Gap-based sessionization
# =========================================================================

@xq(
    "event_sessions",
    """
    WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
                      lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS prev_us
               FROM events),
    f AS (SELECT event_id, user_id, ts,
                 CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM e),
    s AS (SELECT event_id, user_id,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS session_idx
          FROM f)
    SELECT event_id, user_id, session_idx,
           user_id::VARCHAR || '#' || session_idx::VARCHAR AS session_id
    FROM s
    """,
)
def event_sessions_q(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity boundary) — exact
    integer-microsecond gap comparisons, one user-keyed window."""
    from ..operators import sessions

    out = sessions.sessionize(load(spark, sf_dir, "events"), gap_seconds=1800)
    return out.select("event_id", "user_id", "session_idx", "session_id")


# =========================================================================
# BM25 keyword retrieval (lexical leg of hybrid retrieval)
# =========================================================================

@xq(
    "bm25_topk",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents WHERE text IS NOT NULL),
    st AS (SELECT count(*)::BIGINT AS n_docs,
                  sum(len(words))::BIGINT AS sum_dl FROM w),
    tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, unnest(words) AS term,
                         len(words)::BIGINT AS dl FROM w)
            GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY term),
    qt AS (SELECT doc_id AS query_id,
                  unnest(list_distinct(words[1:5])) AS term
           FROM w WHERE doc_id IN (0, 7, 42)),
    con AS (SELECT qt.query_id, tfc.doc_id,
                   CAST(round(ln(1.0 + (st.n_docs - dfc.df + 0.5)
                                       / (dfc.df + 0.5))
                        * (tfc.tf * 2.2)
                        / (tfc.tf + 1.2 * (0.25 + 0.75
                             * (tfc.dl * st.n_docs) / st.sum_dl))
                        * 1000000) AS BIGINT) AS c
            FROM qt JOIN tfc USING (term) JOIN dfc USING (term) CROSS JOIN st),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_micro
           FROM con GROUP BY 1, 2)
    SELECT query_id, doc_id, rank, score_micro FROM (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id)::INT AS rank,
             score_micro
      FROM sc) WHERE rank <= 10
    """,
)
def bm25_topk_q(spark, sf_dir):
    """Okapi BM25 (Lucene idf) top-10 per query; queries are the first
    five tokens of docs 0/7/42 ("more like this"). Micro-nat integer
    contributions make the score exact on both engines."""
    docs = load(spark, sf_dir, "documents")
    qs = bm25.sample_doc_queries(docs, [0, 7, 42], n_words=5)
    return bm25.bm25_topk(docs, qs, k=10)


@xq(
    "hybrid_rrf_topk",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents WHERE text IS NOT NULL),
    st AS (SELECT count(*)::BIGINT AS n_docs,
                  sum(len(words))::BIGINT AS sum_dl FROM w),
    tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, unnest(words) AS term,
                         len(words)::BIGINT AS dl FROM w)
            GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY term),
    qt AS (SELECT doc_id AS query_id,
                  unnest(list_distinct(words[1:5])) AS term
           FROM w WHERE doc_id IN (0, 7, 42)),
    con AS (SELECT qt.query_id, tfc.doc_id,
                   CAST(round(ln(1.0 + (st.n_docs - dfc.df + 0.5)
                                       / (dfc.df + 0.5))
                        * (tfc.tf * 2.2)
                        / (tfc.tf + 1.2 * (0.25 + 0.75
                             * (tfc.dl * st.n_docs) / st.sum_dl))
                        * 1000000) AS BIGINT) AS c
            FROM qt JOIN tfc USING (term) JOIN dfc USING (term) CROSS JOIN st),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_micro
           FROM con GROUP BY 1, 2),
    bmleg AS (SELECT query_id, doc_id, rank FROM (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id) AS rank
      FROM sc) WHERE rank <= 20),
    annleg AS (SELECT query_id, doc_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                      * sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))
                 DESC, c.vec_id ASC) AS rank
      FROM embeddings c, embeddings q
      WHERE q.vec_id IN (0, 7, 42)) t WHERE rank <= 20),
    u AS (SELECT query_id, doc_id,
                 CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c
          FROM bmleg
          UNION ALL
          SELECT query_id, doc_id,
                 CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c
          FROM annleg),
    f AS (SELECT query_id, doc_id, sum(c)::BIGINT AS rrf_micro,
                 count(*)::BIGINT AS n_legs
          FROM u GROUP BY 1, 2)
    SELECT query_id, doc_id, rrf_micro, n_legs, rank FROM (
      SELECT query_id, doc_id, rrf_micro, n_legs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_micro DESC, doc_id)::INT AS rank
      FROM f) WHERE rank <= 10
    """,
)
def hybrid_rrf_topk_q(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical leg + brute-force cosine dense
    leg (vec_id aligns 1:1 with doc_id in the testdata), fused with
    Reciprocal Rank Fusion (k=60). Only integer ranks cross the fusion
    boundary, so the fused scores are engine-exact."""
    from ..operators import fusion

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    qs = bm25.sample_doc_queries(docs, [0, 7, 42], n_words=5)
    lex = bm25.bm25_topk(docs, qs, k=20).select("query_id", "doc_id", "rank")
    qvec = emb.filter(F.col("vec_id").isin([0, 7, 42])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = ann.cosine_topk_bruteforce(emb, qvec, k=20).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    return fusion.rrf_fuse([lex, dense], rrf_k=60, topk=10)


# =========================================================================
# SemDeDup — cluster-then-prune semantic deduplication
# =========================================================================

@xq(
    "semantic_dedup",
    f"""
    SELECT vec_id, cluster_id, family_id, keep
    FROM read_parquet('{_pq("semantic_dedup")}')
    """,
)
def semantic_dedup_q(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    space, then within each cluster connect cosine>=threshold pairs and
    keep one member per family — the farthest from the centroid. Twin =
    precomputed pure-Python replication (same hash-ordered sample via
    the XXH64 reimplementation, same fixed-seed k-means, same sorted
    float32 GEMM), verified bit-exact."""
    from ..operators import semdedup

    return semdedup.semantic_dedup(
        load(spark, sf_dir, "embeddings"), threshold=0.4, n_clusters=16
    )


@xq(
    "embedding_pca",
    f"""
    SELECT vec_id, pc, value_micro
    FROM read_parquet('{_pq("embedding_pca")}')
    """,
)
def embedding_pca_q(spark, sf_dir):
    """Distributed PCA fit + projection to the top-8 components
    (the reduce-before-SemDeDup/ANN curation step). Fit = one
    posexplode mean agg + ONE mapInPandas Gram scan whose per-row
    products are micro-truncated BEFORE the int64 sums (exact,
    partitioning-independent); projection = pure-JVM sequential fold.
    Twin = precomputed pure-Python loop replication (same IEEE op
    order), eigh shared deliberately — see pca_project_py docstring."""
    from ..operators import pca

    return pca.pca_fit_project(
        load(spark, sf_dir, "embeddings"), dim=64, k=8
    )


# =========================================================================
# Bloom-filter decontamination (bounded-memory scale path)
# =========================================================================

@xq(
    "decontaminate_bloom",
    f"""
    SELECT doc_id, n_flagged_grams
    FROM read_parquet('{_pq("decontaminate_bloom")}')
    """,
)
def decontaminate_bloom_q(spark, sf_dir):
    """Decontamination through an m-bit/k-hash Bloom filter of the
    benchmark grams (broadcast side bounded by m_bits regardless of
    benchmark size; no false negatives, deterministic fixed-seed false
    positives). Benchmark planted exactly like `decontaminate`; twin =
    precomputed pure-Python replication via the XXH64 reimplementation,
    false positives included."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(dedup.normalized_text(F.col("text")), " ")
    bench = (
        docs.filter((F.col("doc_id") % 10 == 0) & (F.size(words) >= 12))
        .select(F.concat_ws(" ", F.slice(words, 5, 8)).alias("text"))
    )
    return dedup.decontaminate_bloom(docs, bench, n=8)


# =========================================================================
# IVF-PQ approximate nearest neighbor (memory-bounded index)
# =========================================================================

@xq(
    "ann_ivfpq_topk",
    f"""
    SELECT query_id, vec_id, approx_score, rank
    FROM read_parquet('{_pq("ann_ivfpq_topk")}')
    """,
)
def ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ top-k (Jégou et al. 2011): coarse cells bound WHICH
    vectors are scored, product-quantized codes bound WHAT is scored —
    the search never touches raw vectors after encoding (m_sub ints per
    vector ride the probe join instead of the full embedding). Twin =
    precomputed pure-Python replication (same hash-ordered sample,
    fixed-seed Lloyd's both stages, fixed-order float32 ADC),
    bit-exact."""
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.cosine_topk_ivfpq(
        corpus, queries, k=10, n_clusters=16, nprobe=4, m_sub=16, n_codes=32
    )


# =========================================================================
# DSIR importance resampling (Xie et al. 2023)
# =========================================================================

@xq(
    "dsir_select",
    f"""
    SELECT doc_id, n_grams, logw_micro, gumbel_micro, key_micro, rank
    FROM read_parquet('{_pq("dsir_select")}')
    """,
)
def dsir_select_q(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): hashed-n-gram bag models
    of a planted high-quality TARGET corpus (every 7th doc) vs the raw
    corpus; per-doc importance log-weight = exact integer dot product
    of bucket counts with micro-nat log-ratios; Gumbel-top-k selection
    with hash-derived (fully deterministic) noise. Twin = precomputed
    pure-Python replication via the XXH64 reimplementation."""
    from ..operators import dsir

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    return dsir.dsir_select(docs, target, k=50, n_buckets=2048)


# =========================================================================
# Learned quality classifier (fastText-style, vendored weights)
# =========================================================================

@xq(
    "quality_classifier",
    f"""
    SELECT doc_id, n_grams, dot_micro, logit, prob, keep
    FROM read_parquet('{_pq("quality_classifier")}')
    """,
)
def quality_classifier_q(spark, sf_dir):
    """fastText-style learned quality filter (Joulin et al. 2016 model
    shape; CCNet/LLaMA data-prep usage): vendored logistic-regression
    weights over hashed normalized {1,2}-gram mean bags, scored as an
    exact integer bucket dot product + fixed-order float tail. Twin =
    precomputed pure-Python replication via the XXH64
    reimplementation, float-bit-exact."""
    return textmetrics.quality_classifier(load(spark, sf_dir, "documents"))


# =========================================================================
# KG graph analytics: integer PageRank + degree profile
# =========================================================================

@xq(
    "kg_graph_pagerank",
    f"""
    SELECT node_id, rank_micro, out_deg, in_deg
    FROM read_parquet('{_pq("kg_graph_pagerank")}')
    """,
)
def kg_graph_pagerank_q(spark, sf_dir):
    """Entity-salience analytics the reference delegates to its graph
    DB / NetworkX plugin, run distributed instead: fixed-iteration
    integer-micro PageRank + per-node degree profile over the
    canonicalized KG edge list. The rank ordering doubles as the
    hot-key detector for salted joins. Twin = precomputed pure-Python
    replication of the identical integer recurrence."""
    from ..operators import graph

    res = run_pipeline(
        spark,
        transcripts_for(spark, sf_dir),
        PipelineConfig(deduplicate_nodes=True),
    )
    # one distinct-pair materialization shared by both analytics
    pairs = res.edges.select("src", "dst").dropDuplicates().localCheckpoint()
    return (
        graph.pagerank(pairs, deduped=True)
        .join(graph.degree_stats(pairs, deduped=True), "node_id")
        .select("node_id", "rank_micro", "out_deg", "in_deg")
    )


# =========================================================================
# Triangle census over the supplier co-occurrence graph
# =========================================================================

@xq(
    "kg_graph_triangles",
    """
    WITH pairs AS (
      SELECT a, b FROM (
        SELECT x.l_suppkey AS a, y.l_suppkey AS b,
               count(DISTINCT x.l_orderkey) AS n_orders
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        GROUP BY 1, 2
      ) WHERE n_orders >= 20
    ),
    deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT a AS n FROM pairs UNION ALL SELECT b AS n FROM pairs)
      GROUP BY n
    ),
    odeg AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
                  THEN p.a ELSE p.b END AS u,
             count(*) AS k
      FROM pairs p
      JOIN deg da ON p.a = da.n
      JOIN deg db ON p.b = db.n
      GROUP BY 1
    ),
    tri AS (
      SELECT count(*) AS t
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(COALESCE((SELECT sum(k * (k - 1) // 2) FROM odeg), 0)
                AS BIGINT) AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
    """,
)
def kg_graph_triangles_q(spark, sf_dir):
    """Exact triangle census (degree-ordered wedge orientation, Suri &
    Vassilvitskii 2011) over the supplier co-occurrence graph: an
    undirected edge per supplier pair sharing an order. The twin counts
    triangles by an INDEPENDENT algorithm — brute-force 3-way self-join
    on the a<b edge list — so the two sides agreeing checks the
    orientation scheme itself, not a transliteration of it; oriented
    wedges cross-check as sum C(outdeg, 2). Edges are gated on >= 20
    shared orders so the sf0.01 graph is a partial (non-complete)
    structure — on the ungated K100 every wedge closes and the count
    degenerates to C(100, 3)."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 20)
        .select("src", "dst")
    )
    return graph.triangle_count(pairs)


# =========================================================================
# Skip-gram pairs from the walk corpus
# =========================================================================

@xq(
    "kg_walk_skipgrams",
    """
    WITH RECURSIVE
    -- DISTINCT-over-UNION-ALL instead of UNION: DuckDB 1.0 drops a
    -- UNION's implicit dedup when the CTE is inlined into a recursive
    -- base term (reproduced; the explicit DISTINCT survives)
    edges AS (
      SELECT DISTINCT s, d FROM (
        SELECT 'c:' || o_custkey AS s, 'o:' || o_orderkey AS d
        FROM orders WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT 'o:' || l_orderkey, 's:' || l_suppkey
        FROM lineitem WHERE l_orderkey % 100 = 0
        UNION ALL
        SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
      )
    ),
    adj AS (
      SELECT s, d, row_number() OVER (PARTITION BY s ORDER BY d) AS slot
      FROM edges
    ),
    deg AS (SELECT s, count(*) AS out_deg FROM edges GROUP BY s),
    starts AS (
      SELECT DISTINCT node FROM (
        SELECT s AS node FROM edges UNION ALL SELECT d AS node FROM edges
      )
    ),
    walk(start, walk_id, pos, node) AS (
      SELECT node, CAST(w.j AS INTEGER), 0, node
      FROM starts, range(2) w(j)
      UNION ALL
      SELECT wk.start, wk.walk_id, wk.pos + 1, a.d
      FROM walk wk
      JOIN deg ON deg.s = wk.node
      JOIN adj a ON a.s = wk.node
       AND a.slot = CAST(concat('0x', substr(md5(concat_ws(chr(31),
             wk.start, CAST(wk.walk_id AS VARCHAR),
             CAST(wk.pos AS VARCHAR))), 1, 8)) AS BIGINT)
             % deg.out_deg + 1
      WHERE wk.pos < 3
    )
    SELECT a.node AS center, b.node AS context,
           b.pos - a.pos AS "offset",
           a.start, a.walk_id, a.pos AS center_pos
    FROM walk a JOIN walk b
      ON a.start = b.start AND a.walk_id = b.walk_id
    WHERE a.pos <> b.pos AND abs(b.pos - a.pos) <= 2
    """,
)
def kg_walk_skipgrams_q(spark, sf_dir):
    """The node-embedding training pairs themselves: skip-gram
    extraction (window 2) over the kg_random_walks corpus — one
    bounded self-join on the walk key. Twin = the same recursive walk
    replay plus the identical pair join."""
    from ..operators import walks

    orders_e = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("dst"),
        )
    )
    li_e = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    supp_e = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    edges = orders_e.unionAll(li_e).unionAll(supp_e)
    corpus = walks.random_walks(
        edges, walk_length=4, walks_per_node=2
    ).localCheckpoint()
    return walks.skipgram_pairs(corpus, window=2)

# =========================================================================
# Random-walk corpus for node-embedding training
# =========================================================================

@xq(
    "kg_random_walks",
    """
    WITH RECURSIVE
    -- DISTINCT-over-UNION-ALL instead of UNION: DuckDB 1.0 drops a
    -- UNION's implicit dedup when the CTE is inlined into a recursive
    -- base term (reproduced; the explicit DISTINCT survives)
    edges AS (
      SELECT DISTINCT s, d FROM (
        SELECT 'c:' || o_custkey AS s, 'o:' || o_orderkey AS d
        FROM orders WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT 'o:' || l_orderkey, 's:' || l_suppkey
        FROM lineitem WHERE l_orderkey % 100 = 0
        UNION ALL
        SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
      )
    ),
    adj AS (
      SELECT s, d, row_number() OVER (PARTITION BY s ORDER BY d) AS slot
      FROM edges
    ),
    deg AS (SELECT s, count(*) AS out_deg FROM edges GROUP BY s),
    starts AS (
      SELECT DISTINCT node FROM (
        SELECT s AS node FROM edges UNION ALL SELECT d AS node FROM edges
      )
    ),
    walk(start, walk_id, pos, node) AS (
      SELECT node, CAST(w.j AS INTEGER), 0, node
      FROM starts, range(2) w(j)
      UNION ALL
      SELECT wk.start, wk.walk_id, wk.pos + 1, a.d
      FROM walk wk
      JOIN deg ON deg.s = wk.node
      JOIN adj a ON a.s = wk.node
       AND a.slot = CAST(concat('0x', substr(md5(concat_ws(chr(31),
             wk.start, CAST(wk.walk_id AS VARCHAR),
             CAST(wk.pos AS VARCHAR))), 1, 8)) AS BIGINT)
             % deg.out_deg + 1
      WHERE wk.pos < 3
    )
    SELECT start, walk_id, pos, node FROM walk
    """,
)
def kg_random_walks_q(spark, sf_dir):
    """DeepWalk-style walk-corpus generation (Perozzi et al. 2014)
    over a heterogeneous customer->order->supplier->nation KG: 2
    md5-deterministic walks of length <= 4 from every node. Twin = a
    DuckDB RECURSIVE CTE replaying the identical hash-selected hops
    (portable md5), so the whole corpus matches row-for-row."""
    from ..operators import walks

    orders_e = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("dst"),
        )
    )
    li_e = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    supp_e = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    edges = orders_e.unionAll(li_e).unionAll(supp_e)
    return walks.random_walks(edges, walk_length=4, walks_per_node=2)


# =========================================================================
# k-core: dense-region extraction
# =========================================================================

@xq(
    "graph_kcore",
    f"""
    SELECT node_id, core_degree
    FROM read_parquet('{_pq("graph_kcore")}')
    """,
)
def graph_kcore_q(spark, sf_dir):
    """12-core of the supplier co-occurrence graph at the sparser
    >= 28-shared-orders gate (Seidman 1983 dense-region extraction —
    the structurally load-bearing-node filter): iterative peeling to
    the unique maximal subgraph of min-degree >= 12; a PROPER core
    here — 63 of 100 nodes survive a multi-round cascade. Twin =
    precomputed pure-Python replication of the peel fixpoint."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 28)
        .select("src", "dst")
    )
    return graph.k_core(pairs, k=12).select(
        F.col("node_id").cast("long").alias("node_id"),
        "core_degree",
    )


@xq(
    "kg_graph_betweenness",
    f"""
    SELECT node_id, betweenness_micro, n_pivots_used
    FROM read_parquet('{_pq("graph_betweenness")}')
    """,
)
def kg_graph_betweenness_q(spark, sf_dir):
    """Pivot-sampled Brandes betweenness (graph.betweenness_centrality,
    32 md5-ordered pivots) over the >= 28-gated supplier co-occurrence
    graph — the brokerage signal the degree/PageRank family cannot
    see. Twin = precomputed pure-Python Brandes under the identical
    floored-micro dependency arithmetic (precompute.betweenness_py),
    so the hash is bit-exact, not approximate."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 28)
        .select("src", "dst")
    )
    return graph.betweenness_centrality(pairs, n_pivots=32).select(
        F.col("node_id").cast("long").alias("node_id"),
        "betweenness_micro",
        "n_pivots_used",
    )


@xq(
    "kg_graph_bfs",
    """
    WITH RECURSIVE pairs AS (
      SELECT x.l_suppkey AS src, y.l_suppkey AS dst
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY x.l_suppkey, y.l_suppkey
      HAVING count(DISTINCT x.l_orderkey) >= 28
    ),
    adj AS (
      SELECT src AS u, dst AS v FROM pairs
      UNION
      SELECT dst AS u, src AS v FROM pairs
    ),
    seeds AS (
      SELECT node FROM (SELECT DISTINCT u AS node FROM adj)
      ORDER BY node LIMIT 2
    ),
    walk(node, dist) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT a.v, w.dist + 1
      FROM walk w JOIN adj a ON a.u = w.node
      WHERE w.dist < 6
    )
    SELECT CAST(node AS BIGINT) AS node_id,
           CAST(min(dist) AS INT) AS dist
    FROM walk GROUP BY node
    """,
)
def kg_graph_bfs_q(spark, sf_dir):
    """Exact multi-source BFS hop distances over the supplier
    co-occurrence graph, seeded at its two smallest node ids (a query's
    entity-mention set in the KG use). The DuckDB twin is a bounded
    RECURSIVE CTE taking min(dist) per node — an INDEPENDENT algorithm
    (enumerate-all-walks-then-min vs frontier-anti-join), so agreement
    checks the BFS invariant itself. Seed collect is 2 rows (the
    bounded query-vector pattern)."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 28)
        .select("src", "dst")
        .localCheckpoint()
    )
    nodes = pairs.select(F.col("src").alias("n")).unionAll(
        pairs.select(F.col("dst").alias("n"))
    )
    seeds = [
        r["n"] for r in nodes.distinct().orderBy("n").limit(2).collect()
    ]
    return graph.bfs_distances(
        pairs, seeds, max_depth=6, directed=False
    ).select(
        F.col("node_id").cast("long").alias("node_id"),
        F.col("dist").cast("int").alias("dist"),
    )


@xq(
    "kg_shortest_path",
    """
    WITH RECURSIVE pairs AS (
      SELECT x.l_suppkey AS src, y.l_suppkey AS dst
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY x.l_suppkey, y.l_suppkey
      HAVING count(DISTINCT x.l_orderkey) >= 28
    ),
    adj AS (
      SELECT src AS u, dst AS v FROM pairs
      UNION
      SELECT dst AS u, src AS v FROM pairs
    ),
    walk(node, dist) AS (
      SELECT 1, 0
      UNION
      SELECT a.v, w.dist + 1
      FROM walk w JOIN adj a ON a.u = w.node
      WHERE w.dist < 10
    ),
    d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node),
    pred AS (
      SELECT dv.node AS v, min(a.u) AS pred
      FROM d dv JOIN adj a ON a.v = dv.node
      JOIN d du ON du.node = a.u AND du.dist = dv.dist - 1
      GROUP BY dv.node
    ),
    path(step, node) AS (
      SELECT dist, node FROM d WHERE node = 60
      UNION ALL
      SELECT p.step - 1, pr.pred
      FROM path p JOIN pred pr ON pr.v = p.node
      WHERE p.step > 0
    )
    SELECT CAST(step AS INT) AS step, CAST(node AS BIGINT) AS node_id
    FROM path
    """,
)
def kg_shortest_path_q(spark, sf_dir):
    """One concrete shortest path (graph.shortest_path) between
    suppliers 1 and 60 — a diameter-realizing pair of the >= 28-gated
    co-occurrence graph — as (step, node_id) rows: the "how are X and
    Y connected" relation-chain explanation behind KG-RAG citations.
    Election is the minimum-predecessor rule on both engines, so the
    path is THE lexicographically-least shortest chain; the twin
    re-derives dist (recursive CTE), pred (min at dist-1), and the
    backward walk independently."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 28)
        .select("src", "dst")
    )
    return graph.shortest_path(pairs, 1, 60, max_depth=10).select(
        "step", F.col("node_id").cast("long").alias("node_id")
    )


# =========================================================================
# Negative sampling for KG-embedding training
# =========================================================================

@xq(
    "kg_negative_samples",
    """
    WITH tri AS (
      SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS src,
             'placed' AS rel,
             CAST(o_orderkey AS VARCHAR) AS dst
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    ents AS (
      SELECT e, row_number() OVER (ORDER BY e) AS idx
      FROM (SELECT src AS e FROM tri UNION SELECT dst AS e FROM tri)
    ),
    n AS (SELECT count(*) AS c FROM ents),
    attempts AS (
      SELECT t.src, t.rel, t.dst, sides.side,
             CAST(rj.j AS INTEGER) AS sample_idx,
             CAST(concat('0x', substr(md5(concat_ws(chr(31), sides.side,
                    t.src, t.rel, t.dst, CAST(rj.j AS VARCHAR))), 1, 8))
                  AS BIGINT) % n.c + 1 AS neg_idx
      FROM tri t, (VALUES ('src'), ('dst')) sides(side),
           range(2) rj(j), n
    ),
    sampled AS (
      SELECT a.src, a.rel, a.dst, a.side, a.sample_idx,
             e.e AS neg_entity
      FROM attempts a JOIN ents e ON e.idx = a.neg_idx
      WHERE CASE WHEN a.side = 'src' THEN e.e <> a.src
                 ELSE e.e <> a.dst END
    )
    SELECT s.* FROM sampled s
    ANTI JOIN tri t
      ON t.src = CASE WHEN s.side = 'src' THEN s.neg_entity ELSE s.src END
     AND t.rel = s.rel
     AND t.dst = CASE WHEN s.side = 'dst' THEN s.neg_entity ELSE s.dst END
    """,
)
def kg_negative_samples_q(spark, sf_dir):
    """TransE-style filtered negative sampling (Bordes et al. 2013)
    over a (customer, 'placed', order) triple slice: k md5-derived
    corruption attempts per triple per side, degenerate and
    true-triple corruptions dropped. Twin replicates the whole scheme
    in SQL — Spark and DuckDB md5 agree byte-for-byte, so the sampled
    entity set matches exactly."""
    from ..operators import negatives

    tri = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_custkey").alias("src"),
            F.lit("placed").alias("rel"),
            F.col("o_orderkey").alias("dst"),
        )
    )
    return negatives.negative_samples(tri, k=2)


# =========================================================================
# Personalized PageRank: seed-anchored graph-retrieval salience
# =========================================================================

@xq(
    "kg_graph_ppr",
    f"""
    SELECT node_id, ppr_micro
    FROM read_parquet('{_pq("kg_graph_ppr")}')
    """,
)
def kg_graph_ppr_q(spark, sf_dir):
    """Topic-sensitive PageRank (Haveliwala 2002) over the
    canonicalized KG: random walks restart at a query's entity seed
    set, so the ranking answers "which nodes matter for THIS query" —
    the graph-augmented-retrieval reranking step. Seeds here = the 3
    lexicographically smallest node ids (a bounded sort-limit collect,
    standing in for a real query's mention set). Twin = precomputed
    pure-Python replication of the identical integer recurrence."""
    from ..operators import graph

    res = run_pipeline(
        spark,
        transcripts_for(spark, sf_dir),
        PipelineConfig(deduplicate_nodes=True),
    )
    pairs = res.edges.select("src", "dst").dropDuplicates().localCheckpoint()
    nodes = pairs.select(F.col("src").alias("n")).union(
        pairs.select(F.col("dst").alias("n"))
    )
    seeds = [r.n for r in nodes.distinct().orderBy("n").limit(3).collect()]
    return graph.personalized_pagerank(pairs, seeds, deduped=True)


# =========================================================================
# Link prediction: structural scores for absent edges
# =========================================================================

@xq(
    "kg_link_prediction",
    """
    WITH pairs AS (
      SELECT a, b FROM (
        SELECT x.l_suppkey AS a, y.l_suppkey AS b,
               count(DISTINCT x.l_orderkey) AS n_orders
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        GROUP BY 1, 2
      ) WHERE n_orders >= 20
    ),
    sym AS (
      SELECT a AS n, b AS z FROM pairs
      UNION ALL SELECT b AS n, a AS z FROM pairs
    ),
    deg AS (SELECT n AS node, count(*) AS d FROM sym GROUP BY 1),
    centers AS (
      SELECT node AS z,
             CAST(round(1000000 / ln(d)) AS BIGINT) AS aa_micro
      FROM deg WHERE d >= 2
    ),
    cn AS (
      SELECT s1.n AS a, s2.n AS b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(c.aa_micro) AS BIGINT) AS adamic_adar_micro
      FROM sym s1
      JOIN sym s2 ON s1.z = s2.z AND s1.n < s2.n
      JOIN centers c ON c.z = s1.z
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT cn.* FROM cn
      ANTI JOIN pairs p ON cn.a = p.a AND cn.b = p.b
    )
    SELECT cand.a, cand.b, common_neighbors,
           common_neighbors * 1000000 // (da.d + db.d - common_neighbors)
             AS jaccard_ppm,
           adamic_adar_micro
    FROM cand
    JOIN deg da ON cand.a = da.node
    JOIN deg db ON cand.b = db.node
    """,
)
def kg_link_prediction_q(spark, sf_dir):
    """KG-completion link prediction (Liben-Nowell & Kleinberg 2003)
    over the thresholded supplier co-occurrence graph: for every
    non-adjacent distance-2 pair, common-neighbor count, integer-ppm
    Jaccard and micro-unit Adamic-Adar. Twin replicates the scores in
    pure SQL (DuckDB ln agrees with JVM log well inside the micro
    rounding)."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 20)
        .select("src", "dst")
    )
    # cap effectively off: the twin enumerates every center, and
    # supplier degrees stay far below any real hub regime
    return graph.link_prediction_scores(pairs, max_center_degree=10**9)


# =========================================================================
# Tokenize-and-pack: documents -> fixed-length training examples
# =========================================================================

@xq(
    "tokenize_and_pack",
    f"""
    SELECT example_id, n_tokens, tokens_csv
    FROM read_parquet('{_pq("tokenize_and_pack")}')
    """,
)
def tokenize_and_pack_q(spark, sf_dir):
    """The pretraining last mile: vendored byte-level BPE encode, global
    concat in doc_id order, cut into 512-token examples (exact
    concat-then-chunk semantics; Arrow-batched encode UDF + two-phase
    prefix sum + one example-keyed array shuffle). Twin = precomputed
    pure-Python replication with the same vendored merge table."""
    from ..operators import tokenize

    return tokenize.tokenize_and_pack(
        load(spark, sf_dir, "documents"), max_tokens=512
    )


# =========================================================================
# Hot-key skew diagnostics
# =========================================================================

@xq(
    "key_skew_report",
    """
    WITH c AS (SELECT event_type, user_id, count(*) AS cnt
               FROM events GROUP BY event_type, user_id),
    t AS (SELECT sum(cnt) AS total FROM c),
    top AS (SELECT * FROM c ORDER BY cnt DESC, event_type ASC, user_id ASC
            LIMIT 20)
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, event_type ASC, user_id ASC)
                AS INTEGER) AS rank,
           event_type, user_id, cnt,
           CAST((cnt * 1000000) // total AS BIGINT) AS frac_ppm,
           CAST((sum(cnt) OVER (ORDER BY cnt DESC, event_type ASC, user_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000) // total AS BIGINT) AS cum_frac_ppm
    FROM top CROSS JOIN t
    """,
)
def key_skew_report_q(spark, sf_dir):
    """Hot-key diagnostics over (event_type, user_id) of the events table:
    the measurement that decides salting vs normal shuffle before a
    big join ships. Integer ppm fractions keep the report bit-stable
    across engines."""
    from ..operators.skew import key_skew_report

    return key_skew_report(
        load(spark, sf_dir, "events"), ["event_type", "user_id"], top_k=20
    )


# =========================================================================
# Composed capstone: raw docs -> packed training examples
# =========================================================================

@xq(
    "training_data_pipeline",
    f"""
    SELECT example_id, n_tokens, tokens_csv
    FROM read_parquet('{_pq("training_data_pipeline")}')
    """,
)
def training_data_pipeline_q(spark, sf_dir):
    """End-to-end training-data production, chained from the operator
    library: learned quality gate (vendored classifier) -> DSIR top-200
    importance selection (target = every 7th kept doc) -> BPE
    tokenize-and-pack into 256-token examples. The twin is a pure-Python
    replication of the SAME composition, so the chaining itself — not
    just each stage — is hash-verified."""
    from ..operators import dsir, textmetrics, tokenize

    docs = load(spark, sf_dir, "documents")
    kept = (
        textmetrics.quality_classifier(docs)
        .filter(F.col("keep"))
        .select("doc_id")
        .join(docs, "doc_id")
    )
    selected = (
        dsir.dsir_select(
            kept, kept.filter(F.col("doc_id") % 7 == 0), k=200, n_buckets=2048
        )
        .select("doc_id")
        .join(kept, "doc_id")
    )
    return tokenize.tokenize_and_pack(selected, max_tokens=256)


# =========================================================================
# TF-IDF keyword extraction (corpus statistics for doc summarization)
# =========================================================================

@xq(
    "tfidf_keywords",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             CAST(round(1000000 * ln(n.n / df.df)) AS BIGINT) AS idf_micro
      FROM tf JOIN df USING (token) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, token, tf, idf_micro,
             tf * idf_micro AS score_micro,
             CAST(row_number() OVER (
               PARTITION BY doc_id
               ORDER BY tf * idf_micro DESC, token ASC) AS INTEGER) AS rk
      FROM scored
    )
    SELECT doc_id, token, tf, idf_micro, score_micro, rk
    FROM ranked WHERE rk <= 3
    """,
)
def tfidf_keywords_q(spark, sf_dir):
    """Top-3 TF-IDF keywords per document — exact corpus-wide idf in
    integer micro-nats; the df table is derived from the tf frame (one
    token scan total) and corpus size N attaches as a broadcast 1-row
    crossJoin, no driver action."""
    return textmetrics.tfidf_keywords(
        load(spark, sf_dir, "documents"), top_k=3
    ).select("doc_id", "token", "tf", "idf_micro", "score_micro", "rk")


# =========================================================================
# PMI-weighted co-occurrence edges (statistical edge weighting)
# =========================================================================

@xq(
    "kg_pmi_edges",
    """
    WITH occ AS (
      SELECT DISTINCT l_orderkey AS g, l_suppkey AS i
      FROM lineitem
    ),
    pairs AS (
      SELECT x.i AS a, y.i AS b, count(*) AS n_ab
      FROM occ x JOIN occ y ON x.g = y.g AND x.i < y.i
      GROUP BY 1, 2
      HAVING count(*) >= 20
    ),
    items AS (SELECT i, count(*) AS n_i FROM occ GROUP BY 1),
    n AS (SELECT CAST(count(DISTINCT g) AS DOUBLE) AS n FROM occ)
    SELECT p.a, p.b, p.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
           CAST(round(1000000 * (ln(CAST(p.n_ab AS DOUBLE)) + ln(n.n)
                - ln(CAST(ia.n_i AS DOUBLE)) - ln(CAST(ib.n_i AS DOUBLE))))
                AS BIGINT) AS pmi_micro
    FROM pairs p
    JOIN items ia ON p.a = ia.i
    JOIN items ib ON p.b = ib.i
    CROSS JOIN n
    """,
)
def kg_pmi_edges_q(spark, sf_dir):
    """PMI weights over the supplier co-occurrence graph (orders as
    co-occurrence groups, >= 20 shared orders): the statistical
    upgrade of the raw co-mention edge list the canonicalization CC
    runs on. Log-sum form keeps intermediates in double range at any
    corpus size; micro-rounding makes the weight an exact integer."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    return graph.pmi_edges(
        li.select(
            F.col("l_orderkey").alias("g"), F.col("l_suppkey").alias("i")
        ),
        "g",
        "i",
        min_pair_count=20,
    )


# =========================================================================
# Keyed snapshot diff (incremental graph materialization delta)
# =========================================================================

@xq(
    "kg_snapshot_diff",
    """
    WITH old_snap AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 != 0
    ),
    new_snap AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             o_totalprice
      FROM orders WHERE o_orderkey % 13 != 0
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           o.o_orderstatus AS old_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus,
           n.o_totalprice AS new_o_totalprice
    FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
)
def kg_snapshot_diff_q(spark, sf_dir):
    """Row-level delta between two simulated materialization epochs of
    the orders table (mod-11 rows absent from the old epoch, mod-13
    rows deleted in the new, mod-7 statuses rewritten): the
    incremental-materialize primitive — downstream cost scales with
    churn, not table size. One full-outer sort-merge join."""
    from ..operators.diff import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@xq(
    "scd2_user_status",
    """
    WITH marked AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER w AS prev,
             lag(ts) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    episodes AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM marked
      WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from
           ) AS valid_to
    FROM episodes
    """,
)
def scd2_user_status_q(spark, sf_dir):
    """SCD type-2 intervals over the event log: each user's event_type
    history compressed to state episodes with valid_from/valid_to
    (NULL = current). Consecutive identical events collapse; both
    windows share one user-keyed Exchange."""
    from ..operators.diff import scd2_from_changelog

    events = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    return scd2_from_changelog(
        events, ["user_id"], "ts", ["event_type"]
    )


@q(
    "record_linkage",
    """
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w != '') AS ws
      FROM documents
    ),
    base AS (SELECT * FROM ws WHERE len(ws) >= 8),
    recs AS (
      SELECT doc_id AS rec, 'l' AS side,
             array_to_string(ws[1:6], ' ') AS name FROM base
      UNION ALL
      SELECT doc_id AS rec, 'r' AS side,
             array_to_string(ws[3:8], ' ') AS name FROM base
      WHERE doc_id % 2 = 0
    ),
    tok AS (
      SELECT side, rec,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(name), '[^a-z0-9]+'),
               w -> w != ''))) AS token
      FROM recs
    ),
    kept AS (SELECT token FROM tok GROUP BY token HAVING count(*) <= 200),
    ltok AS (SELECT rec, token FROM tok JOIN kept USING (token)
             WHERE side = 'l'),
    rtok AS (SELECT rec, token FROM tok JOIN kept USING (token)
             WHERE side = 'r'),
    lsz AS (SELECT rec, count(*) AS l_size FROM ltok GROUP BY rec),
    rsz AS (SELECT rec, count(*) AS r_size FROM rtok GROUP BY rec),
    sh AS (
      SELECT l.rec AS l_key, r.rec AS r_key, count(*) AS shared_tokens
      FROM ltok l JOIN rtok r USING (token) GROUP BY 1, 2
    ),
    sc AS (
      SELECT l_key, r_key, shared_tokens, l_size, r_size,
             (shared_tokens * 1000000)
               // (l_size + r_size - shared_tokens) AS jaccard_ppm
      FROM sh JOIN lsz ON sh.l_key = lsz.rec
              JOIN rsz ON sh.r_key = rsz.rec
    )
    SELECT l_key, r_key, shared_tokens, l_size, r_size, jaccard_ppm
    FROM sc WHERE jaccard_ppm >= 150000
    QUALIFY row_number() OVER (
              PARTITION BY l_key ORDER BY jaccard_ppm DESC, r_key) = 1
        AND row_number() OVER (
              PARTITION BY r_key ORDER BY jaccard_ppm DESC, l_key) = 1
    """,
)
def record_linkage_q(spark, sf_dir):
    """Two-table fuzzy record linkage on a deterministically corrupted
    feed: left = each document's first 6 words, right = words 3-8 of
    even documents (a shifted-window corruption sharing 4 of 6 words
    when words are distinct). df_cap=200 drops stopword-grade tokens
    from blocking AND scoring; mutual-best keeps agreed 1:1 matches.
    The twin replicates tokenize/cap/score/mutual-best in SQL."""
    from ..operators.linkage import link_records

    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda w: w != "",
    )
    base = (
        load(spark, sf_dir, "documents")
        .select("doc_id", words.alias("ws"))
        .filter(F.size("ws") >= 8)
    )
    left = base.select(
        F.col("doc_id").alias("l_key"),
        F.concat_ws(" ", F.slice("ws", 1, 6)).alias("l_name"),
    )
    right = base.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("r_key"),
        F.concat_ws(" ", F.slice("ws", 3, 6)).alias("r_name"),
    )
    return link_records(
        left, right, "l_key", "l_name", "r_key", "r_name",
        min_jaccard_ppm=150_000, df_cap=200, mutual_best=True,
    )


# =========================================================================
# Label-propagation communities over the supplier co-occurrence graph
# =========================================================================

@xq(
    "kg_graph_lpa",
    f"""
    SELECT node_id, label, n_iter
    FROM read_parquet('{_pq("graph_lpa")}')
    """,
)
def kg_graph_lpa_q(spark, sf_dir):
    """Deterministic synchronous label propagation (min-label
    tie-break) over the >= 35-gated supplier co-occurrence graph — 63
    nodes split into 26 communities, and the run exercises the
    max_iter bound (synchronous LPA 2-cycles on bipartite fragments).
    Twin = precomputed pure-Python replication of the identical
    sweep."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 35)
        .select("src", "dst")
    )
    return graph.label_propagation(pairs, max_iter=10)


# =========================================================================
# MMR-diversified retrieval rerank
# =========================================================================

@xq(
    "ann_mmr_topk",
    f"""
    SELECT query_id, vec_id, rel, mmr_micro, sel_rank
    FROM read_parquet('{_pq("ann_mmr_topk")}')
    """,
)
def ann_mmr_topk_q(spark, sf_dir):
    """MMR diversification of the brute-force cosine top-25 candidate
    set down to 10 per query (lambda = 0.7): the rerank between
    retrieval and EP3 context assembly that stops near-duplicate
    chunks wasting the context window. The greedy sweep runs inside
    one applyInPandas over the BOUNDED candidate set (the corpus is
    never touched after candidate generation). Twin = precomputed
    pure-Python replication: same sequential-fold cosines, same
    integer-micro greedy."""
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = ann.cosine_topk_bruteforce(corpus, queries, k=25).join(
        corpus.select("vec_id", "embedding"), "vec_id"
    )
    return ann.mmr_rerank(cands, k=10, lambda_pct=70)


# =========================================================================
# HyperLogLog distinct sketch (mergeable cardinality state)
# =========================================================================

@q(
    "hll_user_distinct",
    """
    WITH reg AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 256 AS bucket,
             max(CASE WHEN CAST(concat('0x',
                        substr(md5(CAST(user_id AS VARCHAR)), 9, 12))
                        AS BIGINT) = 0 THEN 49
                      ELSE 49 - length(bin(CAST(concat('0x',
                        substr(md5(CAST(user_id AS VARCHAR)), 9, 12))
                        AS BIGINT))) END) AS m_j
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type, count(*) AS n_registers,
             sum(1::BIGINT << (49 - m_j)) AS s_present
      FROM reg GROUP BY 1
    ),
    est AS (
      SELECT event_type, n_registers,
             256 - n_registers AS n_empty,
             CAST(s_present + (256 - n_registers) * (1::BIGINT << 49)
                  AS BIGINT) AS harmonic_s49
      FROM agg
    )
    SELECT event_type,
           CAST(n_registers AS BIGINT) AS n_registers,
           CAST(n_empty AS INTEGER) AS n_empty,
           harmonic_s49,
           round(CASE WHEN n_empty > 0
                       AND (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                           * 562949953421312.0
                           / CAST(harmonic_s49 AS DOUBLE) <= 640.0
                      THEN 256.0 * ln(256.0 / CAST(n_empty AS DOUBLE))
                      ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                           * 562949953421312.0
                           / CAST(harmonic_s49 AS DOUBLE) END,
                 4) AS estimate
    FROM est
    """,
)
def hll_user_distinct_q(spark, sf_dir):
    """Per-event-type distinct-user estimate from a 256-register
    HyperLogLog — the mergeable replacement for countDistinct at
    ingest-metrics scale (registers are partial aggregates: map-side
    combine + cross-epoch max-merge + idempotent replay all come
    free). The ENTIRE estimator is replicated in the SQL twin — md5
    bucket/rho, exact-integer harmonic sum, alpha product, linear-
    counting regime switch — so the sketch implementation itself is
    hash-gated, not just its output shape."""
    from ..operators import sketches

    return sketches.hll_count_distinct(
        load(spark, sf_dir, "events"), ["event_type"], "user_id", p=8
    )


# =========================================================================
# Count-Min heavy hitters (bounded-state frequency estimates)
# =========================================================================

@xq(
    "cms_heavy_hitters",
    """
    WITH hashed AS (
      SELECT user_id,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS h1,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 9, 8))
                  AS BIGINT) * 2 + 1 AS h2
      FROM events WHERE user_id IS NOT NULL
    ),
    cells AS (
      SELECT r.rw, (h.h1 + r.rw * h.h2) % 1024 AS bucket, count(*) AS cnt
      FROM hashed h CROSS JOIN range(4) r(rw)
      GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id, h1, h2 FROM hashed),
    probe AS (
      SELECT k.user_id, r.rw, (k.h1 + r.rw * k.h2) % 1024 AS bucket
      FROM keys k CROSS JOIN range(4) r(rw)
    ),
    est AS (
      SELECT p.user_id, CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS est
      FROM probe p LEFT JOIN cells c ON p.rw = c.rw AND p.bucket = c.bucket
      GROUP BY 1
    ),
    exact AS (
      SELECT user_id, count(*) AS exact_cnt
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT est.user_id, est.est, exact.exact_cnt
    FROM est JOIN exact USING (user_id)
    ORDER BY est.est DESC, est.user_id ASC
    LIMIT 20
    """,
)
def cms_heavy_hitters_q(spark, sf_dir):
    """Count-Min frequency estimates for every distinct user against
    the exact counts, top-20 by estimate: the bounded-state heavy-
    hitter detector (sketch state = depth x width cells regardless of
    key cardinality; merges by SUM across partitions/epochs). Twin
    replicates the whole sketch — md5 cells, probe min, exact join —
    so over-count collisions, not just shape, are hash-gated."""
    from ..operators import sketches

    events = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    cms = sketches.cms_build(events, "user_id", depth=4, width=1024)
    keys = events.select("user_id").dropDuplicates()
    est = sketches.cms_query(cms, keys, "user_id", depth=4, width=1024)
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        est.join(exact, "user_id")
        .orderBy(F.col("est").desc(), F.col("user_id").asc())
        .limit(20)
    )


# =========================================================================
# Histogram quantiles (single-pass mergeable distribution summary)
# =========================================================================

@xq(
    "histogram_quantiles",
    """
    WITH vals AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    bounds AS (
      SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM vals
    ),
    binned AS (
      SELECT CASE WHEN b.hi = b.lo THEN 0
                  ELSE least(999, CAST(floor((v.x - b.lo) / (b.hi - b.lo)
                       * 1000) AS BIGINT)) END AS bin
      FROM vals v CROSS JOIN bounds b
    ),
    cum AS (
      SELECT bin, count(*) AS cnt,
             sum(count(*)) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_count
      FROM binned GROUP BY bin
    ),
    qs AS (SELECT unnest([50, 90, 99]) AS q),
    hit AS (
      SELECT qs.q, min(cum.bin) AS bin
      FROM qs CROSS JOIN cum CROSS JOIN bounds b
      WHERE cum.cum_count >= (qs.q * b.n + 99) // 100
      GROUP BY qs.q
    )
    SELECT hit.q, hit.bin,
           round(b.lo + (hit.bin + 1) * (b.hi - b.lo) / 1000, 6) AS upper_edge,
           CAST(cum.cum_count AS BIGINT) AS cum_count,
           b.n AS n_total
    FROM hit JOIN cum USING (bin) CROSS JOIN bounds b
    """,
)
def histogram_quantiles_q(spark, sf_dir):
    """p50/p90/p99 of lineitem extended price from a 1000-bin one-pass
    histogram — the scan-bound, mergeable (bin counts sum like CMS
    cells) replacement for percentile_approx, with the estimator fully
    visible: integer bins/thresholds, the only floats are the two data
    edges. Twin replicates bins, cum-sum, and threshold arithmetic."""
    from ..operators import sketches

    return sketches.histogram_quantiles(
        load(spark, sf_dir, "lineitem"), "l_extendedprice",
        n_bins=1000, quantiles=(50, 90, 99),
    )


# =========================================================================
# Random-indexing entity embeddings over the PMI graph
# =========================================================================

@xq(
    "kg_entity_embeddings",
    """
    WITH occ AS (
      SELECT DISTINCT l_orderkey AS g, l_suppkey AS i
      FROM lineitem
    ),
    pairs AS (
      SELECT x.i AS a, y.i AS b, count(*) AS n_ab
      FROM occ x JOIN occ y ON x.g = y.g AND x.i < y.i
      GROUP BY 1, 2
      HAVING count(*) >= 20
    ),
    items AS (SELECT i, count(*) AS n_i FROM occ GROUP BY 1),
    n AS (SELECT CAST(count(DISTINCT g) AS DOUBLE) AS n FROM occ),
    pmi AS (
      SELECT p.a, p.b,
             CAST(round(1000000 * (ln(CAST(p.n_ab AS DOUBLE)) + ln(n.n)
                  - ln(CAST(ia.n_i AS DOUBLE)) - ln(CAST(ib.n_i AS DOUBLE))))
                  AS BIGINT) AS w
      FROM pairs p
      JOIN items ia ON p.a = ia.i
      JOIN items ib ON p.b = ib.i
      CROSS JOIN n
    ),
    sym AS (
      SELECT a AS x, b AS y, w FROM pmi
      UNION ALL
      SELECT b AS x, a AS y, w FROM pmi
    ),
    terms AS (
      SELECT s.x, s.y, s.w, r.j,
             CASE WHEN CAST(concat('0x', substr(md5(concat(
                    CAST(r.j AS VARCHAR), chr(31), CAST(s.y AS VARCHAR))),
                    1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM sym s CROSS JOIN range(8) r(j)
    )
    SELECT x AS node_id, CAST(j AS INTEGER) AS j,
           CAST(sum(w * sgn) AS BIGINT) AS emb_micro
    FROM terms GROUP BY 1, 2
    """,
)
def kg_entity_embeddings_q(spark, sf_dir):
    """Training-free 8-dim supplier embeddings by random indexing over
    the PMI-weighted co-occurrence graph — the one-aggregation
    alternative to walk-corpus + skip-gram training for entity
    similarity features. All-integer coordinates (micro PMI x +/-1
    md5 signs), so the embedding itself is hash-gated in the twin."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    pmi = graph.pmi_edges(
        li.select(
            F.col("l_orderkey").alias("g"), F.col("l_suppkey").alias("i")
        ),
        "g",
        "i",
        min_pair_count=20,
    )
    emb = graph.random_indexing_embeddings(pmi, dim=8)
    return emb.select("node_id", F.col("j").cast("int").alias("j"), "emb_micro")


# =========================================================================
# Bucketed range join (point-in-interval without a nested-loop join)
# =========================================================================

@xq(
    "range_join_coverage",
    """
    WITH pts AS (
      SELECT DISTINCT date_diff('day', DATE '1970-01-01',
               CAST(l_shipdate AS DATE)) AS ship_day
      FROM lineitem WHERE l_shipdate IS NOT NULL
    ),
    iv AS (
      SELECT date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS s,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               + (o_orderkey % 30 + 1) AS e
      FROM orders WHERE o_orderdate IS NOT NULL
    )
    SELECT p.ship_day, CAST(count(i.s) AS BIGINT) AS n_covering
    FROM pts p LEFT JOIN iv i ON p.ship_day BETWEEN i.s AND i.e
    GROUP BY 1
    """,
)
def range_join_coverage_q(spark, sf_dir):
    """Per distinct ship day, the number of synthetic order windows
    [o_orderdate, o_orderdate + (o_orderkey % 30 + 1) days] covering
    it — the point-in-interval join Spark would otherwise plan as a
    BroadcastNestedLoopJoin. The bucketed rewrite (width 32 days)
    makes it an equi-join on the bucket id; the twin is DuckDB's
    native inequality join, so match semantics (inclusive bounds,
    zero-coverage retention) are value-checked end to end."""
    from ..operators import intervals

    epoch = F.lit("1970-01-01").cast("date")
    pts = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select(
            F.datediff(F.col("l_shipdate").cast("date"), epoch).alias(
                "ship_day"
            )
        )
    )
    iv = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("s"),
            (
                F.datediff(F.col("o_orderdate").cast("date"), epoch)
                + (F.col("o_orderkey") % 30 + 1)
            ).alias("e"),
        )
    )
    return intervals.coverage_counts(
        pts, iv, "ship_day", "s", "e", bucket_width=32
    )


@xq(
    "range_join_overlaps",
    """
    WITH l AS (
      SELECT event_id AS l_event_id, user_id,
             epoch_us(ts) AS l_start, epoch_us(ts) + 3600000000 AS l_end
      FROM events WHERE event_id % 2 = 0
    ),
    r AS (
      SELECT event_id AS r_event_id, user_id AS r_user,
             epoch_us(ts) AS r_start, epoch_us(ts) + 1800000000 AS r_end
      FROM events WHERE event_id % 2 = 1
    )
    SELECT l.user_id, l.l_event_id, r.r_event_id,
           least(l.l_end, r.r_end)
             - greatest(l.l_start, r.r_start) AS overlap_us
    FROM l JOIN r
      ON l.user_id = r.r_user
     AND l.l_start <= r.r_end AND r.r_start <= l.l_end
    """,
)
def range_join_overlaps_q(spark, sf_dir):
    """Interval x interval overlap join: even-event 1-hour windows vs
    odd-event 30-minute windows of the same user, all integer
    microseconds. The bucketed rewrite emits each pair exactly once
    from the bucket owning max(start, start); the twin is DuckDB's
    native inequality join — an independent algorithm — including the
    overlap length arithmetic."""
    from ..operators import intervals

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("l_event_id"),
        "user_id",
        us.alias("l_start"),
        (us + 3600_000_000).alias("l_end"),
    )
    right = ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("r_event_id"),
        F.col("user_id").alias("r_user"),
        us.alias("r_start"),
        (us + 1800_000_000).alias("r_end"),
    )
    pairs = intervals.range_join_intervals(
        left, right, "l_start", "l_end", "r_start", "r_end",
        bucket_width=3600_000_000,
        keys=[("user_id", "r_user")],
    )
    return pairs.select(
        "user_id",
        "l_event_id",
        "r_event_id",
        (
            F.least("l_end", "r_end") - F.greatest("l_start", "r_start")
        ).alias("overlap_us"),
    )


# =========================================================================
# Z-order clustering key (lakehouse layout for multi-column data skipping)
# =========================================================================

def _zorder_twin_sql(bits: int = 8) -> str:
    # the same interleave arithmetic as layout.add_zorder_key, spelled
    # in portable SQL: bit j of cell i -> position j*2 + i
    terms = " + ".join(
        f"(((c{i} >> {j}) & 1) << {j * 2 + i})"
        for i in range(2)
        for j in range(bits)
    )
    return f"""
    WITH b AS (
      SELECT min(l_orderkey) AS lo0, max(l_orderkey) AS hi0,
             min(l_partkey) AS lo1, max(l_partkey) AS hi1
      FROM lineitem
    ),
    cells AS (
      SELECT l_orderkey, l_partkey, l_linenumber,
             CAST((l_orderkey - b.lo0) * {2 ** bits}
                  // (b.hi0 - b.lo0 + 1) AS BIGINT) AS c0,
             CAST((l_partkey - b.lo1) * {2 ** bits}
                  // (b.hi1 - b.lo1 + 1) AS BIGINT) AS c1
      FROM lineitem CROSS JOIN b
    )
    SELECT l_orderkey, l_partkey, l_linenumber,
           CAST({terms} AS BIGINT) AS zkey
    FROM cells
    """


@xq("zorder_key_lineitem", _zorder_twin_sql(8))
def zorder_key_lineitem_q(spark, sf_dir):
    """Z-order clustering key over (l_orderkey, l_partkey) — the
    write-side layout primitive behind OPTIMIZE ZORDER BY: interleaved
    min/max-normalized cell bits, all-integer output, so the twin
    reproduces every key bit-for-bit. Data-skipping evidence (parquet
    min-max stats pruning on BOTH dimensions) is asserted separately
    in tests/test_layout.py."""
    from ..operators import layout

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    return layout.add_zorder_key(li, ["l_orderkey", "l_partkey"], bits=8)


# =========================================================================
# KMV sketch set overlap (distinct intersections — HLL cannot do this)
# =========================================================================

@xq(
    "kmv_user_overlap",
    """
    WITH hashes AS (
      SELECT DISTINCT event_type AS g,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) + 1 AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    tops AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM hashes
    ),
    regs AS (SELECT g, h FROM tops WHERE rn <= 128),
    pairs AS (
      SELECT DISTINCT a.g AS ga, b.g AS gb
      FROM regs a JOIN regs b ON a.g < b.g
    ),
    u_rows AS (
      SELECT p.ga, p.gb, r.h
      FROM pairs p JOIN regs r ON r.g = p.ga OR r.g = p.gb
      GROUP BY 1, 2, 3
    ),
    uk AS (
      SELECT ga, gb, h
      FROM (SELECT ga, gb, h, row_number() OVER (PARTITION BY ga, gb
              ORDER BY h) AS rn FROM u_rows)
      WHERE rn <= 128
    ),
    marked AS (
      SELECT uk.ga, uk.gb, uk.h,
             CASE WHEN ra.h IS NOT NULL AND rb.h IS NOT NULL
                  THEN 1 ELSE 0 END AS m
      FROM uk
      LEFT JOIN regs ra ON ra.g = uk.ga AND ra.h = uk.h
      LEFT JOIN regs rb ON rb.g = uk.gb AND rb.h = uk.h
    ),
    agg AS (
      SELECT ga AS a, gb AS b, count(*) AS u_sz, max(h) AS kth,
             CAST(sum(m) AS BIGINT) AS match_count
      FROM marked GROUP BY 1, 2
    )
    SELECT a, b,
           CAST(CASE WHEN u_sz < 128 THEN u_sz
                ELSE (127 * 281474976710656) // kth END AS BIGINT)
             AS union_est,
           match_count,
           match_count * 1000000 // u_sz AS jaccard_ppm,
           match_count * (CASE WHEN u_sz < 128 THEN u_sz
               ELSE (127 * 281474976710656) // kth END) // u_sz
             AS intersect_est
    FROM agg
    """,
)
def kmv_user_overlap_q(spark, sf_dir):
    """Estimated distinct-user overlap between every pair of event
    types from k=128 KMV sketches — the set-operation sketch: the k
    smallest hashes of a union are a uniform sample of it, so
    intersections (which HLL registers cannot express) fall out of
    register matching. All-integer estimator (48-bit hash space, int64
    `div`), so the twin replicates every estimate bit-for-bit via the
    rowset formulation of the same register algebra."""
    from ..operators import sketches

    return sketches.kmv_pairwise_overlap(
        load(spark, sf_dir, "events"), "event_type", "user_id", k=128
    )


# =========================================================================
# One-pass table profiler (data-quality census)
# =========================================================================

@xq(
    "profile_events",
    """
    WITH n AS (SELECT count(*) AS n_rows FROM events)
    SELECT p.* FROM n, LATERAL (
      SELECT 'event_id' AS "column", n.n_rows,
             count(event_id) AS n_nonnull,
             n.n_rows - count(event_id) AS n_nulls,
             count(DISTINCT event_id) AS n_distinct,
             CAST(min(event_id) AS VARCHAR) AS min_value,
             CAST(max(event_id) AS VARCHAR) AS max_value,
             CASE WHEN count(event_id) > 0 THEN
               sum(length(CAST(event_id AS VARCHAR))) * 100
                 // count(event_id) END AS avg_len_x100
      FROM events
      UNION ALL
      SELECT 'user_id', n.n_rows, count(user_id),
             n.n_rows - count(user_id), count(DISTINCT user_id),
             CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR),
             CASE WHEN count(user_id) > 0 THEN
               sum(length(CAST(user_id AS VARCHAR))) * 100
                 // count(user_id) END
      FROM events
      UNION ALL
      SELECT 'event_type', n.n_rows, count(event_type),
             n.n_rows - count(event_type), count(DISTINCT event_type),
             CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR),
             CASE WHEN count(event_type) > 0 THEN
               sum(length(CAST(event_type AS VARCHAR))) * 100
                 // count(event_type) END
      FROM events
      UNION ALL
      SELECT 'props', n.n_rows, count(props),
             n.n_rows - count(props), count(DISTINCT props),
             CAST(min(props) AS VARCHAR), CAST(max(props) AS VARCHAR),
             CASE WHEN count(props) > 0 THEN
               sum(length(CAST(props AS VARCHAR))) * 100
                 // count(props) END
      FROM events
    ) p
    """,
)
def profile_events_q(spark, sf_dir):
    """Data-quality census of the events table's integer/string
    columns in ONE aggregation over ONE scan (plan-asserted in
    tests/test_profile.py): nulls, exact distincts, native-type
    min/max, integer average length. The drift detector a curation
    pipeline diffs before/after every transform."""
    from ..operators import profile

    return profile.profile_table(
        load(spark, sf_dir, "events"),
        ["event_id", "user_id", "event_type", "props"],
    )


# =========================================================================
# HyperBall neighborhood function (distance census by HLL propagation)
# =========================================================================

def _hyperball_twin_sql(n_iter: int = 3) -> str:
    # register CTE chain: h{t} = groupBy-max of h{t-1} union the
    # successor contributions — the rowset form of the max-merge
    reg = (
        "CAST(concat('0x', substr(md5(CAST(node AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 128"
    )
    rho = (
        "CASE WHEN CAST(concat('0x', substr(md5(CAST(node AS VARCHAR)), "
        "9, 12)) AS BIGINT) = 0 THEN 49 ELSE 49 - length(bin(CAST("
        "concat('0x', substr(md5(CAST(node AS VARCHAR)), 9, 12)) "
        "AS BIGINT))) END"
    )
    chain = []
    for t in range(1, n_iter + 1):
        chain.append(
            f"""h{t} AS (
      SELECT node, bucket, max(m_j) AS m_j FROM (
        SELECT node, bucket, m_j FROM h{t - 1}
        UNION ALL
        SELECT e.x AS node, s.bucket, s.m_j
        FROM edges e JOIN h{t - 1} s ON s.node = e.y
      ) GROUP BY 1, 2
    )"""
        )
    states = " UNION ALL ".join(
        f"SELECT {t} AS t, node, bucket, m_j FROM h{t}"
        for t in range(0, n_iter + 1)
    )
    return f"""
    WITH pairs AS (
      SELECT a, b FROM (
        SELECT x.l_suppkey AS a, y.l_suppkey AS b,
               count(DISTINCT x.l_orderkey) AS n_orders
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        GROUP BY 1, 2
      ) WHERE n_orders >= 20
    ),
    edges AS (
      SELECT a AS x, b AS y FROM pairs
      UNION ALL SELECT b AS x, a AS y FROM pairs
    ),
    nodes AS (SELECT DISTINCT x AS node FROM edges),
    h0 AS (
      SELECT node, {reg} AS bucket, max({rho}) AS m_j
      FROM nodes GROUP BY 1, 2
    ),
    {', '.join(chain)},
    states AS ({states}),
    agg AS (
      SELECT t, node, count(*) AS n_registers,
             sum(1::BIGINT << (49 - m_j)) AS s_present
      FROM states GROUP BY 1, 2
    ),
    est AS (
      SELECT t, node, n_registers, 128 - n_registers AS n_empty,
             CAST(s_present + (128 - n_registers) * (1::BIGINT << 49)
                  AS BIGINT) AS harmonic_s49
      FROM agg
    )
    SELECT t, node,
           CAST(n_registers AS BIGINT) AS n_registers,
           CAST(n_empty AS INTEGER) AS n_empty,
           harmonic_s49,
           round(CASE WHEN n_empty > 0
                       AND (0.7213 / (1.0 + 1.079 / 128.0)) * 128.0 * 128.0
                           * 562949953421312.0
                           / CAST(harmonic_s49 AS DOUBLE) <= 320.0
                      THEN 128.0 * ln(128.0 / CAST(n_empty AS DOUBLE))
                      ELSE (0.7213 / (1.0 + 1.079 / 128.0)) * 128.0 * 128.0
                           * 562949953421312.0
                           / CAST(harmonic_s49 AS DOUBLE) END,
                 4) AS estimate
    FROM est
    """


@xq("kg_graph_hyperball", _hyperball_twin_sql(3))
def kg_graph_hyperball_q(spark, sf_dir):
    """HyperBall distance census (Boldi & Vigna 2013) over the
    supplier co-occurrence graph: per (radius t, node) the HLL-
    estimated ball size for t = 0..3 — the web-scale route to average
    distance / effective diameter (t scans of the edge list, 2^p
    registers per node, no per-node BFS). The twin replicates the
    ENTIRE algorithm — md5 registers, the max-merge propagation as a
    chained-CTE recursion, the exact-integer harmonic sum, and the
    linear-counting regime switch — so the propagation itself is
    hash-gated at every radius."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 20)
        .select("src", "dst")
    )
    return graph.neighborhood_function(pairs, p=7, n_iter=3)


# =========================================================================
# CMS join-size estimation (planner-style sketch inner product)
# =========================================================================

@xq(
    "cms_join_size_estimate",
    """
    WITH ca AS (
      SELECT r.rw,
             (CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
                   1, 8)) AS BIGINT)
              + r.rw * (CAST(concat('0x', substr(md5(CAST(o_orderkey
                   AS VARCHAR)), 9, 8)) AS BIGINT) * 2 + 1)) % 2048
               AS bucket,
             count(*) AS cnt
      FROM orders CROSS JOIN range(4) r(rw)
      WHERE o_orderkey IS NOT NULL
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT r.rw,
             (CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)),
                   1, 8)) AS BIGINT)
              + r.rw * (CAST(concat('0x', substr(md5(CAST(l_orderkey
                   AS VARCHAR)), 9, 8)) AS BIGINT) * 2 + 1)) % 2048
               AS bucket,
             count(*) AS cnt
      FROM lineitem CROSS JOIN range(4) r(rw)
      WHERE l_orderkey IS NOT NULL
      GROUP BY 1, 2
    ),
    dots AS (
      SELECT d.rw, COALESCE(sum(ca.cnt * cb.cnt), 0) AS dot
      FROM (SELECT DISTINCT rw FROM ca UNION SELECT DISTINCT rw FROM cb) d(rw)
      LEFT JOIN ca ON ca.rw = d.rw
      LEFT JOIN cb ON cb.rw = ca.rw AND cb.bucket = ca.bucket
      GROUP BY 1
    ),
    exact AS (
      SELECT count(*) AS n FROM orders o JOIN lineitem l
        ON o.o_orderkey = l.l_orderkey
    )
    SELECT CAST((SELECT min(dot) FROM dots) AS BIGINT) AS est_join_size,
           CAST((SELECT n FROM exact) AS BIGINT) AS exact_join_size
    """,
)
def cms_join_size_estimate_q(spark, sf_dir):
    """Planner-style join cardinality estimation: |orders JOIN
    lineitem| on orderkey from two depth-4 x width-2048 Count-Min
    sketches — min over hash rows of the sketch inner product (an
    upper bound on the true size) — next to the exact join count. The
    state needed to size a 100 TB shuffle before running it is
    depth x width cells per side; the twin replicates the cells, the
    row-domain dot products, and the exact count."""
    from ..operators import sketches

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    est = sketches.cms_join_size(
        sketches.cms_build(orders, "o_orderkey", depth=4, width=2048),
        sketches.cms_build(li, "l_orderkey", depth=4, width=2048),
    )
    exact = orders.join(
        li, F.col("o_orderkey") == F.col("l_orderkey")
    ).agg(F.count(F.lit(1)).alias("exact_join_size"))
    return est.crossJoin(exact)


# =========================================================================
# Salted skew join (static hot-key fan-out)
# =========================================================================

@xq(
    "salted_join_revenue",
    """
    SELECT s.s_suppkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
)
def salted_join_revenue_q(spark, sf_dir):
    """Revenue per supplier through the STATICALLY salted join (the
    skew fix for bucketed/pre-shuffled inputs where AQE's runtime
    skew split cannot fire): the three hottest suppkeys fan across 8
    salted reducers, everything else takes the plain join. The twin
    is the plain SQL join — the salted plan must be row-identical."""
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")
    hot = [
        r.l_suppkey
        for r in li.groupBy("l_suppkey")
        .count()
        .orderBy(F.col("count").desc(), F.col("l_suppkey"))
        .limit(3)
        .collect()
    ]
    # LEFT = the skewed many-row fact (its hot rows fan across salts);
    # RIGHT = the one-row-per-key dim (replicated once per salt).
    # Reversed, every hot fact row would be replicated 8x while each
    # (key, salt) reducer still held ALL hot rows — no skew relief.
    joined = salted_join(li, supp, "l_suppkey", "s_suppkey", hot, n_salt=8)
    return joined.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# =========================================================================
# TPC-H breadth: Q5 / Q10 / Q18 (multi-join star shapes with broadcast
# dims — the SQL-analytics surface next to the KG/curation operators)
# =========================================================================

def _revenue_cc():
    """Exact integer centi-cent revenue term: round(price*100) *
    round((1-discount)*100) as int64 — partition-order-independent
    sums (a float sum of the raw product lands on round(,2) knife
    edges between engines)."""
    return (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    )

@xq(
    "tpch_q5_local_volume",
    """
    SELECT n.n_name,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
             AS revenue_cc
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q5_q(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): the 6-table star — fact
    lineitem x orders with BROADCAST customer/supplier/nation/region
    dims (no dim shuffle at any scale). Revenue is accumulated in
    exact integer centi-cents (price_cents x discount_cents), so the
    sum is partition-order independent — a float sum of the product
    lands on round() knife edges (it did in Q10)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(_revenue_cc()).alias("revenue_cc"))
    )


@xq(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
             AS revenue_cc,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue_cc DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_q(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): top-20 customers by lost
    revenue in a quarter — returnflag-filtered fact join, broadcast
    customer/nation, deterministic tiebreak on custkey."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_cc()).alias("revenue_cc"))
        .orderBy(F.col("revenue_cc").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue_cc", "n_name")
    )


@xq(
    "tpch_q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY 1 HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY 1, 2, 3, 4
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_q(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): the HAVING-subquery shape —
    the qualifying-orderkey set is computed once (map-side-combined
    sum) and semi-joined back into the fact before the wide join, so
    the expensive join only sees qualifying rows."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey",
        "semi",
    )
    c = load(spark, sf_dir, "customer")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# =========================================================================
# Event-sequence analytics: funnel + cohort retention
# =========================================================================

@xq(
    "funnel_conversion",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s1 AS (SELECT user_id, min(t) AS t_done FROM ev
           WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT ev.user_id, min(ev.t) AS t_done
           FROM ev JOIN s1 ON ev.user_id = s1.user_id
           WHERE ev.event_type = 'click'
             AND ev.t > s1.t_done AND ev.t <= s1.t_done + 86400
           GROUP BY 1),
    s3 AS (SELECT ev.user_id, min(ev.t) AS t_done
           FROM ev JOIN s2 ON ev.user_id = s2.user_id
           WHERE ev.event_type = 'purchase'
             AND ev.t > s2.t_done AND ev.t <= s2.t_done + 86400
           GROUP BY 1)
    SELECT 1 AS step, 'view' AS event_type,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """,
)
def funnel_conversion_q(spark, sf_dir):
    """view -> click -> purchase funnel with a 1-day step window:
    greedy earliest-completion semantics, one bounded join + min-agg
    per step (never a per-user sort or collect). Twin replicates the
    step chain as CTEs."""
    from ..operators import funnel

    return funnel.funnel_counts(
        load(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        window_seconds=86400,
    )


@xq(
    "cohort_retention_weekly",
    """
    WITH ev AS (
      SELECT user_id AS u,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS period
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    first AS (SELECT u, min(period) AS cohort_period FROM ev GROUP BY 1)
    SELECT f.cohort_period, ev.period - f.cohort_period AS period_offset,
           CAST(count(DISTINCT ev.u) AS BIGINT) AS n_users
    FROM ev JOIN first f ON ev.u = f.u
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly_q(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-activity week,
    distinct actives per (cohort, weeks-since) — two aggregations on
    integer epoch-week buckets."""
    from ..operators import funnel

    return funnel.cohort_retention(
        load(spark, sf_dir, "events"), period_seconds=604800
    )


# =========================================================================
# Snapshot store (merge-on-read upserts without the Iceberg jar)
# =========================================================================

@xq(
    "snapstore_resolution",
    """
    WITH log AS (
      SELECT o_orderkey AS k, round(o_totalprice, 2) AS price,
             0 AS c, 'upsert' AS op
      FROM orders WHERE o_orderkey < 2000
      UNION ALL
      SELECT o_orderkey, round(o_totalprice * 2, 2), 1, 'upsert'
      FROM orders WHERE o_orderkey < 2000 AND o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, NULL, 2, 'delete'
      FROM orders WHERE o_orderkey < 2000 AND o_orderkey % 7 = 0
    )
    SELECT k, price FROM (
      SELECT k, price, op,
             row_number() OVER (PARTITION BY k ORDER BY c DESC) AS rn
      FROM log
    ) WHERE rn = 1 AND op = 'upsert'
    """,
)
def snapstore_resolution_q(spark, sf_dir):
    """Merge-on-read table semantics without the (sandbox-absent)
    Iceberg jar: three REAL commits — base upsert, price-doubling
    upsert, modulo delete — written as parquet deltas to a fresh
    store, then resolved by newest-commit-wins. The twin resolves the
    same log purely in SQL, so the store's resolution semantics
    (override, tombstone, window tiebreak) are value-checked, not just
    its row count."""
    import tempfile

    from ..sources import snapstore

    base = tempfile.mkdtemp(prefix="snapstore_q_")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    snapstore.commit_upsert(spark, base, orders, ["k"])
    snapstore.commit_upsert(
        spark,
        base,
        orders.filter(F.col("k") % 10 == 0).select(
            "k", F.round(F.col("price") * 2, 2).alias("price")
        ),
        ["k"],
    )
    snapstore.commit_delete(
        spark, base, orders.filter(F.col("k") % 7 == 0).select("k"), ["k"]
    )
    return snapstore.read_state(spark, base, ["k"])


# =========================================================================
# Declarative expectations gate (data-quality rules in one scan)
# =========================================================================

@xq(
    "expectations_lineitem",
    """
    WITH n AS (SELECT count(*) AS n_rows FROM lineitem),
    v AS (
      SELECT 'orderkey_not_null' AS rule,
             sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS nv
      FROM lineitem
      UNION ALL
      SELECT 'quantity_1_to_50',
             sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                      THEN 0 ELSE 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'discount_0_to_0_1',
             sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1
                      THEN 0 ELSE 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'price_positive',
             sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'returnflag_domain',
             sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                      THEN 0 ELSE 1 END)
      FROM lineitem
    )
    SELECT v.rule, n.n_rows,
           CAST(COALESCE(v.nv, 0) AS BIGINT) AS n_violations,
           CAST(CASE WHEN n.n_rows > 0
                THEN COALESCE(v.nv, 0) * 1000000 // n.n_rows
                ELSE 0 END AS BIGINT) AS violation_ppm,
           COALESCE(v.nv, 0) = 0 AS passed
    FROM v CROSS JOIN n
    """,
)
def expectations_lineitem_q(spark, sf_dir):
    """Data-quality expectations over lineitem in ONE aggregation over
    ONE scan: null/domain/range invariants with integer-ppm violation
    rates (NULL rule results count as violations — unknown is not a
    pass). The assert-style counterpart to profile_events."""
    from ..operators.profile import check_expectations

    li = load(spark, sf_dir, "lineitem")
    return check_expectations(
        li,
        {
            "orderkey_not_null": F.col("l_orderkey").isNotNull(),
            "quantity_1_to_50": (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 50),
            "discount_0_to_0_1": (F.col("l_discount") >= 0.0)
            & (F.col("l_discount") <= 0.1),
            "price_positive": F.col("l_extendedprice") > 0,
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


# =========================================================================
# Per-group histogram quantiles
# =========================================================================

@xq(
    "histogram_quantiles_by_flag",
    """
    WITH vals AS (
      SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    bounds AS (
      SELECT g, min(x) AS lo, max(x) AS hi, count(*) AS n
      FROM vals GROUP BY 1
    ),
    binned AS (
      SELECT v.g, CASE WHEN b.hi = b.lo THEN 0
                  ELSE least(499, CAST(floor((v.x - b.lo) / (b.hi - b.lo)
                       * 500) AS BIGINT)) END AS bin
      FROM vals v JOIN bounds b ON v.g = b.g
    ),
    cum AS (
      SELECT g, bin, count(*) AS cnt,
             sum(count(*)) OVER (PARTITION BY g ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_count
      FROM binned GROUP BY g, bin
    ),
    qs AS (SELECT unnest([50, 95]) AS q),
    hit AS (
      SELECT cum.g, qs.q, min(cum.bin) AS bin
      FROM qs CROSS JOIN cum JOIN bounds b ON cum.g = b.g
      WHERE cum.cum_count >= (qs.q * b.n + 99) // 100
      GROUP BY 1, 2
    )
    SELECT hit.g AS l_returnflag, hit.q, hit.bin,
           round(b.lo + (hit.bin + 1) * (b.hi - b.lo) / 500, 6) AS upper_edge,
           CAST(cum.cum_count AS BIGINT) AS cum_count,
           b.n AS n_total
    FROM hit
    JOIN cum ON cum.g = hit.g AND cum.bin = hit.bin
    JOIN bounds b ON b.g = hit.g
    """,
)
def histogram_quantiles_by_flag_q(spark, sf_dir):
    """p50/p95 of extended price PER RETURN FLAG from per-group
    500-bin one-pass histograms — the grouped variant of the mergeable
    quantile summary (per-group bounds join + per-group cum-sum
    window; bin counts still SUM-merge)."""
    from ..operators import sketches

    out = sketches.histogram_quantiles_grouped(
        load(spark, sf_dir, "lineitem"), ["l_returnflag"],
        "l_extendedprice", n_bins=500, quantiles=(50, 95),
    )
    return out.withColumnRenamed("l_returnflag", "l_returnflag")


# =========================================================================
# Compression-ratio quality signal (zlib compressibility)
# =========================================================================

@xq(
    "compression_ratio",
    f"""
    SELECT doc_id, raw_bytes, compressed_bytes, ratio_ppm
    FROM read_parquet('{_pq("compression_ratio")}')
    """,
)
def compression_ratio_q(spark, sf_dir):
    """zlib level-6 compressibility per document (Gopher-style
    boilerplate/spam signal: repetitive machine text compresses far
    below natural language). Arrow-batched pandas UDF on the Spark
    side; the precomputed oracle calls the same CPython zlib at the
    same level, so the comparison is bit-exact — integer byte counts
    and ppm ratios only."""
    from ..operators import textmetrics

    return textmetrics.compression_signals(
        load(spark, sf_dir, "documents")
    )


@xq(
    "kg_graph_sssp",
    """
    WITH RECURSIVE pairs AS (
      SELECT x.l_suppkey AS src, y.l_suppkey AS dst,
             count(DISTINCT x.l_orderkey) AS n
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY 1, 2 HAVING count(DISTINCT x.l_orderkey) >= 32
    ),
    adj AS (
      SELECT src AS u, dst AS v, 43 - n AS w FROM pairs
      UNION
      SELECT dst AS u, src AS v, 43 - n AS w FROM pairs
    ),
    seeds AS (
      SELECT node FROM (SELECT DISTINCT u AS node FROM adj)
      ORDER BY node LIMIT 2
    ),
    walk(node, dist, hops) AS (
      SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
      UNION
      SELECT a.v, w.dist + a.w, w.hops + 1
      FROM walk w JOIN adj a ON a.u = w.node
      WHERE w.hops < 8
    )
    SELECT CAST(node AS BIGINT) AS node_id,
           CAST(min(dist) AS BIGINT) AS dist
    FROM walk GROUP BY node
    """,
)
def kg_graph_sssp_q(spark, sf_dir):
    """Weighted shortest distances over the supplier co-occurrence
    graph (weight = inverse co-occurrence strength, 43 - n_orders in
    [1,11]), seeded at the two smallest node ids — the
    relevance-bounded hop expansion a graph retriever runs from a
    query's entity mentions. The DuckDB twin is an INDEPENDENT
    algorithm (bounded enumerate-all-weighted-walks then min) against
    the operator's frontier-restricted Bellman-Ford, so agreement
    checks the <=t-hop relaxation invariant itself, including paths
    where more hops cost less total weight (which a BFS twin could
    not distinguish). Seed collect is 2 rows (the bounded
    query-vector pattern)."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 32)
        .select(
            "src", "dst", (F.lit(43) - F.col("n_orders")).alias("weight")
        )
        .localCheckpoint()
    )
    nodes = pairs.select(F.col("src").alias("n")).unionAll(
        pairs.select(F.col("dst").alias("n"))
    )
    seeds = [
        r["n"] for r in nodes.distinct().orderBy("n").limit(2).collect()
    ]
    return graph.sssp_distances(
        pairs, seeds, max_hops=8, directed=False
    ).select(
        F.col("node_id").cast("long").alias("node_id"),
        F.col("dist").cast("long").alias("dist"),
    )


@q(
    "kg_graph_scc",
    """
    WITH RECURSIVE succ AS (
      SELECT l_suppkey,
             lead(l_suppkey) OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
             ) AS nxt
      FROM lineitem
    ),
    edges AS (
      SELECT l_suppkey AS src, nxt AS dst FROM succ
      WHERE nxt IS NOT NULL AND nxt <> l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 10
    ),
    reach(u, v) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.u, e.dst FROM reach r JOIN edges e ON e.src = r.v
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    mutual AS (
      SELECT r1.u AS a, r1.v AS b
      FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
    )
    SELECT CAST(node AS BIGINT) AS node_id,
           CAST(min(m) AS BIGINT) AS scc_id
    FROM (
      SELECT node, node AS m FROM nodes
      UNION ALL
      SELECT a AS node, b AS m FROM mutual
    ) GROUP BY node
    """,
)
def kg_graph_scc_q(spark, sf_dir):
    """Strongly connected components of the DIRECTED supplier
    succession graph (edge u->v when supplier v follows supplier u on
    the next linenumber of the same order, kept at frequency >= 10 —
    at sf0.01 that yields a 64-node mutual knot, a handful of small
    SCCs and DAG singletons, exercising trim, color and harvest). The
    DuckDB twin is an INDEPENDENT algorithm — full recursive
    transitive closure, then mutual-reachability pairs, then min per
    node — against the operator's trim/color/harvest decomposition,
    so agreement checks the SCC partition itself."""
    from pyspark.sql import Window as W

    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    # l_linenumber alone is NOT unique per order in the testdata —
    # extend to the unique (linenumber, partkey, suppkey) total order
    # so lead() is deterministic on both engines
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    edges = (
        li.select(
            F.col("l_suppkey").alias("src"),
            F.lead("l_suppkey").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select("src", "dst")
    )
    return graph.strongly_connected_components(edges).select(
        F.col("node_id").cast("long").alias("node_id"),
        F.col("scc_id").cast("long").alias("scc_id"),
    )


@xq(
    "allpairs_jaccard",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(words) >= 3
               THEN list_transform(range(1, len(words) - 1),
                    i -> array_to_string(words[i:i+2], ' '))
               ELSE [array_to_string(words, ' ')] END) AS shingles
      FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
    ),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
      FROM inv l JOIN inv r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT a, b,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = a
    JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.4
    """,
)
def allpairs_jaccard_q(spark, sf_dir):
    """AllPairs prefix-filtered EXACT Jaccard pairs (Bayardo et al.
    2007). The twin is the NAIVE full inverted-index join — no prefix
    logic at all — so the hash match is itself the completeness proof
    of the prefix theorem on real data: any candidate the prefix index
    misses would show up as a missing oracle row."""
    return dedup.allpairs_jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.4, n=3
    )


@q(
    "clf_train_weights",
    f"""
    SELECT bucket, w_micro
    FROM read_parquet('{_pq("clf_train_weights")}')
    """,
)
def clf_train_weights_q(spark, sf_dir):
    """DISTRIBUTED quality-classifier training parity: the full
    integer-micro logistic-regression recurrence (6 epochs, 256 hashed
    buckets, parity labels doc_id % 2) run on the cluster must emit the
    bit-identical weight vector the pure-Python oracle trains
    (oracle/precompute.train_quality_clf_py — Spark-free, snapshotted
    by tools/gen_oracle_data.py). Bucket -1 carries the bias. Every
    epoch's gradient crosses the driver as exactly 257 integer rows, so
    the hash match proves the whole training trajectory, not just the
    final inference."""
    from ..operators import clf_train

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("double").alias("label")
    )
    model = clf_train.train_quality_classifier(
        docs, n_buckets=256, epochs=6
    )
    rows = [(k, int(w)) for k, w in enumerate(model["w_micro"])]
    rows.append((-1, int(model["bias_micro"])))
    return spark.createDataFrame(rows, "bucket: long, w_micro: long")


@xq(
    "kg_pred_canonical",
    """
    WITH RECURSIVE prof AS (
      SELECT 'p' || CAST(o_orderkey % 4 AS VARCHAR) AS pred,
             CAST((o_orderkey % 4) // 2 AS VARCHAR) || chr(1) ||
             CAST(o_custkey AS VARCHAR) AS pair
      FROM orders GROUP BY 1, 2
    ),
    sz AS (SELECT pred, count(*) AS n_pairs FROM prof GROUP BY pred),
    inter AS (
      SELECT l.pred AS a, r.pred AS b, count(*) AS shared
      FROM prof l JOIN prof r ON l.pair = r.pair AND l.pred < r.pred
      GROUP BY 1, 2
    ),
    alias_pairs AS (
      SELECT a, b FROM inter
      JOIN sz sa ON sa.pred = inter.a
      JOIN sz sb ON sb.pred = inter.b
      WHERE shared / (sa.n_pairs + sb.n_pairs - shared) >= 0.5
    ),
    edges AS (
      SELECT a AS u, b AS v FROM alias_pairs
      UNION SELECT b AS u, a AS v FROM alias_pairs
    ),
    walk(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT w.u, e.v FROM walk w JOIN edges e ON e.u = w.v
    )
    SELECT s.pred AS pred,
           least(s.pred, coalesce(min(w.v), s.pred)) AS canon_pred,
           CAST(s.n_pairs AS BIGINT) AS n_pairs
    FROM sz s LEFT JOIN walk w ON w.u = s.pred
    GROUP BY s.pred, s.n_pairs
    """,
)
def kg_pred_canonical_q(spark, sf_dir):
    """Predicate canonicalization by distributional (subj, obj)
    profile similarity: four synthetic predicates over orders, where
    p0/p1 draw pairs from one argument universe and p2/p3 from a
    disjoint one (planted by integer arithmetic), so the alias
    structure is {p0,p1} and {p2,p3} at partial (~0.7, NOT 1.0)
    Jaccard. The twin replicates the profile sets, the exact Jaccard
    gate, AND the transitive closure (recursive min-label CTE) —
    independent of the prefix-filtered join + distributed CC the
    operator composes."""
    from ..operators import canonicalize

    orders = load(spark, sf_dir, "orders")
    triples = orders.select(
        F.expr("cast((o_orderkey % 4) div 2 as string)").alias("subj_name"),
        F.concat(
            F.lit("p"), F.expr("cast(o_orderkey % 4 as string)")
        ).alias("pred"),
        F.col("o_custkey").cast("string").alias("obj_name"),
    )
    return canonicalize.canonicalize_predicates(triples, threshold=0.5)


def _transe_supplier_triples(spark, sf_dir):
    """The two-relation supplier KG both TransE queries train on:
    undirected 'cooccurs' (>= 32 shared orders, both directions) +
    directed 'precedes' succession (>= 10); identical to the corpus
    tools/gen_oracle_data.py feeds precompute.transe_py."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    co = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b")
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n"))
        .filter(F.col("n") >= 32)
        .select("a", "b")
    )
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    prec = (
        li.select(
            F.col("l_suppkey").alias("a"),
            F.lead("l_suppkey").over(w).alias("b"),
        )
        .filter(F.col("b").isNotNull() & (F.col("b") != F.col("a")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select("a", "b")
    )

    def rel(df, name):
        return df.select(
            F.col("a").cast("string").alias("src"),
            F.lit(name).alias("rel"),
            F.col("b").cast("string").alias("dst"),
        )

    return (
        rel(co, "cooccurs")
        .unionByName(
            co.select(
                F.col("b").cast("string").alias("src"),
                F.lit("cooccurs").alias("rel"),
                F.col("a").cast("string").alias("dst"),
            )
        )
        .unionByName(rel(prec, "precedes"))
    )


@q(
    "kg_transe_embeddings",
    f"""
    SELECT kind, node_id, d, v_micro
    FROM read_parquet('{_pq("kg_transe_embeddings")}')
    """,
)
def kg_transe_embeddings_q(spark, sf_dir):
    """DISTRIBUTED TransE training parity: 3 epochs of full-batch
    margin-loss embedding training (dim 8) over a two-relation
    supplier KG (undirected 'cooccurs' at the >= 32 co-occurrence
    gate, directed 'precedes' succession at >= 10) must emit the
    bit-identical embedding table the pure-Python oracle trains
    (oracle/precompute.transe_py — Spark-free, snapshotted). The loop
    is float-free except the correctly-rounded isqrt normalize, so the
    hash match pins init, md5 corruption sampling, hinge gating,
    integer gradients and trunc-division updates across every epoch."""
    from ..operators import kge

    triples = _transe_supplier_triples(spark, sf_dir)
    emb = kge.train_transe(triples, dim=8, epochs=3)
    return emb.select(
        "kind", "node_id", F.posexplode("emb").alias("d", "v_micro")
    ).select(
        "kind", "node_id", F.col("d").cast("int").alias("d"),
        F.col("v_micro").cast("long").alias("v_micro"),
    )


@xq(
    "record_linkage_edit",
    """
    WITH feed AS (
      SELECT s_suppkey AS f_key,
             substr(s_name, 1, CAST(s_suppkey % length(s_name) AS INT)) ||
             substr(s_name, CAST(s_suppkey % length(s_name) AS INT) + 2)
               AS f_name
      FROM supplier
    ),
    master AS (SELECT s_suppkey AS r_key, s_name AS r_name FROM supplier),
    ln AS (SELECT f_key,
                  trim(regexp_replace(lower(f_name), '[^a-z0-9]+', ' ', 'g'))
                    AS lt
           FROM feed),
    rn AS (SELECT r_key,
                  trim(regexp_replace(lower(r_name), '[^a-z0-9]+', ' ', 'g'))
                    AS rt
           FROM master),
    ltok AS (
      SELECT f_key AS rec,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(f_name), '[^a-z0-9]+'),
               w -> w != ''))) AS token
      FROM feed
    ),
    rtok AS (
      SELECT r_key AS rec,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(r_name), '[^a-z0-9]+'),
               w -> w != ''))) AS token
      FROM master
    ),
    kept AS (
      SELECT token FROM (
        SELECT token FROM ltok UNION ALL SELECT token FROM rtok
      ) GROUP BY token HAVING count(*) <= 1000
    ),
    cand AS (
      SELECT DISTINCT l.rec AS f_key, r.rec AS r_key
      FROM (SELECT rec, token FROM ltok JOIN kept USING (token)) l
      JOIN (SELECT rec, token FROM rtok JOIN kept USING (token)) r
        USING (token)
    ),
    sc AS (
      SELECT c.f_key, c.r_key,
             levenshtein(ln.lt, rn.rt) AS edit_dist,
             length(ln.lt) AS l_len, length(rn.rt) AS r_len,
             1000000 - (levenshtein(ln.lt, rn.rt) * 1000000)
               // greatest(1, greatest(length(ln.lt), length(rn.rt)))
               AS sim_ppm
      FROM cand c JOIN ln ON ln.f_key = c.f_key
                  JOIN rn ON rn.r_key = c.r_key
    )
    SELECT f_key, r_key, edit_dist,
           CAST(l_len AS INT) AS l_len, CAST(r_len AS INT) AS r_len,
           sim_ppm
    FROM sc WHERE sim_ppm >= 920000
    QUALIFY row_number() OVER (
              PARTITION BY f_key ORDER BY sim_ppm DESC, r_key) = 1
        AND row_number() OVER (
              PARTITION BY r_key ORDER BY sim_ppm DESC, f_key) = 1
    """,
)
def record_linkage_edit_q(spark, sf_dir):
    """Edit-distance record linkage on a deterministically TYPO'd feed:
    each supplier name loses one character at position
    s_suppkey % length + 1, then links back against the master table.
    Neighboring supplier names are themselves 1-2 digit edits apart, so
    scoring ties are real and mutual-best's deterministic (score DESC,
    id ASC) break is exercised; the twin replicates blocking, DuckDB's
    own levenshtein, the ppm arithmetic and QUALIFY mutual-best."""
    from ..operators.linkage import link_records_edit

    sup = load(spark, sf_dir, "supplier")
    feed = sup.select(
        F.col("s_suppkey").alias("f_key"),
        F.concat(
            F.expr("substring(s_name, 1, cast(s_suppkey % length(s_name) as int))"),
            F.expr(
                "substring(s_name, cast(s_suppkey % length(s_name) as int) + 2)"
            ),
        ).alias("f_name"),
    )
    master = sup.select(
        F.col("s_suppkey").alias("r_key"), F.col("s_name").alias("r_name")
    )
    return link_records_edit(
        feed, master, "f_key", "f_name", "r_key", "r_name",
        min_sim_ppm=920_000,
    ).select(
        "f_key", "r_key", "edit_dist",
        F.col("l_len").cast("int").alias("l_len"),
        F.col("r_len").cast("int").alias("r_len"),
        "sim_ppm",
    )


@q(
    "kg_relation_profile",
    f"""
    WITH t AS (
      SELECT DISTINCT subj_name || chr(31) || subj_type AS h, pred AS p,
             obj_name || chr(31) || obj_type AS t
      FROM read_parquet('{_pq("kg_triples")}')
    ),
    base AS (
      SELECT p AS pred, count(*)::BIGINT AS n_triples,
             count(DISTINCT h)::BIGINT AS n_subjects,
             count(DISTINCT t)::BIGINT AS n_objects,
             sum(CASE WHEN h = t THEN 1 ELSE 0 END)::BIGINT AS n_reflexive
      FROM t GROUP BY p
    ),
    sym AS (
      SELECT a.p AS pred, count(*)::BIGINT AS n_symmetric
      FROM t a JOIN t b ON a.p = b.p AND a.h = b.t AND a.t = b.h
      WHERE a.h <> a.t GROUP BY a.p
    )
    SELECT base.pred, n_triples, n_subjects, n_objects,
           n_subjects * 1000000 // n_triples AS functionality_ppm,
           n_objects * 1000000 // n_triples AS inv_functionality_ppm,
           n_reflexive, coalesce(n_symmetric, 0) AS n_symmetric,
           coalesce(n_symmetric, 0) * 1000000 // n_triples AS symmetry_ppm
    FROM base LEFT JOIN sym ON base.pred = sym.pred
    """,
)
def kg_relation_profile_q(spark, sf_dir):
    """Per-predicate schema census over the engine-extracted KG:
    AMIE's functionality / inverse-functionality (Galarraga et al.
    2013 §3) plus reflexivity and exact-reverse symmetry — the QA
    table a construction monitor reads to catch extraction anomalies
    (a functional predicate growing second objects, a directed one
    growing reversed pairs). Spark side runs the REAL extraction
    pipeline then profiles; the twin stacks the same census over the
    precomputed kg_triples snapshot, so the hash gates the
    composition end-to-end."""
    from ..operators import rules

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    # F.concat, NOT concat_ws: the twin's `||` is NULL-propagating, so
    # a NULL name/type must make the whole key NULL on BOTH engines
    # (concat_ws would silently skip the NULL field and mint a
    # different key) — identical NULL semantics, ADVICE r4
    tri = res.triples.select(
        F.concat("subj_name", F.lit("\x1f"), "subj_type").alias("src"),
        F.col("pred").alias("rel"),
        F.concat("obj_name", F.lit("\x1f"), "obj_type").alias("dst"),
    )
    return rules.relation_profile(tri, "src", "rel", "dst")


@xq(
    "kg_relation_signatures",
    f"""
    WITH t AS (
      SELECT DISTINCT subj_name, subj_type, pred, obj_name, obj_type
      FROM read_parquet('{_pq("kg_triples")}')
    ),
    sig AS (
      SELECT pred, subj_type, obj_type, count(*)::BIGINT AS n_triples
      FROM t GROUP BY 1, 2, 3
    )
    SELECT pred, subj_type, obj_type, n_triples,
           n_triples * 1000000 // sum(n_triples) OVER (PARTITION BY pred)
             AS share_ppm
    FROM sig
    """,
)
def kg_relation_signatures_q(spark, sf_dir):
    """Domain/range type census per predicate — the schema-induction
    companion to kg_relation_profile: which (subj_type, obj_type)
    pairs each predicate connects, with the predicate-mass share in
    ppm, ranking type-level extraction anomalies directly. Spark runs
    the real pipeline then the census; twin = same census in DuckDB
    over the precomputed kg_triples snapshot."""
    from ..operators import rules

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    tri = res.triples.select(
        "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    return rules.relation_signatures(
        tri, rel="pred", subj_type="subj_type", obj_type="obj_type"
    )


_TYPE_MASK = "('0','1','2','3','4','5')"


@xq(
    "kg_type_completion",
    f"""
    WITH base AS (
      SELECT DISTINCT subj_name,
             CASE WHEN substr(md5(subj_name), 1, 1) IN {_TYPE_MASK}
                  THEN NULL ELSE subj_type END AS subj_type,
             pred, obj_name,
             CASE WHEN substr(md5(obj_name), 1, 1) IN {_TYPE_MASK}
                  THEN NULL ELSE obj_type END AS obj_type
      FROM read_parquet('{_pq("kg_triples")}')
    ),
    occ AS (
      SELECT subj_name AS name, subj_type AS typ, pred,
             'subj' AS role FROM base
      UNION ALL
      SELECT obj_name, obj_type, pred, 'obj' FROM base
    ),
    sig AS (
      SELECT pred, role, typ, count(*) AS n_sig
      FROM occ WHERE typ IS NOT NULL GROUP BY 1, 2, 3
    ),
    uocc AS (
      SELECT name, pred, role, count(*) AS w
      FROM occ
      WHERE name NOT IN (
        SELECT DISTINCT name FROM occ WHERE typ IS NOT NULL
      )
      GROUP BY 1, 2, 3
    ),
    votes AS (
      SELECT u.name, s.typ, sum(u.w * s.n_sig) AS votes
      FROM uocc u JOIN sig s ON s.pred = u.pred AND s.role = u.role
      GROUP BY 1, 2
    ),
    slots AS (SELECT name, count(*) AS n_slots FROM uocc GROUP BY 1),
    ranked AS (
      SELECT name, typ, votes,
             row_number() OVER w AS rk,
             votes - coalesce(lead(votes) OVER w, 0) AS margin
      FROM votes
      WINDOW w AS (PARTITION BY name ORDER BY votes DESC, typ ASC)
    )
    SELECT r.name, r.typ AS inferred_type, r.votes, r.margin, s.n_slots
    FROM ranked r JOIN slots s USING (name) WHERE rk = 1
    """,
)
def kg_type_completion_q(spark, sf_dir):
    """Entity-type completion (rules.type_completion) under the
    literature-standard label-masking eval: types of every entity
    whose md5(name) starts in [0-5] (~3/8 of entities) are hidden,
    and the domain/range signature vote must recover them. Spark runs
    the real pipeline, applies the deterministic mask, and elects; the
    twin replicates mask, votes, and election over the kg_triples
    snapshot."""
    from ..operators import rules

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    mask = lambda c: F.substring(F.md5(F.col(c)), 1, 1).isin(  # noqa: E731
        "0", "1", "2", "3", "4", "5"
    )
    tri = res.triples.select(
        "subj_name",
        F.when(mask("subj_name"), F.lit(None)).otherwise(
            F.col("subj_type")
        ).alias("subj_type"),
        "pred",
        "obj_name",
        F.when(mask("obj_name"), F.lit(None)).otherwise(
            F.col("obj_type")
        ).alias("obj_type"),
    )
    return rules.type_completion(tri)


@xq(
    "kg_predicate_alignment",
    f"""
    WITH t AS (
      SELECT DISTINCT conv_id, subj_name, pred, obj_name
      FROM read_parquet('{_pq("kg_triples")}')
    ),
    ea AS (
      SELECT DISTINCT pred, subj_name AS s, obj_name AS o FROM t
      WHERE substr(md5(conv_id), 1, 1) IN ('0','1','2','3','4','5','6','7')
    ),
    eb AS (
      SELECT DISTINCT pred, subj_name AS s, obj_name AS o FROM t
      WHERE substr(md5(conv_id), 1, 1) NOT IN ('0','1','2','3','4','5','6','7')
    ),
    na AS (SELECT pred AS pred_a, count(*) AS n_a FROM ea GROUP BY 1),
    nb AS (SELECT pred AS pred_b, count(*) AS n_b FROM eb GROUP BY 1),
    common AS (
      SELECT ea.pred AS pred_a, eb.pred AS pred_b, count(*) AS n_common
      FROM ea JOIN eb ON ea.s = eb.s AND ea.o = eb.o
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT pred_a, pred_b, n_a, n_b, n_common,
           n_common * 1000000 // (n_a + n_b - n_common) AS jaccard_ppm,
           n_common * 1000000 // n_a AS containment_a_ppm,
           n_common * 1000000 // n_b AS containment_b_ppm
    FROM common JOIN na USING (pred_a) JOIN nb USING (pred_b)
    """,
)
def kg_predicate_alignment_q(spark, sf_dir):
    """Predicate alignment by extension overlap
    (rules.predicate_alignment): the corpus is split into two KGs by
    conv-id md5 parity (two independent extraction runs over disjoint
    transcripts), and predicates are matched by their shared
    name-level (subj, obj) pairs — Jaccard for synonym alignment, the
    two containments for sub-property detection. The twin replicates
    split, extension join, and the integer census over the kg_triples
    snapshot."""
    from ..operators import rules

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    half = F.substring(F.md5(F.col("conv_id")), 1, 1).isin(
        "0", "1", "2", "3", "4", "5", "6", "7"
    )
    tri_a = res.triples.filter(half)
    tri_b = res.triples.filter(~half)
    return rules.predicate_alignment(tri_a, tri_b, min_common=2)


@xq(
    "kg_rule_mining",
    """
    WITH tri AS (
      SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS h,
             'in_nation' AS p,
             'n' || CAST(c_nationkey AS VARCHAR) AS t
      FROM customer
      UNION ALL
      SELECT DISTINCT 'n' || CAST(n_nationkey AS VARCHAR),
             'in_region',
             'r' || CAST(n_regionkey AS VARCHAR)
      FROM nation
      UNION ALL
      SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR),
             'cust_region',
             'r' || CAST(n_regionkey AS VARCHAR)
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_custkey % 4 != 0
    ),
    body AS (
      SELECT DISTINCT l.p AS p1, r.p AS p2, l.h AS x, r.t AS y
      FROM tri l JOIN tri r ON l.t = r.h AND l.h <> r.t
    ),
    bsz AS (SELECT p1, p2, count(*) AS body_size FROM body GROUP BY 1, 2),
    sup AS (
      SELECT b.p1, b.p2, e.p AS p3, count(*) AS support
      FROM body b JOIN tri e ON e.h = b.x AND e.t = b.y
      GROUP BY 1, 2, 3
    )
    SELECT sup.p1, sup.p2, p3, support, body_size,
           (support * 1000000) // body_size AS conf_ppm
    FROM sup JOIN bsz ON sup.p1 = bsz.p1 AND sup.p2 = bsz.p2
    WHERE support >= 10
      AND (support * 1000000) // body_size >= 100000
    """,
)
def kg_rule_mining_q(spark, sf_dir):
    """AMIE-lite Horn-rule mining over the real TPC-H hierarchy as a
    KG: in_nation(c, n) AND in_region(n, r) => cust_region(c, r), with
    the head relation PLANTED for only 3/4 of customers (custkey % 4),
    so the mined confidence is a real 750000 ppm, not a tautological
    1.0. The twin replicates path enumeration, body/support counting
    and the ppm division; the operator's mid-fanout guard provably
    cannot bind here (every mid is a nation: in_deg ~ 60 customers x
    out_deg 1 << 10000), so the twin omits it — the guard's binding
    semantics are pinned by unit test instead."""
    from ..operators import rules

    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    tri = (
        cust.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
            F.lit("in_nation").alias("rel"),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
        )
        .unionByName(
            nat.select(
                F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("src"),
                F.lit("in_region").alias("rel"),
                F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
            )
        )
        .unionByName(
            cust.join(nat, cust.c_nationkey == nat.n_nationkey)
            .filter(F.col("c_custkey") % 4 != 0)
            .select(
                F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
                F.lit("cust_region").alias("rel"),
                F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
            )
        )
    )
    return rules.mine_path_rules(
        tri, min_support=10, min_conf_ppm=100_000
    )


@xq(
    "gazetteer_mentions",
    f"""
    SELECT doc_id, start_tok, end_tok, surface, entity_id
    FROM read_parquet('{_pq("gazetteer_mentions")}')
    """,
)
def gazetteer_mentions_q(spark, sf_dir):
    """Gazetteer mention detection: dictionary = the first two
    normalized words of every 10th document (entity_id = 'g<doc_id>'),
    tagged over ALL documents with the leftmost-longest policy. The
    snapshot oracle (precompute.gazetteer_tag_py) is an INDEPENDENT
    matcher — try-every-entry-at-every-position vs the operator's
    broadcast token trie — so the hash match pins the match policy,
    normalization and span arithmetic."""
    from ..operators import dedup, gazetteer

    docs = load(spark, sf_dir, "documents")
    gaz = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.concat(F.lit("g"), F.col("doc_id").cast("string")).alias(
                "entity_id"
            ),
            F.col("text"),
        )
        .select(
            "entity_id",
            F.split(dedup.normalized_text(F.col("text")), " ").alias("_t"),
        )
        .filter((F.size("_t") >= 2) & (F.element_at("_t", 1) != ""))
        .select(
            "entity_id",
            F.concat_ws(
                " ", F.element_at("_t", 1), F.element_at("_t", 2)
            ).alias("name"),
        )
    )
    return gazetteer.tag_mentions(docs, gaz).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.col("end_tok").cast("int").alias("end_tok"),
        "surface",
        "entity_id",
    )


@xq(
    "hard_negatives_bm25",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents WHERE text IS NOT NULL),
    st AS (SELECT count(*)::BIGINT AS n_docs,
                  sum(len(words))::BIGINT AS sum_dl FROM w),
    tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, unnest(words) AS term,
                         len(words)::BIGINT AS dl FROM w)
            GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY term),
    qt AS (SELECT doc_id AS query_id,
                  unnest(list_distinct(words[1:5])) AS term
           FROM w WHERE doc_id IN (0, 7, 42)),
    con AS (SELECT qt.query_id, tfc.doc_id,
                   CAST(round(ln(1.0 + (st.n_docs - dfc.df + 0.5)
                                       / (dfc.df + 0.5))
                        * (tfc.tf * 2.2)
                        / (tfc.tf + 1.2 * (0.25 + 0.75
                             * (tfc.dl * st.n_docs) / st.sum_dl))
                        * 1000000) AS BIGINT) AS c
            FROM qt JOIN tfc USING (term) JOIN dfc USING (term) CROSS JOIN st),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_micro
           FROM con GROUP BY 1, 2)
    SELECT query_id, doc_id, neg_rank, score_micro FROM (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id)::INT
               AS neg_rank,
             score_micro
      FROM sc WHERE doc_id <> query_id) WHERE neg_rank <= 5
    """,
)
def hard_negatives_bm25_q(spark, sf_dir):
    """BM25 hard-negative mining (the DPR contrastive-training recipe):
    queries are exemplar docs 0/7/42, each query's GOLD positive is its
    own source doc, negatives = the 5 hardest non-gold lexical matches
    with ranks renumbered over the non-gold ordering. The twin extends
    the bm25_topk replication with the gold anti-filter before the
    window."""
    from ..operators import bm25
    from ..operators.negatives import mine_hard_negatives

    docs = load(spark, sf_dir, "documents")
    qs = bm25.sample_doc_queries(docs, [0, 7, 42], n_words=5)
    gold = qs.select(
        F.col("query_id"), F.col("query_id").alias("doc_id")
    )
    return mine_hard_negatives(docs, qs, gold, k_neg=5)


@xq(
    "kg_transe_ranks",
    f"""
    SELECT side, src, rel, dst, true_energy, rank_pos, rr_ppm
    FROM read_parquet('{_pq("kg_transe_ranks")}')
    """,
)
def kg_transe_ranks_q(spark, sf_dir):
    """Filtered link-prediction evaluation of the trained TransE table
    (the standard KGE protocol: rank the true entity among ALL trained
    entities by ascending energy, skipping corruptions that are
    themselves known triples). Test probes = the deterministic
    md5 % 5 == 0 slice of the training triples; ranks, integer-micro^2
    energies and trunc-division reciprocal ranks must match the
    Spark-free oracle (precompute.rank_metrics_py) bit-for-bit — the
    hash pins energy arithmetic, the filtered exclusion join and the
    cand < true_id tie-break on both corruption sides."""
    from ..operators import kge
    from ..operators.negatives import SEP, _md5_u32

    triples = _transe_supplier_triples(spark, sf_dir)
    emb = kge.train_transe(triples, dim=8, epochs=3)
    test = triples.filter(
        _md5_u32(F.concat_ws(SEP, "src", "rel", "dst")) % 5 == 0
    )
    return kge.rank_metrics(emb, test, triples).select(
        "side", "src", "rel", "dst",
        F.col("true_energy").cast("long").alias("true_energy"),
        F.col("rank_pos").cast("int").alias("rank_pos"),
        F.col("rr_ppm").cast("long").alias("rr_ppm"),
    )


# =========================================================================
# Modularity: partition-quality scoring for any community assignment
# =========================================================================

@xq(
    "kg_graph_modularity",
    """
    WITH pairs AS (
      SELECT x.l_suppkey AS a, y.l_suppkey AS b
      FROM lineitem x
      JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY 1, 2
      HAVING count(DISTINCT x.l_orderkey) >= 25
    ),
    canon AS (
      SELECT DISTINCT
        least(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS lo,
        greatest(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS hi
      FROM pairs
    ),
    lab AS (
      SELECT CAST(s_suppkey AS VARCHAR) AS n,
             CAST(s_nationkey AS VARCHAR) AS lab
      FROM supplier
    ),
    edges AS (
      SELECT c.lo, c.hi, ll.lab AS lab_lo, lh.lab AS lab_hi
      FROM canon c
      JOIN lab ll ON ll.n = c.lo
      JOIN lab lh ON lh.n = c.hi
    ),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS m_edges FROM edges),
    intra AS (
      SELECT lab_lo AS label, count(*) AS intra_edges
      FROM edges WHERE lab_lo = lab_hi GROUP BY 1
    ),
    ends AS (
      SELECT lo AS node, lab_lo AS label FROM edges
      UNION ALL
      SELECT hi AS node, lab_hi AS label FROM edges
    ),
    per AS (
      SELECT label, count(*) AS deg_sum, count(DISTINCT node) AS n_nodes
      FROM ends GROUP BY 1
    )
    SELECT p.label,
           CAST(p.n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           CAST(p.deg_sum AS BIGINT) AS deg_sum,
           CAST((CAST(coalesce(i.intra_edges, 0) AS HUGEINT) * 1000000)
                // m.m_edges AS BIGINT) AS coverage_ppm,
           CAST((CAST(p.deg_sum AS HUGEINT) * CAST(p.deg_sum AS HUGEINT)
                 * 1000000) // (4 * m.m_edges * m.m_edges) AS BIGINT)
             AS expected_ppm,
           CAST((CAST(coalesce(i.intra_edges, 0) AS HUGEINT) * 1000000)
                // m.m_edges AS BIGINT)
           - CAST((CAST(p.deg_sum AS HUGEINT) * CAST(p.deg_sum AS HUGEINT)
                   * 1000000) // (4 * m.m_edges * m.m_edges) AS BIGINT)
             AS q_ppm
    FROM per p
    LEFT JOIN intra i USING (label)
    CROSS JOIN m
    """,
)
def kg_graph_modularity_q(spark, sf_dir):
    """Newman modularity (Newman & Girvan 2004) of the
    nation-of-supplier partition over the >= 25-gated supplier
    co-occurrence graph — the partition-quality score for any
    community structure the engine emits (LPA communities, dedup
    families, canonical entity groups). All arithmetic integer:
    coverage/expected in trunc-ppm via decimal(38,0) `div` on the
    Spark side and HUGEINT `//` in the twin (both truncate toward
    zero; q_ppm is a difference of the two truncations, never a
    signed division). Twin replicates canonicalization, labeling,
    degree sums and the ppm arithmetic in full."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 25)
        .select("src", "dst")
    )
    labels = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node_id"),
        F.col("s_nationkey").cast("string").alias("label"),
    )
    return graph.modularity(pairs, labels)


# =========================================================================
# Minimum spanning forest: weighted co-occurrence backbone
# =========================================================================

@q(
    "kg_graph_msf",
    f"""
    SELECT src, dst, weight FROM read_parquet('{_pq("graph_msf")}')
    """,
)
def kg_graph_msf_q(spark, sf_dir):
    """Boruvka minimum spanning forest (graph.minimum_spanning_forest)
    of the >= 15-gated supplier co-occurrence graph under
    inverse-strength integer costs (1000000 div n_orders — stronger
    co-occurrence = cheaper edge): the association backbone of a dense
    KG neighborhood. Twin = precomputed pure-Python KRUSKAL
    (precompute.msf_py) over the identical edge list — an
    algorithm-independent equality, valid because the (w, lo, hi) key
    is a strict total order making the forest unique."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
        .select("src", "dst", F.expr("1000000 div n_orders").alias("weight"))
    )
    return graph.minimum_spanning_forest(pairs)


# =========================================================================
# Sequential-pattern mining over event streams
# =========================================================================

@xq(
    "event_sequence_ngrams",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(event_type AS VARCHAR) AS t0,
             lead(CAST(event_type AS VARCHAR), 1) OVER w AS t1,
             lead(CAST(event_type AS VARCHAR), 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT concat_ws(chr(31), t0, t1, t2) AS gram,
           count(DISTINCT user_id) AS n_groups,
           count(*) AS n_occurrences
    FROM seq
    WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    GROUP BY 1
    HAVING count(DISTINCT user_id) >= 5
    """,
)
def event_sequence_ngrams_q(spark, sf_dir):
    """Frequent contiguous event-type trigrams across per-user event
    sequences (the GSP/PrefixSpan support semantics restricted to
    contiguous windows — what tool-call chains actually are):
    support = distinct users containing the chain, cut at >= 5. Order
    pinned by (ts, event_id) so lead() is deterministic under ties.
    Twin replicates the window + filter + support in DuckDB."""
    from ..operators import seqmine

    return seqmine.sequence_ngrams(
        load(spark, sf_dir, "events"), n=3, min_groups=5
    )


@xq(
    "event_markov_transitions",
    """
    WITH pairs AS (
      SELECT CAST(event_type AS VARCHAR) AS from_token,
             lead(CAST(event_type AS VARCHAR), 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_token
      FROM events
    ),
    obs AS (
      SELECT from_token, to_token, count(*) AS n_obs
      FROM pairs WHERE to_token IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_token, sum(n_obs) AS from_total FROM obs GROUP BY 1
    )
    SELECT o.from_token, o.to_token, o.n_obs,
           CAST(t.from_total AS BIGINT) AS from_total,
           CAST((o.n_obs * 1000000) // t.from_total AS BIGINT) AS p_ppm
    FROM obs o JOIN tot t USING (from_token)
    """,
)
def event_markov_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix of event types within
    per-user sequences — the behavioural-KG edge weights of "what
    follows what". p_ppm = n_obs * 1e6 div from_total (trunc, both
    engines); terminal events feed no transition, so from_total is
    out-transition mass, not raw frequency. Twin replicates window,
    counts and ppm arithmetic."""
    from ..operators import seqmine

    return seqmine.markov_transitions(load(spark, sf_dir, "events"))


# =========================================================================
# node2vec: second-order biased walk corpus
# =========================================================================

@xq(
    "kg_node2vec_walks",
    f"""
    SELECT start, walk_id, pos, node
    FROM read_parquet('{_pq("graph_node2vec")}')
    """,
)
def kg_node2vec_walks_q(spark, sf_dir):
    """node2vec (Grover & Leskovec 2016) second-order biased walks
    over the heterogeneous customer->order->supplier->nation KG — the
    kg_random_walks edge list with integer bias weights ret 2 / in 5
    / out 1 (BFS-leaning). Twin = precomputed pure-Python replication
    (precompute.node2vec_py) of the identical md5 cumulative-mass
    draws, so the whole 2,464-row corpus matches row-for-row
    including every second-order weighting decision."""
    from ..operators import walks

    orders_e = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("dst"),
        )
    )
    li_e = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    supp_e = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    edges = orders_e.unionAll(li_e).unionAll(supp_e)
    return walks.node2vec_walks(
        edges, walk_length=4, walks_per_node=2, ret_w=2, in_w=5, out_w=1
    )


def _walk_kg_edges(spark, sf_dir):
    """The heterogeneous customer->order->supplier->nation edge list
    shared by kg_random_walks / kg_node2vec_walks / kg_graph_mis."""
    orders_e = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("dst"),
        )
    )
    li_e = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    supp_e = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    return orders_e.unionAll(li_e).unionAll(supp_e)


# =========================================================================
# Maximal independent set: non-adjacent anchor election
# =========================================================================

@xq(
    "kg_graph_mis",
    f"""
    SELECT node_id, mis_round FROM read_parquet('{_pq("graph_mis")}')
    """,
)
def kg_graph_mis_q(spark, sf_dir):
    """Deterministic Luby maximal independent set over the
    heterogeneous customer->order->supplier->nation KG (the
    kg_random_walks edge list — sparse and layered, so the MIS is
    large and the sweep runs several real rounds): mutually
    non-adjacent anchor entities, one per neighborhood, with the
    round each settled in. Priorities are (md5_u32(node), node) —
    random enough for Luby's O(log n) rounds, deterministic on any
    cluster size. Twin = precomputed pure-Python replication
    (precompute.mis_py) of the identical simultaneous
    local-minimum sweep."""
    from ..operators import graph

    edges = _walk_kg_edges(spark, sf_dir)
    return graph.maximal_independent_set(edges)


# =========================================================================
# Temporal reachability: earliest-arrival information flow
# =========================================================================

@q(
    "kg_temporal_reachability",
    """
    WITH RECURSIVE
    tedges AS (
      SELECT 'c:' || o.o_custkey AS u, 's:' || l.l_suppkey AS v,
             epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS t
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % 50 = 0
      UNION
      SELECT 's:' || l.l_suppkey, 'c:' || o.o_custkey,
             epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % 50 = 0
    ),
    reach(node, arr) AS (
      SELECT 'c:0', CAST(-2305843009213693952 AS BIGINT)
      UNION
      SELECT e.v, e.t
      FROM reach r JOIN tedges e ON e.u = r.node AND e.t > r.arr
    )
    SELECT node AS node_id, min(arr) AS arrival_micro
    FROM reach GROUP BY 1
    """,
)
def kg_temporal_reachability_q(spark, sf_dir):
    """Earliest-arrival time-respecting reachability (Wu et al. 2014)
    from customer c:0 over the bipartite order/shipment timeline
    (customer -(orderdate)-> supplier, supplier -(shipdate)->
    customer; o_orderkey % 50 slice): who could the information have
    reached, and by when — strict time gate, so every hop moves
    forward in time. Twin = a DuckDB RECURSIVE enumeration of ALL
    temporal-walk states with min(arrival) per node — an
    algorithm-independent equality against the greedy min-arrival
    fixpoint (exact because an earlier arrival enables a superset of
    continuations), valid because the run converges (empty frontier)
    inside max_hops."""
    from ..operators import graph

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    li = load(spark, sf_dir, "lineitem")
    j = o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    placed = j.select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        F.col("o_orderdate").alias("ts"),
    )
    shipped = j.select(
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("dst"),
        F.col("l_shipdate").alias("ts"),
    )
    return graph.temporal_reachability(
        placed.unionAll(shipped), ["c:0"], max_hops=30
    )


# =========================================================================
# ER evaluation: pairwise clustering precision/recall
# =========================================================================

@xq(
    "er_pair_metrics",
    """
    WITH joined AS (
      SELECT s_suppkey AS id,
             CAST(s_suppkey % 10 AS VARCHAR) AS p,
             CAST(s_nationkey AS VARCHAR) AS g
      FROM supplier
    ),
    cells AS (
      SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1) // 2) AS HUGEINT) AS tp
      FROM (SELECT count(*) AS n FROM joined GROUP BY p, g)
    ),
    pm AS (
      SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1) // 2) AS HUGEINT) AS pp,
             CAST(sum(n) AS BIGINT) AS n_items
      FROM (SELECT count(*) AS n FROM joined GROUP BY p)
    ),
    gm AS (
      SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1) // 2) AS HUGEINT) AS gp
      FROM (SELECT count(*) AS n FROM joined GROUP BY g)
    )
    SELECT n_items,
           CAST(tp AS BIGINT) AS tp_pairs,
           CAST(pp AS BIGINT) AS pred_pairs,
           CAST(gp AS BIGINT) AS gold_pairs,
           CAST(pp - tp AS BIGINT) AS fp_pairs,
           CAST(gp - tp AS BIGINT) AS fn_pairs,
           CASE WHEN pp > 0
                THEN CAST((tp * 1000000) // pp AS BIGINT) END AS precision_ppm,
           CASE WHEN gp > 0
                THEN CAST((tp * 1000000) // gp AS BIGINT) END AS recall_ppm,
           CASE WHEN pp + gp > 0
                THEN CAST((2 * tp * 1000000) // (pp + gp) AS BIGINT)
           END AS f1_ppm
    FROM cells, pm, gm
    """,
)
def er_pair_metrics_q(spark, sf_dir):
    """Pairwise entity-resolution evaluation (Menestrina et al., VLDB
    2010) of a hash-block clustering (s_suppkey % 10) against the
    nation gold partition over suppliers: TP/FP/FN pair counts from
    closed-form C(n,2) cell sums — the quadratic pair space is scored
    without materializing a single pair — plus trunc-ppm P/R/F1.
    Twin replicates cells, marginals and the HUGEINT arithmetic."""
    from ..operators.linkage import clustering_pair_metrics

    supp = load(spark, sf_dir, "supplier")
    pred = supp.select(
        F.col("s_suppkey").alias("node_id"),
        (F.col("s_suppkey") % 10).cast("string").alias("pred_label"),
    )
    gold = supp.select(
        F.col("s_suppkey").alias("node_id"),
        F.col("s_nationkey").cast("string").alias("gold_label"),
    )
    return clustering_pair_metrics(pred, gold)


# =========================================================================
# k-truss: triangle-corroborated cohesive subgraph
# =========================================================================

@xq(
    "kg_graph_ktruss",
    f"""
    SELECT src, dst, support FROM read_parquet('{_pq("graph_ktruss")}')
    """,
)
def kg_graph_ktruss_q(spark, sf_dir):
    """10-truss (Cohen 2008) of the >= 25-gated supplier
    co-occurrence graph: keep an edge only while it closes >= 8
    triangles inside the survivor set — the "relationship is
    corroborated by common neighbors" denoising filter, strictly
    stronger than the degree-based k-core. 1,271 of 1,782 edges
    survive a real peeling cascade. Twin = precomputed pure-Python
    support-peeling replication (precompute.k_truss_py), hash-pinning
    every surviving edge AND its in-truss support count."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 25)
        .select("src", "dst")
    )
    return graph.k_truss(pairs, k=10)


# =========================================================================
# Episode spans: gap-split fact-validity intervals
# =========================================================================

@xq(
    "fact_episode_spans",
    """
    WITH flagged AS (
      SELECT user_id, event_type, ts, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > CAST(86400 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, event_type, ts, us,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, us
               ROWS UNBOUNDED PRECEDING
             ) AS INTEGER) AS episode_idx
      FROM flagged
    )
    SELECT user_id, event_type, episode_idx,
           min(ts) AS start_ts, max(ts) AS end_ts,
           max(us) - min(us) AS duration_us,
           count(*) AS n_obs
    FROM numbered
    GROUP BY 1, 2, 3
    """,
)
def fact_episode_spans_q(spark, sf_dir):
    """Gap-split validity episodes (episode_spans) of the composite
    fact key (user_id, event_type) at a 24h gap: maximal observation
    runs with start/end/duration — the operator that turns raw
    mention timestamps into triple-validity intervals for a temporal
    KG. Twin replicates the lag-flag + running-sum + rollup pipeline
    in DuckDB (ordering tie pinned by event_id)."""
    from ..operators import sessions

    return sessions.episode_spans(
        load(spark, sf_dir, "events"),
        key_cols=["user_id", "event_type"],
        gap_seconds=86400,
    )


# =========================================================================
# ROUGE-N: generation-quality overlap scoring
# =========================================================================

@xq(
    "rouge2_excerpt_eval",
    f"""
    WITH pairs AS (
      SELECT doc_id,
             array_to_string(words[5:20], ' ') || ' ' ||
             array_to_string(words[5:20], ' ') AS cand_text,
             text AS ref_text
      FROM (SELECT doc_id, text, string_split({_NORM_SQL}, ' ') AS words
            FROM documents)
      WHERE doc_id % 7 = 0 AND len(words) >= 24
    ),
    toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(cand_text),
               '[^\\p{{L}}\\p{{N}}\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')
               AS cw,
             string_split(trim(regexp_replace(regexp_replace(lower(ref_text),
               '[^\\p{{L}}\\p{{N}}\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')
               AS rw
      FROM pairs
    ),
    gr AS (
      SELECT doc_id,
             CASE WHEN len(cw) >= 2
               THEN list_transform(range(1, len(cw)),
                    i -> array_to_string(cw[i:i+1], ' '))
               ELSE [] END AS cg,
             CASE WHEN len(rw) >= 2
               THEN list_transform(range(1, len(rw)),
                    i -> array_to_string(rw[i:i+1], ' '))
               ELSE [] END AS rg
      FROM toks
    ),
    counted AS (
      SELECT doc_id, gram, sum(c) AS c, sum(r) AS r FROM (
        SELECT doc_id, unnest(cg) AS gram, 1 AS c, 0 AS r FROM gr
        UNION ALL
        SELECT doc_id, unnest(rg) AS gram, 0 AS c, 1 AS r FROM gr
      ) GROUP BY 1, 2
    ),
    clip AS (
      SELECT doc_id, sum(least(c, r)) AS clipped FROM counted GROUP BY 1
    )
    SELECT g.doc_id,
           CAST(len(g.cg) AS BIGINT) AS cand_grams,
           CAST(len(g.rg) AS BIGINT) AS ref_grams,
           CAST(coalesce(c.clipped, 0) AS BIGINT) AS clipped_overlap,
           CASE WHEN len(g.cg) > 0 THEN
             CAST((coalesce(c.clipped, 0) * 1000000) // len(g.cg) AS BIGINT)
           END AS precision_ppm,
           CASE WHEN len(g.rg) > 0 THEN
             CAST((coalesce(c.clipped, 0) * 1000000) // len(g.rg) AS BIGINT)
           END AS recall_ppm,
           CASE WHEN len(g.cg) + len(g.rg) > 0 THEN
             CAST((2 * coalesce(c.clipped, 0) * 1000000)
                  // (len(g.cg) + len(g.rg)) AS BIGINT)
           END AS f_ppm
    FROM gr g LEFT JOIN clip c USING (doc_id)
    """,
)
def rouge2_excerpt_eval_q(spark, sf_dir):
    """ROUGE-2 (Lin 2004) of a DOUBLED 16-word excerpt (every 7th
    sufficiently long doc, words[5:20] repeated twice — so candidate
    bigram counts exceed reference counts and the CLIPPING in
    clipped = sum min(count_cand, count_ref) is load-bearing, not
    vacuous) against the full document: exact integer clipped
    overlap + trunc-ppm P/R/F. Twin replicates normalization, bigram
    multisets, clipping and the ppm arithmetic in DuckDB."""
    from ..operators import dedup as dd
    from ..operators.texteval import rouge_n_scores

    words = F.split(dd.normalized_text(F.col("text")), " ")
    excerpt = F.concat_ws(" ", F.slice("words", 5, 16))
    prs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.col("text"), words.alias("words"))
        .filter((F.col("doc_id") % 7 == 0) & (F.size("words") >= 24))
        .select(
            "doc_id",
            F.concat_ws(" ", excerpt, excerpt).alias("cand_text"),
            F.col("text").alias("ref_text"),
        )
    )
    return rouge_n_scores(prs, id_cols=("doc_id",), n=2)


# =========================================================================
# Conversation shape metrics over the transcript payload
# =========================================================================

@xq(
    "conv_turn_metrics",
    f"""
    SELECT conv_id, n_turns, n_user, n_assistant, n_tool_role,
           n_system, n_tool_calls, n_distinct_tools, span_us,
           max_gap_us, n_responses, mean_response_us
    FROM read_parquet('{_pq("conv_metrics")}')
    """,
)
def conv_turn_metrics_q(spark, sf_dir):
    """Per-conversation shape report over the raw transcript payload
    (the BASELINE input_hint table): role mix, tool usage, temporal
    span/cadence and user->assistant response latency — the
    conversation-grain metrics an ingestion job logs alongside its
    per-partition lineage. One conv-keyed window + one agg; trunc-div
    integer micros; the corpus' planted 50x-long conversations are
    the skew probes these metrics surface. Twin = precomputed
    pure-Python replication over the identical generate_rows
    corpus."""
    from ..operators.convstats import conv_turn_metrics

    return conv_turn_metrics(transcripts_for(spark, sf_dir))


# =========================================================================
# Multi-touch attribution
# =========================================================================

@xq(
    "attribution_linear",
    """
    WITH conv AS (
      SELECT user_id, event_id AS conversion_id, ts AS conversion_ts,
             epoch_us(ts) AS cus
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id AS touch_id, event_type AS touch_type,
             ts AS touch_ts, epoch_us(ts) AS tus
      FROM events WHERE event_type IN ('click', 'view')
    ),
    eligible AS (
      SELECT c.user_id, c.conversion_id, c.conversion_ts,
             t.touch_id, t.touch_type, t.touch_ts,
             row_number() OVER (PARTITION BY c.conversion_id
                                ORDER BY t.tus DESC, t.touch_id DESC)
               AS rk_last,
             count(*) OVER (PARTITION BY c.conversion_id) AS n_touches
      FROM conv c
      JOIN touch t ON t.user_id = c.user_id
       AND t.tus < c.cus
       AND c.cus - t.tus <= CAST(604800 AS BIGINT) * 1000000
    )
    SELECT user_id, conversion_id, conversion_ts, touch_id, touch_type,
           touch_ts, CAST(n_touches AS BIGINT) AS n_touches,
           CAST(CASE WHEN rk_last = 1
                THEN 1000000 - (1000000 // n_touches) * (n_touches - 1)
                ELSE 1000000 // n_touches END AS BIGINT) AS credit_ppm
    FROM eligible
    """,
)
def attribution_linear_q(spark, sf_dir):
    """Linear multi-touch attribution of purchases to the user's
    click/view touches within a 7-day lookback: equal trunc-ppm split
    with the remainder pinned to the LAST touch so every conversion's
    credits sum to exactly 1e6 (a float split can't make that
    contract). Strictly-before eligibility, (ts, id)-deterministic
    ranking. Twin replicates the bounded per-user join, ranking and
    remainder arithmetic."""
    from ..operators.funnel import attribution

    return attribution(
        load(spark, sf_dir, "events"),
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_seconds=604800,
        model="linear",
    )


# =========================================================================
# DeepWalk: walks -> skip-grams -> distributed SGNS embeddings
# =========================================================================

@q(
    "kg_deepwalk_embeddings",
    f"""
    SELECT kind, node_id, d, v_micro
    FROM read_parquet('{_pq("kg_sgns_embeddings")}')
    """,
)
def kg_deepwalk_embeddings_q(spark, sf_dir):
    """DeepWalk (Perozzi et al. 2014) END TO END inside the engine:
    md5-deterministic uniform walks over the heterogeneous
    c->o->s->n KG -> skip-gram pairs (window 2) -> distributed SGNS
    training (operators/sgns.py — the third distributed trainer:
    integer-micro model state, floats only in the fixed-order
    per-term logistic, floor-truncated gradient terms before the
    weighted int64 sums). Twin = the Spark-free pure-Python
    replication (precompute.node2vec_py unit weights ->
    skipgram_pairs_py -> sgns_py), hash-pinning all 6,672 embedding
    coordinates after 2 full epochs — the training recurrence itself
    is what the hash gates."""
    from ..operators import walks
    from ..operators.sgns import train_sgns

    corpus = walks.random_walks(
        _walk_kg_edges(spark, sf_dir), walk_length=4, walks_per_node=2
    )
    prs = walks.skipgram_pairs(corpus, window=2)
    emb = train_sgns(prs, dim=8, epochs=2, k_neg=2)
    return emb.select(
        "kind", "node_id", F.posexplode("emb").alias("d", "v_micro")
    )


# =========================================================================
# Weisfeiler-Lehman structural labels
# =========================================================================

@xq(
    "kg_wl_labels",
    """
    WITH pairs AS (
      SELECT x.l_suppkey AS a, y.l_suppkey AS b
      FROM lineitem x
      JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY 1, 2
      HAVING count(DISTINCT x.l_orderkey) >= 25
    ),
    sym AS (
      SELECT CAST(a AS VARCHAR) AS u, CAST(b AS VARCHAR) AS v FROM pairs
      UNION
      SELECT CAST(b AS VARCHAR), CAST(a AS VARCHAR) FROM pairs
    ),
    l0 AS (
      SELECT u AS node_id, CAST(count(*) AS VARCHAR) AS label
      FROM sym GROUP BY 1
    ),
    l1 AS (
      SELECT s.u AS node_id,
             substr(md5(concat(l.label, chr(31),
               array_to_string(list(n.label ORDER BY n.label), ','))),
               1, 16) AS label
      FROM sym s
      JOIN l0 l ON l.node_id = s.u
      JOIN l0 n ON n.node_id = s.v
      GROUP BY s.u, l.label
    ),
    l2 AS (
      SELECT s.u AS node_id,
             substr(md5(concat(l.label, chr(31),
               array_to_string(list(n.label ORDER BY n.label), ','))),
               1, 16) AS label
      FROM sym s
      JOIN l1 l ON l.node_id = s.u
      JOIN l1 n ON n.node_id = s.v
      GROUP BY s.u, l.label
    )
    SELECT node_id, 0 AS round, label FROM l0
    UNION ALL
    SELECT node_id, 1, label FROM l1
    UNION ALL
    SELECT node_id, 2, label FROM l2
    """,
)
def kg_wl_labels_q(spark, sf_dir):
    """1-WL color refinement (Shervashidze et al. 2011) over the
    >= 25-gated supplier co-occurrence graph, rounds 0-2: equal labels
    at round r certify equal r-hop structural neighborhoods (the
    structural-role signature / isomorphism screen). Labels are
    16-hex md5 prefixes of (own label, sorted neighbor multiset) —
    engine-portable, so the DuckDB twin replays the refinement
    exactly with unrolled CTE rounds."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 25)
        .select("src", "dst")
    )
    return graph.wl_labels(pairs, rounds=2)


# =========================================================================
# HITS hubs/authorities
# =========================================================================

@xq(
    "kg_graph_hits",
    f"""
    SELECT node_id, hub_micro, auth_micro
    FROM read_parquet('{_pq("graph_hits")}')
    """,
)
def kg_graph_hits_q(spark, sf_dir):
    """HITS (Kleinberg 1999) over the directed supplier succession
    graph (the 'precedes' slice of the TransE corpus): hub score =
    leads sequences, authority score = follows them — the two-sided
    salience PageRank conflates. Integer-micro max-normalized power
    iteration with NO driver actions (the norm is a 1-row broadcast
    crossJoin); twin = precomputed pure-Python replication
    (precompute.hits_py), bit-exact after 5 full rounds."""
    from pyspark.sql import Window as W

    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    prec = (
        li.select(
            F.col("l_suppkey").alias("src"),
            F.lead("l_suppkey").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select("src", "dst")
    )
    return graph.hits(prec, iterations=5)


@xq(
    "kg_graph_katz",
    f"""
    SELECT node_id, katz_micro
    FROM read_parquet('{_pq("graph_katz")}')
    """,
)
def kg_graph_katz_q(spark, sf_dir):
    """Truncated Katz centrality (Katz 1953) over the same directed
    supplier succession graph as kg_graph_hits: attenuated-walk
    salience that never divides by degree — the third classical lens
    next to PageRank and HITS, and its rank disagreement with
    pagerank is the degree-skew diagnostic. Integer-micro
    unnormalized expansion (beta keeps textbook weight; alpha*d_max
    < 1 documented, hotter graphs fail loudly on ANSI overflow);
    twin = precomputed pure-Python replication (precompute.katz_py),
    bit-exact after 8 rounds."""
    from pyspark.sql import Window as W

    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    prec = (
        li.select(
            F.col("l_suppkey").alias("src"),
            F.lead("l_suppkey").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select("src", "dst")
    )
    return graph.katz_centrality(prec, iterations=8, alpha_ppm=100_000)


@xq(
    "event_eventually_follows",
    """
    WITH pos AS (
      SELECT user_id AS g, CAST(event_type AS VARCHAR) AS tok,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events
    ),
    pairs AS (
      SELECT DISTINCT a.g, a.tok AS from_token, b.tok AS to_token
      FROM pos a
      JOIN pos b ON a.g = b.g AND a.pos < b.pos AND b.pos - a.pos <= 10
    )
    SELECT from_token, to_token, count(*) AS n_groups
    FROM pairs GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)
def event_eventually_follows_q(spark, sf_dir):
    """Eventually-follows relation over per-user event sequences
    (distance <= 10, per-case support >= 5): the transitive
    behavioural matrix that directly-follows (event_markov_transitions)
    structurally misses. Twin replicates positions, the banded
    self-join, the per-case dedup and the support cut."""
    from ..operators import seqmine

    return seqmine.eventually_follows(
        load(spark, sf_dir, "events"), max_distance=10, min_groups=5
    )


# =========================================================================
# Densest subgraph: community-core extraction
# =========================================================================

@xq(
    "kg_graph_densest",
    f"""
    SELECT node_id, density_ppm, n_nodes, n_edges, found_round
    FROM read_parquet('{_pq("graph_densest")}')
    """,
)
def kg_graph_densest_q(spark, sf_dir):
    """Greedy densest subgraph (Bahmani et al., VLDB 2012) over the
    heterogeneous c->o->s->n KG (sparse and layered, so the peel
    actually RUNS — the near-complete supplier co-occurrence graph is
    its own densest core at round 0, structurally boring): peel
    deg <= 2(1+eps)rho per round, keep the best-density snapshot —
    the 2(1+eps)-approx community core, found here at round 1.
    Integer peel test in decimal(38,0); twin = precomputed
    pure-Python peeling replication (precompute.densest_py), pinning
    the node set, the ppm density and the round it was found."""
    from ..operators import graph

    return graph.densest_subgraph(_walk_kg_edges(spark, sf_dir))


# =========================================================================
# TextRank extractive summarization
# =========================================================================

@xq(
    "doc_textrank_summary",
    f"""
    SELECT doc_id, sent_idx, sentence, rank_micro, rk
    FROM read_parquet('{_pq("doc_textrank")}')
    """,
)
def doc_textrank_summary_q(spark, sf_dir):
    """TextRank extractive summarization (Mihalcea & Tarau 2004):
    top-3 sentences per document by integer PageRank over the
    per-document sentence-similarity graph (Jaccard-ppm >= 0.15 on
    distinct normalized words) — the deterministic baseline
    summarizer the generative path is graded against via
    rouge2_excerpt_eval's machinery. Symmetric edges mean zero
    dangling mass, so one corpus-wide power iteration ranks every
    document independently. Twin = precomputed pure-Python
    replication (precompute.textrank_py), bit-exact ranks included."""
    from ..operators.textrank import textrank_summary

    return textrank_summary(
        load(spark, sf_dir, "documents"), top_k=3, threshold_ppm=150_000
    )


# =========================================================================
# Greedy coloring: conflict-free update waves
# =========================================================================

@xq(
    "kg_graph_coloring",
    f"""
    SELECT node_id, color FROM read_parquet('{_pq("graph_coloring")}')
    """,
)
def kg_graph_coloring_q(spark, sf_dir):
    """Iterated-MIS greedy coloring over the >= 25-gated supplier
    co-occurrence graph (near-clique: 17 conflict-free classes over
    100 nodes — a REAL multi-class cascade): the batch scheduler for
    conflicting KG updates (merge waves that cannot race). Twin =
    precomputed pure-Python replication (precompute.coloring_py) of
    the identical MIS-class sequence."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 25)
        .select("src", "dst")
    )
    return graph.greedy_coloring(pairs)


@xq(
    "kg_graph_lpa_modularity",
    f"""
    WITH pairs AS (
      SELECT x.l_suppkey AS a, y.l_suppkey AS b
      FROM lineitem x
      JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY 1, 2
      HAVING count(DISTINCT x.l_orderkey) >= 35
    ),
    canon AS (
      SELECT DISTINCT
        least(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS lo,
        greatest(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS hi
      FROM pairs
    ),
    lab AS (
      SELECT CAST(node_id AS VARCHAR) AS n, CAST(label AS VARCHAR) AS lab
      FROM read_parquet('{_pq("graph_lpa")}')
    ),
    edges AS (
      SELECT c.lo, c.hi, ll.lab AS lab_lo, lh.lab AS lab_hi
      FROM canon c
      JOIN lab ll ON ll.n = c.lo
      JOIN lab lh ON lh.n = c.hi
    ),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS m_edges FROM edges),
    intra AS (
      SELECT lab_lo AS label, count(*) AS intra_edges
      FROM edges WHERE lab_lo = lab_hi GROUP BY 1
    ),
    ends AS (
      SELECT lo AS node, lab_lo AS label FROM edges
      UNION ALL
      SELECT hi AS node, lab_hi AS label FROM edges
    ),
    per AS (
      SELECT label, count(*) AS deg_sum, count(DISTINCT node) AS n_nodes
      FROM ends GROUP BY 1
    )
    SELECT p.label,
           CAST(p.n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           CAST(p.deg_sum AS BIGINT) AS deg_sum,
           CAST((CAST(coalesce(i.intra_edges, 0) AS HUGEINT) * 1000000)
                // m.m_edges AS BIGINT) AS coverage_ppm,
           CAST((CAST(p.deg_sum AS HUGEINT) * CAST(p.deg_sum AS HUGEINT)
                 * 1000000) // (4 * m.m_edges * m.m_edges) AS BIGINT)
             AS expected_ppm,
           CAST((CAST(coalesce(i.intra_edges, 0) AS HUGEINT) * 1000000)
                // m.m_edges AS BIGINT)
           - CAST((CAST(p.deg_sum AS HUGEINT) * CAST(p.deg_sum AS HUGEINT)
                   * 1000000) // (4 * m.m_edges * m.m_edges) AS BIGINT)
             AS q_ppm
    FROM per p
    LEFT JOIN intra i USING (label)
    CROSS JOIN m
    """,
)
def kg_graph_lpa_modularity_q(spark, sf_dir):
    """COMPOSITION: the LPA communities (kg_graph_lpa's exact run)
    scored by graph.modularity — partition quality of the engine's
    own community output, per community. The twin takes the labels
    from the INDEPENDENTLY verified pure-Python LPA snapshot and
    replicates the HUGEINT modularity arithmetic in SQL, so the hash
    gates the composition, not just each stage."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 35)
        .select("src", "dst")
    )
    labels = graph.label_propagation(pairs, max_iter=10).select(
        "node_id", F.col("label").cast("string").alias("label")
    )
    return graph.modularity(pairs, labels)


@xq(
    "kg_graph_pagerank_weighted",
    f"""
    SELECT node_id, rank_micro
    FROM read_parquet('{_pq("graph_pagerank_weighted")}')
    """,
)
def kg_graph_pagerank_weighted_q(spark, sf_dir):
    """Weighted PageRank over the >= 15-gated supplier co-occurrence
    graph (both directions), edge pull = the double-trunc
    co-occurrence strength 1e6 div (1e6 div n_orders) — the
    entity-salience signal where a 500-shared-order pairing moves
    more rank than a 15-order one. Per-edge trunc share
    (r*w div w_out), one edge-sized exchange per iteration; twin =
    precomputed pure-Python replication
    (precompute.pagerank_weighted_py), bit-exact after 10
    iterations."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    base = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").cast("string").alias("src"),
            F.col("y.l_suppkey").cast("string").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
        .select(
            "src", "dst",
            F.expr("1000000 div (1000000 div n_orders)").alias("weight"),
        )
    )
    edges = base.unionAll(
        base.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return graph.pagerank_weighted(edges)


@xq(
    "kg_bipartite_projection",
    """
    SELECT x.l_suppkey AS a, y.l_suppkey AS b,
           count(DISTINCT x.l_orderkey) AS n_shared
    FROM lineitem x
    JOIN lineitem y
      ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    GROUP BY 1, 2
    HAVING count(DISTINCT x.l_orderkey) >= 20
    """,
)
def kg_bipartite_projection_q(spark, sf_dir):
    """One-mode projection (graph.bipartite_projection) of the
    supplier<-order bipartite relation at the >= 20 gate — the
    co-occurrence constructor every graph query here builds on,
    packaged as THE operator with the exact shared-count semantics
    hash-gated."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    return graph.bipartite_projection(
        li.select(
            F.col("l_suppkey").alias("src"),
            F.col("l_orderkey").alias("dst"),
        ),
        min_shared=20,
    )


# =========================================================================
# Robust outlier flagging (median/MAD)
# =========================================================================

@xq(
    "event_value_outliers",
    """
    WITH base AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med
      FROM base GROUP BY 1
    ),
    dev AS (
      SELECT b.event_id, b.event_type, b.cents, m.med,
             abs(b.cents - m.med) AS abs_dev
      FROM base b JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs_dev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.cents, d.med, d.abs_dev, m.mad,
           10.0 * d.abs_dev > 30 * m.mad AS is_outlier
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def event_value_outliers_q(spark, sf_dir):
    """Robust median/MAD outlier screen (Iglewicz & Hoaglin 1993,
    k = 3.0) over event values per event type, values scaled to
    integer cents FIRST so both engines' median interpolation is
    IEEE-exact (halves of int64) and the no-division threshold
    10*|dev| > 30*mad compares identically. Twin replicates medians,
    deviations and the flag."""
    from ..operators.profile import robust_outliers

    base = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return robust_outliers(base, "cents", ["event_type"], k_x10=30)


# =========================================================================
# ER blocking-quality metrics + degree assortativity
# =========================================================================

@xq(
    "er_blocking_metrics",
    """
    WITH cand AS (
      SELECT DISTINCT
        least(CAST(a.s_suppkey AS VARCHAR), CAST(b.s_suppkey AS VARCHAR))
          AS lo,
        greatest(CAST(a.s_suppkey AS VARCHAR), CAST(b.s_suppkey AS VARCHAR))
          AS hi
      FROM supplier a
      JOIN supplier b
        ON a.s_suppkey % 10 = b.s_suppkey % 10
       AND a.s_suppkey < b.s_suppkey
    ),
    g AS (
      SELECT CAST(s_suppkey AS VARCHAR) AS id,
             CAST(s_nationkey AS VARCHAR) AS lab
      FROM supplier
    ),
    tt AS (
      SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1) // 2) AS HUGEINT) AS tp,
             CAST(sum(n) AS HUGEINT) AS n_ids
      FROM (SELECT count(*) AS n FROM g GROUP BY lab)
    ),
    ct AS (
      SELECT count(*) AS ct FROM cand c
      JOIN g gl ON gl.id = c.lo
      JOIN g gh ON gh.id = c.hi
      WHERE gl.lab = gh.lab
    ),
    nc AS (SELECT CAST(count(*) AS HUGEINT) AS nc FROM cand)
    SELECT CAST(nc AS BIGINT) AS n_candidates,
           CAST(tp AS BIGINT) AS n_true_pairs,
           CAST(ct AS BIGINT) AS n_candidate_true,
           CAST(n_ids * (n_ids - 1) // 2 AS BIGINT) AS n_total_pairs,
           CASE WHEN tp > 0
                THEN CAST((CAST(ct AS HUGEINT) * 1000000) // tp AS BIGINT)
           END AS pair_completeness_ppm,
           CASE WHEN n_ids * (n_ids - 1) // 2 > 0
                THEN CAST(((n_ids * (n_ids - 1) // 2 - nc) * 1000000)
                          // (n_ids * (n_ids - 1) // 2) AS BIGINT)
           END AS reduction_ratio_ppm
    FROM nc, tt, ct
    """,
)
def er_blocking_metrics_q(spark, sf_dir):
    """Blocking scorecard (Christen 2012 §7) of the s_suppkey % 10
    hash blocker against the nation gold partition: pair completeness
    (candidate recall over C(n_g,2) true pairs) + reduction ratio
    (pruned share of the quadratic space), both closed-form in
    decimal(38,0)/HUGEINT — the metric pair that grades every
    candidate generator here before its scoring pass. Twin replicates
    canonicalization, cells and ppm arithmetic."""
    from ..operators.linkage import blocking_metrics

    supp = load(spark, sf_dir, "supplier")
    a, b = supp.alias("a"), supp.alias("b")
    cands = a.join(
        b,
        (F.col("a.s_suppkey") % 10 == F.col("b.s_suppkey") % 10)
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("a"), F.col("b.s_suppkey").alias("b")
    )
    gold = supp.select(
        F.col("s_suppkey").alias("node_id"),
        F.col("s_nationkey").cast("string").alias("gold_label"),
    )
    return blocking_metrics(cands, gold)


@xq(
    "kg_graph_assortativity",
    """
    WITH pairs AS (
      SELECT x.l_suppkey AS a, y.l_suppkey AS b
      FROM lineitem x
      JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY 1, 2
      HAVING count(DISTINCT x.l_orderkey) >= 25
    ),
    canon AS (
      SELECT DISTINCT
        least(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS lo,
        greatest(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS hi
      FROM pairs
    ),
    deg AS (
      SELECT n, CAST(count(*) AS HUGEINT) AS d FROM (
        SELECT lo AS n FROM canon UNION ALL SELECT hi FROM canon
      ) GROUP BY 1
    ),
    sums AS (
      SELECT CAST(count(*) AS HUGEINT) AS m,
             sum(dj.d + dk.d) AS s1,
             sum(dj.d * dj.d + dk.d * dk.d) AS s2,
             sum(dj.d * dk.d) AS s3
      FROM canon c
      JOIN deg dj ON dj.n = c.lo
      JOIN deg dk ON dk.n = c.hi
    )
    SELECT CAST(m AS BIGINT) AS n_edges,
           CAST(s1 AS BIGINT) AS s1,
           CAST(s2 AS BIGINT) AS s2,
           CAST(s3 AS BIGINT) AS s3,
           CASE WHEN 2 * m * s2 - s1 * s1 <> 0
                THEN CAST(((4 * m * s3 - s1 * s1) * 1000000)
                          // (2 * m * s2 - s1 * s1) AS BIGINT)
           END AS r_ppm
    FROM sums
    """,
)
def kg_graph_assortativity_q(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the >= 25-gated supplier
    co-occurrence graph: do hubs attach to hubs? Exact integer form
    r = (4*M*S3 - S1^2) / (2*M*S2 - S1^2) in decimal(38,0)/HUGEINT
    with SIGNED trunc division (both engines truncate toward zero,
    verified) — the one-number skew-topology diagnostic that decides
    whether hot-key salting is a head-only or everywhere fix. Twin
    replicates degrees and the multiplied-out Pearson."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 25)
        .select("src", "dst")
    )
    return graph.degree_assortativity(pairs)


# =========================================================================
# Condensation DAG + topological layering
# =========================================================================

@xq(
    "kg_condensed_layers",
    """
    WITH RECURSIVE succ AS (
      SELECT l_suppkey,
             lead(l_suppkey) OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
             ) AS nxt
      FROM lineitem
    ),
    edges AS (
      SELECT l_suppkey AS src, nxt AS dst FROM succ
      WHERE nxt IS NOT NULL AND nxt <> l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 10
    ),
    reach(u, v) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.u, e.dst FROM reach r JOIN edges e ON e.src = r.v
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    mutual AS (
      SELECT r1.u AS a, r1.v AS b
      FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
    ),
    sccmap AS (
      SELECT node, min(m) AS scc_id FROM (
        SELECT node, node AS m FROM nodes
        UNION ALL
        SELECT a AS node, b AS m FROM mutual
      ) GROUP BY node
    ),
    cond AS (
      SELECT DISTINCT CAST(la.scc_id AS VARCHAR) AS src,
                      CAST(lb.scc_id AS VARCHAR) AS dst
      FROM edges e
      JOIN sccmap la ON la.node = e.src
      JOIN sccmap lb ON lb.node = e.dst
      WHERE la.scc_id <> lb.scc_id
    ),
    cnodes AS (SELECT src AS n FROM cond UNION SELECT dst FROM cond),
    paths(n, d) AS (
      SELECT n, 0 FROM cnodes WHERE n NOT IN (SELECT dst FROM cond)
      UNION
      SELECT c.dst, p.d + 1 FROM paths p JOIN cond c ON c.src = p.n
    )
    SELECT n AS node_id, CAST(max(d) AS INTEGER) AS layer
    FROM paths GROUP BY 1
    """,
)
def kg_condensed_layers_q(spark, sf_dir):
    """COMPOSITION: strongly_connected_components over the directed
    supplier succession graph -> condense (the component DAG — always
    acyclic by construction) -> topo_layers (longest-incoming-path
    dependency waves). The twin recomputes SCC labels by the
    INDEPENDENT transitive-closure algorithm, condenses in SQL, and
    layers via recursive path enumeration + max — so the hash gates
    the three-operator composition end to end."""
    from pyspark.sql import Window as W

    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    edges = (
        li.select(
            F.col("l_suppkey").alias("src"),
            F.lead("l_suppkey").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .select("src", "dst")
        .localCheckpoint()  # feeds SCC and the condensation rewrite
    )
    sccs = graph.strongly_connected_components(edges)
    dag = graph.condense(edges, sccs, label="scc_id")
    return graph.topo_layers(dag)


# =========================================================================
# PathSim: heterogeneous meta-path peer similarity
# =========================================================================

@q(
    "kg_pathsim_customers",
    """
    WITH inst AS (
      SELECT CAST(o.o_custkey AS VARCHAR) AS x,
             CAST(l.l_suppkey AS VARCHAR) AS m,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey % 20 = 0
      GROUP BY 1, 2
    ),
    diag AS (
      SELECT x, CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS m_self
      FROM inst GROUP BY 1
    ),
    pairs AS (
      SELECT l.x AS pa, r.x AS pb,
             CAST(sum(CAST(l.cnt AS HUGEINT) * r.cnt) AS HUGEINT) AS m_ab
      FROM inst l
      JOIN inst r ON l.m = r.m AND l.x < r.x
      GROUP BY 1, 2
    )
    SELECT p.pa AS a, p.pb AS b,
           CAST(p.m_ab AS BIGINT) AS m_ab,
           CAST(da.m_self AS BIGINT) AS m_aa,
           CAST(db.m_self AS BIGINT) AS m_bb,
           CAST((2 * p.m_ab * 1000000) // (da.m_self + db.m_self)
             AS BIGINT) AS pathsim_ppm
    FROM pairs p
    JOIN diag da ON da.x = p.pa
    JOIN diag db ON db.x = p.pb
    WHERE CAST((2 * p.m_ab * 1000000) // (da.m_self + db.m_self)
          AS BIGINT) >= 400000
    """,
)
def kg_pathsim_customers_q(spark, sf_dir):
    """PathSim (Sun et al., VLDB 2011) between customers over the
    symmetric meta-path customer-order-supplier-order-customer
    (o_orderkey % 20 slice): structurally-alike peers, with the
    self-instance normalization that keeps big buyers from dominating
    raw co-occurrence; >= 0.4 cut. Twin replicates the half-path
    instance fold, the HUGEINT products and the trunc ppm."""
    from ..operators import graph

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    li = load(spark, sf_dir, "lineitem")
    inst = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("a"), F.col("l_suppkey").alias("mid")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return graph.pathsim(inst, min_sim_ppm=400_000)


@xq(
    "event_value_deciles",
    """
    SELECT event_id, event_type, cents,
           ntile(10) OVER (PARTITION BY event_type
                           ORDER BY cents, event_id) AS bin
    FROM (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    """,
)
def event_value_deciles_q(spark, sf_dir):
    """Equi-depth decile assignment of event values (integer cents)
    per event type — ntile semantics (bin sizes differ by <= 1), tie
    broken by event_id so the cut is deterministic on both engines.
    Twin is the direct ntile window."""
    from ..operators.profile import equi_depth_bins

    base = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return equi_depth_bins(
        base, "cents", n_bins=10, group_cols=["event_type"],
        tie_cols=["event_id"],
    )


@xq(
    "kg_clustering_coefficients",
    """
    WITH pairs AS (
      SELECT x.l_suppkey AS a, y.l_suppkey AS b
      FROM lineitem x
      JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
      GROUP BY 1, 2
      HAVING count(DISTINCT x.l_orderkey) >= 28
    ),
    canon AS (
      SELECT DISTINCT
        least(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS lo,
        greatest(CAST(a AS VARCHAR), CAST(b AS VARCHAR)) AS hi
      FROM pairs
    ),
    deg AS (
      SELECT n, count(*) AS d FROM (
        SELECT lo AS n FROM canon UNION ALL SELECT hi FROM canon
      ) GROUP BY 1
    ),
    tris AS (
      SELECT e1.lo AS w, e1.hi AS x, e2.hi AS y
      FROM canon e1
      JOIN canon e2 ON e2.lo = e1.hi
      JOIN canon e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    corners AS (
      SELECT n, count(*) AS t FROM (
        SELECT w AS n FROM tris
        UNION ALL SELECT x FROM tris
        UNION ALL SELECT y FROM tris
      ) GROUP BY 1
    )
    SELECT d.n AS node_id,
           CAST(d.d AS BIGINT) AS degree,
           CAST(coalesce(c.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.d >= 2 THEN
             CAST((2 * coalesce(c.t, 0) * CAST(1000000 AS HUGEINT))
                  // (CAST(d.d AS HUGEINT) * (d.d - 1)) AS BIGINT)
           END AS clustering_ppm
    FROM deg d LEFT JOIN corners c ON c.n = d.n
    """,
)
def kg_clustering_coefficients_q(spark, sf_dir):
    """Per-node local clustering coefficients (Watts & Strogatz 1998)
    over the >= 28-gated supplier co-occurrence graph — bridge vs
    community-member detection at the node grain. The twin enumerates
    triangles by the INDEPENDENT canonical a<b<c three-way join
    (the operator uses degree-ordered compact-forward), so agreement
    checks the census itself, corner by corner."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 28)
        .select("src", "dst")
    )
    return graph.clustering_coefficients(pairs)


@xq(
    "t_tool_chains",
    f"""
    SELECT gram, n_groups, n_occurrences
    FROM read_parquet('{_pq("tool_chains")}')
    """,
)
def t_tool_chains_q(spark, sf_dir):
    """Tool-call chain mining over the RAW transcript payload: the
    tool stream (tool-bearing turns in turn_idx order per
    conversation) fed to seqmine.sequence_ngrams at n=2 — which tool
    pairs follow each other in agent behaviour, the payload-native
    companion to the events-table sequence queries. Twin =
    precomputed pure-Python replication over the identical
    generate_rows corpus."""
    from ..operators import seqmine

    turns = transcripts_for(spark, sf_dir).filter(F.col("tool").isNotNull())
    return seqmine.sequence_ngrams(
        turns, group="conv_id", order_by=("turn_idx",), token="tool",
        n=2, min_groups=1,
    )


@xq(
    "conv_topic_gaps",
    f"""
    SELECT conv_id, gap_after, score_ppm, depth_ppm, is_boundary
    FROM read_parquet('{_pq("texttiling_gaps")}')
    """,
)
def conv_topic_gaps_q(spark, sf_dir):
    """TextTiling (Hearst, CL 1997) topic-cohesion scores + boundary
    flags at every inter-turn gap of the transcript corpus — the
    content-aware chunking signal for KG ingestion (the reference
    chunks by character count, graph_ingestion.py:68-69). Twin =
    precomputed pure-Python precompute.texttiling_py over the
    identical generate_rows corpus (trunc-ppm integer Jaccard makes
    the match bit-exact)."""
    from ..operators import segmentation

    return segmentation.texttiling_gaps(transcripts_for(spark, sf_dir))


@q(
    "bm25_retrieval_eval",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents WHERE text IS NOT NULL),
    st AS (SELECT count(*)::BIGINT AS n_docs,
                  sum(len(words))::BIGINT AS sum_dl FROM w),
    tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, unnest(words) AS term,
                         len(words)::BIGINT AS dl FROM w)
            GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY term),
    qt AS (SELECT doc_id AS query_id,
                  unnest(list_distinct(words[1:10])) AS term
           FROM w WHERE doc_id IN (0, 7, 42)),
    con AS (SELECT qt.query_id, tfc.doc_id,
                   CAST(round(ln(1.0 + (st.n_docs - dfc.df + 0.5)
                                       / (dfc.df + 0.5))
                        * (tfc.tf * 2.2)
                        / (tfc.tf + 1.2 * (0.25 + 0.75
                             * (tfc.dl * st.n_docs) / st.sum_dl))
                        * 1000000) AS BIGINT) AS c
            FROM qt JOIN tfc USING (term) JOIN dfc USING (term) CROSS JOIN st),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_micro
           FROM con GROUP BY 1, 2),
    run AS (SELECT query_id, doc_id, rank FROM (
              SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_micro DESC, doc_id)
                       ::BIGINT AS rank
              FROM sc) WHERE rank <= 20),
    qr AS (SELECT q.doc_id AS query_id, d.doc_id
           FROM documents q JOIN documents d
             ON d.source = q.source AND d.lang = q.lang
           WHERE q.doc_id IN (0, 7, 42)),
    nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel FROM qr GROUP BY 1),
    mk AS (SELECT r.query_id, r.rank,
                  CASE WHEN qr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
           FROM run r LEFT JOIN qr
             ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id),
    rc AS (SELECT query_id, rank, rel,
                  sum(rel) OVER (PARTITION BY query_id ORDER BY rank)
                    AS relcnt
           FROM mk),
    pq AS (SELECT query_id,
                  count(*)::BIGINT AS n_ranked,
                  sum(CASE WHEN rel = 1 AND rank <= 10
                           THEN 1 ELSE 0 END)::BIGINT AS hits_at_k,
                  min(CASE WHEN rel = 1 AND rank <= 10
                           THEN rank END) AS first_rel,
                  sum(CASE WHEN rel = 1 AND rank <= 10
                           THEN (relcnt * 1000000) // rank
                           ELSE 0 END)::BIGINT AS ap_num
           FROM rc GROUP BY 1)
    SELECT n.query_id,
           n.n_rel,
           coalesce(p.n_ranked, 0) AS n_ranked,
           coalesce(p.hits_at_k, 0) AS hits_at_k,
           (coalesce(p.hits_at_k, 0) * 1000000) // 10 AS p_at_k_ppm,
           (coalesce(p.hits_at_k, 0) * 1000000) // n.n_rel AS r_at_k_ppm,
           CASE WHEN p.first_rel IS NOT NULL THEN 1000000 // p.first_rel
                ELSE 0 END AS rr_ppm,
           coalesce(p.ap_num, 0) // n.n_rel AS ap_ppm
    FROM nrel n LEFT JOIN pq p USING (query_id)
    """,
)
def bm25_retrieval_eval_q(spark, sf_dir):
    """The trec_eval battery over the engine's OWN BM25 run: queries
    are the first ten tokens of docs 0/7/42 ("more like this"), the
    run is bm25_topk at k=20 (integer micro scores shared bit-for-bit
    with the twin's CTE), and relevance = same (source, lang) class as
    the query doc — does lexical retrieval recover the query's
    corpus slice? The twin stacks the full AP/P@10/R@10/RR arithmetic
    (per-term ppm truncation order included) on the bm25_topk CTE, so
    the hash gates the two-operator COMPOSITION."""
    from ..operators import rankeval

    docs = load(spark, sf_dir, "documents")
    qs = bm25.sample_doc_queries(docs, [0, 7, 42], n_words=10)
    run = bm25.bm25_topk(docs, qs, k=20).select("query_id", "doc_id", "rank")
    qdocs = docs.filter(F.col("doc_id").isin([0, 7, 42])).select(
        F.col("doc_id").alias("query_id"), "source", "lang"
    )
    qrels = qdocs.join(docs, on=["source", "lang"]).select(
        "query_id", "doc_id"
    )
    return rankeval.ranking_metrics(run, qrels, k=10)


@q(
    "sft_training_pairs",
    f"""
    SELECT conv_id, pair_id, prev_role, prompt, n_context_turns,
           response, n_response_turns
    FROM read_parquet('{_pq("sft_pairs")}')
    """,
)
def sft_training_pairs_q(spark, sf_dir):
    """SFT (prompt, response) pair assembly over the raw transcript
    payload: one pair per maximal assistant-turn run, prompt = the
    last 4 turns rendered `role: text`, prev_role kept (not filtered)
    so chat-SFT and agent-trajectory consumers slice differently.
    Twin = precomputed pure-Python precompute.sft_pairs_py over the
    identical generate_rows corpus."""
    from ..operators import sftpairs

    return sftpairs.sft_pairs(transcripts_for(spark, sf_dir)).select(
        "conv_id", "pair_id", "prev_role", "prompt", "n_context_turns",
        "response", "n_response_turns",
    )


@q(
    "kg_topic_chunks",
    f"""
    SELECT conv_id, seg_idx, chunk_id, chunk_text, n_turns,
           first_turn, last_turn
    FROM read_parquet('{_pq("topic_chunks")}')
    """,
)
def kg_topic_chunks_q(spark, sf_dir):
    """Content-aware chunk assembly: TextTiling topic segments joined
    into ingestion chunks under the reference's chunk-id rule
    (sha1(chunk_text + conv_id), base.py:381-387) — the alternative
    front-end to the character-count splitter, one conv-keyed
    Exchange end-to-end. Twin = precomputed pure-Python
    precompute.topic_chunks_py over the identical corpus (boundary
    detection + assembly + sha1, all Spark-free)."""
    from ..operators import segmentation

    return segmentation.topic_chunks(transcripts_for(spark, sf_dir))


@xq(
    "event_salience_decayed",
    """
    SELECT user_id, event_type, count(*)::BIGINT AS n_events,
           sum(1000000 >> least(
             (epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(ts))
               // 1000000 // 604800, 62))::BIGINT AS salience,
           max(ts) AS last_ts
    FROM events
    WHERE ts IS NOT NULL
      AND epoch_us(ts) <= epoch_us(TIMESTAMP '2024-01-31 00:00:00')
    GROUP BY 1, 2
    """,
)
def event_salience_decayed_q(spark, sf_dir):
    """Recency-weighted activity per (user, event_type) at a 7-day
    half-life — the decayed complement of A4's plain frequency (a KG
    retrieval layer ranks by CURRENT salience, not lifetime counts).
    Weight = 1e6 >> (age div half_life): the power-of-two staircase of
    exponential decay, pure int64 on both engines (no exp()/pow()
    float drift). Rows after the as_of instant are excluded, never
    negatively aged."""
    from ..operators import profile as prof

    return prof.time_decayed_counts(
        load(spark, sf_dir, "events"),
        ["user_id", "event_type"],
        "ts",
        as_of="2024-01-31 00:00:00",
        half_life_s=7 * 86400,
    )


@q(
    "event_bursts",
    """
    WITH c AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 // 3600 AS epoch,
             count(*)::BIGINT AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), t AS (
      SELECT *, coalesce(sum(cnt) OVER (
               PARTITION BY event_type ORDER BY epoch
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS base_sum
      FROM c
    ), b AS (
      SELECT *, epoch - row_number() OVER (
               PARTITION BY event_type ORDER BY epoch) AS island
      FROM t WHERE cnt >= 5 AND cnt * 24 > 3 * base_sum
    )
    SELECT event_type, min(epoch) AS start_epoch, max(epoch) AS end_epoch,
           count(*)::BIGINT AS n_buckets, sum(cnt)::BIGINT AS total_events,
           max(cnt) AS peak_count
    FROM b GROUP BY event_type, island
    """,
)
def event_bursts_q(spark, sf_dir):
    """Temporal burst intervals per event type: hourly buckets whose
    count exceeds 3x the key's own trailing 24h mean (division-free
    integer form), collapsed into maximal consecutive runs via the
    gaps-and-islands identity. RANGE-frame baseline makes empty
    buckets contribute exactly 0 without densification; cold-start
    spikes gate on min_count alone. One bucket aggregation + one
    key-keyed window chain."""
    from ..operators import profile as prof

    return prof.burst_intervals(
        load(spark, sf_dir, "events"),
        ["event_type"],
        "ts",
        bucket_s=3600,
        baseline_buckets=24,
        factor_num=3,
        min_count=5,
    )


@xq(
    "event_health_scorecard",
    """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS epoch,
             count(*)::BIGINT AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    act AS (
      SELECT event_type, count(*)::BIGINT AS n_events
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    bt AS (
      SELECT *, coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS base_sum
      FROM c
    ),
    bb AS (
      SELECT *, epoch - row_number() OVER (
               PARTITION BY event_type ORDER BY epoch) AS island
      FROM bt WHERE cnt >= 5 AND cnt * 24 > 3 * base_sum
    ),
    bi AS (
      SELECT event_type, island, max(cnt) AS peak
      FROM bb GROUP BY 1, 2
    ),
    bursts AS (
      SELECT event_type, count(*)::BIGINT AS n_bursts,
             max(peak) AS max_burst_peak
      FROM bi GROUP BY 1
    ),
    sg AS (
      SELECT event_type, epoch, lag(epoch) OVER (
               PARTITION BY event_type ORDER BY epoch) AS prev
      FROM c
    ),
    si AS (
      SELECT event_type, epoch - prev - 1 AS n_buckets, false AS is_trailing
      FROM sg WHERE prev IS NOT NULL AND epoch - prev - 1 >= 2
      UNION ALL
      SELECT event_type,
             (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600)
               - max(epoch) - 1, true
      FROM c GROUP BY event_type
      HAVING (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600)
               - max(epoch) - 1 >= 2
    ),
    silences AS (
      SELECT event_type, count(*)::BIGINT AS n_silences,
             max(n_buckets) AS max_silence_buckets,
             max(CASE WHEN is_trailing THEN 1 ELSE 0 END)::BIGINT
               AS ongoing_silence
      FROM si GROUP BY 1
    ),
    lt AS (
      SELECT event_type, epoch,
        coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
          RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS trail_sum,
        coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
          RANGE BETWEEN CURRENT ROW AND 23 FOLLOWING), 0) AS lead_sum
      FROM c
    ),
    lf AS (
      SELECT *, CASE
          WHEN lead_sum >= 2 * trail_sum AND lead_sum >= 10
               AND trail_sum >= 1 THEN 1
          WHEN trail_sum >= 2 * lead_sum AND trail_sum >= 10
               AND lead_sum >= 1 THEN -1 END AS direction
      FROM lt
    ),
    lg AS (
      SELECT *, CASE WHEN lag(epoch) OVER w = epoch - 1
                 AND lag(direction) OVER w = direction
                THEN 0 ELSE 1 END AS new_run
      FROM lf WHERE direction IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch)
    ),
    lr AS (
      SELECT event_type, direction,
             sum(new_run) OVER (PARTITION BY event_type ORDER BY epoch) AS run,
             new_run
      FROM lg
    ),
    shifts AS (
      SELECT event_type,
             sum(CASE WHEN direction = 1 THEN new_run ELSE 0 END)::BIGINT
               AS n_up_shifts,
             sum(CASE WHEN direction = -1 THEN new_run ELSE 0 END)::BIGINT
               AS n_down_shifts
      FROM lr GROUP BY 1
    )
    SELECT act.event_type, n_events,
           coalesce(n_bursts, 0) AS n_bursts,
           coalesce(max_burst_peak, 0) AS max_burst_peak,
           coalesce(n_silences, 0) AS n_silences,
           coalesce(max_silence_buckets, 0) AS max_silence_buckets,
           coalesce(ongoing_silence, 0) AS ongoing_silence,
           coalesce(n_up_shifts, 0) AS n_up_shifts,
           coalesce(n_down_shifts, 0) AS n_down_shifts
    FROM act
    LEFT JOIN bursts USING (event_type)
    LEFT JOIN silences USING (event_type)
    LEFT JOIN shifts USING (event_type)
    """,
)
def event_health_scorecard_q(spark, sf_dir):
    """The temporal-health COMPOSITION: one monitor row per event type
    joining all three detectors (burst runs + peak, silence intervals
    + ongoing flag, up/down level shifts) onto the activity spine —
    healthy keys appear with zeros, never vanish. The twin stacks all
    four legs as one CTE chain, so the hash gates every detector's
    arithmetic AND the join/zero-fill composition (the
    curation_pipeline pattern). Shift-run counting in the twin sums
    new_run flags per direction — identical to counting elected
    representatives, since each run elects exactly one."""
    from ..operators import profile as prof

    return prof.temporal_health_scorecard(
        load(spark, sf_dir, "events"),
        ["event_type"],
        "ts",
        bucket_s=3600,
        baseline_buckets=24,
        burst_factor_num=3,
        burst_min_count=5,
        min_gap_buckets=2,
        shift_factor_num=2,
        shift_min_side=10,
        as_of="2024-01-31 00:00:00",
    )


@q(
    "event_level_shifts",
    """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS epoch,
             count(*)::BIGINT AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), t AS (
      SELECT event_type, epoch,
        coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
          RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS trail_sum,
        coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY epoch
          RANGE BETWEEN CURRENT ROW AND 23 FOLLOWING), 0) AS lead_sum
      FROM c
    ), f AS (
      SELECT *, CASE
          WHEN lead_sum >= 2 * trail_sum AND lead_sum >= 10
               AND trail_sum >= 1 THEN 1
          WHEN trail_sum >= 2 * lead_sum AND trail_sum >= 10
               AND lead_sum >= 1 THEN -1 END AS direction
      FROM t
    ), g AS (
      SELECT *, CASE WHEN lag(epoch) OVER w = epoch - 1
                 AND lag(direction) OVER w = direction
                THEN 0 ELSE 1 END AS new_run
      FROM f WHERE direction IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch)
    ), r AS (
      SELECT *, sum(new_run) OVER (
          PARTITION BY event_type ORDER BY epoch) AS run
      FROM g
    ), e AS (
      SELECT *, row_number() OVER (
          PARTITION BY event_type, run
          ORDER BY abs(lead_sum - trail_sum) DESC, epoch ASC) AS rn
      FROM r
    )
    SELECT event_type, epoch, direction, trail_sum, lead_sum,
           lead_sum * 1000000 // trail_sum AS ratio_ppm
    FROM e WHERE rn = 1
    """,
)
def event_level_shifts_q(spark, sf_dir):
    """Sustained regime shifts per event type: trailing vs leading
    24-bucket RANGE-frame sums at every active bucket, division-free
    2x threshold both directions, same-direction runs collapsed with
    a deterministic max-|lead-trail| / min-epoch election. On the
    uniform synthetic corpus the emitted events are each key's
    ramp-in/ramp-out edges (full_window=False documents this) — the
    hash gates the frame arithmetic, run collapse and election
    end-to-end; planted mid-stream shifts are pinned by unit
    fixtures."""
    from ..operators import profile as prof

    return prof.level_shifts(
        load(spark, sf_dir, "events"),
        ["event_type"],
        "ts",
        bucket_s=3600,
        window_buckets=24,
        factor_num=2,
        min_side_events=10,
    )


@q(
    "event_silences",
    """
    WITH a AS (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // 1000000 // 3600 AS epoch
      FROM events WHERE ts IS NOT NULL
    ), g AS (
      SELECT *, lag(epoch) OVER (
               PARTITION BY user_id, event_type ORDER BY epoch) AS prev
      FROM a
    ), interior AS (
      SELECT user_id, event_type, prev + 1 AS start_epoch,
             epoch - 1 AS end_epoch, epoch - prev - 1 AS n_buckets,
             false AS is_trailing
      FROM g WHERE prev IS NOT NULL AND epoch - prev - 1 >= 72
    ), last AS (
      SELECT user_id, event_type, max(epoch) AS last_epoch FROM a GROUP BY 1, 2
    ), trail AS (
      SELECT user_id, event_type, last_epoch + 1 AS start_epoch,
             (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600) - 1
               AS end_epoch,
             (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600)
               - last_epoch - 1 AS n_buckets,
             true AS is_trailing
      FROM last
      WHERE (epoch_us(TIMESTAMP '2024-01-31 00:00:00') // 1000000 // 3600)
              - last_epoch - 1 >= 72
    )
    SELECT * FROM interior UNION ALL SELECT * FROM trail
    """,
)
def event_silences_q(spark, sf_dir):
    """Outage intervals per (user, event_type): runs of >= 72 empty
    hourly buckets between consecutive active buckets, plus ongoing
    trailing silences as of the corpus end. A rate DROP produces no
    bucket rows, so no count threshold can see it — the lag-gap over
    distinct active epochs is the only densification-free detector.
    One key-shuffle of distinct active buckets shared by the lag
    window and the trailing max."""
    from ..operators import profile as prof

    return prof.silence_intervals(
        load(spark, sf_dir, "events"),
        ["user_id", "event_type"],
        "ts",
        bucket_s=3600,
        min_gap_buckets=72,
        as_of="2024-01-31 00:00:00",
    )


@xq(
    "clf_calibration",
    f"""
    WITH sc AS (SELECT prob, doc_id % 2 AS label
                FROM read_parquet('{_pq("quality_classifier")}')),
    b AS (SELECT least(CAST(floor(prob * 10) AS INT), 9) AS bin,
                 CAST(floor(prob * 1000000) AS BIGINT) AS p_micro,
                 CAST(floor((prob - label) * (prob - label) * 1000000)
                      AS BIGINT) AS sq_micro,
                 label
          FROM sc)
    SELECT bin, count(*)::BIGINT AS n, sum(label)::BIGINT AS n_pos,
           sum(p_micro) // count(*) AS conf_ppm,
           (sum(label) * 1000000) // count(*) AS acc_ppm,
           sum(p_micro) // count(*)
             - (sum(label) * 1000000) // count(*) AS gap_ppm,
           sum(p_micro)::BIGINT AS sum_prob_micro,
           sum(sq_micro)::BIGINT AS sum_sq_err_micro
    FROM b GROUP BY bin
    """,
)
def clf_calibration_q(spark, sf_dir):
    """Reliability-diagram battery (Guo et al. 2017) over the learned
    quality classifier's live probabilities, against parity labels
    (doc_id % 2) as a NEGATIVE CONTROL: labels are independent of the
    text, so a well-behaved evaluator must show per-bin accuracy ~ the
    500000 base rate and gap = the classifier's raw confidence spread
    — the arithmetic (micro flooring of bit-exact floats, trunc-ppm
    ratios, top-bin clamp) is what the hash gates. Twin = the same
    binning over the float-bit-exact quality_classifier snapshot."""
    from ..operators import calibration, textmetrics

    scored = textmetrics.quality_classifier(
        load(spark, sf_dir, "documents")
    ).select("prob", (F.col("doc_id") % 2).cast("int").alias("label"))
    return calibration.calibration_metrics(scored, n_bins=10)


def _ndcg_weight_values(k: int) -> str:
    """The nDCG discount table as a SQL VALUES list — interpolated
    from the SAME rankeval.discount_micro integers the Spark plan
    embeds as an array literal, so neither engine evaluates log2()."""
    from ..operators import rankeval

    return ", ".join(
        f"({i}, {rankeval.discount_micro(i)})" for i in range(1, k + 1)
    )


@xq(
    "bm25_ndcg_eval",
    rf"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents WHERE text IS NOT NULL),
    st AS (SELECT count(*)::BIGINT AS n_docs,
                  sum(len(words))::BIGINT AS sum_dl FROM w),
    tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, unnest(words) AS term,
                         len(words)::BIGINT AS dl FROM w)
            GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY term),
    qt AS (SELECT doc_id AS query_id,
                  unnest(list_distinct(words[1:10])) AS term
           FROM w WHERE doc_id IN (0, 7, 42)),
    con AS (SELECT qt.query_id, tfc.doc_id,
                   CAST(round(ln(1.0 + (st.n_docs - dfc.df + 0.5)
                                       / (dfc.df + 0.5))
                        * (tfc.tf * 2.2)
                        / (tfc.tf + 1.2 * (0.25 + 0.75
                             * (tfc.dl * st.n_docs) / st.sum_dl))
                        * 1000000) AS BIGINT) AS c
            FROM qt JOIN tfc USING (term) JOIN dfc USING (term) CROSS JOIN st),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_micro
           FROM con GROUP BY 1, 2),
    run AS (SELECT query_id, doc_id, rank FROM (
              SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_micro DESC, doc_id)
                       ::BIGINT AS rank
              FROM sc) WHERE rank <= 20),
    wt(pos, wt_micro) AS (VALUES {_ndcg_weight_values(10)}),
    qr AS (SELECT q.doc_id AS query_id, d.doc_id,
                  CASE WHEN d.lang = q.lang THEN 2 ELSE 1 END::BIGINT AS gain
           FROM documents q JOIN documents d ON d.source = q.source
           WHERE q.doc_id IN (0, 7, 42)),
    nj AS (SELECT query_id, count(*)::BIGINT AS n_judged FROM qr GROUP BY 1),
    ideal AS (SELECT query_id,
                     sum(gain * wt_micro)::BIGINT AS idcg_micro
              FROM (SELECT query_id, gain,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY gain DESC, doc_id)
                             AS pos
                    FROM qr) i JOIN wt USING (pos)
              WHERE pos <= 10 GROUP BY 1),
    dcg AS (SELECT r.query_id,
                   count(*)::BIGINT AS n_ranked,
                   coalesce(sum(qr.gain * wt.wt_micro), 0)::BIGINT
                     AS dcg_micro
            FROM run r
            LEFT JOIN qr ON qr.query_id = r.query_id
                        AND qr.doc_id = r.doc_id
            LEFT JOIN wt ON wt.pos = r.rank AND r.rank <= 10
            GROUP BY 1),
    j AS (SELECT query_id, n_judged, idcg_micro
          FROM nj JOIN ideal USING (query_id))
    SELECT coalesce(j.query_id, d.query_id) AS query_id,
           coalesce(j.n_judged, 0) AS n_judged,
           coalesce(d.n_ranked, 0) AS n_ranked,
           CASE WHEN j.query_id IS NOT NULL
                THEN coalesce(d.dcg_micro, 0) END AS dcg_micro,
           j.idcg_micro,
           CASE WHEN j.idcg_micro > 0
                THEN (coalesce(d.dcg_micro, 0) * 1000000) // j.idcg_micro
           END AS ndcg_ppm
    FROM j FULL JOIN dcg d ON d.query_id = j.query_id
    """,
)
def bm25_ndcg_eval_q(spark, sf_dir):
    """nDCG@10 with GRADED relevance over the engine's own BM25 run
    (Järvelin & Kekäläinen, TOIS 2002): same doc-0/7/42 "more like
    this" queries and k=20 run as bm25_retrieval_eval, but judgments
    carry degrees — gain 2 for the query doc's exact (source, lang)
    class, gain 1 for same source in another language. The twin stacks
    the full graded battery (max-gain collapse, the interpolated
    integer discount table, decimal-safe trunc-ppm ratio) on the
    bm25_topk CTE, so the hash gates the composition AND pins the
    driver-side discount literals byte-for-byte across engines. The
    twin FULL JOINs the run side (mirroring ndcg_metrics' full_outer)
    so the run-only/unjudged-query contract — n_judged=0, NULL dcg,
    NULL ndcg — is pinned by the parity hash, not just invisible on a
    corpus where every query judges itself (ADVICE r4)."""
    from ..operators import rankeval

    docs = load(spark, sf_dir, "documents")
    qs = bm25.sample_doc_queries(docs, [0, 7, 42], n_words=10)
    run = bm25.bm25_topk(docs, qs, k=20).select("query_id", "doc_id", "rank")
    qdocs = docs.filter(F.col("doc_id").isin([0, 7, 42])).select(
        F.col("doc_id").alias("query_id"),
        F.col("source").alias("_qsrc"),
        F.col("lang").alias("_qlang"),
    )
    qrels = qdocs.join(
        docs, on=[F.col("source") == F.col("_qsrc")], how="inner"
    ).select(
        "query_id",
        "doc_id",
        F.when(F.col("lang") == F.col("_qlang"), 2)
        .otherwise(1)
        .cast("long")
        .alias("gain"),
    )
    return rankeval.ndcg_metrics(run, qrels, k=10)


@xq(
    "chrf_excerpt_eval",
    f"""
    WITH w AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words,
                      {_NORM_SQL} AS norm
               FROM documents),
    p AS (SELECT doc_id,
            repeat(replace(array_to_string(words[5:20], ' '), ' ', ''), 2)
              AS cc,
            replace(norm, ' ', '') AS rc
          FROM w WHERE doc_id % 5 = 0 AND len(words) >= 24),
    lv AS (SELECT doc_id, n,
             greatest(length(cc) - n + 1, 0)::BIGINT AS tc,
             greatest(length(rc) - n + 1, 0)::BIGINT AS tr,
             cc, rc
           FROM p, (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n) ns),
    cnt AS (
      SELECT doc_id, n, gram, sum(c)::BIGINT AS c, sum(r)::BIGINT AS r
      FROM (
        SELECT doc_id, n,
               unnest(list_transform(range(1, tc + 1),
                      i -> substring(cc, i, n))) AS gram,
               1 AS c, 0 AS r
        FROM lv
        UNION ALL
        SELECT doc_id, n,
               unnest(list_transform(range(1, tr + 1),
                      i -> substring(rc, i, n))) AS gram,
               0 AS c, 1 AS r
        FROM lv
      ) GROUP BY 1, 2, 3),
    clip AS (SELECT doc_id, n, sum(least(c, r))::BIGINT AS cl
             FROM cnt GROUP BY 1, 2),
    pl AS (SELECT l.doc_id, l.n, l.tc, l.tr, coalesce(c.cl, 0) AS cl,
             CASE WHEN 4 * l.tr + l.tc > 0
                  THEN (5 * coalesce(c.cl, 0) * 1000000)
                       // (4 * l.tr + l.tc) END AS f_ppm
           FROM lv l LEFT JOIN clip c USING (doc_id, n))
    SELECT doc_id,
           CAST(count(f_ppm) AS INT) AS n_levels,
           CAST(sum(tc) AS BIGINT) AS cand_grams,
           CAST(sum(tr) AS BIGINT) AS ref_grams,
           CAST(sum(cl) AS BIGINT) AS clipped_overlap,
           CASE WHEN count(f_ppm) > 0
                THEN CAST(sum(coalesce(f_ppm, 0)) // count(f_ppm) AS BIGINT)
           END AS chrf_ppm
    FROM pl GROUP BY 1
    """,
)
def chrf_excerpt_eval_q(spark, sf_dir):
    """chrF2 (Popović, WMT 2015) of a DOUBLED 16-word excerpt (every
    5th sufficiently long doc) against its full document: character
    1..6-gram clipped overlap, per-order integer F2 in trunc-ppm,
    effective-order mean. The doubling makes char-gram clipping
    load-bearing exactly as in rouge2_excerpt_eval; the twin
    replicates normalization, space-stripping, char-gram multisets
    per order, the (1+b)clip/(b*ref+cand) closed form and the
    effective-order mean in DuckDB."""
    from ..operators import dedup as dd
    from ..operators.texteval import chrf_scores

    words = F.split(dd.normalized_text(F.col("text")), " ")
    excerpt = F.concat_ws(" ", F.slice("words", 5, 16))
    prs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.col("text"), words.alias("words"))
        .filter((F.col("doc_id") % 5 == 0) & (F.size("words") >= 24))
        .select(
            "doc_id",
            F.concat_ws(" ", excerpt, excerpt).alias("cand_text"),
            F.col("text").alias("ref_text"),
        )
    )
    return chrf_scores(prs, id_cols=("doc_id",))


# =========================================================================
# Classification evaluation: grade the trigram language identifier
# against the corpus ground-truth lang labels
# =========================================================================

# the language_id_ngram prediction + confusion-table CTE chain, shared
# by the per-class and summary eval twins (same trigram scoring CTEs as
# the language_id_ngram twin above)
_LANGID_CONF_CTES = f"""
    t AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'),
                            ' +', ' ', 'g') AS s
      FROM documents),
    tri AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(s) - 2, 1) + 1),
                            i -> s[i:i+2]) AS tg
      FROM t),
    sc AS (
      SELECT doc_id,
             len(list_filter(tg, x -> x IN ({_TRI_EN})))
                 / greatest(len(tg), 1) AS raw_en,
             len(list_filter(tg, x -> x IN ({_TRI_FR})))
                 / greatest(len(tg), 1) AS raw_fr,
             len(list_filter(tg, x -> x IN ({_TRI_DE})))
                 / greatest(len(tg), 1) AS raw_de
      FROM tri),
    prd AS (
      SELECT doc_id,
             CASE WHEN greatest(raw_en, raw_fr, raw_de) < 0.05 THEN 'unknown'
                  WHEN raw_en = greatest(raw_en, raw_fr, raw_de) THEN 'en'
                  WHEN raw_fr = greatest(raw_en, raw_fr, raw_de) THEN 'fr'
                  ELSE 'de' END AS pred
      FROM sc),
    conf AS (
      SELECT d.lang AS label, p.pred, count(*)::BIGINT AS n
      FROM prd p JOIN documents d USING (doc_id)
      GROUP BY 1, 2),
    ts AS (
      SELECT label AS cls, sum(n)::BIGINT AS n_true,
             coalesce(sum(CASE WHEN label = pred THEN n END), 0)::BIGINT
               AS tp
      FROM conf GROUP BY 1),
    ps AS (SELECT pred AS cls, sum(n)::BIGINT AS n_pred FROM conf GROUP BY 1),
    pc AS (
      SELECT coalesce(ts.cls, ps.cls) AS class,
             coalesce(n_true, 0) AS n_true,
             coalesce(n_pred, 0) AS n_pred,
             coalesce(tp, 0) AS tp,
             CASE WHEN coalesce(n_pred, 0) > 0
                  THEN (coalesce(tp, 0) * 1000000) // n_pred
             END AS precision_ppm,
             CASE WHEN coalesce(n_true, 0) > 0
                  THEN (coalesce(tp, 0) * 1000000) // n_true
             END AS recall_ppm,
             CASE WHEN coalesce(n_true, 0) + coalesce(n_pred, 0) > 0
                  THEN (2 * coalesce(tp, 0) * 1000000)
                       // (coalesce(n_true, 0) + coalesce(n_pred, 0))
             END AS f1_ppm
      FROM ts FULL JOIN ps ON ts.cls = ps.cls)
"""


def _langid_scored(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    preds = textmetrics.language_id_ngram(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", F.col("lang").alias("label"))
        .join(preds, on="doc_id", how="inner")
        .select("label", F.col("lang_pred").alias("pred"))
    )


@xq(
    "langid_class_eval",
    f"""
    WITH {_LANGID_CONF_CTES}
    SELECT class,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(tp AS BIGINT) AS tp,
           CAST(precision_ppm AS BIGINT) AS precision_ppm,
           CAST(recall_ppm AS BIGINT) AS recall_ppm,
           CAST(f1_ppm AS BIGINT) AS f1_ppm
    FROM pc
    """,
)
def langid_class_eval_q(spark, sf_dir):
    """Per-class P/R/F1 of the engine's own trigram language
    identifier (language_id_ngram) against the corpus ground-truth
    ``lang`` labels — a REAL multiclass confusion: the predictor only
    knows en/fr/de/unknown while the truth carries es and zh too, so
    truth-only classes (NULL precision), pred-only classes (NULL
    recall) and honest-zero rows are all live in the gated result.
    Twin stacks the full battery (confusion, marginal re-aggs, the
    full-outer class join, one trunc-ppm division per metric) on the
    language_id_ngram CTE chain, so the hash gates the composition."""
    from ..operators import clfeval

    return clfeval.classification_metrics(_langid_scored(spark, sf_dir))


@xq(
    "langid_eval_summary",
    f"""
    WITH {_LANGID_CONF_CTES}
    SELECT CAST(sum(n_true) AS BIGINT) AS n_examples,
           CAST(count(*) AS INT) AS n_classes,
           CASE WHEN sum(n_true) > 0
                THEN CAST((sum(tp) * 1000000) // sum(n_true) AS BIGINT)
           END AS accuracy_ppm,
           CASE WHEN count(*) > 0
                THEN CAST(sum(coalesce(precision_ppm, 0)) // count(*)
                          AS BIGINT)
           END AS macro_precision_ppm,
           CASE WHEN count(*) > 0
                THEN CAST(sum(coalesce(recall_ppm, 0)) // count(*)
                          AS BIGINT)
           END AS macro_recall_ppm,
           CASE WHEN count(*) > 0
                THEN CAST(sum(coalesce(f1_ppm, 0)) // count(*) AS BIGINT)
           END AS macro_f1_ppm,
           CASE WHEN CAST(sum(n_true) AS HUGEINT) * sum(n_true)
                     <> sum(CAST(n_true AS HUGEINT) * n_pred)
                THEN CAST(((CAST(sum(n_true) AS HUGEINT) * sum(tp)
                            - sum(CAST(n_true AS HUGEINT) * n_pred))
                           * 1000000)
                          // (CAST(sum(n_true) AS HUGEINT) * sum(n_true)
                              - sum(CAST(n_true AS HUGEINT) * n_pred))
                          AS BIGINT)
           END AS kappa_ppm
    FROM pc
    """,
)
def langid_eval_summary_q(spark, sf_dir):
    """Corpus roll-up of langid_class_eval: accuracy, zero-filled
    macro averages and SIGNED Cohen's kappa (the chance-corrected
    agreement between the trigram identifier and the ground truth;
    HUGEINT/decimal(38,0) trunc division, the assortativity idiom).
    The hash pins the macro zero-fill convention and the kappa
    marginal arithmetic across engines."""
    from ..operators import clfeval

    return clfeval.classification_summary(
        clfeval.classification_metrics(_langid_scored(spark, sf_dir))
    )


@xq(
    "ql_dirichlet_topk",
    r"""
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(lower(trim(text)), '\s+') AS words
               FROM documents WHERE text IS NOT NULL),
    st AS (SELECT sum(len(words))::BIGINT AS total_cf FROM w),
    tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, unnest(words) AS term,
                         len(words)::BIGINT AS dl FROM w)
            GROUP BY doc_id, term),
    cfc AS (SELECT term, sum(tf)::BIGINT AS cf FROM tfc GROUP BY term),
    qt AS (SELECT query_id, term, count(*)::BIGINT AS qtf FROM (
             SELECT doc_id AS query_id, unnest(words[1:10]) AS term
             FROM w WHERE doc_id IN (0, 7, 42))
           GROUP BY 1, 2),
    nq AS (SELECT query_id, sum(qtf)::BIGINT AS n_q FROM qt GROUP BY 1),
    con AS (SELECT qt.query_id, tfc.doc_id, tfc.dl,
                   CAST(round(qt.qtf
                        * ln(1.0 + (tfc.tf * st.total_cf)
                                   / (2000.0 * cfc.cf))
                        * 1000000.0) AS BIGINT) AS c
            FROM qt JOIN tfc USING (term) JOIN cfc USING (term)
            CROSS JOIN st),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS m,
                  any_value(dl) AS dl
           FROM con GROUP BY 1, 2),
    fin AS (SELECT sc.query_id, sc.doc_id,
                   (sc.m + CAST(round(nq.n_q
                                * ln(2000.0 / (sc.dl + 2000.0))
                                * 1000000.0) AS BIGINT))::BIGINT
                     AS score_micro
            FROM sc JOIN nq USING (query_id))
    SELECT query_id, doc_id, rank, score_micro FROM (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id)::INT
               AS rank,
             score_micro
      FROM fin) WHERE rank <= 20
    """,
)
def ql_dirichlet_topk_q(spark, sf_dir):
    """Dirichlet query-likelihood top-20 per query (Zhai & Lafferty,
    SIGIR 2001; mu = 2000) — the language-modeling lexical leg beside
    bm25_topk, over the same 10-token doc-0/7/42 exemplar queries so
    the two runs are directly fusable/gradable. Query term
    MULTIPLICITY is live (qtf, unlike BM25's distinct terms) and so is
    the negative per-doc smoothing normalizer. Twin replicates the
    single-scan tf/cf stats, both micro-nat roundings and the
    deterministic top-k window."""
    docs = load(spark, sf_dir, "documents")
    qs = bm25.sample_doc_queries(docs, [0, 7, 42], n_words=10)
    return bm25.ql_topk(docs, qs, k=20)


# =========================================================================
# GraphRAG community reports + global search (Edge et al. 2024) over the
# real extraction pipeline's KG — LPA communities composed with the U4
# fake-LLM summarize slot
# =========================================================================

@q(
    "kg_community_reports",
    f"""
    SELECT community, n_members, n_listed, summary
    FROM read_parquet('{_pq("kg_community_reports")}')
    """,
)
def kg_community_reports_q(spark, sf_dir):
    """GraphRAG community reports over the constructed KG: distinct
    triples -> entity co-assertion graph (>= 10 distinct assertions
    per edge) -> deterministic LPA -> one fake-LLM report per
    community, member listing clamped at 12 (the sf0.01 corpus yields
    a 22-member cluster that CLAMPS and an 8-member one that does
    not, so both listing paths are in the hash). Twin = precomputed
    pure-Python replication of the full compose
    (oracle/precompute.community_reports_table)."""
    from ..operators import communities

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    triples = res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    nodes, edges = communities.entity_graph(triples, min_count=10)
    return communities.community_reports(nodes, edges, max_members=12)


@xq(
    "kg_community_search",
    f"""
    WITH scored AS (
      SELECT community,
             CAST(
               CASE WHEN position('alice' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END
             + CASE WHEN position('berlin' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END
             + CASE WHEN position('johnson' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END AS INTEGER) AS score,
             summary
      FROM read_parquet('{_pq("kg_community_reports")}')
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, community)
                AS INTEGER) AS rank,
           community, score, summary
    FROM scored WHERE score > 0
    ORDER BY rank
    LIMIT 5
    """,
)
def kg_community_search_q(spark, sf_dir):
    """GraphRAG global search skeleton: score each community report by
    distinct-query-term containment, rank, keep top-5 as the
    map-reduce context. The live Spark leg recomputes the reports from
    the pipeline and searches them; the twin searches the precomputed
    report snapshot with the same term arithmetic — the hash gates
    BOTH the report compose and the scoring/rank contract (the two
    sf0.01 reports score 2 and 1 under this query, so ordering is
    live)."""
    from ..operators import communities

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    triples = res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    nodes, edges = communities.entity_graph(triples, min_count=10)
    reports = communities.community_reports(nodes, edges, max_members=12)
    return communities.community_global_search(
        reports, "Alice Johnson Berlin", k=5
    )


@xq(
    "kg_community_hierarchy",
    f"""
    SELECT node_id, community, parent
    FROM read_parquet('{_pq("kg_community_hierarchy")}')
    """,
)
def kg_community_hierarchy_q(spark, sf_dir):
    """GraphRAG hierarchical community levels: LPA level-0 communities
    over the >= 35-gated supplier co-occurrence graph (the kg_graph_lpa
    surface — 26 communities / 63 nodes), then LPA over the community
    QUOTIENT graph assigns each community a level-1 parent (18 parents:
    a 6-way and a 4-way merge plus singleton islands that are their own
    parent, so both the merge and the isolated-coalesce paths are in
    the hash). Twin = precomputed pure-Python replication of both
    sweeps + quotient construction."""
    from ..operators import communities

    li = load(spark, sf_dir, "lineitem")
    x, y = li.alias("x"), li.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .groupBy(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .agg(F.countDistinct("x.l_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 35)
        .select("src", "dst")
    )
    return communities.community_hierarchy(pairs).select(
        F.col("node_id").cast("long").alias("node_id"),
        F.col("community").cast("long").alias("community"),
        F.col("parent").cast("long").alias("parent"),
    )


@xq(
    "kg_community_local_search",
    f"""
    WITH keyed AS (
      SELECT subj_name || '::' || coalesce(subj_type, 'Entity') AS sk,
             subj_name AS sn, coalesce(subj_type, 'Entity') AS st,
             obj_name || '::' || coalesce(obj_type, 'Entity') AS ok,
             obj_name AS onm, coalesce(obj_type, 'Entity') AS ot
      FROM read_parquet('{_pq("kg_triples")}')
      WHERE subj_name IS NOT NULL AND obj_name IS NOT NULL
    ),
    nbr AS (
      SELECT CASE WHEN sk = 'Alice Johnson::Person' THEN ok ELSE sk END
               AS ref,
             CASE WHEN sk = 'Alice Johnson::Person' THEN onm ELSE sn END
               AS nm,
             CASE WHEN sk = 'Alice Johnson::Person' THEN ot ELSE st END
               AS ty,
             count(*) AS weight
      FROM keyed
      WHERE (sk = 'Alice Johnson::Person' OR ok = 'Alice Johnson::Person')
        AND sk <> ok
      GROUP BY 1, 2, 3
    ),
    nrows AS (
      SELECT 'neighbor' AS section,
             CAST(row_number() OVER (ORDER BY weight DESC, ref)
                  AS INTEGER) AS rank,
             ref, nm || ' (' || ty || ')' AS text, weight
      FROM nbr
    )
    SELECT 'report' AS section, CAST(1 AS INTEGER) AS rank,
           r.community AS ref, r.summary AS text, r.n_members AS weight
    FROM read_parquet('{_pq("kg_community_members")}') m
    JOIN read_parquet('{_pq("kg_community_reports")}') r
      ON r.community = m.community
    WHERE m.node_id = 'Alice Johnson::Person'
    UNION ALL
    SELECT section, rank, ref, text, weight FROM nrows WHERE rank <= 10
    """,
)
def kg_community_local_search_q(spark, sf_dir):
    """GraphRAG local search for one entity: its community's report
    (via live LPA membership) + its top-10 graph neighbors ranked by
    distinct-assertion count. The Spark leg recomputes everything from
    the pipeline (triples -> entity graph -> LPA -> reports -> context
    package); the twin is PURE SQL over the kg_triples /
    kg_community_members / kg_community_reports snapshots — the hash
    gates the membership lookup, the report join, the neighbor
    extraction's CASE symmetry and the (weight DESC, ref) rank
    contract together."""
    from ..operators import communities
    from ..operators.graph import label_propagation

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    triples = res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    nodes, edges = communities.entity_graph(triples, min_count=10)
    labels = label_propagation(edges).select("node_id", "label")
    reports = communities.community_reports(nodes, edges, max_members=12)
    return communities.community_local_search(
        labels, reports, triples, "Alice Johnson::Person", k=10
    )


@xq(
    "kg_community_global_qa",
    f"""
    WITH scored AS (
      SELECT community,
             CAST(
               CASE WHEN position('alice' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END
             + CASE WHEN position('berlin' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END
             + CASE WHEN position('johnson' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END AS INTEGER) AS score,
             summary
      FROM read_parquet('{_pq("kg_community_reports")}')
    ),
    sel AS (
      SELECT * FROM (
        SELECT CAST(row_number() OVER (ORDER BY score DESC, community)
                    AS INTEGER) AS rank, summary
        FROM scored WHERE score > 0
      ) WHERE rank <= 5
    ),
    mapped AS (
      SELECT rank,
             array_to_string(
               list_filter(
                 string_split(substring(summary, 7), '; '),
                 s -> position('alice' IN lower(s)) > 0
                   OR position('berlin' IN lower(s)) > 0
                   OR position('johnson' IN lower(s)) > 0),
               '; ') AS frag
      FROM sel
    )
    SELECT count(*) AS n_maps,
           CASE WHEN count(*) > 0 THEN
             substring('[SUM] ' || string_agg(
               CAST(rank AS VARCHAR) || ') ' || frag, ' | '
               ORDER BY rank), 1, 406)
           END AS answer
    FROM mapped WHERE frag <> ''
    """,
)
def kg_community_global_qa_q(spark, sf_dir):
    """GraphRAG global QA map-reduce: top-5 relevant community reports
    -> per-report extractive answer fragment (member clauses containing
    a query term) -> rank-ordered reduce through the U4 fake-LLM cycle.
    Twin = the identical select/map/reduce arithmetic in DuckDB over
    the report snapshot (clause split, per-clause containment, ordered
    string_agg, cap) — one hash pins the whole composed loop."""
    from ..operators import communities

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    triples = res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    nodes, edges = communities.entity_graph(triples, min_count=10)
    reports = communities.community_reports(nodes, edges, max_members=12)
    return communities.community_global_qa(
        reports, "Alice Johnson Berlin", k=5
    )


@xq(
    "kg_entity_reports",
    f"""
    WITH named AS (
      SELECT subj_name AS sn, coalesce(subj_type, 'Entity') AS st,
             pred AS p,
             obj_name AS onm, coalesce(obj_type, 'Entity') AS ot
      FROM read_parquet('{_pq("kg_triples")}')
      WHERE subj_name IS NOT NULL AND obj_name IS NOT NULL
    ),
    facts AS (
      SELECT sn || '::' || st AS entity, sn AS name, st AS type,
             p || ' ' || onm || ' (' || ot || ')' AS clause
      FROM named
      UNION ALL
      SELECT onm || '::' || ot AS entity, onm AS name, ot AS type,
             sn || ' (' || st || ') ' || p AS clause
      FROM named
    ),
    counted AS (
      SELECT entity, name, type, clause, count(*) AS w
      FROM facts GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT entity, name, type, clause,
             row_number() OVER (PARTITION BY entity
                                ORDER BY w DESC, clause) AS rk,
             count(*) OVER (PARTITION BY entity) AS total
      FROM counted
    )
    SELECT entity, min(name) AS name, min(type) AS type,
           max(total) AS n_facts, count(*) AS n_listed,
           substring('[SUM] ' || string_agg(clause, '; ' ORDER BY rk),
                     1, 406) AS description
    FROM ranked WHERE rk <= 200
    GROUP BY entity
    HAVING max(total) >= 130
    """,
)
def kg_entity_reports_q(spark, sf_dir):
    """GraphRAG element summarization: one merged description per
    entity from every assertion mentioning it (direction-rendered
    clauses at conv-distinct grain, weight = conversations asserting
    the fact), facts ranked (weight DESC, clause ASC), first 8 listed,
    entities with < 3 facts gated out — both the hub clamp and the
    singleton gate are live at sf0.01. Twin = the identical
    construction in pure SQL over the kg_triples snapshot with the
    U4 lossless-mode cap pin (substring 406)."""
    from ..operators import communities

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    triples = res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    return communities.entity_reports(triples, max_facts=200, min_facts=130)


@q(
    "kg_community_drift_search",
    f"""
    WITH scored AS (
      SELECT community,
             CAST(
               CASE WHEN position('alice' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END
             + CASE WHEN position('berlin' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END
             + CASE WHEN position('johnson' IN lower(summary)) > 0
                    THEN 1 ELSE 0 END AS INTEGER) AS score,
             summary
      FROM read_parquet('{_pq("kg_community_reports")}')
    ),
    sel AS (
      SELECT * FROM (
        SELECT CAST(row_number() OVER (ORDER BY score DESC, community)
                    AS INTEGER) AS rank, community, score, summary
        FROM scored WHERE score > 0
      ) WHERE rank <= 5
    ),
    fl AS (
      SELECT rank, community,
             list_filter(
               string_split(substring(summary, 7), '; '),
               s -> position('alice' IN lower(s)) > 0
                 OR position('berlin' IN lower(s)) > 0
                 OR position('johnson' IN lower(s)) > 0) AS fl
      FROM sel
    ),
    cl AS (
      SELECT rank, community,
             unnest(fl) AS clause,
             unnest(range(1, len(fl) + 1)) AS ord
      FROM fl
    ),
    fu AS (
      SELECT rank, community, clause, CAST(ord AS INTEGER) AS ord,
             regexp_extract(clause, '^(.*) \\(([^()]*)\\)$', 1) AS nm,
             regexp_extract(clause, '^(.*) \\(([^()]*)\\)$', 2) AS ty
      FROM cl
      WHERE ord <= 3
        AND regexp_extract(clause, '^(.*) \\(([^()]*)\\)$', 1) <> ''
    ),
    keyed AS (
      SELECT subj_name || '::' || coalesce(subj_type, 'Entity') AS sk,
             subj_name AS sn, coalesce(subj_type, 'Entity') AS st,
             obj_name || '::' || coalesce(obj_type, 'Entity') AS ok,
             obj_name AS onm, coalesce(obj_type, 'Entity') AS ot
      FROM read_parquet('{_pq("kg_triples")}')
      WHERE subj_name IS NOT NULL AND obj_name IS NOT NULL
    ),
    both_dir AS (
      SELECT sk AS entity, ok AS ref, onm AS nm, ot AS ty
      FROM keyed WHERE sk <> ok
      UNION ALL
      SELECT ok AS entity, sk AS ref, sn AS nm, st AS ty
      FROM keyed WHERE sk <> ok
    ),
    ents AS (SELECT DISTINCT nm || '::' || ty AS entity FROM fu),
    nbr AS (
      SELECT b.entity, b.ref, b.nm, b.ty, count(*) AS weight
      FROM both_dir b JOIN ents e ON b.entity = e.entity
      GROUP BY 1, 2, 3, 4
    ),
    frows AS (
      SELECT 'followup' AS section, entity,
             CAST(row_number() OVER (PARTITION BY entity
                                     ORDER BY weight DESC, ref)
                  AS INTEGER) AS rank,
             ref, nm || ' (' || ty || ')' AS text,
             CAST(weight AS BIGINT) AS weight
      FROM nbr
    )
    SELECT 'primer' AS section, CAST(NULL AS VARCHAR) AS entity, rank,
           community AS ref, summary AS text, CAST(score AS BIGINT) AS weight
    FROM sel
    UNION ALL
    SELECT 'selected' AS section, nm || '::' || ty AS entity, ord AS rank,
           community AS ref, clause AS text, CAST(rank AS BIGINT) AS weight
    FROM fu
    UNION ALL
    SELECT section, entity, rank, ref, text, weight
    FROM frows WHERE rank <= 5
    """,
)
def kg_community_drift_search_q(spark, sf_dir):
    """GraphRAG DRIFT search: primer over the community reports (term
    containment, top-5), follow-up entity selection from each primer
    report's first 3 term-matching member clauses, then ONE batched
    local search (broadcast entity set against the direction-unioned
    triple scan) ranking each follow-up entity's neighbors. The live
    leg recomputes everything from the pipeline; the twin is PURE SQL
    over the kg_triples / kg_community_reports snapshots — the hash
    gates primer scoring, clause selection order, the name::type key
    parse, the per-entity neighbor rank, and the three-section package
    shape together."""
    from ..operators import communities

    res = run_pipeline(spark, transcripts_for(spark, sf_dir), PipelineConfig())
    triples = res.triples.select(
        "conv_id", "subj_name", "subj_type", "pred", "obj_name", "obj_type"
    ).distinct()
    nodes, edges = communities.entity_graph(triples, min_count=10)
    reports = communities.community_reports(nodes, edges, max_members=12)
    return communities.community_drift_search(
        reports, triples, "Alice Johnson Berlin",
        k_reports=5, k_follow=3, k_neighbors=5,
    )


# =========================================================================
# Corpus-drift monitoring: Population Stability Index between snapshots
# =========================================================================

@xq(
    "event_value_drift",
    """
    WITH stats AS (
      SELECT min(value) AS mn, max(value) AS mx
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT least(9, greatest(0,
               CAST(floor((value - mn) / ((mx - mn) / 10)) AS INTEGER)))
               AS bucket, count(*) AS ref_count
      FROM events, stats WHERE value IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT least(9, greatest(0,
               CAST(floor((value + 50 - mn) / ((mx - mn) / 10)) AS INTEGER)))
               AS bucket, count(*) AS cur_count
      FROM events, stats
      WHERE value IS NOT NULL GROUP BY 1
    ),
    j AS (
      SELECT coalesce(r.bucket, c.bucket) AS bucket,
             coalesce(ref_count, 0) AS ref_count,
             coalesce(cur_count, 0) AS cur_count
      FROM r FULL JOIN c ON r.bucket = c.bucket
    ),
    tot AS (SELECT sum(ref_count) AS tr, sum(cur_count) AS tc FROM j)
    SELECT bucket, ref_count, cur_count,
           CAST(round(((ref_count + 1.0) / (tr + 10)
                       - (cur_count + 1.0) / (tc + 10))
                      * ln(((ref_count + 1.0) / (tr + 10))
                           / ((cur_count + 1.0) / (tc + 10)))
                      * 1000000) AS BIGINT) AS psi_micro
    FROM j, tot
    """,
)
def event_value_drift_q(spark, sf_dir):
    """PSI drift between the event-value distribution and a +50-shifted
    current snapshot (an upstream recalibration / unit change — the
    classic silent pipeline regime break). Equi-width buckets over the
    REFERENCE frame; the shift marches the exponential bulk across
    bucket boundaries (PSI ~ 6.09, deep in the population-shift band;
    a value-truncation at 250 reads only 0.013 on this corpus because
    the tail holds 67 of 10k rows — the monitor must catch the bulk
    moving, not just the range). Laplace-smoothed ratios, each
    bucket's micro contribution rounded from scalar counts; twin
    replicates bucket arithmetic, smoothing, ln and rounding in SQL."""
    from ..operators import diff as diff_ops

    ev = load(spark, sf_dir, "events")
    return diff_ops.psi_numeric(
        ev, ev.withColumn("value", F.col("value") + 50), "value"
    )


@xq(
    "event_type_drift",
    """
    WITH r AS (
      SELECT substring(md5(event_type), 1, 1) AS bucket,
             count(*) AS ref_count
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT substring(md5(event_type), 1, 1) AS bucket,
             count(*) AS cur_count
      FROM events
      WHERE event_type IS NOT NULL AND event_type <> 'click' GROUP BY 1
    ),
    j AS (
      SELECT coalesce(r.bucket, c.bucket) AS bucket,
             coalesce(ref_count, 0) AS ref_count,
             coalesce(cur_count, 0) AS cur_count
      FROM r FULL JOIN c ON r.bucket = c.bucket
    ),
    tot AS (SELECT sum(ref_count) AS tr, sum(cur_count) AS tc FROM j)
    SELECT bucket, ref_count, cur_count,
           CAST(round(((ref_count + 1.0) / (tr + 16)
                       - (cur_count + 1.0) / (tc + 16))
                      * ln(((ref_count + 1.0) / (tr + 16))
                           / ((cur_count + 1.0) / (tc + 16)))
                      * 1000000) AS BIGINT) AS psi_micro
    FROM j, tot
    """,
)
def event_type_drift_q(spark, sf_dir):
    """Categorical PSI via md5 hash buckets (16, the unbounded-
    vocabulary variant): current snapshot drops the 'click' category
    entirely — its hash bucket's mass collapses and the drift
    concentrates there, while same-bucket survivors dilute it (the
    documented hash-bucket sensitivity trade). Twin replicates the
    md5 bucketing + smoothing + micro rounding."""
    from ..operators import diff as diff_ops

    ev = load(spark, sf_dir, "events")
    return diff_ops.psi_categorical(
        ev, ev.filter(F.col("event_type") != "click"), "event_type"
    )
