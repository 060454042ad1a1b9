"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k: broadcast the (small)
  query side against the corpus, dot product JVM-side, rank with a
  per-query window. Baseline and verification path.
- :func:`cosine_topk_ivf` — IVF-style scale path: assign every vector
  to its nearest of C centroids (computed from a deterministic sample),
  search only ``nprobe`` closest centroids per query — the shuffle is
  an equi-join on centroid id, so cost is corpus/C × nprobe per query
  instead of the full corpus.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    # the interpreted JVM fold is kept DELIBERATELY on the scoring path:
    # it sums left-to-right exactly like DuckDB's list_inner_product, so
    # round(cosine, 6) is bit-identical to the SQL oracle (an Arrow
    # einsum — similarity._pair_dot — is ~10x faster per row but uses
    # pairwise summation, which can flip the 6th decimal on boundary
    # values and break the hash gate); swap in _pair_dot for production
    # corpora where oracle bit-parity is not required
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda p, q: p + q)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    Query side is broadcast (queries are the small side by construction);
    the corpus is scanned once — no corpus shuffle at all.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_qnorm"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_cnorm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        (
            _dot(F.col("_cvec").cast("array<double>"), F.col("_qvec").cast("array<double>"))
            / (F.col("_cnorm") * F.col("_qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _kmeans_centroids(sample: np.ndarray, n_clusters: int, iters: int = 8) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample (the
    sample is bounded; the heavy assignment step below is distributed)."""
    rng = np.random.default_rng(42)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[idx].astype(np.float64)
    for _ in range(iters):
        d = sample @ cents.T
        assign = np.argmax(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents.astype(np.float32)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 64,
    nprobe: int = 8,
    sample_size: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: centroid assignment via pandas UDF (one
    matmul per Arrow batch), candidate restriction to the query's
    ``nprobe`` nearest centroids, then exact scoring + window rank."""
    # hash-ordered sample: deterministic across partition layouts AND
    # unbiased — an id-prefix sample (orderBy(id).limit) would train
    # centroids only on the earliest-ingested region of the corpus when
    # id order correlates with content, collapsing recall elsewhere
    sample = np.array(
        [
            r[0]
            for r in corpus.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ],
        dtype=np.float32,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1
    cents = _kmeans_centroids(sample / norms, n_clusters)

    @F.pandas_udf(T.IntegerType())
    def nearest_centroid(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack(s.to_numpy()).astype(np.float32)
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1
            yield pd.Series(np.argmax((mat / n) @ cents.T, axis=1).astype("int32"))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_centroids(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack(s.to_numpy()).astype(np.float32)
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1
            sims = (mat / n) @ cents.T
            top = np.argsort(-sims, axis=1)[:, :nprobe].astype("int32")
            yield pd.Series(list(top))

    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        nearest_centroid(F.col(vec_col)).alias("_cell"),
        _norm(F.col(vec_col).cast("array<double>")).alias("_cnorm"),
    )
    q = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            probe_centroids(F.col(vec_col)).alias("_cells"),
            _norm(F.col(vec_col).cast("array<double>")).alias("_qnorm"),
        )
        .select(
            query_id_col, "_qvec", "_qnorm", F.explode("_cells").alias("_cell")
        )
    )
    scored = c.join(F.broadcast(q), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        (
            _dot(F.col("_cvec").cast("array<double>"), F.col("_qvec").cast("array<double>"))
            / (F.col("_cnorm") * F.col("_qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized approximate search (memory-bounded scale path)
# ---------------------------------------------------------------------------

def _lloyd_l2(sample: np.ndarray, n_codes: int, iters: int = 8) -> np.ndarray:
    """Deterministic Euclidean Lloyd's for PQ codebooks (the spherical
    variant above assumes unit vectors; subvectors are not unit)."""
    rng = np.random.default_rng(42)
    idx = rng.choice(len(sample), size=min(n_codes, len(sample)), replace=False)
    cents = sample[idx].astype(np.float32)
    for _ in range(iters):
        d = (
            np.sum(sample**2, axis=1, keepdims=True)
            - 2.0 * (sample @ cents.T)
            + np.sum(cents**2, axis=1)
        )
        assign = np.argmin(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.astype(np.float32)


def _pq_train(sample: np.ndarray, m_sub: int, n_codes: int):
    """Per-subvector codebooks: list of (n_codes, dim/m_sub) float32."""
    dim = sample.shape[1]
    if dim % m_sub:
        raise ValueError(f"m_sub={m_sub} must divide dim={dim}")
    w = dim // m_sub
    return [
        _lloyd_l2(np.ascontiguousarray(sample[:, j * w : (j + 1) * w]), n_codes)
        for j in range(m_sub)
    ]


def _pq_encode(mat: np.ndarray, books) -> np.ndarray:
    """(n, m_sub) int32 code matrix: per subvector, nearest codeword."""
    m_sub = len(books)
    w = mat.shape[1] // m_sub
    cols = []
    for j, book in enumerate(books):
        sub = mat[:, j * w : (j + 1) * w]
        d = (
            np.sum(sub**2, axis=1, keepdims=True)
            - 2.0 * (sub @ book.T)
            + np.sum(book**2, axis=1)
        )
        cols.append(np.argmin(d, axis=1).astype("int32"))
    return np.stack(cols, axis=1)


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    n_codes: int = 256,
    sample_size: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. 2011): coarse IVF cells
    bound WHICH vectors are scored (corpus/n_clusters × nprobe per
    query, same as :func:`cosine_topk_ivf`), and product quantization
    bounds WHAT is scored — each corpus vector is stored as ``m_sub``
    small codes, and scoring is an ADC table lookup instead of a
    d-dimensional dot product.

    Why this is the 100 TB path: after encoding, the search never
    touches the raw vectors again — a 3 KB float768 embedding becomes
    ``m_sub`` bytes of codes riding the (id, cell, codes) table, so the
    scored working set shrinks by ~d·4/m_sub× and the probe join
    shuffles codes, not vectors. Recall is the PQ trade-off: scores are
    approximate (asymmetric distance), verified in tests by recall
    against brute force, and bit-exactly against the pure-Python
    replication (oracle/precompute.py:ivfpq_topk_py).

    Everything is deterministic: hash-ordered sample, fixed-seed
    Lloyd's for the coarse spherical centroids AND the per-subvector
    Euclidean codebooks, float32 ADC sums in fixed subvector order.
    """
    sample = np.array(
        [
            r[0]
            for r in corpus.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_size)
            .select(vec_col)
            .collect()
        ],
        dtype=np.float32,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1
    unit_sample = sample / norms
    cents = _kmeans_centroids(unit_sample, n_clusters)
    books = _pq_train(unit_sample, m_sub, n_codes)

    @F.pandas_udf(T.StructType([
        T.StructField("cell", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ]))
    def encode(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            mat = np.stack(s.to_numpy()).astype(np.float32)
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1
            mat = mat / n
            cells = np.argmax(mat @ cents.T, axis=1).astype("int32")
            codes = _pq_encode(mat, books)
            yield pd.DataFrame({"cell": cells, "codes": list(codes)})

    # the encoded corpus: the raw vector column is DROPPED here — at
    # scale this is the persisted index table (m_sub ints per vector)
    encoded = corpus.select(
        F.col(id_col), encode(F.col(vec_col)).alias("_e")
    ).select(id_col, F.col("_e.cell").alias("_cell"), F.col("_e.codes").alias("_codes"))

    # per-query ADC lookup tables, built driver-side (queries are the
    # small side by construction) and shipped in the scoring UDF closure
    q_rows = queries.select(query_id_col, vec_col).collect()
    luts, probes = {}, []
    for r in q_rows:
        qv = np.asarray(r[1], dtype=np.float32)
        n = np.linalg.norm(qv)
        qv = qv / n if n else qv
        w = qv.shape[0] // m_sub
        luts[r[0]] = np.stack(
            [books[j] @ qv[j * w : (j + 1) * w] for j in range(m_sub)]
        ).astype(np.float32)  # (m_sub, n_codes)
        order = np.argsort(-(qv @ cents.T))[:nprobe]
        for cell in order.tolist():
            probes.append((r[0], int(cell)))
    # probe schema inherits the caller's query-id TYPE (string/int/...),
    # not a hardcoded long — the generic id contract the sibling
    # brute-force/IVF operators already honor
    probe_df = corpus.sparkSession.createDataFrame(
        probes,
        T.StructType(
            [
                queries.schema[query_id_col],
                T.StructField("_cell", T.IntegerType()),
            ]
        ),
    )

    @F.pandas_udf(T.FloatType())
    def adc_score(qids: pd.Series, codes: pd.Series) -> pd.Series:
        code_mat = np.stack(codes.to_numpy()).astype("int64")  # (n, m_sub)
        out = np.zeros(len(code_mat), dtype=np.float32)
        for qid in qids.unique():
            mask = (qids == qid).to_numpy()
            lut = luts[qid]  # (m_sub, n_codes)
            sub = code_mat[mask]
            acc = np.zeros(mask.sum(), dtype=np.float32)
            for j in range(sub.shape[1]):  # fixed order: deterministic
                acc += lut[j][sub[:, j]]
            out[mask] = acc
        return pd.Series(out)

    scored = encoded.join(F.broadcast(probe_df), "_cell").select(
        F.col(query_id_col),
        F.col(id_col),
        adc_score(F.col(query_id_col), F.col("_codes")).alias("approx_score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("approx_score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round(F.col("approx_score").cast("double"), 6).alias("approx_score"),
            "rank",
        )
    )


MMR_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("rel", T.DoubleType()),
        T.StructField("mmr_micro", T.LongType()),
        T.StructField("sel_rank", T.IntegerType()),
    ]
)


def _seq_cosine(a, b) -> float:
    """Left-to-right sequential-fold cosine in pure Python floats —
    BLAS-independent, so the pure-Python oracle reproduces it bit-for-
    bit on any build (same discipline as the IVF scoring fold)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        x = float(x)
        y = float(y)
        dot += x * y
        na += x * x
        nb += y * y
    denom = (na ** 0.5) * (nb ** 0.5)
    return round(dot / denom, 6) if denom > 0 else 0.0


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_pct: int = 70,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998) of a per-query candidate set: greedily select ``k``
    results maximizing ``lam * rel(d) - (1 - lam) * max_{s in S}
    cos(d, s)`` — the standard rerank between retrieval and context
    assembly (the reference returns raw similarity top-k from its
    vector DB; near-duplicate chunks then waste the context window EP3
    assembles).

    Selection compares ``mmr_micro = round(1e6 * mmr)`` integers with
    ``vec_id`` ASC tie-break — a total order, so the greedy sweep is
    deterministic; candidate-candidate cosines use a sequential
    pure-float fold rounded to 6 decimals (BLAS-independent, oracle-
    replicable). The first pick has no diversity term (empty S —
    ``mmr = lam * rel``).

    ``candidates`` carries (query_id, vec_id, rel, embedding) — the
    output of any cosine_topk_* variant joined back to its vectors.

    100 TB shape: MMR is inherently sequential per query, so it runs
    AFTER candidate generation on the bounded candidate set only —
    cost is queries x k x |candidates| pair folds inside one
    applyInPandas over query_id (each group is k'-bounded by the
    upstream top-k'; the corpus is never touched). The greedy loop is
    the textbook non-SQL operator: grouped-map Pandas UDF, never a
    driver collect.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if not (0 <= lambda_pct <= 100):
        raise ValueError(f"need 0 <= lambda_pct <= 100, got {lambda_pct}")
    lam = lambda_pct / 100.0
    kk = k

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic intake order (selection order is score-driven,
        # but stable intake makes debugging reproducible)
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        ids = pdf[id_col].tolist()
        rels = [float(r) for r in pdf[rel_col]]
        vecs = [list(v) for v in pdf[vec_col]]
        qid = pdf[query_id_col].iloc[0]
        remaining = list(range(len(ids)))
        max_sim = [0.0] * len(ids)  # max cosine vs selected set so far
        out = []
        for rank in range(1, min(kk, len(ids)) + 1):
            best = None
            best_key = None
            for i in remaining:
                mmr = lam * rels[i] - (1.0 - lam) * (
                    max_sim[i] if out else 0.0
                )
                key = (-round(mmr * 1_000_000), ids[i])
                if best_key is None or key < best_key:
                    best_key = key
                    best = i
            out.append((qid, ids[best], rels[best], -best_key[0], rank))
            remaining.remove(best)
            for i in remaining:
                s = _seq_cosine(vecs[i], vecs[best])
                if s > max_sim[i]:
                    max_sim[i] = s
        return pd.DataFrame(
            out, columns=["query_id", "vec_id", "rel", "mmr_micro", "sel_rank"]
        )

    return candidates.groupBy(query_id_col).applyInPandas(greedy, MMR_SCHEMA)
