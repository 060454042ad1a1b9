"""Distributed skip-gram-with-negative-sampling (word2vec/DeepWalk)
embedding training.

SGNS (Mikolov et al. 2013) over a walk corpus IS DeepWalk (Perozzi et
al. 2014): walks.random_walks / node2vec_walks generate the corpus,
walks.skipgram_pairs extracts (center, context) examples, and this
module trains the two-table embedding model on the cluster — the
third distributed trainer (clf_train.py: driver-vector logistic
regression; kge.py: distributed-state TransE), completing the
walk -> pairs -> embeddings -> link-prediction chain entirely inside
the engine.

Determinism discipline (the clf_train/kge hybrid): model state is
INTEGER micro-units in a distributed (kind, node_id, emb) table; the
ONLY floats are the per-term logistic scalar (dot/1e12 ->
1/(1+exp(-x)) -> g = sig - y), a fixed-operation-order per-row value,
and each per-dimension gradient term is floor()-truncated to integer
BEFORE the weighted int64 sum — so any partitioning and the
pure-Python oracle (oracle/precompute.sgns_py) reproduce training
bit-for-bit. Negatives are md5-derived corruptions of the context
(n_ctx-vocabulary draw keyed by (center, context, epoch, j)), the
word2vec UNFILTERED protocol except the degenerate draw (== the true
context), which is dropped not resampled.

100 TB shape: the pair corpus collapses ONCE to weighted distinct
(center, context, cnt) rows — multiplicity becomes an integer weight,
so epoch cost scales with DISTINCT pairs; per epoch two (kind, id)
equi-joins of the term frame against the embedding table (hot
nodes = the skew case, AQE skew-join), one model-sized
(kind, node, dim) gradient agg (map-side combined), one update join;
localCheckpoint per epoch. Driver traffic: one 2-long metric row per
epoch. int64 headroom: |floor(g * emb_d)| <= ~1e6 micro per term, so
gradient sums stay exact past 1e12 weighted terms per node per dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .negatives import SEP, _md5_u32
from .skew import global_index

MICRO = 1_000_000


def _init_emb(kind: str, dim: int, init: int):
    """md5-uniform init in [-init, +init] micro (the kge.py scheme,
    keyed by the SGNS table kinds 'in'/'out')."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            SEP, F.lit(kind), F.col("node_id"),
                            i.cast("string"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
            F.lit(2 * init + 1),
        )
        - F.lit(init),
    )


def train_sgns(
    pairs: DataFrame,
    dim: int = 8,
    epochs: int = 3,
    k_neg: int = 2,
    lr_ppm: int = 500_000,
    init: int = 100_000,
    center: str = "center",
    context: str = "context",
    stats: dict | None = None,
    epoch_offset: int = 0,
    init_state: DataFrame | None = None,
) -> DataFrame:
    """Full-batch SGNS over (center, context) examples (duplicates
    weight the gradient). Returns (kind, node_id, emb: array<long>)
    with kind 'in' (center vectors — THE node embeddings) and 'out'
    (context vectors).

    Exact per-epoch recurrence (identical on the pure-Python oracle):

        dot   = sum_d in_d * out_d                     [int64]
        g     = 1/(1 + exp(-dot/1e12)) - y             [float, fixed order]
        term_d = floor(g * other_d) * cnt              [int64]
        G     = sum over terms                         [int64]
        W    <- W - (G * lr_ppm) div (1e6 * n_terms)   [trunc div]

    where y = 1 for observed pairs, 0 for the md5-drawn context
    corruptions, and n_terms is the total WEIGHTED term count
    (positives + surviving negatives) — the batch-mean scaling.

    CHECKPOINT/RESUME (the north rule's resumability discipline
    applied to training): negatives are keyed by the ABSOLUTE epoch
    (md5(c, x, epoch_offset + e, j)), so
    ``train(epochs=a+b)`` == ``train(epochs=a)`` then
    ``train(epochs=b, epoch_offset=a, init_state=<saved table>)``
    bit-for-bit — persist the returned table between runs and warm-
    restart. Nodes absent from ``init_state`` (vocabulary growth)
    fall back to their md5 init.
    """
    if (dim < 1 or epochs < 1 or k_neg < 0 or lr_ppm <= 0 or init < 1
            or epoch_offset < 0):
        raise ValueError("bad hyperparameters")
    wpairs = (
        pairs.select(
            F.col(center).cast("string").alias("c"),
            F.col(context).cast("string").alias("x"),
        )
        .groupBy("c", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    ctx_vocab = global_index(
        wpairs.select(F.col("x").alias("v")).distinct(), ["v"],
        index_col="idx",
    ).localCheckpoint()
    n_ctx_row = ctx_vocab.agg(F.count(F.lit(1)).alias("n_ctx"))
    nodes = (
        wpairs.select(F.col("c").alias("node_id"))
        .unionAll(wpairs.select(F.col("x").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    state = nodes.select(F.lit("in").alias("kind"), "node_id").withColumn(
        "emb", _init_emb("in", dim, init)
    ).unionByName(
        nodes.select(F.lit("out").alias("kind"), "node_id")
        .withColumn("emb", _init_emb("out", dim, init))
    )
    if init_state is not None:
        saved = init_state.select(
            "kind", "node_id", F.col("emb").alias("_saved")
        )
        state = state.join(saved, ["kind", "node_id"], "left").select(
            "kind", "node_id",
            F.coalesce("_saved", F.col("emb")).alias("emb"),
        )
    state = state.localCheckpoint()
    # all epochs' negatives generated once (the kge negative_samples
    # slicing pattern): k_neg draws per (pair, epoch) over the context
    # vocabulary; degenerate draws (== the true context) dropped
    if k_neg > 0:
        negs = (
            wpairs.crossJoin(F.broadcast(n_ctx_row))
            .select(
                "*",
                F.explode(
                    F.sequence(F.lit(0), F.lit(epochs * k_neg - 1))
                ).alias("j"),
            )
            .withColumn(
                "neg_idx",
                # keyed by the ABSOLUTE epoch + draw index, so a
                # resumed run draws the identical corruptions
                F.pmod(
                    _md5_u32(
                        F.concat_ws(
                            SEP, "c", "x",
                            (F.lit(epoch_offset)
                             + F.floor(F.col("j") / k_neg)).cast("string"),
                            (F.col("j") % k_neg).cast("string"),
                        )
                    ),
                    F.col("n_ctx"),
                )
                + 1,
            )
            .join(ctx_vocab, F.col("neg_idx") == F.col("idx"))
            .filter(F.col("v") != F.col("x"))
            .select(
                "c",
                F.col("v").alias("x_term"),
                "cnt",
                F.floor(F.col("j") / k_neg).cast("int").alias("epoch"),
                F.lit(0).alias("y"),
            )
            .localCheckpoint()
        )
    grad_mass_hist, n_terms_hist = [], []
    for epoch in range(epochs):
        terms = wpairs.select(
            "c", F.col("x").alias("x_term"), "cnt", F.lit(1).alias("y")
        )
        if k_neg > 0:
            terms = terms.unionByName(
                negs.filter(F.col("epoch") == epoch).select(
                    "c", "x_term", "cnt", "y"
                )
            )
        terms = terms.localCheckpoint()  # n_terms action + grad plan
        n_terms = (
            terms.agg(F.sum("cnt").alias("s")).collect()[0]["s"]
        )
        emb_of = lambda kind, alias, key: state.filter(  # noqa: E731
            F.col("kind") == kind
        ).select(
            F.col("node_id").alias(key), F.col("emb").alias(alias)
        )
        scored = (
            terms.join(emb_of("in", "ein", "c"), "c")
            .join(
                emb_of("out", "eout", "x_term"), "x_term"
            )
            .withColumn(
                "g",
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.expr(
                                "aggregate(zip_with(ein, eout, "
                                "(a, b) -> a * b), 0L, (acc, p) -> acc + p)"
                            ).cast("double")
                            / F.lit(1e12)
                        )
                    )
                )
                - F.col("y").cast("double"),
            )
            .localCheckpoint()  # feeds metric AND both gradient legs
        )
        if stats is not None:
            m = scored.agg(
                F.coalesce(
                    F.sum(
                        F.floor(F.abs(F.col("g")) * MICRO).cast("long")
                        * F.col("cnt")
                    ),
                    F.lit(0),
                ).alias("mass")
            ).collect()[0]
            grad_mass_hist.append(int(m["mass"]))
            n_terms_hist.append(int(n_terms))
        grad_rows = scored.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("in").alias("kind"),
                        F.col("c").alias("node_id"),
                        F.expr(
                            "transform(eout, o -> "
                            "cast(floor(g * o) as long) * cnt)"
                        ).alias("gv"),
                    ),
                    F.struct(
                        F.lit("out").alias("kind"),
                        F.col("x_term").alias("node_id"),
                        F.expr(
                            "transform(ein, i -> "
                            "cast(floor(g * i) as long) * cnt)"
                        ).alias("gv"),
                    ),
                )
            ).alias("s")
        ).select("s.kind", "s.node_id", F.posexplode("s.gv").alias("d", "g"))
        denom = MICRO * n_terms
        deltas = (
            grad_rows.groupBy("kind", "node_id", "d")
            .agg(F.sum("g").cast("long").alias("gsum"))
            .withColumn("dlt", F.expr(f"(gsum * {lr_ppm}) div {denom}"))
            .groupBy("kind", "node_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(d, dlt))), "
                    "x -> x.dlt)"
                ).alias("dvec")
            )
        )
        state = (
            state.join(deltas, ["kind", "node_id"], "left")
            .select(
                "kind",
                "node_id",
                F.when(F.col("dvec").isNull(), F.col("emb"))
                .otherwise(F.expr("zip_with(emb, dvec, (e, dd) -> e - dd)"))
                .alias("emb"),
            )
            .localCheckpoint()
        )
    if stats is not None:
        stats["grad_mass_per_epoch"] = grad_mass_hist
        stats["n_terms_per_epoch"] = n_terms_hist
    return state


def sgns_scores(
    embeddings: DataFrame,
    pairs: DataFrame,
    center: str = "center",
    context: str = "context",
) -> DataFrame:
    """Score pairs with a trained table: (center, context, dot_micro2)
    — the in.out inner product in micro^2 (higher = more associated);
    the link-prediction / association signal."""
    ein = embeddings.filter(F.col("kind") == "in").select(
        F.col("node_id").alias("c"), F.col("emb").alias("ein")
    )
    eout = embeddings.filter(F.col("kind") == "out").select(
        F.col("node_id").alias("x"), F.col("emb").alias("eout")
    )
    return (
        pairs.select(
            F.col(center).cast("string").alias("c"),
            F.col(context).cast("string").alias("x"),
        )
        .join(ein, "c")
        .join(eout, "x")
        .select(
            F.col("c").alias("center"),
            F.col("x").alias("context"),
            F.expr(
                "aggregate(zip_with(ein, eout, (a, b) -> a * b), 0L, "
                "(acc, p) -> acc + p)"
            ).alias("dot_micro2"),
        )
    )
