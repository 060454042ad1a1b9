"""Distributed knowledge-graph embedding training (TransE).

TransE (Bordes et al., "Translating Embeddings for Modeling
Multi-relational Data", NeurIPS 2013) learns entity/relation vectors
with e_head + e_rel ~ e_tail for true triples, via a margin loss
against corrupted negatives. The reference ecosystem trains KG
embeddings off-graph in a separate GPU job; here the training loop IS
a DataFrame program, so the embedding table lives distributed and the
corpus never funnels through the driver — the clf_train.py precedent
with DISTRIBUTED model state (the state is an embeddings table, not a
driver vector).

Determinism discipline, stricter than clf_train: with the SQUARED L2
energy d = |h + r - t|^2 every score, margin test and gradient is a
polynomial in the integer-micro embeddings — there are NO floats in
the entire training loop except floor(sqrt(.)) in the per-epoch entity
renormalization, and IEEE sqrt is correctly rounded, so Spark and the
pure-Python oracle (oracle/precompute.transe_py) agree bit-for-bit.
All integral divisions use trunc-toward-zero (`div`) on both engines.
Negatives are the deterministic md5-filtered corruptions of
operators/negatives.negative_samples, generated ONCE with k=epochs and
sliced per epoch (sample_idx == epoch), so every epoch sees fresh but
reproducible corruption.

100 TB shape: per epoch — 4 equi-joins of the (loss-term)-sized frame
against the embeddings table on (kind, id) (hot entities are the skew
case by construction: AQE skew-join covers the probe side, and the
degree-bounded gradient agg is map-side combined), one
(kind, id, dim)-keyed agg whose output is model-sized, one
model-keyed update join; ``localCheckpoint`` per epoch keeps lineage
flat. Driver traffic per epoch is ONE 2-long-row loss metric. int64
headroom: gradient sums stay exact up to ~1e12 loss terms per entity
per dim (|2*diff| <= ~1e7 micro).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .negatives import SEP, negative_samples

MICRO = 1_000_000


def _init_emb(kind: str, dim: int, init: int):
    """Deterministic uniform init in [-init, +init] micro-units from
    md5(kind \\x1f id \\x1f dim_idx) — replayable on any engine."""
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


def _normalized(state_e: DataFrame) -> DataFrame:
    """Entity rows rescaled to L2 norm ~MICRO (trunc division; the
    only float is the correctly-rounded sqrt)."""
    return state_e.select(
        "kind",
        "node_id",
        F.expr(
            "transform(emb, x -> (x * 1000000) div "
            "greatest(1L, cast(floor(sqrt(cast(aggregate(emb, 0L, "
            "(acc, y) -> acc + y * y) as double))) as long)))"
        ).alias("emb"),
    )


def train_transe(
    triples: DataFrame,
    dim: int = 16,
    epochs: int = 5,
    lr_ppm: int = 100_000,
    margin_micro2: int = 1_000_000_000_000,
    init: int = MICRO,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    sides: tuple = ("src", "dst"),
    stats: dict | None = None,
) -> DataFrame:
    """Full-batch TransE over distinct (src, rel, dst) string triples.

    Returns the embedding table (kind, node_id, emb: array<long>) with
    kind 'e' (entities, unit-normalized) and 'r' (relations). Exact
    per-epoch recurrence (identical on the pure-Python oracle):

        E    <- normalize(E)                       [trunc div, isqrt]
        dp   = h + r - t;  dn = h' + r - t'        [int arrays]
        act  = margin + |dp|^2 - |dn|^2 > 0        [int compare]
        G    = sum over active terms of the +-2*dp / +-2*dn slots
        D    = (G * lr_ppm) div (1e6 * n_triples)  [trunc div]
        W    <- W - D

    If ``stats`` is given it receives ``loss_per_epoch`` (exact integer
    micro^2 hinge sums) and ``active_per_epoch``.
    """
    if dim < 1 or epochs < 1 or lr_ppm <= 0 or margin_micro2 < 0:
        raise ValueError("bad hyperparameters")
    spark = triples.sparkSession
    tri = (
        triples.select(
            F.col(src).cast("string").alias("src"),
            F.col(rel).cast("string").alias("rel"),
            F.col(dst).cast("string").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    n_triples = tri.count()
    if n_triples == 0:
        raise ValueError("no triples")
    negs = (
        negative_samples(tri, k=epochs, sides=sides)
        .withColumnRenamed("sample_idx", "epoch")
        .localCheckpoint()
    )
    ents = (
        tri.select(F.col("src").alias("node_id"))
        .unionAll(tri.select(F.col("dst").alias("node_id")))
        .distinct()
        .select(F.lit("e").alias("kind"), "node_id")
    )
    rels = tri.select(
        F.lit("r").alias("kind"), F.col("rel").alias("node_id")
    ).distinct()
    state = (
        ents.withColumn("emb", _init_emb("e", dim, init))
        .unionByName(rels.withColumn("emb", _init_emb("r", dim, init)))
        .localCheckpoint()
    )
    denom = MICRO * n_triples
    loss_hist, act_hist = [], []
    for epoch in range(epochs):
        state = _normalized(
            state.filter(F.col("kind") == "e")
        ).unionByName(state.filter(F.col("kind") == "r")).localCheckpoint()
        emb_of = lambda alias: state.select(  # noqa: E731
            F.col("kind").alias(f"_k_{alias}"),
            F.col("node_id").alias(f"_i_{alias}"),
            F.col("emb").alias(alias),
        )
        terms = (
            negs.filter(F.col("epoch") == epoch)
            .join(
                emb_of("eh"),
                (F.col("_k_eh") == "e") & (F.col("_i_eh") == F.col("src")),
            )
            .join(
                emb_of("er"),
                (F.col("_k_er") == "r") & (F.col("_i_er") == F.col("rel")),
            )
            .join(
                emb_of("et"),
                (F.col("_k_et") == "e") & (F.col("_i_et") == F.col("dst")),
            )
            .join(
                emb_of("en"),
                (F.col("_k_en") == "e")
                & (F.col("_i_en") == F.col("neg_entity")),
            )
            .select(
                "src", "rel", "dst", "side", "neg_entity",
                "eh", "er", "et", "en",
            )
            # dp = h + r - t ; dn swaps the corrupted slot for en
            .withColumn(
                "dp",
                F.expr("zip_with(zip_with(eh, er, (a, b) -> a + b), et, "
                       "(a, b) -> a - b)"),
            )
            .withColumn(
                "dn",
                F.when(
                    F.col("side") == "src",
                    F.expr("zip_with(zip_with(en, er, (a, b) -> a + b), et, "
                           "(a, b) -> a - b)"),
                ).otherwise(
                    F.expr("zip_with(zip_with(eh, er, (a, b) -> a + b), en, "
                           "(a, b) -> a - b)"),
                ),
            )
            .withColumn(
                "hinge",
                F.lit(margin_micro2)
                + F.expr("aggregate(dp, 0L, (acc, x) -> acc + x * x)")
                - F.expr("aggregate(dn, 0L, (acc, x) -> acc + x * x)"),
            )
            .filter(F.col("hinge") > 0)
            .localCheckpoint()  # feeds the metric row AND the grad agg
        )
        if stats is not None:
            m = terms.agg(
                F.coalesce(F.sum("hinge"), F.lit(0)).alias("loss"),
                F.count(F.lit(1)).alias("act"),
            ).collect()[0]
            loss_hist.append(int(m["loss"]))
            act_hist.append(int(m["act"]))
        # gradient slots: h and t sit in dp always and in dn only when
        # the OTHER side was corrupted; the corruption sits in dn only
        grad_rows = terms.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("e").alias("kind"),
                        F.col("src").alias("node_id"),
                        F.when(
                            F.col("side") == "dst",
                            F.expr("zip_with(dp, dn, (p, q) -> 2*p - 2*q)"),
                        ).otherwise(
                            F.expr("transform(dp, p -> 2*p)")
                        ).alias("g"),
                    ),
                    F.struct(
                        F.lit("r").alias("kind"),
                        F.col("rel").alias("node_id"),
                        F.expr("zip_with(dp, dn, (p, q) -> 2*p - 2*q)")
                        .alias("g"),
                    ),
                    F.struct(
                        F.lit("e").alias("kind"),
                        F.col("dst").alias("node_id"),
                        F.when(
                            F.col("side") == "src",
                            F.expr("zip_with(dp, dn, (p, q) -> 2*q - 2*p)"),
                        ).otherwise(
                            F.expr("transform(dp, p -> -2*p)")
                        ).alias("g"),
                    ),
                    F.struct(
                        F.lit("e").alias("kind"),
                        F.col("neg_entity").alias("node_id"),
                        F.when(
                            F.col("side") == "src",
                            F.expr("transform(dn, q -> -2*q)"),
                        ).otherwise(
                            F.expr("transform(dn, q -> 2*q)")
                        ).alias("g"),
                    ),
                )
            ).alias("s")
        ).select("s.kind", "s.node_id", F.posexplode("s.g").alias("d", "g"))
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
                F.when(
                    F.col("dvec").isNull(), F.col("emb")
                ).otherwise(
                    F.expr("zip_with(emb, dvec, (e, dd) -> e - dd)")
                ).alias("emb"),
            )
            .localCheckpoint()
        )
    state = _normalized(
        state.filter(F.col("kind") == "e")
    ).unionByName(state.filter(F.col("kind") == "r")).localCheckpoint()
    if stats is not None:
        stats["loss_per_epoch"] = loss_hist
        stats["active_per_epoch"] = act_hist
        stats["n_triples"] = n_triples
    return state


def transe_energy(
    embeddings: DataFrame,
    triples: DataFrame,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
) -> DataFrame:
    """Score triples with a trained table: (src, rel, dst, energy) —
    energy = |h + r - t|^2 in micro^2 (lower = more plausible). Exact
    integer arithmetic; the link-prediction ranking signal."""
    def emb_of(alias):
        return embeddings.select(
            F.col("kind").alias(f"_k_{alias}"),
            F.col("node_id").alias(f"_i_{alias}"),
            F.col("emb").alias(alias),
        )

    return (
        triples.select(
            F.col(src).cast("string").alias("src"),
            F.col(rel).cast("string").alias("rel"),
            F.col(dst).cast("string").alias("dst"),
        )
        .join(
            emb_of("eh"),
            (F.col("_k_eh") == "e") & (F.col("_i_eh") == F.col("src")),
        )
        .join(
            emb_of("er"),
            (F.col("_k_er") == "r") & (F.col("_i_er") == F.col("rel")),
        )
        .join(
            emb_of("et"),
            (F.col("_k_et") == "e") & (F.col("_i_et") == F.col("dst")),
        )
        .select(
            "src", "rel", "dst",
            F.expr(
                "aggregate(zip_with(zip_with(eh, er, (a, b) -> a + b), et, "
                "(a, b) -> a - b), 0L, (acc, x) -> acc + x * x)"
            ).alias("energy"),
        )
    )


def rank_metrics(
    embeddings: DataFrame,
    test_triples: DataFrame,
    known_triples: DataFrame,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    sides: tuple = ("src", "dst"),
) -> DataFrame:
    """Filtered link-prediction ranking (the standard KGE evaluation
    protocol, Bordes et al. 2013 §4): for each test triple and each
    corrupted side, rank the TRUE entity among all trained entities by
    ascending energy, excluding corruptions that are themselves known
    true triples (the "filtered" setting — a model must not be
    penalized for ranking another true fact above the probe).

    Output: one row per (side, test triple) —
    ``(side, src, rel, dst, true_energy, rank_pos, rr_ppm)`` with
    ``rank_pos`` = 1 + #candidates strictly better (energy <, or
    energy == with a deterministic ``cand < true_id`` string
    tie-break) and ``rr_ppm = 1_000_000 div rank_pos``. Everything is
    exact int64 arithmetic (energies are micro^2 polynomials), so the
    frame hash-matches the Spark-free oracle
    (oracle/precompute.rank_metrics_py) bit-for-bit.

    100 TB shape: evaluation cost is |test| x |entities| BY DESIGN
    (every published protocol scores the full entity universe) — the
    test side is the bounded one, so it is broadcast against ONE scan
    of the entity-embedding table (no shuffle of the big side); the
    filtered-protocol exclusion is a single equi-join of the candidate
    frame against the known-triple table on the corrupted key. Sample
    the test set upstream; never pass the full training set as test.
    """
    test = test_triples.select(
        F.col(src).cast("string").alias("src"),
        F.col(rel).cast("string").alias("rel"),
        F.col(dst).cast("string").alias("dst"),
    ).dropDuplicates(["src", "rel", "dst"])
    known = known_triples.select(
        F.col(src).cast("string").alias("k_src"),
        F.col(rel).cast("string").alias("k_rel"),
        F.col(dst).cast("string").alias("k_dst"),
    ).dropDuplicates(["k_src", "k_rel", "k_dst"])

    def emb_of(alias):
        return embeddings.select(
            F.col("kind").alias(f"_k_{alias}"),
            F.col("node_id").alias(f"_i_{alias}"),
            F.col("emb").alias(alias),
        )

    with_embs = (
        test.join(
            emb_of("eh"),
            (F.col("_k_eh") == "e") & (F.col("_i_eh") == F.col("src")),
        )
        .join(
            emb_of("er"),
            (F.col("_k_er") == "r") & (F.col("_i_er") == F.col("rel")),
        )
        .join(
            emb_of("et"),
            (F.col("_k_et") == "e") & (F.col("_i_et") == F.col("dst")),
        )
    )
    probes = None
    for side in sides:
        if side == "dst":
            # energy(c) = |eh + er - ec|^2 = |q - ec|^2, q = eh + er
            q = F.expr("zip_with(eh, er, (a, b) -> a + b)")
            true_id = F.col("dst")
        elif side == "src":
            # energy(c) = |ec + er - et|^2 = |q - ec|^2, q = et - er
            q = F.expr("zip_with(et, er, (a, b) -> a - b)")
            true_id = F.col("src")
        else:
            raise ValueError(f"unknown corruption side: {side!r}")
        p = with_embs.select(
            F.lit(side).alias("side"), "src", "rel", "dst",
            q.alias("q"), true_id.alias("true_id"),
            F.expr(
                "aggregate(zip_with("
                + ("zip_with(eh, er, (a, b) -> a + b)" if side == "dst"
                   else "zip_with(et, er, (a, b) -> a - b)")
                + ", "
                + ("et" if side == "dst" else "eh")
                + ", (a, b) -> a - b), 0L, (acc, x) -> acc + x * x)"
            ).alias("true_energy"),
        )
        probes = p if probes is None else probes.unionByName(p)

    ents = embeddings.filter(F.col("kind") == "e").select(
        F.col("node_id").alias("cand"), F.col("emb").alias("ec")
    )
    cand = ents.crossJoin(F.broadcast(probes)).withColumn(
        "cand_energy",
        F.expr(
            "aggregate(zip_with(q, ec, (a, b) -> a - b), 0L, "
            "(acc, x) -> acc + x * x)"
        ),
    ).select(
        "side", "src", "rel", "dst", "true_id", "true_energy",
        "cand", "cand_energy",
        F.when(F.col("side") == "dst", F.col("src"))
        .otherwise(F.col("cand")).alias("c_src"),
        F.when(F.col("side") == "dst", F.col("cand"))
        .otherwise(F.col("dst")).alias("c_dst"),
    )
    flagged = cand.join(
        known.withColumn("_known", F.lit(True)),
        (F.col("c_src") == F.col("k_src"))
        & (F.col("rel") == F.col("k_rel"))
        & (F.col("c_dst") == F.col("k_dst")),
        "left",
    )
    beats = (
        (F.col("cand") != F.col("true_id"))
        & F.col("_known").isNull()  # filtered protocol
        & (
            (F.col("cand_energy") < F.col("true_energy"))
            | (
                (F.col("cand_energy") == F.col("true_energy"))
                & (F.col("cand") < F.col("true_id"))
            )
        )
    )
    return (
        flagged.groupBy("side", "src", "rel", "dst", "true_energy")
        .agg(
            (F.lit(1) + F.sum(beats.cast("long"))).cast("int")
            .alias("rank_pos")
        )
        .withColumn("rr_ppm", F.expr("1000000L div rank_pos"))
    )


def rank_summary(ranks: DataFrame, ks: tuple = (1, 3, 10)) -> DataFrame:
    """Aggregate rank_metrics output into the published headline
    numbers: one row — n probes, MRR (ppm, trunc), hits@k (ppm) for
    each k. Integer-only so it stays engine-portable."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(rr_ppm) div count(1)").alias("mrr_ppm"),
    ]
    for k in ks:
        aggs.append(
            F.expr(
                f"(1000000L * sum(case when rank_pos <= {int(k)} then 1 "
                f"else 0 end)) div count(1)"
            ).alias(f"hits{int(k)}_ppm")
        )
    return ranks.agg(*aggs)
