"""Temporal fact semantics + consistency QA over the extracted KG.

Two operators a production KG-construction pipeline needs once the
triple stream spans time (the reference's graph stores per-chunk
timestamps — graph_ingestion.py:155-164 prefixes every chunk with its
turn timestamps, and the Arango/Neo4j schemas keep chunk ``start``/
``end`` metadata — but its retrieval layer treats facts as eternal;
these operators materialize the valid-time view a transcript KG at
10^12 turns actually requires):

``fact_assertions`` / ``fact_intervals``
    Run-length-encode each (subj, pred)'s assertion sequence into
    validity intervals: a fact (subj, pred, obj) is valid from its
    first assertion until the first later assertion of a DIFFERENT
    object under the same (subj, pred) — the standard valid-time
    reading of a functional slot ("vm-a102 hosted_on rack-7" holds
    until the transcripts start saying "rack-9"). Open intervals
    (current facts) have ``valid_to = NULL``.

``functional_violations``
    AMIE-style consistency census: for every predicate, the integer
    functionality profile (distinct subjects vs distinct (subj, obj)
    pairs — Galárraga et al., WWW'13, same statistic as
    rules.relation_profile), and for every (pred, subj) slot asserted
    with ≥2 distinct objects, the sorted object list. High-
    functionality predicates with multi-object slots are the KG's
    contradiction candidates; downstream curation triages them by the
    attached integer profile, no float thresholds involved.

100 TB shape
------------
``fact_intervals`` costs ONE hash exchange on (subj_name, pred): both
row_number windows, the island aggregation, and the ``valid_to`` lead
all declare distribution requirements that hashpartitioning(subj, pred)
already satisfies (window/groupBy keys are supersets), so Catalyst
inserts a single Exchange and re-sorts locally — plan-asserted in
tests/test_facts.py. Skew: the partition key is (subj, pred), far finer
than per-predicate, and the per-slot assertion count is bounded by how
often one entity's one slot is re-asserted — the Zipf-hot ENTITY does
not concentrate a partition because its assertions spread over its
predicates. ``functional_violations`` is two map-side-combinable
aggregations over distinct triples plus a broadcast join against the
vocabulary-sized predicate profile.

Determinism: assertion order within (subj, pred) is (ts_s, obj_name) —
total, because assertions are distinct on exactly those columns —  so
island numbering, interval bounds, and the concatenated object lists
are reproducible across partitionings and engines. Timestamps travel
as integer epoch seconds (``ts_s``), never as engine-local timestamp
types, so the DuckDB twins hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fact_assertions(triples: DataFrame, chunks: DataFrame) -> DataFrame:
    """Distinct timed assertions (subj_name, pred, obj_name, ts_s).

    ``triples`` is the extraction output (carries conv_id + chunk_id
    provenance, extraction.py:34); ``chunks`` the chunking output
    (carries one ``ts`` per chunk, chunking.py:38). The assertion time
    of a triple is the MIN timestamp over the chunk rows bearing its
    chunk id (a chunk id can legitimately repeat inside a conversation
    when the same text recurs — sha1(text, conv_id) — and min() makes
    the choice deterministic). Cross-conversation re-assertions are
    distinct assertions; the (conv, chunk) provenance is then dropped
    so intervals describe the GLOBAL knowledge timeline.
    """
    chunk_ts = chunks.groupBy("conv_id", "chunk_id").agg(
        F.min("ts").alias("ts")
    )
    return (
        triples.select("conv_id", "chunk_id", "subj_name", "pred", "obj_name")
        .join(chunk_ts, ["conv_id", "chunk_id"])
        .select(
            "subj_name",
            "pred",
            "obj_name",
            F.col("ts").cast("long").alias("ts_s"),
        )
        .distinct()
    )


def fact_intervals(assertions: DataFrame) -> DataFrame:
    """Valid-time intervals per (subj, pred) via gaps-and-islands.

    Input: distinct (subj_name, pred, obj_name, ts_s) rows
    (:func:`fact_assertions`). Consecutive assertions of the same
    object (in (ts_s, obj_name) order within a (subj, pred) slot)
    collapse into one interval; a different object closes the previous
    interval at its own first assertion time. Output columns:

    (subj_name, pred, obj_name, valid_from, valid_to, n_asserts)

    with ``valid_to`` NULL for the slot's current (last) object run and
    epoch-second longs elsewhere. Re-assertion of an earlier object
    opens a NEW interval (history is preserved, not merged) — run-
    length semantics, identical to the DuckDB twin's.
    """
    slot = Window.partitionBy("subj_name", "pred").orderBy("ts_s", "obj_name")
    run = Window.partitionBy("subj_name", "pred", "obj_name").orderBy(
        "ts_s", "obj_name"
    )
    # rn over the slot first: the Exchange lands on (subj, pred) and
    # every later requirement is satisfied by subset-of-keys clustering.
    numbered = assertions.withColumn(
        "rn_all", F.row_number().over(slot)
    ).withColumn("island", F.col("rn_all") - F.row_number().over(run))
    islands = numbered.groupBy("subj_name", "pred", "obj_name", "island").agg(
        F.min("ts_s").alias("valid_from"),
        F.count(F.lit(1)).alias("n_asserts"),
        F.min("rn_all").alias("_start_rn"),
    )
    order = Window.partitionBy("subj_name", "pred").orderBy("_start_rn")
    return islands.select(
        "subj_name",
        "pred",
        "obj_name",
        "valid_from",
        F.lead("valid_from").over(order).alias("valid_to"),
        "n_asserts",
    )


def triple_evidence(triples: DataFrame, chunks: DataFrame) -> DataFrame:
    """Per-triple provenance census: how well-evidenced each distinct
    name-level fact is — the edge-weight / trust table a KG consumer
    reads before acting on a triple (GraphRAG weights its entity graph
    by exactly this kind of assertion count; a fact seen in one
    conversation at one instant is extraction noise until corroborated).

    For every distinct (subj_name, pred, obj_name):

    - ``n_convs`` — distinct conversations asserting it (independent
      sources, the strongest corroboration axis).
    - ``n_timepoints`` — distinct assertion timestamps
      (:func:`fact_assertions` grain: re-assertions over time).
    - ``first_ts_s`` / ``last_ts_s`` / ``span_s`` — the evidence
      window in integer epoch seconds.

    100 TB shape: two map-side-combinable aggregations on the SAME
    (subj, pred, obj) key — one over the assertion stream, one over
    the conv-level distinct triples — joined on that key, so the
    second agg and the join reuse the first shuffle's partitioning.
    No windows, no driver actions, integer timestamps end to end.
    """
    asserts = fact_assertions(triples, chunks)
    time_ev = asserts.groupBy("subj_name", "pred", "obj_name").agg(
        F.count(F.lit(1)).alias("n_timepoints"),
        F.min("ts_s").alias("first_ts_s"),
        F.max("ts_s").alias("last_ts_s"),
    )
    conv_ev = (
        triples.select("conv_id", "subj_name", "pred", "obj_name")
        .dropDuplicates()
        .groupBy("subj_name", "pred", "obj_name")
        .agg(F.countDistinct("conv_id").alias("n_convs"))
    )
    return time_ev.join(conv_ev, ["subj_name", "pred", "obj_name"]).select(
        "subj_name",
        "pred",
        "obj_name",
        "n_convs",
        "n_timepoints",
        "first_ts_s",
        "last_ts_s",
        (F.col("last_ts_s") - F.col("first_ts_s")).alias("span_s"),
    )


def entity_timeline(
    triples: DataFrame,
    chunks: DataFrame,
    last_k: "int | None" = None,
) -> DataFrame:
    """Per-entity chronological assertion feed — the "entity memory"
    view a retrieval layer stuffs into context when a question names an
    entity (what happened to it, in order, across every conversation).
    Each assertion appears once under its subject and once under its
    object:

    (entity, seq, ts_s, role, pred, other)

    with ``seq`` the 1-based chronological rank within the entity
    (order key (ts_s, pred, role, other) — total, because assertions
    are distinct on exactly (subj, pred, obj, ts_s), so numbering is
    reproducible across partitionings and engines). ``last_k`` keeps
    only each entity's k most recent rows (``seq`` still counts from
    the entity's FULL history, so consumers see the true offset).

    100 TB shape: the two role views are narrow projections unioned
    without a shuffle; ONE hash exchange on entity drives the ranking
    window (and the optional recency filter reuses it — same key, no
    second Exchange). The Zipf-hot entity concentrates its feed in one
    task by construction — that is the semantics ("one entity's
    ordered history"); ``last_k`` is the pressure valve, bounding what
    ships downstream.
    """
    if last_k is not None and last_k < 1:
        raise ValueError(f"need last_k >= 1, got {last_k}")
    asserts = fact_assertions(triples, chunks)
    subj_view = asserts.select(
        F.col("subj_name").alias("entity"),
        F.lit("subj").alias("role"),
        "ts_s",
        "pred",
        F.col("obj_name").alias("other"),
    )
    obj_view = asserts.select(
        F.col("obj_name").alias("entity"),
        F.lit("obj").alias("role"),
        "ts_s",
        "pred",
        F.col("subj_name").alias("other"),
    )
    order_cols = ["ts_s", "pred", "role", "other"]
    w = Window.partitionBy("entity").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    out = subj_view.unionByName(obj_view).select(
        "entity",
        F.row_number().over(w).alias("seq"),
        "ts_s",
        "role",
        "pred",
        "other",
    )
    if last_k is not None:
        w_desc = Window.partitionBy("entity").orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        out = out.withColumn(
            "_recency", F.row_number().over(w_desc)
        ).where(F.col("_recency") <= last_k).drop("_recency")
    return out


def facts_as_of(
    intervals: DataFrame, as_of_s: "int | None" = None
) -> DataFrame:
    """Point-in-time KG snapshot: the facts valid at ``as_of_s``.

    Input: :func:`fact_intervals` output. A fact row is in the snapshot
    iff ``valid_from <= as_of_s`` and (``valid_to`` is NULL or
    ``valid_to > as_of_s``) — half-open ``[valid_from, valid_to)``
    intervals, so the instant a slot flips objects the new object is
    the one reported (same convention as SCD2 reads, diff.py). With
    ``as_of_s=None`` the timestamp is derived IN-PLAN as the integer
    midpoint ``(min(valid_from) + max(valid_from)) div 2`` over the
    interval set: a deterministic mid-history probe that needs no
    caller-side collect and works at any corpus scale. The chosen
    ``as_of_s`` is emitted as a column so result hashes pin it.

    100 TB shape: the derived-``as_of`` path is one map-side-combinable
    global agg reduced to a SINGLE row, broadcast back via
    ``crossJoin(broadcast(...))`` — no driver collect, no
    SinglePartition stage on the fact stream; the filter itself is a
    narrow map. The explicit-``as_of`` path is a pure narrow filter
    that Catalyst pushes into the interval scan.
    """
    if as_of_s is not None:
        probe = F.lit(int(as_of_s)).cast("long")
        filtered = intervals.withColumn("as_of_s", probe)
    else:
        bounds = intervals.agg(
            F.expr(
                "(min(valid_from) + max(valid_from)) div 2"
            ).alias("as_of_s")
        )
        filtered = intervals.crossJoin(F.broadcast(bounds))
    return filtered.filter(
        (F.col("valid_from") <= F.col("as_of_s"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("as_of_s")))
    ).select(
        "subj_name",
        "pred",
        "obj_name",
        "valid_from",
        "valid_to",
        "n_asserts",
        "as_of_s",
    )


def slot_churn(intervals: DataFrame) -> DataFrame:
    """Per-predicate slot-volatility census over valid-time intervals.

    For each predicate: how many (subj, pred) slots it has, how many
    validity intervals those slots produced, and therefore how many
    object CHANGES the transcripts asserted (``n_changes = n_intervals
    - n_slots`` — every slot's first interval is free; each additional
    interval is one flip). Plus the contradiction-triage extras: the
    busiest slot's interval count (``max_intervals_per_slot``), the
    number of slots that flipped at least once (``n_churned_slots``),
    and the total CLOSED validity mass in integer seconds
    (``closed_duration_s`` — open intervals contribute nothing, so the
    number is exact, not as-of-dependent). High ``n_changes`` on a
    high-functionality predicate (:func:`functional_violations`) marks
    genuinely volatile state (hosted_on); on a low-functionality one it
    is ordinary multi-valuedness (visited).

    100 TB shape: two stacked map-side-combinable aggregations — per
    (subj, pred) slot, then per predicate. The slot groupBy's keys are
    exactly :func:`fact_intervals`' partitioning, so when composed the
    first agg is Exchange-free (partial+final inside the existing
    clustering); the second shuffles only slot-count rows (≤ one per
    (subj, pred)) to a vocabulary-sized output. Integer arithmetic
    throughout — engine-portable hashes.
    """
    slots = intervals.groupBy("pred", "subj_name").agg(
        F.count(F.lit(1)).alias("n_iv"),
        F.sum(
            F.when(
                F.col("valid_to").isNotNull(),
                F.col("valid_to") - F.col("valid_from"),
            ).otherwise(F.lit(0))
        ).alias("closed_s"),
    )
    return slots.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum("n_iv").alias("n_intervals"),
        (F.sum("n_iv") - F.count(F.lit(1))).alias("n_changes"),
        F.sum(F.when(F.col("n_iv") >= 2, 1).otherwise(0)).alias(
            "n_churned_slots"
        ),
        F.max("n_iv").alias("max_intervals_per_slot"),
        F.sum("closed_s").alias("closed_duration_s"),
    )


def functional_violations(
    triples: DataFrame,
    min_objects: int = 2,
    min_functionality_ppt: int = 0,
) -> DataFrame:
    """Multi-object slots under each predicate's functionality profile.

    For the distinct name-level triple set: per-predicate integer
    functionality (n_subj_pred distinct subjects over n_pairs_pred
    distinct (subj, obj) pairs — ≈1000 ppt means "one object per
    subject almost always", the slots where a second object is a
    contradiction, not a valid multi-value). Emits every (pred, subj)
    slot with ≥ ``min_objects`` distinct objects, its sorted object
    list, and the predicate profile; ``min_functionality_ppt`` gates on
    integer parts-per-thousand (n_subj_pred * 1000 >= ppt *
    n_pairs_pred) so no float comparison is involved.
    """
    if min_objects < 2:
        raise ValueError("min_objects must be >= 2 (a violation needs two)")
    if not 0 <= min_functionality_ppt <= 1000:
        raise ValueError("min_functionality_ppt must be in [0, 1000]")
    base = triples.select("subj_name", "pred", "obj_name").distinct()
    prof = base.groupBy("pred").agg(
        F.countDistinct("subj_name").alias("n_subj_pred"),
        F.count(F.lit(1)).alias("n_pairs_pred"),
    )
    slots = (
        base.groupBy("pred", "subj_name")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.concat_ws(",", F.sort_array(F.collect_list("obj_name"))).alias(
                "objects"
            ),
        )
        .filter(F.col("n_objects") >= min_objects)
    )
    return (
        slots.join(F.broadcast(prof), "pred")
        .filter(
            F.col("n_subj_pred") * F.lit(1000)
            >= F.lit(min_functionality_ppt) * F.col("n_pairs_pred")
        )
        .select(
            "pred",
            "subj_name",
            "n_objects",
            "objects",
            "n_subj_pred",
            "n_pairs_pred",
        )
    )


def interval_flickers(
    intervals: DataFrame, max_flicker_s: "int | None" = None
) -> DataFrame:
    """Sandwiched-interloper detection over valid-time intervals: the
    extraction-noise signature temporal KGs triage FIRST (Wikidata-
    style vandalism/misparse patrol). A slot that reads
    ``A … B(brief) … A`` almost never witnessed a real state change
    and a reversion — it witnessed one bad extraction of B inside A's
    reign. Static :func:`functional_violations` cannot see this (A and
    B are just two objects); :func:`slot_churn` counts it as two flips
    of a volatile slot. This emits the interloper itself.

    One row per interval whose slot-order neighbors (previous and next
    interval within the (subj, pred) slot) carry the SAME object while
    it carries a different one — with the interloper's closed duration
    in integer seconds and the surrounding object. ``max_flicker_s``
    optionally gates to brief interruptions (the noise regime);
    ``None`` reports every sandwiched reversion, letting the consumer
    threshold on ``duration_s``.

    Interval order within a slot is ``(valid_from, obj_name)`` — a
    total order identical to the islands' start-rank order (rn_all is
    (ts, obj)-monotone, and same-``valid_from`` islands differ in
    object), so the DuckDB twin reproduces it exactly.

    100 TB shape: one slot-keyed window over the interval table — the
    partition keys are a superset of :func:`fact_intervals`' Exchange
    keys, so composed with it the lag/lead run inside the existing
    clustering; a sandwiched interval is interior by construction so
    ``valid_to`` is never NULL and ``duration_s`` is exact.
    """
    if max_flicker_s is not None and max_flicker_s < 0:
        raise ValueError(f"need max_flicker_s >= 0, got {max_flicker_s}")
    w = Window.partitionBy("subj_name", "pred").orderBy(
        "valid_from", "obj_name"
    )
    x = intervals.select(
        "subj_name",
        "pred",
        "obj_name",
        "valid_from",
        "valid_to",
        "n_asserts",
        F.lag("obj_name").over(w).alias("_prev_obj"),
        F.lead("obj_name").over(w).alias("_next_obj"),
    )
    out = x.filter(
        F.col("_prev_obj").isNotNull()
        & (F.col("_prev_obj") == F.col("_next_obj"))
        & (F.col("obj_name") != F.col("_prev_obj"))
    ).select(
        "subj_name",
        "pred",
        "obj_name",
        "valid_from",
        "valid_to",
        (F.col("valid_to") - F.col("valid_from")).alias("duration_s"),
        F.col("_prev_obj").alias("surrounding_obj"),
        "n_asserts",
    )
    if max_flicker_s is not None:
        out = out.filter(F.col("duration_s") <= F.lit(int(max_flicker_s)))
    return out


def snapshot_diff(
    intervals: DataFrame,
    t1_s: "int | None" = None,
    t2_s: "int | None" = None,
) -> DataFrame:
    """Per-predicate KG drift census between two point-in-time
    snapshots — the maintenance monitor for a continuously-ingested
    graph ("what did last month's transcripts DO to the knowledge
    base": which predicates accreted facts, which ones churned, which
    held steady). The temporal sibling of diff.psi_* (which watches
    the INPUT corpus drift; this watches the produced KG).

    For every fact (subj, pred, obj): present-at-t = some validity
    interval contains t under the half-open :func:`facts_as_of`
    convention. Per predicate:

    (pred, n_t1, n_t2, n_added, n_removed, n_retained, stability_ppm,
     t1_s, t2_s)

    with ``stability_ppm`` the integer Jaccard of the two fact sets
    (retained * 1e6 div union) — 1e6 means the predicate's extension
    did not move. Predicates with facts in neither snapshot are absent
    (there is nothing to report drift on).

    With ``t1_s``/``t2_s`` None, the probes derive IN-PLAN at the
    1/3- and 2/3-points of the ``valid_from`` range ((2*min + max)
    div 3 and (min + 2*max) div 3) — the same no-collect discipline as
    :func:`facts_as_of` — and are emitted as columns so the hash pins
    them.

    100 TB shape: one interval scan computing both containment flags →
    a map-side-combinable (subj, pred, obj) agg (keys shared with the
    interval clustering) → a vocabulary-sized predicate agg; the probe
    bounds are a single-row global agg broadcast back. No windows, no
    driver actions, integer arithmetic end to end.
    """
    explicit = t1_s is not None and t2_s is not None
    if (t1_s is None) != (t2_s is None):
        raise ValueError("pass both t1_s and t2_s, or neither")
    if explicit and not int(t1_s) < int(t2_s):
        raise ValueError(f"need t1_s < t2_s, got {t1_s} >= {t2_s}")
    if explicit:
        probed = intervals.withColumn(
            "t1_s", F.lit(int(t1_s)).cast("long")
        ).withColumn("t2_s", F.lit(int(t2_s)).cast("long"))
    else:
        bounds = intervals.agg(
            F.expr("(2 * min(valid_from) + max(valid_from)) div 3").alias(
                "t1_s"
            ),
            F.expr("(min(valid_from) + 2 * max(valid_from)) div 3").alias(
                "t2_s"
            ),
        )
        probed = intervals.crossJoin(F.broadcast(bounds))
    contains = lambda t: (  # noqa: E731 — half-open [from, to)
        (F.col("valid_from") <= F.col(t))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col(t)))
    )
    facts = (
        probed.select(
            "subj_name",
            "pred",
            "obj_name",
            "t1_s",
            "t2_s",
            contains("t1_s").cast("int").alias("f1"),
            contains("t2_s").cast("int").alias("f2"),
        )
        .groupBy("subj_name", "pred", "obj_name", "t1_s", "t2_s")
        .agg(F.max("f1").alias("a"), F.max("f2").alias("b"))
        .filter((F.col("a") == 1) | (F.col("b") == 1))
    )
    return (
        facts.groupBy("pred", "t1_s", "t2_s")
        .agg(
            F.sum("a").alias("n_t1"),
            F.sum("b").alias("n_t2"),
            F.sum(
                F.when((F.col("b") == 1) & (F.col("a") == 0), 1).otherwise(0)
            ).alias("n_added"),
            F.sum(
                F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0)
            ).alias("n_removed"),
            F.sum(
                F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0)
            ).alias("n_retained"),
        )
        .select(
            "pred",
            "n_t1",
            "n_t2",
            "n_added",
            "n_removed",
            "n_retained",
            F.expr(
                "n_retained * 1000000 div (n_t1 + n_t2 - n_retained)"
            ).alias("stability_ppm"),
            "t1_s",
            "t2_s",
        )
    )
