"""GraphRAG-style community reports over the constructed KG.

The reference delegates community structure to its graph-DB plugin
(reference src/vss_ctx_rag/tools/storage — the Neo4j/Arango graph
stores) and summarizes per-batch (functions/summarization/batch.py);
the community REPORT — one LLM summary per entity community, used as
map-reduce context for corpus-global questions (Edge et al. 2024,
"From Local to Global: A Graph RAG Approach to Query-Focused
Summarization") — is the composition this module adds over the
engine's own pieces: deterministic LPA communities
(:func:`..operators.graph.label_propagation`) and the U4 fake-LLM
summarize slot (:func:`..operators.summarize.llm_summarize_udf`).

100 TB shape: the entity graph is VOCABULARY-sized (distinct canonical
entities + distinct co-mention pairs), orders of magnitude below the
chunk corpus, so every stage here is cheap relative to extraction.
LPA is one edge-sized shuffle per round (bounded rounds); the report
assembly shares ONE label-keyed Exchange between the member-rank
window and the per-community agg (same partitioning key, reused), and
``collect_list`` is bounded at ``max_members`` BY THE RANK FILTER
BEFORE the agg — a mega-community (the usual KG skew: one giant
connected blob) costs max_members rows in the collect, never its full
membership. The summary UDF sees one bounded row per community.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_graph(
    triples: DataFrame,
    *,
    subj_name: str = "subj_name",
    subj_type: str = "subj_type",
    obj_name: str = "obj_name",
    obj_type: str = "obj_type",
    min_count: int = 1,
) -> tuple:
    """(nodes, edges) of the undirected entity co-assertion graph.

    Node key = ``name :: coalesce(type, 'Entity')`` — the same
    NULL-type default the canonical node builder uses
    (materialize.py / kg_nodes_canonical), and explicitly coalesced on
    BOTH engines so NULL semantics cannot diverge (the round-4
    kg_relation_profile advice). Triples with a NULL name on either
    side carry no linkable endpoint and are dropped. Self-loops
    (subject key == object key) are dropped; edges are undirected
    (least, greatest) pairs asserted by at least ``min_count`` input
    rows — the assertion GRAIN is the caller's: pass instance-level
    triples to weight by mention, or ``.distinct()`` them first to
    weight by distinct assertion (what the kg_community_reports query
    does). Nodes are NOT gated: every named endpoint appears, so the
    node table stays the full entity vocabulary.

    One pair-keyed map-side-combined groupBy (edge-vocabulary-sized
    output) + one node-key dedup — both tiny next to extraction.
    """
    if min_count < 1:
        raise ValueError(f"need min_count >= 1, got {min_count}")
    sk = F.concat(
        F.col(subj_name), F.lit("::"),
        F.coalesce(F.col(subj_type), F.lit("Entity")),
    )
    ok = F.concat(
        F.col(obj_name), F.lit("::"),
        F.coalesce(F.col(obj_type), F.lit("Entity")),
    )
    named = triples.filter(
        F.col(subj_name).isNotNull() & F.col(obj_name).isNotNull()
    ).select(
        sk.alias("_sk"),
        F.col(subj_name).alias("_sn"),
        F.coalesce(F.col(subj_type), F.lit("Entity")).alias("_st"),
        ok.alias("_ok"),
        F.col(obj_name).alias("_on"),
        F.coalesce(F.col(obj_type), F.lit("Entity")).alias("_ot"),
    )
    # ONE scan: both endpoints explode from the same pass (the union of
    # two projections scanned the triple table twice); rows and the
    # dedup outcome are identical — name/type are functionally
    # determined by the node key (node_id == name::type)
    nodes = (
        named.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("_sk").alias("node_id"),
                        F.col("_sn").alias("name"),
                        F.col("_st").alias("type"),
                    ),
                    F.struct(
                        F.col("_ok").alias("node_id"),
                        F.col("_on").alias("name"),
                        F.col("_ot").alias("type"),
                    ),
                )
            ).alias("_e")
        )
        .select("_e.*")
        .dropDuplicates(["node_id"])
    )
    edges = (
        named.filter(F.col("_sk") != F.col("_ok"))
        .select(
            F.least("_sk", "_ok").alias("src"),
            F.greatest("_sk", "_ok").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("src", "dst")
        # materialized once: the edge table is vocabulary-sized while
        # its lineage re-scans the full triple table, and the standard
        # composes (reports + hierarchy, or LPA + quotient) consume it
        # 2-4 times — each re-scan cost a full corpus aggregation
        # (measured ~1 s per consumer at the 100x bench corpus)
        .localCheckpoint()
    )
    return nodes, edges


def community_reports(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    max_iter: int = 10,
    max_members: int = 40,
    cap: int = 400,
    summarize_udf=None,
) -> DataFrame:
    """One report row per LPA community: (community, n_members,
    n_listed, summary).

    ``community`` is the LPA label (the min member key of the
    converged label class — deterministic); ``n_members`` counts the
    FULL membership; the summary is built from the first
    ``max_members`` members in node_id order (``n_listed``), each
    rendered ``name (type)`` and joined ``"; "`` — the GraphRAG
    community-context clamp, so one giant community cannot blow the
    summarize row. The summary rides the U4 structured-JSON fake-LLM
    cycle by default (content == ``("[SUM] " + text)[:cap + 6]`` by
    the lossless-mode construction, which is what the pure-Python
    oracle pins).

    Isolated nodes (no edges) never reach LPA and are absent here —
    same contract as the reference's graph-DB community views, which
    are defined over the relationship projection. Document-side
    callers wanting singleton reports should union them in upstream.
    """
    from .graph import SMALL_LPA_EDGE_CAP, label_propagation
    from .summarize import llm_summarize_udf

    if max_members < 1:
        raise ValueError(f"need max_members >= 1, got {max_members}")
    if summarize_udf is None:
        summarize_udf = llm_summarize_udf(cap)

    # entity graphs are vocabulary-sized (module docstring): elect the
    # driver LPA replica below the cap, distributed fallback above it
    labels = label_propagation(
        edges, max_iter=max_iter, small_graph_cap=SMALL_LPA_EDGE_CAP
    ).select("node_id", "label")
    members = labels.join(nodes, "node_id")
    w = Window.partitionBy("label").orderBy("node_id")
    ranked = members.select(
        "label",
        F.concat(
            F.col("name"), F.lit(" ("), F.col("type"), F.lit(")")
        ).alias("member_text"),
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy("label")
        ).alias("_total"),
    ).filter(F.col("_rk") <= max_members)
    reports = (
        ranked.groupBy(F.col("label").alias("community"))
        .agg(
            F.max("_total").alias("n_members"),
            F.count(F.lit(1)).alias("n_listed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_rk", "member_text"))
                    ),
                    lambda x: x.member_text,
                ),
                "; ",
            ).alias("_members"),
        )
        .select(
            "community",
            "n_members",
            "n_listed",
            summarize_udf(F.col("_members")).alias("summary"),
        )
    )
    return reports


def community_global_search(
    reports: DataFrame,
    query: str,
    *,
    k: int = 5,
) -> DataFrame:
    """GraphRAG global search, the deterministic skeleton: score every
    community report against the question by the number of DISTINCT
    lowercased query terms contained in the lowercased summary
    (substring containment — the rate-limited relevance gate GraphRAG
    applies before the map step), keep the top ``k`` by
    (score DESC, community ASC), and emit them rank-ordered as the
    map-reduce context rows. Zero-score reports are dropped (an
    irrelevant community contributes nothing to the reduce).

    Returns (rank, community, score, summary). One report-sized
    (vocabulary-sized) TakeOrdered — no corpus access at query time.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("query has no terms")
    score = None
    for t in terms:
        hit = F.when(
            F.instr(F.lower(F.col("summary")), t) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        score = hit if score is None else (score + hit)
    scored = reports.select(
        "community", score.alias("score"), "summary"
    ).filter(F.col("score") > 0)
    # community count grows with the corpus, so even the report table
    # can't go through an unpartitioned row_number (Exchange
    # SinglePartition); limit-after-sort plans as TakeOrderedAndProject
    # and rank is re-derived on the k survivors — the dsir.py:219
    # discipline.
    w = Window.orderBy(F.col("score").desc(), F.col("community").asc())
    return (
        scored.orderBy(F.col("score").desc(), F.col("community").asc())
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "community", "score", "summary")
    )


def community_hierarchy(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """GraphRAG's hierarchical community levels, two deep: LPA on the
    base graph gives level-0 communities; LPA on the community
    QUOTIENT graph (one node per level-0 community, an edge where any
    base edge crosses two communities) gives each community its
    level-1 parent. A community with no cross edges is its own parent
    (an isolated island has nothing to merge with — coalesced, never
    NULL).

    Returns (node_id, community, parent) at the NODE grain, so the
    level-1 membership is a groupBy away and joins directly onto
    :func:`community_reports` output via ``community``.

    100 TB shape: the quotient graph is COMMUNITY-vocabulary-sized
    (strictly smaller than the entity vocabulary), so the second LPA
    is asymptotically free next to the first; the parent attach is one
    label-keyed equi-join of two node-sized tables.
    """
    from .graph import SMALL_LPA_EDGE_CAP, label_propagation

    l0 = label_propagation(
        edges, src=src, dst=dst, max_iter=max_iter,
        small_graph_cap=SMALL_LPA_EDGE_CAP,
    ).select(
        "node_id", F.col("label").alias("community")
    ).localCheckpoint()
    lab = l0.select(
        F.col("node_id").alias("_n"), F.col("community").alias("_c")
    )
    quotient = (
        edges.join(lab.withColumnRenamed("_n", src).withColumnRenamed(
            "_c", "_cs"), src)
        .join(lab.withColumnRenamed("_n", dst).withColumnRenamed(
            "_c", "_cd"), dst)
        .filter(F.col("_cs") != F.col("_cd"))
        .select(
            F.least("_cs", "_cd").alias("src"),
            F.greatest("_cs", "_cd").alias("dst"),
        )
        .dropDuplicates()
    )
    l1 = label_propagation(
        quotient, max_iter=max_iter, small_graph_cap=SMALL_LPA_EDGE_CAP
    ).select(
        F.col("node_id").alias("community"), F.col("label").alias("_p")
    )
    return l0.join(l1, "community", "left").select(
        "node_id",
        "community",
        F.coalesce(F.col("_p"), F.col("community")).alias("parent"),
    )


def community_local_search(
    labels: DataFrame,
    reports: DataFrame,
    triples: DataFrame,
    entity_key: str,
    *,
    k: int = 10,
    subj_name: str = "subj_name",
    subj_type: str = "subj_type",
    obj_name: str = "obj_name",
    obj_type: str = "obj_type",
) -> DataFrame:
    """GraphRAG local search, the deterministic skeleton: the context
    package for ONE entity — its community's report (section
    'report', rank 1) followed by its top-``k`` graph neighbors
    ranked by how many input triples assert a connection (section
    'neighbor', rank 1..k within the section, ties by neighbor key). ``labels`` is the
    (node_id, label) LPA output, ``reports`` the
    :func:`community_reports` table, ``triples`` the SAME grain the
    entity graph was built at.

    Returns (section, rank, ref, text, weight): for the report row
    ref = community key, text = summary, weight = n_members; for
    neighbor rows ref = neighbor key, text = "name (type)", weight =
    the assertion count.

    100 TB shape: the entity filter hits the triple scan (two pushed
    name predicates under an OR — still a scan-level filter), the
    neighbor agg is one map-side-combined groupBy on the filtered
    sliver, and the report lookup is a 1-row broadcast-able join.
    A global TakeOrdered over <= vocabulary-degree rows finishes it.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    sk = F.concat(
        F.col(subj_name), F.lit("::"),
        F.coalesce(F.col(subj_type), F.lit("Entity")),
    )
    ok = F.concat(
        F.col(obj_name), F.lit("::"),
        F.coalesce(F.col(obj_type), F.lit("Entity")),
    )
    named = triples.filter(
        F.col(subj_name).isNotNull() & F.col(obj_name).isNotNull()
    ).select(
        sk.alias("_sk"), ok.alias("_ok"),
        F.col(subj_name).alias("_sn"),
        F.coalesce(F.col(subj_type), F.lit("Entity")).alias("_st"),
        F.col(obj_name).alias("_on"),
        F.coalesce(F.col(obj_type), F.lit("Entity")).alias("_ot"),
    )
    nbr = (
        named.filter(
            (F.col("_sk") == entity_key) | (F.col("_ok") == entity_key)
        )
        .filter(F.col("_sk") != F.col("_ok"))
        .select(
            F.when(F.col("_sk") == entity_key, F.col("_ok"))
            .otherwise(F.col("_sk")).alias("ref"),
            F.when(F.col("_sk") == entity_key, F.col("_on"))
            .otherwise(F.col("_sn")).alias("_name"),
            F.when(F.col("_sk") == entity_key, F.col("_ot"))
            .otherwise(F.col("_st")).alias("_type"),
        )
        .groupBy("ref", "_name", "_type")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    # a hot entity's degree is corpus-scale, so the neighbor rank can't
    # go through an unpartitioned row_number; TakeOrdered + rank on the
    # k survivors (dsir.py:219 discipline)
    w = Window.orderBy(F.col("weight").desc(), F.col("ref").asc())
    neighbors = (
        nbr.orderBy(F.col("weight").desc(), F.col("ref").asc())
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.lit("neighbor").alias("section"),
            "rank",
            "ref",
            F.concat(
                F.col("_name"), F.lit(" ("), F.col("_type"), F.lit(")")
            ).alias("text"),
            "weight",
        )
    )
    report = (
        labels.filter(F.col("node_id") == entity_key)
        .select(F.col("label").alias("community"))
        .join(reports, "community")
        .select(
            F.lit("report").alias("section"),
            F.lit(1).alias("rank"),
            F.col("community").alias("ref"),
            F.col("summary").alias("text"),
            F.col("n_members").alias("weight"),
        )
    )
    return report.unionAll(neighbors)


def entity_reports(
    triples: DataFrame,
    *,
    max_facts: int = 20,
    min_facts: int = 1,
    cap: int = 400,
    summarize_udf=None,
    subj_name: str = "subj_name",
    subj_type: str = "subj_type",
    pred: str = "pred",
    obj_name: str = "obj_name",
    obj_type: str = "obj_type",
) -> DataFrame:
    """GraphRAG element summarization (Edge et al. 2024 §2.2): one
    merged description per entity, synthesized from every assertion
    that mentions it — the pipeline stage between extraction and the
    community layer that collapses an entity's scattered per-chunk
    descriptions into one canonical text.

    Facts are direction-rendered clauses at the caller's triple grain:
    ``"pred obj_name (obj_type)"`` where the entity is the subject and
    ``"subj_name (subj_type) pred"`` where it is the object, weighted
    by how many input rows assert them (pass conv-grain distinct
    triples to weight by conversations, instance triples to weight by
    mention). Per entity, facts rank (weight DESC, clause ASC); the
    first ``max_facts`` are joined '; ' and routed through the U4
    fake-LLM summarize cycle (description ==
    ``("[SUM] " + text)[:cap + 6]`` in lossless mode — the pure-SQL
    twin pin). Entities with fewer than ``min_facts`` distinct facts
    are dropped (an entity asserted once has nothing to merge).

    Returns (entity, name, type, n_facts, n_listed, description) with
    entity = ``name::coalesce(type,'Entity')`` — the entity-graph key,
    so this joins directly onto labels/reports/local search.

    100 TB shape: ONE direction-unioned scan of the triple table, one
    (entity, clause)-keyed map-side-combined groupBy, then the
    community_reports clamp discipline — the per-entity rank window
    filters at max_facts BEFORE collect_list, so a hub entity (the KG
    skew case) costs max_facts rows in the collect, never its full
    assertion set. The summarize UDF sees one bounded row per entity.
    """
    from .summarize import llm_summarize_udf

    if max_facts < 1:
        raise ValueError(f"need max_facts >= 1, got {max_facts}")
    if min_facts < 1:
        raise ValueError(f"need min_facts >= 1, got {min_facts}")
    if summarize_udf is None:
        summarize_udf = llm_summarize_udf(cap)

    named = triples.filter(
        F.col(subj_name).isNotNull() & F.col(obj_name).isNotNull()
    ).select(
        F.col(subj_name).alias("_sn"),
        F.coalesce(F.col(subj_type), F.lit("Entity")).alias("_st"),
        F.col(pred).alias("_p"),
        F.col(obj_name).alias("_on"),
        F.coalesce(F.col(obj_type), F.lit("Entity")).alias("_ot"),
    )
    # ONE scan: both direction-rendered clauses explode from the same
    # pass (the unionAll form scanned the triple table twice);
    # identical rows
    facts = named.select(
        F.explode(
            F.array(
                F.struct(
                    F.concat(
                        F.col("_sn"), F.lit("::"), F.col("_st")
                    ).alias("entity"),
                    F.col("_sn").alias("name"),
                    F.col("_st").alias("type"),
                    F.concat(
                        F.col("_p"), F.lit(" "), F.col("_on"),
                        F.lit(" ("), F.col("_ot"), F.lit(")"),
                    ).alias("clause"),
                ),
                F.struct(
                    F.concat(
                        F.col("_on"), F.lit("::"), F.col("_ot")
                    ).alias("entity"),
                    F.col("_on").alias("name"),
                    F.col("_ot").alias("type"),
                    F.concat(
                        F.col("_sn"), F.lit(" ("), F.col("_st"),
                        F.lit(") "), F.col("_p"),
                    ).alias("clause"),
                ),
            )
        ).alias("_f")
    ).select("_f.*")
    counted = facts.groupBy("entity", "name", "type", "clause").agg(
        F.count(F.lit(1)).alias("_w")
    )
    w = Window.partitionBy("entity").orderBy(
        F.col("_w").desc(), F.col("clause").asc()
    )
    ranked = counted.select(
        "entity", "name", "type", "clause",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy("entity")).alias("_total"),
    ).filter(F.col("_rk") <= int(max_facts))
    return (
        ranked.groupBy("entity")
        .agg(
            F.min("name").alias("name"),
            F.min("type").alias("type"),
            F.max("_total").alias("n_facts"),
            F.count(F.lit(1)).alias("n_listed"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rk", "clause"))),
                    lambda x: x.clause,
                ),
                "; ",
            ).alias("_facts"),
        )
        .filter(F.col("n_facts") >= int(min_facts))
        .select(
            "entity", "name", "type", "n_facts", "n_listed",
            summarize_udf(F.col("_facts")).alias("description"),
        )
    )


def community_drift_search(
    reports: DataFrame,
    triples: DataFrame,
    query: str,
    *,
    k_reports: int = 3,
    k_follow: int = 3,
    k_neighbors: int = 5,
    subj_name: str = "subj_name",
    subj_type: str = "subj_type",
    obj_name: str = "obj_name",
    obj_type: str = "obj_type",
) -> DataFrame:
    """GraphRAG DRIFT search, the deterministic skeleton (Microsoft
    GraphRAG's third query mode beside global and local): a PRIMER pass
    over the community reports seeds FOLLOW-UP local searches whose
    results widen the context beyond what either mode alone returns.

    Phases (each deterministic, each a DataFrame op):

    1. PRIMER — :func:`community_global_search` scores every report by
       distinct-query-term containment and keeps the top
       ``k_reports``.
    2. FOLLOW-UP SELECTION — from each primer report, the first
       ``k_follow`` member clauses (``"name (type)"``, '; '-separated)
       containing at least one query term become follow-up entities
       (key = ``name::type``, the entity-graph key). A clause that
       does not parse as ``name (type)`` selects nothing (dropped,
       never a malformed key).
    3. FOLLOW-UP — ONE batched local search for ALL selected entities:
       the distinct entity set (bounded at k_reports * k_follow rows)
       broadcast-joins the direction-unioned triple scan, and each
       entity's neighbors rank by (assertion count DESC, neighbor key
       ASC), top ``k_neighbors`` per entity via a PARTITIONED window
       (the W5 shape — parallel across entities, never a global sort).

    Returns (section, entity, rank, ref, text, weight):

    - section='primer':   entity NULL, rank = report rank, ref =
      community, text = summary, weight = term score;
    - section='selected': entity = follow-up key, rank = clause order
      within its report, ref = community it came from, text = the
      clause, weight = the report's primer rank;
    - section='followup': entity = follow-up key, rank = neighbor rank
      within that entity, ref = neighbor key, text = "name (type)",
      weight = assertion count at the caller's triple grain.

    100 TB shape: the primer is report-table-sized (TakeOrdered); the
    selection is arithmetic on k_reports rows; the follow-up leg costs
    ONE scan of the triple table regardless of how many follow-ups the
    primer produced (contrast per-entity
    :func:`community_local_search` calls: N scans), with the entity
    set broadcast because it is k-bounded by construction.
    """
    if k_reports < 1:
        raise ValueError(f"need k_reports >= 1, got {k_reports}")
    if k_follow < 1:
        raise ValueError(f"need k_follow >= 1, got {k_follow}")
    if k_neighbors < 1:
        raise ValueError(f"need k_neighbors >= 1, got {k_neighbors}")
    terms = sorted({t for t in query.lower().split() if t})

    primer_hits = community_global_search(reports, query, k=k_reports)
    primer = primer_hits.select(
        F.lit("primer").alias("section"),
        F.lit(None).cast("string").alias("entity"),
        F.col("rank").cast("int").alias("rank"),
        F.col("community").alias("ref"),
        F.col("summary").alias("text"),
        F.col("score").cast("long").alias("weight"),
    )

    # ---- follow-up selection: first k_follow term-matching clauses --
    clauses = F.split(F.substring(F.col("summary"), 7, 1_000_000), "; ")
    matching = F.filter(
        clauses,
        lambda s: F.reduce(
            F.array(*[F.lit(t) for t in terms]),
            F.lit(False),
            lambda acc, t: acc | (F.instr(F.lower(s), t) > 0),
        ),
    )
    _pat = r"^(.*) \(([^()]*)\)$"
    sel = (
        primer_hits.select(
            F.col("rank").alias("_prank"),
            F.col("community").alias("_comm"),
            F.posexplode(F.slice(matching, 1, int(k_follow))).alias(
                "_pos", "_clause"
            ),
        )
        .select(
            "_prank",
            "_comm",
            (F.col("_pos") + 1).cast("int").alias("_ord"),
            "_clause",
            F.regexp_extract(F.col("_clause"), _pat, 1).alias("_nm"),
            F.regexp_extract(F.col("_clause"), _pat, 2).alias("_ty"),
        )
        .filter(F.col("_nm") != "")
        .withColumn(
            "entity", F.concat(F.col("_nm"), F.lit("::"), F.col("_ty"))
        )
        .localCheckpoint()  # k-bounded; pins the broadcast side
    )
    selected = sel.select(
        F.lit("selected").alias("section"),
        "entity",
        F.col("_ord").alias("rank"),
        F.col("_comm").alias("ref"),
        F.col("_clause").alias("text"),
        F.col("_prank").cast("long").alias("weight"),
    )

    # ---- one batched local search for every follow-up entity --------
    sk = F.concat(
        F.col(subj_name), F.lit("::"),
        F.coalesce(F.col(subj_type), F.lit("Entity")),
    )
    ok = F.concat(
        F.col(obj_name), F.lit("::"),
        F.coalesce(F.col(obj_type), F.lit("Entity")),
    )
    named = triples.filter(
        F.col(subj_name).isNotNull() & F.col(obj_name).isNotNull()
    ).select(
        sk.alias("_sk"), ok.alias("_ok"),
        F.col(subj_name).alias("_sn"),
        F.coalesce(F.col(subj_type), F.lit("Entity")).alias("_st"),
        F.col(obj_name).alias("_on"),
        F.coalesce(F.col(obj_type), F.lit("Entity")).alias("_ot"),
    ).filter(F.col("_sk") != F.col("_ok"))
    both = named.select(
        F.col("_sk").alias("entity"),
        F.col("_ok").alias("ref"),
        F.col("_on").alias("_nm"),
        F.col("_ot").alias("_ty"),
    ).unionAll(
        named.select(
            F.col("_ok").alias("entity"),
            F.col("_sk").alias("ref"),
            F.col("_sn").alias("_nm"),
            F.col("_st").alias("_ty"),
        )
    )
    ents = sel.select("entity").distinct()
    nbr = (
        both.join(F.broadcast(ents), "entity")
        .groupBy("entity", "ref", "_nm", "_ty")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    wf = Window.partitionBy("entity").orderBy(
        F.col("weight").desc(), F.col("ref").asc()
    )
    followup = (
        nbr.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= int(k_neighbors))
        .select(
            F.lit("followup").alias("section"),
            "entity",
            F.col("rank").cast("int").alias("rank"),
            "ref",
            F.concat(
                F.col("_nm"), F.lit(" ("), F.col("_ty"), F.lit(")")
            ).alias("text"),
            F.col("weight").cast("long").alias("weight"),
        )
    )
    return primer.unionAll(selected).unionAll(followup)


def community_global_qa(
    reports: DataFrame,
    query: str,
    *,
    k: int = 5,
    cap: int = 400,
) -> DataFrame:
    """GraphRAG global QA, the deterministic skeleton of the full
    map-reduce: :func:`community_global_search` selects the top-``k``
    relevant reports; the MAP step extracts each report's answer
    fragment (the '; '-separated member clauses containing at least
    one query term — the extractive stand-in for the per-community LLM
    answer); the REDUCE step joins surviving fragments in rank order
    as ``"<rank>) <frag>"`` with ``" | "`` and routes the result
    through the U4 fake-LLM summarize cycle (content ==
    ``("[SUM] " + joined)[:cap + 6]``, the lossless-mode pin).

    Returns ONE row (n_maps, answer). Reports whose term match spans a
    clause boundary (no single clause contains a term) contribute no
    fragment and are dropped from the reduce — an honest empty map
    answer, never a fabricated one. All-empty maps yield (0, NULL).

    100 TB shape: everything downstream of the report table is
    k-bounded; the reduce is a single-row aggregate over k rows (the
    bounded-input exemption, same as the search window).
    """
    from .summarize import llm_summarize_udf

    terms = sorted({t for t in query.lower().split() if t})
    hits = community_global_search(reports, query, k=k)
    frag = F.array_join(
        F.filter(
            F.split(F.substring(F.col("summary"), 7, 1_000_000), "; "),
            lambda s: F.reduce(
                F.array(*[F.lit(t) for t in terms]),
                F.lit(False),
                lambda acc, t: acc | (F.instr(F.lower(s), t) > 0),
            ),
        ),
        "; ",
    )
    mapped = hits.select("rank", frag.alias("frag")).filter(
        F.col("frag") != ""
    )
    joined = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "rank",
                        F.concat(
                            F.col("rank").cast("string"),
                            F.lit(") "),
                            F.col("frag"),
                        ).alias("txt"),
                    )
                )
            ),
            lambda x: x.txt,
        ),
        " | ",
    )
    summarize = llm_summarize_udf(cap)
    return mapped.agg(
        F.count(F.lit(1)).alias("n_maps"), joined.alias("_joined")
    ).select(
        "n_maps",
        F.when(
            F.col("n_maps") > 0, summarize(F.col("_joined"))
        ).alias("answer"),
    )
