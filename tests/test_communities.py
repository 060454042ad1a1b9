"""GraphRAG community reports: graph construction, LPA compose,
member clamp, global search, pure-Python corpus parity."""

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import communities


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id: string, subj_name: string, subj_type: string, "
        "pred: string, obj_name: string, obj_type: string",
    )


def _two_cliques(spark):
    # clique {A, B, C} and clique {X, Y, Z} — no cross edges
    rows = []
    for a, b in [("A", "B"), ("A", "C"), ("B", "C")]:
        rows.append(("c1", a, "Person", "KNOWS", b, "Person"))
    for a, b in [("X", "Y"), ("X", "Z"), ("Y", "Z")]:
        rows.append(("c1", a, "Object", "NEAR", b, "Object"))
    return _triples(spark, rows)


class TestEntityGraph:
    def test_nodes_and_edges(self, spark):
        t = _two_cliques(spark)
        nodes, edges = communities.entity_graph(t)
        assert nodes.count() == 6
        got = {(r.src, r.dst) for r in edges.collect()}
        assert ("A::Person", "B::Person") in got
        assert len(got) == 6

    def test_null_name_dropped_null_type_coalesced(self, spark):
        t = _triples(
            spark,
            [
                ("c1", "A", None, "P", "B", "Person"),
                ("c1", None, "Person", "P", "B", "Person"),
                ("c1", "A", None, "P", None, "Person"),
            ],
        )
        nodes, edges = communities.entity_graph(t)
        assert {r.node_id for r in nodes.collect()} == {
            "A::Entity", "B::Person"
        }
        assert {r.type for r in nodes.collect()} == {"Entity", "Person"}
        assert edges.count() == 1

    def test_self_loop_dropped(self, spark):
        t = _triples(spark, [("c1", "A", "T", "P", "A", "T")])
        nodes, edges = communities.entity_graph(t)
        assert nodes.count() == 1 and edges.count() == 0

    def test_min_count_gate(self, spark):
        rows = [("c%d" % i, "A", "T", "P", "B", "T") for i in range(3)]
        rows.append(("c9", "A", "T", "P", "C", "T"))
        t = _triples(spark, rows)
        _, edges = communities.entity_graph(t, min_count=2)
        got = {(r.src, r.dst) for r in edges.collect()}
        assert got == {("A::T", "B::T")}
        with pytest.raises(ValueError):
            communities.entity_graph(t, min_count=0)


class TestCommunityReports:
    def test_two_cliques_exact(self, spark):
        nodes, edges = communities.entity_graph(_two_cliques(spark))
        rows = {
            r.community: r
            for r in communities.community_reports(nodes, edges).collect()
        }
        assert set(rows) == {"A::Person", "X::Object"}
        a = rows["A::Person"]
        assert (a.n_members, a.n_listed) == (3, 3)
        assert a.summary == "[SUM] A (Person); B (Person); C (Person)"
        x = rows["X::Object"]
        assert x.summary == "[SUM] X (Object); Y (Object); Z (Object)"

    def test_max_members_clamp(self, spark):
        nodes, edges = communities.entity_graph(_two_cliques(spark))
        rows = {
            r.community: r
            for r in communities.community_reports(
                nodes, edges, max_members=2
            ).collect()
        }
        a = rows["A::Person"]
        assert (a.n_members, a.n_listed) == (3, 2)
        assert a.summary == "[SUM] A (Person); B (Person)"
        with pytest.raises(ValueError):
            communities.community_reports(nodes, edges, max_members=0)

    def test_isolated_node_absent(self, spark):
        t = _triples(
            spark,
            [
                # triangle (single-edge pairs 2-cycle under synchronous
                # LPA and end as singletons — documented; a triangle is
                # stable at the min label)
                ("c1", "A", "T", "P", "B", "T"),
                ("c1", "A", "T", "P", "C", "T"),
                ("c1", "B", "T", "P", "C", "T"),
                ("c1", "L", "T", "P", "L", "T"),  # self-loop only
            ],
        )
        nodes, edges = communities.entity_graph(t)
        assert nodes.count() == 4  # L is in the vocabulary...
        reports = communities.community_reports(nodes, edges).collect()
        # ...but not in any report (no edges -> LPA never sees it)
        assert {r.community for r in reports} == {"A::T"}

    def test_partitioning_invariant(self, spark):
        t = _two_cliques(spark).repartition(7)
        nodes, edges = communities.entity_graph(t)
        a = sorted(
            map(tuple, communities.community_reports(nodes, edges).collect())
        )
        b = sorted(
            map(
                tuple,
                communities.community_reports(
                    nodes.repartition(5), edges.repartition(3)
                ).collect(),
            )
        )
        assert a == b

    def test_corpus_parity(self, spark):
        """Spark compose == pure-Python oracle on the real pipeline."""
        from context_aware_rag_spark.config import PipelineConfig
        from context_aware_rag_spark.oracle import precompute
        from context_aware_rag_spark.plans.pipeline import run_pipeline
        from context_aware_rag_spark.sources.transcripts import (
            generate_transcripts,
        )

        res = run_pipeline(spark, generate_transcripts(spark, 6),
                           PipelineConfig())
        triples = res.triples.select(
            "conv_id", "subj_name", "subj_type", "pred",
            "obj_name", "obj_type",
        ).distinct()
        nodes, edges = communities.entity_graph(triples, min_count=10)
        got = sorted(
            map(
                tuple,
                communities.community_reports(
                    nodes, edges, max_members=12
                ).collect(),
            )
        )
        assert got == precompute.community_reports_table(6)


class TestGlobalSearch:
    def _reports(self, spark):
        return spark.createDataFrame(
            [
                ("c1", 3, 3, "[SUM] Alice (Person); Bob (Person)"),
                ("c2", 2, 2, "[SUM] Berlin (Location); Alice (Person)"),
                ("c3", 2, 2, "[SUM] Red Truck (Vehicle)"),
            ],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )

    def test_scoring_and_rank(self, spark):
        got = communities.community_global_search(
            self._reports(spark), "alice berlin", k=5
        ).collect()
        assert [(r.rank, r.community, r.score) for r in got] == [
            (1, "c2", 2), (2, "c1", 1)
        ]  # c3 scores 0 -> dropped

    def test_tie_break_and_k(self, spark):
        got = communities.community_global_search(
            self._reports(spark), "alice", k=1
        ).collect()
        # c1 and c2 both score 1; community ASC wins -> c1
        assert [(r.rank, r.community) for r in got] == [(1, "c1")]

    def test_distinct_terms_case(self, spark):
        # duplicate + mixed-case terms collapse to one distinct term
        got = communities.community_global_search(
            self._reports(spark), "ALICE alice Alice", k=5
        ).collect()
        assert all(r.score == 1 for r in got)

    def test_empty_query_raises(self, spark):
        with pytest.raises(ValueError):
            communities.community_global_search(
                self._reports(spark), "   ", k=5
            )


class TestCommunityHierarchy:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src: long, dst: long")

    def test_three_linked_cliques_merge(self, spark):
        # three 5-cliques with single bridges: internal cohesion (4
        # clique neighbors vs 1 bridge) keeps level-0 communities
        # distinct, while the quotient triangle merges all three at
        # level 1 (bridged triangles of size 3 flood to ONE level-0
        # community under min-tie-break — too tie-heavy)
        from itertools import combinations

        pairs = (
            list(combinations(range(1, 6), 2))
            + list(combinations(range(11, 16), 2))
            + list(combinations(range(21, 26), 2))
            + [(5, 11), (15, 21), (1, 25)]
        )
        got = communities.community_hierarchy(
            self._edges(spark, pairs)
        ).collect()
        by_node = {r.node_id: r for r in got}
        assert {by_node[n].community for n in range(1, 6)} == {1}
        assert {by_node[n].community for n in range(11, 16)} == {11}
        assert {by_node[n].community for n in range(21, 26)} == {21}
        assert {r.parent for r in got} == {1}

    def test_isolated_community_is_own_parent(self, spark):
        pairs = [(1, 2), (1, 3), (2, 3), (11, 12), (11, 13), (12, 13)]
        got = communities.community_hierarchy(
            self._edges(spark, pairs)
        ).collect()
        by_node = {r.node_id: r for r in got}
        assert (by_node[1].community, by_node[1].parent) == (1, 1)
        assert (by_node[11].community, by_node[11].parent) == (11, 11)
        assert all(r.parent is not None for r in got)

    def test_supplier_graph_parity(self, spark):
        """Spark hierarchy == pure-Python oracle on the real graph."""
        import duckdb

        from context_aware_rag_spark.oracle import precompute

        pairs = duckdb.sql(
            """
            SELECT a, b FROM (
              SELECT x.l_suppkey AS a, y.l_suppkey AS b,
                     count(DISTINCT x.l_orderkey) AS n
              FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet') x
              JOIN read_parquet('/root/testdata/sf0.01/lineitem.parquet') y
                ON x.l_orderkey = y.l_orderkey
               AND x.l_suppkey < y.l_suppkey
              GROUP BY 1, 2) WHERE n >= 35
            """
        ).fetchall()
        got = sorted(
            (int(r.node_id), int(r.community), int(r.parent))
            for r in communities.community_hierarchy(
                spark.createDataFrame(pairs, "src: long, dst: long")
            ).collect()
        )
        assert got == precompute.community_hierarchy_table(pairs)


class TestLocalSearch:
    def _fixture(self, spark):
        triples = _triples(
            spark,
            [
                ("c1", "A", "P", "K", "B", "P"),
                ("c2", "A", "P", "K", "B", "P"),   # A-B weight 2
                ("c1", "C", "Q", "K", "A", "P"),   # reversed side: A-C
                ("c1", "A", "P", "K", "D", None),  # NULL type -> Entity
                ("c1", "B", "P", "K", "C", "Q"),   # not incident to A
                ("c1", "A", "P", "K", "A", "P"),   # self-loop dropped
            ],
        )
        labels = spark.createDataFrame(
            [("A::P", "A::P"), ("B::P", "A::P")],
            "node_id: string, label: string",
        )
        reports = spark.createDataFrame(
            [("A::P", 2, 2, "[SUM] A (P); B (P)")],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        return triples, labels, reports

    def test_package_exact(self, spark):
        triples, labels, reports = self._fixture(spark)
        got = sorted(
            map(
                tuple,
                communities.community_local_search(
                    labels, reports, triples, "A::P", k=10
                ).collect(),
            )
        )
        assert got == [
            ("neighbor", 1, "B::P", "B (P)", 2),
            ("neighbor", 2, "C::Q", "C (Q)", 1),   # weight tie w/ D:
            ("neighbor", 3, "D::Entity", "D (Entity)", 1),  # ref ASC
            ("report", 1, "A::P", "[SUM] A (P); B (P)", 2),
        ]

    def test_k_bound_and_validation(self, spark):
        triples, labels, reports = self._fixture(spark)
        got = communities.community_local_search(
            labels, reports, triples, "A::P", k=1
        ).collect()
        assert sorted(r.section for r in got) == ["neighbor", "report"]
        assert [r.ref for r in got if r.section == "neighbor"] == ["B::P"]
        with pytest.raises(ValueError):
            communities.community_local_search(
                labels, reports, triples, "A::P", k=0
            )

    def test_unlabeled_entity_no_report(self, spark):
        triples, labels, reports = self._fixture(spark)
        got = communities.community_local_search(
            labels, reports, triples, "D::Entity", k=10
        ).collect()
        # D has a neighbor (A) but no community label -> no report row
        assert {r.section for r in got} == {"neighbor"}
        assert [(r.ref, r.weight) for r in got] == [("A::P", 1)]


class TestGlobalQA:
    def _reports(self, spark):
        return spark.createDataFrame(
            [
                ("c1", 2, 2, "[SUM] Alice (Person); Bob (Person)"),
                ("c2", 2, 2, "[SUM] Berlin (Location); Alice (Person)"),
                ("c3", 1, 1, "[SUM] Red Truck (Vehicle)"),
            ],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )

    def test_map_reduce_exact(self, spark):
        got = communities.community_global_qa(
            self._reports(spark), "alice berlin", k=5
        ).collect()
        assert len(got) == 1
        r = got[0]
        # c2 scores 2 (rank 1), c1 scores 1 (rank 2); fragments keep
        # only term-bearing clauses, reduce joins in rank order
        assert r.n_maps == 2
        assert r.answer == (
            "[SUM] 1) Berlin (Location); Alice (Person)"
            " | 2) Alice (Person)"
        )

    def test_boundary_spanning_term_drops_map(self, spark):
        # 'person); bob' matches the SUMMARY (so the report is
        # selected) but no single clause -> honest empty map answer
        got = communities.community_global_qa(
            self._reports(spark), "person); alice", k=1
        ).collect()[0]
        # c1 rank 1 (score 2 beats c2's... both contain 'alice';
        # 'person);' contained in c1 and c2 summaries alike -> tie,
        # community ASC -> c1); its 'alice' clause survives
        assert got.n_maps == 1
        assert "Alice (Person)" in got.answer

    def test_no_fragments_null_answer(self, spark):
        reports = spark.createDataFrame(
            [("c1", 1, 1, "[SUM] A (P); B (Q)")],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        got = communities.community_global_qa(
            reports, "p); ", k=5
        ).collect()[0]
        assert (got.n_maps, got.answer) == (0, None)

    def test_cap(self, spark):
        long_members = "; ".join(
            f"Alice{i} (Person)" for i in range(200)
        )
        reports = spark.createDataFrame(
            [("c1", 200, 200, "[SUM] " + long_members)],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        got = communities.community_global_qa(
            reports, "alice", k=5, cap=50
        ).collect()[0]
        assert len(got.answer) == 56  # cap + len('[SUM] ')
        assert got.answer.startswith("[SUM] 1) Alice0 (Person)")


class TestEntityReports:
    def test_exact_descriptions(self, spark):
        t = _triples(
            spark,
            [
                ("c1", "Alice", "Person", "KNOWS", "Bob", "Person"),
                ("c2", "Alice", "Person", "KNOWS", "Bob", "Person"),
                ("c1", "Alice", "Person", "VISITS", "Berlin", "Location"),
            ],
        )
        rows = {
            r.entity: r for r in communities.entity_reports(t).collect()
        }
        a = rows["Alice::Person"]
        # KNOWS Bob asserted twice -> weight 2 ranks first
        assert (a.name, a.type, a.n_facts, a.n_listed) == (
            "Alice", "Person", 2, 2
        )
        assert a.description == "[SUM] KNOWS Bob (Person); VISITS Berlin (Location)"
        b = rows["Bob::Person"]
        assert b.description == "[SUM] Alice (Person) KNOWS"
        assert rows["Berlin::Location"].description == "[SUM] Alice (Person) VISITS"

    def test_max_facts_clamp_and_min_facts_gate(self, spark):
        rows = [("c1", "Hub", "T", "P%d" % i, "N%d" % i, "T")
                for i in range(5)]
        rows.append(("c1", "Solo", "T", "P", "Other", "T"))
        t = _triples(spark, rows)
        got = {
            r.entity: r
            for r in communities.entity_reports(
                t, max_facts=2, min_facts=2
            ).collect()
        }
        # Hub: 5 facts, 2 listed; N*/Solo/Other each have 1 fact -> gated
        assert set(got) == {"Hub::T"}
        h = got["Hub::T"]
        assert (h.n_facts, h.n_listed) == (5, 2)
        assert h.description == "[SUM] P0 N0 (T); P1 N1 (T)"

    def test_null_type_coalesced_null_name_dropped(self, spark):
        t = _triples(
            spark,
            [
                ("c1", "A", None, "P", "B", "Person"),
                ("c1", None, "X", "P", "B", "Person"),
            ],
        )
        got = {r.entity: r for r in communities.entity_reports(t).collect()}
        assert set(got) == {"A::Entity", "B::Person"}
        assert got["A::Entity"].description == "[SUM] P B (Person)"
        assert got["B::Person"].description == "[SUM] A (Entity) P"

    def test_validation(self, spark):
        t = _triples(spark, [("c1", "A", "T", "P", "B", "T")])
        with pytest.raises(ValueError):
            communities.entity_reports(t, max_facts=0)
        with pytest.raises(ValueError):
            communities.entity_reports(t, min_facts=0)


def _drift_corpus(spark):
    # two triangle communities (triangles are LPA-stable); Alice-Bob
    # asserted twice so the neighbor weights are distinguishable
    rows = [
        ("c1", "Alice", "Person", "KNOWS", "Bob", "Person"),
        ("c2", "Alice", "Person", "KNOWS", "Bob", "Person"),
        ("c1", "Alice", "Person", "KNOWS", "Carol", "Person"),
        ("c1", "Bob", "Person", "KNOWS", "Carol", "Person"),
        ("c1", "Berlin", "Location", "NEAR", "Hamburg", "Location"),
        ("c1", "Berlin", "Location", "NEAR", "Munich", "Location"),
        ("c1", "Hamburg", "Location", "NEAR", "Munich", "Location"),
    ]
    return _triples(spark, rows)


class TestDriftSearch:
    def test_exact_package(self, spark):
        t = _drift_corpus(spark)
        nodes, edges = communities.entity_graph(t)
        reports = communities.community_reports(nodes, edges)
        out = communities.community_drift_search(
            reports, t, "alice berlin", k_reports=3, k_follow=3,
            k_neighbors=5,
        )
        got = sorted(tuple(r) for r in out.collect())
        p_sum = "[SUM] Alice (Person); Bob (Person); Carol (Person)"
        l_sum = "[SUM] Berlin (Location); Hamburg (Location); Munich (Location)"
        want = sorted([
            ("primer", None, 1, "Alice::Person", p_sum, 1),
            ("primer", None, 2, "Berlin::Location", l_sum, 1),
            ("selected", "Alice::Person", 1, "Alice::Person",
             "Alice (Person)", 1),
            ("selected", "Berlin::Location", 1, "Berlin::Location",
             "Berlin (Location)", 2),
            ("followup", "Alice::Person", 1, "Bob::Person",
             "Bob (Person)", 2),
            ("followup", "Alice::Person", 2, "Carol::Person",
             "Carol (Person)", 1),
            ("followup", "Berlin::Location", 1, "Hamburg::Location",
             "Hamburg (Location)", 1),
            ("followup", "Berlin::Location", 2, "Munich::Location",
             "Munich (Location)", 1),
        ])
        assert got == want

    def test_k_follow_bounds_selection(self, spark):
        # query "person" matches every clause of the Person report (and
        # none of the Location one): only the first k_follow clauses
        # select follow-ups, in clause order
        t = _drift_corpus(spark)
        nodes, edges = communities.entity_graph(t)
        reports = communities.community_reports(nodes, edges)
        out = communities.community_drift_search(
            reports, t, "person", k_follow=2
        ).collect()
        sel = sorted(
            (r.rank, r.entity) for r in out if r.section == "selected"
        )
        assert sel == [(1, "Alice::Person"), (2, "Bob::Person")]
        fu_entities = {r.entity for r in out if r.section == "followup"}
        assert fu_entities == {"Alice::Person", "Bob::Person"}
        assert not any(r.section == "primer" and "Location" in r.ref
                       for r in out)

    def test_unparseable_clause_selects_nothing(self, spark):
        reports = spark.createDataFrame(
            [("c1", 1, 1, "[SUM] garbage-without-parens")],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        t = _drift_corpus(spark)
        out = communities.community_drift_search(
            reports, t, "garbage"
        ).collect()
        assert [r.section for r in out] == ["primer"]

    def test_entity_selected_by_two_reports_followed_up_once(self, spark):
        # "Alice (Person)" matches in BOTH hand-built reports: two
        # selected rows (one per report), ONE follow-up neighbor set
        reports = spark.createDataFrame(
            [
                ("r1", 2, 2, "[SUM] Alice (Person); Bob (Person)"),
                ("r2", 2, 2, "[SUM] Alice (Person); Carol (Person)"),
            ],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        t = _drift_corpus(spark)
        out = communities.community_drift_search(
            reports, t, "alice"
        ).collect()
        sel = sorted(
            (r.ref, r.entity, int(r.weight))
            for r in out if r.section == "selected"
        )
        assert sel == [("r1", "Alice::Person", 1), ("r2", "Alice::Person", 2)]
        fu = sorted(
            (r.rank, r.ref) for r in out if r.section == "followup"
        )
        assert fu == [(1, "Bob::Person"), (2, "Carol::Person")]

    def test_validation(self, spark):
        t = _drift_corpus(spark)
        reports = spark.createDataFrame(
            [("r1", 1, 1, "[SUM] A (T)")],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        for kw in ("k_reports", "k_follow", "k_neighbors"):
            with pytest.raises(ValueError):
                communities.community_drift_search(
                    reports, t, "a", **{kw: 0}
                )


class TestSearchPlans:
    def test_global_search_plans_as_take_ordered(self, spark):
        # community count grows with the corpus: the report rank must
        # plan as TakeOrderedAndProject with rank re-derived on the k
        # survivors, never an unpartitioned row_number over all reports
        reports = spark.createDataFrame(
            [
                ("c1", 3, 3, "[SUM] Alice (Person); Bob (Person)"),
                ("c2", 2, 2, "[SUM] Berlin (Location); Alice (Person)"),
            ],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        out = communities.community_global_search(reports, "alice", k=5)
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_local_search_neighbor_rank_plans_as_take_ordered(self, spark):
        # a hot entity's degree is corpus-scale: the neighbor rank
        # rides the same TakeOrdered discipline
        triples = _triples(
            spark,
            [
                ("c1", "A", "P", "K", "B", "P"),
                ("c1", "C", "Q", "K", "A", "P"),
            ],
        )
        labels = spark.createDataFrame(
            [("A::P", "A::P")], "node_id: string, label: string"
        )
        reports = spark.createDataFrame(
            [("A::P", 2, 2, "[SUM] A (P); B (P)")],
            "community: string, n_members: long, n_listed: long, "
            "summary: string",
        )
        out = communities.community_local_search(
            labels, reports, triples, "A::P", k=3
        )
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
