"""Canonicalization (dedup mode) parity + resume/idempotency tests."""

import os

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.config import PipelineConfig
from context_aware_rag_spark.operators.canonicalize import connected_components
from context_aware_rag_spark.oracle.reference_oracle import run_oracle
from context_aware_rag_spark.plans.pipeline import run_pipeline
from context_aware_rag_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_rows,
)

N_CONVS = 6


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_rows(N_CONVS)
    return rows, spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)


@pytest.fixture(scope="module")
def dedup_cfg():
    return PipelineConfig(deduplicate_nodes=True)


@pytest.fixture(scope="module")
def oracle(corpus, dedup_cfg):
    rows, _ = corpus
    return run_oracle(rows, deduplicate_nodes=True,
                      duplicate_score=dedup_cfg.duplicate_score)


@pytest.fixture(scope="module")
def result(spark, corpus, dedup_cfg):
    _, df = corpus
    return run_pipeline(spark, df, dedup_cfg)


def test_connected_components_basic(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "s")],
        ["a", "b"],
    )
    cmap = {r["node_id"]: r["canon_id"] for r in connected_components(pairs).collect()}
    assert cmap["a"] == cmap["b"] == cmap["c"] == "a"
    assert cmap["x"] == cmap["y"] == "x"
    assert cmap["p"] == cmap["q"] == cmap["r"] == cmap["s"] == "p"


def test_canonical_map_matches_oracle_closure(oracle, result):
    golden = {k: v for k, v in oracle.canonical_map.items() if k != v}
    got_full = {
        r["node_id"]: r["canon_id"] for r in result.canonical_map.collect()
    }
    got = {k: v for k, v in got_full.items() if k != v}
    # same grouping: compare partition into components, not representative
    # choice (both use min-id so representatives should also match)
    assert got == golden


def test_alias_groups_collapse(result):
    """All alias surfaces of one canonical entity within a conv map to a
    single canon node (FIXTURES.md §5 check 6)."""
    from context_aware_rag_spark.functions.extractor import ENTITY_GROUPS

    nodes = result.nodes.select("node_id", "name", "type").collect()
    name_to_canon = {}
    for r in nodes:
        name_to_canon.setdefault(r["name"], set()).add(r["node_id"])
    # canonical table should not contain two alias surfaces of the same
    # group as separate nodes *more than once per group* — i.e. each
    # group's aliases that appear all share one canon node
    alias_to_group = {
        a: k for k, (_, forms) in ENTITY_GROUPS.items() for a in forms
    }
    group_canons = {}
    for r in nodes:
        g = alias_to_group.get(r["name"])
        if g is None:
            continue
        group_canons.setdefault(g, set()).add(r["node_id"])
    for g, canons in group_canons.items():
        assert len(canons) == 1, (g, canons)


def test_merged_counts_match_oracle(oracle, result):
    """A11 totalMerged = sum of merge-group sizes (incl. representatives)."""
    from context_aware_rag_spark.operators.canonicalize import merged_counts

    row = merged_counts(result.canonical_map).collect()[0]
    golden = {k: v for k, v in oracle.canonical_map.items() if k != v}
    groups = len(set(golden.values()))
    assert row["merged_nodes"] == len(golden)
    assert row["merge_groups"] == groups
    assert row["total_merged"] == len(golden) + groups
    assert row["total_merged"] > 0  # alias corpus must actually merge


def test_lsh_blocking_matches_exact_closure(spark, corpus, dedup_cfg, result):
    """The scale path (blocking="lsh", near-linear banded candidates)
    produces the SAME canonical map as the exact blocked-GEMM path on
    the alias corpus: alias pairs sit at cosine ~0.998, where LSH pair
    recall is > 0.9999 (similarity.py banding math), and the planted
    corpus makes the check deterministic."""
    _, df = corpus
    cfg_lsh = PipelineConfig(deduplicate_nodes=True, canonicalize_blocking="lsh")
    r_lsh = run_pipeline(spark, df, cfg_lsh)
    exact = {
        (r["node_id"], r["canon_id"]) for r in result.canonical_map.collect()
    }
    lsh = {
        (r["node_id"], r["canon_id"]) for r in r_lsh.canonical_map.collect()
    }
    assert lsh == exact


def test_incremental_matches_full_recompute(spark, dedup_cfg):
    """Fold a second batch of nodes into an existing canonical map; the
    updated map must equal the full-batch closure over all nodes —
    including new aliases bridging previously separate components."""
    from context_aware_rag_spark.operators.canonicalize import (
        canonicalize_incremental,
        canonicalize_nodes,
    )

    rows1 = generate_rows(4)
    rows2 = generate_rows(8)[len(rows1):]  # the NEXT 4 conversations
    df1 = spark.createDataFrame(rows1, schema=TRANSCRIPT_SCHEMA)
    df_all = spark.createDataFrame(rows1 + rows2, schema=TRANSCRIPT_SCHEMA)
    df2 = spark.createDataFrame(rows2, schema=TRANSCRIPT_SCHEMA)

    def nodes_of(df):
        res = run_pipeline(spark, df, PipelineConfig())
        return res.mentions.select("node_id", "name", "type").dropDuplicates(
            ["node_id"]
        ).localCheckpoint()

    n1, n2, n_all = nodes_of(df1), nodes_of(df2), nodes_of(df_all)
    thr = dedup_cfg.duplicate_score
    map1 = canonicalize_nodes(n1, threshold=thr).localCheckpoint()
    inc = canonicalize_incremental(n1, map1, n2, threshold=thr)
    full = canonicalize_nodes(n_all, threshold=thr, blocking="lsh")
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}


def test_incremental_bridges_existing_components(spark):
    """A NEW alias that sits between two existing components must merge
    them, exactly as a full recompute would."""
    from context_aware_rag_spark.operators.canonicalize import (
        canonicalize_incremental,
        canonicalize_nodes,
    )

    old = spark.createDataFrame(
        [("n1", "Alice", "Person"), ("n2", "Alice Johnson", "Person"),
         ("n5", "Ms. Johnson", "Person"), ("n9", "Tokyo", "Location")],
        ["node_id", "name", "type"],
    )
    # new node: another alias of the same group, with a SMALLER id than
    # every existing rep (forces representative re-election)
    new = spark.createDataFrame(
        [("a0", "Alice", "Person"), ("z9", "Globex", "Object")],
        ["node_id", "name", "type"],
    )
    thr = 0.9
    map_old = canonicalize_nodes(old, threshold=thr).localCheckpoint()
    inc = canonicalize_incremental(old, map_old, new, threshold=thr)
    full = canonicalize_nodes(
        old.unionByName(new), threshold=thr, blocking="lsh"
    )
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}
    got = {r["node_id"]: r["canon_id"] for r in inc.collect()}
    # all Alice-group nodes collapse onto the new smallest id
    assert got["n1"] == got["n2"] == got["n5"] == "a0"
    assert "z9" not in got  # singleton stays canonical


def test_no_dangling_edge_endpoints(result):
    """Every predicate/HAS_ENTITY edge endpoint that is an entity id
    exists in the canonical nodes table."""
    node_ids = {r["node_id"] for r in result.nodes.select("node_id").collect()}
    ent_edges = result.edges.filter(
        ~F.col("rel_type").isin("PART_OF", "FIRST_CHUNK", "NEXT_CHUNK")
    ).collect()
    for e in ent_edges:
        assert e["dst"] in node_ids, e


def test_resume_idempotent(spark, corpus, dedup_cfg, tmp_path_factory):
    """Run with checkpoints, then re-run: second run resumes every stage
    and produces identical final tables (FIXTURES.md §5 check 5)."""
    _, df = corpus
    wd = str(tmp_path_factory.mktemp("kgwork"))
    r1 = run_pipeline(spark, df, dedup_cfg, workdir=wd, run_id="r1")
    t1 = {tuple(r) for r in r1.triples.collect()}
    e1 = {tuple(r) for r in r1.edges.collect()}
    r2 = run_pipeline(spark, df, dedup_cfg, workdir=wd, run_id="r2")
    assert all(m.get("resumed") for m in r2.metrics.values()), r2.metrics
    t2 = {tuple(r) for r in r2.triples.collect()}
    e2 = {tuple(r) for r in r2.edges.collect()}
    assert t1 == t2 and e1 == e2

    # partial resume: delete two downstream stages, re-run, same output
    import shutil

    for stage in ("edges", "nodes", "canonical_map", "sim_pairs"):
        shutil.rmtree(os.path.join(wd, stage), ignore_errors=True)
    r3 = run_pipeline(spark, df, dedup_cfg, workdir=wd, run_id="r3")
    assert r3.metrics["chunks"].get("resumed")
    assert not r3.metrics["canonical_map"].get("resumed")
    e3 = {tuple(r) for r in r3.edges.collect()}
    assert e3 == e1

    # lineage rows recorded per (run, stage, partition), never duplicated
    lineage = spark.read.parquet(os.path.join(wd, "_lineage"))
    dup = (
        lineage.groupBy("run_id", "stage", "partition").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0


class TestAutoBlockingEscalation:
    """VERDICT r2 scale item 1: blocking="auto" must pick the exact GEMM
    below the rep-count threshold and LSH banding above it, with equal
    closures either way."""

    @pytest.fixture(scope="class")
    def nodes(self, spark):
        rows = []
        for g in range(8):
            for a in range(4):  # 4 aliases per group, same surface pool
                rows.append((f"n{g:02d}-{a}", f"entity {g}", "Person"))
        return spark.createDataFrame(rows, ["node_id", "name", "type"]).localCheckpoint()

    def _run_capturing(self, monkeypatch, nodes, **kwargs):
        from context_aware_rag_spark.operators import canonicalize, similarity

        seen = {}
        real = similarity.similarity_pairs

        def spy(*args, **kw):
            seen["blocking"] = kw.get("blocking", "type")
            return real(*args, **kw)

        monkeypatch.setattr(similarity, "similarity_pairs", spy)
        cmap = canonicalize.canonicalize_nodes(nodes, threshold=0.9, **kwargs)
        got = {(r["node_id"], r["canon_id"]) for r in cmap.collect()}
        return seen["blocking"], got

    def test_below_threshold_uses_exact_gemm(self, monkeypatch, nodes):
        blocking, _ = self._run_capturing(monkeypatch, nodes, blocking="auto")
        assert blocking == "type"

    def test_above_threshold_escalates_to_lsh(self, monkeypatch, nodes):
        blocking, _ = self._run_capturing(
            monkeypatch, nodes, blocking="auto", auto_lsh_threshold=4
        )
        assert blocking == "lsh"

    def test_closures_equal_across_escalation(self, monkeypatch, nodes):
        _, low = self._run_capturing(monkeypatch, nodes, blocking="auto")
        _, high = self._run_capturing(
            monkeypatch, nodes, blocking="auto", auto_lsh_threshold=4
        )
        assert low == high and low  # same non-empty canonical map

    def test_forced_overrides_still_work(self, monkeypatch, nodes):
        b1, m1 = self._run_capturing(monkeypatch, nodes, blocking="type",
                                     auto_lsh_threshold=1)
        b2, m2 = self._run_capturing(monkeypatch, nodes, blocking="lsh")
        assert (b1, b2) == ("type", "lsh")
        assert m1 == m2


def test_incremental_accepts_auto_blocking(spark):
    """blocking='auto' (the PipelineConfig default) must work on the
    incremental path too — below the threshold it resolves to the exact
    strategy and matches the full recompute."""
    from context_aware_rag_spark.operators.canonicalize import (
        canonicalize_incremental,
        canonicalize_nodes,
    )

    old = spark.createDataFrame(
        [("n1", "Alice", "Person"), ("n2", "Alice Johnson", "Person")],
        ["node_id", "name", "type"],
    )
    new = spark.createDataFrame(
        [("a0", "Alice", "Person")], ["node_id", "name", "type"]
    )
    thr = 0.9
    map_old = canonicalize_nodes(old, threshold=thr).localCheckpoint()
    inc = canonicalize_incremental(old, map_old, new, threshold=thr, blocking="auto")
    full = canonicalize_nodes(old.unionByName(new), threshold=thr)
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}


class TestClusterPurity:
    def _run(self, spark, node_rows, map_rows, **kw):
        from context_aware_rag_spark.operators.canonicalize import (
            cluster_purity,
        )

        nodes = spark.createDataFrame(
            node_rows, "node_id string, name string, type string"
        )
        cmap = spark.createDataFrame(
            map_rows, "node_id string, canon_id string"
        )
        return {
            r.canon_id: (
                r.n_members, r.n_names, r.n_types,
                r.majority_type, r.majority_n, r.purity_ppm,
            )
            for r in cluster_purity(nodes, cmap, **kw).collect()
        }

    def test_mixed_type_cluster_flags_impurity(self, spark):
        # Paris the Location (x2) glued to Paris the Person (x1)
        nodes = [
            ("n1", "Paris", "Location"),
            ("n2", "paris", "Location"),
            ("n3", "Paris", "Person"),
        ]
        got = self._run(spark, nodes, [("n2", "n1"), ("n3", "n1")])
        assert got == {
            "n1": (3, 2, 2, "Location", 2, 666_666),
        }

    def test_pure_cluster_and_singleton_filter(self, spark):
        nodes = [
            ("a1", "Acme", "Org"),
            ("a2", "ACME", "Org"),
            ("solo", "Bob", "Person"),
        ]
        got = self._run(spark, nodes, [("a2", "a1")])
        # singleton 'solo' dropped at min_members=2
        assert got == {"a1": (2, 2, 1, "Org", 2, 1_000_000)}
        got_all = self._run(
            spark, nodes, [("a2", "a1")], min_members=1
        )
        assert got_all["solo"] == (1, 1, 1, "Person", 1, 1_000_000)

    def test_null_type_is_its_own_class(self, spark):
        nodes = [
            ("n1", "X", "T"),
            ("n2", "X", None),
            ("n3", "X", None),
        ]
        got = self._run(spark, nodes, [("n2", "n1"), ("n3", "n1")])
        # NULL majority (2 of 3), n_types counts NULL as a class
        assert got == {"n1": (3, 1, 2, None, 2, 666_666)}

    def test_majority_tie_breaks_type_asc_nulls_last(self, spark):
        nodes = [
            ("n1", "X", "Beta"),
            ("n2", "X", "Alpha"),
            ("n3", "X", None),
        ]
        got = self._run(
            spark, nodes, [("n2", "n1"), ("n3", "n1")]
        )
        # all counts 1: Alpha < Beta < NULL (nulls last)
        assert got["n1"][3:] == ("Alpha", 1, 333_333)

    def test_guard(self, spark):
        from context_aware_rag_spark.operators.canonicalize import (
            cluster_purity,
        )

        nodes = spark.createDataFrame(
            [("n1", "X", "T")], "node_id string, name string, type string"
        )
        cmap = spark.createDataFrame([], "node_id string, canon_id string")
        with pytest.raises(ValueError, match="min_members"):
            cluster_purity(nodes, cmap, min_members=0)
