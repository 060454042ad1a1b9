"""operators/facts.py — valid-time intervals + functional violations."""

import pytest

from pyspark.sql import functions as F

from context_aware_rag_spark.operators import facts


def _assertions(spark, rows):
    return spark.createDataFrame(
        rows, "subj_name string, pred string, obj_name string, ts_s long"
    )


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj_name string, pred string, obj_name string"
    )


class TestFactIntervals:
    def test_run_length_semantics(self, spark):
        # slot (vm, hosted_on): rack7 @10,20 → rack9 @30 → rack7 @40
        # reopened intervals preserve history, last interval open.
        rows = [
            ("vm", "hosted_on", "rack7", 10),
            ("vm", "hosted_on", "rack7", 20),
            ("vm", "hosted_on", "rack9", 30),
            ("vm", "hosted_on", "rack7", 40),
        ]
        got = {
            (r.obj_name, r.valid_from): (r.valid_to, r.n_asserts)
            for r in facts.fact_intervals(_assertions(spark, rows)).collect()
        }
        assert got == {
            ("rack7", 10): (30, 2),
            ("rack9", 30): (40, 1),
            ("rack7", 40): (None, 1),
        }

    def test_slots_are_independent(self, spark):
        rows = [
            ("vm", "hosted_on", "rack7", 10),
            ("vm", "owned_by", "alice", 15),
            ("db", "hosted_on", "rack7", 12),
        ]
        out = facts.fact_intervals(_assertions(spark, rows)).collect()
        assert len(out) == 3
        assert all(r.valid_to is None and r.n_asserts == 1 for r in out)

    def test_same_ts_ties_break_by_obj_name(self, spark):
        # two different objects at the SAME second order by obj_name:
        # 'a' precedes 'b', so 'a' closes at ts 10 too ([10,10) degenerate
        # but deterministic) and 'b' stays open.
        rows = [
            ("vm", "hosted_on", "b", 10),
            ("vm", "hosted_on", "a", 10),
        ]
        got = {
            r.obj_name: (r.valid_from, r.valid_to)
            for r in facts.fact_intervals(_assertions(spark, rows)).collect()
        }
        assert got == {"a": (10, 10), "b": (10, None)}

    def test_single_hash_exchange_no_single_partition(self, spark):
        rows = [("s%d" % (i % 7), "p", "o%d" % (i % 3), i) for i in range(50)]
        df = facts.fact_intervals(_assertions(spark, rows))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
        # one hash exchange on (subj, pred); every later distribution
        # requirement is satisfied by subset-of-keys clustering
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan

    def test_assertions_use_min_chunk_ts_and_dedupe(self, spark):
        triples = spark.createDataFrame(
            [
                ("c1", "k1", "vm", "hosted_on", "rack7"),
                ("c1", "k1", "vm", "hosted_on", "rack7"),  # dup extraction
                ("c1", "k2", "vm", "hosted_on", "rack9"),
            ],
            "conv_id string, chunk_id string, subj_name string, "
            "pred string, obj_name string",
        )
        chunks = spark.createDataFrame(
            [
                ("c1", "k1", "2026-01-01 00:00:30"),
                ("c1", "k1", "2026-01-01 00:00:10"),  # repeated chunk id
                ("c1", "k2", "2026-01-01 00:00:50"),
            ],
            "conv_id string, chunk_id string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            (r.subj_name, r.pred, r.obj_name): r.ts_s
            for r in facts.fact_assertions(triples, chunks).collect()
        }
        base = 1767225600  # 2026-01-01 UTC
        assert got == {
            ("vm", "hosted_on", "rack7"): base + 10,
            ("vm", "hosted_on", "rack9"): base + 50,
        }


class TestFunctionalViolations:
    def test_census_and_profile(self, spark):
        rows = [
            # hosted_on: 3 subjects, 4 pairs (vm has 2 objs) → 750 ppt
            ("vm", "hosted_on", "rack7"),
            ("vm", "hosted_on", "rack9"),
            ("db", "hosted_on", "rack7"),
            ("lb", "hosted_on", "rack1"),
            # tagged: multi-valued by nature, 1 subject 3 pairs → 333 ppt
            ("vm", "tagged", "prod"),
            ("vm", "tagged", "ssd"),
            ("vm", "tagged", "eu"),
        ]
        out = {
            (r.pred, r.subj_name): r
            for r in facts.functional_violations(_triples(spark, rows)).collect()
        }
        assert set(out) == {("hosted_on", "vm"), ("tagged", "vm")}
        host = out[("hosted_on", "vm")]
        assert (host.n_objects, host.objects) == (2, "rack7,rack9")
        assert (host.n_subj_pred, host.n_pairs_pred) == (3, 4)
        tag = out[("tagged", "vm")]
        assert (tag.n_objects, tag.objects) == (3, "eu,prod,ssd")
        # ppt gate keeps the near-functional predicate, drops the
        # multi-valued one: 3*1000 >= 700*4 but 1*1000 < 700*3
        gated = facts.functional_violations(
            _triples(spark, rows), min_functionality_ppt=700
        ).collect()
        assert {(r.pred, r.subj_name) for r in gated} == {("hosted_on", "vm")}

    def test_duplicate_triples_collapse(self, spark):
        rows = [("vm", "p", "a")] * 3 + [("vm", "p", "b")]
        out = facts.functional_violations(_triples(spark, rows)).collect()
        assert len(out) == 1 and out[0].n_objects == 2
        assert out[0].n_pairs_pred == 2

    def test_param_guards(self, spark):
        t = _triples(spark, [("s", "p", "o")])
        with pytest.raises(ValueError):
            facts.functional_violations(t, min_objects=1)
        with pytest.raises(ValueError):
            facts.functional_violations(t, min_functionality_ppt=1001)


class TestOracleParity:
    def test_assertions_match_precompute_snapshot_shape(self, spark):
        """End-to-end pipeline assertions == the pure-Python precompute
        (the same identity the committed snapshot pins at sf0.01)."""
        from context_aware_rag_spark.config import PipelineConfig
        from context_aware_rag_spark.oracle import precompute
        from context_aware_rag_spark.plans.pipeline import run_pipeline
        from context_aware_rag_spark.sources.transcripts import (
            generate_transcripts,
        )

        n = 8
        res = run_pipeline(spark, generate_transcripts(spark, n), PipelineConfig())
        got = sorted(
            (r.subj_name, r.pred, r.obj_name, r.ts_s)
            for r in facts.fact_assertions(res.triples, res.chunks).collect()
        )
        want = precompute.kg_tables(n)["kg_fact_assertions"]
        assert got == want


class TestFactsAsOf:
    def _iv(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "subj_name string, pred string, obj_name string, "
            "valid_from long, valid_to long, n_asserts long",
        )

    def test_half_open_boundary(self, spark):
        # [10, 30) flips to [30, None): at as_of=30 the NEW object wins
        rows = [
            ("vm", "hosted_on", "rack7", 10, 30, 2),
            ("vm", "hosted_on", "rack9", 30, None, 1),
        ]
        at_30 = facts.facts_as_of(self._iv(spark, rows), as_of_s=30).collect()
        assert [(r.obj_name, r.as_of_s) for r in at_30] == [("rack9", 30)]
        at_29 = facts.facts_as_of(self._iv(spark, rows), as_of_s=29).collect()
        assert [r.obj_name for r in at_29] == ["rack7"]
        # before history starts: empty snapshot
        assert facts.facts_as_of(self._iv(spark, rows), as_of_s=9).count() == 0

    def test_derived_probe_is_midpoint(self, spark):
        # valid_from in {10, 50}: probe = (10+50) div 2 = 30
        rows = [
            ("vm", "hosted_on", "rack7", 10, 50, 1),
            ("vm", "hosted_on", "rack9", 50, None, 1),
            ("db", "owned_by", "alice", 50, None, 1),
        ]
        out = facts.facts_as_of(self._iv(spark, rows)).collect()
        assert {r.as_of_s for r in out} == {30}
        assert [(r.subj_name, r.obj_name) for r in out] == [
            ("vm", "rack7")
        ]

    def test_derived_probe_plan_has_no_single_partition_on_facts(self, spark):
        # the global agg reduces to ONE row then broadcasts back; the
        # interval stream itself must never funnel through one task
        rows = [
            ("s%d" % (i % 7), "p", "o%d" % (i % 3), i, None, 1)
            for i in range(50)
        ]
        df = facts.facts_as_of(self._iv(spark, rows))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # the only SinglePartition allowed is the global-agg reduce of
        # per-partition partial min/max rows (bounded: #partitions rows)
        lines = plan.splitlines()
        sp = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
        assert len(sp) == 1, plan
        assert "partial_min" in lines[sp[0] + 1], plan


class TestSlotChurn:
    def test_census_numbers(self, spark):
        iv = spark.createDataFrame(
            [
                # slot (vm, hosted_on): 3 intervals, 2 changes,
                # closed mass (30-10) + (40-30) = 30
                ("vm", "hosted_on", "rack7", 10, 30, 2),
                ("vm", "hosted_on", "rack9", 30, 40, 1),
                ("vm", "hosted_on", "rack7", 40, None, 1),
                # slot (db, hosted_on): stable
                ("db", "hosted_on", "rack1", 5, None, 1),
                # other predicate
                ("vm", "owned_by", "alice", 10, None, 1),
            ],
            "subj_name string, pred string, obj_name string, "
            "valid_from long, valid_to long, n_asserts long",
        )
        got = {r.pred: r.asDict() for r in facts.slot_churn(iv).collect()}
        h = got["hosted_on"]
        assert (
            h["n_slots"], h["n_intervals"], h["n_changes"],
            h["n_churned_slots"], h["max_intervals_per_slot"],
            h["closed_duration_s"],
        ) == (2, 4, 2, 1, 3, 30)
        o = got["owned_by"]
        assert (o["n_slots"], o["n_intervals"], o["n_changes"]) == (1, 1, 0)

    def test_composed_with_intervals_single_exchange_chain(self, spark):
        # composed fact_intervals -> slot_churn: the slot groupBy keys
        # (pred, subj_name) are a permutation of the interval window's
        # partition keys, so no SinglePartition anywhere
        rows = [
            ("s%d" % (i % 5), "p%d" % (i % 2), "o%d" % (i % 3), i)
            for i in range(60)
        ]
        iv = facts.fact_intervals(_assertions(spark, rows))
        df = facts.slot_churn(iv)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


class TestTripleEvidence:
    def test_census(self, spark):
        triples = spark.createDataFrame(
            [
                ("c1", "k1", "vm", "hosted_on", "rack7"),
                ("c1", "k1", "vm", "hosted_on", "rack7"),  # dup extraction
                ("c2", "k2", "vm", "hosted_on", "rack7"),  # 2nd conv
                ("c1", "k3", "db", "owned_by", "alice"),
            ],
            "conv_id string, chunk_id string, subj_name string, "
            "pred string, obj_name string",
        )
        chunks = spark.createDataFrame(
            [("c1", "k1", 100), ("c2", "k2", 250), ("c1", "k3", 400)],
            "conv_id string, chunk_id string, ts long",
        )
        got = {
            (r.subj_name, r.pred, r.obj_name): r.asDict()
            for r in facts.triple_evidence(triples, chunks).collect()
        }
        vm = got[("vm", "hosted_on", "rack7")]
        assert (vm["n_convs"], vm["n_timepoints"]) == (2, 2)
        assert (vm["first_ts_s"], vm["last_ts_s"], vm["span_s"]) == (
            100, 250, 150,
        )
        db = got[("db", "owned_by", "alice")]
        assert (db["n_convs"], db["n_timepoints"], db["span_s"]) == (1, 1, 0)

    def test_no_single_partition_one_key_discipline(self, spark):
        triples = spark.createDataFrame(
            [("c%d" % (i % 3), "k%d" % i, "s%d" % (i % 5), "p", "o")
             for i in range(30)],
            "conv_id string, chunk_id string, subj_name string, "
            "pred string, obj_name string",
        )
        chunks = spark.createDataFrame(
            [("c%d" % (i % 3), "k%d" % i, 100 + i) for i in range(30)],
            "conv_id string, chunk_id string, ts long",
        )
        plan = (
            facts.triple_evidence(triples, chunks)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" not in plan, plan


class TestIntervalFlickers:
    def _iv(self, spark, rows):
        return facts.fact_intervals(_assertions(spark, rows))

    def test_sandwiched_interloper_detected(self, spark):
        # A(10..30) B(30..40) A(40..open): B is the flicker
        rows = [
            ("vm", "hosted_on", "A", 10),
            ("vm", "hosted_on", "B", 30),
            ("vm", "hosted_on", "A", 40),
        ]
        got = facts.interval_flickers(self._iv(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert (
            r.obj_name,
            r.surrounding_obj,
            r.valid_from,
            r.valid_to,
            r.duration_s,
        ) == ("B", "A", 30, 40, 10)

    def test_real_change_is_not_a_flicker(self, spark):
        # A → B → C: B is sandwiched but by DIFFERENT objects
        rows = [
            ("vm", "hosted_on", "A", 10),
            ("vm", "hosted_on", "B", 20),
            ("vm", "hosted_on", "C", 30),
        ]
        assert facts.interval_flickers(self._iv(spark, rows)).count() == 0

    def test_boundary_intervals_never_flag(self, spark):
        # first and last intervals have no sandwich; two-interval
        # slots (one real change) never flag
        rows = [
            ("vm", "hosted_on", "A", 10),
            ("vm", "hosted_on", "B", 20),
        ]
        assert facts.interval_flickers(self._iv(spark, rows)).count() == 0

    def test_max_flicker_s_gates_duration(self, spark):
        rows = [
            ("vm", "hosted_on", "A", 10),
            ("vm", "hosted_on", "B", 30),   # 70s interloper
            ("vm", "hosted_on", "A", 100),
        ]
        iv = self._iv(spark, rows)
        assert facts.interval_flickers(iv, max_flicker_s=69).count() == 0
        assert facts.interval_flickers(iv, max_flicker_s=70).count() == 1
        with pytest.raises(ValueError, match="max_flicker_s"):
            facts.interval_flickers(iv, max_flicker_s=-1)

    def test_double_flicker_both_reported(self, spark):
        # A B A C A: both B and C are sandwiched by A
        rows = [
            ("vm", "hosted_on", "A", 10),
            ("vm", "hosted_on", "B", 20),
            ("vm", "hosted_on", "A", 30),
            ("vm", "hosted_on", "C", 40),
            ("vm", "hosted_on", "A", 50),
        ]
        got = sorted(
            r.obj_name
            for r in facts.interval_flickers(self._iv(spark, rows)).collect()
        )
        assert got == ["B", "C"]

    def test_no_single_partition(self, spark):
        rows = [("vm", "hosted_on", "A", 10), ("vm", "hosted_on", "B", 20)]
        out = facts.interval_flickers(self._iv(spark, rows))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


class TestSnapshotDiff:
    def _iv(self, spark, rows):
        return facts.fact_intervals(_assertions(spark, rows))

    def test_added_removed_retained(self, spark):
        # pred p: at t=25 {x:A, y:B}; at t=75 {x:C, y:B, z:D}
        rows = [
            ("x", "p", "A", 10),   # x: A until 50, then C
            ("x", "p", "C", 50),
            ("y", "p", "B", 10),   # y: B forever (retained)
            ("z", "p", "D", 60),   # z: appears late (added)
        ]
        got = facts.snapshot_diff(
            self._iv(spark, rows), t1_s=25, t2_s=75
        ).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.pred, r.n_t1, r.n_t2) == ("p", 2, 3)
        assert (r.n_added, r.n_removed, r.n_retained) == (2, 1, 1)
        # jaccard: 1 retained / 4 union
        assert r.stability_ppm == 250_000
        assert (r.t1_s, r.t2_s) == (25, 75)

    def test_identical_snapshots_full_stability(self, spark):
        rows = [("x", "p", "A", 10), ("y", "q", "B", 10)]
        got = {
            r.pred: r.stability_ppm
            for r in facts.snapshot_diff(
                self._iv(spark, rows), t1_s=20, t2_s=30
            ).collect()
        }
        assert got == {"p": 1_000_000, "q": 1_000_000}

    def test_reopened_interval_counts_once(self, spark):
        # x: A(10..20) B(20..30) A(30..open) — at t=35 A present via
        # its SECOND interval; the fact-level max() collapses both
        rows = [
            ("x", "p", "A", 10),
            ("x", "p", "B", 20),
            ("x", "p", "A", 30),
        ]
        got = facts.snapshot_diff(
            self._iv(spark, rows), t1_s=15, t2_s=35
        ).collect()
        r = got[0]
        assert (r.n_t1, r.n_t2, r.n_retained) == (1, 1, 1)
        assert r.stability_ppm == 1_000_000

    def test_pred_absent_from_both_snapshots_dropped(self, spark):
        # q's only fact lives entirely between the probes
        rows = [
            ("x", "p", "A", 10),
            ("w", "q", "E", 40),
            ("w", "q", "F", 45),  # closes E at 45
        ]
        got = facts.snapshot_diff(
            self._iv(spark, rows), t1_s=20, t2_s=50
        ).collect()
        # q IS present at t2 via F (open) — so only check E never
        # shows: n_t2 for q is 1 (F), n_t1 is 0
        by_pred = {r.pred: r for r in got}
        assert by_pred["q"].n_t1 == 0 and by_pred["q"].n_t2 == 1
        # now probe both points before q existed at all
        got2 = facts.snapshot_diff(
            self._iv(spark, [("x", "p", "A", 10), ("w", "q", "E", 400)]),
            t1_s=20,
            t2_s=50,
        ).collect()
        assert [r.pred for r in got2] == ["p"]

    def test_derived_probes_thirds(self, spark):
        # valid_from range [10, 100]: t1 = (20+100)//3 = 40,
        # t2 = (10+200)//3 = 70
        rows = [
            ("x", "p", "A", 10),
            ("y", "p", "B", 55),
            ("z", "p", "C", 100),
        ]
        r = facts.snapshot_diff(self._iv(spark, rows)).collect()[0]
        assert (r.t1_s, r.t2_s) == (40, 70)
        assert r.n_t1 == 1 and r.n_t2 == 2  # A at 40; A+B at 70

    def test_param_guards(self, spark):
        iv = self._iv(spark, [("x", "p", "A", 10)])
        with pytest.raises(ValueError, match="both"):
            facts.snapshot_diff(iv, t1_s=5)
        with pytest.raises(ValueError, match="t1_s < t2_s"):
            facts.snapshot_diff(iv, t1_s=9, t2_s=9)

    def test_no_single_partition_explicit_probes(self, spark):
        iv = self._iv(spark, [("x", "p", "A", 10)])
        out = facts.snapshot_diff(iv, t1_s=5, t2_s=15)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
