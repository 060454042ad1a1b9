"""Unit tests: sequence_ngrams + markov_transitions (the SQL twins
live in entry_queries and are swept by test_entry_contract)."""

import pytest

from context_aware_rag_spark.operators import seqmine

SEP = seqmine.SEP


def _events(spark, rows):
    # (user, pos, token) — pos doubles as the tie-breaking id
    return spark.createDataFrame(
        [(u, p, p, t) for (u, p, t) in rows],
        "user_id: long, ts: long, event_id: long, tok: string",
    )


class TestSequenceNgrams:
    def test_hand_computed_bigrams(self, spark):
        ev = _events(
            spark,
            [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "b"),
             (2, 0, "a"), (2, 1, "b"),
             (3, 0, "b"), (3, 1, "a")],
        )
        out = {
            r.gram: (r.n_groups, r.n_occurrences)
            for r in seqmine.sequence_ngrams(
                ev, token="tok", n=2, min_groups=1
            ).collect()
        }
        assert out[f"a{SEP}b"] == (2, 3)  # twice in u1, once in u2
        assert out[f"b{SEP}a"] == (2, 2)  # u1 and u3
        assert len(out) == 2

    def test_min_groups_cut(self, spark):
        ev = _events(
            spark,
            [(1, 0, "a"), (1, 1, "b"), (2, 0, "c"), (2, 1, "d")],
        )
        out = seqmine.sequence_ngrams(
            ev, token="tok", n=2, min_groups=2
        ).collect()
        assert out == []

    def test_gram_never_crosses_groups(self, spark):
        # u1 ends with 'a', u2 starts with 'b' — no a>b gram
        ev = _events(spark, [(1, 0, "x"), (1, 1, "a"), (2, 0, "b"), (2, 1, "y")])
        grams = {
            r.gram
            for r in seqmine.sequence_ngrams(
                ev, token="tok", n=2, min_groups=1
            ).collect()
        }
        assert grams == {f"x{SEP}a", f"b{SEP}y"}

    def test_short_sequences_emit_nothing(self, spark):
        ev = _events(spark, [(1, 0, "a"), (1, 1, "b")])
        assert (
            seqmine.sequence_ngrams(ev, token="tok", n=3, min_groups=1)
            .collect()
            == []
        )

    def test_order_is_pinned_by_tie_breaker(self, spark):
        # identical ts everywhere: event_id must decide the order
        ev = spark.createDataFrame(
            [(1, 7, 2, "c"), (1, 7, 0, "a"), (1, 7, 1, "b")],
            "user_id: long, ts: long, event_id: long, tok: string",
        )
        out = seqmine.sequence_ngrams(ev, token="tok", n=3, min_groups=1)
        assert [r.gram for r in out.collect()] == [f"a{SEP}b{SEP}c"]

    def test_validation(self, spark):
        ev = _events(spark, [(1, 0, "a")])
        with pytest.raises(ValueError, match="n >= 1"):
            seqmine.sequence_ngrams(ev, token="tok", n=0)
        with pytest.raises(ValueError, match="min_groups"):
            seqmine.sequence_ngrams(ev, token="tok", min_groups=0)
        with pytest.raises(ValueError, match="order column"):
            seqmine.sequence_ngrams(ev, token="tok", order_by=())


class TestMarkovTransitions:
    def test_hand_computed(self, spark):
        ev = _events(
            spark,
            [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
             (2, 0, "a"), (2, 1, "b")],
        )
        out = {
            (r.from_token, r.to_token): r
            for r in seqmine.markov_transitions(ev, token="tok").collect()
        }
        # transitions: a>b (x2), b>a (x1), a>c (x1)
        assert out[("a", "b")].n_obs == 2
        assert out[("a", "b")].from_total == 3
        assert out[("a", "b")].p_ppm == 2_000_000 // 3
        assert out[("a", "c")].p_ppm == 1_000_000 // 3
        # u2's trailing "b" is terminal — b has exactly ONE out
        assert out[("b", "a")].p_ppm == 1_000_000
        assert out[("b", "a")].from_total == 1

    def test_terminal_token_not_a_from_state(self, spark):
        ev = _events(spark, [(1, 0, "a"), (1, 1, "z")])
        out = seqmine.markov_transitions(ev, token="tok").collect()
        assert [(r.from_token, r.to_token) for r in out] == [("a", "z")]

    def test_row_probabilities_sum_to_about_one(self, spark):
        ev = _events(
            spark,
            [(1, i, t) for i, t in enumerate("abacabad")],
        )
        rows = seqmine.markov_transitions(ev, token="tok").collect()
        by_from = {}
        for r in rows:
            by_from.setdefault(r.from_token, []).append(r.p_ppm)
        for tok, ppms in by_from.items():
            assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000, tok


class TestEventuallyFollows:
    def _run(self, spark, rows, **kw):
        ev = _events(spark, rows)
        return {
            (r.from_token, r.to_token): r.n_groups
            for r in seqmine.eventually_follows(
                ev, token="tok", **kw
            ).collect()
        }

    def test_transitive_pair_counted(self, spark):
        # a > x > b: EF sees (a,b); directly-follows would not
        got = self._run(spark, [(1, 0, "a"), (1, 1, "x"), (1, 2, "b")])
        assert got[("a", "b")] == 1
        assert got[("a", "x")] == 1 and got[("x", "b")] == 1

    def test_per_case_support_not_inflated(self, spark):
        # a before b three times in ONE sequence -> still support 1
        rows = [(1, i, t) for i, t in enumerate("ababab")]
        got = self._run(spark, rows)
        assert got[("a", "b")] == 1

    def test_max_distance_bounds(self, spark):
        rows = [(1, i, t) for i, t in enumerate("axxxb")]
        assert ("a", "b") in self._run(spark, rows, max_distance=4)
        assert ("a", "b") not in self._run(spark, rows, max_distance=3)

    def test_support_across_sequences(self, spark):
        rows = [(u, 0, "a") for u in (1, 2, 3)] + [
            (u, 1, "b") for u in (1, 2)
        ]
        got = self._run(spark, rows, min_groups=2)
        assert got == {("a", "b"): 2}

    def test_validation(self, spark):
        ev = _events(spark, [(1, 0, "a")])
        with pytest.raises(ValueError, match="max_distance"):
            seqmine.eventually_follows(ev, token="tok", max_distance=0)
