"""Unit tests: distributed SGNS trainer (operators/sgns.py) vs the
pure-Python oracle, plus learning-signal and scoring checks."""

import hashlib

import pytest

from context_aware_rag_spark.operators.sgns import sgns_scores, train_sgns
from context_aware_rag_spark.oracle.precompute import sgns_py


def _rand_pairs(tag, n, nc=7, nx=9):
    out = []
    for i in range(n):
        h = int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16)
        out.append((f"n{h % nc}", f"n{(h // nc) % nx}"))
    return out


def _df(spark, pairs, parts=None):
    df = spark.createDataFrame(pairs, "center: string, context: string")
    return df.repartition(parts) if parts else df


def _rows(df):
    return sorted((r.kind, r.node_id, tuple(r.emb)) for r in df.collect())


class TestTrainSgns:
    def test_bit_exact_vs_python(self, spark):
        pairs = _rand_pairs("sg1", 50) + _rand_pairs("sg1", 50)[:15]
        got = _rows(train_sgns(_df(spark, pairs), dim=4, epochs=2, k_neg=2))
        assert got == sgns_py(pairs, dim=4, epochs=2, k_neg=2)

    def test_partitioning_invariance(self, spark):
        pairs = _rand_pairs("sg2", 40)
        a = _rows(train_sgns(_df(spark, pairs, 1), dim=3, epochs=2, k_neg=1))
        b = _rows(train_sgns(_df(spark, pairs, 7), dim=3, epochs=2, k_neg=1))
        assert a == b

    def test_no_negatives_branch(self, spark):
        pairs = _rand_pairs("sg3", 30)
        got = _rows(train_sgns(_df(spark, pairs), dim=3, epochs=1, k_neg=0))
        assert got == sgns_py(pairs, dim=3, epochs=1, k_neg=0)

    def test_learns_association(self, spark):
        # two disjoint cliques of co-occurrence: after training, true
        # pairs must outscore cross-clique pairs on average
        pairs = []
        for i in range(40):
            g = "a" if i % 2 == 0 else "b"
            h = int(hashlib.md5(f"cl:{i}".encode()).hexdigest()[:8], 16)
            pairs.append((f"{g}{h % 3}", f"{g}{(h // 3) % 3}"))
        emb = train_sgns(
            _df(spark, pairs), dim=6, epochs=16, k_neg=2, lr_ppm=8_000_000
        )
        true_df = _df(spark, sorted(set(pairs)))
        cross = [
            (f"a{i}", f"b{j}") for i in range(3) for j in range(3)
        ]
        s_true = [
            r.dot_micro2 for r in sgns_scores(emb, true_df).collect()
        ]
        s_cross = [
            r.dot_micro2
            for r in sgns_scores(emb, _df(spark, cross)).collect()
        ]
        assert sum(s_true) / len(s_true) > sum(s_cross) / len(s_cross)

    def test_grad_mass_reported_and_shrinking_signal(self, spark):
        pairs = _rand_pairs("sg4", 60)
        stats = {}
        train_sgns(
            _df(spark, pairs), dim=4, epochs=3, k_neg=2, stats=stats
        )
        assert len(stats["grad_mass_per_epoch"]) == 3
        assert all(m > 0 for m in stats["grad_mass_per_epoch"])
        assert len(stats["n_terms_per_epoch"]) == 3

    def test_validation(self, spark):
        df = _df(spark, [("a", "b")])
        for kw in (
            {"dim": 0}, {"epochs": 0}, {"k_neg": -1},
            {"lr_ppm": 0}, {"init": 0},
        ):
            with pytest.raises(ValueError, match="hyperparameters"):
                train_sgns(df, **kw)


class TestSgnsResume:
    def test_split_training_is_bit_identical(self, spark):
        # train(2 epochs) == train(1) -> save -> resume(1, offset=1)
        pairs = _rand_pairs("rs1", 45)
        full = _rows(train_sgns(_df(spark, pairs), dim=4, epochs=2, k_neg=2))
        half = train_sgns(_df(spark, pairs), dim=4, epochs=1, k_neg=2)
        resumed = _rows(
            train_sgns(
                _df(spark, pairs), dim=4, epochs=1, k_neg=2,
                epoch_offset=1, init_state=half,
            )
        )
        assert resumed == full
        # and both match the pure-Python recurrence end to end
        assert full == sgns_py(pairs, dim=4, epochs=2, k_neg=2)

    def test_unseen_nodes_fall_back_to_md5_init(self, spark):
        pairs = [("a", "b"), ("a", "c")]
        half = train_sgns(_df(spark, pairs), dim=3, epochs=1, k_neg=0)
        grown = pairs + [("zz", "b")]  # zz absent from the checkpoint
        out = _rows(
            train_sgns(
                _df(spark, grown), dim=3, epochs=1, k_neg=0,
                epoch_offset=1, init_state=half,
            )
        )
        assert any(n == "zz" for _, n, _ in out)

    def test_negative_offset_rejected(self, spark):
        with pytest.raises(ValueError, match="hyperparameters"):
            train_sgns(_df(spark, [("a", "b")]), epoch_offset=-1)
