"""Deterministic split / sample: stability, proportions, plan shape,
and exact agreement with an independent hashlib recomputation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators.sampling import (
    deterministic_split,
    hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(1000)], ["doc_id", "text"]
    ).localCheckpoint()


def _py_md5(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


def test_split_matches_independent_recomputation(spark, docs):
    got = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    for i in range(1000):
        h = _py_md5(i)
        want = "train" if h < "cc" else ("val" if h < "e6" else "test")
        assert got[i] == want, (i, h, got[i], want)


def test_split_stable_under_corpus_growth(spark, docs):
    small = docs.filter(F.col("doc_id") < 100)
    a = {r["doc_id"]: r["split"] for r in deterministic_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    assert all(b[i] == a[i] for i in a)  # adding data never moves a row


def test_split_proportions_roughly_80_10_10(spark, docs):
    counts = {
        r["split"]: r["n"]
        for r in deterministic_split(docs).groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert 0.75 <= counts["train"] / 1000 <= 0.85
    assert 0.06 <= counts["val"] / 1000 <= 0.14
    assert 0.06 <= counts["test"] / 1000 <= 0.14


def test_hash_sample_exact_and_deterministic(spark, docs):
    want = set(sorted(range(1000), key=_py_md5)[:25])
    got = {r["doc_id"] for r in hash_sample(docs, k=25).collect()}
    assert got == want
    assert {r["doc_id"] for r in hash_sample(docs, k=25).collect()} == want


def test_hash_sample_plans_take_ordered(spark, docs):
    plan = (
        hash_sample(docs, k=25)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global Sort+Limit
    with pytest.raises(ValueError):
        hash_sample(docs, k=0)


def test_mix_corpus_copy_counts(spark):
    from context_aware_rag_spark.operators.sampling import (
        _hex8_threshold,
        mix_corpus,
    )

    rows = [(i, f"t{i}", ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = (
        mix_corpus(df, {"a": 2.0, "b": 0.5, "c": 0.0})
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n"), F.max("copy_idx").alias("mx"))
        .collect()
    )
    per = {r["doc_id"]: r for r in got}
    thr = _hex8_threshold(0.5)
    for i, _, src in rows:
        if src == "a":
            assert per[i]["n"] == 2 and per[i]["mx"] == 2
        elif src == "b":
            want = 1 if _py_md5(i)[:8] < thr else 0
            assert (i in per) == (want == 1)
            if want:
                assert per[i]["n"] == 1
        else:
            assert i not in per  # weight 0 drops the source

    # text column rides through untouched
    sample = mix_corpus(df, {"a": 2.0}).filter(F.col("doc_id") == 0).collect()
    assert all(r["text"] == "t0" for r in sample)


def test_mix_corpus_default_weight_and_validation(spark):
    from context_aware_rag_spark.operators.sampling import mix_corpus

    df = spark.createDataFrame([(1, "x", "zz")], ["doc_id", "text", "source"])
    out = mix_corpus(df, {"a": 3.0}).collect()  # 'zz' not in weights -> 1.0
    assert len(out) == 1 and out[0]["copy_idx"] == 1
    with pytest.raises(ValueError):
        mix_corpus(df, {"a": -0.5})


def test_split_rejects_bad_cuts(spark):
    from context_aware_rag_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="lowercase hex"):
        deterministic_split(df, cuts=(("train", "CC"), ("val", "e6")))
    with pytest.raises(ValueError, match="ascending"):
        deterministic_split(df, cuts=(("train", "cc"), ("val", "40")))
    with pytest.raises(ValueError, match="'split' column"):
        deterministic_split(df.withColumn("split", F.lit("x")))


def test_generated_column_collisions_fail_fast(spark):
    from context_aware_rag_spark.operators.sampling import hash_sample, mix_corpus

    df = spark.createDataFrame([(1, "s")], ["doc_id", "source"])
    with pytest.raises(ValueError, match="'_h'"):
        hash_sample(df.withColumn("_h", F.lit(1)), k=1)
    with pytest.raises(ValueError, match="'copy_idx'"):
        mix_corpus(df.withColumn("copy_idx", F.lit(1)), {"s": 2.0})


def test_hash_sample_boundary_tie_is_deterministic(spark):
    from context_aware_rag_spark.operators.sampling import hash_sample

    # duplicate ids -> identical hashes at the k-boundary; the id
    # tie-breaker keeps the SELECTED ID SET stable across shuffles
    df = spark.createDataFrame(
        [(i % 4, f"t{i}") for i in range(40)], ["doc_id", "text"]
    ).repartition(8)
    a = sorted(r["doc_id"] for r in hash_sample(df, k=10).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df.repartition(3), k=10).collect())
    assert a == b


class TestStratifiedSample:
    @pytest.fixture(scope="class")
    def strata(self, spark):
        rows = [(i, ["a", "b", "c"][i % 3]) for i in range(600)]
        return spark.createDataFrame(
            rows, ["doc_id", "source"]
        ).localCheckpoint()

    def test_matches_independent_recomputation(self, spark, strata):
        from context_aware_rag_spark.operators.sampling import (
            stratified_sample,
        )

        got = sorted(
            (r["source"], r["doc_id"])
            for r in stratified_sample(strata, k=7).collect()
        )
        by_src = {}
        for i in range(600):
            by_src.setdefault(["a", "b", "c"][i % 3], []).append(i)
        want = sorted(
            (s, i)
            for s, ids in by_src.items()
            for i in sorted(ids, key=lambda x: (_py_md5(x), x))[:7]
        )
        assert got == want

    def test_two_phase_equals_single_phase(self, spark, strata):
        from context_aware_rag_spark.operators.sampling import (
            stratified_sample,
        )

        one = sorted(
            map(tuple, stratified_sample(strata, k=11).collect())
        )
        for salts in (2, 8):
            two = sorted(
                map(
                    tuple,
                    stratified_sample(
                        strata, k=11, pre_salts=salts
                    ).collect(),
                )
            )
            assert two == one

    def test_growth_never_displaces_below_boundary(self, spark, strata):
        from context_aware_rag_spark.operators.sampling import (
            stratified_sample,
        )

        small = strata.filter(F.col("doc_id") < 300)
        k = 5
        before = {
            s: sorted(i for ss, i in rows)
            for s, rows in _group(
                stratified_sample(small, k=k).collect()
            ).items()
        }
        after = {
            s: sorted(i for ss, i in rows)
            for s, rows in _group(
                stratified_sample(strata, k=k).collect()
            ).items()
        }
        # every survivor of the grown corpus that already existed in the
        # small corpus was sampled there too (new rows can only displace
        # from the boundary, never promote unseen old rows)
        for s in after:
            for i in after[s]:
                if i < 300:
                    assert i in before[s]

    def test_validation(self, spark, strata):
        from context_aware_rag_spark.operators.sampling import (
            stratified_sample,
        )

        with pytest.raises(ValueError, match="k must be"):
            stratified_sample(strata, k=0)
        with pytest.raises(ValueError, match="_h"):
            stratified_sample(strata.withColumn("_h", F.lit(1)), k=1)


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["source"], []).append((r["source"], r["doc_id"]))
    return out


class TestWeightedSample:
    @pytest.fixture(scope="class")
    def weighted(self, spark):
        # weights 1..5 cycling, plus a zero-weight and a NULL-weight row
        rows = [(i, float(i % 5 + 1)) for i in range(1000)]
        rows += [(5000, 0.0), (5001, None)]
        return spark.createDataFrame(
            rows, "doc_id: long, w: double"
        ).localCheckpoint()

    @staticmethod
    def _py_key(i: int, w: float) -> int:
        import math

        u = (int(_py_md5(i)[:13], 16) + 1) / 2**52
        return round(math.log(u) / w * 1e6)

    def test_matches_independent_recomputation(self, spark, weighted):
        from context_aware_rag_spark.operators.sampling import (
            weighted_sample,
        )

        want = [
            i
            for i, _ in sorted(
                ((i, float(i % 5 + 1)) for i in range(1000)),
                key=lambda t: (-self._py_key(t[0], t[1]), t[0]),
            )[:30]
        ]
        got = [
            r["doc_id"]
            for r in weighted_sample(weighted, k=30, weight_col="w")
            .collect()
        ]
        assert sorted(got) == sorted(want)

    def test_zero_and_null_weights_excluded(self, spark, weighted):
        from context_aware_rag_spark.operators.sampling import (
            weighted_sample,
        )

        got = {
            r["doc_id"]
            for r in weighted_sample(
                weighted, k=2000, weight_col="w"
            ).collect()
        }
        assert 5000 not in got and 5001 not in got
        assert len(got) == 1000

    def test_weight_bias_direction(self, spark, weighted):
        from context_aware_rag_spark.operators.sampling import (
            weighted_sample,
        )

        rows = weighted_sample(weighted, k=300, weight_col="w").collect()
        mean_w = sum(r["w"] for r in rows) / len(rows)
        # uniform mean is 3.0; A-ES must pull the sampled mean up
        assert mean_w > 3.2

    def test_plans_take_ordered_and_validates(self, spark, weighted):
        from context_aware_rag_spark.operators.sampling import (
            weighted_sample,
        )

        plan = (
            weighted_sample(weighted, k=10, weight_col="w")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        with pytest.raises(ValueError, match="k must be"):
            weighted_sample(weighted, k=0, weight_col="w")
        with pytest.raises(ValueError, match="_key"):
            weighted_sample(
                weighted.withColumn("_key", F.lit(1)), k=1, weight_col="w"
            )
