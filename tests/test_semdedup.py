"""SemDeDup cluster-then-prune semantic dedup (operators/semdedup.py)."""

import numpy as np
import pytest

from context_aware_rag_spark.operators import semdedup
from context_aware_rag_spark.oracle import precompute


def _planted_vectors(dim=16, n_background=40, seed=7):
    """Background vectors plus two planted near-dup families."""
    rng = np.random.default_rng(seed)
    vecs = []
    for i in range(n_background):
        v = rng.normal(size=dim)
        vecs.append((i, (v / np.linalg.norm(v)).astype(np.float32)))
    # family A: three tiny perturbations of one direction
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    for j, eps in enumerate((0.0, 0.01, 0.02)):
        v = base + eps * rng.normal(size=dim)
        vecs.append((100 + j, (v / np.linalg.norm(v)).astype(np.float32)))
    # family B: an exact pair
    b = rng.normal(size=dim)
    b /= np.linalg.norm(b)
    vecs.append((200, b.astype(np.float32)))
    vecs.append((201, b.astype(np.float32)))
    return [(i, [float(x) for x in v]) for i, v in vecs]


@pytest.fixture(scope="module")
def planted(spark):
    rows = _planted_vectors()
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    out = semdedup.semantic_dedup(df, threshold=0.95, n_clusters=4).collect()
    return rows, out


def test_matches_pure_python_oracle(planted):
    rows, out = planted
    got = sorted((r.vec_id, r.cluster_id, r.family_id, r.keep) for r in out)
    want = precompute.semantic_dedup_py(rows, threshold=0.95, n_clusters=4)
    assert got == want


def test_planted_families_merge_and_prune(planted):
    _, out = planted
    by_id = {r.vec_id: r for r in out}
    # family A members share one family (clusters see cosine ~0.999)
    fam_a = {by_id[i].family_id for i in (100, 101, 102)}
    assert fam_a == {100}
    assert sum(by_id[i].keep for i in (100, 101, 102)) == 1
    # the exact pair collapses to one keeper
    assert by_id[200].family_id == by_id[201].family_id == 200
    assert sum(by_id[i].keep for i in (200, 201)) == 1


def test_invariants(planted):
    _, out = planted
    # exactly one keeper per family, family id = min member id
    fams = {}
    for r in out:
        fams.setdefault((r.cluster_id, r.family_id), []).append(r)
    for (cid, fid), members in fams.items():
        assert sum(m.keep for m in members) == 1
        assert fid == min(m.vec_id for m in members)
    # every vector labeled exactly once
    assert len({r.vec_id for r in out}) == len(out)


def test_non_integral_id_fails_loudly(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    with pytest.raises(ValueError, match="integral id"):
        semdedup.semantic_dedup(df, threshold=0.9, n_clusters=2)
