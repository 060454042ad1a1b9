"""Snapshot store: upsert/delete resolution, time travel, compaction
invariance, vacuum safety, duplicate-key rejection."""

import pytest

from context_aware_rag_spark.sources import snapstore


def _df(spark, rows):
    return spark.createDataFrame(rows, "k: long, v: string")


def _state(spark, base, as_of=None):
    return sorted(
        (r.k, r.v)
        for r in snapstore.read_state(spark, base, ["k"], as_of=as_of).collect()
    )


class TestSnapstore:
    def test_upsert_override_delete_resurrect(self, spark, tmp_path):
        base = str(tmp_path / "t")
        c0 = snapstore.commit_upsert(
            spark, base, _df(spark, [(1, "a"), (2, "b")]), ["k"]
        )
        c1 = snapstore.commit_upsert(
            spark, base, _df(spark, [(2, "B"), (3, "c")]), ["k"]
        )
        assert (c0, c1) == (0, 1)
        assert _state(spark, base) == [(1, "a"), (2, "B"), (3, "c")]
        snapstore.commit_delete(
            spark, base, _df(spark, [(1, "x")]).select("k"), ["k"]
        )
        assert _state(spark, base) == [(2, "B"), (3, "c")]
        snapstore.commit_upsert(spark, base, _df(spark, [(1, "a2")]), ["k"])
        assert _state(spark, base) == [(1, "a2"), (2, "B"), (3, "c")]

    def test_time_travel(self, spark, tmp_path):
        base = str(tmp_path / "t")
        snapstore.commit_upsert(spark, base, _df(spark, [(1, "a")]), ["k"])
        snapstore.commit_upsert(spark, base, _df(spark, [(1, "b")]), ["k"])
        snapstore.commit_delete(
            spark, base, _df(spark, [(1, "?")]).select("k"), ["k"]
        )
        assert _state(spark, base, as_of=0) == [(1, "a")]
        assert _state(spark, base, as_of=1) == [(1, "b")]
        assert _state(spark, base, as_of=2) == []

    def test_compact_and_vacuum_invariant(self, spark, tmp_path):
        base = str(tmp_path / "t")
        snapstore.commit_upsert(
            spark, base, _df(spark, [(i, f"v{i}") for i in range(20)]), ["k"]
        )
        snapstore.commit_upsert(
            spark, base, _df(spark, [(5, "V5"), (99, "new")]), ["k"]
        )
        snapstore.commit_delete(
            spark, base, _df(spark, [(7, "?")]).select("k"), ["k"]
        )
        before = _state(spark, base)
        ck = snapstore.compact(spark, base, ["k"])
        assert ck == 2
        assert _state(spark, base) == before
        # a post-checkpoint commit replays only the tail
        snapstore.commit_upsert(spark, base, _df(spark, [(0, "V0")]), ["k"])
        after = _state(spark, base)
        assert (0, "V0") in after
        removed = snapstore.vacuum(spark, base)
        assert removed == [0, 1]  # covered by ckpt=2; delta=2 kept
        assert _state(spark, base) == after  # state-invariant
        # commit numbering survives the vacuum
        c = snapstore.commit_upsert(spark, base, _df(spark, [(50, "z")]), ["k"])
        assert c == 4

    def test_duplicate_keys_in_one_commit_rejected(self, spark, tmp_path):
        base = str(tmp_path / "t")
        with pytest.raises(ValueError, match="duplicate keys"):
            snapstore.commit_upsert(
                spark, base, _df(spark, [(1, "a"), (1, "b")]), ["k"]
            )

    def test_empty_store_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            snapstore.read_state(spark, str(tmp_path / "none"), ["k"])
