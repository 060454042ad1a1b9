"""TextTiling topic segmentation: planted-boundary fixtures + a
pure-Python bit-exact twin over the deterministic transcript corpus."""

import pytest

from context_aware_rag_spark.operators import segmentation
from context_aware_rag_spark.oracle.precompute import texttiling_py
from context_aware_rag_spark.sources.transcripts import generate_rows


# ------------------------------------------------------------- fixtures

TOPIC_A = "the database index scan uses the btree pages for lookups"
TOPIC_B = "our holiday trip visits sunny beaches with warm ocean waves"


def _conv(spark, texts, conv_id="c0"):
    return spark.createDataFrame(
        [(conv_id, i, t) for i, t in enumerate(texts)],
        "conv_id: string, turn_idx: int, text: string",
    )


class TestPlantedBoundaries:
    def test_topic_shift_is_the_unique_boundary(self, spark):
        texts = [TOPIC_A] * 4 + [TOPIC_B] * 4
        got = {
            r.gap_after: r
            for r in segmentation.texttiling_gaps(
                _conv(spark, texts)
            ).collect()
        }
        assert len(got) == 7  # one row per turn with a successor
        boundaries = [g for g, r in got.items() if r.is_boundary]
        assert boundaries == [3]  # the A->B shift, nothing else
        assert got[3].score_ppm == 0  # disjoint vocab across the gap
        # same-topic gap whose blocks stay inside topic A -> 1e6 ppm
        assert got[0].score_ppm == 1_000_000

    def test_uniform_topic_has_no_boundary(self, spark):
        got = segmentation.texttiling_gaps(
            _conv(spark, [TOPIC_A] * 6)
        ).collect()
        assert len(got) == 5
        assert not any(r.is_boundary for r in got)
        assert all(r.depth_ppm == 0 for r in got)

    def test_empty_turns_score_null_not_zero(self, spark):
        got = {
            r.gap_after: r
            for r in segmentation.texttiling_gaps(
                _conv(spark, ["", "", ""]), block_turns=1
            ).collect()
        }
        assert got[0].score_ppm is None
        assert got[0].depth_ppm is None
        assert got[0].is_boundary is False

    def test_segments_count_prior_boundaries(self, spark):
        texts = [TOPIC_A] * 3 + [TOPIC_B] * 3 + [TOPIC_A] * 3
        seg = {
            r.turn_idx: r.seg_idx
            for r in segmentation.texttiling_segments(
                _conv(spark, texts)
            ).collect()
        }
        gaps = {
            r.gap_after: r.is_boundary
            for r in segmentation.texttiling_gaps(
                _conv(spark, texts)
            ).collect()
        }
        assert len(seg) == 9  # every turn kept, incl. the last
        for i in range(9):
            assert seg[i] == sum(
                1 for g, b in gaps.items() if b and g < i
            )
        assert seg[0] == 0 and seg[8] == max(seg.values())

    def test_validation(self, spark):
        df = _conv(spark, [TOPIC_A, TOPIC_B])
        with pytest.raises(ValueError):
            segmentation.texttiling_gaps(df, block_turns=0)
        with pytest.raises(ValueError):
            segmentation.texttiling_gaps(df, depth_window=0)
        with pytest.raises(ValueError):
            segmentation.texttiling_gaps(df, cutoff_ppm=3_000_000)


class TestTwinParity:
    def test_bit_exact_on_transcript_corpus(self, spark):
        rows = generate_rows(8)
        want = texttiling_py(
            [(c, t, txt) for c, t, _r, txt, _tool, _ts in rows]
        )
        df = spark.createDataFrame(
            [(c, t, txt) for c, t, _r, txt, _tool, _ts in rows],
            "conv_id: string, turn_idx: int, text: string",
        )
        got = sorted(
            (r.conv_id, r.gap_after, r.score_ppm, r.depth_ppm,
             r.is_boundary)
            for r in segmentation.texttiling_gaps(df).collect()
        )
        assert got == want
        assert any(r[4] for r in got)  # corpus has real boundaries


class TestPlanShape:
    def test_single_exchange_for_gaps_and_segments(self, spark):
        # the whole point of the full-width scorer: gap scoring AND
        # segment assignment are one conv-keyed shuffle each, no join
        df = generate_transcripts_df(spark)
        for op in (segmentation.texttiling_gaps,
                   segmentation.texttiling_segments):
            plan = op(df)._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 1, plan
            assert "SortMergeJoin" not in plan and "HashJoin" not in plan


def generate_transcripts_df(spark):
    from context_aware_rag_spark.sources.transcripts import (
        generate_transcripts,
    )

    return generate_transcripts(spark, 4)


class TestTopicChunks:
    def test_planted_shift_yields_two_chunks(self, spark):
        texts = [TOPIC_A] * 6 + [TOPIC_B] * 6
        df = _conv(spark, texts)
        rows = sorted(
            (r.seg_idx, r.first_turn, r.last_turn, r.n_turns)
            for r in segmentation.topic_chunks(df).collect()
        )
        assert len(rows) == 2
        assert rows[0][1] == 0 and rows[1][2] == 11
        assert rows[0][3] + rows[1][3] == 12

    def test_chunk_id_rule(self, spark):
        import hashlib

        df = _conv(spark, [TOPIC_A, TOPIC_A])
        r = segmentation.topic_chunks(df).collect()[0]
        want = hashlib.sha1(
            (r.chunk_text + r.conv_id).encode()
        ).hexdigest()
        assert r.chunk_id == want
        assert r.chunk_text == TOPIC_A + "\n" + TOPIC_A

    def test_corpus_parity(self, spark):
        from context_aware_rag_spark.oracle.precompute import (
            topic_chunks_table,
        )

        df = generate_transcripts_df(spark)
        got = sorted(
            tuple(r) for r in segmentation.topic_chunks(df).collect()
        )
        assert got == [tuple(e) for e in topic_chunks_table(4)]

    def test_single_exchange(self, spark):
        df = generate_transcripts_df(spark)
        plan = (
            segmentation.topic_chunks(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, plan
