"""SFT pair assembly: hand fixtures for run/boundary/context
semantics + bit-exact pure-Python corpus parity."""

import pytest

from context_aware_rag_spark.operators import sftpairs
from context_aware_rag_spark.oracle.precompute import sft_pairs_py
from context_aware_rag_spark.sources.transcripts import generate_transcripts


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def _collect(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "conv_id", "pair_id", "prev_role", "prompt",
            "n_context_turns", "response", "n_response_turns",
        ).collect()
    )


class TestRunSemantics:
    def test_basic_pair(self, spark):
        rows = [
            ("c", 0, "user", "hi"),
            ("c", 1, "assistant", "hello"),
        ]
        got = _collect(sftpairs.sft_pairs(_df(spark, rows)))
        assert got == [("c", 1, "user", "user: hi", 1, "hello", 1)]

    def test_consecutive_assistant_turns_merge(self, spark):
        rows = [
            ("c", 0, "user", "q"),
            ("c", 1, "assistant", "part one"),
            ("c", 2, "assistant", "part two"),
        ]
        got = _collect(sftpairs.sft_pairs(_df(spark, rows)))
        assert got == [
            ("c", 1, "user", "user: q", 1, "part one\npart two", 2)
        ]

    def test_tool_turn_breaks_the_run(self, spark):
        # assistant / tool / assistant = TWO pairs; the second
        # conditions on the tool result (prev_role='tool')
        rows = [
            ("c", 0, "user", "q"),
            ("c", 1, "assistant", "let me check"),
            ("c", 2, "tool", "result=42"),
            ("c", 3, "assistant", "it is 42"),
        ]
        got = _collect(sftpairs.sft_pairs(_df(spark, rows), context_turns=2))
        assert len(got) == 2
        assert got[0] == ("c", 1, "user", "user: q", 1, "let me check", 1)
        assert got[1] == (
            "c", 3, "tool",
            "assistant: let me check\ntool: result=42", 2, "it is 42", 1,
        )

    def test_conversation_opening_run_has_null_prompt(self, spark):
        rows = [
            ("c", 0, "assistant", "welcome"),
            ("c", 1, "user", "hi"),
        ]
        got = _collect(sftpairs.sft_pairs(_df(spark, rows)))
        assert got == [("c", 0, None, None, 0, "welcome", 1)]

    def test_context_window_clips(self, spark):
        rows = [("c", i, "user", f"u{i}") for i in range(5)] + [
            ("c", 5, "assistant", "a")
        ]
        got = _collect(sftpairs.sft_pairs(_df(spark, rows), context_turns=2))
        assert got == [
            ("c", 5, "user", "user: u3\nuser: u4", 2, "a", 1)
        ]

    def test_conversations_isolated(self, spark):
        rows = [
            ("c1", 0, "user", "q1"),
            ("c2", 0, "assistant", "a2"),  # c1's turn must not leak in
        ]
        got = _collect(sftpairs.sft_pairs(_df(spark, rows)))
        assert got == [("c2", 0, None, None, 0, "a2", 1)]

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="context_turns"):
            sftpairs.sft_pairs(_df(spark, [("c", 0, "user", "x")]),
                               context_turns=0)


class TestTwinParity:
    def test_bit_exact_on_transcript_corpus(self, spark):
        df = generate_transcripts(spark, 10)
        got = _collect(sftpairs.sft_pairs(df, context_turns=3))
        exp = sft_pairs_py(
            [
                (r["conv_id"], r["turn_idx"], r["role"], r["text"])
                for r in df.select(
                    "conv_id", "turn_idx", "role", "text"
                ).collect()
            ],
            context_turns=3,
        )
        assert got == [tuple(e) for e in exp]
