"""Deterministic recursive character text splitter (pure function).

Re-implements the public langchain-text-splitters
``RecursiveCharacterTextSplitter`` merge/overlap algorithm so chunk
text — and therefore chunk ids, which hash chunk text — is
byte-identical to the reference pipeline's splitter output.

Reference usage: /root/reference/src/vss_ctx_rag/functions/rag/
graph_rag/ingestion/base.py:153-161 (separators ["\\n\\n", "\\n"],
chunk_size=500, chunk_overlap=10, i.e. langchain defaults
keep_separator=True, strip_whitespace=True, length_function=len).

This is a pure function of the text: it is called identically from the
Spark pandas UDF (operators/chunking.py) and the pure-Python
reference-semantics oracle (oracle/reference_oracle.py), so any
chunking drift shows up as a unit-test failure, not a parity gap.
"""

from __future__ import annotations

import re
from typing import List, Sequence

DEFAULT_SEPARATORS = ("\n\n", "\n")
DEFAULT_CHUNK_SIZE = 500
DEFAULT_CHUNK_OVERLAP = 10


def _split_text_with_regex(text: str, separator: str, keep_separator: bool) -> List[str]:
    if separator:
        if keep_separator:
            # Parentheses in the pattern keep the delimiters in the result.
            _splits = re.split(f"({re.escape(separator)})", text)
            splits = [_splits[i] + _splits[i + 1] for i in range(1, len(_splits), 2)]
            if len(_splits) % 2 == 0:
                splits += _splits[-1:]
            splits = [_splits[0]] + splits
        else:
            splits = re.split(re.escape(separator), text)
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


class RecursiveCharacterSplitter:
    """Pure-Python splitter matching langchain-text-splitters semantics."""

    def __init__(
        self,
        separators: Sequence[str] = DEFAULT_SEPARATORS,
        chunk_size: int = DEFAULT_CHUNK_SIZE,
        chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
        keep_separator: bool = True,
        strip_whitespace: bool = True,
    ) -> None:
        if chunk_overlap > chunk_size:
            raise ValueError("chunk_overlap must be <= chunk_size")
        self._separators = list(separators)
        self._chunk_size = chunk_size
        self._chunk_overlap = chunk_overlap
        self._keep_separator = keep_separator
        self._strip_whitespace = strip_whitespace

    # -- merge machinery (TextSplitter._merge_splits semantics) ----------

    def _join_docs(self, docs: List[str], separator: str) -> str | None:
        text = separator.join(docs)
        if self._strip_whitespace:
            text = text.strip()
        return text if text else None

    def _merge_splits(self, splits: Sequence[str], separator: str) -> List[str]:
        separator_len = len(separator)
        docs: List[str] = []
        current_doc: List[str] = []
        total = 0
        for d in splits:
            _len = len(d)
            if total + _len + (separator_len if current_doc else 0) > self._chunk_size:
                if current_doc:
                    doc = self._join_docs(current_doc, separator)
                    if doc is not None:
                        docs.append(doc)
                    # Pop from the front until within overlap budget.
                    while total > self._chunk_overlap or (
                        total + _len + (separator_len if current_doc else 0)
                        > self._chunk_size
                        and total > 0
                    ):
                        total -= len(current_doc[0]) + (
                            separator_len if len(current_doc) > 1 else 0
                        )
                        current_doc = current_doc[1:]
            current_doc.append(d)
            total += _len + (separator_len if len(current_doc) > 1 else 0)
        doc = self._join_docs(current_doc, separator)
        if doc is not None:
            docs.append(doc)
        return docs

    # -- recursive split --------------------------------------------------

    def _split_text(self, text: str, separators: Sequence[str]) -> List[str]:
        final_chunks: List[str] = []
        separator = separators[-1]
        new_separators: Sequence[str] = []
        for i, _s in enumerate(separators):
            if _s == "":
                separator = _s
                break
            if re.search(re.escape(_s), text):
                separator = _s
                new_separators = separators[i + 1 :]
                break
        splits = _split_text_with_regex(text, separator, self._keep_separator)
        good_splits: List[str] = []
        merge_sep = "" if self._keep_separator else separator
        for s in splits:
            if len(s) < self._chunk_size:
                good_splits.append(s)
            else:
                if good_splits:
                    final_chunks.extend(self._merge_splits(good_splits, merge_sep))
                    good_splits = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(self._split_text(s, new_separators))
        if good_splits:
            final_chunks.extend(self._merge_splits(good_splits, merge_sep))
        return final_chunks

    def split_text(self, text: str) -> List[str]:
        return self._split_text(text, self._separators)


def split_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separators: Sequence[str] = DEFAULT_SEPARATORS,
) -> List[str]:
    """Split ``text`` into chunks; module-level convenience wrapper."""
    return RecursiveCharacterSplitter(
        separators=separators, chunk_size=chunk_size, chunk_overlap=chunk_overlap
    ).split_text(text)
