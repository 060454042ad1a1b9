"""Byte-level BPE tokenizer (pure Python, vendored merges).

A real training-data pipeline keys dedup/length decisions on actual
token counts, not chars/4 (VERDICT.md round-2 item 5). This implements
the standard byte-pair-encoding apply step (Sennrich et al. 2016 /
GPT-2's byte-level variant, re-implemented from the public algorithm):

- pre-tokenize with the engine's BPE_TOKEN_RE (letter runs | digit
  runs | single punctuation — whitespace never tokenizes);
- per piece, start from raw UTF-8 bytes and repeatedly merge the
  adjacent pair with the lowest merge rank until none applies;
- token count = total symbols left.

The merge table is vendored as a generated module
(``bpe_merges.py``, built by tools/gen_bpe_vocab.py from the
deterministic sf0.001 documents corpus) so it ships to executors inside
the package zip like any other code. Callers batch through the Arrow
pandas UDF in operators.textmetrics — never per-row Python on the JVM
path.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

from .bpe_merges import MERGES

# THE canonical pre-tokenizer pattern (letter runs | digit runs |
# single punctuation). Defined here — a pyspark-free module — and
# imported by operators.textmetrics (JVM regexp twin + SQL oracles)
# and tools/gen_bpe_vocab.py, so the three consumers can never drift:
# a desynchronized copy would silently split BPE counts from both the
# regex-token oracle and the vendored merge table.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

_PRETOKEN = re.compile(BPE_TOKEN_RE)

_RANK: Dict[Tuple[bytes, bytes], int] = {
    pair: i for i, pair in enumerate(MERGES)
}


# token-id space: 256 base byte tokens, then one id per merge in rank
# order (GPT-2's byte-level layout, minus the unicode remap)
_VOCAB: Dict[bytes, int] = {bytes([b]): b for b in range(256)}
for _i, (_a, _b) in enumerate(MERGES):
    _VOCAB[_a + _b] = 256 + _i


@lru_cache(maxsize=65536)
def _bpe_word(piece: bytes) -> Tuple[bytes, ...]:
    """The final symbol sequence for one pre-token (bytes)."""
    word: List[bytes] = [piece[i : i + 1] for i in range(len(piece))]
    while len(word) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(word) - 1):
            r = _RANK.get((word[i], word[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (word[i], word[i + 1])
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out: List[bytes] = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and (word[i], word[i + 1]) == best_pair:
                out.append(merged)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return tuple(word)


def bpe_symbols(piece: bytes) -> int:
    """Number of BPE symbols for one pre-token (bytes)."""
    return len(_bpe_word(piece))


def bpe_encode(text: str | None) -> List[int]:
    """Token-id sequence of a document (every symbol a merge product
    or base byte, so encoding never fails)."""
    if not text:
        return []
    ids: List[int] = []
    for p in _PRETOKEN.findall(text):
        ids.extend(_VOCAB[s] for s in _bpe_word(p.encode("utf-8")))
    return ids


def bpe_token_count(text: str | None) -> int:
    """Total BPE tokens of a document."""
    if not text:
        return 0
    return sum(bpe_symbols(p.encode("utf-8")) for p in _PRETOKEN.findall(text))


def bpe_token_counts(texts: Sequence[str | None]) -> List[int]:
    return [bpe_token_count(t) for t in texts]
