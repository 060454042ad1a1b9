"""Pure-Python XXH64 — independent re-implementation of the public
xxHash64 algorithm (Yann Collet, public spec at
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md), used by
the reference-semantics oracle to recompute Spark's ``xxhash64``
expression outputs (MinHash signatures, SimHash fingerprints, LSH band
hashes) without touching Spark — so the precomputed oracle parquet the
driver checks against is produced by a genuinely independent code path.

Spark semantics replicated here (sql/catalyst XxHash64 expression):

- default seed 42;
- ``xxhash64(a, b, ...)`` folds left: the running hash seeds the next
  argument's hash;
- string arguments hash their UTF-8 bytes with the streaming XXH64;
- integer/long arguments hash as a single 8-byte long block
  (``hashLong``) — Spark promotes int to long first.

Everything is validated against Spark's own outputs in
tests/test_xxh64.py (property sweep over lengths 0..100 and seeds).
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * P2) & MASK, 31) * P1) & MASK


def _merge_round(h: int, acc: int) -> int:
    return ((h ^ _round(0, acc)) * P1 + P4) & MASK


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed`` (returns unsigned 64-bit)."""
    seed &= MASK
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + P1 + P2) & MASK
        a2 = (seed + P2) & MASK
        a3 = seed
        a4 = (seed - P1) & MASK
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & MASK
        for acc in (a1, a2, a3, a4):
            h = _merge_round(h, acc)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _avalanche(h)


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark's hashLong: one 8-byte block + avalanche (an int/long
    argument is NOT byte-streamed — it goes through the long fast
    path)."""
    seed &= MASK
    h = (seed + P5 + 8) & MASK
    h ^= _round(0, value & MASK)
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _avalanche(h)


def xxh64_int(value: int, seed: int = 42) -> int:
    """Spark's hashInt: an INTEGER argument goes through the 4-byte
    tail path (seed+P5+4, uint32*P1 mix), NOT the long block — e.g. the
    seed elements of ``sequence(0, 63)`` in MinHash are IntegerType and
    hash differently from longs."""
    seed &= MASK
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _avalanche(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark ``xxhash64(string_col)`` (signed 64-bit, like Spark)."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, k: int, seed: int = 42) -> int:
    """Spark ``xxhash64(string_col, int_col)``: left fold — the string's
    hash seeds the int's 4-byte-path hash."""
    h = xxh64(s.encode("utf-8"), seed)
    return _to_signed(xxh64_int(k, h))


def spark_xxhash64_str_long(s: str, k: int, seed: int = 42) -> int:
    """Spark ``xxhash64(string_col, long_col)`` (8-byte block path)."""
    h = xxh64(s.encode("utf-8"), seed)
    return _to_signed(xxh64_long(k, h))
