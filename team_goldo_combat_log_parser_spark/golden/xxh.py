"""Pure-Python XXH64 — an independent second implementation of the public
xxHash-64 algorithm (Yann Collet's spec, github.com/Cyan4973/xxHash), used
by the sketch oracles to re-derive Spark's ``xxhash64`` results without
calling Spark.

Spark's ``F.xxhash64`` is standard XXH64 with seed 42; for multi-column
calls it chains: ``h = XXH64(col_n_bytes, seed=h)`` starting from 42, with
strings hashed as UTF-8 bytes and longs as 8 little-endian bytes.
Bit-for-bit parity with Spark (string lengths 0..160 covering every tail
path, longs, and multi-column chaining) is pinned in
tests/test_sketch_oracle.py.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` with ``seed`` (unsigned 64-bit result)."""
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _MASK, (seed + _P2) & _MASK,
             seed, (seed - _P1) & _MASK]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                acc = (v[j] + lane * _P2) & _MASK
                v[j] = (_rotl(acc, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7)
             + _rotl(v[2], 12) + _rotl(v[3], 18)) & _MASK
        for acc in v:
            h ^= (_rotl((acc * _P2) & _MASK, 31) * _P1) & _MASK
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def to_signed(u: int) -> int:
    """Unsigned 64-bit -> the signed long Spark columns carry."""
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed-long parity with ``F.xxhash64(string_col)``."""
    return to_signed(xxh64(s.encode("utf-8"), seed))


def xxh64_long(v: int, seed: int = 42) -> int:
    """Signed-long parity with ``F.xxhash64(long_col)``."""
    return to_signed(xxh64((v & _MASK).to_bytes(8, "little"), seed))


def xxh64_longs(vals, seed: int = 42) -> int:
    """Signed-long parity with multi-column ``F.xxhash64(c0, c1, ...)``:
    each column's hash seeds the next."""
    h = seed
    for v in vals:
        h = xxh64_long(v, h)
    return h
