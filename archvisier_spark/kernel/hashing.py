"""Pure-Python XXH64 — value-compatible with Spark's ``xxhash64``.

XXH64 is a public, spec'd algorithm (Yann Collet, github.com/Cyan4973/
xxHash; the reference spec in doc/xxhash_spec.md); Spark's ``xxhash64``
expression is XXH64 over the value's bytes with seed 42 (strings hash
their UTF-8 bytes, longs their 8 little-endian bytes).  Having the same
function outside the JVM lets oracle generators embed engine-identical
token hashes as SQL literals — pinned against the live Spark expression by
tests/test_kernel_hashing.py.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, struct.unpack_from("<Q", data, i)[0])
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (h ^ (struct.unpack_from("<I", data, i)[0] * _P1)) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (h ^ (data[i] * _P5)) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_string(s: str, seed: int = SPARK_SEED) -> int:
    """Spark's ``F.xxhash64(string_col)``: signed XXH64 of the UTF-8 bytes."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark's ``F.xxhash64(long_col)``: signed XXH64 of the 8 LE bytes."""
    return _to_signed(xxh64(struct.pack("<q", v), seed))
