"""Pure-Python replica of Spark's ``xxhash64`` expression for the fixed-size
int/long fast paths.

Spark evaluates ``xxhash64(c1, c2, ...)`` by folding: ``h = 42`` (the
default seed), then for each non-null child ``h = XXH64(child, seed=h)``
using the type-specialized one-shot hashers (XXH64.hashInt / hashLong in
Spark's unsafe hash module). Replicating it here lets driver-side oracle
builders reproduce the package's deterministic hash-ordered samples
(IVF/PQ/k-means codebook fits all order by ``xxhash64(id, lit(seed))``)
without a Spark session. Verified bit-for-bit against ``F.xxhash64`` in
tests/test_operators.py.
"""
from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 one-shot over an 8-byte long — Spark's hashLong."""
    h = (seed + _P5 + 8) & _M64
    k = _rotl((value & _M64) * _P2 & _M64, 31) * _P1 & _M64
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 one-shot over a 4-byte int — Spark's hashInt."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_long_intlit(value: int, lit: int) -> int:
    """``F.xxhash64(F.col(long_col), F.lit(int))`` as a signed 64-bit int —
    the exact shape the package's deterministic samplers use."""
    h = xxh64_long(value, 42)
    return _signed(xxh64_int(lit, h))
