"""Theta (KMV) distinct-count sketches for Iceberg statistics files.

NEW r13: the write side of the spec's statistics-file story — the
``apache-datasketches-theta-v1`` blob type Iceberg's ``ndv`` table
statistics use (the reference models the metadata shape in
rest_catalog/objects/statistics_file.cpp but never WRITES statistics;
expire_snapshots here already removes them).

The sketch is the classic k-minimum-values estimator the DataSketches
theta family implements, serialized per the PUBLISHED compact-theta
layout (serial version 3, family COMPACT=3; preamble 1/2/3 longs for
empty/exact/estimation), hashing with MurmurHash3 x64_128 at the
DataSketches default seed 9001 and keeping ``hash >>> 1`` like the Java
library so values stay in [1, 2^63). Within this engine the write/read
pair is exact and estimation is deterministic; byte-level Java interop
follows the published format but is best-effort: re-probed 2026-08-17
(r15) — no ``datasketches`` Python package, no Java datasketches jar,
duckdb 1.0.0 exposes no sketch functions, and the container has no
network to fetch the published binary test vectors, so no independent
byte oracle exists here. In its place tests/test_statistics.py pins
BYTE-EXACT frozen goldens of this layout (empty/exact/estimation
preambles, flags, seed-hash, hash payloads), so any layout drift fails
loudly instead of silently breaking foreign readers; swap the goldens
for the published vectors the first time a cross-check lands.

Distributed build shape (100 TB): each partition keeps only its k
smallest distinct hashes (``partition_candidates``), the driver merges
k-bounded candidate sets (``merge_candidates``) — no global distinct
shuffle, O(k * partitions) driver bytes.
"""

from __future__ import annotations

import struct

import numpy as np

DEFAULT_SEED = 9001
DEFAULT_K = 4096  # lgK = 12, the DataSketches default nominal entries
_THETA_MAX = np.uint64(1) << np.uint64(63)  # hashes live in [1, 2^63)

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xFF51AFD7ED558CCD)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xC4CEB9FE1A85EC53)
    k ^= k >> np.uint64(33)
    return k


def murmur3_x64_128_h1(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """First 64 bits of MurmurHash3 x64_128 (the DataSketches hash).
    Scalar reference implementation; the vectorized batch path below is
    the hot one."""
    with np.errstate(over="ignore"):
        h1 = np.uint64(seed)
        h2 = np.uint64(seed)
        n = len(data)
        nblocks = n // 16
        for i in range(nblocks):
            k1, k2 = struct.unpack_from("<QQ", data, i * 16)
            k1, k2 = np.uint64(k1), np.uint64(k2)
            k1 *= _C1
            k1 = _rotl64(k1, 31)
            k1 *= _C2
            h1 ^= k1
            h1 = _rotl64(h1, 27)
            h1 += h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 *= _C2
            k2 = _rotl64(k2, 33)
            k2 *= _C1
            h2 ^= k2
            h2 = _rotl64(h2, 31)
            h2 += h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)
        tail = data[nblocks * 16:]
        k1 = np.uint64(0)
        k2 = np.uint64(0)
        if len(tail) > 8:
            k2 = np.uint64(int.from_bytes(tail[8:].ljust(8, b"\0"),
                                          "little"))
            k2 *= _C2
            k2 = _rotl64(k2, 33)
            k2 *= _C1
            h2 ^= k2
        if tail:
            k1 = np.uint64(int.from_bytes(tail[:8].ljust(8, b"\0"),
                                          "little"))
            k1 *= _C1
            k1 = _rotl64(k1, 31)
            k1 *= _C2
            h1 ^= k1
        h1 ^= np.uint64(n)
        h2 ^= np.uint64(n)
        h1 += h2
        h2 += h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 += h2
        return int(h1)


def value_hashes(values, seed: int = DEFAULT_SEED) -> np.ndarray:
    """``hash >>> 1`` per distinct encoded value — the sketch-domain
    hashes. ``values`` is an iterable of python values; encoding:
    str → UTF-8 bytes, bytes → as-is, bool → b'\\x01'/b'\\x00',
    int → 8-byte little-endian (the Java long[] memory layout),
    float → its IEEE-754 8-byte LE image. Zero hashes are remapped to 1
    (DataSketches excludes 0 from the domain)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if isinstance(v, str):
            b = v.encode("utf-8")
        elif isinstance(v, (bytes, bytearray)):
            b = bytes(v)
        elif isinstance(v, bool):
            b = b"\x01" if v else b"\x00"
        elif isinstance(v, (int, np.integer)):
            b = int(v).to_bytes(8, "little", signed=True)
        elif isinstance(v, float):
            b = struct.pack("<d", v)
        else:
            b = str(v).encode("utf-8")
        out[i] = murmur3_x64_128_h1(b, seed)
    out >>= np.uint64(1)
    out[out == 0] = 1
    return out


def partition_candidates(values, k: int = DEFAULT_K,
                         seed: int = DEFAULT_SEED) -> np.ndarray:
    """One partition's contribution: the k+1 smallest DISTINCT sketch
    hashes of its values (k retained + the one that becomes theta —
    every member of the GLOBAL k+1 smallest is among its own
    partition's k+1 smallest, so the merge is lossless). Bounded output
    regardless of partition size — the executor-side half of the
    distributed build."""
    h = np.unique(value_hashes(values, seed))
    return h[:k + 1] if len(h) > k + 1 else h


def merge_candidates(parts: list[np.ndarray], k: int = DEFAULT_K) -> np.ndarray:
    """Driver-side merge of per-partition candidate sets → the global
    k+1 smallest distinct hashes; feeding them to ThetaSketch yields the
    same sketch a single-pass build produces."""
    if not parts:
        return np.empty(0, dtype=np.uint64)
    h = np.unique(np.concatenate(parts))
    return h[:k + 1] if len(h) > k + 1 else h


class ThetaSketch:
    """A compact theta sketch: retained sorted hashes + theta."""

    def __init__(self, hashes: np.ndarray, k: int = DEFAULT_K,
                 seed: int = DEFAULT_SEED):
        hashes = np.unique(np.asarray(hashes, dtype=np.uint64))
        if len(hashes) > k:
            # estimation mode: theta = the (k+1)-th smallest hash, keep k
            self.theta = int(hashes[k])
            self.hashes = hashes[:k]
        else:
            self.theta = int(_THETA_MAX)
            self.hashes = hashes
        self.k = k
        self.seed = seed

    @property
    def is_estimation(self) -> bool:
        return self.theta != int(_THETA_MAX)

    def estimate(self) -> float:
        """Exact count below k distincts; KMV estimate above
        (retained / (theta / 2^63))."""
        if not self.is_estimation:
            return float(len(self.hashes))
        return len(self.hashes) * float(_THETA_MAX) / float(self.theta)

    @classmethod
    def union(cls, sketches: "list[ThetaSketch]",
              k: int = DEFAULT_K) -> "ThetaSketch":
        """Theta union — the property that makes incremental statistics
        possible: theta = min over inputs, retained = the surviving
        hashes below it (re-capped at k). Duplicate-insensitive: the
        same value sketched twice contributes one hash, so re-sketching
        compacted (rewritten-but-identical) rows is harmless."""
        if not sketches:
            return cls(np.empty(0, dtype=np.uint64), k=k)
        theta = min(int(s.theta) for s in sketches)
        hashes = np.unique(np.concatenate(
            [s.hashes for s in sketches]).astype(np.uint64))
        hashes = hashes[hashes < np.uint64(theta)]
        out = cls(np.empty(0, dtype=np.uint64), k=k)
        if len(hashes) > k:
            out.theta = int(hashes[k])
            out.hashes = hashes[:k]
        else:
            out.theta = theta
            out.hashes = hashes
        return out

    # --- published compact-theta layout (serVer 3, family 3) ----------
    _FLAG_READ_ONLY = 1 << 1
    _FLAG_EMPTY = 1 << 2
    _FLAG_COMPACT = 1 << 3
    _FLAG_ORDERED = 1 << 4

    @staticmethod
    def _seed_hash(seed: int) -> int:
        h = murmur3_x64_128_h1(int(seed).to_bytes(8, "little"), seed=0)
        sh = h & 0xFFFF
        return sh if sh else 1

    def serialize(self) -> bytes:
        flags = (self._FLAG_READ_ONLY | self._FLAG_COMPACT
                 | self._FLAG_ORDERED)
        n = len(self.hashes)
        lg_k = max(int(self.k).bit_length() - 1, 0)
        if n == 0 and not self.is_estimation:
            flags |= self._FLAG_EMPTY
            return struct.pack("<BBBBBBH", 1, 3, 3, lg_k, 0, flags,
                               self._seed_hash(self.seed))
        pre_longs = 3 if self.is_estimation else 2
        out = bytearray(struct.pack(
            "<BBBBBBH", pre_longs, 3, 3, lg_k, 0, flags,
            self._seed_hash(self.seed)))
        out += struct.pack("<if", n, 1.0)  # curCount + sampling p
        if self.is_estimation:
            out += struct.pack("<Q", self.theta)
        out += self.hashes.astype("<u8").tobytes()
        return bytes(out)

    @classmethod
    def deserialize(cls, blob: bytes, k: int = DEFAULT_K,
                    seed: int = DEFAULT_SEED) -> "ThetaSketch":
        pre_longs, ser_ver, family = blob[0], blob[1], blob[2]
        if ser_ver != 3 or family != 3:
            raise ValueError(
                f"unsupported theta sketch (serVer={ser_ver}, "
                f"family={family}); only compact serVer 3 is readable")
        # a sketch built with a different seed hashes the same values to
        # different points — unioning it in would yield silently wrong
        # NDV, so validate the stored seed-hash like the Java library
        # (ADVICE r13); likewise honour the blob's recorded lgK rather
        # than trusting the caller's k
        (stored_sh,) = struct.unpack_from("<H", blob, 6)
        expect_sh = cls._seed_hash(seed)
        if stored_sh == 0:
            # DataSketches seed hashes are never 0 (the library maps a
            # zero hash to a throw; ours maps it to 1) — a zeroed field
            # means a corrupt/foreign blob, and accepting it would
            # bypass the seed check entirely (ADVICE r14)
            raise ValueError(
                "theta sketch blob has seed-hash 0: corrupt or not a "
                "DataSketches-compatible compact sketch")
        if stored_sh != expect_sh:
            raise ValueError(
                f"theta sketch seed mismatch: blob seed-hash "
                f"{stored_sh:#06x} != {expect_sh:#06x} for seed {seed}; "
                "sketches from different seeds cannot be unioned")
        lg_k = blob[3]
        if lg_k:
            # bound before computing k: a corrupt lgK byte would
            # otherwise yield k up to 2^255 (ADVICE r14). The Java
            # library's range is 4..26 (ThetaUtil.MIN/MAX_LG_NOM_LONGS);
            # we admit 3 because our own exact-mode test sketches
            # serialize k=8
            if not 3 <= lg_k <= 26:
                raise ValueError(
                    f"theta sketch lgK={lg_k} out of the valid range "
                    "3..26: corrupt blob")
            k = 1 << lg_k
        flags = blob[5]
        sk = cls(np.empty(0, dtype=np.uint64), k=k, seed=seed)
        if flags & cls._FLAG_EMPTY or pre_longs == 1:
            return sk
        (n,) = struct.unpack_from("<i", blob, 8)
        pos = 16
        theta = int(_THETA_MAX)
        if pre_longs >= 3:
            (theta,) = struct.unpack_from("<Q", blob, pos)
            pos += 8
        sk.hashes = np.frombuffer(blob, dtype="<u8", count=n,
                                  offset=pos).astype(np.uint64)
        sk.theta = theta
        return sk
