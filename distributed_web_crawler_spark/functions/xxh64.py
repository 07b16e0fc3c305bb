"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42) on strings.

The fixture rules in FIXTURES.md are all expressed as
``xxhash64(f"{SEED}:...") % m``.  The Spark engine computes url hashes
JVM-side with the built-in ``F.xxhash64`` (Catalyst expression ``XxHash64``,
a faithful port of the public XXH64 algorithm — Spark validates it against
the official test vectors in its own XXH64Suite), while the pure-Python
oracle crawler and the corpus generator use this implementation.  A parity
test (tests/test_xxh64.py) asserts both sides agree bit-for-bit.

Algorithm: the public xxHash specification (Yann Collet, BSD-2), 64-bit
variant. Spark hashes a string column as its UTF-8 bytes with seed 42.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # Spark's default seed for xxhash64


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * P1 + P4) & MASK64


def xxh64(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` (str is UTF-8 encoded), unsigned 64-bit."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """Same as :func:`xxh64` but as Java signed long, matching the value
    Spark's ``F.xxhash64`` column returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_u8mat(mat, seed: int = SPARK_SEED):
    """XXH64 of every ROW of a fixed-width uint8 matrix, vectorized.

    All rows share the same byte length (``mat.shape[1]``) so every row
    follows the identical chunk path and the whole batch reduces to a
    handful of numpy uint64 passes — callers with variable-length keys
    group rows by length first (fixtures.corpus._hash_keyed_batch). Bit-
    identical to :func:`xxh64` (parity-tested in tests/test_xxh64.py);
    this is what lets the extract stage hash ~12 keys/page without ~100
    interpreted ops per byte."""
    import numpy as np

    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    nrows, n = mat.shape
    u = np.uint64
    p1, p2, p3, p4, p5 = u(P1), u(P2), u(P3), u(P4), u(P5)

    def rotl(x, r):
        return (x << u(r)) | (x >> u(64 - r))

    def rnd(acc, lane):
        return rotl(acc + lane * p2, 31) * p1

    def w8(i):
        return mat[:, i : i + 8].copy().view("<u8").ravel()

    i = 0
    if n >= 32:
        v1 = np.full(nrows, (seed + P1 + P2) & MASK64, u)
        v2 = np.full(nrows, (seed + P2) & MASK64, u)
        v3 = np.full(nrows, seed & MASK64, u)
        v4 = np.full(nrows, (seed - P1) & MASK64, u)
        while i + 32 <= n:
            v1 = rnd(v1, w8(i))
            v2 = rnd(v2, w8(i + 8))
            v3 = rnd(v3, w8(i + 16))
            v4 = rnd(v4, w8(i + 24))
            i += 32
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ rnd(np.uint64(0), v)) * p1 + p4
    else:
        h = np.full(nrows, (seed + P5) & MASK64, u)
    h = h + u(n)
    while i + 8 <= n:
        h = (rotl(h ^ rnd(np.uint64(0), w8(i)), 27)) * p1 + p4
        i += 8
    if i + 4 <= n:
        w4 = mat[:, i : i + 4].copy().view("<u4").ravel().astype(u)
        h = rotl(h ^ (w4 * p1), 23) * p2 + p3
        i += 4
    while i < n:
        h = rotl(h ^ (mat[:, i].astype(u) * p5), 11) * p1
        i += 1
    h ^= h >> u(33)
    h *= p2
    h ^= h >> u(29)
    h *= p3
    h ^= h >> u(32)
    return h
