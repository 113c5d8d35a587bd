"""Pure-Python XXH64 — must bit-match Spark's ``F.xxhash64`` (seed 42).

Spark's ``xxhash64(col)`` hashes a string column's UTF-8 bytes with the
standard XXH64 algorithm, default seed 42 (``org.apache.spark.sql.catalyst.
expressions.XxHash64``).  The crawl engine's ``urlhash48`` is defined
(BASELINE.json north_star) as ``xxhash64(canonical_url) & ((1<<48)-1)``;
the pure-Python oracle simulator (tests/oracle_sim.py) must produce the
same value as the Spark pipeline, hence this implementation.  Parity is
asserted in tests/test_urls.py against a live SparkSession.

Public-spec algorithm (Yann Collet's xxHash, BSD).  Reference semantics:
Gigablast computes urlHash48 by masking its own 64-bit polynomial hash
(hash.cpp::hash64, Spiderdb::getUrlHash48 [U]); the graft spec pins
xxhash64 instead (BASELINE.json:6), so we do NOT replicate hash.cpp.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42
URLHASH48_MASK = (1 << 48) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 of ``data``; returns unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 as signed 64-bit — the value Spark's ``xxhash64`` returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def urlhash48(url: str) -> int:
    """48-bit URL hash: ``xxhash64(utf8(url), seed=42) & ((1<<48)-1)``.

    Equals the Spark-side ``F.xxhash64(url).bitwiseAND(lit((1<<48)-1))``
    (mask of a signed long keeps the low 48 bits → always non-negative).
    """
    return xxh64(url.encode("utf-8")) & URLHASH48_MASK
