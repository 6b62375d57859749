"""Pure-Python replica of Spark's ``xxhash64`` expression.

The engine keys every deterministic batching / sampling decision on
``F.xxhash64(...)`` (minibatch assignment, bounded trainer samples,
probe chunking) precisely because the hash is a pure function of the
VALUES — independent of partition layout.  This module reimplements
the same function from the public xxHash specification (Collet,
xxhash.com; the 64-bit finalization for fixed-width inputs) plus
Spark's documented type mapping, so the single-process verification
twins (``hiselspark/twin.py``) can reproduce the engine's batching
without a SparkSession:

* seed chaining: ``xxhash64(c1, c2, ...)`` starts at seed 42 and
  feeds each column's hash as the seed of the next;
* int/short/byte/boolean hash through the 4-byte path
  (``hash_int``), long through the 8-byte path (``hash_long``);
* double is normalized (``-0.0 -> 0.0``) and hashed as its IEEE-754
  bit pattern via the 8-byte path; float likewise through the 4-byte
  path of its float bits;
* arrays hash elementwise, chaining the running hash as the seed;
* NULLs leave the running hash unchanged.

``tests/test_twins.py::test_sparkhash_matches_spark`` calibrates all
of this against a live session — any Spark-side change breaks loudly.
"""
from __future__ import annotations

import struct
from typing import Iterable, Sequence, Tuple

_M = (1 << 64) - 1
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) & _M
    h ^= h >> 29
    h = (h * PRIME64_3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian integer (Spark's LongType /
    DoubleType-bits path)."""
    value &= _M
    h = (seed + PRIME64_5 + 8) & _M
    k1 = _rotl((value * PRIME64_2) & _M, 31)
    k1 = (k1 * PRIME64_1) & _M
    h ^= k1
    h = ((_rotl(h, 27) * PRIME64_1) + PRIME64_4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte integer (Spark's IntegerType/ShortType/
    ByteType/BooleanType path)."""
    value &= 0xFFFFFFFF
    h = (seed + PRIME64_5 + 4) & _M
    h ^= (value * PRIME64_1) & _M
    h = ((_rotl(h, 23) * PRIME64_2) + PRIME64_3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (Spark's StringType/BinaryType
    path)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & _M
        v2 = (seed + PRIME64_2) & _M
        v3 = seed & _M
        v4 = (seed - PRIME64_1) & _M
        while i <= n - 32:
            for vi in range(4):
                (w,) = struct.unpack_from("<Q", data, i + 8 * vi)
                if vi == 0:
                    v1 = (_rotl((v1 + w * PRIME64_2) & _M, 31)
                          * PRIME64_1) & _M
                elif vi == 1:
                    v2 = (_rotl((v2 + w * PRIME64_2) & _M, 31)
                          * PRIME64_1) & _M
                elif vi == 2:
                    v3 = (_rotl((v3 + w * PRIME64_2) & _M, 31)
                          * PRIME64_1) & _M
                else:
                    v4 = (_rotl((v4 + w * PRIME64_2) & _M, 31)
                          * PRIME64_1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * PRIME64_2) & _M, 31) * PRIME64_1) & _M
            h = ((h * PRIME64_1) + PRIME64_4) & _M
    else:
        h = (seed + PRIME64_5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (w,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((w * PRIME64_2) & _M, 31) * PRIME64_1) & _M
        h = ((_rotl(h, 27) * PRIME64_1) + PRIME64_4) & _M
        i += 8
    if i <= n - 4:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * PRIME64_1) & _M
        h = ((_rotl(h, 23) * PRIME64_2) + PRIME64_3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * PRIME64_5) & _M
        h = (_rotl(h, 11) * PRIME64_1) & _M
        i += 1
    return _fmix(h)


def _double_bits(v: float) -> int:
    if v == 0.0:
        v = 0.0          # normalize -0.0 (Spark XxHash64 does)
    (bits,) = struct.unpack("<q", struct.pack("<d", v))
    return bits


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_value(value, running: int, spark_type: str) -> int:
    """Fold one typed value into the running (unsigned) hash, per
    Spark's type dispatch.  ``spark_type``: 'long' | 'int' | 'double'
    | 'string' | 'array<double>' | 'array<float>'."""
    if value is None:
        return running
    if spark_type == "long":
        return hash_long(int(value), running)
    if spark_type == "int":
        return hash_int(int(value), running)
    if spark_type == "double":
        return hash_long(_double_bits(float(value)), running)
    if spark_type == "string":
        return hash_bytes(str(value).encode("utf-8"), running)
    if spark_type == "array<double>":
        for x in value:
            running = hash_long(_double_bits(float(x)), running)
        return running
    if spark_type == "array<float>":
        for x in value:
            f = float(x)
            if f == 0.0:
                f = 0.0
            (bits,) = struct.unpack("<i", struct.pack("<f", f))
            running = hash_int(bits, running)
        return running
    raise TypeError(f"unsupported spark_type {spark_type!r}")


def xxhash64(values: Sequence, types: Sequence[str],
             seed: int = DEFAULT_SEED) -> int:
    """Spark-equal ``xxhash64(values...)`` -> SIGNED 64-bit int (what
    the SQL expression returns).  ``values[i]`` is typed ``types[i]``;
    pass literal ints as type 'int' (``F.lit(7)`` is IntegerType)."""
    h = seed & _M
    for v, t in zip(values, types):
        h = hash_value(v, h, t)
    return _to_signed(h)
