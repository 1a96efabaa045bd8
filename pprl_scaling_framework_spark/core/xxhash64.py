"""Pure-Python XXH64 with Spark's ``xxhash64`` expression semantics.

XXH64 is a public specification (github.com/Cyan4973/xxHash). Spark's
``xxhash64(cols...)`` chains per-column hashes: starting from seed 42, each
column's hash becomes the seed for the next; integer-typed columns use the
4-byte path, longs the 8-byte path, strings the full byte stream over UTF-8.

This exists so engine-INDEPENDENT golden generators (numpy + this module)
can reproduce operators whose bucketing derives from ``F.xxhash64`` —
hyperplane LSH signatures, salting shards, surrogate ids — without touching
the JVM. Parity with Spark is asserted in tests over ints, longs and
strings of every tail length.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte little-endian path."""
    v = value & _M
    h = (seed + _P5 + 8) & _M
    k = _rotl((v * _P2) & _M, 31)
    h ^= (k * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte path (int columns)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Canonical XXH64 over a byte stream (Spark string columns: UTF-8)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (v + k * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (((h ^ k) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values, seed: int = 42) -> int:
    """``F.xxhash64(*cols)`` for int / long / str values -> signed int64.

    Pass ints as ``("int", v)`` / ``("long", v)`` tuples to pin the column
    type, or bare python values (int -> long semantics only if you know the
    Spark column is LongType; string -> UTF-8 bytes).
    """
    h = seed
    for val in values:
        if isinstance(val, tuple):
            kind, v = val
        elif isinstance(val, str):
            kind, v = "str", val
        else:
            kind, v = "long", val
        if kind == "int":
            h = hash_int(v, h)
        elif kind == "long":
            h = hash_long(v, h)
        elif kind == "str":
            h = hash_bytes(v.encode("utf-8"), h)
        else:
            raise ValueError(kind)
    return _signed(h)
