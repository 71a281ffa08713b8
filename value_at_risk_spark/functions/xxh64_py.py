"""Pure-Python XXH64 (seed 42 — Spark's ``xxhash64`` over UTF-8
string bytes), the PYTHON-side twin of functions/xxh64_sql.py.

Used where a deterministic per-row value must be computable in all
THREE engines at once: a Pandas-UDF kernel (this module), a Spark
column (``F.xxhash64``), and the DuckDB oracle (``xxh64_cte``) — so
the value a Python boundary produces is hash-checkable end to end.
Parity with ``F.xxhash64`` is pytest-pinned on every length class
(empty / <4 / <8 / 8-31 / >=32 bytes, multibyte UTF-8).

Reference: the public xxHash spec (Cyan4973/xxHash, XXH64); Spark's
``xxhash64`` applies the same algorithm to the element bytes with
seed 42.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k1), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ ((k * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Spark's signed BIGINT view of the unsigned hash."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
