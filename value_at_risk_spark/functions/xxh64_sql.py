"""XXH64 (seed 42 — Spark's ``xxhash64``) re-expressed as a single
DuckDB SQL statement, so xxhash64-family queries (SimHash) can be
ORACLE-CHECKED value-for-value instead of rows-only.

Why this exists: the driver's correctness gate runs one DuckDB SQL
string per query (``con.sql(...)`` — a single statement, no CREATE
MACRO prelude possible), and DuckDB has no xxhash64 builtin. But the
algorithm (public spec, github.com/Cyan4973/xxHash) is a short loop of
64-bit wrapping multiplies/rotates — expressible over DuckDB's
HUGEINT (int128) with explicit ``% 2^64`` wrapping, data-driven loops
via ``list_reduce`` (initial value carried by ``list_prepend``), and
XOR through UBIGINT. The builders below emit CTE stages (one per hash
phase) so expression trees stay linear, never exponentially inlined.

Parity contract: the emitted SQL's hash equals Spark's
``F.xxhash64(string_col)`` (seed 42, UTF-8 bytes) bit-for-bit —
pinned by ``tests/test_functions.py::test_xxh64_sql_parity`` over
every length class (empty, <8, tail-4, tail-1, 8/32-byte boundaries,
multi-stripe, multibyte UTF-8).
"""

from __future__ import annotations

# 2^64 and the xxHash primes, as DuckDB HUGEINT literals
_T = "18446744073709551616::HUGEINT"
_P1 = "11400714785074694791::HUGEINT"
_P2 = "14029467366897019727::HUGEINT"
_P3 = "1609587929392839161::HUGEINT"
_P4 = "9650029242287828579::HUGEINT"
_P5 = "2870177450012600261::HUGEINT"
_SEED = 42


def _wmul(a: str, b: str) -> str:
    """64-bit wrapping multiply in HUGEINT: split ``a`` into 32-bit
    halves so no intermediate exceeds int128 (a_lo*b < 2^96)."""
    return (
        f"((((({a}) % 4294967296::HUGEINT) * ({b})) % {_T}"
        f" + ((((({a}) // 4294967296::HUGEINT) * ({b})) % 4294967296::HUGEINT)"
        f" * 4294967296::HUGEINT)) % {_T})"
    )


def _xadd(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {_T})"


def _rotl(x: str, r: int) -> str:
    """rotl64 without overflow: (x mod 2^(64-r))*2^r + (x // 2^(64-r))
    — the two parts occupy disjoint bit ranges, so plain + suffices."""
    lo_mod = f"{1 << (64 - r)}::HUGEINT"
    return (
        f"(((({x}) % {lo_mod}) * {1 << r}::HUGEINT)"
        f" + (({x}) // {lo_mod}))"
    )


def _xxor(a: str, b: str) -> str:
    return f"(xor(({a})::UBIGINT, ({b})::UBIGINT)::HUGEINT)"


def _rnd(acc: str, lane: str) -> str:
    """xxHash round: rotl31(acc + lane*P2) * P1 (all wrapping)."""
    return _wmul(_rotl(_xadd(acc, _wmul(lane, _P2)), 31), _P1)


def xxh64_cte(token_source: str, out: str = "hsh") -> str:
    """CTE chain hashing the ``t`` (VARCHAR) column of
    ``token_source`` (a CTE name or subquery with one row per distinct
    token). The final stage ``out`` has columns (t, hu) where hu is
    the UNSIGNED 64-bit XXH64(utf8(t), seed=42) as HUGEINT. Embed
    inside ``WITH ...`` and follow with consumers of ``out``."""
    seed = f"{_SEED}::HUGEINT"
    # stripe-phase accumulator init (v4 = seed - P1 wraps below zero)
    v1_0 = f"(({seed} + {_P1} + {_P2}) % {_T})"
    v2_0 = f"(({seed} + {_P2}) % {_T})"
    v3_0 = seed
    v4_0 = f"(({seed} + {_T} - {_P1}) % {_T})"

    def ws(i: str) -> str:  # 1-based word list access
        return f"ws[({i})::BIGINT]"

    # one stripe step: vi = rnd(vi, ws[4k + i])
    stripe_step = (
        "{'v1': "
        + _rnd("a.v1", ws("4*x.v1 + 1"))
        + ", 'v2': "
        + _rnd("a.v2", ws("4*x.v1 + 2"))
        + ", 'v3': "
        + _rnd("a.v3", ws("4*x.v1 + 3"))
        + ", 'v4': "
        + _rnd("a.v4", ws("4*x.v1 + 4"))
        + "}"
    )
    stripe_init = (
        f"{{'v1': {v1_0}, 'v2': {v2_0}, 'v3': {v3_0}, 'v4': {v4_0}}}"
    )
    # converge h across the four accumulators (mergeRound x4), one CTE
    # stage per round so the expression tree stays linear
    h_conv = _xadd(
        _xadd(_rotl("sacc.v1", 1), _rotl("sacc.v2", 7)),
        _xadd(_rotl("sacc.v3", 12), _rotl("sacc.v4", 18)),
    )

    def merge_round(h: str, v: str) -> str:
        return _xadd(_wmul(_xxor(h, _rnd("0::HUGEINT", v)), _P1), _P4)

    # 8-byte tail round: h = rotl27(h ^ rnd(0, w)) * P1 + P4
    tail8 = _xadd(_wmul(_rotl(_xxor("a", _rnd("0::HUGEINT", "x")), 27), _P1), _P4)
    # 4-byte: h = rotl23(h ^ (u32 * P1)) * P2 + P3
    u32 = (
        "(bs[o4::BIGINT + 1] + bs[o4::BIGINT + 2] * 256::HUGEINT"
        " + bs[o4::BIGINT + 3] * 65536::HUGEINT"
        " + bs[o4::BIGINT + 4] * 16777216::HUGEINT)"
    )
    tail4 = _xadd(_wmul(_rotl(_xxor("h2", _wmul(u32, _P1)), 23), _P2), _P3)
    # 1-byte: h = rotl11(h ^ (byte * P5)) * P1
    tail1 = _wmul(_rotl(_xxor("a", _wmul("x", _P5)), 11), _P1)
    # avalanche
    av1 = _wmul(_xxor("h4", "h4 // 8589934592::HUGEINT"), _P2)  # >> 33
    av2 = _wmul(_xxor("a1", "a1 // 536870912::HUGEINT"), _P3)  # >> 29
    av3 = _xxor("a2", "a2 // 4294967296::HUGEINT")  # >> 32

    rd8 = (
        "bs[8*k + 1] + bs[8*k + 2] * 256::HUGEINT"
        " + bs[8*k + 3] * 65536::HUGEINT"
        " + bs[8*k + 4] * 16777216::HUGEINT"
        " + bs[8*k + 5] * 4294967296::HUGEINT"
        " + bs[8*k + 6] * 1099511627776::HUGEINT"
        " + bs[8*k + 7] * 281474976710656::HUGEINT"
        " + bs[8*k + 8] * 72057594037927936::HUGEINT"
    )

    return f"""
xx_enc AS (
  SELECT t, hex(encode(t)) AS hx,
         octet_length(encode(t))::HUGEINT AS n
  FROM {token_source}
),
xx_b AS (
  SELECT t, n,
         list_transform(range(0, n::BIGINT),
           i -> ('0x' || substring(hx, (2*i + 1)::BIGINT, 2))
                  ::UBIGINT::HUGEINT) AS bs
  FROM xx_enc
),
xx_w AS (
  SELECT t, n, bs,
         list_transform(range(0, (n // 8)::BIGINT),
           k -> {rd8}) AS ws,
         (n // 32)::BIGINT AS ns
  FROM xx_b
),
xx_s AS (
  SELECT t, n, bs, ns,
         list_reduce(
           list_prepend({stripe_init},
             list_transform(range(0, ns),
               k -> {{'v1': k::HUGEINT, 'v2': 0::HUGEINT,
                      'v3': 0::HUGEINT, 'v4': 0::HUGEINT}})),
           (a, x) -> {stripe_step}) AS sacc,
         ws
  FROM xx_w
),
xx_h0 AS (
  SELECT t, n, bs, ns, ws, sacc,
         CASE WHEN n >= 32 THEN {h_conv}
              ELSE (({_SEED}::HUGEINT + {_P5}) % {_T}) END AS hc
  FROM xx_s
),
xx_h0m AS (
  SELECT t, n, bs, ns, ws,
         CASE WHEN n >= 32 THEN {merge_round(merge_round(merge_round(merge_round("hc", "sacc.v1"), "sacc.v2"), "sacc.v3"), "sacc.v4")}
              ELSE hc END AS h0
  FROM xx_h0
),
xx_h1 AS (
  SELECT t, n, bs, ws, ns, {_xadd("h0", "n")} AS h1 FROM xx_h0m
),
xx_h2 AS (
  SELECT t, n, bs,
         list_reduce(
           list_prepend(h1,
             ws[(4*ns + 1)::BIGINT : (n // 8)::BIGINT]),
           (a, x) -> {tail8}) AS h2,
         ((n // 8) * 8)::HUGEINT AS o4
  FROM xx_h1
),
xx_h3 AS (
  SELECT t, n, bs,
         CASE WHEN n - o4 >= 4 THEN {tail4} ELSE h2 END AS h3,
         CASE WHEN n - o4 >= 4 THEN o4 + 4 ELSE o4 END AS o1
  FROM xx_h2
),
xx_h4 AS (
  SELECT t,
         list_reduce(
           list_prepend(h3, bs[o1::BIGINT + 1 : n::BIGINT]),
           (a, x) -> {tail1}) AS h4
  FROM xx_h3
),
xx_a1 AS (SELECT t, {av1} AS a1 FROM xx_h4),
xx_a2 AS (SELECT t, {av2} AS a2 FROM xx_a1),
{out} AS (SELECT t, {av3} AS hu FROM xx_a2)
"""


def xxh64_signed(hu: str = "hu") -> str:
    """Unsigned HUGEINT hash -> Spark's signed BIGINT value."""
    return (
        f"(CASE WHEN {hu} >= 9223372036854775808::HUGEINT"
        f" THEN {hu} - {_T} ELSE {hu} END)::BIGINT"
    )
