"""Array-vector math as native higher-order functions (SURVEY §2.8 F3, §1.4).

The reference stores simulation vectors as ``VectorUDT`` and scales them
with a Python UDF (``weighted_returns``,
``/root/reference/utils/var_udf.py:39-41``) and sums them with MLlib's
``Summarizer.sum`` (``04_var_aggregation.py:35-41``). This engine keeps
plain ``array<double>`` columns and does vector math with ``transform``
/ ``zip_with`` / ``aggregate`` — Catalyst-optimizable, SQL-expressible,
oracle-checkable, and with no VectorUDT serialization overhead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scale_vector(vec: Column | str, scalar: Column | str) -> Column:
    """Element-wise vec·w — native form of weighted_returns (var_udf.py:39-41)."""
    vec, scalar = _c(vec), _c(scalar)
    return F.transform(vec, lambda x: x * scalar)


def vector_add(a: Column | str, b: Column | str) -> Column:
    """Element-wise sum of two arrays (the combine step of A5 vector sums)."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x + y)


def dot_product(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ in double precision (cast before multiply for engine parity).

    With ``dim`` (array width known at plan-build time) the sum
    unrolls to a flat ``element_at`` chain that whole-stage codegen
    compiles; the generic HOF form is interpreted per row. Same
    left-to-right fold order ⇒ bit-identical results either way.

    Crossover (measured, local[32]): unrolling wins decisively for
    NARROW arrays (dim ≲ 24 — the 21-term VaR predictor went 19×
    faster), but LOSES for wide ones (dim = 64: ~2× slower at 16 M
    pairs — the generated method blows past JIT/codegen size limits
    and falls back to per-expression interpretation, which is worse
    than the HOF's single tight loop). Pass ``dim`` for narrow
    fixed-width vectors only.
    """
    a, b = _c(a), _c(b)
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(
                b, i
            ).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vector_norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot_product(a, a, dim=dim))


DIM_METADATA_KEY = "dim"


def resolve_dim(df, vec_col: str, dim: int | None = None, caller: str = "") -> int:
    """Vector dimensionality without a Spark job wherever possible —
    the resolution order minhash's ``num_hashes`` pioneered
    (operators/dedup.py:107): the explicit argument wins, then the
    ``dim`` column metadata stamped where the vector column was
    created, and only a foreign frame with neither pays a ``.first()``
    probe job (one extra Spark job per training/build call — the class
    of hidden driver actions the round-8 audit flagged).

    CONTRACT: metadata rides the SCHEMA, not the data. A frame whose
    vectors were sliced, concatenated, or rebuilt after stamping
    carries a stale dim that silently mis-sizes downstream plans —
    such transforms must re-stamp (``df.withMetadata(col, {"dim": d})``)
    or pass ``dim`` explicitly (explicit always wins).
    """
    if dim is not None:
        return int(dim)
    if vec_col in df.columns:
        md = df.schema[vec_col].metadata
        if md and md.get(DIM_METADATA_KEY):
            return int(md[DIM_METADATA_KEY])
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None:
        raise ValueError(
            f"{caller or 'resolve_dim'}: empty input — pass dim "
            "explicitly to build the plan without data"
        )
    return int(row[0])


def cosine_similarity(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); the similarity-search kernel.

    ``try_divide``: a zero vector has no direction — its cosine is
    NULL (which sorts last in rankings and fails threshold filters)
    rather than an ANSI DIVIDE_BY_ZERO error."""
    return F.try_divide(
        dot_product(a, b, dim=dim),
        vector_norm(a, dim=dim) * vector_norm(b, dim=dim),
    )


def squared_distance(a: Column | str, b: Column | str) -> Column:
    """Σ (aᵢ−bᵢ)² in double precision (left-to-right fold)."""
    a, b = _c(a), _c(b)
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def jl_projection_matrix(
    in_dim: int, out_dim: int, seed: int = 123
) -> list[list[float]]:
    """The Johnson–Lindenstrauss random projection matrix (Gaussian
    entries / sqrt(out_dim)), seeded and ROUNDED to 6 decimals so the
    exact same literal matrix can be embedded in both the Spark plan
    and an oracle's VALUES table — the projection becomes a pure,
    engine-replayable expression."""
    import numpy as np

    rng = np.random.default_rng(seed)
    R = rng.standard_normal((out_dim, in_dim)) / float(np.sqrt(out_dim))
    return [[round(float(x), 6) for x in row] for row in R]


def jl_project(
    vec: Column | str, matrix: list[list[float]]
) -> Column:
    """Project ``vec`` through a literal JL matrix: out[i] = Rᵢ · v,
    one HOF dot product per output dimension (the narrow-dot unroll
    crossover doesn't apply — the 64-wide fold repeats per output
    row, the same reasoning as nearest_cell_expr). Entirely plan-side:
    no shuffle, no Python, streaming-safe.

    r17 (guide §4, the _cell_dists_sql argument): for a plain string
    column name the out_dim x in_dim literal tree is rendered as ONE
    SQL string parsed JVM-side — the Column-API build cost one py4j
    round-trip per literal (measured ~2.4 s of pure driver time at
    32x64). The rendered fold is byte-for-byte the text form of
    ``dot_product``'s HOF (same cast, same left fold, 0.0D zero), so
    results are bit-identical; Column-object callers keep the legacy
    builder."""
    if isinstance(vec, str):
        from value_at_risk_spark.operators.similarity import (
            _array1_sql,  # function-local: avoids a circular import
        )

        vsql = f"`{vec}`"
        dots = ", ".join(
            "aggregate(zip_with({v}, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            "(acc, x) -> acc + x)".format(v=vsql, arr=_array1_sql(row))
            for row in matrix
        )
        return F.expr(f"array({dots})")
    v = _c(vec)
    return F.array(
        *[
            dot_product(v, F.array(*[F.lit(float(x)) for x in row]))
            for row in matrix
        ]
    )
