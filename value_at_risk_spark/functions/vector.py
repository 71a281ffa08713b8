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


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision (cast before multiply for engine parity)."""
    a, b = _c(a), _c(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vector_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); the similarity-search kernel."""
    return dot_product(a, b) / (vector_norm(a) * vector_norm(b))
