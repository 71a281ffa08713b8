"""VaR / Expected-Shortfall / Basel-zone expressions (SURVEY §2.6 O3-O4, §2.8 F4).

Reference semantics:
- ``get_var(xs, 99) = np.percentile(xs, 1)`` — linear interpolation
  (``/root/reference/utils/var_utils.py:42-44``; UDF wrapper
  ``utils/var_udf.py:16-19``). VaR-99 is the **1st** percentile of the
  simulated return distribution (a negative number at loss).
- ``get_shortfall(xs, var) = mean(x for x in xs if x <= var)``
  (``utils/var_utils.py:36-39``).
- ``count_breaches(xs, var)``: number of trailing returns <= var, mapped
  to Basel traffic-light zones ≤3 → green(0), <10 → yellow(1), else
  red(2) (``utils/var_udf.py:22-30``; the code bound ≤3, not the
  notebook prose "up to 4" — SURVEY §7.7).

All native expressions. Spark's exact ``percentile`` aggregate uses the
same linear interpolation as ``np.percentile`` / DuckDB
``quantile_cont`` (SURVEY §7.2). At 100 TB, swap to
``percentile_approx`` via ``approximate=True`` — single-pass sketch, no
global sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def value_at_risk_expr(
    col: Column | str, confidence: float = 99.0, approximate: bool = False
) -> Column:
    """Aggregate expression: the (100-confidence)th percentile of returns."""
    col = F.col(col) if isinstance(col, str) else col
    p = (100.0 - confidence) / 100.0
    if approximate:
        return F.percentile_approx(col, p, 100_000)
    return F.percentile(col, p)


def expected_shortfall_expr(col: Column | str, var: Column) -> Column:
    """Aggregate: mean of returns at or below the VaR threshold.

    ``avg(x) FILTER (WHERE x <= var)`` — var must be available per-row
    (e.g. joined or windowed in first).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.avg(F.when(col <= var, col))


def count_breaches(returns_arr: Column | str, var: Column | str) -> Column:
    """Count of trailing returns <= var_99 (both negative returns; no
    abs/negation anywhere — SURVEY §7.8). utils/var_udf.py:23-24."""
    returns_arr = F.col(returns_arr) if isinstance(returns_arr, str) else returns_arr
    var = F.col(var) if isinstance(var, str) else var
    return F.size(F.filter(returns_arr, lambda x: x <= var))


def basel_zone(breaches: Column | str) -> Column:
    """Basel traffic-light zone from breach count; utils/var_udf.py:25-30."""
    breaches = F.col(breaches) if isinstance(breaches, str) else breaches
    return (
        F.when(breaches <= 3, F.lit(0))
        .when(breaches < 10, F.lit(1))
        .otherwise(F.lit(2))
    )
