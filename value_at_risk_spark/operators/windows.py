"""Time-range trailing windows — SURVEY §2.5 W1/W2.

Reference: ``Window.orderBy(F.col('date').cast('long')).rangeBetween(
-days(N), 0)`` with ``collect_list`` over it — the 90-day volatility
window (``/root/reference/01_var_market_etl.py:167-175``) and the
250-day Basel window (``05_var_compliance.py:112-120``).

Scale note (SURVEY §4): the reference's window has no partitionBy ⇒
single task. Acceptable for a ~500-row per-series frame but not at
100 TB; this operator takes partition keys so each series sorts
independently, and callers that genuinely need a global unkeyed window
over huge data should instead aggregate into a date-spine frame first
(one row per date) and window over that — the spine is small by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

from value_at_risk_spark.functions.timeutil import epoch_seconds

SECONDS_PER_DAY = 86_400


def trailing_range_window(
    order_col: str,
    days: int,
    partition_by: list[str] | None = None,
) -> WindowSpec:
    """Trailing [now - days, now] window keyed on an epoch-second cast.

    Mirrors 01_var_market_etl.py:167-168 (`i * 86400`).
    """
    base = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return base.orderBy(epoch_seconds(order_col)).rangeBetween(
        -days * SECONDS_PER_DAY, 0
    )


def collect_trailing(col: Column | str, window: WindowSpec) -> Column:
    """collect_list over a trailing range window (01:170-175 shape)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.collect_list(col).over(window)
