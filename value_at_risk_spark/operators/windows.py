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


def hurst_rs(
    df,
    key_col: str,
    order_col: str,
    value_col: str,
    scales: tuple[int, ...] = (8, 16, 32, 64),
):
    """Rescaled-range (R/S) Hurst exponent per key — see
    queries.hurst_exponent_rs for the full semantics. Returns
    (key_col, n_scales, hurst[unrounded]). Pure window composition:
    one shuffle on (key, scale, chunk), two tiny reductions, closed-
    form regression slope."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    idx = df.select(
        F.col(key_col).alias("_k"),
        F.col(value_col).alias("_x"),
        F.row_number().over(w).alias("_rn"),
    )
    sized = idx.select(
        "*", F.explode(F.array(*[F.lit(s) for s in scales])).alias("_w")
    ).withColumn("_chunk", F.floor((F.col("_rn") - 1) / F.col("_w")).cast("long"))
    wc = Window.partitionBy("_k", "_w", "_chunk")
    wco = wc.orderBy("_rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stats = sized.select(
        "_k",
        "_w",
        "_chunk",
        "_rn",
        "_x",
        F.count(F.lit(1)).over(wc).alias("_n"),
        F.avg("_x").over(wc).alias("_mu"),
        F.stddev_pop("_x").over(wc).alias("_sp"),
    )
    cum = stats.select(
        "_k",
        "_w",
        "_chunk",
        "_rn",
        "_n",
        "_sp",
        F.sum(F.col("_x") - F.col("_mu")).over(wco).alias("_c"),
    )
    rng = cum.select(
        "_k",
        "_w",
        "_chunk",
        "_n",
        "_sp",
        (F.max("_c").over(wc) - F.min("_c").over(wc)).alias("_r"),
        F.row_number().over(wc.orderBy("_rn")).alias("_pick"),
    )
    rs = (
        rng.filter(
            (F.col("_pick") == 1)
            & (F.col("_n") == F.col("_w"))
            & (F.col("_sp") > 0)
        )
        .groupBy("_k", "_w")
        .agg(F.avg(F.col("_r") / F.col("_sp")).alias("_avg_rs"))
    )
    return rs.groupBy(F.col("_k").alias(key_col)).agg(
        F.count(F.lit(1)).alias("n_scales"),
        F.expr("regr_slope(ln(_avg_rs), ln(cast(_w as double)))").alias(
            "hurst"
        ),
    )
