"""Visualization DATA layer — distributed analogues of the reference's
plot helpers (``/root/reference/utils/var_viz.py``, consumed at
``04_var_aggregation.py:45-131``).

The reference collects to pandas and renders driver-side (plotly
candlesticks, matplotlib VaR histogram + normal overlay). An engine
can't assume a display — and at 100 TB must never collect raw rows to
plot — so the Spark-first contract is: every chart's *data* is a small
aggregate DataFrame computed distributed, collect-safe by construction
(bins × groups, weeks × tickers), which any client-side renderer can
consume.

- ``ohlc_resample``     → candlestick input (plot_candlesticks:1-20)
- ``histogram_frame``   → the 50-bin density histogram (plot_var:40-42)
- ``var_overlay_params``→ the normal-pdf overlay + VaR line parameters
                          (plot_var:26-37: mean, std, min, max, var)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from value_at_risk_spark.functions.risk import value_at_risk_expr


def ohlc_resample(
    df: DataFrame,
    ts_col: str = "date",
    price_col: str = "price",
    by: list[str] | None = None,
    every: str = "week",
) -> DataFrame:
    """Downsample a price series to OHLC bars (candlestick input).

    One hash-aggregation: open/close via min_by/max_by on the
    timestamp, high/low via min/max — no window, no sort, partial
    aggregation map-side, so it holds at any scale and any bar width.
    """
    keys = list(by or [])
    bucket = F.date_trunc(every, F.col(ts_col)).cast("date").alias("bucket")
    return df.groupBy(bucket, *keys).agg(
        F.min_by(price_col, ts_col).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ts_col).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def histogram_frame(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    bins: int = 50,
) -> DataFrame:
    """Equal-width density histogram per group, fully distributed.

    ``density`` integrates to 1 per group — matching pandas
    ``hist(bins=50, density=True)`` (plot_var:40). The raw values never
    reach the driver; output is groups × bins.

    Bounds come from an unbounded window over the group keys (one
    exchange, shared with any upstream per-key shuffle — the input is
    scanned once) when grouped; the ungrouped case aggregates bounds
    into a 1-row broadcast instead, since a global window would
    collapse to a single task.
    """
    from pyspark.sql.window import Window

    keys = list(by or [])
    if keys:
        w = Window.partitionBy(*keys)
        joined = df.select(
            "*",
            F.min(value_col).over(w).alias("_lo"),
            F.max(value_col).over(w).alias("_hi"),
            F.count(F.lit(1)).over(w).alias("_n"),
        )
    else:
        bounds = df.groupBy().agg(
            F.min(value_col).alias("_lo"),
            F.max(value_col).alias("_hi"),
            F.count(F.lit(1)).alias("_n"),
        )
        joined = df.crossJoin(F.broadcast(bounds))
    # degenerate group (all values equal): span = 0 would raise
    # DIVIDE_BY_ZERO under ANSI — everything lands in bin 0 with an
    # undefined (NULL) density instead
    span = F.col("_hi") - F.col("_lo")
    w = span / F.lit(float(bins))
    bin_id = F.when(
        span > 0,
        F.least(
            F.floor((F.col(value_col) - F.col("_lo")) / w).cast("long"),
            F.lit(bins - 1),
        ),
    ).otherwise(F.lit(0))
    return (
        joined.groupBy(*keys, bin_id.alias("bin"), F.col("_lo"), F.col("_hi"), F.col("_n"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            "bin",
            (F.col("_lo") + F.col("bin") * (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))).alias("bin_lo"),
            "n",
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.col("n")
                / (F.col("_n") * (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))),
            ).alias("density"),
        )
    )


def var_overlay_params(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    confidence: float = 99.0,
) -> DataFrame:
    """One row per group: the scalar overlay of the VaR histogram —
    mean/std (normal pdf), min/max (x-range), and the VaR quantile
    (dashed line), exactly plot_var:26-37's inputs. np.std is
    population std ⇒ STDDEV_POP."""
    keys = list(by or [])
    return df.groupBy(*keys).agg(
        F.avg(value_col).alias("mean"),
        F.stddev_pop(value_col).alias("std"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        value_at_risk_expr(value_col, confidence).alias("var"),
    )
