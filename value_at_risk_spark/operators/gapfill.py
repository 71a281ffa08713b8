"""Calendar-spine gap fill + forward fill — SURVEY §2.1 S1.

The reference pad-fills market-data gaps in pandas per ticker
(``/root/reference/utils/var_utils.py:6-9``:
``reindex(pd.bdate_range(...)).pad()``) inside a grouped-map UDF. The
distributed form: build a per-key date spine (sequence + explode), left
join the observations, and forward-fill with
``last(value, ignoreNulls=True) OVER (PARTITION BY key ORDER BY date)``.

All native; one shuffle on the series key. The spine explode is
linear in (keys × days) and never touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def forward_fill_spine(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_cols: list[str],
    business_days_only: bool = True,
) -> DataFrame:
    """Reindex each key's series onto a daily spine and pad-fill values."""
    bounds = df.groupBy(*key_cols).agg(
        F.min(date_col).alias("_min_d"), F.max(date_col).alias("_max_d")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("_min_d").cast("date"),
                F.col("_max_d").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("_d"),
    ).select(
        *key_cols,
        F.col("_d").cast(df.schema[date_col].dataType).alias(date_col),
    )
    if business_days_only:
        # dayofweek: 1=Sunday, 7=Saturday
        spine = spine.filter(~F.dayofweek(date_col).isin(1, 7))

    joined = spine.join(df, on=[*key_cols, date_col], how="left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *key_cols,
        date_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled
