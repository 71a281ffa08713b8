"""Incremental maintenance from a Change Data Feed.

The point of CDF at 100 TB: a downstream aggregate (counts, sums —
any abelian-group state) is maintained by applying the CHANGE rows of
versions (v0, v1] to the state computed at v0, instead of rescanning
the table. Inserts and update postimages contribute +1, deletes and
update preimages contribute -1; an update therefore lands as a clean
(-pre, +post) pair and the maintained state matches a full recompute
exactly.

Reference tie: the reference persists its pipeline tables as Delta
(``/root/reference/config/configure_notebook.py:18-27``) precisely so
downstream consumers can subscribe incrementally; this operator is the
consumption pattern over the native log's ``table_changes``
(sources/deltalog.py).

Scale shape: one shuffle of the CHANGE rows on the group keys (bounded
by change volume, never table size), then a key-wise merge with the
prior state — broadcastable when the state is a small dimension, a
co-partitioned join when both sides are bucketed on the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PLUS = ("insert", "update_postimage")
_MINUS = ("delete", "update_preimage")


def cdf_delta_aggregate(
    changes: DataFrame, keys: list[str], val_col: str
) -> DataFrame:
    """Per-key (sum, count) DELTA carried by a CDF frame: change rows
    signed +1 for insert/update_postimage and -1 for
    delete/update_preimage, aggregated on ``keys``. One shuffle,
    bounded by the change volume. Output: keys..., _d_sum, _d_cnt."""
    sign = (
        F.when(F.col("_change_type").isin(*_PLUS), F.lit(1))
        .when(F.col("_change_type").isin(*_MINUS), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("cdf_delta_aggregate: unknown _change_type "),
                    F.col("_change_type"),
                )
            )
        )
    )
    return changes.groupBy(*keys).agg(
        F.sum(F.col(val_col) * sign).alias("_d_sum"),
        F.sum(sign).alias("_d_cnt"),
    )


def maintain_sum_count(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    val_col: str,
    sum_col: str = "total",
    cnt_col: str = "n",
) -> DataFrame:
    """Apply a CDF frame to a maintained ``groupBy(keys).agg(sum,
    count)`` state: ``base`` has keys..., ``sum_col``, ``cnt_col``
    (the aggregate as of the feed's start version); the result is the
    same aggregate as of the feed's end version — groups whose count
    reaches zero disappear, new groups appear. Equals the full
    recompute by construction (sum/count form an abelian group)."""
    d = cdf_delta_aggregate(changes, keys, val_col)
    merged = base.join(d, on=keys, how="full_outer")
    out = merged.select(
        *keys,
        (
            F.coalesce(F.col(sum_col), F.lit(0.0))
            + F.coalesce(F.col("_d_sum"), F.lit(0.0))
        ).alias(sum_col),
        (
            F.coalesce(F.col(cnt_col), F.lit(0).cast("long"))
            + F.coalesce(F.col("_d_cnt"), F.lit(0).cast("long"))
        ).alias(cnt_col),
    )
    return out.filter(F.col(cnt_col) > 0)
