"""Skew-mitigation utilities — SURVEY §4 / 100 TB design.

AQE's skew-join splitting handles sort-merge skew automatically
(session.py enables it), but aggregations over power-law keys (the
classic hot-key problem in event data) still bottleneck a single
reducer. ``salted_agg`` implements the standard two-phase rewrite:
per-(key, salt) partial aggregate, then final combine per key — the
shuffle spreads each hot key over ``salt_buckets`` reducers.

Only algebraic aggregates (sum/count/min/max) compose this way; the
helper takes the partial and final expression builders explicitly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs: aggregate expressions over the raw rows (aliased);
    final_aggs(): expressions combining the partials (same aliases).
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs())


def salted_sum_count(
    df: DataFrame, keys: list[str], value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Salted sum+count (the building block of skew-safe avg)."""
    return salted_agg(
        df,
        keys,
        [
            F.sum(value_col).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        ],
        lambda: [
            F.sum("_s").alias("total"),
            F.sum("_n").alias("n_rows"),
        ],
        salt_buckets,
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join when the dim side is too big to broadcast.

    The standard salt-and-replicate rewrite: each fact row gets a
    random salt in [0, salt_buckets); every dim row is replicated once
    per salt value; the join key becomes (keys..., salt), so a hot key
    spreads over ``salt_buckets`` reducers instead of one straggler
    task. Cost: dim side shuffles ×salt_buckets — use only when AQE's
    skew splitting isn't enough (e.g. a single pathological key inside
    one shuffle block) and the dim is far smaller than the fact.

    Row multiplicity, null-key behavior, and column set are identical
    to ``fact.join(dim, on, how)`` (asserted in tests) for inner and
    left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(replicated_dim, [*on, "_salt"], how)
    return out.drop("_salt")
