"""Skew-mitigation utilities — SURVEY §4 / 100 TB design.

Where skew actually bites (measured, 20 M rows with a 95%-hot key on
local[32]):

- **Algebraic/sketch aggregates (sum/count/min/max/avg,
  percentile_approx, HLL)**: Spark's map-side partial aggregation
  already reduces each hot key to one partial row per map task — the
  reducer receives #tasks rows regardless of skew. Plain ``groupBy``
  BEAT the salted rewrite 0.9 s vs 3.4 s; don't salt these.
- **Holistic aggregates (collect_list/collect_set, exact
  percentile)**: no map-side shrink — the hot key's entire payload
  lands on one reducer. ``salted_agg``'s two-phase rewrite applies
  when the aggregate decomposes over a partition of the rows
  (collect_list → flatten, count_distinct → distinct-of-distincts);
  measured 2.2× (3.7 s → 1.7 s) for collect_list over 5 M rows with
  a 95%-hot key, widening with data size and skew.
- **Joins**: AQE splits skewed sort-merge blocks, but a single
  pathological key inside one block still stragglers —
  ``salted_join`` replicates the dim side over salt buckets.

``salted_agg`` takes the partial and final expression builders
explicitly; only decomposable aggregates compose this way.
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
