"""Skew-mitigation utilities — SURVEY §4 / 100 TB design.

Where skew actually bites — measured by ``tools/perf_skew.py``
(5 M rows, 64 input splits, median-of-3 interleaved runs, results
value-asserted identical; full table in PERF.md):

- **Joins**: the real win. Against a non-broadcastable dim with AQE
  off, ``salted_join`` beat the plain shuffle join **2.0×** at a
  30 %-hot key (2.46 s → 1.26 s) and **2.3×** at 95 % hot
  (2.34 s → 1.00 s) — the hot key's fact rows spread over
  ``salt_buckets`` reducers instead of one straggler. AQE's skew
  split is the first line of defense; salting is for the
  pathological single-key case it can't subdivide.
- **Algebraic/sketch aggregates (sum/count/min/max/avg,
  percentile_approx, HLL)**: do NOT salt. Map-side partial
  aggregation already reduces each hot key to one partial row per
  map task; plain ``groupBy`` beat the salted rewrite at both 30 %
  and 95 % hot (3.27 s vs 7.88 s at 30 %).
- **Holistic aggregates**: salting pays only when the partials
  SHRINK — exact ``count_distinct`` (distinct-of-distincts, the
  ``salted_distinct_users_by_type`` gate query) cuts the hot
  reducer's input from rows to distincts. For payload-conserving
  aggregates (``collect_list``/``collect_set``) the final merge
  still assembles the hot key's entire payload on one reducer, and
  the measured salted path was strictly slower (3.91 s vs 10.30 s at
  30 % hot); its remaining value is bounding PER-TASK merge inputs
  when a single partial exceeds task memory, not wall-clock.

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


def spread_small_input(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition ``df`` by ``cols`` ONLY when its planned
    parallelism is below the session's ``defaultParallelism`` — the
    guide §2.5 "input skew" remedy (one huge unsplittable file, or a
    small fixture parquet whose single row group is one split):
    repartition immediately after the read so expensive per-row work
    (hash families, shingle explodes, content-defined chunk slicing)
    runs on every core instead of the scan's task count.

    Scale contract: on a real corpus the scan already has >= cores
    splits, the condition never fires, and the plan is IDENTICAL to
    the un-spread form — this is not a local-mode tuning constant but
    a guard that only pays a (input-sized, one-pass) shuffle when the
    input's own layout under-parallelizes the job.

    CALLER CONTRACT (r17, ADVICE): pass a SCAN-ONLY frame. The probe
    reads the planned RDD partition count via ``df.rdd``, which on a
    plan containing exchanges makes AQE eagerly execute its
    shuffle/broadcast query stages (getFinalPhysicalPlan) — a real,
    throwaway job whose results the later execution does not reuse.
    On a scan-only plan there are no query stages and no job runs.
    Every in-repo call site guards the raw scan and joins afterwards
    (a broadcast join preserves the spread's partitioning).

    ``SPARK_GRAFT_NO_SPREAD=1`` disables the spread (measurement hook
    for interleaved A/Bs; also documents that results are identical
    either way — every caller's downstream grouping carries the same
    keys regardless of partitioning).
    """
    import os

    if os.environ.get("SPARK_GRAFT_NO_SPREAD") == "1":
        return df
    try:
        nparts = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover — never sink the caller
        return df
    if nparts >= target:
        return df
    # EXPLICIT partition count: repartition(*cols) alone leaves the
    # number to AQE, which coalesces a kilobyte-scale shuffle right
    # back to ONE post-shuffle partition (advisoryPartitionSizeInBytes
    # ≫ input bytes) — re-serializing exactly the stage this guard
    # exists to spread (measured: identical wall with/without the
    # guard until the count was pinned). A user-specified count is
    # exempt from AQE coalescing.
    return df.repartition(target, *cols)
