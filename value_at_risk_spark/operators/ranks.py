"""Distributed global ordering — rank / running sum without a
single-partition window.

``Window.orderBy(...)`` with no partition spec moves the WHOLE frame
through one task; fine on a bounded reduction (a vocabulary head, a
per-day series), fatal on a frame that grows with a real data
dimension (customers, parts) at 100 TB. These operators implement the
classic two-pass form as ordinary DataFrame ops:

1. **value-bucket** each row by its first ordering column — the bucket
   id is the count of broadcast ``percentile_approx`` boundaries
   beyond the value, a PURE FUNCTION of the row (deliberately not
   ``spark_partition_id`` over a range shuffle, whose bucket↔row
   mapping is only consistent across subtrees when AQE happens to
   reuse the exchange);
2. per-bucket counts/sums (≤ ``num_buckets`` rows) become cumulative
   offsets via a triangular self-join — no WindowExec at all on the
   tiny frame;
3. a bucket-LOCAL window (partitioned, parallel) plus the broadcast
   offset yields the exact global result.

Everything is lazy — no driver action anywhere; the boundary aggregate
and offsets broadcast into the plan. Ties on the first ordering column
share a bucket (secondary columns order them inside the local window),
so results are exact and deterministic; the tradeoff is that a value
held by a huge fraction of rows skews its one bucket — for continuous
metrics (revenue sums, scores) ties are measure-zero, and a discrete
metric should pre-hash a composite ordering column instead.

PRECONDITION: the FIRST ordering column must be non-null. A NULL
value makes both ``col > b`` and ``col < b`` evaluate NULL, landing
the row in bucket 0 regardless of direction, while
``percentile_approx`` ignores NULLs when placing boundaries — a NULL
row would rank near the global front under a descending order instead
of globally last. Current callers feed non-null aggregates; filter or
coalesce NULLs before calling for anything else.

Used by ``gini_revenue_concentration`` (rank), ``pareto_abc_parts``
(descending cumulative share), and ``ks_two_sample_test`` (both ECDF
running sums in one shared bucketing) in the queries package; parity with the
single-partition window forms is pinned in tests/test_operators.py,
including all-ties and empty frames. Measured vs the plain window
form in PERF.md (wash at 10M rows on one box, 1.8x at 100M, and the
only form that scales out at all on a cluster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID, _OFF = "_rank_pid", "_rank_off"


def _with_value_bucket(
    df: DataFrame,
    col: str,
    ascending: bool,
    num_buckets: int,
    accuracy: int = 1_000,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Attach a bucket id monotone along the requested ordering of
    ``col``: the count of approx-quantile boundaries strictly before
    the row's value. Lazy; boundaries broadcast. Accuracy only shapes
    bucket BALANCE, never correctness — any monotone boundary set
    yields exact ranks — so the default stays low and cheap.

    ``boundaries`` (optional): explicit boundary values. Any sorted
    list works (balance is the caller's problem); supplying it removes
    the boundary aggregate from the plan entirely — the bulletproof
    path for callers that cannot tolerate the residual race below."""
    if boundaries is not None:
        bs = F.array(*[F.lit(float(b)) for b in sorted(boundaries)])
        return df.withColumn(
            _PID,
            F.aggregate(
                bs,
                F.lit(0),
                lambda acc, b: acc
                + F.when(
                    F.col(col) > b if ascending else F.col(col) < b,
                    1,
                ).otherwise(0),
            ),
        )
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = df.groupBy().agg(
        F.percentile_approx(col, probs, accuracy).alias("_bs")
    )
    # The bucketed frame is referenced from TWO subtrees (the
    # per-bucket counts/offsets side and the row side), and
    # ApproximatePercentile's partial-merge is shuffle-fetch-order
    # sensitive — relying on ReuseExchange to evaluate the boundary
    # aggregate once is a config-dependent accident. With
    # spark.sql.exchangeReuse.enabled=false (or any refactor that makes
    # the two subtrees non-canonical-equal) each subtree could compute
    # DIFFERENT boundaries, bucketing a row one way in the counts path
    # and another in the rank path = silently wrong global ranks. A
    # LAZY local checkpoint pins the 1-row frame to a single cached
    # materialization every subtree reads, while keeping the module's
    # no-driver-action contract (nothing runs until the query does).
    #
    # Residual race (documented per ADVICE r9): a lazy checkpoint only
    # caches on FIRST compute. Single-executor (local mode — the test
    # and gate environment), BlockManager's per-block write lock
    # serializes concurrent computes of the 1-row partition: the
    # second thread blocks, then reads the first's block — no
    # divergence. On a MULTI-executor cluster, two broadcast-exchange
    # jobs scheduled concurrently onto different executors can each
    # compute the partition before either block registers, and the two
    # replicas may disagree. Callers that must be bulletproof in that
    # regime pass ``boundaries=`` (precomputed, e.g. from yesterday's
    # run or a one-off approxQuantile) and the hazard vanishes with
    # the aggregate.
    bounds = bounds.localCheckpoint(eager=False)

    def before(b: Column) -> Column:
        return F.col(col) > b if ascending else F.col(col) < b

    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            _PID,
            F.aggregate(
                "_bs",
                F.lit(0),
                lambda acc, b: acc + F.when(before(b), 1).otherwise(0),
            ),
        )
        .drop("_bs")
    )


def _bucket_offsets(per_bucket: DataFrame, agg_cols: list[str]) -> DataFrame:
    """(pid, off0..offN) where off_i = sum of ``agg_cols[i]`` over all
    SMALLER pids — a triangular self-join over the ≤num_buckets-row
    frame, so the cumulative step needs no window at all."""
    return (
        per_bucket.alias("a")
        .join(
            per_bucket.select(
                F.col(_PID).alias("_bpid"),
                *[
                    F.col(c).alias(f"_bv{i}")
                    for i, c in enumerate(agg_cols)
                ],
            ),
            F.col("_bpid") < F.col(f"a.{_PID}"),
            "left",
        )
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(
            *[
                F.coalesce(F.sum(f"_bv{i}"), F.lit(0)).alias(f"{_OFF}{i}")
                for i in range(len(agg_cols))
            ]
        )
    )


def _local_window(order_by: list[tuple[str, bool]]) -> Window:
    return Window.partitionBy(_PID).orderBy(
        *[
            F.col(c).asc() if asc else F.col(c).desc()
            for c, asc in order_by
        ]
    )


def global_row_number(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    out: str = "rn",
    num_buckets: int = 32,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` without the single
    partition: exact 1-based global rank in the composite ordering.

    ``order_by``: (column, ascending) pairs; the FIRST column drives
    the value bucketing and must be numeric, the rest break ties
    inside the bucket-local window. ``boundaries``: optional explicit
    bucket boundaries (see _with_value_bucket).
    """
    col0, asc0 = order_by[0]
    part = _with_value_bucket(df, col0, asc0, num_buckets, boundaries=boundaries)
    counts = part.groupBy(_PID).agg(F.count(F.lit(1)).alias("_c"))
    offs = _bucket_offsets(counts, ["_c"])
    return (
        part.join(F.broadcast(offs), _PID)
        .withColumn(
            out,
            F.row_number().over(_local_window(order_by))
            + F.col(f"{_OFF}0"),
        )
        .drop(_PID, f"{_OFF}0")
    )


def global_running_sum(
    df: DataFrame,
    value_col: str | list[str],
    order_by: list[tuple[str, bool]],
    out: str | list[str] = "cum",
    num_buckets: int = 32,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    without the single partition: exact inclusive running sum in the
    composite ordering (Pareto / Lorenz cumulative shares, empirical
    CDFs). Accepts several value columns at once — they share the one
    bucketing, offset join, and local window (an ECDF pair costs the
    same plan as a single running sum). ``boundaries``: optional
    explicit bucket boundaries (see _with_value_bucket)."""
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out] if isinstance(out, str) else list(out)
    if len(vcols) != len(outs):
        raise ValueError("global_running_sum: len(value_col) != len(out)")
    col0, asc0 = order_by[0]
    part = _with_value_bucket(
        df, col0, asc0, num_buckets, boundaries=boundaries
    )
    sums = part.groupBy(_PID).agg(
        *[F.sum(v).alias(f"_s{i}") for i, v in enumerate(vcols)]
    )
    offs = _bucket_offsets(sums, [f"_s{i}" for i in range(len(vcols))])
    w = _local_window(order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    res = part.join(F.broadcast(offs), _PID)
    for i, (v, o) in enumerate(zip(vcols, outs)):
        res = res.withColumn(o, F.sum(v).over(w) + F.col(f"{_OFF}{i}"))
    return res.drop(_PID, *[f"{_OFF}{i}" for i in range(len(vcols))])
