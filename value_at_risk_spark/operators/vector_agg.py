"""Element-wise vector aggregation over array columns — SURVEY §2.4 A5/A8.

The reference's group-wise vector sum is MLlib ``Summarizer.sum`` over
``VectorUDT`` (``/root/reference/04_var_aggregation.py:35-41,58-66,
86-94,114-123``; ``05_var_compliance.py:68-75``), and its windowed
mean/covariance are per-row Python UDFs over collected arrays
(``utils/var_udf.py:44-54``). Two native forms here:

- ``vector_sum`` (explode form): posexplode → hash-agg by (keys, pos) →
  re-assemble sorted. Fully native, partial-aggregatable map-side,
  oracle-expressible. Shuffle volume = rows × dim, but each shuffled
  row is (key, int, double) — compact, and the hash agg combines
  map-side so the exchange carries only group × dim rows.
- ``vector_sum_zipwith`` (fold form): aggregate(collect_list(vec), zero,
  zip_with(+)) — single shuffle of whole arrays; better when dim is
  large and groups are few. collect_list order does not matter for a
  commutative elementwise sum (up to FP rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_sum(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    out_col: str = "vec_sum",
    round_to: int | None = None,
) -> DataFrame:
    """Element-wise sum of an array column per group (explode form)."""
    exploded = df.select(
        *group_cols, F.posexplode(vec_col).alias("_pos", "_v")
    )
    summed = exploded.groupBy(*group_cols, "_pos").agg(
        F.sum(F.col("_v").cast("double")).alias("_s")
    )
    return (
        summed.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_s"))).alias("_ps"))
        .select(
            *group_cols,
            F.transform(F.col("_ps"), lambda x: F.round(x["_s"], round_to) if round_to is not None else x["_s"]).alias(out_col),
        )
    )


def vector_sum_zipwith(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    out_col: str = "vec_sum",
) -> DataFrame:
    """Element-wise sum via fold over collect_list (array-at-a-time form)."""
    first_elem = F.element_at(F.col("_vecs"), 1)
    zero = F.transform(first_elem, lambda _: F.lit(0.0))
    folded = F.aggregate(
        F.col("_vecs"),
        zero,
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.collect_list(vec_col).alias("_vecs"))
        .select(*group_cols, folded.alias(out_col))
    )


def vector_mean_cov(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    mean_col: str = "vol_avg",
    cov_col: str = "vol_cov",
    count_col: str | None = None,
) -> DataFrame:
    """Column-wise mean + sample covariance matrix of array rows per group.

    Native replacement for ``compute_avg`` / ``compute_cov``
    (utils/var_udf.py:44-54; pandas ``.cov()`` ⇒ ddof=1 ⇒ covar_samp,
    SURVEY §7.3). Cross-pairs each row's positions (dim² per row) then
    avg / covar_samp by (keys, i, j); reassembles the matrix sorted.

    ``count_col`` (r17, opt-in): additionally emit the per-group input
    ROW count, riding the same aggregation pass — each (keys, i, j)
    cell sees every input row exactly once, so its count IS the row
    count and min over cells propagates it. Callers that previously
    ran a second ``groupBy().count()`` over the same (often expensive)
    input and joined it back (trailing_volatility's bucketized range
    join executed TWICE for exactly this) fold it into one pass.
    """
    pairs = df.select(
        *group_cols,
        F.posexplode(vec_col).alias("_i", "_xi"),
        F.col(vec_col).alias("_vec"),
    ).select(
        *group_cols,
        "_i",
        "_xi",
        F.posexplode("_vec").alias("_j", "_xj"),
    )
    n_aggs = [F.count(F.lit(1)).alias("_vmc_n")] if count_col else []
    stats = pairs.groupBy(*group_cols, "_i", "_j").agg(
        F.avg("_xi").alias("_mean_i"),
        F.covar_samp("_xi", "_xj").alias("_cov_ij"),
        *n_aggs,
    )
    n_rollup1 = [F.min("_vmc_n").alias("_vmc_n")] if count_col else []
    rows = stats.groupBy(*group_cols, "_i").agg(
        F.min("_mean_i").alias("_mean_i"),
        F.array_sort(F.collect_list(F.struct("_j", "_cov_ij"))).alias("_cr"),
        *n_rollup1,
    )
    n_rollup2 = [F.min("_vmc_n").alias("_vmc_n")] if count_col else []
    n_out = [F.col("_vmc_n").alias(count_col)] if count_col else []
    return (
        rows.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_i", "_mean_i", F.col("_cr")))
            ).alias("_m"),
            *n_rollup2,
        )
        .select(
            *group_cols,
            F.transform(F.col("_m"), lambda x: x["_mean_i"]).alias(mean_col),
            F.transform(
                F.col("_m"),
                lambda x: F.transform(x["_cr"], lambda c: c["_cov_ij"]),
            ).alias(cov_col),
            *n_out,
        )
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    ddof: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Sample covariance matrix of a high-dim embedding column →
    (i, j, cov) rows.

    ``vector_mean_cov`` cross-pairs positions per row (dim² rows per
    input row) — right for the VaR pipeline's dim=5 factors, quadratic
    blow-up at embedding dims. This is the 1024-dim-safe path: each
    Arrow batch is reduced in numpy to ONE partial row (n, Σx, flat
    Σxxᵀ) inside ``mapInPandas``, partials (one per batch, ~dim²
    doubles each) combine in a single global fold, and the covariance
    emerges per (i, j) from the moment identity
    cov = (Σxy − n·x̄·ȳ)/(n−ddof). Shuffled bytes = batches × dim²
    doubles — independent of row count; no dim² row explosion ever
    materializes.
    """
    import numpy as np
    import pandas as pd

    from value_at_risk_spark.functions.vector import resolve_dim

    d = resolve_dim(df, vec_col, dim, caller="embedding_covariance")

    def _partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    partials = df.select(vec_col).mapInPandas(
        _partials, schema="n long, s array<double>, ss array<double>"
    )
    zero_d = F.array(*[F.lit(0.0)] * d)
    zero_dd = F.array(*[F.lit(0.0)] * (d * d))
    # array_sort before folding: collect_list order follows task
    # completion order, so an unsorted fold would make the low-order
    # bits of the sums RUN-dependent. Sorting pins the fold order to
    # the partials' values — for a fixed corpus + partitioning the
    # result is bit-reproducible, which downstream consumers that pin
    # golden artifacts (opq_rotation's corpus-keyed rotation, r16)
    # require. Cost: sorting <= #batches tiny arrays on one row.
    fold = partials.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list("s")),
            zero_d,
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("s"),
        F.aggregate(
            F.array_sort(F.collect_list("ss")),
            zero_dd,
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("ss"),
    )
    flat = fold.select(
        "n", "s", F.posexplode("ss").alias("_idx", "_sxy")
    ).select(
        (F.col("_idx") / d).cast("long").alias("i"),
        (F.col("_idx") % d).cast("long").alias("j"),
        # try_divide: n <= ddof (e.g. a single row with sample ddof=1)
        # leaves the covariance statistically undefined -> NULL, not an
        # ANSI DIVIDE_BY_ZERO error
        F.try_divide(
            F.col("_sxy")
            - F.element_at("s", (F.col("_idx") / d).cast("int") + 1)
            * F.element_at("s", (F.col("_idx") % d).cast("int") + 1)
            / F.col("n"),
            F.col("n") - F.lit(ddof),
        ).alias("cov"),
    )
    return flat
