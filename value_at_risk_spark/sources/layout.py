"""Multi-dimensional clustering layout — the ZORDER analogue (S5).

The reference runs ``OPTIMIZE ... ZORDER BY (date, ticker)`` after its
Monte-Carlo write (``/root/reference/03_var_monte_carlo.py:162``) so
slices on EITHER column prune well. A single-column sort only clusters
the leading key; the Z-order (Morton) curve interleaves the bits of
all cluster keys, so files/row-groups are locality-preserving in every
dimension and parquet min/max stats skip on any of them.

All expressions are flat bit arithmetic (codegen-friendly, no HOFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by linear rank against the
    [lo, hi] bounds (degenerate hi == lo maps to 0)."""
    span = hi - lo
    max_v = float((1 << bits) - 1)
    scaled = F.when(
        span > 0, ((col.cast("double") - lo) / span * max_v)
    ).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def zorder_key(
    cols: list[Column],
    bounds: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton key: interleave the ``bits``-bit ranks of 2-3 columns.

    bounds[i] = (min, max) of cols[i] (computed once by the caller —
    one tiny aggregate). Total key width = len(cols)·bits ≤ 63.
    """
    n = len(cols)
    if not 2 <= n <= 3:
        raise ValueError("zorder_key: 2 or 3 cluster columns")
    if n * bits > 63:
        raise ValueError("zorder_key: n*bits must fit a signed long")
    ranks = [
        _scale_to_bits(c, F.lit(float(lo)), F.lit(float(hi)), bits)
        for c, (lo, hi) in zip(cols, bounds)
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            # bit b of rank i (as 0/1) lands at position b*n + i
            bit01 = F.shiftright(r, b).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit01, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order curve of ``zorder_cols``.

    One bounds aggregate (tiny, driver-side), then
    ``repartitionByRange`` on the Morton key (range partitioning keeps
    the curve contiguous per file — hash would scatter it) and a
    within-partition sort, so every file/row-group covers a compact
    hyper-rectangle and min/max stats prune on ANY cluster column.
    """
    aggs = []
    for c in zorder_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    b = df.agg(*aggs).first()
    bounds = [(b[f"_lo_{c}"], b[f"_hi_{c}"]) for c in zorder_cols]
    if any(lo is None or hi is None for lo, hi in bounds):
        raise ValueError(
            "write_zordered: empty input or all-NULL cluster column "
            f"(bounds {dict(zip(zorder_cols, bounds))}); "
            "write unclustered instead"
        )
    z = zorder_key([F.col(c) for c in zorder_cols], bounds, bits)
    out = df.withColumn("_z", z)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    out = out.repartitionByRange(n, "_z").sortWithinPartitions("_z")
    out.drop("_z").write.mode(mode).parquet(path)
