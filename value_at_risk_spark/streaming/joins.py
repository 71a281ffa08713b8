"""Stream-stream joins — SURVEY §2.9 (engine extension).

The reference's batch as-of/time-interval joins (01_var_market_etl.py's
"each insert joined with last X days") have a genuinely streaming
counterpart in Spark: the watermarked stream-stream INTERVAL join. Both
sides are unbounded; Spark buffers each side's rows in state and joins
them as they arrive, using the event-time bound in the join condition
plus the watermark to evict state deterministically — the distributed
form of "join each record with the other stream's last X minutes".

Scale notes: state per side ≈ (watermark horizon + interval span) ×
arrival rate, hash-partitioned on the equality key — bounded and
independent of stream length. Without BOTH an equality key and a
two-sided time bound, Spark cannot bound state and rejects the plan
(or buffers forever in outer modes); this module's API makes those
required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    lookback_seconds: int = 3600,
    watermark: str = "1 day",
) -> DataFrame:
    """Inner stream-stream join: each left row pairs with right rows of
    the same ``by`` key whose event time falls in
    ``[left.ts - lookback, left.ts]`` (the trailing-window join shape).

    Output: left columns prefixed ``l_``, right prefixed ``r_`` (both
    sides share a schema in the self-join case, so prefixing is the
    collision-safe contract).
    """
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    l = lw.select(
        [F.col(c).alias(f"l_{c}") for c in lw.columns]
    )
    r = rw.select(
        [F.col(c).alias(f"r_{c}") for c in rw.columns]
    )
    cond = (
        (F.col(f"l_{by}") == F.col(f"r_{by}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}") - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
        & (F.col(f"r_{ts_col}") <= F.col(f"l_{ts_col}"))
    )
    return l.join(r, cond, "inner")


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment — the dimension-lookup half of every
    streaming pipeline (events joined to a reference/metadata table).

    Unlike stream-stream joins this is STATELESS: the static side is
    re-planned per micro-batch (so a dimension refreshed on disk is
    picked up batch-over-batch when the static frame is a file scan),
    nothing is watermarked, and no join state accumulates. With
    ``broadcast_dim`` the lookup ships as a broadcast hash join inside
    each micro-batch — per-batch cost is one hash build of the dim,
    zero shuffle of the stream — which is the only sane plan while the
    dimension fits an executor; disable it to let AQE pick a shuffle
    join for jumbo dims.

    Left join by default: an event with no dimension row must survive
    with NULLs (dropping events because metadata lagged is a silent
    data-loss bug).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
