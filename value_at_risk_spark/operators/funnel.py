"""Funnel analysis — ordered-stage conversion over an event stream.

The product-analytics staple: of the users who did stage 1, how many
later did stage 2, then stage 3? "Later" is the load-bearing word — a
purchase BEFORE the first view must not count as a conversion, so each
stage anchors on the user's FIRST qualifying event strictly after the
previous stage's anchor.

Plan shape: stage 1 is one filtered grouped-min; each later stage is a
user-keyed equi-join against the previous anchors plus a grouped min —
every shuffle in the chain is hash-partitioned on the user key, so a
k-stage funnel over 100 TB of events is k-1 co-partitioned joins whose
left side shrinks monotonically (each stage's anchor table only loses
users). The final report reduces the anchors to k scalar counts.

Reference intent: SURVEY §2.5's sessionization family (reference event
windows, 01_var_market_etl.py:167-175) — the funnel is the ordered
cross-event-type sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_anchors(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """Per-stage anchor frames: (user, t) where t is the user's first
    stage-k event strictly after their stage-(k-1) anchor."""
    anchors: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(prev, "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        anchors.append(cur)
        prev = cur
    return anchors


def funnel_report(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, stage_order, n_users, conversion) — conversion is the
    share of the previous stage's users who reached this one (NULL for
    stage 1: there is no previous stage, and inventing 1.0 would hide
    a zero-entry funnel)."""
    anchors = funnel_anchors(events, stages, user_col, ts_col, type_col)
    counts = [a.agg(F.count(F.lit(1)).alias(f"n{i}")) for i, a in enumerate(anchors)]
    joined = counts[0]
    for c in counts[1:]:
        joined = joined.crossJoin(c)
    rows = []
    for i, stage in enumerate(stages):
        conv = (
            F.lit(None).cast("double")
            if i == 0
            else F.round(
                F.try_divide(F.col(f"n{i}"), F.col(f"n{i - 1}")), 6
            )
            + F.lit(0.0)
        )
        rows.append(
            F.struct(
                F.lit(stage).alias("stage"),
                F.lit(i + 1).alias("stage_order"),
                F.col(f"n{i}").cast("long").alias("n_users"),
                conv.alias("conversion"),
            )
        )
    return joined.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
