"""Structured Streaming tier — SURVEY §2.9.

The reference is batch-only but explicitly anticipates incremental
operation (/root/reference/config/application.yaml:2-3 "may at some
point run incrementally"; 01_var_market_etl.py:159 "each insert of our
table is 'joined' with last X days"). The natural streaming candidates
are its trailing windows (W1 volatility, W2 Basel): here they map to
event-time windowed aggregation with watermarked late-data handling.

Batch/stream parity contract: ``daily_event_aggregates`` over a
bounded replay (``availableNow`` trigger) must equal the equivalent
batch groupBy — asserted in tests/test_streaming.py, and since round 8
ALSO hash-checked at the gate (a bounded replay of a fixed fixture is
deterministic, so the windowed-agg, dedup, and interval-join gate
queries carry DuckDB batch twins; only the stateful MG/Basel demos
remain rows-only, their batch_seq/emission contracts being genuinely
stream-shaped).

Scale notes: state size is bounded by (watermark horizon × key
cardinality); shuffle partitioning of the windowed agg follows
spark.sql.shuffle.partitions; for sliding windows Spark stores one
state row per (key, window) — at 100 TB/day ingest, key-salt hot event
types and use ``spark.sql.streaming.statefulOperator.stateRebalancing``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from value_at_risk_spark.functions.timeutil import epoch_seconds


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture directory.

    Schema comes from a batch scan (a stream needs an explicit schema);
    the TIMESTAMP(NANOS) `ts` arrives as long under nanosAsLong and is
    re-derived to a microsecond timestamp, mirroring sources.registry.
    """
    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the file source requires a directory; stream the parent with a
    # glob filter so only the events file is picked up
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema.fields).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # withWatermark requires TIMESTAMP; pin the naive wall-clock
        # reading to the UTC instant (tz-free, matches the batch twin
        # and the DuckDB oracle's naive-as-UTC epoch)
        stream = stream.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    return stream


def daily_event_aggregates(
    events: DataFrame, watermark: str = "2 days"
) -> DataFrame:
    """Watermarked daily tumbling-window aggregate per event type.

    The streaming analogue of pivot_events_daily / the reference's
    trailing-window inserts: one state row per (day, event_type);
    late rows beyond the watermark are dropped deterministically.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(df: DataFrame, name: str) -> DataFrame:
    """Execute a bounded replay of a streaming frame into a memory sink
    and return the materialized batch result."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"run_available_now({name!r}): replay exceeded 120s")
    return df.sparkSession.table(name)


def dedup_stream(
    events: DataFrame, key_cols: list[str], watermark: str = "1 day"
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state.

    Plain ``dropDuplicates(keys)`` only evicts state when the event-time
    column is itself one of the keys; with business keys like
    ``event_id`` alone, state grows without bound. Spark's
    ``dropDuplicatesWithinWatermark`` dedups on the business keys while
    evicting each key's state once the watermark passes its event time —
    the shape that survives an unbounded stream. The streaming
    counterpart of operators/dedup.exact_dedup (at-most-once per key
    within the watermark horizon)."""
    wm = events.withWatermark("ts", watermark)
    return wm.dropDuplicatesWithinWatermark(key_cols)


def session_windows_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming sessionization with the native session_window.

    The streaming twin of queries.session_windows_native: per-user
    gap-merged sessions over event time. A session's state row lives
    until the watermark passes its close (start of a new gap), so state
    is bounded by (watermark horizon × active users) — the shape that
    survives an unbounded clickstream. Late rows inside the watermark
    re-open/merge sessions exactly as batch semantics dictate; a
    bounded replay therefore equals the batch session_window groupBy
    (asserted in tests/test_streaming.py).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_seconds(F.col("w.start")).alias("sess_start_s"),
            epoch_seconds(F.col("w.end")).alias("sess_end_s"),
            "n_events",
        )
    )


def sliding_event_aggregates(
    events: DataFrame,
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked SLIDING event-time aggregate per event type — the
    streaming form SURVEY §2.9 sketches for the trailing-window
    volatility (W1: every day sees stats over its trailing window).
    One state row per (window, key); window/slide are independent, so
    each event updates window/slide overlapping state rows — state is
    bounded by (watermark + window) / slide windows per key.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("win_start"),
            F.col("w.end").cast("date").alias("win_end"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )
