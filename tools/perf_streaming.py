"""Streaming-tier throughput study: rows/sec through the main
stateful/windowed operators on a bounded availableNow replay.

Three representative paths over the sf events fixture (replicated
REPS=10x with shifted ids/users to ~1M rows so per-batch overhead is
amortized):

1. windowed: watermarked daily event-time aggregation (the W1/W2
   streaming analogue) — Spark's native windowed-state path;
2. sessionize: applyInPandasWithState arbitrary-state sessionization
   (the custom-operator path, Arrow-batched Python);
3. sink: the same windowed aggregation delivered through the
   exactly-once IdempotentParquetSink (adds the transactional write).

Prints one JSON line with wall seconds and rows/sec for each. One run
each — this is a regression tracker; micro-variance is covered by the
bench calibration discussion in PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from value_at_risk_spark.session import get_spark  # noqa: E402
from value_at_risk_spark.sources.registry import Registry  # noqa: E402
from value_at_risk_spark.streaming.sinks import IdempotentParquetSink  # noqa: E402
from value_at_risk_spark.streaming.stateful import sessionize_stateful  # noqa: E402
from value_at_risk_spark.streaming.windows import daily_event_aggregates  # noqa: E402

REPS = int(os.environ.get("REPS", "10"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("perf-streaming")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = Registry(sf_dir).read(spark, "events")
    n_base = base.count()

    src = tempfile.mkdtemp(prefix="perf_stream_src_")
    scaled = None
    for i in range(REPS):
        rep = base.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 10**9)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * 10**6))
        scaled = rep if scaled is None else scaled.unionByName(rep)
    scaled.write.mode("overwrite").parquet(src)
    n_rows = n_base * REPS

    schema = spark.read.parquet(src).schema
    ts_ntz = any(
        f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz"
        for f in schema.fields
    )

    def stream():
        s = spark.readStream.schema(schema).parquet(src)
        if ts_ntz:
            # withWatermark requires TIMESTAMP; pin naive-as-UTC like
            # streaming/windows.read_events_stream
            s = s.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
        return s

    results = {"input_rows": n_rows}

    def run(df, name, sink_fn=None, mode="update"):
        q_name = f"perf_{name}_{uuid.uuid4().hex[:6]}"
        ckpt = tempfile.mkdtemp(prefix=f"perf_ck_{name}_")
        t0 = time.time()
        if sink_fn is not None:
            q = (
                df.writeStream.foreachBatch(sink_fn)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
        else:
            q = (
                df.writeStream.format("noop")
                .queryName(q_name)
                .option("checkpointLocation", ckpt)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
        assert q.awaitTermination(600), name
        sec = round(time.time() - t0, 2)
        shutil.rmtree(ckpt, ignore_errors=True)
        results[f"{name}_sec"] = sec
        results[f"{name}_rows_per_sec"] = int(n_rows / sec)

    windowed = daily_event_aggregates(stream())
    run(windowed, "windowed_agg")

    sess = sessionize_stateful(
        stream().withWatermark("ts", "2 days"), gap_seconds=1800
    )
    run(sess, "sessionize_state", mode="append")

    out_dir = tempfile.mkdtemp(prefix="perf_sink_out_")
    sink = IdempotentParquetSink(out_dir)
    run(daily_event_aggregates(stream()), "windowed_to_sink", sink_fn=sink)
    shutil.rmtree(out_dir, ignore_errors=True)

    results.update(sustained_batches(spark, scaled, schema, ts_ntz))
    results.update(delta_sink_sustained(spark))
    results.update(delta_source_sustained(spark))
    results.update(delta_cdf_dv_sustained(spark))
    shutil.rmtree(src, ignore_errors=True)

    print(json.dumps(results))


SINK_BATCHES = int(os.environ.get("SINK_BATCHES", "48"))


def delta_sink_sustained(spark) -> dict:
    """Per-commit latency of the exactly-once native-delta streaming
    sink over SINK_BATCHES direct foreachBatch deliveries (round-10:
    the txn dedup runs inside write_delta's commit loop, and the sink
    auto-checkpoints every 16 commits, so this series must be FLAT —
    replay cost is O(commits since checkpoint), not O(total commits)).
    Reported as 8-batch bucket medians; the PERF.md round-10 entry is
    regenerated from this."""
    import statistics

    from value_at_risk_spark.streaming.sinks import DeltaTxnSink

    tbl = tempfile.mkdtemp(prefix="perf_delta_sink_")
    shutil.rmtree(tbl, ignore_errors=True)
    df = spark.range(10_000).selectExpr("id", "id % 7 as k")
    sink = DeltaTxnSink(tbl, app_id="perf_sustained")
    lat = []
    for b in range(SINK_BATCHES):
        t0 = time.time()
        sink(df, b)
        lat.append(round(time.time() - t0, 3))
    rows = sink.read(spark).count()
    shutil.rmtree(tbl, ignore_errors=True)
    return {
        "delta_sink_batches": SINK_BATCHES,
        "delta_sink_rows": rows,
        "delta_sink_bucket_medians": [
            round(statistics.median(lat[i : i + 8]), 3)
            for i in range(0, len(lat), 8)
        ],
    }


SOURCE_COMMITS = int(os.environ.get("SOURCE_COMMITS", "24"))


def delta_source_sustained(spark) -> dict:
    """Sustained consumption through the deltalog STREAM SOURCE
    (round-11): a table takes SOURCE_COMMITS appends, then one
    availableNow query with maxVersionsPerBatch=1 drains it — one
    micro-batch per commit. Reports per-batch trigger latency bucket
    medians and total rows/sec; the series must be flat (each batch
    reads only its commit's files; snapshot resolution is O(commits
    since checkpoint), and a checkpoint lands mid-way to prove the
    replay-cost reset)."""
    import statistics

    from value_at_risk_spark.sources.delta_datasource import (
        register_deltalog_source,
    )
    from value_at_risk_spark.sources.deltalog import (
        checkpoint_delta,
        write_delta,
    )

    register_deltalog_source(spark)
    tbl = tempfile.mkdtemp(prefix="perf_delta_source_")
    shutil.rmtree(tbl, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="perf_delta_source_ckpt_")
    per_commit = 25_000
    base = spark.range(per_commit).selectExpr("id", "id % 7 as k")
    for c in range(SOURCE_COMMITS):
        write_delta(
            spark, base.selectExpr(f"id + {c * per_commit} as id", "k"), tbl
        )
        if c == SOURCE_COMMITS // 2:
            checkpoint_delta(tbl)

    seen = {"rows": 0, "batches": 0}
    lat: list[float] = []

    def sink(bdf, _bid):
        t0 = time.time()
        seen["rows"] += bdf.count()
        seen["batches"] += 1
        lat.append(round(time.time() - t0, 3))

    t_all = time.time()
    # ONE continuous query (availableNow would restart per capped
    # batch, measuring query startup instead of the source): the
    # processingTime trigger keeps pulling capped micro-batches until
    # the backlog drains, then we stop it
    q = (
        spark.readStream.format("deltalog")
        .option("startingVersion", 0)
        .option("maxVersionsPerBatch", 1)
        .load(tbl)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 300
    while (
        seen["rows"] < per_commit * (SOURCE_COMMITS - 1)
        and time.time() < deadline
    ):
        time.sleep(0.25)
    q.stop()
    wall = time.time() - t_all
    shutil.rmtree(tbl, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "delta_source_commits": SOURCE_COMMITS,
        "delta_source_rows": seen["rows"],
        "delta_source_batches": seen["batches"],
        "delta_source_wall_sec": round(wall, 2),
        "delta_source_rows_per_sec": int(seen["rows"] / wall),
        "delta_source_bucket_medians": [
            round(statistics.median(lat[i : i + 8]), 3)
            for i in range(0, len(lat), 8)
        ],
    }


def delta_cdf_dv_sustained(spark) -> dict:
    """Round-12 arm: a CDF stream off a native delta table RECEIVING
    MERGE-ON-READ DV DELETES between appends — the shape the r11
    streaming-CDF fixes (DV-delete cdc derivation) are gated for but
    never measured under sustained load. The table takes an
    append/DV-delete/append/... commit walk (every delete masks rows
    via bitmaps, zero files rewritten), then ONE continuous CDF query
    with maxVersionsPerBatch=1 drains it commit-by-commit. Reports
    per-batch latency bucket medians (must stay flat — a delete
    batch's cdc derivation reads only the DV'd files), change-row
    throughput, and the per-change-type row counts (inserts from the
    appends + exactly the deleted rows as 'delete' changes)."""
    import statistics

    from value_at_risk_spark.sources.delta_datasource import (
        register_deltalog_source,
    )
    from value_at_risk_spark.sources.deltalog import (
        delete_from_delta,
        write_delta,
    )

    register_deltalog_source(spark)
    tbl = tempfile.mkdtemp(prefix="perf_delta_cdfdv_")
    shutil.rmtree(tbl, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="perf_delta_cdfdv_ckpt_")
    per_commit = 25_000
    appends = SOURCE_COMMITS // 2
    base = spark.range(per_commit).selectExpr("id", "id % 7 as k")
    expect_changes = 0
    n_deletes = 0
    for c in range(appends):
        write_delta(
            spark,
            base.selectExpr(f"id + {c * per_commit} as id", "k"),
            tbl,
            configuration=(
                {
                    "delta.enableChangeDataFeed": "true",
                    "delta.enableDeletionVectors": "true",
                }
                if c == 0
                else None
            ),
        )
        if c > 0:
            # the streaming source's startingVersion=n consumes
            # commits AFTER n (documented offset semantics) — v0's
            # snapshot rows are not part of the change stream
            expect_changes += per_commit
        if c % 2 == 1:
            # mask ~1/7 of the two newest appends' rows, bitmaps only
            lo, hi = (c - 1) * per_commit, (c + 1) * per_commit
            r = delete_from_delta(
                spark, tbl, f"k = {c % 7} and id >= {lo} and id < {hi}"
            )
            assert r["files_rewritten"] == 0
            expect_changes += r["rows_deleted"]
            n_deletes += 1

    seen = {"rows": 0, "batches": 0}
    by_type: dict[str, int] = {}
    lat: list[float] = []

    def sink(bdf, _bid):
        t0 = time.time()
        for row in bdf.groupBy("_change_type").count().collect():
            by_type[row[0]] = by_type.get(row[0], 0) + row[1]
            seen["rows"] += row[1]
        seen["batches"] += 1
        lat.append(round(time.time() - t0, 3))

    t_all = time.time()
    q = (
        spark.readStream.format("deltalog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .option("maxVersionsPerBatch", 1)
        .load(tbl)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 300
    while seen["rows"] < expect_changes and time.time() < deadline:
        time.sleep(0.25)
    q.stop()
    wall = time.time() - t_all
    shutil.rmtree(tbl, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "cdfdv_commits": appends + n_deletes,
        "cdfdv_expected_change_rows": expect_changes,
        "cdfdv_change_rows": seen["rows"],
        "cdfdv_rows_by_type": dict(sorted(by_type.items())),
        "cdfdv_batches": seen["batches"],
        "cdfdv_wall_sec": round(wall, 2),
        "cdfdv_change_rows_per_sec": int(seen["rows"] / max(wall, 1e-9)),
        "cdfdv_bucket_medians": [
            round(statistics.median(lat[i : i + 4]), 3)
            for i in range(0, len(lat), 4)
        ],
    }


N_BATCHES = int(os.environ.get("N_BATCHES", "12"))


def sustained_batches(spark, scaled, schema, ts_ntz) -> dict:
    """Multi-batch sustained-rate evidence (round-8 verdict #6): the
    one-shot availableNow replays above measure end-to-end wall time
    only. Here the SAME corpus replays in ``N_BATCHES`` time-ordered
    micro-batches — the source dir is written slice-by-slice in event
    -time order (FileStreamSource picks files by modification time, so
    sequential writes make batch order == event-time order) with
    ``maxFilesPerTrigger=1`` — and each batch's trigger latency, input
    rows, and STATE-STORE ROWS are read from the query's progress
    events. This turns the "state is bounded by the watermark" claim
    (streaming/stateful.sessionize_stateful, windows.dedup_stream)
    into a measured series: state rows must plateau as the watermark
    advances and evicts, not grow linearly with batches."""
    from value_at_risk_spark.streaming.windows import dedup_stream

    src = tempfile.mkdtemp(prefix="perf_stream_batches_")
    with_epoch = scaled.withColumn(
        "_e", F.unix_timestamp(F.col("ts").cast("timestamp"))
    )
    bounds = with_epoch.groupBy().agg(
        F.percentile_approx(
            "_e", [i / N_BATCHES for i in range(1, N_BATCHES)], 200
        ).alias("b")
    ).first()[0]
    lo = [None, *bounds]
    hi = [*bounds, None]
    for i in range(N_BATCHES):
        part = with_epoch
        if lo[i] is not None:
            part = part.filter(F.col("_e") > lo[i])
        if hi[i] is not None:
            part = part.filter(F.col("_e") <= hi[i])
        part.drop("_e").coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    def stream():
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        if ts_ntz:
            s = s.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
        return s

    out: dict = {}

    def run_batched(df, name, mode):
        ckpt = tempfile.mkdtemp(prefix=f"perf_ckb_{name}_")
        q = (
            df.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), name
        rows = []
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            rows.append(
                {
                    "batch": p.get("batchId"),
                    "sec": round(
                        (p.get("durationMs") or {}).get(
                            "triggerExecution", 0
                        )
                        / 1000.0,
                        2,
                    ),
                    "input_rows": p.get("numInputRows"),
                    "state_rows": ops[0].get("numRowsTotal")
                    if ops
                    else None,
                    "state_updated": ops[0].get("numRowsUpdated")
                    if ops
                    else None,
                }
            )
        shutil.rmtree(ckpt, ignore_errors=True)
        out[f"{name}_batches"] = rows

    run_batched(
        sessionize_stateful(
            stream().withWatermark("ts", "1 day"), gap_seconds=1800
        ),
        "sessionize",
        "append",
    )
    run_batched(
        dedup_stream(stream(), ["event_id"], watermark="1 day"),
        "dedup",
        "append",
    )
    shutil.rmtree(src, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
