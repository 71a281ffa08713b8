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
    shutil.rmtree(src, ignore_errors=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
