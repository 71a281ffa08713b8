"""MERGE/SCD2 emulation + stateful streaming operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from value_at_risk_spark.operators.merge import scd2_apply, upsert
from value_at_risk_spark.streaming.stateful import running_event_totals
from value_at_risk_spark.streaming.windows import read_events_stream


def test_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (4, "D")], "k long, v string")
    out = {r.k: r.v for r in upsert(target, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_scd2(spark):
    target = spark.createDataFrame(
        [
            (1, "old1", "2020-01-01", "2020-06-01", False),
            (1, "cur1", "2020-06-01", "9999-12-31", True),
            (2, "cur2", "2020-01-01", "9999-12-31", True),
        ],
        "k long, v string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "v",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        "is_current",
    )
    updates = spark.createDataFrame(
        [(1, "new1", "2021-01-01")], "k long, v string, valid_from string"
    ).select("k", "v", F.col("valid_from").cast("date").alias("valid_from"))
    out = scd2_apply(target, updates, ["k"], "valid_from").collect()
    rows = {(r.k, r.v): (str(r.valid_to), r.is_current) for r in out}
    assert rows[(1, "old1")] == ("2020-06-01", False)  # history untouched
    assert rows[(1, "cur1")] == ("2021-01-01", False)  # closed out
    assert rows[(1, "new1")] == ("9999-12-31", True)  # new current
    assert rows[(2, "cur2")] == ("9999-12-31", True)  # untouched key
    assert len(out) == 4


def test_stateful_running_totals(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = running_event_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in spark.table("running_totals_test").collect()
    }
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("t"),
        )
    )
    exp = {r.event_type: (r.n, r.t) for r in batch.collect()}
    assert got == exp


def test_registry_sorted_write_roundtrip(spark, sf_dir, tmp_path):
    from value_at_risk_spark.sources.registry import Registry

    reg = Registry(str(tmp_path))
    src = Registry(sf_dir).read(spark, "orders")
    reg.write(src, "orders_sorted", sort_by=["o_orderdate", "o_orderkey"], num_files=4)
    back = reg.read(spark, "orders_sorted")
    assert back.count() == src.count()
    assert {r.o_orderkey for r in back.select("o_orderkey").collect()} == {
        r.o_orderkey for r in src.select("o_orderkey").collect()
    }


def test_salted_agg_equals_plain(spark, sf_dir):
    from value_at_risk_spark.operators.skew import salted_sum_count
    from value_at_risk_spark.sources.registry import Registry

    e = Registry(sf_dir).read(spark, "events")
    salted = {
        r.event_type: (round(r.total, 6), r.n_rows)
        for r in salted_sum_count(e, ["event_type"], "value").collect()
    }
    plain = {
        r.event_type: (round(r.total, 6), r.n_rows)
        for r in e.groupBy("event_type")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert salted == plain
