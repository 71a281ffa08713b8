"""Skew shoot-out: salted vs plain operators on a Zipf-hot key.

Builds a skewed fact from the events fixture (replicated to ~5 M rows,
user ids remapped so ONE key owns ~30 % of all rows — the verdict's
"#1 real-world killer" shape), then times, on identical data:

1. holistic agg  : plain ``groupBy().agg(collect_list)`` vs
   ``salted_agg`` two-phase (partial lists per salt → flatten) — the
   case salting exists for (no map-side shrink; the hot key's whole
   payload lands on one reducer otherwise);
2. algebraic agg : plain ``sum/count`` vs salted — the HONEST negative
   control (map-side partial aggregation already kills this skew;
   plain should win, and the operator docstring tells users not to
   salt these);
3. join          : plain shuffle join vs ``salted_join`` against a
   non-broadcastable dim, AQE OFF to isolate the mechanism (AQE's
   skew-split is the first line of defense; salting is for the
   pathological single-key case it can't split).

Every pair is asserted VALUE-IDENTICAL before its timing is reported.
Output: a markdown table for PERF.md + one JSON line.

Usage: python tools/perf_skew.py [sf_dir] [target_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from value_at_risk_spark.operators.skew import (  # noqa: E402
    salted_agg,
    salted_join,
    salted_sum_count,
)
from value_at_risk_spark.session import get_spark  # noqa: E402

N_COLD_KEYS = 50_000
RUNS = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_pair(plain_fn, salted_fn) -> tuple[float, float]:
    """Median-of-RUNS for each side, runs INTERLEAVED (plain, salted,
    plain, ...) so box drift hits both sides equally."""
    import statistics

    p, s = [], []
    for _ in range(RUNS):
        t0 = time.time()
        plain_fn()
        p.append(time.time() - t0)
        t0 = time.time()
        salted_fn()
        s.append(time.time() - t0)
    return round(statistics.median(p), 2), round(statistics.median(s), 2)


def build_fact(spark, sf_dir: str, target: int, hot_share: float, out: str):
    base = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    n_base = base.count()
    reps = max(1, target // n_base)
    # replicate to ~target rows, then Zipf-ify: hot_share of rows hash
    # to key 0, the rest spread over N_COLD_KEYS cold keys
    fact = (
        base.crossJoin(spark.range(reps).withColumnRenamed("id", "_rep"))
        .withColumn("_u", F.abs(F.xxhash64("event_id", "_rep")) % 1_000_000)
        .withColumn(
            "user_key",
            F.when(
                F.col("_u") < int(hot_share * 1_000_000), F.lit(0)
            ).otherwise((F.col("_u") % N_COLD_KEYS) + 1),
        )
        .select("user_key", "value", "event_id")
    )
    # 64 input splits: a realistic map-task layout (a 3-file layout
    # serializes the map side and poisons every measurement)
    fact.repartition(64).write.mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    n = fact.count()
    hot = fact.filter(F.col("user_key") == 0).count()
    print(f"fact: {n} rows, hot key share {hot / n:.1%}", flush=True)
    return fact, n, hot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    hot_share = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30

    import shutil
    import tempfile

    spark = get_spark("perf_skew")
    spark.sparkContext.setLogLevel("ERROR")
    # per-run scratch dir (concurrent/stale runs must not collide or
    # measure leftover data), removed on the way out
    scratch = tempfile.mkdtemp(prefix="perf_skew_fact_")
    import atexit

    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    fact, n, hot = build_fact(spark, sf_dir, target, hot_share, scratch)

    results: dict[str, float] = {}

    # -- 1. holistic aggregate: collect_list ---------------------------
    plain_hol = fact.groupBy("user_key").agg(
        F.size(F.collect_list("value")).alias("n_vals"),
        F.round(F.sum("value"), 4).alias("s"),
    )
    salted_hol = salted_agg(
        fact,
        ["user_key"],
        [F.collect_list("value").alias("_l"), F.sum("value").alias("_s")],
        lambda: [
            F.size(F.flatten(F.collect_list("_l"))).alias("n_vals"),
            F.round(F.sum("_s"), 4).alias("s"),
        ],
        salt_buckets=32,
    )
    assert sorted(map(tuple, plain_hol.collect())) == sorted(
        map(tuple, salted_hol.collect())
    ), "holistic: salted != plain"
    results["holistic_plain_sec"], results["holistic_salted_sec"] = timed_pair(
        lambda: force(plain_hol), lambda: force(salted_hol)
    )

    # -- 2. algebraic aggregate: sum/count (negative control) ----------
    plain_alg = fact.groupBy("user_key").agg(
        F.round(F.sum("value"), 4).alias("total"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    salted_alg = salted_sum_count(fact, ["user_key"], "value").select(
        "user_key", F.round("total", 4).alias("total"), "n_rows"
    )
    assert sorted(map(tuple, plain_alg.collect())) == sorted(
        map(tuple, salted_alg.collect())
    ), "algebraic: salted != plain"
    results["algebraic_plain_sec"], results["algebraic_salted_sec"] = (
        timed_pair(lambda: force(plain_alg), lambda: force(salted_alg))
    )

    # -- 3. join vs a non-broadcastable dim, AQE off -------------------
    dim = (
        spark.range(N_COLD_KEYS + 1)
        .withColumnRenamed("id", "user_key")
        .withColumn("attr", F.md5(F.col("user_key").cast("string")))
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain_join = fact.join(dim, ["user_key"])
        salted = salted_join(fact, dim, ["user_key"], salt_buckets=32)
        pj = plain_join.groupBy().agg(
            F.count(F.lit(1)), F.round(F.sum("value"), 2)
        ).first()
        sj = salted.groupBy().agg(
            F.count(F.lit(1)), F.round(F.sum("value"), 2)
        ).first()
        assert tuple(pj) == tuple(sj), "join: salted != plain"
        results["join_plain_sec"], results["join_salted_sec"] = timed_pair(
            lambda: force(plain_join), lambda: force(salted)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)

    print("\n| case | plain (s) | salted (s) | winner |")
    print("|---|---|---|---|")
    for case in ("holistic", "algebraic", "join"):
        p, s = results[f"{case}_plain_sec"], results[f"{case}_salted_sec"]
        print(
            f"| {case} | {p} | {s} | "
            f"{'salted' if s < p else 'plain'} {max(p, s) / min(p, s):.1f}x |"
        )
    print(
        json.dumps(
            {"rows": n, "hot_share": round(hot / n, 3), **results}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
