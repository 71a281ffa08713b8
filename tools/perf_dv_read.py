"""Deletion-vector read-side cost vs deleted fraction.

Merge-on-read defers work to the scan: every read of a DV'd file
pays row-index materialization + mask. This probe builds one ~6M-row
table (lineitem at sf0.1 replicated 10x) and measures the FULL-scan
count through both read paths at increasing deleted fractions
(cumulative modulus deletes), then after REORG PURGE — the number
that tells you the purge cadence. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from value_at_risk_spark.session import get_spark  # noqa: E402
from value_at_risk_spark.sources.delta_datasource import (  # noqa: E402
    register_deltalog_source,
)
from value_at_risk_spark.sources.deltalog import (  # noqa: E402
    delete_from_delta,
    purge_deletion_vectors,
    read_delta,
    write_delta,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PERF_DV_REPS", "10"))


def main() -> None:
    spark = get_spark()
    register_deltalog_source(spark)
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    rep = spark.range(REPS).select(F.col("id").alias("_rep"))
    big = (
        li.crossJoin(F.broadcast(rep))
        .select(
            (F.col("l_orderkey") + F.col("_rep") * 10_000_000).alias("k"),
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
        )
        .persist()
    )
    n = big.count()
    tbl = tempfile.mkdtemp(prefix="perf_dv_read_")
    shutil.rmtree(tbl, ignore_errors=True)
    out: dict = {"rows": n, "sf_dir": SF_DIR}
    try:
        write_delta(
            spark,
            big.repartition(16),
            tbl,
            configuration={"delta.enableDeletionVectors": "true"},
        )
        # clean-table baselines
        t0 = time.perf_counter()
        assert read_delta(spark, tbl).count() == n
        out["read_clean_native_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        assert spark.read.format("deltalog").load(tbl).count() == n
        out["read_clean_ds_sec"] = round(time.perf_counter() - t0, 3)

        # cumulative deleted fractions via modulus predicates
        steps = []
        for mod, label in ((1000, "0.1pct"), (100, "1pct"), (10, "10pct"),
                           (3, "33pct")):
            t0 = time.perf_counter()
            r = delete_from_delta(spark, tbl, f"k % {mod} = 0")
            d_sec = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            live_native = read_delta(spark, tbl).count()
            rn = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            live_ds = spark.read.format("deltalog").load(tbl).count()
            rd = round(time.perf_counter() - t0, 3)
            assert live_native == live_ds
            steps.append(
                {
                    "label": label,
                    "delete_sec": d_sec,
                    "rows_deleted": r["rows_deleted"],
                    "live_rows": live_native,
                    "deleted_frac": round(1 - live_native / n, 4),
                    "read_native_sec": rn,
                    "read_ds_sec": rd,
                }
            )
        out["steps"] = steps
        t0 = time.perf_counter()
        p = purge_deletion_vectors(spark, tbl)
        out["purge_sec"] = round(time.perf_counter() - t0, 3)
        out["purge_files"] = p["files_rewritten"]
        t0 = time.perf_counter()
        assert read_delta(spark, tbl).count() == steps[-1]["live_rows"]
        out["read_after_purge_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tbl, ignore_errors=True)
        big.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
