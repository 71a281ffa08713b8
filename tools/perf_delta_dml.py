"""Delta DML scale study: the file-level copy-on-write payoff.

Builds a ~1.5M-row native delta table (lineitem at sf0.1 replicated
10x with shifted keys, like the bench's other scaled10 rows) committed
as 20 appends so the active set holds enough files for selective DML
to show its shape, then measures:

1. delete_narrow  — DELETE matching ~1 file (one key range): the
   identification scan + a rewrite of ONLY the touched files;
2. delete_broad   — DELETE matching every file (a global predicate):
   the worst case, bounded below by one full rewrite;
3. update_narrow  — UPDATE of one key range;
4. full_rewrite   — merge_into_delta_native-style whole-set overwrite
   of the same table (the no-file-skipping baseline the narrow ops
   must beat);
5. ds_write / native_write — the Python Data Source write path vs
   write_delta on the same 1.5M rows (stage-parallel parity check);
6. ds_read / native_read — full-scan counts through both read paths.

Prints one JSON line. One run each — a regression tracker, not a
micro-benchmark.
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
    read_delta,
    snapshot,
    update_delta,
    write_delta,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PERF_DELTA_REPS", "10"))
COMMITS = int(os.environ.get("PERF_DELTA_COMMITS", "20"))


def main() -> None:
    spark = get_spark()
    register_deltalog_source(spark)
    out: dict = {"sf_dir": SF_DIR, "reps": REPS, "commits": COMMITS}

    li = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )
    n_src = li.count()
    rep = spark.range(REPS).select(F.col("id").alias("_rep"))
    big = (
        li.crossJoin(F.broadcast(rep))
        .select(
            (F.col("l_orderkey") + F.col("_rep") * 10_000_000).alias("k"),
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
        )
    ).persist()
    n = big.count()
    out["rows"] = n
    assert n == n_src * REPS

    tbl = tempfile.mkdtemp(prefix="perf_dml_")
    shutil.rmtree(tbl, ignore_errors=True)
    try:
        # native write, COMMITS appends of CONTIGUOUS key ranges — the
        # clustered layout ZORDER/ingest-time ordering gives a real
        # table, so per-file stats can actually prune
        t0 = time.perf_counter()
        lo, hi = 0, REPS * 10_000_000
        step = (hi - lo) // COMMITS
        for c in range(COMMITS):
            write_delta(
                spark,
                big.filter(
                    (F.col("k") >= lo + c * step)
                    & (F.col("k") < (hi if c == COMMITS - 1 else lo + (c + 1) * step))
                ),
                tbl,
            )
        out["native_write_sec"] = round(time.perf_counter() - t0, 3)
        out["files"] = len(snapshot(tbl).files)

        t0 = time.perf_counter()
        out["native_read_rows"] = read_delta(spark, tbl).count()
        out["native_read_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        out["ds_read_rows"] = (
            spark.read.format("deltalog").load(tbl).count()
        )
        out["ds_read_sec"] = round(time.perf_counter() - t0, 3)

        # narrow DELETE: one replica's low-key slice (~1/200 of rows,
        # localized in the files of a few commits)
        t0 = time.perf_counter()
        r = delete_from_delta(
            spark, tbl, "k < 30000", stats_filters=[("k", "<", 30000)]
        )
        out["delete_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["delete_narrow"] = r

        # narrow UPDATE on another slice
        t0 = time.perf_counter()
        r = update_delta(
            spark,
            tbl,
            "k >= 10000000 AND k < 10030000",
            {"l_quantity": "l_quantity + 1"},
            stats_filters=[("k", ">=", 10000000), ("k", "<", 10030000)],
        )
        out["update_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["update_narrow"] = r

        # broad DELETE: a predicate touching every file
        t0 = time.perf_counter()
        r = delete_from_delta(spark, tbl, "k % 97 = 0")
        out["delete_broad_sec"] = round(time.perf_counter() - t0, 3)
        out["delete_broad"] = r

        # the no-skipping baseline: whole-active-set rewrite
        t0 = time.perf_counter()
        cur = read_delta(spark, tbl)
        write_delta(spark, cur, tbl, mode="overwrite")
        out["full_rewrite_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tbl, ignore_errors=True)

    # CDF overhead: the SAME 20-commit table with
    # delta.enableChangeDataFeed, the SAME narrow DML predicates — the
    # delta vs the rows above is the cost of staging change files
    # (one extra bounded scan of the touched files per DML), then the
    # change-feed read itself (bounded by the DML's change files)
    tbl3 = tempfile.mkdtemp(prefix="perf_dml_cdf_")
    shutil.rmtree(tbl3, ignore_errors=True)
    try:
        lo, hi = 0, REPS * 10_000_000
        step = (hi - lo) // COMMITS
        for c in range(COMMITS):
            write_delta(
                spark,
                big.filter(
                    (F.col("k") >= lo + c * step)
                    & (
                        F.col("k")
                        < (hi if c == COMMITS - 1 else lo + (c + 1) * step)
                    )
                ),
                tbl3,
                configuration=(
                    {"delta.enableChangeDataFeed": "true"}
                    if c == 0
                    else None
                ),
            )
        t0 = time.perf_counter()
        r = delete_from_delta(
            spark, tbl3, "k < 30000", stats_filters=[("k", "<", 30000)]
        )
        out["cdf_delete_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["cdf_delete_narrow"] = r
        t0 = time.perf_counter()
        r = update_delta(
            spark,
            tbl3,
            "k >= 10000000 AND k < 10030000",
            {"l_quantity": "l_quantity + 1"},
            stats_filters=[("k", ">=", 10000000), ("k", "<", 10030000)],
        )
        out["cdf_update_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["cdf_update_narrow"] = r
        from value_at_risk_spark.sources.deltalog import table_changes

        dml_lo = COMMITS  # first DML version
        tip = snapshot(tbl3).version
        t0 = time.perf_counter()
        out["cdf_read_changes_rows"] = table_changes(
            spark, tbl3, dml_lo, tip
        ).count()
        out["cdf_read_changes_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        out["cdf_ds_read_rows"] = (
            spark.read.format("deltalog")
            .option("readChangeFeed", "true")
            .option("startingVersion", str(dml_lo))
            .load(tbl3)
            .count()
        )
        out["cdf_ds_read_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tbl3, ignore_errors=True)

    # deletion-vector arm (round 11): the SAME 20-commit clustered
    # table with delta.enableDeletionVectors, the SAME narrow/broad
    # predicates — merge-on-read writes bitmaps + (for UPDATE) the
    # matched rows only, so narrow DML drops the restage cost and
    # BROAD delete escapes the full-rewrite lower bound entirely.
    # Then the read-side price (mask application on a full scan) and
    # the purge that clears the debt.
    tbl4 = tempfile.mkdtemp(prefix="perf_dml_dv_")
    shutil.rmtree(tbl4, ignore_errors=True)
    try:
        from value_at_risk_spark.sources.deltalog import (
            purge_deletion_vectors,
        )

        lo, hi = 0, REPS * 10_000_000
        step = (hi - lo) // COMMITS
        for c in range(COMMITS):
            write_delta(
                spark,
                big.filter(
                    (F.col("k") >= lo + c * step)
                    & (
                        F.col("k")
                        < (hi if c == COMMITS - 1 else lo + (c + 1) * step)
                    )
                ),
                tbl4,
                configuration=(
                    {"delta.enableDeletionVectors": "true"}
                    if c == 0
                    else None
                ),
            )
        t0 = time.perf_counter()
        r = delete_from_delta(
            spark, tbl4, "k < 30000", stats_filters=[("k", "<", 30000)]
        )
        out["dv_delete_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["dv_delete_narrow"] = r
        t0 = time.perf_counter()
        r = update_delta(
            spark,
            tbl4,
            "k >= 10000000 AND k < 10030000",
            {"l_quantity": "l_quantity + 1"},
            stats_filters=[("k", ">=", 10000000), ("k", "<", 10030000)],
        )
        out["dv_update_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["dv_update_narrow"] = r
        t0 = time.perf_counter()
        r = delete_from_delta(spark, tbl4, "k % 97 = 0")
        out["dv_delete_broad_sec"] = round(time.perf_counter() - t0, 3)
        out["dv_delete_broad"] = r
        t0 = time.perf_counter()
        out["dv_read_rows"] = read_delta(spark, tbl4).count()
        out["dv_read_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        out["dv_ds_read_rows"] = (
            spark.read.format("deltalog").load(tbl4).count()
        )
        out["dv_ds_read_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        r = purge_deletion_vectors(spark, tbl4)
        out["dv_purge_sec"] = round(time.perf_counter() - t0, 3)
        out["dv_purge_files"] = r["files_rewritten"]
    finally:
        shutil.rmtree(tbl4, ignore_errors=True)

    # CDF + DV UPDATE probe (round 12, the r11 leftover): with Change
    # Data Feed on, a merge-on-read UPDATE must ALSO materialize
    # pre/postimage cdc rows — that second bounded scan is the CDF
    # cost arm at 10x, and the change volume must equal exactly
    # 2 x matched rows (no preimage duplication from DV-masked files)
    tbl5 = tempfile.mkdtemp(prefix="perf_dml_cdfdv_")
    shutil.rmtree(tbl5, ignore_errors=True)
    try:
        from value_at_risk_spark.sources.deltalog import table_changes

        write_delta(
            spark,
            big,
            tbl5,
            configuration={
                "delta.enableDeletionVectors": "true",
                "delta.enableChangeDataFeed": "true",
            },
        )
        t0 = time.perf_counter()
        r = update_delta(
            spark,
            tbl5,
            "k >= 10000000 AND k < 10030000",
            {"l_quantity": "l_quantity + 1"},
            stats_filters=[("k", ">=", 10000000), ("k", "<", 10030000)],
        )
        out["cdfdv_update_narrow_sec"] = round(time.perf_counter() - t0, 3)
        out["cdfdv_update_narrow_rows"] = r["rows_updated"]
        t0 = time.perf_counter()
        r2 = update_delta(spark, tbl5, "k % 211 = 0", {"l_quantity": "0.0"})
        out["cdfdv_update_broad_sec"] = round(time.perf_counter() - t0, 3)
        out["cdfdv_update_broad_rows"] = r2["rows_updated"]
        t0 = time.perf_counter()
        ch = (
            table_changes(spark, tbl5, 1, 2)
            .groupBy("_change_type")
            .count()
            .collect()
        )
        out["cdfdv_changes_read_sec"] = round(time.perf_counter() - t0, 3)
        by = {row[0]: row["count"] for row in ch}
        out["cdfdv_changes_by_type"] = by
        out["cdfdv_change_volume_exact"] = (
            by.get("update_preimage", 0)
            == by.get("update_postimage", 0)
            == r["rows_updated"] + r2["rows_updated"]
        )
    finally:
        shutil.rmtree(tbl5, ignore_errors=True)

    # DS write parity on the same rows (fresh table, single commit)
    tbl2 = tempfile.mkdtemp(prefix="perf_dsw_")
    shutil.rmtree(tbl2, ignore_errors=True)
    try:
        t0 = time.perf_counter()
        big.write.format("deltalog").mode("append").save(tbl2)
        out["ds_write_sec"] = round(time.perf_counter() - t0, 3)
        out["ds_write_rows"] = read_delta(spark, tbl2).count()
    finally:
        shutil.rmtree(tbl2, ignore_errors=True)
    big.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
