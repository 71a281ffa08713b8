"""Growth-curve spot run for the round-13 surfaces (r13 verdict #7).

The r7 pattern applied to the newest arms: each surface runs at its
bench scale and at the NEXT 10x notch, and the normalized factor
t_10x / (10 * t_1x) says whether the plan's cost grows at, below, or
above the data rate — sub-1.0 is fixed-overhead-dominated, ~1.0 is
linear (the target for scan-shaped work), >>1.0 names a scale killer.

Surfaces and notches (base = sf0.1 fixtures):
- MERGE clause engine + upsert-star fast path: 1.5M-row target
  (bench's standing 10x row) -> 15M rows.
- CDC content-defined chunking dedup (cdc_chunk_dedup): 5k docs ->
  50k (the dupe-heavy replicated corpus).
- Column-defaults insert path (CREATE w/ DEFAULTs + INSERT(k,seg) +
  INSERT(k) + MERGE insert): 15k customer rows -> 150k.
- autoCompact maintenance: 12 trickle appends under
  delta.autoOptimize.autoCompact at R rows/append -> 10R.

Writes one JSON line; paste the table into PERF.md.
PERF ONLY — correctness for every one of these surfaces is gate- or
pytest-pinned elsewhere.
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

STRIDE = 10**9


def replicate(spark, src_dir, out_dir, table, key_cols, reps):
    base = spark.read.parquet(f"{src_dir}/{table}.parquet")
    union = None
    for i in range(reps):
        rep = base
        for c in key_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * STRIDE))
        union = rep if union is None else union.unionByName(rep)
    union.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def bench_merge(spark, sf_dir, scratch, reps):
    """Clause engine vs upsert-star on an orders-derived target of
    150k * reps rows with a 10% source (half updates, half inserts).
    Same shape as bench.scaled_merge_clauses, one notch up."""
    from value_at_risk_spark.operators.merge import merge_into_delta_native
    from value_at_risk_spark.sources.deltalog import read_delta, write_delta

    src_orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    target = None
    for i in range(reps):
        rep = src_orders.select(
            (F.col("o_orderkey") + F.lit(i * STRIDE)).alias("k"),
            F.col("o_totalprice").alias("bal"),
            F.col("o_orderstatus").alias("st"),
        )
        target = rep if target is None else target.unionByName(rep)
    n_target = target.count()
    source = target.filter(F.col("k") % 20 < 2).select(
        F.when(F.col("k") % 20 == 0, F.col("k"))
        .otherwise(F.col("k") + F.lit(STRIDE * 1000))
        .alias("k"),
        (F.col("bal") + 1).alias("bal"),
        F.lit("U").alias("st"),
    )
    n_source = source.count()

    out = {"rows": n_target, "source_rows": n_source}
    for name, runner in (
        (
            "clause_engine",
            lambda tbl: merge_into_delta_native(
                spark,
                tbl,
                source,
                ["k"],
                matched=[
                    {"condition": "s.bal >= 0", "update": {"bal": "s.bal"}},
                    {"delete": True},
                ],
                not_matched=[
                    {"insert": {"k": "s.k", "bal": "s.bal", "st": "s.st"}}
                ],
            ),
        ),
        (
            "upsert_star",
            lambda tbl: merge_into_delta_native(spark, tbl, source, ["k"]),
        ),
    ):
        tbl = os.path.join(scratch, f"merge_{name}_{reps}")
        write_delta(spark, target, tbl)
        sec, _ = timed(lambda: runner(tbl))
        out[f"{name}_sec"] = sec
        out[f"{name}_rows_after"] = read_delta(spark, tbl).count()
    return out


def bench_cdc(spark, sf_dir):
    from value_at_risk_spark.queries import QUERIES

    sec, _ = timed(
        lambda: QUERIES["cdc_chunk_dedup"](spark, sf_dir).collect()
    )
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return {"docs": n, "sec": sec}


def bench_defaults(spark, sf_dir, scratch, tag):
    """CREATE w/ defaults + the three insert surfaces, timed end to
    end (the r13 delta_defaults_scan build at growing customer
    volume)."""
    import uuid

    from value_at_risk_spark.operators.merge import merge_into_delta_native
    from value_at_risk_spark.sources.delta_sql import delta_sql

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = cust.count()
    tbl = os.path.join(scratch, f"defaults_{tag}")

    def build():
        delta_sql(
            spark,
            f"CREATE TABLE delta.`{tbl}` ("
            "k BIGINT, seg STRING DEFAULT 'unassigned', "
            "bal DOUBLE DEFAULT 100.0)",
        )
        view = f"growth_defaults_{uuid.uuid4().hex[:8]}"
        cust.createOrReplaceTempView(view)
        delta_sql(
            spark,
            f"INSERT INTO delta.`{tbl}` (k, seg) "
            f"SELECT c_custkey, c_mktsegment FROM {view} "
            "WHERE c_custkey % 2 = 0",
        )
        delta_sql(
            spark,
            f"INSERT INTO delta.`{tbl}` (k) "
            f"SELECT c_custkey FROM {view} WHERE c_custkey % 2 = 1",
        )
        hi = cust.agg(F.max("c_custkey")).first()[0] + 1
        merge_into_delta_native(
            spark,
            tbl,
            cust.filter(F.col("c_custkey") % 2 == 1).select(
                (F.col("c_custkey") + F.lit(hi)).alias("k"),
                F.col("c_acctbal").alias("bal"),
            ),
            ["k"],
            not_matched=[{"insert": {"k": "s.k", "bal": "s.bal"}}],
        )
        spark.catalog.dropTempView(view)

    sec, _ = timed(build)
    return {"rows": n, "sec": sec}


def bench_autocompact(spark, sf_dir, scratch, reps):
    """12 trickle appends of (lineitem-slice * reps) rows each under
    autoCompact; wall time includes the in-line compaction commits —
    the maintenance tax a 100 TB streaming ingest pays per commit."""
    from value_at_risk_spark.sources.deltalog import (
        read_delta,
        snapshot,
        write_delta,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    slice_rows = li.limit(5000 * reps).cache()
    n_slice = slice_rows.count()
    tbl = os.path.join(scratch, f"autocompact_{reps}")

    def build():
        # minNumFiles lowered from the 50 default so the 12-append
        # train actually crosses the compaction threshold — the point
        # is to time the in-line compaction, not 12 bare appends
        write_delta(
            spark,
            slice_rows,
            tbl,
            configuration={
                "delta.autoOptimize.autoCompact": "true",
                "delta.autoOptimize.minNumFiles": "8",
            },
        )
        for _ in range(11):
            write_delta(spark, slice_rows, tbl, mode="append")

    sec, _ = timed(build)
    snap = snapshot(tbl)
    n_files = len(snap.files)
    total = read_delta(spark, tbl).count()
    slice_rows.unpersist()
    return {
        "rows_per_append": n_slice,
        "sec": sec,
        "final_files": n_files,
        "rows_total": total,
    }


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("perf-r13-growth")
    scratch = tempfile.mkdtemp(prefix="r13growth_")
    scaled_docs = tempfile.mkdtemp(prefix="r13growth_docs_")
    scaled_cust = tempfile.mkdtemp(prefix="r13growth_cust_")
    out: dict = {}
    try:
        # MERGE: 1.5M (reps=10, the bench notch) -> 15M (reps=100)
        out["merge_10x"] = bench_merge(spark, base, scratch, 10)
        out["merge_100x"] = bench_merge(spark, base, scratch, 100)

        # CDC chunking: sf0.1 docs -> 10x -> 100x replicated corpus
        # (the 10x point measured flat — fixed overhead still dominates
        # at 50k docs — so a third notch shows where work takes over)
        replicate(spark, base, scaled_docs, "documents", ["doc_id"], 10)
        out["cdc_base"] = bench_cdc(spark, base)
        out["cdc_10x"] = bench_cdc(spark, scaled_docs)
        scaled_docs100 = tempfile.mkdtemp(prefix="r13growth_docs100_")
        try:
            replicate(
                spark, base, scaled_docs100, "documents", ["doc_id"], 100
            )
            out["cdc_100x"] = bench_cdc(spark, scaled_docs100)
        finally:
            shutil.rmtree(scaled_docs100, ignore_errors=True)

        # defaults insert path: 15k customers -> 150k
        replicate(spark, base, scaled_cust, "customer", ["c_custkey"], 10)
        out["defaults_base"] = bench_defaults(spark, base, scratch, "b")
        out["defaults_10x"] = bench_defaults(
            spark, scaled_cust, scratch, "s"
        )

        # autoCompact: 5k rows/append -> 50k rows/append, 12 appends
        out["autocompact_base"] = bench_autocompact(spark, base, scratch, 1)
        out["autocompact_10x"] = bench_autocompact(spark, base, scratch, 10)

        def factor(a, b):
            return round(b / (10 * a), 2) if a else None

        out["normalized_10x_factors"] = {
            "merge_clause_engine": factor(
                out["merge_10x"]["clause_engine_sec"],
                out["merge_100x"]["clause_engine_sec"],
            ),
            "merge_upsert_star": factor(
                out["merge_10x"]["upsert_star_sec"],
                out["merge_100x"]["upsert_star_sec"],
            ),
            "cdc_chunk_dedup": factor(
                out["cdc_base"]["sec"], out["cdc_10x"]["sec"]
            ),
            "cdc_chunk_dedup_100x_vs_10x": factor(
                out["cdc_10x"]["sec"], out["cdc_100x"]["sec"]
            ),
            "defaults_insert_path": factor(
                out["defaults_base"]["sec"], out["defaults_10x"]["sec"]
            ),
            "autocompact_12_appends": factor(
                out["autocompact_base"]["sec"],
                out["autocompact_10x"]["sec"],
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(scaled_docs, ignore_errors=True)
        shutil.rmtree(scaled_cust, ignore_errors=True)


if __name__ == "__main__":
    main()
