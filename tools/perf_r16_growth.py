"""Growth-curve spot run for the round-15/16 operators (r15 VERDICT
#1/#3/#4).

Same protocol as tools/perf_r15_growth.py: each surface runs at its
bench scale and at the NEXT notch; the normalized factor
t_big / (scale * t_base) says whether cost grows at, below, or above
the data rate — sub-1.0 is fixed-overhead-dominated, ~1.0 linear,
>>1.0 names a scale killer.

Arms (base = sf0.1 fixtures):
- knn_graph_ann_indexed at 100k -> 1M vectors with BUILD-TIME cells
  scaled with N (67 -> 667, ~1.5k members/cell): the r15 verdict's #1
  ask — the persisted-index route declared "past ~400k vectors" as an
  EXECUTED measurement, with build (train + assign + write) and graph
  construction timed separately. Candidate volume N·nprobe·(N/cells)
  is linear in N at cells ∝ N.
- sparse TF-IDF near-dup pairs at CONSTANT df_cap=50, docs x10: the
  scale contract made explicit (the gate row's proportional 2N/5 cap
  is fixture enrichment; Σ_t min(df_t, cap)² is linear only under a
  constant cap).
- Gopher repetition signals, docs x10: wall AND shuffle bytes (the
  9-gram-size explode is the engine's largest row-amplification
  factor; bytes are read from the UI REST stage metrics).
- token-budget corpus selection, docs x10 (two-phase running sum).
- delta SQL DML at 10x file count: UPDATE + DELETE through the SQL
  text surface against 8-file vs 80-file native tables.

Writes one JSON line; paste the table into PERF.md.
PERF ONLY — correctness for every surface is gate- or pytest-pinned.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("R16_UI_PORT", "4047"))


def get_spark_with_ui() -> SparkSession:
    """session.py's config with the UI enabled (REST stage metrics)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.appName("perf-r16-growth")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "96g")
        .getOrCreate()
    )


def shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across all completed stages so far."""
    try:
        app_id = spark.sparkContext.applicationId
        # status is a case-sensitive enum (COMPLETE); omit it and sum
        # whatever has metrics so racing active stages still count
        url = (
            f"http://localhost:{UI_PORT}/api/v1/applications/"
            f"{app_id}/stages"
        )
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.loads(r.read())
        return sum(s.get("shuffleWriteBytes", 0) or 0 for s in stages)
    except Exception as ex:  # noqa: BLE001 — metrics are best-effort
        print(f"# shuffle metrics unavailable: {ex}", file=sys.stderr)
        return -1


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def replicated_docs(spark, reps: int, fresh_vocab: bool = False):
    """Corpus at ``reps``× size. ``fresh_vocab``: rotate the lowercase
    alphabet per replica (F.translate — word lengths and df SHAPE
    preserved, token sets disjoint across replicas). Required for
    df-sensitive arms: plain replication multiplies every token's df
    by ``reps``, so a constant df_cap prunes the whole vocabulary at
    10× and the arm measures an empty join instead of 10× the work."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = []
    for i in range(reps):
        text = (
            F.translate(F.lower(F.col("text")), alpha,
                        alpha[i:] + alpha[:i])
            if fresh_vocab and i > 0
            else F.col("text")
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
                "source",
                text.alias("text"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def jittered_embeddings(spark, n_target: int):
    """Replicate sf0.1 embeddings with deterministic jitter (distinct
    vectors, tie-free regime — same recipe as perf_r15_growth)."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_base = base.count()
    reps = max(1, (n_target + n_base - 1) // n_base)
    parts = []
    for i in range(reps):
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10**9)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + F.lit((i + 1) * 1e-4) * F.sin(x),
                ).alias("embedding"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.limit(n_target).repartition(32)


def arm_knn_graph_ann_indexed(spark):
    from value_at_risk_spark.operators.annindex import (
        build_ivf_graph_index,
        knn_graph_ann_indexed,
    )

    out = {}
    root = tempfile.mkdtemp(prefix="r16_ivfgraph_")
    try:
        for n, cells in ((100_000, 67), (1_000_000, 667)):
            corpus = jittered_embeddings(spark, n).localCheckpoint()
            d = os.path.join(root, f"n{n}")
            t_build, _ = timed(
                lambda: build_ivf_graph_index(
                    spark, d, corpus, n_cells=cells, iters=2
                )
            )
            t_graph, edges = timed(
                lambda: knn_graph_ann_indexed(
                    spark, d, k=3, nprobe=2
                ).count()
            )
            out[f"n{n}"] = {
                "build_sec": t_build,
                "graph_sec": t_graph,
                "edges": edges,
                "n_cells": cells,
            }
            print(f"# indexed graph n={n}: {out[f'n{n}']}", file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    base, big = out["n100000"], out["n1000000"]
    out["norm_factor_graph"] = round(
        big["graph_sec"] / (10 * base["graph_sec"]), 3
    )
    out["norm_factor_build"] = round(
        big["build_sec"] / (10 * base["build_sec"]), 3
    )
    return out


def arm_sparse_tfidf_constcap(spark):
    from value_at_risk_spark.operators.dedup import tfidf_cosine_pairs

    def run(reps: int) -> int:
        return tfidf_cosine_pairs(
            replicated_docs(spark, reps, fresh_vocab=True),
            threshold=0.3,
            df_cap=50,
        ).count()

    nd = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    run(1)  # warm-up: JVM/codegen startup must not bill the base point
    t1, p1 = timed(lambda: run(1))
    t10, p10 = timed(lambda: run(10))
    return {
        "docs": [nd, nd * 10],
        "sec": [t1, t10],
        "pairs": [p1, p10],
        "df_cap": 50,
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_gopher_repetition(spark):
    from value_at_risk_spark.functions.text import repetition_signals

    def run(reps: int) -> int:
        # aggregate over EVERY share column: a bare .count() lets
        # Catalyst prune the top-gram/dup-share computations (measured
        # t10 < t1 — the heavy path never ran)
        sig = repetition_signals(
            replicated_docs(spark, reps).select("doc_id", "text")
        )
        share_cols = [c for c in sig.columns if c.endswith("_share")]
        row = sig.agg(
            *[F.sum(c) for c in share_cols], F.count(F.lit(1))
        ).first()
        return int(row[-1])

    nd = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    b0 = shuffle_write_bytes(spark)
    t1, _ = timed(lambda: run(1))
    b1 = shuffle_write_bytes(spark)
    t10, _ = timed(lambda: run(10))
    b2 = shuffle_write_bytes(spark)
    return {
        "docs": [nd, nd * 10],
        "sec": [t1, t10],
        "shuffle_mb": [
            round((b1 - b0) / 1e6, 1) if b0 >= 0 else None,
            round((b2 - b1) / 1e6, 1) if b0 >= 0 else None,
        ],
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_corpus_budget(spark):
    from value_at_risk_spark.functions.text import (
        quality_score,
        token_count,
    )
    from value_at_risk_spark.operators.ranks import global_running_sum

    def run(reps: int) -> int:
        d = replicated_docs(spark, reps).select(
            "doc_id",
            "source",
            quality_score("text").alias("q"),
            token_count("text").cast("long").alias("toks"),
        )
        budget = d.agg(F.sum("toks")).first()[0] // 2
        ranked = global_running_sum(
            d, "toks", [("q", False), ("doc_id", True)], out="cum"
        )
        return (
            ranked.filter(F.col("cum") <= budget)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    nd = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    t1, _ = timed(lambda: run(1))
    t10, _ = timed(lambda: run(10))
    return {
        "docs": [nd, nd * 10],
        "sec": [t1, t10],
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_delta_sql_dml(spark):
    from value_at_risk_spark.sources.delta_sql import delta_sql
    from value_at_risk_spark.sources.registry import Registry

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    out = {}
    root = tempfile.mkdtemp(prefix="r16_dml_")
    try:
        for files in (8, 80):
            base = os.path.join(root, f"f{files}")
            os.makedirs(base, exist_ok=True)
            reg = Registry(base)
            t_build, _ = timed(
                lambda: reg.write(
                    li.repartition(files),
                    "li",
                    fmt="deltalog",
                )
            )
            t_upd, _ = timed(
                lambda: delta_sql(
                    spark,
                    f"UPDATE delta.`{base}/li` "
                    "SET l_quantity = l_quantity + 1 "
                    "WHERE l_partkey % 1000 = 7",
                )
            )
            t_del, _ = timed(
                lambda: delta_sql(
                    spark,
                    f"DELETE FROM delta.`{base}/li` "
                    "WHERE l_partkey % 1000 = 8",
                )
            )
            out[f"files{files}"] = {
                "build_sec": t_build,
                "update_sec": t_upd,
                "delete_sec": t_del,
            }
            print(f"# dml files={files}: {out[f'files{files}']}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    b, g = out["files8"], out["files80"]
    out["norm_factor_update"] = round(
        g["update_sec"] / (10 * b["update_sec"]), 3
    )
    out["norm_factor_delete"] = round(
        g["delete_sec"] / (10 * b["delete_sec"]), 3
    )
    return out




def arm_var_pipeline(spark):
    """End-to-end VaR pipeline with the TICKER dimension fanned 20x
    (5 priority series -> 100 jittered pseudo-tickers, equal-weight
    portfolio): the wide stage is scoring (run-dates x trials x
    tickers inside codegen) and the per-ticker OLS fan-out — the
    dimensions a real book grows along. Calendar and trial count held
    fixed."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from value_at_risk_spark.operators.gapfill import forward_fill_spine
    from value_at_risk_spark.plans.var_pipeline import (
        VarConfig,
        run_pipeline,
    )

    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(
            F.col("o_orderpriority").alias("series"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("price"))
    )
    series = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    filled = forward_fill_spine(daily, ["series"], "d", ["price"])
    wide = (
        filled.groupBy("d").pivot("series", series).agg(F.first("price"))
        .na.drop()
    )
    indicators = wide.select(
        F.col("d").cast("timestamp").alias("date"),
        *[F.col(f"`{c}`").alias(f"f{i}") for i, c in enumerate(series)],
    )
    cfg = VarConfig(runs=500, factor_cols=tuple(f"f{i}" for i in range(5)))

    def run(reps: int) -> int:
        parts = []
        for i in range(reps):
            parts.append(
                filled.select(
                    F.concat(F.lit(f"r{i}_"), "series").alias("ticker"),
                    F.col("d").cast("timestamp").alias("date"),
                    (F.col("price") * (1.0 + 0.01 * i)).alias("close"),
                )
            )
        stocks = parts[0]
        for p in parts[1:]:
            stocks = stocks.unionByName(p)
        tickers = [f"r{i}_{s}" for i in range(reps) for s in series]
        portfolio = spark.createDataFrame(
            [(t, 1.0 / len(tickers)) for t in tickers],
            "ticker string, weight double",
        )
        out = run_pipeline(spark, stocks, indicators, portfolio, cfg)
        return out["backtest"].count()

    t1, n1 = timed(lambda: run(1))
    t20, n20 = timed(lambda: run(20))
    return {
        "tickers": [5, 100],
        "sec": [t1, t20],
        "backtest_rows": [n1, n20],
        "norm_factor": round(t20 / (20 * t1), 3),
    }


def main() -> int:
    spark = get_spark_with_ui()
    only = set(
        a for a in os.environ.get("R16_ARMS", "").split(",") if a
    )
    res = {"sf_dir": SF_DIR}
    for name, fn in (
        ("sparse_tfidf_constcap_docs_x10", arm_sparse_tfidf_constcap),
        ("gopher_repetition_docs_x10", arm_gopher_repetition),
        ("corpus_budget_selection_docs_x10", arm_corpus_budget),
        ("delta_sql_dml_files_x10", arm_delta_sql_dml),
        ("knn_graph_ann_indexed_100k_to_1m", arm_knn_graph_ann_indexed),
        ("var_pipeline_tickers_x20", arm_var_pipeline),
    ):
        if only and name not in only:
            continue
        res[name] = fn(spark)
        print(f"# {name}: {res[name]}", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
