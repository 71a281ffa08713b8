"""Iterative-graph scale run: PageRank sec/iteration at >=10x gate scale.

Demonstrates (instead of asserting) the scale prescription in
operators/graph.py: persisted src-partitioned edges + checkpoint-every-k
iterations. Two graphs:

- ``trade``: the EXACT edge build of the ``pagerank_trade_graph`` gate
  query, but at $SPARK_GRAFT_SF_DIR (default sf0.1 — 10x the sf0.01
  correctness gate): bidirectional supplier<->customer pairs.
- ``synthetic``: $GRAPH_EDGES (default 5M) uniform-hash edges over
  $GRAPH_NODES (default 500k) nodes — two orders of magnitude over the
  gate graph, where per-iteration layout reuse actually shows.

Configs per graph:

- ``persisted``: persist_edges=True, checkpoint_every=1 — every
  iteration materializes (eager localCheckpoint), so the recorded
  per-iteration seconds are the true marginal cost with the edge
  layout reused across iterations.
- ``naive``: persist_edges=False, checkpoint_every=1 — same forcing,
  but the edge list re-scans/re-shuffles per iteration (what the
  docstring warns against).

Prints ONE JSON line: edges/nodes per graph, per-iteration seconds,
and the persisted/naive ratio. PERF ONLY — correctness of the
recurrence is pinned by tests/test_operators.py (power-iteration
parity) and the hash-checked pagerank_trade_graph oracle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from value_at_risk_spark.operators.graph import pagerank  # noqa: E402
from value_at_risk_spark.session import get_spark  # noqa: E402
from value_at_risk_spark.sources.registry import Registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EDGES = int(float(os.environ.get("GRAPH_EDGES", "5e6")))
N_NODES = int(float(os.environ.get("GRAPH_NODES", "5e5")))
ITERS = int(os.environ.get("GRAPH_ITERS", "8"))


def trade_edges(spark):
    reg = Registry(SF_DIR)
    li = reg.read(spark, "lineitem").select("l_orderkey", "l_suppkey")
    o = reg.read(spark, "orders").select("o_orderkey", "o_custkey")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("c"),
        )
        .distinct()
    )
    return pair.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        pair.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )


def synthetic_edges(spark):
    # deterministic uniform multigraph, then distinct -> simple graph;
    # self-loops keep mass circulating (no dangling correction needed)
    return (
        spark.range(N_EDGES)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(N_NODES)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_NODES)).alias("dst"),
        )
        .distinct()
    )


def run(edges, iters, persist_edges):
    marks = [time.time()]

    def tick(i, ranks):
        marks.append(time.time())

    ranks = pagerank(
        edges,
        iters=iters,
        dedupe=False,
        persist_edges=persist_edges,
        checkpoint_every=1,
        on_iteration=tick,
    )
    n = ranks.count()
    per_iter = [round(marks[i + 1] - marks[i], 2) for i in range(iters)]
    return n, per_iter


def run_cc(spark, edges):
    """Distributed connected components (driver path disabled) on the
    same synthetic graph: rounds to converge + sec/round. The uniform
    graph has one giant component, so this exercises the worst-case
    label-churn regime; the O(log diameter) bound on a path graph is
    pinned separately by the 1.3M-edge stress pytest."""
    from value_at_risk_spark.operators.dedup import connected_components

    stats: dict = {}
    t0 = time.time()
    n = connected_components(
        edges, driver_threshold=0, stats=stats
    ).count()
    sec = round(time.time() - t0, 2)
    return {
        "nodes": n,
        "rounds": stats.get("rounds"),
        "total_sec": sec,
        "sec_per_round": round(sec / max(1, stats.get("rounds", 1)), 2),
    }


def main() -> None:
    spark = get_spark("perf-graph")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    out = {"sf_dir": SF_DIR, "iters": ITERS, "graphs": {}}
    for name, build in (("trade", trade_edges), ("synthetic", synthetic_edges)):
        edges = build(spark).persist()
        ne = edges.count()
        rec = {"edges": ne}
        for cfg, persist in (("persisted", True), ("naive", False)):
            nodes, per_iter = run(edges, ITERS, persist)
            rec["nodes"] = nodes
            rec[cfg] = {
                "per_iter_sec": per_iter,
                # first iteration pays the one-time partition+persist;
                # steady state is what scales with iteration count
                "steady_sec_per_iter": round(
                    sum(per_iter[1:]) / max(1, len(per_iter) - 1), 2
                ),
            }
            spark.catalog.clearCache()
            edges.persist()
            edges.count()
        rec["naive_over_persisted"] = round(
            rec["naive"]["steady_sec_per_iter"]
            / max(rec["persisted"]["steady_sec_per_iter"], 1e-9),
            2,
        )
        out["graphs"][name] = rec
        if name == "synthetic":
            rec["connected_components"] = run_cc(spark, edges)
        edges.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
