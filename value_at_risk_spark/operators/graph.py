"""Graph ranking — iterative PageRank on a DataFrame edge list.

Companion to the connected-components operator (dedup.py:341): CC
answers "which nodes belong together", PageRank answers "which nodes
are central". Both are join-per-iteration algorithms expressed as
ordinary DataFrame ops, not a graph framework: at 100 TB the edge
list is a parquet table like any other, and each iteration is one
equi-join + one grouped sum that AQE/co-partitioning optimize like
any other join.

Semantics: the classic damped recurrence
``r'(v) = (1-d)/n + d * sum_{(u,v) in E} r(u)/outdeg(u)``.
Dangling nodes (no out-edges) are NOT redistributed — callers that
need conserved mass should close the graph (e.g. add reverse edges,
as the trade-graph query does) or append sink self-loops.

Scale notes (in order of impact):
- persist/bucket the edge list by ``src`` once; every iteration's
  join then reuses the layout while only the small rank table moves;
- checkpoint ranks every ~10 iterations to cut lineage growth;
- the node count is a 1-row aggregate broadcast into the plan —
  never a driver-side ``count()`` action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list -> (node, r).

    ``edges`` must be deduplicated (multi-edges would double-count
    contributions). Nodes are the union of both endpoint columns;
    every node starts at 1/n.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src).agg(
        F.count(F.lit(1)).cast("double").alias("_od")
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges[src] == ranks.node)
            .join(deg, src)
            .select(F.col(dst).alias("node"), (F.col("r") / F.col("_od")).alias("_c"))
        )
        incoming = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        # left join keeps nodes with no in-edges at the teleport floor
        ranks = (
            nodes.join(incoming, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks
