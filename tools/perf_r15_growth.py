"""Growth-curve spot run for the round-14/15 operators (r14 verdict
#4 + #3).

Same protocol as tools/perf_r13_growth.py: each surface runs at its
bench scale and at the NEXT notch; the normalized factor
t_big / (scale * t_base) says whether cost grows at, below, or above
the data rate — sub-1.0 is fixed-overhead-dominated, ~1.0 linear,
>>1.0 names a scale killer.

Arms (base = sf0.1 fixtures):
- semantic decontamination (reference_max_cosine): ref set x10 at a
  fixed train corpus — cost model is one BLAS matmul per Arrow batch
  against the broadcast ref matrix, so wall should scale ~linearly in
  |ref| with a large fixed floor (the corpus scan).
- personalized PageRank: edges x10 via disjoint graph replication
  (node names prefixed per replica) — each iteration is one
  groupBy(dst) hash-agg, so wall should be ~linear in |E|.
- balanced export sharding (balanced_shards, now on the distributed
  two-phase rank): docs x10.
- BPE encode round trip (bpe_train 12 merges + bpe_token_counts):
  corpus x10 — training folds distinct WORDS (sublinear in docs),
  encode is linear.
- knn_graph_ann at 20k -> 100k vectors with n_cells scaled with N
  (16 -> 64, ~1.5k rows/cell): candidate volume N*nprobe*(N/cells)
  stays ~linear in N when cells scale with N — THE sub-quadratic
  claim of the ANN graph, measured (the exact blocked graph's 100k
  point in the r14 table is the quadratic comparator, 32.4 s).

Writes one JSON line; paste the table into PERF.md.
PERF ONLY — correctness for every surface is gate- or pytest-pinned.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from value_at_risk_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def jittered_embeddings(spark, n_target: int):
    """Replicate the sf0.1 embeddings with deterministic per-replica
    jitter so all vectors are distinct (the tie-free regime the r14
    curves used)."""
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
    # limit() collapses to ONE partition (GlobalLimit) — repartition so
    # downstream per-row work (the 64-centroid assignment expression)
    # actually parallelizes; without this the 100k arm ran single-task
    return u.limit(n_target).repartition(32)


def arm_semantic_decontaminate(spark):
    from value_at_risk_spark.operators.similarity import reference_max_cosine

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    train = emb.filter(F.col("vec_id") % 17 >= 10)
    ref1 = emb.filter(F.col("vec_id") % 170 == 0)
    ref10 = emb.filter(F.col("vec_id") % 17 == 0)
    n1, n10 = ref1.count(), ref10.count()
    # warm-up: the first Spark job in the session pays JVM/codegen
    # startup that would otherwise be billed to the base measurement
    reference_max_cosine(train, ref1).count()
    t1, _ = timed(lambda: reference_max_cosine(train, ref1).count())
    t10, _ = timed(lambda: reference_max_cosine(train, ref10).count())
    return {
        "ref_rows": [n1, n10],
        "sec": [t1, t10],
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_ppr_edges(spark):
    from value_at_risk_spark.operators.graph import personalized_pagerank

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
            F.concat(F.lit("C"), F.col("o_custkey")).alias("c"),
        )
        .distinct()
    )
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").filter(
        F.col("s_suppkey") % 5 == 0
    )

    def run(reps: int) -> int:
        parts_e, parts_s = [], []
        for i in range(reps):
            tag = F.lit(f"r{i}_")
            e = pair.select(
                F.concat(tag, "s").alias("src"), F.concat(tag, "c").alias("dst")
            )
            e = e.unionAll(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            parts_e.append(e)
            parts_s.append(
                sup.select(
                    F.concat(tag, F.lit("S"), F.col("s_suppkey")).alias("node")
                )
            )
        edges, seeds = parts_e[0], parts_s[0]
        for p in parts_e[1:]:
            edges = edges.unionAll(p)
        for p in parts_s[1:]:
            seeds = seeds.unionAll(p)
        return personalized_pagerank(edges, seeds, iters=3).count()

    ne = pair.count() * 2
    t1, _ = timed(lambda: run(1))
    t10, _ = timed(lambda: run(10))
    return {
        "edges": [ne, ne * 10],
        "sec": [t1, t10],
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_balanced_shards(spark):
    from value_at_risk_spark.functions.text import token_count
    from value_at_risk_spark.operators.packing import balanced_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", token_count("text").cast("long").alias("toks")
    )

    def run(reps: int) -> int:
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"), "toks"
            )
            for i in range(reps)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return balanced_shards(u, n_shards=8, weight_col="toks").count()

    nd = docs.count()
    t1, _ = timed(lambda: run(1))
    t10, _ = timed(lambda: run(10))
    return {
        "docs": [nd, nd * 10],
        "sec": [t1, t10],
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_bpe_encode(spark):
    from value_at_risk_spark.operators.bpe import bpe_token_counts, bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def run(reps: int) -> int:
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"), "text"
            )
            for i in range(reps)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        merges = bpe_train(u, num_merges=12)
        return bpe_token_counts(u, merges).count()

    nd = docs.count()
    t1, _ = timed(lambda: run(1))
    t10, _ = timed(lambda: run(10))
    return {
        "docs": [nd, nd * 10],
        "sec": [t1, t10],
        "norm_factor": round(t10 / (10 * t1), 3),
    }


def arm_knn_graph_ann(spark):
    from value_at_risk_spark.operators.similarity import knn_graph_ann

    out = {}
    for n, cells in ((20_000, 16), (100_000, 64)):
        corpus = jittered_embeddings(spark, n).localCheckpoint()
        t, edges = timed(
            lambda: knn_graph_ann(
                corpus, k=3, nprobe=2, n_cells=cells
            ).count()
        )
        out[f"n{n}"] = {"sec": t, "edges": edges, "n_cells": cells}
    base, big = out["n20000"], out["n100000"]
    out["norm_factor"] = round(big["sec"] / (5 * base["sec"]), 3)
    return out


def main() -> int:
    spark = get_spark("perf-r15-growth")
    res = {"sf_dir": SF_DIR}
    for name, fn in (
        ("semantic_decontaminate_ref_x10", arm_semantic_decontaminate),
        ("personalized_pagerank_edges_x10", arm_ppr_edges),
        ("balanced_shards_docs_x10", arm_balanced_shards),
        ("bpe_encode_docs_x10", arm_bpe_encode),
        ("knn_graph_ann_20k_to_100k", arm_knn_graph_ann),
    ):
        res[name] = fn(spark)
        print(f"# {name}: {res[name]}", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
