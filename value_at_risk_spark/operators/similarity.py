"""Similarity search over embedding columns (north-star surface).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path. Embeddings are plain
``array<float>`` columns (FIXTURES.md: 64-dim).

Scale design:
- brute force is a broadcast of the (small) query set against the full
  corpus — a map-side nested loop with a native dot-product expression;
  cost O(|Q|·N·d) entirely in codegen, no shuffle except the final
  top-k window on |Q|·N rows (or groupBy-min_by for k=1).
- LSH: b random hyperplanes → b-bit bucket signature; candidates =
  bucket collisions (equi-join), exact cosine re-rank only on
  candidates. Hyperplanes come from a seeded driver-side numpy RNG and
  enter the plan as literals — deterministic and broadcast-free.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from value_at_risk_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    vector_norm,
)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    queries: (query_id, vec_col); corpus: (corpus_id, vec_col).
    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties
    broken by neighbor id for determinism.
    """
    # norms precomputed per side: O((|Q|+N)·d) instead of re-deriving
    # both norms inside every one of the |Q|·N pair expressions
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qv"),
        vector_norm(vec_col).alias("_qn"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("_cv"),
        vector_norm(vec_col).alias("_cn"),
    )
    sim = dot_product("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))
    if round_to is not None:
        # + 0.0 collapses IEEE negative zero after rounding (oracle parity)
        sim = F.round(sim, round_to) + F.lit(0.0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, sim.alias("cosine"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per row (sign-bit signature).

    bucket = Σ_b [dot(v, plane_b) > 0] << b. Planes are literal arrays
    in the plan (seeded, reproducible — same contract philosophy as the
    reference's trial-id seeding, utils/var_udf.py:58-61).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    bucket = F.lit(0).cast("long")
    for b in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(dot_product(vec_col, plane) > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        ).cast("long")
        bucket = bucket.bitwiseOR(bit)
    return df.withColumn("bucket", bucket)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: exact re-rank within LSH bucket collisions.

    The bucket equi-join replaces the cross join — candidate count drops
    ~2^planes-fold; recall is tunable via num_planes (fewer planes →
    bigger buckets → higher recall, more compute). With ``multiprobe``
    each query also probes the num_planes buckets at Hamming distance 1
    from its own (a near-miss on one hyperplane is the dominant failure
    mode), trading (1+planes)× candidate volume for much higher recall —
    the standard multi-probe LSH refinement.
    """
    qb = hyperplane_lsh_buckets(
        queries.select(query_id, vec_col), vec_col, dim, num_planes
    ).select(query_id, F.col(vec_col).alias("_qv"), "bucket")
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b)).cast("long")
                for b in range(num_planes)
            ],
        )
        qb = qb.select(
            query_id, "_qv", F.explode(probes).alias("bucket")
        )
    cb = hyperplane_lsh_buckets(
        corpus.select(corpus_id, vec_col), vec_col, dim, num_planes
    ).select(corpus_id, F.col(vec_col).alias("_cv"), "bucket")
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(
            query_id,
            corpus_id,
            F.round(cosine_similarity("_qv", "_cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact baseline).

    All ordered pairs (id_a < id_b) with cosine ≥ threshold, via a
    broadcast block nested-loop self-join and the native dot-product
    expression — exact, and the shape to verify candidates against. At
    corpus sizes where O(N²/2) is no longer affordable, generate
    candidates with ``hyperplane_lsh_buckets`` collisions (the same
    bucketed equi-join as ``lsh_topk``) and run THIS exact predicate
    only on collisions; the threshold filter is identical either way.
    """
    # Precompute each side's L2 norm BEFORE the join: norm work is
    # O(N·d) instead of O(N²·d) inside the pair predicate, and the
    # join-condition cosine collapses to one dot product + one divide.
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        vector_norm(vec_col).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        vector_norm(vec_col).alias("_nb"),
    )
    sim = dot_product("_va", "_vb") / (F.col("_na") * F.col("_nb"))
    if round_to is not None:
        sim_out = F.round(sim, round_to) + F.lit(0.0)
    else:
        sim_out = sim
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .filter(sim >= F.lit(threshold))
        .select("id_a", "id_b", sim_out.alias("cosine"))
    )
