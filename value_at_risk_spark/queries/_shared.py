"""Named operator queries + DuckDB oracle twins (driver contract).

Every operator from SURVEY.md §2 (plus the north-star dedup /
similarity / text-analysis surface) is exposed here as a named query
over the driver's fixture tables, with an ANSI-SQL oracle twin that
DuckDB runs on the same parquet files. The driver compares row count +
schema + order-insensitive value hash at sf0.01.

Conventions for engine-parity (see FIXTURES.md "Oracle-parity notes"):
- all double outputs rounded (money → 2dp, stats/returns → 6dp, avgs →
  4dp) in BOTH engines, so accumulation-order FP noise cannot flip the
  value hash;
- timestamps surfaced as DATE (Spark session TZ pinned to UTC);
- counts / ranks / positions cast to bigint on both sides;
- identical aliases on both sides (driver sorts columns by name);
- exact `percentile` (linear interpolation = np.percentile =
  quantile_cont), never percentile_approx, in oracle-compared queries
  (SURVEY §7.2).

The VaR time-series queries treat `orders` as a 5-series market:
o_orderpriority = instrument/factor, daily totalprice sum = price level
— the same (key, date, value) shape as the reference's market_data
table (/root/reference/01_var_market_etl.py:37-47).
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from value_at_risk_spark.functions.features import nonlinear_features, predict_nonlinear
from value_at_risk_spark.functions.returns import log_returns_over
from value_at_risk_spark.functions.risk import basel_zone, value_at_risk_expr
from value_at_risk_spark.functions.text import STOPWORDS
from value_at_risk_spark.functions.timeutil import epoch_micros, epoch_seconds
from value_at_risk_spark.functions.bpe_sql import (
    bpe_merge_sql,
    bpe_token_counts_sql,
)
from value_at_risk_spark.functions.xxh64_sql import xxh64_cte, xxh64_signed
from value_at_risk_spark.functions.vector import dot_product
from value_at_risk_spark.model import fit_ols_per_group
from value_at_risk_spark.operators.asof import asof_join
from value_at_risk_spark.operators.dedup import (
    exact_dedup,
    jaccard_similarity,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from value_at_risk_spark.operators.gapfill import forward_fill_spine
from value_at_risk_spark.operators.similarity import cosine_topk, lsh_topk
from value_at_risk_spark.operators.vector_agg import vector_mean_cov
from value_at_risk_spark.montecarlo import simulate_trials
from value_at_risk_spark.sources.registry import Registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_EMB_DIM_CACHE: dict[str, int | None] = {}


def _embedding_dim_peek(sf_dir: str) -> int | None:
    """Embedding width from the parquet DATA without any Spark job: a
    driver-local pyarrow read of ONE row (one page decode, cached per
    sf_dir). This is how the ``dim`` column metadata gets stamped at
    the source so every downstream trainer/builder resolves its
    dimensionality from the SCHEMA (functions/vector.resolve_dim) —
    the same zero-probe-job pattern as minhash's num_hashes metadata.
    Returns None (and stamps nothing) if the peek can't resolve."""
    if sf_dir in _EMB_DIM_CACHE:
        return _EMB_DIM_CACHE[sf_dir]
    dim: int | None = None
    try:
        import os

        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "embeddings.parquet")
        if os.path.isdir(path):
            parts = sorted(
                p for p in os.listdir(path) if p.endswith(".parquet")
            )
            path = os.path.join(path, parts[0]) if parts else path
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(batch_size=1, columns=["embedding"]):
            if batch.num_rows:
                first = batch.column(0)[0].as_py()
                dim = len(first) if first is not None else None
                break
    except Exception:
        dim = None
    _EMB_DIM_CACHE[sf_dir] = dim
    return dim


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = Registry(sf_dir).read(spark, name)
    if name == "embeddings":
        d = _embedding_dim_peek(sf_dir)
        if d:
            df = df.withMetadata("embedding", {"dim": d})
    return df


# --------------------------------------------------------------------------
# Shared building blocks: the orders-as-market time series
# --------------------------------------------------------------------------

# Oracle CTE fragments (kept verbatim-identical across queries).
SQL_DAILY = """
daily AS (
  SELECT o_orderpriority AS series,
         CAST(o_orderdate AS DATE) AS d,
         ROUND(SUM(o_totalprice), 2) AS price
  FROM orders
  GROUP BY 1, 2
)
"""

SQL_RETS = (
    SQL_DAILY
    + """,
rets AS (
  SELECT series, d,
         (ROUND(LN(price / COALESCE(
             LAG(price) OVER (PARTITION BY series ORDER BY d), price)), 6) + 0) AS ret
  FROM daily
)
"""
)


def daily_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """series/date/price level frame (the market_data analogue)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("price"))


def daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series log returns, reference first-row-zero semantics (W3/F1)."""
    daily = daily_prices(spark, sf_dir)
    return daily.select(
        "series",
        "d",
        (F.round(log_returns_over("price", ["series"], "d"), 6) + F.lit(0.0)).alias("ret"),
    )


def _daynum(col: str = "d"):
    """Days since epoch anchor — numeric RANGE window key on both engines."""
    return F.datediff(F.col(col), F.lit("1990-01-01"))


# --------------------------------------------------------------------------
# 1. Relational core (SURVEY §2.2, §2.3 J1/J4, §2.4 A1-A3/A7/A9, §2.6 O1-O2)
# --------------------------------------------------------------------------


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --------------------------------------------------------------------------
# 2. Time-series / VaR core (SURVEY §2.5 W1-W3, §2.3 J5/J6, §2.6 O3-O4,
#    §2.8 F1/F4/F10/F11/F14, §2.1 S1 gap-fill)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# 3. Vector / embedding operators (SURVEY §2.4 A5/A8, §2.8 F3/F11;
#    north-star similarity search)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# 4. Per-group model fit (SURVEY §2.4 A6 applyInPandas) — oracle via
#    closed-form regression aggregates
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# 5. Text analysis / dedup (north-star surface over `documents`)
# --------------------------------------------------------------------------

SQL_TOKS = """
toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM documents
  ) WHERE t <> ''
)
"""


# --------------------------------------------------------------------------
# 6. Rows-only queries (genuinely non-SQL-expressible: seeded RNG,
#    hash-family LSH, stateful plumbing) — driver records row counts
# --------------------------------------------------------------------------


# Shared oracle scaffold for the xxhash64-backed SimHash queries
# (r13 graduation): DuckDB has no xxhash64 builtin and the gate runs
# ONE statement (no CREATE MACRO prelude), so XXH64 seed-42 itself is
# re-expressed as a CTE chain over HUGEINT wrapping arithmetic
# (functions/xxh64_sql.py, parity pytest-pinned against F.xxhash64 on
# every length class). vocab hashes each DISTINCT token once; votes/
# fingerprint mirror operators/dedup.simhash bit for bit.
_SIMHASH_FP_CTES = f"""
toks AS (
  SELECT DISTINCT doc_id, t
  FROM (SELECT doc_id,
               UNNEST(list_filter(string_split(lower(text),' '),
                      x -> x <> '')) AS t
        FROM documents)
),
vocab AS (SELECT DISTINCT t FROM toks),
{xxh64_cte("vocab")},
th AS (SELECT toks.doc_id, hsh.hu FROM toks JOIN hsh USING (t)),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (hu // (1::HUGEINT << b)) % 2 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM th, UNNEST(range(0, 64)) AS q(b)
  GROUP BY 1, 2
),
fpu AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::HUGEINT << b)
                  ELSE 0::HUGEINT END)::HUGEINT AS fp
  FROM votes GROUP BY doc_id
)
"""


def _certify_topk_recall(
    approx: DataFrame, exact: DataFrame, floor: float, name: str
) -> None:
    """Raise (gate row RED) unless the approximate top-k overlaps the
    exact cosine top-k for at least ``floor`` of the neighbor slots.
    Both frames are bounded (n_queries x k rows) so the two collects
    are edge-sized; used by the ANN gate rows whose query set is small
    enough that the exact baseline is a cheap broadcast cross join."""
    a: dict[int, set] = {}
    x: dict[int, set] = {}
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in exact.collect():
        x.setdefault(r.query_id, set()).add(r.neighbor_id)
    denom = sum(len(v) for v in x.values())
    rec = sum(len(a.get(q, set()) & v) for q, v in x.items()) / max(denom, 1)
    if rec < floor:
        raise AssertionError(
            f"{name}: recall@5 vs exact cosine {rec:.3f} < floor {floor}"
        )


def _lsh_oracle_sql() -> str:
    """DuckDB replay of ann_lsh_topk: the 4 seed-42 hyperplanes are
    deterministic numpy draws — the SAME literals the engine bakes
    into its plan (similarity.hyperplane_lsh_buckets) — so the oracle
    embeds them verbatim (repr round-trips float64 exactly) and
    replays bucketing, the 5-probe multiprobe explosion, the bucket
    equi-join, and the exact rounded-cosine re-rank."""
    import numpy as np

    planes = np.random.default_rng(42).standard_normal((4, 64))
    bits = "\n       + ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in planes[b])
        + f"]) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(4)
    )
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
b AS MATERIALIZED (
  SELECT id, v,
         {bits} AS bucket
  FROM v
),
qp AS (
  SELECT id AS query_id, v AS qv,
         UNNEST([bucket, xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS bucket
  FROM b WHERE id < 10
),
cand AS (
  SELECT q.query_id, c.id AS neighbor_id,
         ROUND(list_cosine_similarity(q.qv, c.v), 6) + 0 AS cosine
  FROM qp q JOIN b c USING (bucket)
  WHERE c.id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM cand) t WHERE rn <= 5
"""


# --------------------------------------------------------------------------
# 7. Coverage completions: global aggregates (A2/A3), deterministic
#    limit (O2), array-size predicate (P8), distinct aggregate,
#    sessionization, CUBE grouping sets
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# 8. Unpivot, MERGE emulation, model-eval WSSE, quality score, IVF ANN
# --------------------------------------------------------------------------


# Shared DuckDB replay of the engine-deterministic Lloyd loop
# (similarity.kmeans_fit: init = vectors of the 8 smallest ids,
# centroids quantized to 6 decimals at every handoff, nearest-cell
# ties to the smallest cell). Suffixed by _KMEANS_ORACLE (cluster
# aggregates) and the ann_ivf_topk oracle (probe + exact re-rank).
_KMEANS_CTES = """
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
         list_transform(v, x -> ROUND(x, 6)) AS c
  FROM (SELECT id, v FROM v ORDER BY id LIMIT 8)
),
a1 AS MATERIALIZED (
  SELECT id, v, cell FROM (
    SELECT v.id, v.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.id
                              ORDER BY list_distance(v.v, c.c), c.cell) AS rn
    FROM v, c0 c) t WHERE rn = 1
),
m1 AS MATERIALIZED (
  SELECT cell, array_agg(ROUND(m, 6) ORDER BY i) AS c FROM (
    SELECT cell, i, AVG(x) AS m FROM (
      SELECT cell, generate_subscripts(v, 1) AS i, UNNEST(v) AS x FROM a1
    ) t GROUP BY cell, i) t2 GROUP BY cell
),
c1 AS MATERIALIZED (
  SELECT p.cell, COALESCE(m.c, p.c) AS c FROM c0 p LEFT JOIN m1 m USING (cell)
),
a2 AS MATERIALIZED (
  SELECT id, v, cell FROM (
    SELECT v.id, v.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.id
                              ORDER BY list_distance(v.v, c.c), c.cell) AS rn
    FROM v, c1 c) t WHERE rn = 1
),
m2 AS MATERIALIZED (
  SELECT cell, array_agg(ROUND(m, 6) ORDER BY i) AS c FROM (
    SELECT cell, i, AVG(x) AS m FROM (
      SELECT cell, generate_subscripts(v, 1) AS i, UNNEST(v) AS x FROM a2
    ) t GROUP BY cell, i) t2 GROUP BY cell
),
c2 AS MATERIALIZED (
  SELECT p.cell, COALESCE(m.c, p.c) AS c FROM c1 p LEFT JOIN m2 m USING (cell)
)"""


# --------------------------------------------------------------------------
# 9. Centroids, event-time windows, fingerprints, near-dedup composite
# --------------------------------------------------------------------------


_KMEANS_ORACLE = _KMEANS_CTES + """,
af AS MATERIALIZED (
  SELECT id, cell, POWER(list_distance(v, c), 2) AS dist2 FROM (
    SELECT v.id, c.cell, v.v, c.c,
           ROW_NUMBER() OVER (PARTITION BY v.id
                              ORDER BY list_distance(v.v, c.c), c.cell) AS rn
    FROM v, c2 c) t WHERE rn = 1
)
SELECT cell AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(id) AS BIGINT) AS id_sum,
       CAST(MIN(id) AS BIGINT) AS min_id,
       CAST(MAX(id) AS BIGINT) AS max_id,
       ROUND(AVG(dist2), 4) + 0 AS avg_dist2
FROM af GROUP BY cell
"""


def _jl_oracle_sql() -> str:
    """Oracle for jl_distortion_report: the SAME rounded literal
    matrix (functions/vector.jl_projection_matrix is seeded and
    rounds to 6 decimals precisely so both engines project through
    identical constants) as a 2,048-row VALUES table, projection as a
    (vec_id, i) group-sum, distances via list_distance."""
    from value_at_risk_spark.functions.vector import jl_projection_matrix

    mat = jl_projection_matrix(64, 32, seed=123)
    vals = ",".join(
        f"({i + 1},{j + 1},{mat[i][j]!r})"
        for i in range(32)
        for j in range(64)
    )
    return f"""
WITH R(i, j, r) AS (VALUES {vals}),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
proj AS MATERIALIZED (
  SELECT e.vec_id, R.i, SUM(e.v[R.j] * R.r) AS p
  FROM e, R GROUP BY e.vec_id, R.i
),
pv AS MATERIALIZED (
  SELECT vec_id, array_agg(p ORDER BY i) AS pv FROM proj GROUP BY vec_id
),
pairs AS (
  SELECT a.label,
         POWER(list_distance(pa.pv, pb.pv), 2)
           / POWER(list_distance(a.v, b.v), 2) AS ratio
  FROM e a
  JOIN e b ON b.vec_id = a.vec_id + 1
  JOIN pv pa ON pa.vec_id = a.vec_id
  JOIN pv pb ON pb.vec_id = b.vec_id
  WHERE a.vec_id % 2 = 0
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ratio), 4) + 0 AS avg_ratio,
       ROUND(MIN(ratio), 4) + 0 AS min_ratio,
       ROUND(MAX(ratio), 4) + 0 AS max_ratio
FROM pairs GROUP BY label
"""


# --------------------------------------------------------------------------
# 10. Embedding normalization, text cleaning, quantiles, CDC compaction,
#     histograms, correlation matrix, stratified sampling
# --------------------------------------------------------------------------


def _planted_embedding_corpus(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(base, planted) recall fixture shared by ann_near_dup_lsh and
    ann_ivf_recall_planted: every 5th vector gets a copy at
    id + 1000000, perturbed by an exact integer-arithmetic delta
    (((vec_id·31 + i·17) mod 7) − 3) · 0.005 per position — cosine
    ≈ 0.997 to its source while natural fixture pairs top out ≈ 0.51.
    Integer mod + one multiply keeps both engines bit-identical; the
    matching DuckDB CTE lives in both queries' oracle SQL."""
    base = e.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planted = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + ((F.col("vec_id") * 31 + i.cast("bigint") * 17) % 7 - 3)
            * F.lit(0.005),
        ).alias("v"),
    )
    # the transforms preserve width but DROP the source column's dim
    # metadata (computed expressions carry no metadata) — re-stamp so
    # downstream k-means / PQ training resolves dim without a probe job
    md = e.schema["embedding"].metadata if "embedding" in e.columns else None
    if md and md.get("dim"):
        base = base.withMetadata("v", {"dim": int(md["dim"])})
        planted = planted.withMetadata("v", {"dim": int(md["dim"])})
    return base, planted


# --------------------------------------------------------------------------
# 14. Round-3 tail: remaining TPC-H plan shapes (Q5/Q9/Q13/Q19/Q21)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# 10. Round 6: training-data pipeline widening — PII scrubbing,
#     deterministic per-group sampling, windowed event dedup, robust
#     stats, inter-arrival features, embedding quantization
# --------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"


def _planted_queries(e: DataFrame, mod: int) -> DataFrame:
    """Perturbed copies of every ``mod``-th corpus vector — the pytest
    recall construction, reused by the self-certifying ANN gate rows:
    each query is its source vector plus a tiny deterministic wiggle,
    so the source IS the query's true nearest neighbor and shortlist
    recall is decidable in-plan without a brute-force pass."""
    return e.filter(F.col("vec_id") % mod == 0).select(
        (F.col("vec_id") + 1_000_000).alias("query_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + ((F.col("vec_id") * 31 + i.cast("bigint") * 17) % 7 - 3)
            * F.lit(0.005),
        ).alias("embedding"),
    )


def _certify_shortlist_recall(
    short: DataFrame, nq: int, floor: float, name: str
) -> None:
    """Raise (turning the gate row RED) unless the planted near-dup's
    source survives into the 10%-of-corpus shortlist for at least
    ``floor`` of the queries — the operative guarantee of a shortlist
    stage, folded INTO the gate row (r13 verdict #6, the
    streaming_heavy_hitters_demo certify-in-query pattern) so a recall
    regression can never pass silently. The check is one scalar
    aggregate (hits), not a collect of the shortlist."""
    hits = (
        short.filter(
            F.col("neighbor_id") == F.col("query_id") - 1_000_000
        )
        .select("query_id")
        .distinct()
        .count()
    )
    recall = hits / max(nq, 1)
    if recall < floor:
        raise AssertionError(
            f"{name}: planted shortlist recall {recall:.3f} < floor "
            f"{floor} — the index no longer holds strong neighbors in "
            "a 10%-of-corpus shortlist"
        )


# --------------------------------------------------------------------------
# Round-7 sixth pass: market microstructure, risk attribution,
# distribution testing, and pipeline diagnostics
# --------------------------------------------------------------------------

_Z99 = 2.3263478740408408  # Phi^-1(0.99), shared literal with the oracles


# --------------------------------------------------------------------------
# Round-7 eighth pass: graph ranking, cohorts, seasonality, attribution
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 ninth pass: corpus cross-contamination, ML feature engineering,
# behavioral transition structure, walk-forward evaluation
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 eleventh pass: concentration, classification, survival, elasticity
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twelfth pass: stressed VaR, leave-one-out VaR, covariance shrinkage
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirteenth pass: sequential monitoring + distributed bootstrap
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 fifteenth pass: association rules, path analysis, optimizer stats
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 sixteenth pass: EWMA covariance, volatility cones, underwater spells
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 eighteenth pass: GARCH forecast, microstructure, calendar effects
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 nineteenth pass: hierarchies by pointer jumping, window suite
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twentieth pass: HAC inference, cohort value, RFM segmentation
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-first pass: SQL text interface, readability scoring
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-second pass: market concentration, DiD uplift, dedup ROI
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-third pass: ES allocation, horizon scaling, mix diversity
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-fourth pass: sweep-line intervals, seasonality strength
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-fifth pass: conversion latency, power analysis, price index
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-sixth pass: robust outliers, tail dependence
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-seventh pass: corpus keywords, forecast backtest, degrees
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-eighth pass: XYZ classes, popularity recs, ship latency
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 twenty-ninth pass: Zipf fit, session depth, burstiness
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirtieth pass: drift report, revenue bridge, duplicate payments
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirty-first pass: engagement stickiness, supplier scorecard
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirty-second pass: compressibility filter, linear attribution
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirty-third pass: the Basel capital charge composition
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirty-fifth pass: VaR confidence bands, freshness report
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Round-7 thirty-sixth pass: effective sample size, dollar retention
# --------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Native Delta transaction log (sources/deltalog.py) — the reference's
# Delta persistence semantics (configure_notebook.py:18-27,
# 03_var_monte_carlo.py:162) without the delta-spark bindings this
# environment lacks: JSON commit log, atomic hard-link publish,
# checkpoints, version time travel, Hive-partitioned layout.

_SCRATCH_MEMO: dict = {}
# RLock: a builder that (today or later) composes another scratch
# table re-enters on the same thread — a plain Lock would deadlock
_SCRATCH_LOCK = threading.RLock()
_SCRATCH_ROOTS: list = []


def _scratch_cleanup() -> None:
    import shutil

    for p in _SCRATCH_ROOTS:
        shutil.rmtree(p, ignore_errors=True)


def _scratch_delta_table(
    kind: str, sf_dir: str, recipe: str, build: Callable[[str], None]
) -> str:
    """HERMETIC per-process build of the native-delta demo tables the
    gate queries read. Each (kind, sf_dir, recipe) builds exactly once
    per process into a fresh ``mkdtemp`` owned exclusively by this
    process; nothing is ever loaded from (or published to) shared
    cross-process /tmp state, and no GC runs on the query path.

    Rationale (round-13): two consecutive gate-red rounds on
    `delta_sql_dml_scan` + a red `delta_small_file_compaction_scan`
    traced to the previous shared content-keyed cache — a sibling
    process's grace-GC `rmtree` could race a warm load that trusted
    directory-existence as completeness, and the digest omitted
    fixture CONTENT, so a stale table could silently serve old data
    after a fixture regen. Cold builds cost 0.5-1.8 s at sf0.01, so
    caching bought little on the gate path; bench/scale arms build
    their own tables into their own mkdtemps (bench.py) and are
    unaffected. The in-process memo is guarded by a lock and the path
    is memoized only AFTER ``build`` returns, so a concurrent
    evaluation in the same process can never observe a half-built
    table; the memo makes repeated same-process reads (sweeps, pytest
    sessions) warm. All roots are rmtree'd at interpreter exit."""
    import atexit
    import os
    import tempfile

    key = (kind, os.path.abspath(sf_dir), recipe)
    with _SCRATCH_LOCK:
        got = _SCRATCH_MEMO.get(key)
        if got is not None and os.path.isdir(got):
            return got
        if not _SCRATCH_ROOTS:
            atexit.register(_scratch_cleanup)
        root = tempfile.mkdtemp(prefix=f"vars_delta_{kind}_")
        _SCRATCH_ROOTS.append(root)
        tbl = os.path.join(root, "table")
        build(tbl)
        _SCRATCH_MEMO[key] = tbl
        return tbl


def _delta_demo_table(spark: SparkSession, sf_dir: str) -> str:
    """Native Delta table built deterministically from the customer
    fixture: v0 = even custkeys (partitioned by mktsegment), v1 =
    append odd custkeys, then a checkpoint — so every later read
    exercises checkpoint + tail replay. Content is a pure function of
    the fixture; cached through the atomic build-or-load scratch."""

    def build(tbl: str) -> None:
        from value_at_risk_spark.sources.deltalog import (
            checkpoint_delta,
            optimize_delta,
            write_delta,
        )

        cust = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
        write_delta(
            spark,
            cust.filter(F.col("c_custkey") % 2 == 0),
            tbl,
            partition_by=["c_mktsegment"],
        )
        write_delta(spark, cust.filter(F.col("c_custkey") % 2 == 1), tbl)
        # OPTIMIZE ZORDER (reference 03_var_monte_carlo.py:162) as v2 —
        # dataChange=false, so the gate oracle additionally proves the
        # clustered rewrite loses nothing
        optimize_delta(
            spark, tbl, zorder_by=["c_custkey", "c_acctbal"], target_files=4
        )
        checkpoint_delta(tbl)

    return _scratch_delta_table(
        "demo", sf_dir, "customer even/odd + zorder + checkpoint v1", build
    )


def _delta_dml_table(spark: SparkSession, sf_dir: str) -> str:
    """Native Delta table exercising the DML surface, built
    deterministically from the orders fixture: v0 = even orderkeys
    (partitioned by o_orderstatus), v1 = append odd, v2 = DELETE WHERE
    o_totalprice < 50000 (file-level copy-on-write), v3 = UPDATE
    o_totalprice *= 2 WHERE o_orderpriority = '1-URGENT'. Both
    mutations are pure functions of the fixture, so DuckDB can
    recompute the final state from the original parquet. Published
    atomically (_scratch_delta_table) — no reader can see the table
    between v2 and v3."""

    def build(tbl: str) -> None:
        from value_at_risk_spark.sources.deltalog import (
            delete_from_delta,
            update_delta,
            write_delta,
        )

        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        write_delta(
            spark,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            tbl,
            partition_by=["o_orderstatus"],
        )
        write_delta(spark, orders.filter(F.col("o_orderkey") % 2 == 1), tbl)
        delete_from_delta(spark, tbl, "o_totalprice < 50000.0")
        # *2 is exact in binary floating point — no cross-engine
        # rounding grid to manage on the product itself
        update_delta(
            spark,
            tbl,
            "o_orderpriority = '1-URGENT'",
            {"o_totalprice": "o_totalprice * 2"},
        )

    return _scratch_delta_table(
        "dml", sf_dir, "orders even/odd + del<50000 + upd urgent*2", build
    )


def _delta_dv_table(spark: SparkSession, sf_dir: str, purged: bool) -> str:
    """DV-enabled native Delta table: v0 = even orderkeys partitioned
    by o_orderstatus (delta.enableDeletionVectors set at creation),
    v1 = append odd, v2 = merge-on-read DELETE (o_totalprice < 50000:
    bitmaps committed, zero files rewritten), v3 = second DV DELETE
    (o_orderpriority = '5-LOW': bitmap UNION on already-DV'd files).
    The ``purged`` variant additionally runs REORG APPLY (PURGE) to
    materialize every bitmap — same logical rows, no descriptors left.
    Both mutations are pure functions of the orders fixture, so DuckDB
    recomputes the final state from the original parquet. Published
    atomically via _scratch_delta_table."""

    def build(tbl: str) -> None:
        from value_at_risk_spark.sources.deltalog import (
            delete_from_delta,
            purge_deletion_vectors,
            write_delta,
        )

        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        write_delta(
            spark,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            tbl,
            partition_by=["o_orderstatus"],
            configuration={"delta.enableDeletionVectors": "true"},
        )
        write_delta(spark, orders.filter(F.col("o_orderkey") % 2 == 1), tbl)
        r1 = delete_from_delta(spark, tbl, "o_totalprice < 50000.0")
        r2 = delete_from_delta(spark, tbl, "o_orderpriority = '5-LOW'")
        # the point of the fixture: merge-on-read rewrote NOTHING
        assert r1["files_rewritten"] == 0 and r2["files_rewritten"] == 0
        if purged:
            purge_deletion_vectors(spark, tbl)

    return _scratch_delta_table(
        f"dv{'p' if purged else ''}",
        sf_dir,
        "orders even/odd dv del<50000 + del 5-LOW"
        + (" + purge" if purged else ""),
        build,
    )


_DELTA_DV_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE NOT (o_totalprice < 50000.0)
  AND NOT (o_orderpriority = '5-LOW')
GROUP BY o_orderstatus
"""


def _delta_cdf_table(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped CDF-enabled native Delta table: the same
    deterministic DML walk as _delta_dml_table (v0 even orderkeys, v1
    append odd, v2 DELETE o_totalprice < 50000, v3 UPDATE urgent
    price *= 2) with ``delta.enableChangeDataFeed`` set at creation,
    so every commit's row-level changes are recoverable through
    table_changes — inserts derived from the appends' add actions,
    delete/update_preimage/update_postimage from the DML's cdc files
    (sources/deltalog: _stage_cdc / table_changes)."""
    def build(tbl: str) -> None:
        from value_at_risk_spark.sources.deltalog import (
            delete_from_delta,
            update_delta,
            write_delta,
        )

        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        write_delta(
            spark,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            tbl,
            partition_by=["o_orderstatus"],
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        write_delta(spark, orders.filter(F.col("o_orderkey") % 2 == 1), tbl)
        delete_from_delta(spark, tbl, "o_totalprice < 50000.0")
        update_delta(
            spark,
            tbl,
            "o_orderpriority = '1-URGENT'",
            {"o_totalprice": "o_totalprice * 2"},
        )

    return _scratch_delta_table(
        "cdf", sf_dir, "orders even/odd cdf + del<50000 + upd urgent*2",
        build,
    )




# Re-export EVERYTHING (including underscore-prefixed helpers)
# so the domain modules' wildcard import sees the same namespace
# the single-module form had.
__all__ = [_n for _n in list(globals()) if not _n.startswith('__')]
