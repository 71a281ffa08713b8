"""Query registry — relational core, TPC-H shapes, events analytics.

Mechanically split from the former single-module queries.py (r15,
VERDICT #7): zero behavior change, every query re-registers through
the same @query decorator in ``queries._shared``; the package
__init__ imports every domain module so ``from
value_at_risk_spark.queries import QUERIES, ORACLES`` is unchanged.
"""

from value_at_risk_spark.queries._shared import *  # noqa: F401,F403


@query(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount), 4)), 4) AS sum_disc_price,
       ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 5e-9, 4)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregation (A1/A7; flagship agg shape).

    Filter reaches the parquet scan (PushedFilters on l_shipdate);
    partial aggregation map-side; two-column hash agg.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.round(disc_price, 4)), 4).alias("sum_disc_price"),
            # + 5e-9: the 6-decimal charge grid lands exactly on round-4
            # boundaries; the epsilon makes both engines round those up.
            F.round(
                F.sum(F.round(disc_price * (1 + F.col("l_tax")) + 5e-9, 4)), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

@query(
    "filter_project",
    """
SELECT l_orderkey, l_linenumber,
       CAST(l_shipdate AS DATE) AS ship_d,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
""",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown (P1-P6); scan reads 6 columns only."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & F.col("l_discount").between(0.02, 0.09)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_d"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
    )

@query(
    "distinct_priorities",
    "SELECT DISTINCT o_orderpriority AS priority FROM orders",
)
def distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection (P10)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("priority"))
        .distinct()
    )

@query(
    "join_revenue_by_nation",
    """
SELECT n_name, r_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
""",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi join with explicit broadcast of dimensions (J4).

    customer/nation/region are dimension-sized → broadcast-hash joins;
    only the orders fact streams. Mirrors the portfolio joins at
    04_var_aggregation.py:16 / 05_var_compliance.py:48.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )

@query(
    "cross_join_nation_region",
    "SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def cross_join_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condition-less cross join (J1-J3 shape; trial fan-out mechanism)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select("n_name", "r_name")

@query(
    "semi_join_customers_with_orders",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (engine surface beyond the reference; SURVEY §2.3)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )

@query(
    "anti_join_customers_without_orders",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )

@query(
    "set_union_nations",
    """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (set-op surface, SURVEY §2.7)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()

@query(
    "set_intersect_nations",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)

@query(
    "set_except_nations",
    """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics

@query(
    "top3_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (engine surface; SURVEY §2.5
    'not present' list — exposed because worst-1%-of-events analyses
    imply it)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )

@query(
    "rollup_customers_by_region",
    """
SELECT r_name, n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def rollup_customers_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — the idiomatic completion of the
    reference's date×country×industry slice-and-dice
    (04_var_aggregation.py:82; SURVEY §2.4 note)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )

@query(
    "pivot_events_daily",
    """
SELECT CAST(ts AS DATE) AS day,
       ROUND(SUM(value) FILTER (WHERE event_type = 'click'), 4) AS "click",
       ROUND(SUM(value) FILTER (WHERE event_type = 'error'), 4) AS "error",
       ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 4) AS "purchase",
       ROUND(SUM(value) FILTER (WHERE event_type = 'signup'), 4) AS "signup",
       ROUND(SUM(value) FILTER (WHERE event_type = 'view'), 4) AS "view"
FROM events
GROUP BY 1
""",
)
def pivot_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (A9) with an explicit value list (no extra distinct pass)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 4))
    )

@query(
    "events_json_extract",
    """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON field extraction (engine surface)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )

@query(
    "christoffersen_independence_test",
    "WITH "
    + SQL_RETS
    + """,
v AS (SELECT series, quantile_cont(ret, 0.01) AS var_99 FROM rets GROUP BY 1),
f AS (
  SELECT r.series, r.d,
         CASE WHEN r.ret < v.var_99 THEN 1 ELSE 0 END AS b
  FROM rets r JOIN v ON r.series = v.series
),
p AS (
  SELECT series, b AS cur,
         LAG(b) OVER (PARTITION BY series ORDER BY d) AS prev
  FROM f
),
c AS (
  SELECT series,
         SUM(CASE WHEN prev = 0 AND cur = 0 THEN 1 ELSE 0 END) AS n00,
         SUM(CASE WHEN prev = 0 AND cur = 1 THEN 1 ELSE 0 END) AS n01,
         SUM(CASE WHEN prev = 1 AND cur = 0 THEN 1 ELSE 0 END) AS n10,
         SUM(CASE WHEN prev = 1 AND cur = 1 THEN 1 ELSE 0 END) AS n11
  FROM p WHERE prev IS NOT NULL GROUP BY 1
)
SELECT series,
       CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
       CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
       ROUND(
         -2 * (CASE WHEN n00 + n10 > 0 AND n01 + n11 > 0 AND n00 + n01 + n10 + n11 > 0
                    THEN (n00 + n10) * LN(1 - (n01 + n11) * 1.0 / (n00 + n01 + n10 + n11))
                       + (n01 + n11) * LN((n01 + n11) * 1.0 / (n00 + n01 + n10 + n11))
                    ELSE 0 END)
         + 2 * (CASE WHEN n00 > 0 AND n01 > 0
                     THEN n00 * LN(n00 * 1.0 / (n00 + n01)) + n01 * LN(n01 * 1.0 / (n00 + n01))
                     ELSE 0 END
              + CASE WHEN n10 > 0 AND n11 > 0
                     THEN n10 * LN(n10 * 1.0 / (n10 + n11)) + n11 * LN(n11 * 1.0 / (n10 + n11))
                     ELSE 0 END),
         6) + 0 AS lr_ind
FROM c
""",
)
def christoffersen_independence_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Christoffersen (1998) independence backtest — do VaR breaches
    CLUSTER? The Markov transition counts (n00, n01, n10, n11) come
    from one LAG window over the per-series breach flags, and the
    likelihood ratio compares breach probability conditional on
    yesterday's state against the unconditional rate. Degenerate
    cells (a state never visited or never followed by a breach)
    contribute zero log-likelihood via the same CASE pinning as the
    Kupiec query, identically on both engines. One window + one
    grouped conditional-sum — the full conditional-coverage pair with
    kupiec_pof_test."""
    rets = daily_returns(spark, sf_dir)
    v = rets.groupBy("series").agg(
        value_at_risk_expr("ret", 99.0).alias("var_99")
    )
    f = rets.join(F.broadcast(v), "series").select(
        "series",
        "d",
        F.when(F.col("ret") < F.col("var_99"), 1).otherwise(0).alias("b"),
    )
    w = Window.partitionBy("series").orderBy("d")
    p = f.select(
        "series", F.col("b").alias("cur"), F.lag("b").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = p.groupBy("series").agg(
        *[
            F.sum(
                F.when(
                    (F.col("prev") == i) & (F.col("cur") == j), 1
                ).otherwise(0)
            ).alias(f"n{i}{j}")
            for i in (0, 1)
            for j in (0, 1)
        ]
    )
    n00, n01, n10, n11 = (F.col(f"n{i}{j}") for i in (0, 1) for j in (0, 1))
    tot = n00 + n01 + n10 + n11
    pi = (n01 + n11) * F.lit(1.0) / tot
    l_null = F.when(
        ((n00 + n10) > 0) & ((n01 + n11) > 0) & (tot > 0),
        (n00 + n10) * F.log(1 - pi) + (n01 + n11) * F.log(pi),
    ).otherwise(0.0)
    l_alt = F.when(
        (n00 > 0) & (n01 > 0),
        n00 * F.log(n00 * F.lit(1.0) / (n00 + n01))
        + n01 * F.log(n01 * F.lit(1.0) / (n00 + n01)),
    ).otherwise(0.0) + F.when(
        (n10 > 0) & (n11 > 0),
        n10 * F.log(n10 * F.lit(1.0) / (n10 + n11))
        + n11 * F.log(n11 * F.lit(1.0) / (n10 + n11)),
    ).otherwise(0.0)
    lr = -2 * l_null + 2 * l_alt
    return c.select(
        "series",
        *[F.col(f"n{i}{j}").cast("long").alias(f"n{i}{j}") for i in (0, 1) for j in (0, 1)],
        (F.round(lr, 6) + F.lit(0.0)).alias("lr_ind"),
    )

@query(
    "asof_join_events",
    """
WITH pday AS (
  SELECT CAST(ts AS DATE) AS pd, ROUND(SUM(value), 4) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
clicks AS (
  SELECT event_id, CAST(ts AS DATE) AS cd, ROUND(value, 4) AS cval
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.cd, c.cval,
       p.pd AS right_pd, p.pval AS right_pval
FROM clicks c ASOF LEFT JOIN pday p ON c.cd >= p.pd
""",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpartitioned backward as-of join (J5; tempo usage at
    03_var_monte_carlo.py:30-42): each click event picks up the latest
    daily purchase aggregate at or before its day."""
    e = _t(spark, sf_dir, "events")
    pday = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("pd"))
        .agg(F.round(F.sum("value"), 4).alias("pval"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id",
        F.col("ts").cast("date").alias("cd"),
        F.round("value", 4).alias("cval"),
    )
    # the bucketed variant is the scale path for unkeyed as-of joins —
    # identical output (test-asserted), shuffles on time buckets instead
    # of a single global sort task
    from value_at_risk_spark.operators.asof import asof_join_bucketed

    return asof_join_bucketed(
        clicks, pday, on="cd", right_on="pd", bucket_seconds=7 * 86_400
    )

@query(
    "nonlinear_feature_expansion",
    "WITH "
    + SQL_RETS
    + """
SELECT series, d,
       (ROUND(ret, 6) + 0) AS f_x,
       (ROUND(SIGN(ret) * ret * ret, 6) + 0) AS f_x2,
       (ROUND(ret * ret * ret, 6) + 0) AS f_x3,
       (ROUND(SIGN(ret) * SQRT(ABS(ret)), 6) + 0) AS f_sqrt
FROM rets
""",
)
def nonlinear_feature_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-linear feature expansion (F10; utils/var_utils.py:47-55) as a
    native higher-order expression, surfaced as scalar columns."""
    rets = daily_returns(spark, sf_dir)
    feats = nonlinear_features(F.array(F.col("ret")))
    return rets.select(
        "series",
        "d",
        (F.round(feats[0], 6) + F.lit(0.0)).alias("f_x"),
        (F.round(feats[1], 6) + F.lit(0.0)).alias("f_x2"),
        (F.round(feats[2], 6) + F.lit(0.0)).alias("f_x3"),
        (F.round(feats[3], 6) + F.lit(0.0)).alias("f_sqrt"),
    )

@query(
    "linear_predictor_score",
    "WITH "
    + SQL_RETS
    + """
SELECT series, d,
       ROUND(1.0 + 0.1 * ret
                 + 0.2 * (SIGN(ret) * ret * ret)
                 + 0.3 * (ret * ret * ret)
                 + 0.4 * (SIGN(ret) * SQRT(ABS(ret))), 6) AS score
FROM rets
""",
)
def linear_predictor_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear predictor over expanded features (F11;
    utils/var_utils.py:58-62): w[0] + Σ w[i+1]·f[i] as a native
    fold — the engine's no-MLflow scoring path."""
    rets = daily_returns(spark, sf_dir)
    weights = F.array(*[F.lit(x) for x in (1.0, 0.1, 0.2, 0.3, 0.4)])
    feats = nonlinear_features(F.array(F.col("ret")))
    return rets.select(
        "series", "d", F.round(predict_nonlinear(weights, feats), 6).alias("score")
    )

@query(
    "gapfill_forward_fill",
    "WITH "
    + SQL_DAILY
    + """,
bounds AS (SELECT series, MIN(d) AS mn, MAX(d) AS mx FROM daily GROUP BY 1),
alldates AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(TIMESTAMP '1990-01-01', TIMESTAMP '2010-12-31',
                       INTERVAL 1 DAY) t(gs)
),
spine AS (
  SELECT b.series, a.d FROM bounds b JOIN alldates a
    ON a.d >= b.mn AND a.d <= b.mx
),
bd AS (SELECT * FROM spine WHERE isodow(d) BETWEEN 1 AND 5),
j AS (SELECT s.series, s.d, dl.price FROM bd s
      LEFT JOIN daily dl ON dl.series = s.series AND dl.d = s.d)
SELECT series, d,
       last_value(price IGNORE NULLS) OVER (
         PARTITION BY series ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
FROM j
""",
)
def gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day calendar spine + forward fill (S1;
    utils/var_utils.py:6-9 pandas reindex().pad() made distributed)."""
    daily = daily_prices(spark, sf_dir)
    return forward_fill_spine(
        daily, ["series"], "d", ["price"], business_days_only=True
    )

@query(
    "ols_fit_per_flag",
    """
SELECT l_returnflag,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS intercept,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope
FROM lineitem
GROUP BY l_returnflag
""",
)
def ols_fit_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS via applyInPandas (A6; train_model,
    02_var_model.py:137-154) — numpy lstsq per group, checked against
    the closed-form REGR_* aggregates. The one legitimately-Python
    fit boundary in the engine (SURVEY §2.10 principle)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.array(F.col("l_quantity")).alias("features"),
        F.col("l_extendedprice").alias("target"),
    )
    w = fit_ols_per_group(li, "l_returnflag", "features", "target")
    return w.select(
        "l_returnflag",
        F.round(F.element_at("weights", 1), 2).alias("intercept"),
        F.round(F.element_at("weights", 2), 4).alias("slope"),
    )

@query(
    "jaccard_adjacent_docs",
    "WITH "
    + SQL_TOKS
    + """,
dtoks AS (
  SELECT DISTINCT doc_id, t FROM toks
),
cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM dtoks GROUP BY 1
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM dtoks a JOIN dtoks b ON b.doc_id = a.doc_id + 1 AND a.t = b.t
  GROUP BY 1, 2
)
SELECT ca.doc_id AS id_a, cb.doc_id AS id_b,
       ROUND(COALESCE(ni, 0) * 1.0 / (ca.n + cb.n - COALESCE(ni, 0)), 6) AS jaccard
FROM cnt ca
JOIN cnt cb ON cb.doc_id = ca.doc_id + 1
LEFT JOIN inter ON inter.id_a = ca.doc_id
""",
)
def jaccard_adjacent_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/token-set Jaccard similarity between adjacent doc ids —
    the exact-verify kernel of near-dup detection, via
    array_intersect on distinct token sets (no Python)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    )
    t = d.select("doc_id", toks.alias("toks"))
    a = t.alias("a")
    b = t.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
    pairs = pairs.select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.toks").alias("toks_a"),
        F.col("b.toks").alias("toks_b"),
    )
    out = jaccard_similarity(
        pairs, "toks_a", "toks_b", out_col="jaccard_raw", tokenize=False
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard_raw", 6).alias("jaccard")
    )

@query(
    "global_order_stats",
    """
SELECT CAST(MIN(o_orderdate) AS DATE) AS min_d,
       CAST(MAX(o_orderdate) AS DATE) AS max_d,
       ROUND(AVG(o_totalprice), 4) AS avg_price,
       COUNT(*) AS n_orders
FROM orders
""",
)
def global_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) min/max/avg/count (A2/A3;
    04_var_aggregation.py:29, 02_var_model.py:234)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("min_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_d"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )

@query(
    "top10_orders",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global sort + limit (O1/O2). Spark executes this as
    a TakeOrderedAndProject — per-partition top-k then a k-row merge on
    the driver, never a full global sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )

@query(
    "distinct_users_by_type",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (engine surface; SURVEY §2.4 'not present'
    list). Spark expands this to a two-phase aggregation; at scale
    prefer approx_count_distinct (HLL sketch, single-pass) — exposed as
    approx_distinct_users below."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )

@query(
    "approx_distinct_users",
    """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS within_tol
FROM events GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch — the 100 TB path for
    cardinality — ORACLE-pinned on its PUBLISHED ACCURACY: the sketch
    estimate itself is engine-specific, but at rsd=0.01 it must land
    within a few σ of the true count, so the query emits the exact
    count (hash-compared against DuckDB's COUNT(DISTINCT)) plus a
    |approx−exact| ≤ 5%·exact verdict the oracle pins TRUE — 5σ of the
    requested error, the same inequality-oracle pattern as
    ann_ivf_recall_planted."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.01)
                - F.count_distinct("user_id")
            )
            <= 0.05 * F.count_distinct("user_id")
        ).alias("within_tol"),
    )

@query(
    "cube_orders_status_priority",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — the full slice-and-dice completion of
    04_var_aggregation.py:82 (SURVEY §2.4 note)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )

@query(
    "unpivot_lineitem_metrics",
    """
SELECT 'quantity' AS metric, ROUND(AVG(l_quantity), 4) AS avg_value FROM lineitem
UNION ALL
SELECT 'discount' AS metric, ROUND(AVG(l_discount), 4) AS avg_value FROM lineitem
UNION ALL
SELECT 'tax' AS metric, ROUND(AVG(l_tax), 4) AS avg_value FROM lineitem
""",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() — the inverse of A9's pivot."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, "
        "'tax', l_tax) AS (metric, v)"
    )
    return long.groupBy("metric").agg(F.round(F.avg("v"), 4).alias("avg_value"))

@query(
    "model_scoring_wsse",
    """
WITH m AS (
  SELECT l_returnflag AS rf,
         REGR_INTERCEPT(l_extendedprice, l_quantity) AS b0,
         REGR_SLOPE(l_extendedprice, l_quantity) AS b1
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag,
       ROUND(AVG(POW(b0 + b1 * l_quantity - l_extendedprice, 2)), -2) AS wsse
FROM lineitem JOIN m ON m.rf = l_returnflag
GROUP BY l_returnflag
""",
)
def model_scoring_wsse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model evaluation: broadcast-join the applyInPandas-fitted weights
    back and compute mean squared error natively (02_var_model.py:219-234
    — wsse via F2, minus the MLflow scoring UDF). Rounded to hundreds:
    lstsq vs closed-form REGR_* agree to ~1e-8 relative, which a cent-
    level round of a 1e8-magnitude statistic would amplify."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.array(F.col("l_quantity")).alias("features"),
        F.col("l_extendedprice").alias("target"),
    )
    w = fit_ols_per_group(li, "l_returnflag", "features", "target")
    pred = F.element_at("weights", 1) + F.element_at("weights", 2) * F.element_at(
        "features", 1
    )
    return (
        li.join(F.broadcast(w), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(F.round(F.avg(F.pow(pred - F.col("target"), 2)), -2).alias("wsse"))
    )

@query(
    "hourly_event_windows",
    """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows in batch (F.window — the same
    operator streaming uses; SURVEY §2.9 mapping)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

@query(
    "training_data_prep_v2",
    """
WITH RECURSIVE docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM docs, UNNEST(range(1, len(ts) - 1)) AS t(i)
  WHERE len(ts) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.s = b.s AND b.doc_id > a.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN cnt ca ON ca.doc_id = id_a
  JOIN cnt cb ON cb.doc_id = id_b
  WHERE ni * 1.0 / (ca.n + cb.n - ni) >= 0.8
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
survivors AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
),
grams AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS g
  FROM docs, UNNEST(range(1, len(ts) - 3)) AS t(i)
  WHERE len(ts) >= 5
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
contaminated AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 17 <> 0
),
sig AS (
  SELECT doc_id, len(ts) AS n,
         len(list_distinct(ts)) AS nd,
         len(list_filter(ts, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
           * 1.0 / len(ts) AS swr
  FROM docs WHERE len(ts) > 0
),
q AS (
  SELECT doc_id, n,
         ((CASE WHEN n BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN swr >= 0.05 AND swr <= 0.6 THEN 1.0 ELSE 0.0 END)
          + nd * 1.0 / n) / 3.0 AS quality
  FROM sig
)
SELECT s.doc_id,
       CAST(q.n AS BIGINT) AS n_tokens,
       ROUND(q.quality, 6) + 0 AS quality,
       CASE WHEN ('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 < 8
            THEN 'train'
            WHEN ('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 = 8
            THEN 'val' ELSE 'test' END AS split
FROM survivors s
JOIN q ON q.doc_id = s.doc_id
WHERE s.doc_id % 17 <> 0
  AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND q.quality >= 0.7
""",
)
def training_data_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL modern curation pipeline end-to-end, oracle-pinned as
    one dataflow: near-dedup survivors (LSH → exact Jaccard → connected
    components) → benchmark decontamination (5-gram overlap, benchmark
    docs themselves excluded) → quality floor (the training_data_prep
    composite signal ≥ 0.7) → deterministic train/val/test assignment.
    Composed ENTIRELY from the already-gated building blocks — each
    stage's plan is the one its standalone query exercises; the joins
    between stages are id-keyed semi/anti joins, so stage outputs
    (id sets, kilobytes per million docs) are the only inter-stage
    traffic. This is the per-batch shape of a production corpus
    refresh at any scale."""
    from value_at_risk_spark.functions.text import STOPWORDS, tokens

    surv = QUERIES["near_dedup_survivors"](spark, sf_dir)
    decon = QUERIES["decontaminate_training_docs"](spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    tk = tokens("text")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    sig = d.select(
        "doc_id",
        F.size(tk).alias("n"),
        F.size(F.array_distinct(tk)).alias("nd"),
        (
            F.size(F.filter(tk, lambda t: F.array_contains(sw, t)))
            / F.size(tk)
        ).alias("swr"),
    ).filter(F.col("n") > 0)
    q = sig.select(
        "doc_id",
        "n",
        (
            (
                F.when(F.col("n").between(10, 10000), 1.0).otherwise(0.0)
                + F.when(
                    (F.col("swr") >= 0.05) & (F.col("swr") <= 0.6), 1.0
                ).otherwise(0.0)
                + F.col("nd") / F.col("n")
            )
            / 3.0
        ).alias("quality"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10
    )
    return (
        surv.join(q, "doc_id")
        .join(
            decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
        )
        .filter(F.col("quality") >= 0.7)
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            (F.round("quality", 6) + F.lit(0.0)).alias("quality"),
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
    )

@query(
    "revenue_quantiles_by_nation",
    """
SELECT c_nationkey AS nationkey,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
)
def revenue_quantiles_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile grouped aggregation (exact linear interpolation,
    same family as O3's VaR percentile)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", 0.50), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.75), 4).alias("p75"),
        )
    )

@query(
    "latest_order_per_customer",
    """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: latest record per key via ranking window —
    the batch form of streaming upsert materialization."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
        )
    )

@query(
    "grouping_sets_orders",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube),
    via the SQL API over registered views — both APIs hit the same
    Catalyst Expand operator."""
    from value_at_risk_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )

@query(
    "salted_event_totals",
    """
SELECT event_type, ROUND(SUM(value), 4) AS total, COUNT(*) AS n_rows
FROM events GROUP BY event_type
""",
)
def salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.salted_agg):
    per-(key, salt) partials then a final combine — identical result to
    the direct groupBy (the oracle is the plain SQL), with hot keys
    spread over 16 reducers."""
    from value_at_risk_spark.operators.skew import salted_agg

    e = _t(spark, sf_dir, "events")
    return salted_agg(
        e,
        ["event_type"],
        [F.sum("value").alias("_s"), F.count(F.lit(1)).alias("_n")],
        lambda: [
            F.round(F.sum("_s"), 4).alias("total"),
            F.sum("_n").alias("n_rows"),
        ],
    )

@query(
    "top_bigrams",
    """
WITH pairs AS (
  SELECT UNNEST(list_zip(l, l[2:])) AS z FROM (
    SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS l
    FROM documents
  )
)
SELECT bigram, n FROM (
  SELECT z[1] || ' ' || z[2] AS bigram, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, z[1] || ' ' || z[2]) AS rnk
  FROM pairs WHERE z[2] IS NOT NULL
  GROUP BY 1
) WHERE rnk <= 20
""",
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequencies, top-20 (n-gram statistics — the
    LM-data staple). Spark: one explode of per-row bigram arrays +
    hash agg; the top-20 cut is ``orderBy().limit(20)`` —
    TakeOrderedAndProject's distributed partial top-k, not a rank
    window over the growing bigram vocabulary; deterministic tie-break
    on the bigram string."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    base = d.select(F.col("doc_id"), toks.alias("_tk"))
    bigrams = F.when(
        F.size("_tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_tk") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_tk", i), F.element_at("_tk", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        base.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
        .select("bigram", "n")
    )

@query(
    "video_frame_sampling",
    """
WITH v AS (
  SELECT doc_id AS media_id, GREATEST(n_chars * 10 - 1, 0) AS stop
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       CAST(UNNEST(range(0, stop + 1, 500)) AS BIGINT) AS frame_offset_ms
FROM v
""",
)
def video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing, GRADUATED to an arithmetic
    oracle (r13, the mp4_frame_extraction pattern): one output row per
    sampled frame offset per synthetic video. The offset sequence is
    CLOSED-FORM in the media metadata — sequence(0, duration_ms-1,
    every_ms) over the doc_id%3==2 'video' rows with duration =
    n_chars*10 — so DuckDB recomputes it exactly with a range
    expansion (Spark's sequence() is stop-INCLUSIVE, hence range(...,
    stop+1, ...)). The decode of each frame remains the stubbed
    mapInPandas stage (no codec libs); the sampling plumbing itself
    is hash-pinned."""
    from value_at_risk_spark.operators.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("x").alias("payload"),
        F.lit(64).cast("long").alias("width"),
        F.lit(64).cast("long").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
    return sample_frames(media, every_ms=500)

@query(
    "orders_above_customer_avg",
    """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (SURVEY §4: subquery decorrelation is a built-in
    this engine inherits; asserted here through the SQL API)."""
    from value_at_risk_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )

@query(
    "lsh_recall_high_jaccard",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM docs, UNNEST(range(1, len(ts) - 1)) AS t(i)
  WHERE len(ts) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.s = b.s AND b.doc_id > a.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(ni * 1.0 / (ca.n + cb.n - ni), 6) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = id_a
JOIN cnt cb ON cb.doc_id = id_b
WHERE ni * 1.0 / (ca.n + cb.n - ni) >= 0.8
""",
)
def lsh_recall_high_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall pinned by oracle: the DuckDB twin computes ALL pairs
    with true 3-gram-shingle Jaccard ≥ 0.8 exactly (inverted-index
    join); the Spark side emits only the pairs MinHash-LSH candidates
    catch, verified with the same exact Jaccard. Hash equality
    therefore asserts 100% recall on the fixture — MinHash here
    estimates the very metric the verify computes, and with 16 bands ×
    2 rows a J=0.8 pair escapes with probability (1-0.8²)¹⁶ ≈ 8e-8
    (the fixture's true pairs all sit at J ≥ 0.9: ≈ 3e-12).

    This oracle-ifies the verify stage of the dedup flow the way the
    reference's test suite pins its UDF outputs (tests_spark.py) —
    candidate generation stays hash-family-specific, recall does not.
    """
    from value_at_risk_spark.functions.text import shingles

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, num_hashes=32, shingle_n=3)
    pairs = minhash_lsh_pairs(sigs, num_bands=16, num_hashes=32)
    # Three consumers (both cand_ids legs + the verify join) would each
    # re-run the 32-hash signature pipeline; checkpoint the bounded
    # id-pair frame once (the batch-1 _lsh_verified_pairs pattern —
    # this query predates it; plan was 24 Exchanges / 24 scans).
    pairs = pairs.localCheckpoint(eager=True)
    # candidate-bounded verify (see minhash_lsh_pairs): shingle arrays
    # only for docs that appear in a candidate pair
    cand_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = d.join(F.broadcast(cand_ids), "doc_id", "left_semi").select(
        "doc_id", F.array_distinct(shingles("text", 3)).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    cand = pairs.join(a, "id_a").join(b, "id_b")
    verified = jaccard_similarity(
        cand, "sh_a", "sh_b", out_col="jacc", tokenize=False
    ).filter(F.col("jacc") >= 0.8)
    return verified.select(
        "id_a", "id_b", F.round("jacc", 6).alias("jaccard")
    )

@query(
    "streaming_daily_events",
    """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY 1, 2
""",
)
def streaming_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tier, exercised at the gate and HASH-CHECKED against
    the batch twin (the ``streaming_cdc_apply`` precedent: a bounded
    availableNow replay of a fixed fixture is deterministic, so the
    final complete-mode state must equal DuckDB's batch daily
    aggregate — the parity the replay==batch pytest has always
    asserted, now enforced by the oracle as well): watermarked daily
    windowed aggregate over a replay of the events fixture. One state
    row per (day, event_type); the full readStream → window-agg →
    memory-sink path runs per round."""
    from value_at_risk_spark.streaming.windows import (
        daily_event_aggregates,
        read_events_stream,
        run_available_now,
    )

    stream = read_events_stream(spark, sf_dir)
    agg = daily_event_aggregates(stream)
    # uuid sink name: a fixed queryName collides across concurrent sessions
    return run_available_now(
        agg, f"gate_streaming_daily_events_{uuid.uuid4().hex[:8]}"
    )

@query(
    "sql_api_nation_revenue",
    """
SELECT n_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(DISTINCT c_custkey) AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def sql_api_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door at the gate: registry-backed temp
    views (sources.registry.load_tables) + a pure ``spark.sql`` query —
    the identical ANSI text both engines run (the oracle IS this SQL).
    Everything else in the gate exercises the DataFrame API; this row
    pins that the declarative surface reaches the same Catalyst plans
    (dim joins broadcast, partial aggregation) users of ``spark.sql``
    get."""
    from value_at_risk_spark.sources.registry import load_tables

    load_tables(spark, sf_dir, names=("customer", "orders", "nation"))
    return spark.sql(
        """
        SELECT n_name,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(DISTINCT c_custkey) AS n_customers
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )

@query(
    "salted_distinct_users_by_type",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def salted_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe EXACT distinct count, oracle-pinned: the two-phase
    value-hash-salted rewrite (operators/skew.py rationale — holistic
    aggregates get no map-side shrink, so a hot key's whole payload
    lands on one reducer). Salting on hash(user_id) % 16 keeps every
    user inside one salt bucket, so the per-bucket COUNT(DISTINCT)s
    sum EXACTLY — same result as the plain plan (the oracle), hot keys
    spread over 16 reducers. The 5-value event_type column is this
    fixture's natural hot-key column."""
    e = _t(spark, sf_dir, "events")
    partial = e.groupBy(
        "event_type", F.pmod(F.hash("user_id"), F.lit(16)).alias("_salt")
    ).agg(
        F.count_distinct("user_id").alias("_d"),
        F.count(F.lit(1)).alias("_n"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_d").alias("n_users"), F.sum("_n").alias("n_events")
    )

@query(
    "streaming_interval_join",
    """
SELECT l.event_id AS l_event_id,
       r.event_id AS r_event_id,
       r.event_type AS r_event_type
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 1 HOUR
 AND r.ts <= l.ts
WHERE l.event_type = 'purchase'
""",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream INTERVAL join at the gate,
    HASH-CHECKED against the batch trailing-hour self-join (an inner
    stream-stream join over a bounded replay emits exactly the batch
    pair set — the parity the pytest asserts pair-for-pair, now
    oracle-enforced): each purchase event paired with the same user's
    events in the trailing hour, both sides unbounded streams with
    state evicted by watermark + time bound. Emits the joined pairs in
    append mode (a stream-stream join supports no other); the row SET
    is replay-order-stable."""
    from value_at_risk_spark.streaming.joins import interval_join_streams
    from value_at_risk_spark.streaming.windows import read_events_stream

    left = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    right = read_events_stream(spark, sf_dir)
    joined = interval_join_streams(
        left, right, by="user_id", lookback_seconds=3600
    ).select("l_event_id", "r_event_id", "r_event_type")
    sink = f"gate_ss_interval_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("streaming_interval_join: replay exceeded 180s")
    return spark.table(sink)

@query(
    "weekly_ohlc_candles",
    "WITH "
    + SQL_DAILY
    + """
SELECT CAST(date_trunc('week', d) AS DATE) AS bucket, series,
       arg_min(price, d) AS open,
       MAX(price) AS high,
       MIN(price) AS low,
       arg_max(price, d) AS close,
       COUNT(*) AS n_obs
FROM daily GROUP BY 1, 2
""",
)
def weekly_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick data (viz.ohlc_resample — the distributed analogue
    of plot_candlesticks, utils/var_viz.py:1-20): weekly OHLC bars in
    one hash-agg via min_by/max_by, no window, no sort. Values stay on
    the daily series' 2dp grid (pure selection/min/max), so no extra
    rounding is needed for cross-engine parity."""
    from value_at_risk_spark.viz import ohlc_resample

    return ohlc_resample(
        daily_prices(spark, sf_dir), ts_col="d", price_col="price",
        by=["series"], every="week",
    )

@query(
    "training_data_prep",
    """
WITH keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
base AS (
  SELECT d.doc_id, d.text FROM documents d JOIN keep k ON k.doc_id = d.doc_id
),
toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM base
  ) WHERE t <> ''
),
sig AS (
  SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT t) AS nd,
         SUM(CASE WHEN t IN ('the','a','of','and','to','in','is','on','for','with')
                  THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS swr
  FROM toks GROUP BY doc_id
),
q AS (
  SELECT doc_id,
         ((CASE WHEN n BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN swr >= 0.05 AND swr <= 0.6 THEN 1.0 ELSE 0.0 END)
          + nd * 1.0 / n) / 3.0 AS quality
  FROM sig
),
docs AS (
  SELECT b.doc_id, q.quality,
         list_filter(string_split(lower(b.text),' '), x -> x <> '') AS ts
  FROM base b JOIN q ON q.doc_id = b.doc_id
  WHERE q.quality >= 0.7
),
n AS (
  SELECT doc_id, quality, ts,
         GREATEST(CAST(CEIL((len(ts) - 16) / 48.0) AS BIGINT), 1) AS nc
  FROM docs
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       CAST(len(ts[i*48+1 : i*48+64]) AS INT) AS n_tokens,
       ROUND(quality, 6) AS quality
FROM n, UNNEST(range(0, nc)) AS t(i)
""",
)
def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep over `documents`, each stage the
    engine's own operator: exact dedup (md5 digest, keep min id) →
    quality filter (composite score ≥ 0.7) → 64/48 token-window
    chunking → per-chunk token counts. The canonical corpus → training
    shards flow; every stage stays in native expressions, the only
    shuffles being the dedup digest agg and the keep-id semi-join."""
    from value_at_risk_spark.functions.text import chunk_tokens, quality_score
    from value_at_risk_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    keep = exact_dedup(d).select(F.col("keep_id").alias("doc_id"))
    base = d.join(keep, "doc_id", "left_semi")
    scored = base.select(
        "doc_id", "text", quality_score("text", rounded=False).alias("quality")
    ).filter(F.col("quality") >= 0.7)
    ch = scored.select(
        "doc_id",
        "quality",
        F.explode(chunk_tokens("text", chunk_size=64, overlap=16)).alias("c"),
    )
    return ch.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size(F.split(F.col("c.chunk"), " ")).alias("n_tokens"),
        F.round("quality", 6).alias("quality"),
    )

@query(
    "shipping_priority_top10",
    """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(o_orderdate AS DATE) AS o_date,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate  > TIMESTAMP '1998-06-30'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers broadcast into the
    orders fact, then a FACT-FACT equi-join to lineitem on the order
    key (shuffle join — both sides stream; AQE picks/skew-splits), agg
    per order, global top-10 (TakeOrderedAndProject). The one join
    shape the star queries don't cover: neither side broadcastable at
    scale, co-partitioned on the join key. Revenue rounds to 4dp — the
    exact grid of 2dp-price × 2dp-discount products (NOTES.md rule)."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp")
    )
    return (
        l.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            l.l_orderkey == o.o_orderkey,
        )
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )

@query(
    "repetition_scores",
    """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM docs, UNNEST(range(1, greatest(len(ts) - 1, 2))) AS t(i)
  WHERE len(ts) >= 3
)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       ROUND(1.0 - COUNT(DISTINCT s) * 1.0 / COUNT(*), 6) + 0 AS rep_ratio
FROM sh GROUP BY doc_id
""",
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-3-gram ratio per document (1 − distinct/total shingles)
    — the Gopher-style repetition quality signal for filtering
    low-quality/templated text. Pure per-row higher-order expressions:
    no explode, no shuffle (the DuckDB twin explodes because SQL lacks
    HOFs over arrays with dedup — semantics identical)."""
    from value_at_risk_spark.functions.text import shingles

    from value_at_risk_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    sh = shingles("text", 3)
    n = F.size(sh)
    nd = F.size(F.array_distinct(sh))
    # docs need >= 3 tokens for a full 3-gram (same guard as the twin)
    return d.filter(F.size(tokens("text")) >= 3).select(
        "doc_id",
        n.cast("long").alias("n_shingles"),
        (F.round(F.lit(1.0) - nd / n, 6) + F.lit(0.0)).alias("rep_ratio"),
    )

@query(
    "promo_revenue_share",
    """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       ROUND(SUM(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4)
         AS promo_revenue,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
       ROUND(SUM(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) + 0 AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape over the part dimension (the one fixture table
    the other queries don't touch): monthly promo-type revenue share —
    part broadcasts into the lineitem fact, conditional aggregation,
    revenue on the exact 4dp product grid, share ratio rounded 6."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("month")
        )
        .agg(
            F.round(F.sum(promo), 4).alias("promo_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
            (F.round(F.sum(promo) / F.sum(rev), 6) + F.lit(0.0)).alias(
                "promo_share"
            ),
        )
    )

@query(
    "min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice) AS price
  FROM lineitem GROUP BY 1, 2
),
eligible AS (
  SELECT partkey, price, s_name, s_acctbal, n_name
  FROM cost
  JOIN supplier ON suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, n_name,
       price AS best_price, s_acctbal
FROM part
JOIN eligible ON partkey = p_partkey
WHERE p_size <= 15
  AND price = (SELECT MIN(e2.price) FROM eligible e2
               WHERE e2.partkey = p_partkey)
""",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated min over a dimension join): for each
    small part, the EUROPE supplier(s) whose minimum observed sale
    price equals the part's region-wide minimum. The fixture has no
    partsupp table, so supply cost derives from lineitem (min
    extendedprice per part+supplier) — same correlated-subquery
    structure as Q2 (/root/reference has no TPC-H; shape chosen for
    optimizer coverage: the oracle keeps the correlated form, the
    Spark side is the decorrelated plan Catalyst would produce —
    aggregate-then-self-join, dims broadcast)."""
    l = _t(spark, sf_dir, "lineitem")
    cost = l.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(F.min("l_extendedprice").alias("price"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        cost.join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("partkey", "price", "s_name", "s_acctbal", "n_name")
    )
    # correlated min as a whole-partition window (one shuffle on partkey)
    # instead of aggregate + self-join (shuffle for the agg + shuffle to
    # realign the join): the canonical Q2 decorrelation
    best = F.min("price").over(Window.partitionBy("partkey"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        eligible.withColumn("_best", best)
        .filter(F.col("price") == F.col("_best"))
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("price").alias("best_price"), "s_acctbal",
        )
    )

@query(
    "qualified_part_suppliers",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 30
)
AND s_nationkey IN (
  SELECT n_nationkey FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
""",
)
def qualified_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested semi-joins): ASIA suppliers that moved
    more than 30 units of any red part. Three nested IN-subqueries in
    the oracle; the Spark side is the semi-join chain the optimizer
    should reach — part filter semi-joined into the lineitem aggregate,
    the qualifying (supp) keys semi-joined into supplier, the nation
    region filter as a second semi-join. No fact data ever leaves the
    aggregate: both semi-joins carry keys only."""
    part_keys = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    qual_supp = (
        l.join(
            F.broadcast(part_keys),
            l.l_partkey == part_keys.p_partkey,
            "leftsemi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 30)
        .select("l_suppkey")
    )
    asia_nations = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "leftsemi",
        )
        .select("n_nationkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(qual_supp, s.s_suppkey == qual_supp.l_suppkey, "leftsemi")
        .join(
            F.broadcast(asia_nations),
            s.s_nationkey == asia_nations.n_nationkey,
            "leftsemi",
        )
        .select("s_suppkey", "s_name")
    )

@query(
    "small_quantity_revenue",
    """
SELECT ROUND(SUM(l.l_extendedprice), 2) AS small_qty_revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part ON p_partkey = l.l_partkey
WHERE p_brand = 'Brand#1'
  AND l.l_quantity < 0.5 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated AVG scalar subquery against the same
    fact): revenue from below-half-average-quantity lineitems of one
    brand. The oracle keeps the correlated form; the Spark side is the
    decorrelated plan — brand partkeys semi-reduce the fact scan
    (broadcast), the per-part average comes from an unbounded window
    over the SAME shuffle that the filter then consumes (no second
    scan, no realign join). Revenue stays on the 2dp price grid."""
    brand_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(brand_parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "leftsemi",
    )
    w = Window.partitionBy("l_partkey")
    return (
        l.withColumn("_avg_q", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_q"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

@query(
    "rich_customers_no_urgent_orders",
    """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
""",
)
def rich_customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global scalar-aggregate subquery + anti-join):
    above-average-balance customers with no urgent orders. (The classic
    'no orders at all' predicate is empty on this fixture — every
    customer has orders — so the anti-join side is the filtered order
    subset.) The scalar average enters the plan as a broadcast
    single-row frame joined with a crossJoin-free filter; the NOT
    EXISTS is a left_anti on the filtered orders keys."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )

@query(
    "regional_nation_revenue",
    """
SELECT n_name,
       ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount), 4)), 4) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
)
def regional_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (multi-way cyclic join: the s_nationkey =
    c_nationkey edge closes a cycle through two different fact paths):
    revenue by nation for local-supplier lineitems in one region.

    Plan at scale: region->nation prunes 1/5 of nations broadcast-side;
    supplier joins broadcast (small dim); the only shuffles are the two
    fact-fact joins (orders-customer on custkey, lineitem-orders on
    orderkey), with the cyclic nationkey equality applied as a residual
    predicate on the second — exactly the join order a 1000-executor
    run wants (dims never shuffle, facts shuffle once each). Revenue on
    the 4dp grid (price 2dp x discount 2dp) as in pricing_summary."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("_rev"),
    )
    co = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    ls = l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        ls.join(
            co,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum("_rev"), 4).alias("revenue"))
    )

@query(
    "profit_by_nation_year",
    """
SELECT n_name, CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
       ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount), 4)), 4) AS amount,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (part-name LIKE filter + supplier-nation rollup
    by ship year): amount by supplier nation x year for 'red' parts.

    Plan at scale: the LIKE-filtered part keys broadcast as a semi-join
    that prunes the fact scan before any shuffle; supplier and nation
    are broadcast dims; the single shuffle is the final two-key
    aggregate. Year surfaces as BIGINT on both engines (Spark year()
    is INT, DuckDB's is BIGINT — cast pins the schema compare)."""
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "leftsemi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 4
            ).alias("amount"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

@query(
    "customer_order_distribution",
    """
SELECT order_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS order_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  GROUP BY 1
)
GROUP BY 1
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (outer join with a join-condition filter, then a
    histogram over the grouped counts): distribution of per-customer
    urgent-order counts, customers with none included at bucket 0.

    The priority predicate must live in the JOIN condition, not WHERE
    (WHERE would drop the no-match customers the query exists to
    count). COUNT(o_orderkey) counts non-null matches only, so the
    left-outer null rows become the zero bucket. Two shuffles (custkey,
    then count) — both on already-aggregated rows at scale."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(
        F.count(F.lit(1)).alias("n_customers")
    )

@query(
    "disjunctive_brand_revenue",
    """
SELECT ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount), 4)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 5 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 10 AND 40)
""",
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunction of conjunctive predicates spanning
    both join sides): revenue from three brand/size/quantity OR-arms.

    Catalyst keeps the p_partkey equality as the hash-join key and
    evaluates the cross-side disjunction as a post-join residual; the
    part side pre-filters to the union of the three brand/size arms
    (derivable from the disjunction — also pushed explicitly here so
    the broadcast build side shrinks even without constraint
    propagation). One broadcast join, one global agg, no shuffle of
    the fact."""
    arms_part = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(arms_part)
        .select("p_partkey", "p_brand", "p_size")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    full_arms = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(full_arms)
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

@query(
    "approx_revenue_quantiles",
    """
SELECT o_orderpriority AS priority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_exact,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders GROUP BY 1
""",
)
def approx_revenue_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate grouped quantiles via the KLL-style sketch behind
    percentile_approx — the 100 TB path (fixed-size mergeable summary
    vs exact percentile's per-group sort) — ORACLE-pinned on the
    sketch's PUBLISHED RANK-ERROR bound (r12 graduation, same pattern
    as approx_distinct_users): the sketch value is engine-specific,
    but at accuracy=10000 it must land between the exact percentiles
    at rank p ± 50/accuracy (a 50x margin on the guaranteed
    1/accuracy), so the query emits exact p50/p90 (hash-compared to
    DuckDB's quantile_cont) plus per-quantile band verdicts the
    oracle pins TRUE."""
    o = _t(spark, sf_dir, "orders")
    q = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
    )
    tol = 50.0 / 10000

    def band(i: int, p: float):
        lo = F.percentile("o_totalprice", max(0.0, p - tol))
        hi = F.percentile("o_totalprice", min(1.0, p + tol))
        a = F.element_at(q, i)
        return (a >= lo) & (a <= hi)

    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50_exact"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_exact"),
        band(1, 0.5).alias("p50_ok"),
        band(2, 0.9).alias("p90_ok"),
        band(3, 0.99).alias("p99_ok"),
    )

@query(
    "twa_value_by_user_type",
    """
WITH iv AS (
  SELECT user_id, event_type, value,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts))
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id, event_type,
       ROUND(SUM(value * dt_us) / SUM(dt_us), 4) + 0 AS twa_value,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM iv WHERE dt_us IS NOT NULL
GROUP BY 1, 2
""",
)
def twa_value_by_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED time-weighted average over many irregular series at once
    (the multi-series form of time_weighted_avg_price): per
    (user_id, event_type) stream, each observation is held until the
    next one and weighted by its exact microsecond duration —
    ∑ vᵢ·Δtᵢ / ∑ Δtᵢ under step interpolation. Generalizes the
    reference's business-day padding (utils/var_utils.py:6-9), which
    equal-weights by construction; real event streams aren't padded, so
    the integral mean is the unbiased estimator. One lead() window +
    one grouped agg = exactly one shuffle on the group key, same as a
    plain AVG; weights are BIGINT micros (unix_micros ↔ epoch_us) so
    the weighting itself is exact on both engines. A series' last
    observation has no successor and carries no weight (WHERE dt
    NOT NULL, both engines); single-observation series drop entirely."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    return (
        e.withColumn(
            "_dt_us",
            epoch_micros(F.lead("ts").over(w)) - epoch_micros(F.col("ts")),
        )
        .filter(F.col("_dt_us").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            (
                F.round(
                    F.sum(F.col("value") * F.col("_dt_us")) / F.sum("_dt_us"),
                    4,
                )
                + F.lit(0.0)
            ).alias("twa_value"),
            F.sum("_dt_us").alias("span_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )

@query(
    "late_shipment_priority_counts",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
""",
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS over the fact, grouped count
    by priority), adapted to the fixture's columns: the classic
    l_commitdate < l_receiptdate lateness predicate becomes
    l_shipdate > o_orderdate + 90 days (the fixture carries no
    commit/receipt dates). EXISTS lowers to a LEFT SEMI join on the
    order key with the lateness inequality as a residual — one shuffle
    per side on l_orderkey, count after the semi join dedups, so no
    DISTINCT pass is ever needed. The quarter filter is pushed to the
    orders scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )

@query(
    "forecast_revenue_change",
    """
SELECT ROUND(SUM(ROUND(l_extendedprice * l_discount, 4)), 4) AS lost_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (verbatim shape): the would-be revenue increase from
    eliminating small discounts — a pure scan + filter + global agg
    with NO join and NO shuffle beyond the final 1-row reduce. The
    whole predicate set (date range, discount band, quantity cap)
    pushes down to the parquet scan, so at 100 TB this reads only
    row groups whose min/max stats overlap the year — the canonical
    'filters belong in the scan' query. Discount products land on the
    4dp grid (2dp price x 2dp discount)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * F.col("l_discount"), 4)
                ),
                4,
            ).alias("lost_revenue")
        )
    )

@query(
    "nation_market_share",
    """
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         ROUND(l_extendedprice * (1 - l_discount), 4) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey  = l_orderkey
  JOIN customer ON c_custkey   = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey   = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  JOIN part     ON p_partkey   = l_partkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
)
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
             / SUM(volume), 6) + 0 AS mkt_share
FROM vol
GROUP BY 1
""",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share: conditional share of a two-level
    dimension closure): NATION_7 suppliers' share of STANDARD-part
    revenue sold to AMERICA customers, per order year. The widest dim
    closure in the suite — part, supplier, both nation roles, and
    region ALL broadcast (each ≪ the facts); lineitem shuffles once on
    l_orderkey to meet orders(+customer), and the conditional share is
    one CASE inside the year agg, not a second join pass. Share is a
    unitless ratio -> 6dp round (+0 kills -0.0)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("_cnat"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_cnat"))
        .select("c_custkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snat"), F.col("n_name").alias("supp_nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_snat"))
        .select("s_suppkey", "supp_nation")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "volume"
        ),
    )
    vol = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
            F.lit(0.0)
        )
    ) / F.sum("volume")
    return vol.groupBy("o_year").agg(
        (F.round(share, 6) + F.lit(0.0)).alias("mkt_share")
    )

@query(
    "late_shipment_priority_mix",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def late_shipment_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (dual conditional counts over an order-lineitem
    join), adapted: l_shipmode doesn't exist in the fixture, so the
    'slow ship modes' slice becomes shipments 60+ days after order
    placement within one ship year. Both CASE branches resolve in ONE
    grouped agg over ONE equi-join on l_orderkey (lateness inequality
    as residual) — never two passes; the ship-year range pushes to the
    lineitem scan."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )

@query(
    "top_revenue_supplier",
    """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount), 4)), 4)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier over a quarterly revenue view): the
    uncorrelated scalar-MAX subquery decorrelates to a 1-row global
    aggregate of the ALREADY-REDUCED per-supplier frame, broadcast
    back as a cross join — no second scan of lineitem, no
    whole-table window (a partition-less window would funnel every
    supplier through ONE task at scale; the broadcast scalar keeps the
    comparison embarrassingly parallel). Ties return every tied
    supplier, both engines. Revenue on the 4dp money grid."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                )
            ),
            4,
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )

@query(
    "significant_parts_revenue",
    """
WITH per_part AS (
  SELECT l_partkey,
         SUM(ROUND(l_extendedprice * (1 - l_discount), 4)) AS part_rev
  FROM lineitem
  GROUP BY 1
)
SELECT l_partkey, ROUND(part_rev, 4) AS part_revenue
FROM per_part
WHERE part_rev > (SELECT AVG(part_rev) * 1.2 FROM per_part)
""",
)
def significant_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (grouped aggregate HAVING-compared against a
    scalar derived from the GLOBAL aggregate), adapted twice: the
    fixture has no partsupp, so 'significant stock value per part'
    becomes significant revenue per part; and Q11's fixed global
    fraction (0.0001/SF in the spec — it scales the constant by SF for
    exactly this reason) becomes 1.2x the MEAN per-part revenue, which
    self-scales at any SF instead of degenerating to all-rows at small
    SF and zero rows at large. The threshold is a second aggregation of
    the SAME grouped frame — no second lineitem scan — broadcast as a
    1-row cross join; the HAVING is then a parallel filter. The
    unrounded per-part sum feeds the comparison on both engines (round
    only at output) so threshold boundaries agree."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "_rev"
        ),
    )
    per_part = l.groupBy("l_partkey").agg(F.sum("_rev").alias("_part_rev"))
    thresh = per_part.agg(
        (F.avg("_part_rev") * F.lit(1.2)).alias("_cut")
    )
    return (
        per_part.join(F.broadcast(thresh), F.col("_part_rev") > F.col("_cut"))
        .select(
            "l_partkey", F.round("_part_rev", 4).alias("part_revenue")
        )
    )

@query(
    "supplier_count_by_part_attrs",
    """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
""",
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (COUNT(DISTINCT supplier) by part attributes
    with a NOT-IN supplier exclusion), adapted: no partsupp table, so
    the part-supplier relation comes from lineitem, and the excluded
    set is suppliers in deficit (no comment column to LIKE over). The
    NOT IN lowers to a broadcast LEFT ANTI join (the exclusion list is
    a filtered dim — tiny), part attrs attach by broadcast, and the
    distinct count shuffles once on the group key with partial
    distinct aggregation map-side. s_suppkey is non-null here so
    NOT IN == anti join without a null trap on either engine."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 2, 3, 4, 5)).select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("_bad_sk")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("_bad_sk"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )

@query(
    "first_event_per_hour",
    """
SELECT user_id, event_type,
       CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
       first_event_id,
       CAST(n_events AS BIGINT) AS n_events
FROM (
  SELECT user_id, event_type, ts, n_events,
         event_id AS first_event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM (SELECT *, COUNT(*) OVER (
          PARTITION BY user_id, event_type, date_trunc('hour', ts)
        ) AS n_events FROM events)
)
WHERE rn = 1
""",
)
def first_event_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event dedup: collapse each (user, type, hour) bucket to
    its FIRST event plus the bucket's event count — the at-least-once
    log compaction every event pipeline runs before feature extraction.
    Spark side is a single groupBy-agg (NOT the oracle's double
    window): min(struct(ts, event_id)) carries the first event through
    map-side partial aggregation, so the hot path is one shuffle with
    pre-reduced partitions — the formulation that survives 100 TB where
    a row_number window over the raw events would sort them all."""
    e = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        e.groupBy("user_id", "event_type", hour.alias("_hour"))
        .agg(
            F.min(F.struct("ts", "event_id")).alias("_first"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "event_type",
            epoch_seconds(F.col("_hour")).alias("hour_s"),
            F.col("_first.event_id").alias("first_event_id"),
            "n_events",
        )
    )

@query(
    "user_interarrival_stats",
    """
WITH gaps AS (
  SELECT user_id,
         FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
  FROM events
)
SELECT user_id,
       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
       ROUND(AVG(gap_s), 4) + 0 AS avg_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM gaps GROUP BY 1
""",
)
def user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap statistics (burstiness features for
    behavioral models), pinning the tz-free ``epoch_seconds`` helper at
    the official gate against DuckDB's naive-as-UTC ``epoch()`` — the
    exact surface the TIMESTAMP_NTZ fixture change broke in r05. One
    lag window + one grouped agg on the window's own partition key:
    a single shuffle end-to-end."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    return (
        e.select("user_id", gap.alias("gap_s"))
        .groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            (F.round(F.avg("gap_s"), 4) + F.lit(0.0)).alias("avg_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
    )

@query(
    "source_mix_report",
    """
WITH per_doc AS (
  SELECT source, lang,
         LEN(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_toks
  FROM documents
),
tot AS (SELECT SUM(n_toks) AS all_toks FROM per_doc)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       ROUND(SUM(n_toks) * 1.0 / (SELECT all_toks FROM tot), 6) + 0 AS token_share
FROM per_doc
GROUP BY 1, 2
""",
)
def source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report — the (source, language) mixing table
    a data-curation loop reads before setting sampling weights: doc and
    token counts per cell plus each cell's share of ALL tokens. The
    global total is a 1-row aggregate of the already-reduced per-cell
    frame joined back by broadcast (no second scan of the corpus, no
    partition-less window)."""
    from value_at_risk_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents").select(
        "source", "lang", F.size(tokens("text")).alias("n_toks")
    )
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    total = cells.groupBy().agg(F.sum("n_tokens").alias("all_toks"))
    return cells.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (
            F.round(F.col("n_tokens") / F.col("all_toks"), 6) + F.lit(0.0)
        ).alias("token_share"),
    )

@query(
    "remove_duplicated_spans",
    """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, i, array_to_string(ts[i:i+7], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(ts) - 6, 1))) AS t(i)
),
gdup AS (
  SELECT g, MIN({'d': doc_id, 'i': i}) AS can
  FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
removable AS (
  SELECT gr.doc_id, gr.i
  FROM grams gr JOIN gdup USING (g)
  WHERE NOT (gr.doc_id = can.d AND gr.i = can.i)
),
covered AS (
  SELECT DISTINCT doc_id, i + off AS pos
  FROM removable, UNNEST(range(0, 8)) AS t(off)
),
tokpos AS (
  SELECT doc_id, pos, ts[pos] AS tok
  FROM toks, UNNEST(range(1, len(ts) + 1)) AS t(pos)
),
kept AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tokpos tp LEFT JOIN covered c
    ON tp.doc_id = c.doc_id AND tp.pos = c.pos
  WHERE c.doc_id IS NULL
),
cleaned AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_after,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.ts) AS BIGINT) AS n_before,
       COALESCE(c.n_after, 0) AS n_after,
       COALESCE(c.cleaned_text, '') AS cleaned_text
FROM toks t LEFT JOIN cleaned c ON t.doc_id = c.doc_id
""",
)
def remove_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate REMOVAL — the actionable half of
    Lee et al. (ACL 2022) exact-substring dedup: every 8-token span
    occurring in 2+ distinct documents keeps exactly ONE canonical
    occurrence (lexicographic min (doc_id, position) — deterministic
    under any partitioning) and every other occurrence's token range
    is cut from its document, producing cleaned text plus before/after
    token counts. Plan shape: span table reduces by gram (map-side
    partial min/count), duplicated grams join back (the join carries
    only grams that ARE duplicated — at a realistic 1-5 % duplication
    rate the rejoin stream is a fraction of the corpus), covered
    positions explode from span starts (bounded ×8), and the final
    anti-join + ordered re-agg rebuilds text. At 100 TB the gram key
    becomes xxhash64 and cleaned text writes straight back through the
    Registry; the canonical-occurrence rule is what makes the rewrite
    idempotent (re-running removes nothing new — pytest-pinned).
    Implementation: operators/dedup.remove_duplicate_spans, gated in
    its 100 TB form — gram shuffles keyed on xxhash64 longs instead of
    span strings (measured 3.85 s → 2.97 s at sf0.1; output identical,
    pytest-pinned, and the oracle hash-match proves it per-value)."""
    from value_at_risk_spark.operators.dedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, span_tokens=8, hash_gram_keys=True)

@query(
    "fuzzy_name_matches",
    """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM (SELECT c_name FROM customer WHERE c_custkey % 10 = 0) a,
     (SELECT c_name FROM customer) b
WHERE a.c_name <> b.c_name AND levenshtein(a.c_name, b.c_name) = 1
""",
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching at distance 1 (operators/fuzzy.py,
    SymSpell symmetric-delete blocking): every probe customer name
    (custkey % 10 = 0) against the full name table. The DuckDB twin is
    the BRUTE-FORCE O(N·M) Levenshtein cross join, so hash equality
    proves the deletion-key blocking loses nothing — while the engine
    plan is an equi-join on neighborhood keys with the exact predicate
    only on collisions (candidate volume ≈ true matches + same-key
    noise, not N·M). At 100 TB the key join is the only shuffle and
    the probe side broadcasts when small."""
    from value_at_risk_spark.operators.fuzzy import fuzzy_join_dist1

    c = _t(spark, sf_dir, "customer")
    probes = c.filter(F.col("c_custkey") % 10 == 0)
    return fuzzy_join_dist1(probes, c, "c_name")

@query(
    "temperature_mix_weights",
    """
WITH cells AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(lower(text),' '),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_tokens) AS all_toks, SUM(n_docs) AS all_docs FROM cells),
raised AS (
  SELECT cells.*, tot.all_docs,
         POWER(n_tokens * 1.0 / tot.all_toks, 0.5) AS q_un
  FROM cells, tot
),
z AS (SELECT SUM(q_un) AS z FROM raised)
SELECT source, n_docs, n_tokens,
       ROUND(q_un / (SELECT z FROM z), 6) + 0 AS mix_weight,
       ROUND(q_un / (SELECT z FROM z) * all_docs, 4) + 0 AS expected_docs
FROM raised
""",
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus re-mixing (alpha = 0.5, the multilingual
    sampling rule of mBERT/XLM-R, Conneau et al. 2020): per-source token
    shares are raised to the alpha power and renormalized, flattening
    the source distribution so long-tail sources are upsampled. All
    reductions after the one per-source scan are 1-row or |sources|-row
    aggregates joined back by broadcast — the corpus is read once, and
    nothing wider than the source list ever shuffles."""
    from value_at_risk_spark.functions.text import tokens

    alpha = 0.5
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.select("source", F.size(tokens("text")).alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    tot = cells.groupBy().agg(
        F.sum("n_tokens").alias("all_toks"), F.sum("n_docs").alias("all_docs")
    )
    raised = cells.crossJoin(F.broadcast(tot)).withColumn(
        "q_un", F.pow(F.col("n_tokens") * 1.0 / F.col("all_toks"), alpha)
    )
    z = raised.groupBy().agg(F.sum("q_un").alias("z"))
    return raised.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.round(F.col("q_un") / F.col("z"), 6) + F.lit(0.0)).alias(
            "mix_weight"
        ),
        (
            F.round(F.col("q_un") / F.col("z") * F.col("all_docs"), 4)
            + F.lit(0.0)
        ).alias("expected_docs"),
    )

@query(
    "audio_frame_features_demo",
    """
WITH m AS (
  SELECT doc_id AS media_id, 200.0 + (doc_id % 20) * 40.0 AS freq
  FROM documents WHERE doc_id < 40
),
s AS (
  SELECT media_id, i // 200 AS frame_idx, i,
         ROUND(32767 * 0.8 * SIN(2 * PI() * freq * (i / 8000.0) + 0.5))
           / 32768.0 AS x
  FROM m, UNNEST(range(0, 1600)) AS t(i)
),
lagged AS (
  SELECT *, LAG(x) OVER (PARTITION BY media_id, frame_idx ORDER BY i) AS lx
  FROM s
),
fr AS (
  SELECT media_id, frame_idx,
         ROUND(SQRT(AVG(x * x)), 6) AS rms,
         ROUND(SUM(CASE WHEN (x < 0) <> (lx < 0) THEN 1 ELSE 0 END)
               * 1.0 / 199, 6) AS zcr
  FROM lagged GROUP BY 1, 2
)
SELECT media_id,
       COUNT(*) AS n_frames,
       ROUND(AVG(rms), 4) AS mean_rms,
       ROUND(AVG(zcr), 4) AS mean_zcr
FROM fr GROUP BY media_id
""",
)
def audio_frame_features_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction at the gate, GRADUATED to a
    trig-replay oracle (r13): deterministic per-doc sine WAVs
    (frequency keyed on doc_id, phase 0.5 rad) are REALLY encoded to
    16-bit PCM RIFF bytes and REALLY decoded back by the stdlib WAV
    walk, then framed into RMS / zero-crossing rows — the VAD-style
    pass a speech pipeline runs before any model. DuckDB replays the
    IDENTICAL synthesis arithmetic (same double-op order, ROUND ->
    /32768 quantization, 200-sample frames, lag-based sign-flip ZCR),
    so hash equality pins the WAV encode -> RIFF-walk decode -> frame
    feature chain end to end. The 0.5 rad phase keeps every quantized
    sample far from 0 and from .5 rounding boundaries — without it,
    samples at exact sine zeros land on +/-0.0 where numpy's signbit
    and SQL's ``x < 0`` disagree. Only (id, payload) crosses the
    Arrow boundary; per-media aggregation keeps the gate output
    bounded."""
    import struct as _struct
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from value_at_risk_spark.operators.multimodal import (
        audio_frame_features,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 40
    )

    def _synth(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        rate = 8000
        t = _np.arange(rate // 5) / rate  # 0.2 s
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                freq = 200.0 + float(did % 20) * 40.0
                mono = _np.round(
                    32767 * 0.8 * _np.sin(2 * _np.pi * freq * t + 0.5)
                ).astype("<i2")
                data = mono.reshape(-1, 1).tobytes()
                payloads.append(
                    b"RIFF"
                    + _struct.pack("<I", 36 + len(data))
                    + b"WAVEfmt "
                    + _struct.pack(
                        "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
                    )
                    + b"data"
                    + _struct.pack("<I", len(data))
                    + data
                )
            yield _pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload_bytes": payloads}
            )

    media = d.mapInPandas(
        _synth, schema="media_id long, payload_bytes binary"
    )
    feats = audio_frame_features(media, frame_ms=25)
    return feats.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        (F.round(F.avg("rms"), 4) + F.lit(0.0)).alias("mean_rms"),
        (F.round(F.avg("zcr"), 4) + F.lit(0.0)).alias("mean_zcr"),
    )

@query(
    "ohlc_event_bars",
    """
WITH ranked AS (
  SELECT event_type AS etype, CAST(ts AS DATE) AS d, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT etype, d,
       ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) + 0 AS open,
       ROUND(MAX(value), 6) + 0 AS high,
       ROUND(MIN(value), 6) + 0 AS low,
       ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) + 0 AS close,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       ROUND(SUM(value), 4) + 0 AS volume
FROM ranked GROUP BY etype, d
""",
)
def ohlc_event_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle bars per (event_type, day) — the canonical tick →
    bar downsample every market-data store performs (reference market
    frame: 01_var_market_etl.py:37-47). Open/close are picked with a
    single min/max over a (ts, event_id, value) struct — lexicographic
    struct ordering makes "value at earliest/latest tick" an ordinary
    partial-aggregable min/max, so the whole bar is ONE map-side-
    combining hash aggregate: no window, no self-join, one shuffle
    carrying one row per (type, day). The oracle needs two ROW_NUMBER
    windows to express the same thing — the struct-argmin form is the
    one that scales. event_id breaks ts ties deterministically."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("etype"),
        F.col("ts").cast("date").alias("d"),
        "ts",
        "event_id",
        "value",
    )
    return (
        base.groupBy("etype", "d")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("_o"),
            F.max(F.struct("ts", "event_id", "value")).alias("_c"),
            (F.round(F.max("value"), 6) + F.lit(0.0)).alias("high"),
            (F.round(F.min("value"), 6) + F.lit(0.0)).alias("low"),
            F.count(F.lit(1)).alias("n_ticks"),
            (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("volume"),
        )
        .select(
            "etype",
            "d",
            (F.round(F.col("_o.value"), 6) + F.lit(0.0)).alias("open"),
            "high",
            "low",
            (F.round(F.col("_c.value"), 6) + F.lit(0.0)).alias("close"),
            "n_ticks",
            "volume",
        )
    )

@query(
    "acf_ljung_box",
    "WITH "
    + SQL_RETS
    + """,
m AS (SELECT series, AVG(ret) AS mu FROM rets GROUP BY 1),
x AS (
  SELECT r.series, r.d, r.ret - m.mu AS x
  FROM rets r JOIN m USING (series)
),
l AS (
  SELECT series, x,
         LAG(x, 1) OVER (PARTITION BY series ORDER BY d) AS x1,
         LAG(x, 2) OVER (PARTITION BY series ORDER BY d) AS x2,
         LAG(x, 3) OVER (PARTITION BY series ORDER BY d) AS x3
  FROM x
)
SELECT series,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(SUM(x * x1) / SUM(x * x), 6) + 0 AS acf1,
       ROUND(SUM(x * x2) / SUM(x * x), 6) + 0 AS acf2,
       ROUND(SUM(x * x3) / SUM(x * x), 6) + 0 AS acf3,
       ROUND(COUNT(*) * (COUNT(*) + 2.0) * (
           POWER(SUM(x * x1) / SUM(x * x), 2) / (COUNT(*) - 1)
         + POWER(SUM(x * x2) / SUM(x * x), 2) / (COUNT(*) - 2)
         + POWER(SUM(x * x3) / SUM(x * x), 2) / (COUNT(*) - 3)
       ), 4) + 0 AS ljung_box_q
FROM l GROUP BY series
""",
)
def acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3) + Ljung-Box portmanteau
    statistic per return series — the serial-correlation diagnostic
    behind the i.i.d. assumption every parametric VaR quietly makes
    (and the formal cousin of christoffersen_independence_test).
    rho_k = sum(x_t x_{t-k}) / sum(x_t^2) on the demeaned series; the
    mean is a per-series 1-row aggregate broadcast back (no second
    window), the three lags come from ONE partitioned window pass,
    and everything reduces in a single grouped aggregate — Q =
    n(n+2) * sum(rho_k^2/(n-k)). SUM skips the NULL warm-up lag rows
    on both engines, giving the textbook truncated numerator."""
    rets = daily_returns(spark, sf_dir)
    mu = rets.groupBy("series").agg(F.avg("ret").alias("mu"))
    x = rets.join(F.broadcast(mu), "series").select(
        "series", "d", (F.col("ret") - F.col("mu")).alias("x")
    )
    w = Window.partitionBy("series").orderBy("d")
    lagged = x.select(
        "series",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    agg = lagged.groupBy("series").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("x1")).alias("s1"),
        F.sum(F.col("x") * F.col("x2")).alias("s2"),
        F.sum(F.col("x") * F.col("x3")).alias("s3"),
    )
    n = F.col("n_obs").cast("double")
    rho = [F.col(f"s{k}") / F.col("sxx") for k in (1, 2, 3)]
    q = (
        n
        * (n + F.lit(2.0))
        * (
            F.pow(rho[0], 2) / (n - F.lit(1.0))
            + F.pow(rho[1], 2) / (n - F.lit(2.0))
            + F.pow(rho[2], 2) / (n - F.lit(3.0))
        )
    )
    return agg.select(
        "series",
        "n_obs",
        (F.round(rho[0], 6) + F.lit(0.0)).alias("acf1"),
        (F.round(rho[1], 6) + F.lit(0.0)).alias("acf2"),
        (F.round(rho[2], 6) + F.lit(0.0)).alias("acf3"),
        (F.round(q, 4) + F.lit(0.0)).alias("ljung_box_q"),
    )

@query(
    "theil_sen_trend",
    "WITH "
    + SQL_DAILY
    + """,
pts AS (
  SELECT series, DATEDIFF('day', DATE '1990-01-01', d) AS dn, price
  FROM daily
),
pairs AS (
  SELECT a.series,
         (b.price - a.price) / (b.dn - a.dn) AS slope
  FROM pts a JOIN pts b
    ON a.series = b.series AND a.dn < b.dn AND b.dn - a.dn <= 180
)
SELECT series,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN(slope), 6) + 0 AS theil_sen_slope
FROM pairs GROUP BY series
""",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per price series: the median of all
    pairwise slopes — a 29%-breakdown-point alternative to the OLS
    fit in ols_fit_per_flag, immune to the price spikes that wreck a
    least-squares drift estimate. The pair generation is a same-key
    self-equi-join with a d1<d2, gap<=180d residual (never a
    cartesian across series) — the windowed Theil-Sen form: bounding
    the pair gap makes the per-series pair count O(days * 180)
    instead of O(days^2) while keeping the 29% breakdown point for
    trend-local contamination, and the date spine is calendar-
    bounded anyway, so 100 TB of ticks still reduces to the same
    (series, day) frame before pairing. For unbounded history the
    published randomized variant (median over a uniform pair sample)
    drops in by sampling one side's offsets; exact median via the
    same interpolating percentile both engines define."""
    from value_at_risk_spark.model import theil_sen_per_group

    daily = daily_prices(spark, sf_dir)
    pts = daily.select("series", _daynum("d").alias("dn"), "price")
    fit = theil_sen_per_group(pts, "series", "dn", "price", max_gap=180)
    return fit.select(
        "series",
        "n_pairs",
        (F.round("slope", 6) + F.lit(0.0)).alias("theil_sen_slope"),
    )

@query(
    "join_skew_diagnostic",
    """
WITH k AS (
  SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS n
  FROM lineitem GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS total_rows,
       CAST(SUM(n * n) AS BIGINT) AS selfjoin_rows,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       ROUND(quantile_cont(n, 0.99), 4) + 0 AS p99_key_rows,
       ROUND(MAX(n) / AVG(n), 4) + 0 AS skew_ratio
FROM k
""",
)
def join_skew_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnostic on the l_partkey join key: per-key
    multiplicities in one map-side-combining count, then key count /
    exact self-join output cardinality (sum n^2) / max / exact p99 /
    skew ratio in one 1-row reduction — the report that tells you
    BEFORE a 100 TB shuffle whether to broadcast, salt
    (operators/skew.py), or let AQE split the hot key, and what the
    join's output size will be. The same sum-of-products with a
    second table's counts estimates any equi-join's cardinality; the
    interpolating percentile is the exact one both engines define."""
    li = _t(spark, sf_dir, "lineitem")
    k = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    return k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("selfjoin_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        (F.round(F.percentile(F.col("n"), F.lit(0.99)), 4) + F.lit(0.0)).alias(
            "p99_key_rows"
        ),
        (F.round(F.max("n") / F.avg("n"), 4) + F.lit(0.0)).alias(
            "skew_ratio"
        ),
    )

@query(
    "streaming_cdc_apply",
    """
WITH chg AS (
  SELECT c_custkey AS k, 1 AS seq, 'I' AS op, c_name AS name,
         ROUND(c_acctbal, 2) AS bal
  FROM customer
  UNION ALL
  SELECT c_custkey, 2, 'U', c_name, ROUND(c_acctbal + 100, 2)
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, 3, 'D', c_name, 0.0
  FROM customer WHERE c_custkey % 7 = 0
),
latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
  FROM chg
)
SELECT k, name, ROUND(bal, 2) + 0 AS bal
FROM latest WHERE rn = 1 AND op <> 'D'
""",
)
def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply, HASH-CHECKED against the oracle's batch
    fold: a deterministic insert/update/delete change feed derived
    from the customer table (seq 1 inserts everyone, seq 2 re-prices
    every 3rd key, seq 3 deletes every 7th) streams through
    ``CdcTableSink`` (streaming/cdc.py) — file source forced into
    MULTIPLE micro-batches (maxFilesPerTrigger=1 over a repartitioned
    feed), each batch folded max-seq-per-key into a new versioned
    table with tombstones kept as state. The final live view equals
    the oracle's ROW_NUMBER-over-seq batch application REGARDLESS of
    how the files landed in batches — that invariance (plus out-of-
    order and redelivery safety) is what distinguishes a CDC apply
    from a naive last-write-wins append, and is separately pytest-
    pinned. The only rows-independent cost is the per-fold state
    rewrite — partition-overwrite on a key prefix at 100 TB."""
    import atexit
    import os
    import shutil
    import tempfile

    from value_at_risk_spark.streaming.cdc import CdcTableSink

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey").alias("k")
    ins = cust.select(
        k,
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    upd = cust.filter(F.col("c_custkey") % 3 == 0).select(
        k,
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") + 100, 2).alias("bal"),
    )
    dele = cust.filter(F.col("c_custkey") % 7 == 0).select(
        k,
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.col("c_name").alias("name"),
        F.lit(0.0).alias("bal"),
    )
    changes = ins.unionByName(upd).unionByName(dele)

    src = tempfile.mkdtemp(prefix="cdc_feed_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    # the returned DataFrame reads the final table version LAZILY, so
    # the table dir must outlive this call. The scratch root is
    # SESSION-SCOPED (keyed by pid, one atexit entry); each invocation
    # writes a FRESH versioned subdir and only after the stream has
    # fully written it prunes versions older than the previous one.
    # Never reusing a path means an earlier invocation's returned frame
    # can never silently read overwritten data — it either still works
    # (frames up to one invocation old stay readable) or fails loudly
    # on a deleted dir. Disk held in a long-lived process is bounded
    # at two table copies.
    root = os.path.join(
        tempfile.gettempdir(), f"vars_cdc_apply_table_{os.getpid()}"
    )
    os.makedirs(root, exist_ok=True)
    version = getattr(streaming_cdc_apply, "_scratch_version", 0) + 1
    streaming_cdc_apply._scratch_version = version
    tbl = os.path.join(root, f"v{version}")
    # pid-keyed roots survive a SIGKILLed process (atexit never ran);
    # pid reuse would then resurrect a stale v1 whose committed-batch
    # dirs make CdcTableSink skip the replayed deliveries and silently
    # serve the dead process's data. The version dir this invocation is
    # about to write is never a PRIOR invocation's live path, so
    # clearing it keeps the two-copy retention contract while
    # restoring the stale-dir guard (ADVICE r9).
    shutil.rmtree(tbl, ignore_errors=True)
    if not getattr(streaming_cdc_apply, "_scratch_registered", False):
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        streaming_cdc_apply._scratch_registered = True
    try:
        changes.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(
                "k long, seq int, op string, name string, bal double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink = CdcTableSink(tbl, keys=["k"])
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("streaming_cdc_apply: replay exceeded 180s")
        sink.vacuum(keep_last=1)  # stream is done: keep only the tip
        # the new version is fully written: prune everything older than
        # the PREVIOUS version (kept so a frame returned by the last
        # invocation remains collectable after this one)
        for entry in os.listdir(root):
            if entry.startswith("v") and entry[1:].isdigit():
                if int(entry[1:]) < version - 1:
                    shutil.rmtree(
                        os.path.join(root, entry), ignore_errors=True
                    )
        return sink.read(spark).select(
            "k", "name", (F.round("bal", 2) + F.lit(0.0)).alias("bal")
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

@query(
    "source_overlap_matrix",
    """
WITH toks AS (
  SELECT source,
         list_filter(string_split(lower(text),' '), x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT source, array_to_string(ts[i:i+7], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(len(ts) - 6, 1))) AS t(i)
),
gc AS (
  SELECT g FROM grams GROUP BY g
  HAVING COUNT(*) BETWEEN 2 AND 20
),
kept AS (SELECT grams.source, grams.g FROM grams JOIN gc USING (g)),
sizes AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM kept a JOIN kept b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s1, s2, n_shared,
       ROUND(n_shared / (za.sz + zb.sz - n_shared), 6) + 0 AS jaccard
FROM inter
JOIN sizes za ON inter.s1 = za.source
JOIN sizes zb ON inter.s2 = zb.source
""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: 8-token-shingle Jaccard
    between every pair of corpus sources — the report that tells you
    which crawls/dumps overlap BEFORE you weight them in a training
    mix (companion to decontaminate_training_docs, which screens
    against benchmarks; this screens sources against each other).
    Never a pairwise source scan: the inverted (gram -> source) index
    is built once, ubiquitous grams (shared by >20 sources) are
    dropped BEFORE pairing — they carry no discrimination signal and
    are exactly the k^2 blow-up — so the gram-keyed self-join emits
    at most C(20,2) pairs per gram; intersections reduce per source
    pair and union sizes come from a per-source count broadcast back.
    Same candidate-generation discipline as the MinHash LSH family:
    the only pair enumeration happens inside a bounded bucket."""
    from value_at_risk_spark.functions.text import tokens

    n = 8
    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", tokens("text").alias("ts"))
    grams = toks.select(
        "source",
        F.explode(
            F.when(
                F.size("ts") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.array_join(F.slice("ts", i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g0"),
    ).select("source", F.xxhash64("g0").alias("g")).distinct()
    # Materialize the inverted index ONCE (r16, guide §2.4): grams
    # feeds gc, sizes, and BOTH sides of the pair self-join — lazily,
    # the tokenize + 8-gram explode + distinct subtree re-executes for
    # each reference (5 copies in the physical plan). The materialized
    # frame is (source, gram-hash) — 12 bytes/row, far smaller than
    # the corpus it derives from. localCheckpoint, never persist: no
    # cross-run plan-fragment cache.
    grams = grams.localCheckpoint(eager=True)
    gc = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("nsrc"))
        .filter((F.col("nsrc") >= 2) & (F.col("nsrc") <= 20))
        .select("g")
    )
    kept = grams.join(gc, "g")
    sizes = grams.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("sz")
    )
    a = kept.select("g", F.col("source").alias("s1"))
    b = kept.select("g", F.col("source").alias("s2"))
    inter = (
        a.join(b, "g")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sizes.select(F.col("source").alias("s1"), F.col("sz").alias("sza"))
    zb = sizes.select(F.col("source").alias("s2"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(za), "s1")
        .join(F.broadcast(zb), "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            (
                F.round(
                    F.col("n_shared")
                    / (F.col("sza") + F.col("szb") - F.col("n_shared")),
                    6,
                )
                + F.lit(0.0)
            ).alias("jaccard"),
        )
    )

@query(
    "feature_binning_woe",
    """
WITH b AS (
  SELECT quantile_cont(l_extendedprice,
         [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
  FROM lineitem
),
binned AS (
  SELECT CAST(LEN(list_filter(b.bs, x -> l_extendedprice > x)) AS BIGINT)
           AS bin,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
  FROM lineitem, b
),
agg AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(bad) AS BIGINT) AS n_bad,
         CAST(COUNT(*) - SUM(bad) AS BIGINT) AS n_good
  FROM binned GROUP BY 1
),
tot AS (
  SELECT bin, n, n_bad, n_good,
         SUM(n_bad) OVER () AS tb, SUM(n_good) OVER () AS tg
  FROM agg
)
SELECT bin, n, n_bad,
       ROUND(n_bad / CAST(n AS DOUBLE), 6) + 0 AS bad_rate,
       ROUND(LN((n_good / CAST(tg AS DOUBLE)) / (n_bad / CAST(tb AS DOUBLE))), 6) + 0
         AS woe,
       ROUND((n_good / CAST(tg AS DOUBLE) - n_bad / CAST(tb AS DOUBLE))
             * LN((n_good / CAST(tg AS DOUBLE)) / (n_bad / CAST(tb AS DOUBLE))), 6) + 0
         AS iv_term
FROM tot
""",
)
def feature_binning_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning + weight-of-evidence — the
    credit-scoring/feature-engineering transform (bin a numeric
    feature into deciles, score each bin's log-odds against a binary
    target, sum information value). Decile EDGES come from ONE exact-
    percentile aggregate broadcast back as a 9-element array; each
    row's bin is then a pure codegen expression (count of edges below
    the value) — no global ROW_NUMBER sort, which is the
    nondeterministic-under-ties and single-task-at-scale alternative.
    Value-based edges mean ties land in one bin (slightly uneven bins,
    deterministic on both engines). The WOE/IV arithmetic runs over
    the 10-row aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    edges = li.agg(
        F.percentile(
            "l_extendedprice",
            F.array(*[F.lit(x / 10.0) for x in range(1, 10)]),
        ).alias("bs")
    )
    binned = li.crossJoin(F.broadcast(edges)).select(
        F.size(
            F.filter(
                F.col("bs"), lambda x: F.col("l_extendedprice") > x
            )
        )
        .cast("long")
        .alias("bin"),
        F.when(F.col("l_returnflag") == "R", F.lit(1))
        .otherwise(F.lit(0))
        .alias("bad"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bad").alias("n_bad"),
        (F.count(F.lit(1)) - F.sum("bad")).alias("n_good"),
    )
    wall = Window.partitionBy(F.lit(1))
    tot = agg.select(
        "bin",
        "n",
        "n_bad",
        "n_good",
        F.sum("n_bad").over(wall).alias("tb"),
        F.sum("n_good").over(wall).alias("tg"),
    )
    dg = F.col("n_good") / F.col("tg").cast("double")
    db = F.col("n_bad") / F.col("tb").cast("double")
    woe = F.log(dg / db)
    return tot.select(
        "bin",
        "n",
        "n_bad",
        (F.round(F.col("n_bad") / F.col("n").cast("double"), 6) + F.lit(0.0)).alias(
            "bad_rate"
        ),
        (F.round(woe, 6) + F.lit(0.0)).alias("woe"),
        (F.round((dg - db) * woe, 6) + F.lit(0.0)).alias("iv_term"),
    )

@query(
    "model_prediction_intervals",
    """
WITH params AS (
  SELECT l_returnflag AS flag,
         REGR_SLOPE(l_extendedprice, l_quantity) AS slope,
         REGR_INTERCEPT(l_extendedprice, l_quantity) AS intercept
  FROM lineitem GROUP BY 1
),
resid AS (
  SELECT l.l_returnflag AS flag, p.slope, p.intercept,
         l.l_extendedprice - (p.intercept + p.slope * l.l_quantity) AS r
  FROM lineitem l JOIN params p ON l.l_returnflag = p.flag
)
SELECT flag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(slope), 6) + 0 AS slope,
       ROUND(MIN(intercept), 6) + 0 AS intercept,
       ROUND(quantile_cont(r, 0.05), 6) + 0 AS resid_q05,
       ROUND(quantile_cont(r, 0.95), 6) + 0 AS resid_q95
FROM resid GROUP BY flag
""",
)
def model_prediction_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical 90% prediction intervals for the per-flag linear
    price model — the conformal-style calibration step after a fit
    (reference fits per-ticker models, 02_var_model.py:137-154; this
    is the "how wrong is it" companion): slope/intercept per group
    via the closed-form REGR aggregates (one pass), residuals via a
    broadcast join of the 3-row parameter table, then exact residual
    percentiles per group in a second aggregate over the SAME
    grouping key — two co-keyed shuffles total, no model state
    outside the frame. Intervals are distribution-free: whatever the
    residual shape, [q05, q95] covers ~90% by construction."""
    li = _t(spark, sf_dir, "lineitem")
    params = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr("regr_slope(l_extendedprice, l_quantity)").alias("slope"),
        F.expr("regr_intercept(l_extendedprice, l_quantity)").alias(
            "intercept"
        ),
    )
    resid = li.join(
        F.broadcast(params), li.l_returnflag == params.flag
    ).select(
        "flag",
        "slope",
        "intercept",
        (
            F.col("l_extendedprice")
            - (F.col("intercept") + F.col("slope") * F.col("l_quantity"))
        ).alias("r"),
    )
    return resid.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.min("slope"), 6) + F.lit(0.0)).alias("slope"),
        (F.round(F.min("intercept"), 6) + F.lit(0.0)).alias("intercept"),
        (F.round(F.percentile("r", F.lit(0.05)), 6) + F.lit(0.0)).alias(
            "resid_q05"
        ),
        (F.round(F.percentile("r", F.lit(0.95)), 6) + F.lit(0.0)).alias(
            "resid_q95"
        ),
    )

@query(
    "cuped_experiment_analysis",
    """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         CAST(DATEDIFF('day', MIN(CAST(ts AS DATE)),
                        MAX(CAST(ts AS DATE))) + 1 AS DOUBLE) AS span
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS arm,
         SUM(CASE WHEN DATEDIFF('day', b.d0, CAST(ts AS DATE)) * 2 < b.span
                  THEN value ELSE 0 END) AS pre,
         SUM(CASE WHEN DATEDIFF('day', b.d0, CAST(ts AS DATE)) * 2 >= b.span
                  THEN value ELSE 0 END) AS post
  FROM events, bounds b
  GROUP BY 1, 2
),
pooled AS (
  SELECT COVAR_SAMP(post, pre) / VAR_SAMP(pre) AS theta,
         AVG(pre) AS mu_pre
  FROM per_user
),
adj AS (
  SELECT arm, post, post - p.theta * (pre - p.mu_pre) AS post_adj
  FROM per_user, pooled p
)
SELECT arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(post), 6) + 0 AS mean_post,
       ROUND(AVG(post_adj), 6) + 0 AS mean_post_adj,
       ROUND(VAR_SAMP(post), 4) + 0 AS var_post,
       ROUND(VAR_SAMP(post_adj), 4) + 0 AS var_post_adj,
       ROUND(1 - VAR_SAMP(post_adj) / VAR_SAMP(post), 6) + 0
         AS variance_reduction
FROM adj GROUP BY arm
""",
)
def cuped_experiment_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout (Deng et al.,
    WSDM 2013 — the standard trick in every large experimentation
    platform): per-user post-period value is adjusted by the pre-
    period covariate, post' = post - theta*(pre - mean(pre)) with
    theta = cov(post, pre)/var(pre), shrinking metric variance
    without biasing the treatment difference (theta and the split
    point are arm-blind). Here the period split is the time-range
    midpoint from a 1-row bounds broadcast and arms are user_id
    parity (a hash in production). Dataflow: ONE user-keyed
    aggregate builds the (pre, post) panel, theta/mean are a 1-row
    pooled aggregate broadcast back, per-arm stats close it out —
    three shuffles, each carrying one row per user or less, at any
    event volume."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("double")
        .alias("span"),
    )
    day = F.datediff(F.col("ts").cast("date"), F.col("d0"))
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", (F.col("user_id") % 2).cast("long").alias("arm"))
        .agg(
            F.sum(
                F.when(day * 2 < F.col("span"), F.col("value")).otherwise(
                    F.lit(0.0)
                )
            ).alias("pre"),
            F.sum(
                F.when(day * 2 >= F.col("span"), F.col("value")).otherwise(
                    F.lit(0.0)
                )
            ).alias("post"),
        )
    )
    pooled = per_user.agg(
        (F.covar_samp("post", "pre") / F.var_samp("pre")).alias("theta"),
        F.avg("pre").alias("mu_pre"),
    )
    adj = per_user.crossJoin(F.broadcast(pooled)).select(
        "arm",
        "post",
        (
            F.col("post")
            - F.col("theta") * (F.col("pre") - F.col("mu_pre"))
        ).alias("post_adj"),
    )
    return adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.round(F.avg("post"), 6) + F.lit(0.0)).alias("mean_post"),
        (F.round(F.avg("post_adj"), 6) + F.lit(0.0)).alias("mean_post_adj"),
        (F.round(F.var_samp("post"), 4) + F.lit(0.0)).alias("var_post"),
        (F.round(F.var_samp("post_adj"), 4) + F.lit(0.0)).alias(
            "var_post_adj"
        ),
        (
            F.round(
                F.lit(1.0) - F.var_samp("post_adj") / F.var_samp("post"), 6
            )
            + F.lit(0.0)
        ).alias("variance_reduction"),
    )

@query(
    "dp_noisy_release",
    """
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, n,
         (('0x' || substring(md5(event_type), 1, 8))::UBIGINT + 0.5)
           / 4294967296.0 AS u
  FROM counts
)
SELECT event_type,
       ROUND(n + (-2.0) * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5)), 4) + 0
         AS noisy_count,
       CAST(0.5 AS DOUBLE) AS epsilon_nominal
FROM noised
""",
)
def dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release (epsilon = 1/b = 0.5,
    sensitivity 1) — the aggregate-publication step of a privacy-
    conscious data pipeline: true per-type counts never leave the
    engine, only counts + Laplace(b=2) noise do. The noise uniform is
    md5-derived — the DETERMINISTIC-REPLAY form this engine uses for
    every sampled operator (retry-stable, oracle-checkable, and how
    you unit-test a DP release pipeline end-to-end); a production
    release swaps the hash for a sealed RNG draw, changing ONE
    expression and no dataflow. Because the hash noise is derived from
    the released key itself (publicly recomputable, hence strippable),
    the output column is named ``epsilon_nominal``: it records the
    mechanism's parameter, NOT a sealed privacy guarantee of this test
    form. Inverse-CDF transform (-b*sign(u-1/2)*ln(1-2|u-1/2|)) runs
    on the 5-row aggregate; the scan only counts."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(4294967296.0)
    noise = (
        F.lit(-2.0)
        * F.signum(u - 0.5)
        * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    )
    return counts.select(
        "event_type",
        (F.round(F.col("n") + noise, 4) + F.lit(0.0)).alias("noisy_count"),
        F.lit(0.5).alias("epsilon_nominal"),
    )

@query(
    "gini_revenue_concentration",
    """
WITH rev AS (
  SELECT o_custkey AS k, SUM(o_totalprice) AS x
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, k) AS i FROM rev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(x), 2) + 0 AS total_revenue,
       ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
             - (COUNT(*) + 1.0) / COUNT(*), 6) + 0 AS gini
FROM ranked
""",
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (the Lorenz
    -curve summary): G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    revenues ranked ascending — how unequal the book of business is.
    The raw order volume reduces to one row per customer FIRST; the
    global ascending rank is then ``operators/ranks.global_row_number``
    — the two-pass value-bucket + offset form, no single-partition
    window and no driver action anywhere (design rationale, tie
    semantics, and the deliberate avoidance of spark_partition_id
    bucketing live in that module's docstring; parity with the plain
    window form is pytest-pinned)."""
    from value_at_risk_spark.operators.ranks import global_row_number

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum("o_totalprice").alias("x")
    )
    ranked = global_row_number(rev, [("x", True), ("k", True)], out="i")
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        (F.round(F.sum("x"), 2) + F.lit(0.0)).alias("total_revenue"),
        (
            F.round(
                F.lit(2.0) * F.sum(F.col("i") * F.col("x")) / (n * F.sum("x"))
                - (n + F.lit(1.0)) / n,
                6,
            )
            + F.lit(0.0)
        ).alias("gini"),
    )

@query(
    "pareto_abc_parts",
    """
WITH rev AS (
  SELECT l_partkey AS k, SUM(l_extendedprice * (1 - l_discount)) AS x
  FROM lineitem GROUP BY 1
),
shares AS (
  SELECT k, x,
         SUM(x) OVER (ORDER BY x DESC, k ROWS UNBOUNDED PRECEDING)
           / SUM(x) OVER () AS cum_share
  FROM rev
),
classed AS (
  SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
              WHEN cum_share <= 0.95 THEN 'B'
              ELSE 'C' END AS abc, x
  FROM shares
)
SELECT abc,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(x), 2) + 0 AS revenue,
       ROUND(SUM(x) / SUM(SUM(x)) OVER (), 6) + 0 AS revenue_share
FROM classed GROUP BY abc
""",
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by discounted revenue:
    the top ~80% of cumulative revenue is class A, the next 15% B,
    the tail C — the inventory-prioritization cut every supply chain
    runs. One part-keyed reduction, then the descending cumulative
    share via ``operators/ranks.global_running_sum`` (two-pass
    value-bucket + offset — the part frame grows with a REAL dimension,
    so no single-partition window; the total joins as a 1-row
    broadcast, not a whole-frame window), and a 3-row rollup with a
    window-total share (bounded: one row per class)."""
    from value_at_risk_spark.operators.ranks import global_running_sum

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("x")
    )
    tot = rev.groupBy().agg(F.sum("x").alias("_tot"))
    shares = (
        global_running_sum(
            rev, "x", [("x", False), ("k", True)], out="_cum"
        )
        .crossJoin(F.broadcast(tot))
        .select("x", (F.col("_cum") / F.col("_tot")).alias("cum_share"))
    )
    classed = shares.select(
        F.when(F.col("cum_share") <= 0.8, F.lit("A"))
        .when(F.col("cum_share") <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc"),
        "x",
    )
    wtot = Window.partitionBy(F.lit(1))
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("x").alias("_rev"),
        )
        .select(
            "abc",
            "n_parts",
            (F.round("_rev", 2) + F.lit(0.0)).alias("revenue"),
            (
                F.round(F.col("_rev") / F.sum("_rev").over(wtot), 6)
                + F.lit(0.0)
            ).alias("revenue_share"),
        )
    )

@query(
    "survival_km_churn",
    """
WITH ends AS (SELECT MAX(CAST(ts AS DATE)) AS obs_end FROM events),
u AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS first_d,
         MAX(CAST(ts AS DATE)) AS last_d
  FROM events GROUP BY 1
),
span AS (
  SELECT CASE WHEN DATEDIFF('day', last_d, e.obs_end) > 7
              THEN DATEDIFF('day', first_d, last_d)
              ELSE DATEDIFF('day', first_d, e.obs_end) END AS t,
         CASE WHEN DATEDIFF('day', last_d, e.obs_end) > 7
              THEN 1 ELSE 0 END AS churned
  FROM u, ends e
),
risk AS (
  SELECT t, CAST(SUM(churned) AS DOUBLE) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM span GROUP BY t
),
km AS (
  SELECT t, d,
         SUM(leaving) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS n_risk
  FROM risk
)
SELECT CAST(t AS BIGINT) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d_churned,
       CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0
            ELSE ROUND(EXP(SUM(LN(1.0 - d / n_risk))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6) + 0
       END AS survival
FROM km
""",
)
def survival_km_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user churn: duration = days
    from first activity to churn (no events in the final 7 days of
    the observation window => churned at last activity) or to the
    censoring horizon. S(t) = prod_{t_i <= t} (1 - d_i/n_i), computed
    distributively as exp(cumsum(ln(1-d/n))) with the d_i = n_i
    terminal case forced to exactly 0 via a cumulative flag (no
    -inf/NaN leakage on either engine). The at-risk counts n_i come
    from a REVERSE cumulative sum — no per-time re-scan of the
    cohort. Events reduce to one row per user, then one row per
    distinct duration: everything after the first aggregate is
    cohort-sized. The right-censoring bookkeeping (the part naive
    'avg lifetime' dashboards get wrong) is the point of KM."""
    e = _t(spark, sf_dir, "events")
    ends = e.agg(F.max(F.col("ts").cast("date")).alias("obs_end"))
    u = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
    )
    gap = F.datediff(F.col("obs_end"), F.col("last_d"))
    span = u.crossJoin(F.broadcast(ends)).select(
        F.when(
            gap > 7, F.datediff(F.col("last_d"), F.col("first_d"))
        )
        .otherwise(F.datediff(F.col("obs_end"), F.col("first_d")))
        .alias("t"),
        F.when(gap > 7, F.lit(1)).otherwise(F.lit(0)).alias("churned"),
    )
    risk = span.groupBy("t").agg(
        F.sum("churned").cast("double").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    wrev = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = risk.select(
        "t", "d", F.sum("leaving").over(wrev).alias("n_risk")
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dead = F.max(
        F.when(F.col("d") >= F.col("n_risk"), F.lit(1)).otherwise(F.lit(0))
    ).over(wcum)
    surv = F.exp(
        F.sum(F.log(F.lit(1.0) - F.col("d") / F.col("n_risk"))).over(wcum)
    )
    return km.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_churned"),
        F.when(dead == 1, F.lit(0.0))
        .otherwise(F.round(surv, 6) + F.lit(0.0))
        .alias("survival"),
    )

@query(
    "market_basket_lift",
    """
WITH basket AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
nb AS (SELECT CAST(COUNT(DISTINCT o) AS DOUBLE) AS n FROM basket),
freq AS (
  SELECT p, CAST(COUNT(*) AS DOUBLE) AS f FROM basket GROUP BY 1
),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS together
  FROM basket a JOIN basket b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT p1, p2, together,
       ROUND(together / nb.n, 6) + 0 AS support,
       ROUND(together / fa.f, 6) + 0 AS confidence,
       ROUND(together * nb.n / (fa.f * fb.f), 6) + 0 AS lift
FROM pairs
JOIN freq fa ON pairs.p1 = fa.p
JOIN freq fb ON pairs.p2 = fb.p
CROSS JOIN nb
""",
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: support, confidence, and lift
    for part pairs co-purchased in the same order (the Apriori
    2-itemset pass every retail stack runs). The pair generation is
    an order-keyed self-join — pairs are enumerated WITHIN a basket
    only, so the blow-up is bounded by (lines per order choose 2),
    never corpus-cartesian (the same bounded-bucket discipline as the
    LSH and PMI joins; a hot mega-basket would be the skew-salting
    case). Item frequencies and the basket count broadcast back onto
    the surviving pairs; the min-support HAVING prunes before any
    ratio math."""
    li = _t(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    nb = basket.agg(
        F.count_distinct("o").cast("double").alias("n")
    )
    freq = basket.groupBy("p").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    a = basket.select("o", F.col("p").alias("p1"))
    b = basket.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 3)
    )
    fa = freq.select(F.col("p").alias("p1"), F.col("f").alias("fa"))
    fb = freq.select(F.col("p").alias("p2"), F.col("f").alias("fb"))
    return (
        pairs.join(F.broadcast(fa), "p1")
        .join(F.broadcast(fb), "p2")
        .crossJoin(F.broadcast(nb))
        .select(
            "p1",
            "p2",
            "together",
            (F.round(F.col("together") / F.col("n"), 6) + F.lit(0.0)).alias(
                "support"
            ),
            (F.round(F.col("together") / F.col("fa"), 6) + F.lit(0.0)).alias(
                "confidence"
            ),
            (
                F.round(
                    F.col("together") * F.col("n")
                    / (F.col("fa") * F.col("fb")),
                    6,
                )
                + F.lit(0.0)
            ).alias("lift"),
        )
    )

@query(
    "table_statistics_report",
    """
SELECT 'l_quantity' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv,
       ROUND(MIN(l_quantity), 4) + 0 AS min_v,
       ROUND(MAX(l_quantity), 4) + 0 AS max_v,
       ROUND(AVG(l_quantity), 4) + 0 AS mean_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(l_extendedprice) AS BIGINT),
       CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
       ROUND(MIN(l_extendedprice), 4) + 0, ROUND(MAX(l_extendedprice), 4) + 0,
       ROUND(AVG(l_extendedprice), 4) + 0
FROM lineitem
UNION ALL
SELECT 'l_discount',
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(l_discount) AS BIGINT),
       CAST(COUNT(DISTINCT l_discount) AS BIGINT),
       ROUND(MIN(l_discount), 4) + 0, ROUND(MAX(l_discount), 4) + 0,
       ROUND(AVG(l_discount), 4) + 0
FROM lineitem
""",
)
def table_statistics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (row count, null count, NDV,
    min/max/mean) for the optimizer-relevant lineitem measures — the
    stats that drive join reordering, broadcast decisions, and filter
    selectivity estimates (Spark: ANALYZE TABLE ... COMPUTE
    STATISTICS FOR COLUMNS; this is the engine-portable equivalent).
    All three columns' stats compute in ONE scan: the unpivot-style
    stack puts (col, value) pairs through a single grouped aggregate
    — the exact NDV shuffles one row per distinct value per column;
    swap in approx_count_distinct (HLL) at 100 TB where the oracle
    comparison no longer applies."""
    li = _t(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.expr(
            "stack(3, 'l_quantity', l_quantity, "
            "'l_extendedprice', l_extendedprice, "
            "'l_discount', l_discount) AS (col, v)"
        )
    )
    return stacked.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.count_distinct("v").alias("ndv"),
        (F.round(F.min("v"), 4) + F.lit(0.0)).alias("min_v"),
        (F.round(F.max("v"), 4) + F.lit(0.0)).alias("max_v"),
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean_v"),
    )

@query(
    "liquidity_measures",
    """
WITH daily AS (
  SELECT o_orderpriority AS series,
         CAST(o_orderdate AS DATE) AS d,
         ROUND(SUM(o_totalprice), 2) AS price,
         CAST(COUNT(*) AS DOUBLE) AS vol
  FROM orders GROUP BY 1, 2
),
chg AS (
  SELECT series, d, vol,
         price - LAG(price) OVER (PARTITION BY series ORDER BY d) AS dp,
         (ROUND(LN(price / COALESCE(
             LAG(price) OVER (PARTITION BY series ORDER BY d), price)), 6) + 0)
           AS ret
  FROM daily
),
lagged AS (
  SELECT series, vol, dp, ret,
         LAG(dp) OVER (PARTITION BY series ORDER BY d) AS dp_prev
  FROM chg
)
SELECT series,
       ROUND(COVAR_SAMP(dp, dp_prev) / 1e6, 4) + 0 AS cov_dp_millions,
       ROUND(CASE WHEN COVAR_SAMP(dp, dp_prev) < 0
                  THEN 2 * SQRT(-COVAR_SAMP(dp, dp_prev)) END, 6) + 0
         AS roll_spread,
       ROUND(AVG(ABS(ret) / vol) * 1e6, 6) + 0 AS amihud_illiq_x1e6
FROM lagged GROUP BY series
""",
)
def liquidity_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Microstructure liquidity measures per series: Roll's implied
    effective spread (2*sqrt(-cov(dp_t, dp_{t-1})) — bid-ask bounce
    makes consecutive price changes negatively autocorrelated; NULL
    when the covariance is positive and the model doesn't apply) and
    the Amihud illiquidity ratio (mean |return| per unit volume,
    daily order count as the volume proxy). One windowed pass for
    the lagged price changes, one grouped aggregate for both
    measures — the pattern extends to any lag-covariance diagnostic.
    NULL-safe: COVAR_SAMP skips the two warm-up rows on both
    engines."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("price"),
        F.count(F.lit(1)).cast("double").alias("vol"),
    )
    w = Window.partitionBy("series").orderBy("d")
    chg = daily.select(
        "series",
        "d",
        "vol",
        (F.col("price") - F.lag("price").over(w)).alias("dp"),
        (
            F.round(
                F.log(
                    F.col("price")
                    / F.coalesce(F.lag("price").over(w), F.col("price"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("ret"),
    )
    lagged = chg.select(
        "series",
        "vol",
        "dp",
        "ret",
        F.lag("dp").over(w.orderBy("d")).alias("dp_prev"),
    )
    cv = F.covar_samp("dp", "dp_prev")
    return lagged.groupBy("series").agg(
        # reported in millions: the raw covariance is ~1e10 here and
        # its final accumulation digits are FP-order-sensitive across
        # engines — scale before rounding so the hash compares signal
        (F.round(cv / 1e6, 4) + F.lit(0.0)).alias("cov_dp_millions"),
        (
            F.round(
                F.when(cv < 0, 2 * F.sqrt(-cv)), 6
            )
            + F.lit(0.0)
        ).alias("roll_spread"),
        (
            F.round(F.avg(F.abs(F.col("ret")) / F.col("vol")) * 1e6, 6)
            + F.lit(0.0)
        ).alias("amihud_illiq_x1e6"),
    )

@query(
    "calendar_effects_report",
    "WITH "
    + SQL_RETS
    + """,
dow AS (
  SELECT DATEDIFF('day', DATE '1990-01-01', d) % 7 AS dow, ret
  FROM rets
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(AVG(ret) * 1e4, 4) + 0 AS mean_ret_bps,
       ROUND(AVG(ret) / (STDDEV_SAMP(ret) / SQRT(COUNT(*))), 4) + 0
         AS t_stat
FROM dow GROUP BY dow
""",
)
def calendar_effects_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week calendar effects across the pooled return panel:
    mean return (basis points) and its t-statistic per weekday — the
    Monday-effect test every seasonality audit starts with (and the
    return-side companion to seasonal_anomaly_days' level
    decomposition). Day-of-week is integer arithmetic off the Monday
    anchor; one map-side-combining aggregate computes mean, stddev,
    and count together, so the t-stat is pure arithmetic on a 7-row
    result."""
    rets = daily_returns(spark, sf_dir)
    dow = rets.select(
        (F.datediff(F.col("d"), F.lit("1990-01-01")) % 7).alias("dow"),
        "ret",
    )
    return dow.groupBy(F.col("dow").cast("long").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.round(F.avg("ret") * 1e4, 4) + F.lit(0.0)).alias("mean_ret_bps"),
        (
            F.round(
                F.avg("ret")
                / (F.stddev_samp("ret") / F.sqrt(F.count(F.lit(1)))),
                4,
            )
            + F.lit(0.0)
        ).alias("t_stat"),
    )

@query(
    "order_window_functions_suite",
    """
WITH w AS (
  SELECT o_custkey AS k, o_orderkey AS ord, o_totalprice AS price,
         CAST(o_orderdate AS DATE) AS d,
         FIRST_VALUE(o_orderkey) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_ord,
         NTH_VALUE(o_orderkey, 2) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ord,
         CUME_DIST() OVER
           (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd,
         NTILE(4) OVER
           (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
           AS quartile,
         DATEDIFF('day',
           LAG(CAST(o_orderdate AS DATE)) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
)
SELECT k, ord, first_ord, second_ord,
       ROUND(cd, 6) + 0 AS cume_dist_in_priority,
       CAST(quartile AS BIGINT) AS quartile,
       CAST(gap_days AS BIGINT) AS gap_days
FROM w WHERE k % 100 = 0
""",
)
def order_window_functions_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Window-function completeness sampler (SURVEY §2.5 long tail):
    FIRST_VALUE / NTH_VALUE(2) with an explicit cumulative frame,
    CUME_DIST and NTILE over an independent partitioning, and a LAG
    date gap — all five in the plan together, exercising two window
    specs that Spark schedules as two Window stages over one scan.
    NTILE and NTH_VALUE tie-break on the order key; the output
    filter samples every 100th customer AFTER the windows (the
    windows must see the full partitions)."""
    o = _t(spark, sf_dir, "orders")
    wcust = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    wcum = wcust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprio = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wprio_tb = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("ord"),
        F.first("o_orderkey").over(wcust).alias("first_ord"),
        F.nth_value("o_orderkey", 2).over(wcum).alias("second_ord"),
        F.cume_dist().over(wprio).alias("cd"),
        F.ntile(4).over(wprio_tb).alias("quartile"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(wcust),
        ).alias("gap_days"),
    )
    return w.filter(F.col("k") % 100 == 0).select(
        "k",
        "ord",
        "first_ord",
        "second_ord",
        (F.round("cd", 6) + F.lit(0.0)).alias("cume_dist_in_priority"),
        F.col("quartile").cast("long").alias("quartile"),
        F.col("gap_days").cast("long").alias("gap_days"),
    )

@query(
    "newey_west_mean_test",
    "WITH "
    + SQL_RETS
    + """,
mu AS (SELECT series, AVG(ret) AS m, CAST(COUNT(*) AS DOUBLE) AS n
       FROM rets GROUP BY 1),
x AS (
  SELECT r.series, r.d, r.ret - mu.m AS e, mu.m, mu.n
  FROM rets r JOIN mu USING (series)
),
l AS (
  SELECT series, m, n, e,
         LAG(e, 1) OVER (PARTITION BY series ORDER BY d) AS e1,
         LAG(e, 2) OVER (PARTITION BY series ORDER BY d) AS e2,
         LAG(e, 3) OVER (PARTITION BY series ORDER BY d) AS e3,
         LAG(e, 4) OVER (PARTITION BY series ORDER BY d) AS e4,
         LAG(e, 5) OVER (PARTITION BY series ORDER BY d) AS e5
  FROM x
),
v AS (
  SELECT series, MIN(m) AS m, MIN(n) AS n,
         (SUM(e * e)
          + 2 * (5.0/6) * SUM(e * e1) + 2 * (4.0/6) * SUM(e * e2)
          + 2 * (3.0/6) * SUM(e * e3) + 2 * (2.0/6) * SUM(e * e4)
          + 2 * (1.0/6) * SUM(e * e5)) / MIN(n) AS lrv
  FROM l GROUP BY series
)
SELECT series,
       CAST(n AS BIGINT) AS n_obs,
       ROUND(m * 1e4, 4) + 0 AS mean_ret_bps,
       ROUND(m / SQRT(lrv / n), 4) + 0 AS nw_t_stat,
       ROUND(SQRT(lrv), 6) + 0 AS nw_long_run_sd
FROM v
""",
)
def newey_west_mean_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West HAC t-statistic for each series' mean return
    (Bartlett kernel, 5 lags): serial correlation makes the naive
    sd/sqrt(n) error too small, so the long-run variance adds the
    weighted autocovariances gamma_j with weights 1 - j/(L+1) — the
    inference-grade companion to calendar_effects_report's iid
    t-stats and acf_ljung_box's diagnostics. One broadcast mean, one
    window pass for all 5 lags, one grouped sum for the whole kernel
    — identical dataflow to the ACF query, just a different linear
    combination of the same lag products."""
    rets = daily_returns(spark, sf_dir)
    mu = rets.groupBy("series").agg(
        F.avg("ret").alias("m"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    x = rets.join(F.broadcast(mu), "series").select(
        "series", "d", (F.col("ret") - F.col("m")).alias("e"), "m", "n"
    )
    w = Window.partitionBy("series").orderBy("d")
    lagged = x.select(
        "series",
        "m",
        "n",
        "e",
        *[F.lag("e", j).over(w).alias(f"e{j}") for j in range(1, 6)],
    )
    L = 5
    lrv = (
        F.sum(F.col("e") * F.col("e"))
        + sum(
            2
            * ((L + 1.0 - j) / (L + 1.0))
            * F.sum(F.col("e") * F.col(f"e{j}"))
            for j in range(1, 6)
        )
    ) / F.min("n")
    return lagged.groupBy("series").agg(
        F.min("n").cast("long").alias("n_obs"),
        (F.round(F.min("m") * 1e4, 4) + F.lit(0.0)).alias("mean_ret_bps"),
        (
            F.round(F.min("m") / F.sqrt(lrv / F.min("n")), 4) + F.lit(0.0)
        ).alias("nw_t_stat"),
        (F.round(F.sqrt(lrv), 6) + F.lit(0.0)).alias("nw_long_run_sd"),
    )

@query(
    "rfm_segmentation",
    """
WITH rfm AS (
  SELECT o_custkey AS k,
         MAX(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(COUNT(*) AS DOUBLE) AS freq,
         SUM(o_totalprice) AS monetary
  FROM orders GROUP BY 1
),
edges AS (
  SELECT quantile_cont(DATEDIFF('day', last_d, DATE '2000-01-01'),
                       [0.25, 0.5, 0.75]) AS re,
         quantile_cont(freq, [0.25, 0.5, 0.75]) AS fe,
         quantile_cont(monetary, [0.25, 0.5, 0.75]) AS me
  FROM rfm
),
scored AS (
  SELECT k,
         4 - LEN(list_filter(e.re,
             x -> DATEDIFF('day', last_d, DATE '2000-01-01') > x)) AS r_score,
         1 + LEN(list_filter(e.fe, x -> freq > x)) AS f_score,
         1 + LEN(list_filter(e.me, x -> monetary > x)) AS m_score
  FROM rfm, edges e
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CASE WHEN r_score = 4 AND f_score >= 3 AND m_score >= 3
              THEN 'champions'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk_loyal'
            WHEN r_score = 1 AND f_score <= 2 THEN 'lost'
            ELSE 'core' END AS segment
FROM scored
GROUP BY r_score, f_score, m_score
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile scores for recency (days before
    the fixed anchor), frequency, and monetary value per customer,
    rolled into the 64-cell scoring cube with named segments — the
    CRM workhorse. Quartile EDGES come from one exact-percentile
    aggregate broadcast back (the same deterministic value-based
    binning as feature_binning_woe: no global sort, ties land
    deterministically); recency scores invert so 4 = most recent.
    One customer reduction, one 1-row edge aggregate, one codegen
    scoring projection, one 64-row rollup."""
    o = _t(spark, sf_dir, "orders")
    anchor = F.lit("2000-01-01")
    rfm = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.datediff(anchor, F.max(F.col("o_orderdate").cast("date"))).alias(
            "rec"
        ),
        F.count(F.lit(1)).cast("double").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    qs = F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)])
    edges = rfm.agg(
        F.percentile(F.col("rec").cast("double"), qs).alias("re"),
        F.percentile("freq", qs).alias("fe"),
        F.percentile("monetary", qs).alias("me"),
    )
    def above(col, e):
        return F.size(F.filter(e, lambda x: col > x))

    scored = rfm.crossJoin(F.broadcast(edges)).select(
        "k",
        (F.lit(4) - above(F.col("rec").cast("double"), F.col("re"))).alias(
            "r_score"
        ),
        (F.lit(1) + above(F.col("freq"), F.col("fe"))).alias("f_score"),
        (F.lit(1) + above(F.col("monetary"), F.col("me"))).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") == 4)
            & (F.col("f_score") >= 3)
            & (F.col("m_score") >= 3),
            F.lit("champions"),
        )
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") >= 3),
            F.lit("at_risk_loyal"),
        )
        .when(
            (F.col("r_score") == 1) & (F.col("f_score") <= 2), F.lit("lost")
        )
        .otherwise(F.lit("core"))
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    ).select(
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        "n_customers",
        seg.alias("segment"),
    )

@query(
    "market_concentration_hhi",
    """
WITH rev AS (
  SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
share AS (
  SELECT nk, r / SUM(r) OVER (PARTITION BY nk) AS sh FROM rev
)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(SUM(sh * sh) * 10000, 4) + 0 AS hhi,
       ROUND(MAX(sh), 6) + 0 AS top_share
FROM share JOIN nation n ON share.nk = n.n_nationkey
GROUP BY n.n_name
""",
)
def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market concentration per supplier nation
    (the antitrust screen: HHI > 2500 = highly concentrated, on the
    x10000 scale): revenue shares within each national market from
    one lineitem x supplier broadcast join + grouped sum, shares via
    a nation-partitioned window over the supplier-count frame, HHI
    and the leader's share in one rollup. The heavy table is touched
    once; everything after the first aggregate is dimension-scale —
    the Gini/ABC family's cousin with a market-definition join."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nk"),
            F.col("l_suppkey").alias("sk"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("r")
        )
    )
    wnk = Window.partitionBy("nk")
    share = rev.select(
        "nk", (F.col("r") / F.sum("r").over(wnk)).alias("sh")
    )
    return (
        share.join(F.broadcast(n), share.nk == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (F.round(F.sum(F.col("sh") * F.col("sh")) * 10000, 4) + F.lit(0.0)).alias(
                "hhi"
            ),
            (F.round(F.max("sh"), 6) + F.lit(0.0)).alias("top_share"),
        )
    )

@query(
    "promo_uplift_did",
    """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         CAST(DATEDIFF('day', MIN(CAST(ts AS DATE)),
                        MAX(CAST(ts AS DATE))) + 1 AS DOUBLE) AS span
  FROM events
),
cells AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS treated,
         CASE WHEN DATEDIFF('day', b.d0, CAST(ts AS DATE)) * 2 >= b.span
              THEN 1 ELSE 0 END AS post,
         value
  FROM events, bounds b
),
agg AS (
  SELECT treated, post, AVG(value) AS m,
         VAR_SAMP(value) AS v, CAST(COUNT(*) AS DOUBLE) AS n
  FROM cells GROUP BY 1, 2
)
SELECT CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN n END) AS BIGINT)
         AS n_treated_post,
       ROUND(SUM(CASE WHEN treated = 1 AND post = 1 THEN m END)
           - SUM(CASE WHEN treated = 1 AND post = 0 THEN m END)
           - SUM(CASE WHEN treated = 0 AND post = 1 THEN m END)
           + SUM(CASE WHEN treated = 0 AND post = 0 THEN m END), 6) + 0
         AS did_estimate,
       ROUND(SQRT(SUM(v / n)), 6) + 0 AS did_se,
       ROUND((SUM(CASE WHEN treated = 1 AND post = 1 THEN m END)
           - SUM(CASE WHEN treated = 1 AND post = 0 THEN m END)
           - SUM(CASE WHEN treated = 0 AND post = 1 THEN m END)
           + SUM(CASE WHEN treated = 0 AND post = 0 THEN m END))
           / SQRT(SUM(v / n)), 4) + 0 AS did_t_stat
FROM agg
""",
)
def promo_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences uplift estimate: (treated post -
    treated pre) - (control post - control pre), the causal design
    when randomization isn't available and trends are parallel —
    beside cuped_experiment_analysis these cover the two standard
    observational/experimental readouts. The four cell means,
    variances, and counts come from ONE grouped aggregate over the
    scan; the estimate, its pooled standard error sqrt(sum v_i/n_i),
    and the t-stat are arithmetic over the 4-row frame. Arms and
    periods share the CUPED query's parity/midpoint construction so
    the two readouts are directly comparable."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("double")
        .alias("span"),
    )
    day = F.datediff(F.col("ts").cast("date"), F.col("d0"))
    cells = e.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.when(day * 2 >= F.col("span"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("post"),
        "value",
    )
    agg = cells.groupBy("treated", "post").agg(
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )

    def cell(t, p, col="m"):
        return F.sum(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p), F.col(col)
            )
        )

    did = cell(1, 1) - cell(1, 0) - cell(0, 1) + cell(0, 0)
    se = F.sqrt(F.sum(F.col("v") / F.col("n")))
    return agg.agg(
        cell(1, 1, "n").cast("long").alias("n_treated_post"),
        (F.round(did, 6) + F.lit(0.0)).alias("did_estimate"),
        (F.round(se, 6) + F.lit(0.0)).alias("did_se"),
        (F.round(did / se, 4) + F.lit(0.0)).alias("did_t_stat"),
    )

@query(
    "es_contribution_allocation",
    "WITH "
    + SQL_RETS
    + """,
ns AS (SELECT CAST(COUNT(DISTINCT series) AS DOUBLE) AS n FROM rets),
spine AS (
  SELECT s.series, dd.d
  FROM (SELECT DISTINCT series FROM rets) s
  CROSS JOIN (SELECT DISTINCT d FROM rets) dd
),
aligned AS (
  SELECT sp.series, sp.d, COALESCE(r.ret, 0.0) AS ret
  FROM spine sp LEFT JOIN rets r
    ON sp.series = r.series AND sp.d = r.d
),
mkt AS (SELECT d, AVG(ret) AS rp FROM aligned GROUP BY 1),
vt AS (SELECT quantile_cont(rp, 0.01) AS var99 FROM mkt),
tail AS (SELECT m.d FROM mkt m, vt WHERE m.rp <= vt.var99)
SELECT a.series,
       CAST(COUNT(*) AS BIGINT) AS n_tail_days,
       ROUND(AVG(a.ret) / ns.n, 6) + 0 AS es_contribution
FROM aligned a JOIN tail t ON a.d = t.d, ns
GROUP BY a.series, ns.n
""",
)
def es_contribution_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-shortfall Euler allocation: component ES_i = w_i *
    E[r_i | r_p <= VaR_p] — the tail-conditional average of each
    series on the PORTFOLIO's worst days. Unlike variance-based VaR
    components this needs no distributional assumption, and the
    components sum EXACTLY to the portfolio ES by linearity of the
    conditional expectation (pytest-pinned) — the allocation the
    coherent-risk-measure literature actually recommends. Dataflow:
    the portfolio tail-day set is a tiny date list semi-joined back
    onto the aligned frame (broadcast), then one grouped mean per
    series; same densified spine as the Euler-VaR query so the two
    attributions are directly comparable."""
    rets = daily_returns(spark, sf_dir)
    ns = rets.agg(
        F.count_distinct(F.col("series")).cast("double").alias("n")
    )
    spine = (
        rets.select("series")
        .distinct()
        .crossJoin(rets.select("d").distinct())
    )
    aligned = spine.join(rets, ["series", "d"], "left").select(
        "series", "d", F.coalesce(F.col("ret"), F.lit(0.0)).alias("ret")
    )
    mkt = aligned.groupBy("d").agg(F.avg("ret").alias("rp"))
    vt = mkt.agg(F.percentile("rp", F.lit(0.01)).alias("var99"))
    tail = (
        mkt.crossJoin(F.broadcast(vt))
        .filter(F.col("rp") <= F.col("var99"))
        .select("d")
    )
    return (
        aligned.join(F.broadcast(tail), "d")
        .crossJoin(F.broadcast(ns))
        .groupBy("series", "n")
        .agg(
            F.count(F.lit(1)).alias("n_tail_days"),
            (F.round(F.avg("ret") / F.col("n"), 6) + F.lit(0.0)).alias(
                "es_contribution"
            ),
        )
        .select("series", "n_tail_days", "es_contribution")
    )

@query(
    "order_backlog_sweepline",
    """
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS open_d,
         GREATEST(CAST(o.o_orderdate AS DATE),
                  MAX(CAST(l.l_shipdate AS DATE))) AS close_d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
deltas AS (
  SELECT open_d AS d, 1 AS delta FROM spans
  UNION ALL
  SELECT close_d + INTERVAL 1 DAY, -1 FROM spans
),
byday AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY 1),
run AS (
  SELECT d, SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS backlog
  FROM byday
)
SELECT CAST(EXTRACT(YEAR FROM d) AS BIGINT) AS yr,
       CAST(EXTRACT(MONTH FROM d) AS BIGINT) AS mth,
       CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
       ROUND(AVG(backlog), 4) + 0 AS mean_backlog
FROM run GROUP BY 1, 2
""",
)
def order_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting by SWEEP LINE: how many orders
    are simultaneously open (placed but not fully shipped) each day,
    rolled up to monthly peak/mean backlog — the pattern behind
    room-occupancy, concurrent-session, and WIP dashboards. Naive
    forms join every day against every overlapping interval (a range
    join that explodes as intervals lengthen); the sweep line instead
    emits +1/-1 boundary deltas, reduces them to one net per day, and
    takes ONE running sum over the calendar-scale frame — interval
    count drops out of the cost entirely after the boundary
    reduction. Close day comes from the order's LAST shipment (the
    lineitem max), so the spans query is itself one grouped join."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("open_d")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    # the synthetic fixture ships some lines BEFORE the order date;
    # clamp so every interval is well-formed (open at least on the
    # order day) — without this the -1 delta lands before the +1
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "open_d")
        .agg(
            F.greatest(F.max("ship_d"), F.col("open_d")).alias("close_d")
        )
    )
    deltas = spans.select(
        F.col("open_d").alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(
            F.date_add(F.col("close_d"), 1).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    byday = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    wrun = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = byday.select(
        "d", F.sum("net").over(wrun).alias("backlog")
    )
    return run.groupBy(
        F.year("d").cast("long").alias("yr"),
        F.month("d").cast("long").alias("mth"),
    ).agg(
        F.max("backlog").cast("long").alias("peak_backlog"),
        (F.round(F.avg("backlog"), 4) + F.lit(0.0)).alias("mean_backlog"),
    )

@query(
    "seasonality_strength_report",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, ROUND(SUM(value), 4) AS v
  FROM events GROUP BY 1
),
tr AS (
  SELECT d, v,
         AVG(v) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend
  FROM daily
),
det AS (
  SELECT d, v, trend, v - trend AS detr,
         DATEDIFF('day', DATE '1990-01-01', d) % 7 AS dow
  FROM tr
),
seas AS (SELECT dow, AVG(detr) AS seasonal FROM det GROUP BY 1),
parts AS (
  SELECT det.v, det.trend, seas.seasonal,
         det.detr - seas.seasonal AS resid
  FROM det JOIN seas ON det.dow = seas.dow
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(1 - VAR_SAMP(v - trend) / VAR_SAMP(v), 6) + 0
         AS trend_strength,
       ROUND(1 - VAR_SAMP(resid) / VAR_SAMP(seasonal + resid), 6) + 0
         AS seasonal_strength
FROM parts
""",
)
def seasonality_strength_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hyndman-style decomposition strength: trend strength =
    1 - var(detrended)/var(series), seasonal strength =
    1 - var(residual)/var(seasonal + residual) — one number each in
    [~0, 1] saying how much structure the STL-lite decomposition
    (seasonal_anomaly_days) actually explains, which is what decides
    whether the seasonal adjustment belongs in a monitoring pipeline
    at all. Same dataflow as the anomaly query up to the residual,
    then a single variance reduction."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    wtr = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select("d", "v", F.avg("v").over(wtr).alias("trend"))
    det = tr.select(
        "d",
        "v",
        "trend",
        (F.col("v") - F.col("trend")).alias("detr"),
        (F.datediff(F.col("d"), F.lit("1990-01-01")) % 7).alias("dow"),
    )
    seas = det.groupBy("dow").agg(F.avg("detr").alias("seasonal"))
    parts = det.join(F.broadcast(seas), "dow").select(
        "v",
        "trend",
        "seasonal",
        (F.col("detr") - F.col("seasonal")).alias("resid"),
    )
    return parts.agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.round(
                F.lit(1.0)
                - F.var_samp(F.col("v") - F.col("trend"))
                / F.var_samp("v"),
                6,
            )
            + F.lit(0.0)
        ).alias("trend_strength"),
        (
            F.round(
                F.lit(1.0)
                - F.var_samp("resid")
                / F.var_samp(F.col("seasonal") + F.col("resid")),
                6,
            )
            + F.lit(0.0)
        ).alias("seasonal_strength"),
    )

@query(
    "ab_power_analysis",
    """
WITH per_user AS (
  SELECT user_id, SUM(value) AS m FROM events GROUP BY 1
),
s AS (
  SELECT VAR_SAMP(m) AS v, AVG(m) AS mu,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND(mu, 4) + 0 AS mean_metric,
       ROUND((1.959963984540054 + 0.8416212335729143)
             * SQRT(2 * v / (n / 2)), 4) + 0 AS mde_absolute,
       ROUND((1.959963984540054 + 0.8416212335729143)
             * SQRT(2 * v / (n / 2)) / mu, 6) + 0 AS mde_relative
FROM s
""",
)
def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment DESIGN: the minimum detectable effect at 80% power
    / 5% two-sided alpha for a 50/50 split of the current user base —
    MDE = (z_{a/2} + z_beta) * sqrt(2 sigma^2 / (n/2)), with sigma
    and n measured from the live per-user metric. Run BEFORE
    cuped_experiment_analysis/promo_uplift_did to know whether the
    experiment is even worth running (and CUPED's variance_reduction
    multiplies straight into this sigma). One user reduction + one
    1-row moment aggregate; z constants are shared literals with the
    oracle."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.sum("value").alias("m"))
    z = 1.959963984540054 + 0.8416212335729143
    s = per_user.agg(
        F.var_samp("m").alias("v"),
        F.avg("m").alias("mu"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    mde = F.lit(z) * F.sqrt(2 * F.col("v") / (F.col("n") / 2))
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        (F.round("mu", 4) + F.lit(0.0)).alias("mean_metric"),
        (F.round(mde, 4) + F.lit(0.0)).alias("mde_absolute"),
        (F.round(mde / F.col("mu"), 6) + F.lit(0.0)).alias("mde_relative"),
    )

@query(
    "mad_robust_outliers",
    """
WITH med AS (
  SELECT event_type, MEDIAN(value) AS m
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, med.m,
         ABS(e.value - med.m) AS ad
  FROM events e JOIN med ON e.event_type = med.event_type
),
mad AS (
  SELECT event_type, MIN(m) AS m, MEDIAN(ad) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MIN(mad.m), 4) + 0 AS median_value,
       ROUND(MIN(mad.mad) * 1.4826, 4) + 0 AS robust_sd,
       CAST(SUM(CASE WHEN ABS(d.value - mad.m)
                          > 3.5 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad ON d.event_type = mad.event_type
GROUP BY d.event_type
""",
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per event type
    (modified z-score > 3.5, Iglewicz-Hoaglin): the robust
    completion of the moment-based 3-sigma screen in
    event_value_anomalies — a 50% contaminated stream still gets a
    sane threshold because median and MAD have 50% breakdown, where
    mean/sigma have 0%. Two grouped exact medians with the small
    per-type frames broadcast back between passes; the 1.4826
    consistency constant rescales MAD to sigma-equivalents. The
    count-only output keeps the gate row compact; the flag predicate
    itself is reusable inline."""
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "m",
        F.abs(F.col("value") - F.col("m")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.min("m").alias("m2"), F.median("ad").alias("mad")
    )
    joined = dev.join(F.broadcast(mad), "event_type")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.round(F.min("m2"), 4) + F.lit(0.0)).alias("median_value"),
        (F.round(F.min("mad") * 1.4826, 4) + F.lit(0.0)).alias("robust_sd"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("m2"))
                > 3.5 * 1.4826 * F.col("mad"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_outliers"),
    )

@query(
    "shipping_latency_percentiles",
    """
WITH lat AS (
  SELECT o.o_orderpriority AS priority,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS DOUBLE) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(quantile_cont(days, 0.5), 4) + 0 AS p50_days,
       ROUND(quantile_cont(days, 0.9), 4) + 0 AS p90_days,
       ROUND(quantile_cont(days, 0.99), 4) + 0 AS p99_days,
       ROUND(AVG(CASE WHEN days < 0 THEN 1.0 ELSE 0.0 END), 6) + 0
         AS frac_preship
FROM lat GROUP BY priority
""",
)
def shipping_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency SLA percentiles per priority (p50/p90/
    p99 — the tail is the SLA; the mean hides it), plus the fraction
    of lines shipping BEFORE their order date — the fixture's
    inverted-interval anomaly (FIXTURES.md) surfaced as a first-class
    data-quality measure rather than silently clamped. One fact join,
    one grouped exact-percentile aggregate; this is the latency twin
    of the late_shipment count queries."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("double")
        .alias("days"),
    )
    return lat.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.round(F.percentile("days", F.lit(0.5)), 4) + F.lit(0.0)).alias(
            "p50_days"
        ),
        (F.round(F.percentile("days", F.lit(0.9)), 4) + F.lit(0.0)).alias(
            "p90_days"
        ),
        (F.round(F.percentile("days", F.lit(0.99)), 4) + F.lit(0.0)).alias(
            "p99_days"
        ),
        (
            F.round(
                F.avg(
                    F.when(F.col("days") < 0, F.lit(1.0)).otherwise(
                        F.lit(0.0)
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("frac_preship"),
    )

@query(
    "field_drift_report",
    """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0,
         CAST(DATEDIFF('day', MIN(CAST(ts AS DATE)),
                        MAX(CAST(ts AS DATE))) + 1 AS DOUBLE) AS span
  FROM events
),
halves AS (
  SELECT CASE WHEN DATEDIFF('day', b.d0, CAST(ts AS DATE)) * 2 < b.span
              THEN 'first_half' ELSE 'second_half' END AS period,
         value, props
  FROM events, bounds b
),
stats AS (
  SELECT period,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6) + 0
           AS null_rate_value,
         ROUND(AVG(CASE WHEN value = 0 THEN 1.0 ELSE 0.0 END), 6) + 0
           AS zero_rate_value,
         ROUND(AVG(CASE WHEN props IS NULL OR props = '' THEN 1.0
                        ELSE 0.0 END), 6) + 0 AS empty_rate_props,
         ROUND(AVG(value), 4) + 0 AS mean_value
  FROM halves GROUP BY period
)
SELECT * FROM stats
""",
)
def field_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-health drift between the stream's first and second half:
    null/zero/empty rates and the mean per period — the schema-drift
    tripwire a pipeline checks before models quietly degrade (the
    temporal companion to data_quality_audit's static expectations;
    ks_two_sample_test covers full-distribution drift, this covers
    the cheap always-on rates). One scan, the period split from a
    1-row bounds broadcast, every rate a conditional mean in the
    SAME aggregate."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            + 1
        )
        .cast("double")
        .alias("span"),
    )
    day = F.datediff(F.col("ts").cast("date"), F.col("d0"))
    halves = e.crossJoin(F.broadcast(bounds)).select(
        F.when(day * 2 < F.col("span"), F.lit("first_half"))
        .otherwise(F.lit("second_half"))
        .alias("period"),
        "value",
        "props",
    )
    rate = lambda cond: (
        F.round(
            F.avg(F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))), 6
        )
        + F.lit(0.0)
    )
    return halves.groupBy("period").agg(
        F.count(F.lit(1)).alias("n"),
        rate(F.col("value").isNull()).alias("null_rate_value"),
        rate(F.col("value") == 0).alias("zero_rate_value"),
        rate(F.col("props").isNull() | (F.col("props") == "")).alias(
            "empty_rate_props"
        ),
        (F.round(F.avg("value"), 4) + F.lit(0.0)).alias("mean_value"),
    )

@query(
    "revenue_bridge_yoy",
    """
WITH yearly AS (
  SELECT l_partkey AS pk,
         EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS yr,
         SUM(l_quantity) AS q,
         SUM(l_extendedprice) / SUM(l_quantity) AS p
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  SELECT a.yr AS base_yr, a.p AS p0, a.q AS q0, b.p AS p1, b.q AS q1
  FROM yearly a JOIN yearly b ON a.pk = b.pk AND b.yr = a.yr + 1
)
SELECT CAST(base_yr AS BIGINT) AS base_yr,
       ROUND(SUM(p1 * q1 - p0 * q0) / 1e6, 4) + 0 AS delta_rev_m,
       ROUND(SUM((p1 - p0) * q0) / 1e6, 4) + 0 AS price_effect_m,
       ROUND(SUM(p0 * (q1 - q0)) / 1e6, 4) + 0 AS volume_effect_m,
       ROUND(SUM((p1 - p0) * (q1 - q0)) / 1e6, 4) + 0 AS mix_effect_m
FROM pairs GROUP BY base_yr
""",
)
def revenue_bridge_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (price-volume-mix waterfall) over the matched
    part basket: delta revenue decomposes EXACTLY as dp*q0 (price
    effect) + p0*dq (volume effect) + dp*dq (mix/cross term) — the
    FP&A decomposition behind every 'why did revenue move' slide,
    and the additive counterpart to price_index_yoy's ratio view
    over the same matched-pair frame (reported in thousands: raw
    sums are ~1e8 and their last accumulation digits are engine-
    order-sensitive, the cov_dp lesson). The identity is algebraic,
    so the three effects sum to the delta to the last rounded digit
    — pytest-pinned."""
    li = _t(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year(F.col("l_shipdate").cast("date")).alias("yr"),
    ).agg(
        F.sum("l_quantity").alias("q"),
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
    )
    a = yearly.select(
        "pk",
        F.col("yr").alias("base_yr"),
        F.col("p").alias("p0"),
        F.col("q").alias("q0"),
    )
    b = yearly.select(
        "pk",
        (F.col("yr") - 1).alias("base_yr"),
        F.col("p").alias("p1"),
        F.col("q").alias("q1"),
    )
    pairs = a.join(b, ["pk", "base_yr"])
    m = lambda c: (F.round(F.sum(c) / 1e6, 4) + F.lit(0.0))
    return pairs.groupBy(
        F.col("base_yr").cast("long").alias("base_yr")
    ).agg(
        m(F.col("p1") * F.col("q1") - F.col("p0") * F.col("q0")).alias(
            "delta_rev_m"
        ),
        m((F.col("p1") - F.col("p0")) * F.col("q0")).alias(
            "price_effect_m"
        ),
        m(F.col("p0") * (F.col("q1") - F.col("q0"))).alias(
            "volume_effect_m"
        ),
        m((F.col("p1") - F.col("p0")) * (F.col("q1") - F.col("q0"))).alias(
            "mix_effect_m"
        ),
    )

@query(
    "duplicate_payment_screen",
    """
WITH cand AS (
  SELECT a.o_orderkey AS k1, b.o_orderkey AS k2,
         a.o_custkey AS cust, a.o_totalprice AS amount,
         DATEDIFF('day', CAST(a.o_orderdate AS DATE),
                  CAST(b.o_orderdate AS DATE)) AS gap_days
  FROM orders a JOIN orders b
    ON a.o_custkey = b.o_custkey
   AND a.o_totalprice = b.o_totalprice
   AND a.o_orderkey < b.o_orderkey
  WHERE ABS(DATEDIFF('day', CAST(a.o_orderdate AS DATE),
                     CAST(b.o_orderdate AS DATE))) <= 30
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suspect_pairs,
       CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_customers,
       ROUND(SUM(amount), 2) + 0 AS exposure,
       CAST(MIN(ABS(gap_days)) AS BIGINT) AS min_gap_days
FROM cand
""",
)
def duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen (the audit-analytics staple): order
    pairs from the SAME customer with the IDENTICAL amount within 30
    days — same-amount-same-party-near-in-time is the canonical
    double-charge signature. The pair join is keyed on (customer,
    exact amount) — a bucketed equi-join like every candidate
    generator in this engine, never a cross join; the date window is
    a residual predicate on collisions only. Summary row keeps the
    gate output compact; the cand frame itself is the worklist an
    auditor pulls. Exact-amount equality on the 2-decimal money grid
    is engine-safe (both read the same parquet doubles)."""
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").cast("date").alias("d1"),
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").cast("date").alias("d2"),
    )
    cand = (
        a.join(b, ["cust", "amount"])
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.datediff(F.col("d2"), F.col("d1"))) <= 30)
        )
        .select(
            "cust",
            "amount",
            F.datediff(F.col("d2"), F.col("d1")).alias("gap_days"),
        )
    )
    return cand.agg(
        F.count(F.lit(1)).alias("n_suspect_pairs"),
        F.count_distinct("cust").alias("n_customers"),
        (F.round(F.sum("amount"), 2) + F.lit(0.0)).alias("exposure"),
        F.min(F.abs(F.col("gap_days"))).cast("long").alias("min_gap_days"),
    )

@query(
    "dau_wau_stickiness",
    """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
firsts AS (SELECT user_id, MIN(d) AS first_d FROM ud GROUP BY 1),
dau AS (
  SELECT ud.d,
         CAST(COUNT(*) AS BIGINT) AS dau,
         CAST(SUM(CASE WHEN ud.d = f.first_d THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users
  FROM ud JOIN firsts f ON ud.user_id = f.user_id
  GROUP BY ud.d
),
att AS (
  SELECT DISTINCT user_id, d + CAST(k AS INTEGER) AS d
  FROM ud, UNNEST(range(0, 7)) AS t(k)
),
wau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS wau FROM att GROUP BY 1)
SELECT dau.d, dau.dau, dau.new_users,
       CAST(dau.dau - dau.new_users AS BIGINT) AS returning_users,
       wau.wau,
       ROUND(dau.dau / CAST(wau.wau AS DOUBLE), 6) + 0 AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
""",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness with the new-vs-returning split — the
    engagement triplet on every growth dashboard. The WAU side uses
    the ATTENDANCE-EXPLODE trick: each (user, day) presence emits 7
    (user, day+k) attendance claims, so the trailing-7-day DISTINCT
    count becomes an ordinary groupBy — no sliding COUNT(DISTINCT)
    window (which Spark cannot partial-aggregate) and no 7-way self-
    join; cost is 7x the (user, day) REDUCTION, not 7x the events.
    New users fall out of a broadcast first-day join. At 100 TB the
    (user, day) frame is the only thing that ever shuffles."""
    e = _t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    dau = (
        ud.join(F.broadcast(firsts), "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.sum(
                F.when(F.col("d") == F.col("first_d"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("new_users"),
        )
    )
    att = ud.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda k: F.date_add(F.col("d"), k),
            )
        ).alias("d"),
    ).distinct()
    wau = att.groupBy("d").agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "d").select(
        "d",
        "dau",
        "new_users",
        (F.col("dau") - F.col("new_users")).cast("long").alias(
            "returning_users"
        ),
        "wau",
        (
            F.round(F.col("dau") / F.col("wau").cast("double"), 6)
            + F.lit(0.0)
        ).alias("stickiness"),
    )

@query(
    "supplier_reliability_scorecard",
    """
WITH lines AS (
  SELECT l.l_suppkey AS sk,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS DOUBLE) AS days,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT s.s_name AS supplier,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(AVG(CASE WHEN days BETWEEN 0 AND 60 THEN 1.0 ELSE 0.0 END), 6)
         + 0 AS on_time_rate,
       ROUND(quantile_cont(days, 0.5), 4) + 0 AS median_latency_days,
       ROUND(SUM(rev) / 1e6, 4) + 0 AS revenue_m
FROM lines JOIN supplier s ON lines.sk = s.s_suppkey
GROUP BY s.s_name
""",
)
def supplier_reliability_scorecard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier scorecard: on-time rate (shipped within 60 days of
    order, the fixture's realistic SLA band), median latency, and
    discounted revenue per supplier — the vendor-management view
    stitching the latency percentiles (shipping_latency_percentiles)
    to WHO, with revenue scaled to millions before rounding (the
    recurring magnitude rule). One fact join, one grouped aggregate,
    supplier names by broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("sk"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("double")
        .alias("days"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        lines.join(F.broadcast(s), lines.sk == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.round(
                    F.avg(
                        F.when(
                            F.col("days").between(0, 60), F.lit(1.0)
                        ).otherwise(F.lit(0.0))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("on_time_rate"),
            (
                F.round(F.percentile("days", F.lit(0.5)), 4) + F.lit(0.0)
            ).alias("median_latency_days"),
            (F.round(F.sum("rev") / 1e6, 4) + F.lit(0.0)).alias(
                "revenue_m"
            ),
        )
    )

@query(
    "table_freshness_report",
    """
SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(CAST(o_orderdate AS DATE)) AS first_d,
       MAX(CAST(o_orderdate AS DATE)) AS last_d,
       CAST(DATEDIFF('day', MIN(CAST(o_orderdate AS DATE)),
                     MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS span_days
FROM orders
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
       MIN(CAST(l_shipdate AS DATE)), MAX(CAST(l_shipdate AS DATE)),
       CAST(DATEDIFF('day', MIN(CAST(l_shipdate AS DATE)),
                     MAX(CAST(l_shipdate AS DATE))) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events', CAST(COUNT(*) AS BIGINT),
       MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)),
       CAST(DATEDIFF('day', MIN(CAST(ts AS DATE)),
                     MAX(CAST(ts AS DATE))) AS BIGINT)
FROM events
""",
)
def table_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table freshness inventory: row count, first/last business
    date, and span — the landing-zone health view an orchestrator
    checks before kicking downstream jobs (staleness = last_d not
    advancing run-over-run; pair with field_drift_report for content
    health and data_quality_audit for constraints). Three 1-row
    min/max aggregates unioned; each table is scanned once for
    exactly the columns needed (min/max push into the parquet
    footer statistics where the layout allows)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = _t(spark, sf_dir, "events")

    def one(df, name, col):
        d = F.col(col).cast("date")
        return df.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min(d).alias("first_d"),
            F.max(d).alias("last_d"),
            F.datediff(F.max(d), F.min(d)).cast("long").alias("span_days"),
        )

    return (
        one(o, "orders", "o_orderdate")
        .unionByName(one(li, "lineitem", "l_shipdate"))
        .unionByName(one(e, "events", "ts"))
    )

@query(
    "mp4_frame_extraction",
    """
WITH v AS (
  SELECT doc_id, (doc_id % 16) + 4 AS n
  FROM documents WHERE doc_id % 50 = 0
),
idx AS (SELECT doc_id, UNNEST(range(0, n, 3)) AS i FROM v)
SELECT doc_id AS media_id,
       COUNT(*) AS n_frames,
       CAST(SUM((i % 7) + 8) AS BIGINT) AS sampled_bytes,
       CAST(MAX(i) * 100.0 AS DOUBLE) AS last_ts_ms
FROM idx GROUP BY doc_id
""",
)
def mp4_frame_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-level MP4 frame sampling, ORACLE-pinned end to end:
    each selected document becomes a deterministic synthetic MP4
    (operators/multimodal.synth_mp4 — real ISO-BMFF boxes, two-chunk
    stsc, (doc_id %% 16)+4 frames of (i %% 7)+8 bytes at 10 fps), the
    demuxer derives every frame's byte range from the
    stts/stsc/stsz/stco sample tables and extracts the frames at
    >=300 ms spacing (indexes 0,3,6,...), and the per-video aggregate
    must equal DuckDB's CLOSED-FORM arithmetic over the same
    parameters — a demuxer that mis-expands any sample table breaks
    the hash. The pixel decode of each extracted frame is the one
    stage left to absent codec libraries; the byte-accurate frame
    extraction itself is pinned here and in the roundtrip pytest."""
    import pandas as pd

    from value_at_risk_spark.operators.multimodal import (
        demux_mp4_frames,
        synth_mp4,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("media_id"),
            ((F.col("doc_id") % 16) + 4).cast("int").alias("_n"),
        )
    )

    def _synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_bytes": [
                        synth_mp4(
                            [(i % 7) + 8 for i in range(int(n))],
                            fps=10,
                            first_chunk_samples=3,
                        )
                        for n in pdf["_n"]
                    ],
                }
            )

    media = d.mapInPandas(_synth, "media_id long, payload_bytes binary")
    frames = demux_mp4_frames(media, every_ms=300)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_size").alias("sampled_bytes"),
        F.max("ts_ms").alias("last_ts_ms"),
    )
