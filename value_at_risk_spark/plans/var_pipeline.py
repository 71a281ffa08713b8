"""The VaR pipeline: the reference's five notebooks as composable stages.

Reference flow (SURVEY §3): 01 ETL → volatility stats; 02 per-ticker
model fit; 03 Monte-Carlo simulation + scoring; 04 slice-and-dice VaR
aggregation; 05 Basel compliance backtest. Each stage here is a pure
DataFrame → DataFrame function over the table-registry contract — no
Databricks, MLflow, yfinance, or tempo.

Key deviations (all scale-motivated, semantics preserved):
- market factor returns computed distributed with a lag window instead
  of the reference's driver pandas round-trip
  (/root/reference/01_var_market_etl.py:135-154);
- trailing mean/cov uses a date-spine range join + covar_samp rather
  than a single-task global window + per-row Python UDFs
  (01_var_market_etl.py:167-184; SURVEY §4 single-partition hazard);
- model scoring is a broadcast weights join + native expression, not an
  MLflow pyfunc UDF (02_var_model.py:219-220);
- trial vectors stay (date, trial_id) rows until the final percentile;
  no VectorUDT packing (04_var_aggregation.py:35-41). `pack_trials`
  exists for parity where a packed layout is wanted.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from value_at_risk_spark.functions.features import nonlinear_features
from value_at_risk_spark.functions.returns import log_returns_over
from value_at_risk_spark.functions.risk import basel_zone, value_at_risk_expr
from value_at_risk_spark.functions.timeutil import epoch_seconds
from value_at_risk_spark.model import fit_ols_per_group, score
from value_at_risk_spark.montecarlo import simulate_trials
from value_at_risk_spark.operators.asof import asof_join
from value_at_risk_spark.operators.vector_agg import vector_mean_cov


@dataclass(frozen=True)
class VarConfig:
    """application.yaml semantics (/root/reference/config/application.yaml)."""

    volatility_days: int = 90  # monte-carlo.volatility (yaml:27-28)
    basel_days: int = 250  # 05_var_compliance.py:113
    runs: int = 1000  # monte-carlo.runs (yaml:29-30; 32,000 in prod)
    confidence: float = 99.0
    factor_cols: tuple[str, ...] = field(default=())


def stock_returns(stocks: DataFrame) -> DataFrame:
    """(ticker, date, close) → (ticker, date, return) — 02_var_model.py:52-64.

    First row per ticker returns 0.0 (reference W3 semantics, SURVEY §7.5).
    """
    return stocks.filter(F.col("close").isNotNull()).select(
        "ticker",
        "date",
        log_returns_over("close", ["ticker"], "date").alias("return"),
    )


def market_features(indicators: DataFrame, factor_cols: list[str]) -> DataFrame:
    """Wide indicator closes → (date, features: array of factor log returns).

    Distributed replacement for get_market_returns
    (01_var_market_etl.py:135-154): per-factor lag window + F.array
    packing, no driver round-trip. Direction standardized to
    log(cur/prev) (SURVEY §7.4).
    """
    rets = indicators.select(
        "date",
        *[
            log_returns_over(c, None, "date").alias(c)
            for c in factor_cols
        ],
    )
    return rets.select("date", F.array(*factor_cols).alias("features"))


def trailing_volatility(
    features_df: DataFrame, days: int = 90
) -> DataFrame:
    """(date, features) → (date, vol_avg, vol_cov) over a trailing window.

    01_var_market_etl.py:159-184 re-expressed: instead of a global
    unpartitioned range window + per-row mean/cov Python UDFs (single
    task — SURVEY §4), each date range-joins its trailing history and
    aggregates with avg/covar_samp.

    The range join is bucketized so Catalyst gets an EQUI join: with
    bucket width = the window length, a date in bucket b only needs
    history from buckets {b-1, b}; each current-date row explodes to
    those two bucket keys and hash-joins history on the bucket id, with
    the exact range predicate as a post-filter. Shuffle-hash/broadcast
    instead of a nested-loop — linear fan-out at any history size.
    """
    cur = features_df.select(
        F.col("date").alias("_cd"),
        F.explode(
            F.array(
                F.floor(F.unix_date(F.col("date").cast("date")) / days),
                F.floor(F.unix_date(F.col("date").cast("date")) / days) - 1,
            )
        ).alias("_bk"),
    )
    hist = features_df.select(
        F.col("date").alias("_hd"),
        F.floor(F.unix_date(F.col("date").cast("date")) / days).alias("_bk"),
        F.col("features").alias("features"),
    )
    joined = cur.join(hist, "_bk").filter(
        (F.col("_hd") >= F.date_sub(F.col("_cd"), days))
        & (F.col("_hd") <= F.col("_cd"))
    ).drop("_bk")
    # one pass (r17, guide §2.4): the row count rides the mean/cov
    # aggregation (count_col) instead of a second groupBy over the
    # SAME bucket join — lazily, the explode+join subtree executed
    # twice and the counts branch re-shuffled it just to count rows.
    stats = vector_mean_cov(joined, ["_cd"], "features", count_col="_n")
    return (
        stats
        .filter(F.col("_n") > 1)  # size>1 guard, 01_var_market_etl.py:177
        .select(F.col("_cd").alias("date"), "vol_avg", "vol_cov")
    )


def train_models(
    stock_rets: DataFrame, features_df: DataFrame, model_cut: str | None = None
) -> DataFrame:
    """Per-ticker OLS of stock returns on non-linear market features.

    02_var_model.py:82-154: as-of join each ticker's return series to
    the latest market features (J5, partitioned by ticker), expand
    features (F10), fit per group (A6). Output: (ticker, weights).
    """
    if model_cut is not None:
        stock_rets = stock_rets.filter(F.col("date") < F.lit(model_cut))
        features_df = features_df.filter(F.col("date") < F.lit(model_cut))
    joined = asof_join(stock_rets, features_df, on="date")
    training = joined.filter(F.col("right_features").isNotNull()).select(
        "ticker",
        "return",
        nonlinear_features("right_features").alias("x"),
    )
    return fit_ols_per_group(training, "ticker", "x", "return")


def run_date_spine(
    spark: SparkSession, start: str, end: str, step_days: int = 7
) -> DataFrame:
    """Weekly run-date spine (03_var_monte_carlo.py:18-20) — F.sequence,
    not driver pandas."""
    return spark.sql(
        f"""
        SELECT explode(sequence(
            to_date('{start}'), to_date('{end}'),
            interval {step_days} days)) AS run_date
        """
    ).select(F.col("run_date").cast("timestamp").alias("run_date"))


def simulate(
    volatility: DataFrame, run_dates: DataFrame, runs: int
) -> DataFrame:
    """Latest volatility per run date (as-of) → seeded MC trials.

    03_var_monte_carlo.py:30-87. Output: (date, trial_id, features).
    """
    vol_at = asof_join(
        run_dates, volatility, on="run_date", right_on="date"
    ).filter(F.col("right_vol_avg").isNotNull())
    vol = vol_at.select(
        F.col("run_date").alias("date"),
        F.col("right_vol_avg").alias("vol_avg"),
        F.col("right_vol_cov").alias("vol_cov"),
    )
    return simulate_trials(vol, runs=runs)


def score_trials(
    simulated: DataFrame, weights: DataFrame, n_factors: int | None = None
) -> DataFrame:
    """Simulated market states × instruments → predicted returns.

    03_var_monte_carlo.py:93-109: the ticker fan-out is the broadcast
    weights join itself (no separate cross join needed — every weights
    row replicates every market state), and scoring is the native
    predictor, so the widest stage (dates × trials × tickers) never
    leaves codegen.
    """
    return score(
        simulated.crossJoin(F.broadcast(weights.select("ticker"))),
        weights,
        group_col="ticker",
        feature_col="features",
        out_col="return",
        expand=True,
        n_factors=n_factors,
    ).select("date", "ticker", "trial_id", "return")


def aggregate_var(
    scored: DataFrame,
    portfolio: DataFrame,
    confidence: float = 99.0,
    group_cols: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """Slice-and-dice VaR (04_var_aggregation.py:35-123).

    scored (date, ticker, trial_id, return) ⋈ portfolio weights →
    per-trial weighted portfolio return → per-(date[, slice])
    percentile. Two shuffles: (date, slice, trial) partial-sum hash agg
    (map-side combined), then the small per-date percentile agg.
    """
    group_cols = group_cols or []
    weighted = scored.join(F.broadcast(portfolio), "ticker").withColumn(
        "_wr", F.col("return") * F.col("weight")
    )
    per_trial = weighted.groupBy("date", *group_cols, "trial_id").agg(
        F.sum("_wr").alias("_pr")
    )
    return per_trial.groupBy("date", *group_cols).agg(
        value_at_risk_expr("_pr", confidence, approximate).alias("var_99"),
        F.avg("_pr").alias("mean_return"),
    )


def backtest(
    stock_rets: DataFrame,
    portfolio: DataFrame,
    var_series: DataFrame,
    basel_days: int = 250,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Basel compliance (05_var_compliance.py:84-120): actual weighted
    P&L as-of-joined to the latest VaR, trailing-window breach count,
    zone.

    ``partition_cols`` (e.g. ``["portfolio_id"]``, supplied by the
    portfolio frame and present in ``var_series``) partitions every
    stage — the P&L aggregation, the as-of join, and the 250-day range
    window — so a multi-portfolio backtest scales out instead of
    degenerating to the reference's single-task global sort (SURVEY §4).
    Unpartitioned, the series is one row per date (≈250 rows/year): a
    single task is the *correct* plan, not a bottleneck.
    """
    keys = list(partition_cols or [])
    actual = (
        stock_rets.join(F.broadcast(portfolio), "ticker")
        .groupBy(*keys, "date")
        .agg(F.sum(F.col("return") * F.col("weight")).alias("return"))
    )
    joined = asof_join(
        actual,
        var_series.select(*keys, "date", "var_99"),
        on="date",
        by=keys,
    ).filter(F.col("right_var_99").isNotNull())
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(epoch_seconds("date"))
        .rangeBetween(-basel_days * 86_400, 0)
    )
    breaches = F.sum(
        F.when(F.col("return") <= F.col("right_var_99"), 1).otherwise(0)
    ).over(w)
    return joined.select(
        *keys,
        "date",
        "return",
        F.col("right_var_99").alias("var_99"),
        breaches.alias("breaches"),
        basel_zone(breaches).alias("basel_zone"),
    )


def run_pipeline(
    spark: SparkSession,
    stocks: DataFrame,
    indicators: DataFrame,
    portfolio: DataFrame,
    cfg: VarConfig,
    model_cut: str | None = None,
    sim_start: str | None = None,
    sim_end: str | None = None,
    materialize: bool = False,
) -> dict[str, DataFrame]:
    """End-to-end: ETL → volatility → models → simulate → VaR → backtest.

    ``materialize=True`` (r17, guide §2.4 — the spine-checkpoint
    pattern extended): eagerly localCheckpoint the three BOUNDED,
    high-fanout intermediates that lazy evaluation otherwise
    re-derives per reference in the composed plan —

    - ``feats`` (one row per date): consumed by the volatility range
      join (both sides) AND the model fit's as-of join — 3 references,
      each re-running the pivot + per-factor lag windows;
    - ``weights`` (one row per ticker): the scoring stage references
      it twice and the backtest's as-of union doubles that — the OLS
      applyInPandas fit appeared FOUR times in the composed physical
      plan;
    - ``var_series`` (one row per run date): the backtest as-of union
      references it twice — the entire simulate→score→aggregate chain
      (incl. the Monte-Carlo pandas UDF) executed twice.

    localCheckpoint, never persist: blocks tie to these DataFrames'
    RDD identity, so a fresh run_pipeline call recomputes from source
    (no cross-run plan-fragment cache). Default False keeps the
    composition fully lazy for callers that only consume one stage.
    """
    factor_cols = list(cfg.factor_cols)
    rets = stock_returns(stocks)
    feats = market_features(indicators, factor_cols)
    if materialize:
        feats = feats.localCheckpoint(eager=True)
    vol = trailing_volatility(feats, cfg.volatility_days)
    weights = train_models(rets, feats, model_cut)
    if materialize:
        weights = weights.localCheckpoint(eager=True)
    bounds = stocks.agg(
        F.min("date").alias("mn"), F.max("date").alias("mx")
    ).first()
    spine = run_date_spine(
        spark,
        sim_start or str(bounds.mn)[:10],
        sim_end or str(bounds.mx)[:10],
    )
    sims = simulate(vol, spine, cfg.runs)
    scored = score_trials(sims, weights, n_factors=len(factor_cols))
    var_series = aggregate_var(scored, portfolio, cfg.confidence)
    if materialize:
        var_series = var_series.localCheckpoint(eager=True)
    compliance = backtest(rets, portfolio, var_series, cfg.basel_days)
    return {
        "returns": rets,
        "features": feats,
        "volatility": vol,
        "weights": weights,
        "simulations": sims,
        "scored": scored,
        "var": var_series,
        "backtest": compliance,
    }


def fused_portfolio_weights(
    weights: DataFrame,
    portfolio: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pre-combine per-ticker model weights into portfolio(-slice) weights.

    The per-ticker predictor is linear in the (ticker-independent)
    expanded features, and the portfolio return is linear in ticker
    returns, so they commute:

        Σ_t w_t · (b0_t + Σ_i b_it·f_i)  =  B0_g + Σ_i B_ig·f_i
        where  B_g = Σ_{t∈g} w_t · b_t   (element-wise)

    One tiny aggregation (instruments × weight-dim) replaces the entire
    dates × trials × tickers scoring fan-out — at reference scale,
    30.2 M rows collapse to the 1.12 M simulated states. The reference
    cannot do this: its per-ticker scoring goes through an opaque
    MLflow pyfunc (03_var_monte_carlo.py:98-109), so the linearity is
    invisible to its planner.
    """
    from value_at_risk_spark.functions.vector import scale_vector
    from value_at_risk_spark.operators.vector_agg import vector_sum_zipwith

    group_cols = group_cols or []
    j = weights.join(portfolio, "ticker").select(
        *group_cols,
        F.lit(1).alias("_g"),
        scale_vector("weights", "weight").alias("_wv"),
    )
    combined = vector_sum_zipwith(j, [*group_cols, "_g"], "_wv", out_col="weights")
    return combined.drop("_g")


def aggregate_var_fused(
    sims: DataFrame,
    weights: DataFrame,
    portfolio: DataFrame,
    confidence: float = 99.0,
    group_cols: list[str] | None = None,
    approximate: bool = False,
    n_factors: int | None = None,
) -> DataFrame:
    """Portfolio(-slice) VaR straight from simulated market states.

    Exact same result as score_trials → aggregate_var for linear
    per-ticker models (asserted in tests), with the wide scoring stage
    algebraically eliminated: each simulated state is scored once per
    portfolio slice with the pre-combined weights — no per-ticker
    fan-out, no 30 M-row shuffle.
    """
    from value_at_risk_spark.functions.features import (
        nonlinear_features,
        predict_nonlinear,
    )

    group_cols = group_cols or []
    gw = fused_portfolio_weights(weights, portfolio, group_cols)
    fan = sims.crossJoin(F.broadcast(gw))
    port = fan.select(
        "date",
        *group_cols,
        "trial_id",
        predict_nonlinear(
            "weights",
            nonlinear_features("features", dim=n_factors),
            dim=(4 * n_factors if n_factors is not None else None),
        ).alias("_pr"),
    )
    return port.groupBy("date", *group_cols).agg(
        value_at_risk_expr("_pr", confidence, approximate).alias("var_99"),
        F.avg("_pr").alias("mean_return"),
    )
