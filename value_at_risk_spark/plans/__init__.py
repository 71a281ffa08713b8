from value_at_risk_spark.plans.var_pipeline import (  # noqa: F401
    VarConfig,
    aggregate_var,
    backtest,
    market_features,
    run_pipeline,
    score_trials,
    simulate,
    stock_returns,
    trailing_volatility,
    train_models,
)
