from __future__ import annotations

import json

from value_at_risk_spark.plans.config import (
    load_json_config,
    load_portfolio,
    var_config_from_dict,
)


def test_var_config_from_dict():
    cfg = var_config_from_dict(
        {
            "monte-carlo": {"runs": 32000, "volatility": 90},
            "basel": {"days": 250},
            "factors": ["SP500", "NYSE"],
        }
    )
    assert cfg.runs == 32000
    assert cfg.volatility_days == 90
    assert cfg.basel_days == 250
    assert cfg.factor_cols == ("SP500", "NYSE")


def test_load_portfolio(spark, tmp_path):
    p = tmp_path / "portfolio.json"
    rows = [
        {
            "country": "US",
            "company": "Acme",
            "ticker": "ACM",
            "industry": "Widgets",
            "weight": 1 / 29,
        }
    ]
    p.write_text(json.dumps(rows))
    df = load_portfolio(spark, str(p))
    r = df.first()
    assert (r.ticker, r.country, r.industry) == ("ACM", "US", "Widgets")
    assert abs(r.weight - 1 / 29) < 1e-12
    assert load_json_config(str(p)) == rows
