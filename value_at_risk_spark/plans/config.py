"""Config loading — SURVEY §2.1 S9.

The reference drives everything from YAML + JSON configs
(/root/reference/config/configure_notebook.py:11-38 loading
application.yaml, portfolio.json, indicators.json). Same contract here:
a frozen VarConfig plus portfolio/indicator loads, with YAML gated
behind an import-try (pyyaml may be absent; JSON configs always work).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from value_at_risk_spark.plans.var_pipeline import VarConfig


def load_yaml_config(path: str) -> dict[str, Any]:
    try:
        import yaml  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "pyyaml not available in this environment; use load_json_config"
        ) from e
    with open(path) as f:
        return yaml.safe_load(f)


def load_json_config(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def var_config_from_dict(cfg: dict[str, Any]) -> VarConfig:
    """application.yaml semantics → VarConfig
    (monte-carlo.runs/volatility, /root/reference/config/application.yaml:24-30)."""
    mc = cfg.get("monte-carlo", {})
    return VarConfig(
        volatility_days=int(mc.get("volatility", 90)),
        runs=int(mc.get("runs", 1000)),
        basel_days=int(cfg.get("basel", {}).get("days", 250)),
        factor_cols=tuple(cfg.get("factors", ())),
    )


def load_portfolio(spark: SparkSession, path: str) -> DataFrame:
    """portfolio.json → (country, company, ticker, industry, weight)
    (config/portfolio.json shape; weights intentionally un-normalized —
    SURVEY §7.11)."""
    rows = load_json_config(path)
    from value_at_risk_spark.sources.local import local_frame

    schema = "country string, company string, ticker string, industry string, weight double"
    cols = [c.split()[0] for c in schema.split(",")]
    return local_frame(
        spark, [tuple(r[c.strip()] for c in cols) for r in rows], schema
    )
