from value_at_risk_spark.sources.registry import (  # noqa: F401
    TABLES,
    Registry,
    load_tables,
)
