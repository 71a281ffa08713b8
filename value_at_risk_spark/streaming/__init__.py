from value_at_risk_spark.streaming.joins import (  # noqa: F401
    interval_join_streams,
)
from value_at_risk_spark.streaming.windows import (  # noqa: F401
    daily_event_aggregates,
    read_events_stream,
    run_available_now,
)
