from value_at_risk_spark.operators.asof import asof_join  # noqa: F401
from value_at_risk_spark.operators.windows import (  # noqa: F401
    trailing_range_window,
)
from value_at_risk_spark.operators.vector_agg import vector_sum  # noqa: F401
from value_at_risk_spark.operators.gapfill import forward_fill_spine  # noqa: F401
from value_at_risk_spark.operators.packing import pack_sequences  # noqa: F401
from value_at_risk_spark.operators.sampling import bottom_k_per_group  # noqa: F401
