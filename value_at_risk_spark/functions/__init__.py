from value_at_risk_spark.functions.returns import (  # noqa: F401
    log_return,
    log_returns_over,
)
from value_at_risk_spark.functions.risk import (  # noqa: F401
    basel_zone,
    count_breaches,
    expected_shortfall_expr,
    value_at_risk_expr,
)
from value_at_risk_spark.functions.features import (  # noqa: F401
    nonlinear_features,
    predict_nonlinear,
)
from value_at_risk_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    scale_vector,
    vector_add,
)
