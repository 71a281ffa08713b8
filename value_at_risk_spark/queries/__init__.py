"""Oracle-twinned query registry (package form of the former
queries.py — split by domain in r15 for findability; the registry,
decorator, and helper namespace are unchanged and live in
``_shared``; importing this package imports every domain module,
which registers its queries as an import side effect)."""

from value_at_risk_spark.queries._shared import *  # noqa: F401,F403
from value_at_risk_spark.queries._shared import __all__  # noqa: F401
from value_at_risk_spark.queries import delta  # noqa: F401,E402
from value_at_risk_spark.queries import vector  # noqa: F401,E402
from value_at_risk_spark.queries import text  # noqa: F401,E402
from value_at_risk_spark.queries import graph  # noqa: F401,E402
from value_at_risk_spark.queries import risk  # noqa: F401,E402
from value_at_risk_spark.queries import core  # noqa: F401,E402
