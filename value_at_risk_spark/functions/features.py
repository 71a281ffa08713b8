"""Non-linear feature expansion + linear predictor (SURVEY §2.8 F10-F11).

Reference does both driver-side / inside a pyfunc model:
- feature expansion per factor x → ``[x, sign(x)·x², x³, sign(x)·√|x|]``
  (``/root/reference/utils/var_utils.py:47-55``)
- predictor ``ps[0] + Σ ps[i+1]·fs[i]``
  (``/root/reference/utils/var_utils.py:58-62``, applied through an
  MLflow pyfunc Spark UDF at ``02_var_model.py:219-220``).

Here both are native higher-order-function expressions: the scoring path
is a broadcast join of a weights table + this expression — no model
registry, no Python boundary, fully Catalyst-visible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nonlinear_features(factors: Column | str) -> Column:
    """array<double> of 4·n expanded features from an n-factor array.

    Per factor x: [x, sign(x)·x², x³, sign(x)·√|x|]
    (utils/var_utils.py:47-55; test expectation
    tests/tests_utils.py:28-30: [1,4] → [1,1,1,1,4,16,64,2]).
    """
    factors = F.col(factors) if isinstance(factors, str) else factors
    return F.flatten(
        F.transform(
            factors,
            lambda x: F.array(
                x,
                F.signum(x) * F.pow(x, 2),
                F.pow(x, 3),
                F.signum(x) * F.sqrt(F.abs(x)),
            ),
        )
    )


def predict_nonlinear(weights: Column | str, features: Column | str) -> Column:
    """weights[0] + Σ weights[i+1]·features[i] (utils/var_utils.py:58-62).

    ``aggregate(zip_with(tail(w), f, *), 0.0, +) + w[0]`` — a native dot
    product; the engine's replacement for the reference's MLflow pyfunc
    scoring UDF (02_var_model.py:172-183).
    """
    weights = F.col(weights) if isinstance(weights, str) else weights
    features = F.col(features) if isinstance(features, str) else features
    tail = F.slice(weights, 2, F.size(weights) - 1)
    return (
        F.aggregate(
            F.zip_with(tail, features, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + weights[0]
    )
