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


def nonlinear_features(factors: Column | str, dim: int | None = None) -> Column:
    """array<double> of 4·n expanded features from an n-factor array.

    Per factor x: [x, sign(x)·x², x³, sign(x)·√|x|]
    (utils/var_utils.py:47-55; test expectation
    tests/tests_utils.py:28-30: [1,4] → [1,1,1,1,4,16,64,2]).

    With ``dim`` (factor count known at plan-build time) the expansion
    unrolls to a flat ``array(...)`` constructor over ``element_at``
    terms — codegen-compiled, vs the interpreted ``flatten(transform)``
    HOF form (same values, same order, same IEEE arithmetic).
    """
    factors = F.col(factors) if isinstance(factors, str) else factors
    if dim is not None:
        terms = []
        for i in range(1, dim + 1):
            x = F.element_at(factors, i)
            terms += [
                x,
                F.signum(x) * F.pow(x, 2),
                F.pow(x, 3),
                F.signum(x) * F.sqrt(F.abs(x)),
            ]
        return F.array(*terms)
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


def predict_nonlinear(
    weights: Column | str, features: Column | str, dim: int | None = None
) -> Column:
    """weights[0] + Σ weights[i+1]·features[i] (utils/var_utils.py:58-62).

    The engine's replacement for the reference's MLflow pyfunc scoring
    UDF (02_var_model.py:172-183). Two forms:

    - ``dim`` known (the hot path — the VaR pipeline knows its factor
      count at plan-build time): the dot product UNROLLS to flat
      ``element_at(w,i)·element_at(f,i)`` arithmetic, which whole-stage
      codegen compiles. Higher-order functions are interpreted per row
      in Spark — on the 30 M-row scoring stage the HOF form runs ~20×
      slower than the unrolled form (measured: 291 s → 14 s).
    - ``dim`` unknown: the generic ``aggregate(zip_with(...))`` HOF
      expression (correct for any width, interpreted).
    """
    weights = F.col(weights) if isinstance(weights, str) else weights
    features = F.col(features) if isinstance(features, str) else features
    if dim is not None:
        # Same fold order as the HOF form below (products accumulated
        # from 0.0, intercept added LAST): FP addition is non-associative,
        # so matching the order keeps the two forms bit-identical.
        acc: Column = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.element_at(weights, i + 1) * F.element_at(features, i)
        return acc + F.element_at(weights, 1)
    tail = F.slice(weights, 2, F.size(weights) - 1)
    return (
        F.aggregate(
            F.zip_with(tail, features, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + weights[0]
    )
