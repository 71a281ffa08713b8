"""Runtime bloom-filter join pruning — engine-side data skipping.

The reference narrows Monte-Carlo scans by partition-key slicing on its
Delta tables (/root/reference/03_var_monte_carlo.py:158 "extract
specific slices of the data"). The Spark-native generalization is
Catalyst's InjectRuntimeFilter: when one side of a shuffle equi-join
carries a selective predicate, the optimizer builds a bloom filter over
that side's join keys at runtime and pushes a ``might_contain`` filter
into the OTHER side's scan — rows that cannot match are dropped before
the shuffle, which at 100 TB is the difference between shuffling the
whole fact table and shuffling the ~matching slice.

Spark 4 enables the rule by default, but the application-side scan must
exceed ``applicationSideScanSizeThreshold`` (default 10 GiB) before the
optimizer considers the bloom filter worth its build cost — correct at
cluster scale, and exactly why a local test never sees it fire. This
module scopes the thresholds down so the injection is demonstrable and
plan-assertable at any SF; production jobs should keep the defaults and
simply rely on the rule once scans cross the real threshold.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_SCOPED_CONFS = {
    # consider any-size application scan (default 10 GiB)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the default 10 MiB creation-side cap: the filter is only
    # built over the SELECTIVE (small) side, never a full fact table
}


@contextmanager
def runtime_bloom_filters(spark: SparkSession):
    """Scope bloom-filter injection thresholds down to local scale;
    restores prior values on exit (exception-safe)."""
    old: dict[str, str | None] = {}
    for k, v in _SCOPED_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def plan_has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True when the optimized plan carries an injected runtime bloom
    filter (a ``bloom_filter_agg`` build + ``might_contain`` probe)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "might_contain" in plan and "bloom_filter_agg" in plan
