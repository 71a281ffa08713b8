"""Scale-path sampling reductions — SURVEY §4 / 100 TB design.

``bottom_k_per_group`` is the two-phase form of "k smallest rows per
group" that ``group_sample_deterministic_k`` (one window over the
whole group) promises for the huge-group regime:

1. PARTIAL: an Arrow-batched ``mapInPandas`` pass keeps each batch's
   bottom-k per key — a superset of the true bottom-k (the true k rows
   survive whichever batch they sit in), shrinking every group to at
   most ``k x batches`` rows before any shuffle;
2. FINAL: the ordinary row_number window over the reduced frame.

The shuffle therefore carries ~k rows per (group, input batch) instead
of the full group — the same partial-reduction trick as the Misra-Gries
heavy-hitter pass (operators/heavyhitters.py). Requires a UNIQUE order
column (use a hash of the row id, as the gate query does): ties under
row_number would otherwise break arbitrarily between the two phases.
Equality with the single-window form is pytest-asserted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bottom_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
) -> DataFrame:
    """k rows with the smallest ``order_col`` per group, two-phase."""
    if k <= 0:
        raise ValueError("bottom_k_per_group: k must be positive")

    key_list = list(keys)

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values([*key_list, order_col], kind="mergesort")
                    .groupby(key_list, sort=False)
                    .head(k)
                )

    partial = df.mapInPandas(_partial, schema=df.schema)
    w = Window.partitionBy(*key_list).orderBy(order_col)
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
