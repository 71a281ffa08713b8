"""Custom stateful streaming operator — applyInPandasWithState.

The engine's arbitrary-stateful tier (SURVEY §2.9: the reference only
hints at incremental operation). Pattern: per-key running aggregates
whose state survives across micro-batches — the building block for
streaming versions of the trailing-window VaR inputs (running return
accumulators per instrument).

State size = one row per key; the Arrow boundary moves only the new
micro-batch rows plus the per-key state tuple.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_event_totals(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, total value) across micro-batches."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType="event_type string, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
