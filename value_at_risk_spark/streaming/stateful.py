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
from pyspark.sql import functions as F
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


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Arbitrary-stateful sessionization with event-time TIMEOUT — the
    applyInPandasWithState twin of the native session_window path
    (streaming/windows.session_windows_stream), demonstrating the part
    the native operator hides: explicit state (open session per user)
    plus watermark-driven timeout eviction.

    Per user: events extend the open session while within ``gap``
    of its last event (end-inclusive, matching the native operator's
    merge rule); a larger gap closes and emits the old session. The
    still-open session is emitted (and its state cleared) when the
    watermark passes ``last + gap`` — via ``GroupStateTimeout
    .EventTimeTimeout``, so state size stays bounded by active users
    within the watermark horizon. Callers must set ``withWatermark``
    upstream.

    Output rows are CLOSED sessions only (append-mode friendly):
    (user_id, sess_start_s, sess_end_s, n_events), end = last + gap,
    matching session_window's window.end.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []

        gap_ms = gap_seconds * 1000

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((start, last, n))
                state.remove()
        else:
            # millisecond event times: keeps the end-inclusive merge
            # decision aligned with native session_window semantics
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(
                    int(v) for v in (pdf["ts"].astype("int64") // 1_000_000)
                )
            ts.sort()
            if ts:
                if state.exists:
                    start, last, n = state.get
                else:
                    start, last, n = ts[0], ts[0] - gap_ms - 1, 0
                for t in ts:
                    if t - last <= gap_ms:
                        last = max(last, t)
                        n += 1
                    else:
                        if n > 0:
                            closed.append((start, last, n))
                        start, last, n = t, t, 1
                state.update((start, last, n))
                # Evict once the watermark passes session close. Spark
                # rejects a timeout <= current watermark (killing the
                # query), which would happen if a row later than the
                # watermark by more than the gap ever reached this
                # function. On pyspark 4.1.2 the engine pre-filters such
                # late rows (pinned in test_sessionize_stateful_survives_
                # late_event), making that unreachable — the clamp is
                # defense-in-depth against version/config drift and a
                # no-op whenever last + gap > watermark.
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(last + gap_ms, wm_ms + 1))

        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "sess_start_s": [c[0] // 1000 for c in closed],
                "sess_end_s": [(c[1] + gap_ms) // 1000 for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, sess_start_s long, sess_end_s long, n_events long"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_basel_backtest(
    pnl: DataFrame, basel_days: int = 250
) -> DataFrame:
    """Incremental Basel compliance — the streaming twin of
    plans.var_pipeline.backtest, realizing the incremental operation
    the reference only anticipates (application.yaml:2-3,
    01_var_market_etl.py:159 "each insert ... joined with last X
    days").

    Input stream: (series, d: date, return, var_99) daily portfolio
    P&L rows with their VaR threshold. Per series, state holds only
    the trailing ``basel_days`` window as parallel (day, is_breach)
    arrays — new days append, days older than the horizon evict, and
    each incoming day emits (series, d, breaches, basel_zone) with
    EXACTLY the batch semantics: breaches = count of trailing returns
    <= var_99 within [d - basel_days, d], zone via the reference's
    code-normative bounds (<=3 green, <10 yellow; utils/var_udf.py:
    22-30). State per key = one int+bool pair per trailing day —
    bounded, independent of stream length.

    Rows must arrive in event-time order per series across batches
    (one file/day in practice); within a batch any order is fine.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            days, flags = ([*state.get[0]], [*state.get[1]])
        else:
            days, flags = [], []

        rows = []
        batch = []
        for pdf in pdfs:
            for d, r, v in zip(pdf["_day"], pdf["return"], pdf["var_99"]):
                batch.append((int(d), float(r), float(v)))
        batch.sort()
        for d, r, v in batch:
            days.append(d)
            flags.append(r <= v)
            while days and days[0] < d - basel_days:
                days.pop(0)
                flags.pop(0)
            breaches = sum(flags)
            zone = 0 if breaches <= 3 else (1 if breaches < 10 else 2)
            rows.append((key[0], d, breaches, zone))

        state.update((days, flags))
        yield pd.DataFrame(
            {
                "series": [r[0] for r in rows],
                "day_num": [r[1] for r in rows],
                "breaches": [r[2] for r in rows],
                "basel_zone": [r[3] for r in rows],
            }
        )

    prepared = pnl.select(
        "series",
        F.unix_date(F.col("d").cast("date")).alias("_day"),
        "return",
        "var_99",
    )
    return prepared.groupBy("series").applyInPandasWithState(
        fn,
        outputStructType=(
            "series string, day_num long, breaches long, basel_zone int"
        ),
        stateStructType="days array<long>, flags array<boolean>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    tokens: DataFrame, k: int = 20, nshards: int = 16
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters — the incremental twin of
    the batch two-pass operator (operators/heavyhitters.py).

    Tokens shard by hash into ``nshards`` state keys; each shard keeps
    a bounded MG summary (<= k counters) across micro-batches. A batch
    first reduces to its exact per-token counts (vectorized
    value_counts — an exact summary), then MG-MERGES into the state:
    combine counts, and if more than k counters survive, subtract the
    (k+1)-th largest count from all and drop the non-positive — the
    standard mergeable-summary step, which preserves the guarantee
    that any token whose true count in the shard exceeds
    shard_total/(k+1) is present in the summary. A token lives in
    exactly one shard, so the union of shard summaries is a guaranteed
    superset of every token with global count > total/(k+1)
    (shard_total <= total). State per shard: two arrays of length
    <= k — bounded forever, regardless of stream length or vocabulary.

    Emits each shard's current summary every batch (update mode),
    stamped with ``batch_seq`` — a per-shard invocation counter carried
    in state — so a consumer selects each shard's LATEST summary by
    ``max(batch_seq)``, a contract, instead of relying on sink scan
    order matching insertion order. The exact-verify pass over the
    candidate union stays a batch job, as in the two-pass batch
    operator.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        toks, cnts, nb = state.get if state.exists else ([], [], 0)
        counters = dict(zip(toks, (int(c) for c in cnts)))
        for pdf in pdfs:
            for t, w in pdf["token"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(w)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        nb = int(nb) + 1
        state.update(
            (list(counters.keys()), [int(v) for v in counters.values()], nb)
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "batch_seq": [nb],
                "tokens": [list(counters.keys())],
                "counts": [[int(v) for v in counters.values()]],
            }
        )

    sharded = tokens.withColumn(
        "_shard", (F.abs(F.xxhash64("token")) % nshards).cast("int")
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        fn,
        outputStructType=(
            "shard int, batch_seq long, "
            "tokens array<string>, counts array<long>"
        ),
        stateStructType="toks array<string>, cnts array<long>, nb long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_totals(
    df: DataFrame, key_col: str = "user_id", val_col: str = "value"
) -> DataFrame:
    """Per-key running totals on Spark 4's ``transformWithStateInPandas``
    — the modern stateful-processor API (typed state handles, timers,
    initial-state support) that supersedes ``applyInPandasWithState``'s
    tuple-state contract.

    One ``ValueState`` per key carries (total, count) across
    micro-batches; every batch emits the key's updated totals, so a
    consumer's LAST emit per key is the running aggregate to date.
    State is two scalars per key — bounded by key cardinality, never
    stream length. The skeleton generalizes: swap the state type and
    fold for TTL dedup (MapState + timers) or windowed accumulators
    (ListState).

    ENV GUARD: the API's state server speaks protobuf
    (pyspark.sql.streaming.proto), which this container does not ship
    — without it the driver worker crashes mid-query with an opaque
    STREAM_FAILED, so refuse LOUDLY up front instead.
    ``running_event_totals`` (applyInPandasWithState) provides the
    same contract on the older API."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "streaming_running_totals: transformWithStateInPandas "
            "requires the protobuf package, absent in this "
            "environment — use running_event_totals "
            "(applyInPandasWithState) for the same running-aggregate "
            "contract"
        ) from None
    import pandas as pd  # noqa: F811 — worker-side import

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "total double, cnt bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            total, cnt = 0.0, 0
            if self._totals.exists():
                got = self._totals.get()
                total, cnt = float(got[0]), int(got[1])
            for pdf in rows:
                total += float(pdf[val_col].sum())
                cnt += int(len(pdf))
            self._totals.update((total, cnt))
            yield pd.DataFrame(
                {key_col: [key[0]], "total": [total], "n": [cnt]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=f"{key_col} long, total double, n bigint",
        outputMode="Update",
        timeMode="None",
    )
