"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps all streaming state inside built-in windowed
aggregations (SURVEY.md §2.9: no mapGroupsWithState anywhere), but its gold
config carries ``state_timeout: "2 hours"`` (realtime_gold_processor.py:121)
— the hook for custom state TTL. This module supplies that missing
capability as an idiomatic Spark operator: per-key running aggregates with
explicit state and processing-time timeout.

Semantics: for each key, maintain (n_events, total_value, max_ts) across
micro-batches; emit the updated snapshot every batch the key appears in;
drop state after ``ttl_ms`` of inactivity (bounded state — the 100 TB
requirement; without TTL a keyed stream's state grows without bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame, ttl_ms: int = 2 * 3600 * 1000
) -> DataFrame:
    """Running per-user event count + value sum with state TTL.

    The value sum accumulates in integer cents inside the state so the
    result is exact regardless of micro-batch boundaries (float accumulation
    across batches would drift vs the batch groupBy oracle).
    """
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, cents = state.get if state.exists else (0, 0.0)
        cents = int(round(cents))
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(float(pdf["value"].sum()) * 100))
        state.update((n, float(cents)))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def running_user_totals_tws(
    events: DataFrame, ttl_ms: int = 2 * 3600 * 1000
) -> DataFrame:
    """Same running per-user totals on Spark 4's ``transformWithStateInPandas``
    (the successor to applyInPandasWithState: typed state handles —
    value/list/map — plus timers, with per-state TTL handled by the runtime
    instead of hand-rolled timeout bookkeeping).

    State = one ValueState tuple (n_events, cents); TTL is declared at
    getValueState time, so expiry needs no timeout branch in user code.
    Exact-cents accumulation as in running_user_totals."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl = ttl_ms

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n_events BIGINT, cents BIGINT", ttlDurationMs=ttl
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._agg.get()
            n, cents = (prev[0], prev[1]) if prev is not None else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(round(float(pdf["value"].sum()) * 100))
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
