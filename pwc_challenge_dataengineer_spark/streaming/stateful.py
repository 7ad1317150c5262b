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
