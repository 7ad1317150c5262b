"""Batch sessionization: gap-based session assignment via lag + cumulative sum.

Reference computes sessions only in streaming (`session_window(ts, "30
minutes")`, src/streaming/realtime_gold_processor.py:550-580); this is the
batch equivalent with identical session semantics (a session extends while
consecutive events are <= gap apart).

Scale: one shuffle on the user key; both windows share the same partitioning
so Catalyst reuses a single sort+exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user) to each event row."""
    order = [F.col(ts_col)] + [F.col(t) for t in tiebreakers or []]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    ).drop("__new")
