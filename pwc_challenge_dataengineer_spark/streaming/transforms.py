"""Shared stream transforms (batch/stream symmetric).

Reference: the silver stream cleaning+enrichment
(src/streaming/realtime_silver_processor.py:684-856) reimplements the batch
silver logic; here ONE function library serves both (the functions/ package
works on any DataFrame), plus the stream-only pieces:

- ``dedup_within_watermark``: the reference deduplicates a stream with an
  unbounded row_number window (realtime_silver_processor.py:576-605), which
  is unsound on an infinite stream (state grows forever and row_number over
  a stream is not well-defined). The idiomatic fix is
  ``dropDuplicatesWithinWatermark`` — keep-first per key within the
  late-data horizon (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.enrichment import clean_customer_id, detect_return, line_total, risk_score


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def silver_clean_events(df: DataFrame) -> DataFrame:
    """Stream/batch-symmetric silver cleaning for transaction events
    (null-normalize, derive line_total, return flag, risk score, customer-id
    cleanup — reference :756-856)."""
    qty = F.coalesce(F.col("quantity"), F.lit(0))
    price = F.coalesce(F.col("unit_price"), F.lit(0.0))
    amount = line_total(qty, price)
    is_ret = detect_return(qty, F.col("description"))
    return (
        df.withColumn("customer_id", clean_customer_id(F.col("customer_id")))
        .withColumn("line_total", amount)
        .withColumn("is_return", is_ret)
        .withColumn("risk_score", risk_score(amount, qty, is_ret))
        .filter(F.col("invoice_no").isNotNull() & (F.trim("invoice_no") != ""))
    )


def stream_static_enrich(
    stream: DataFrame, reference: DataFrame, keys: list[str], how: str = "left"
) -> DataFrame:
    """Stream–static enrichment join (reference data loaded once per
    micro-batch; Spark auto-broadcasts small static sides —
    realtime_silver_processor.py:478-509 semantics)."""
    return stream.join(reference, keys, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    join_window: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream–stream equi-join bounded by a time window (beyond the
    reference's surface, but core Structured Streaming: both sides buffer in
    the state store; the watermarks + the time-range predicate bound how
    long each side's rows are retained — without the range condition the
    state never expires).

    Matches pairs where right_ts ∈ [left_ts - join_window, left_ts].
    """
    l = left.withWatermark(left_ts, max_delay)
    r = right.withWatermark(right_ts, max_delay)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (l[k] == r[k])
    cond = (
        cond
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {join_window}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, how)
