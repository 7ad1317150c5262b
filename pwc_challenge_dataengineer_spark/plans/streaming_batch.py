"""Streaming operators, batch-checked (SURVEY.md §2.9).

Structured Streaming window functions (`window`, `session_window`) evaluate
identically on batch DataFrames, so the window-agg registry
(streaming/windows.py) is verified here against DuckDB arithmetic oracles;
the streaming-only behaviors (watermark lateness, dropDuplicatesWithin-
Watermark, foreachBatch, triggers) are exercised in tests/test_streaming.py
with availableNow triggers.

- tumbling_hourly     window(ts, '1 hour')  ↔ epoch-aligned date_trunc
- sliding_10m_5m      window(ts, '10m', '5m') ↔ two shifted 5-min buckets
- session_window_30m  session_window(ts, '30m') per user ↔ gap-based
                      sessionization (new session iff gap >= 30 min)
- stream_dedup_first  dropDuplicates keep-first semantics, batch-projected
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from ..streaming.windows import WindowAggSpec, build_window_agg
from .catalog import register


@register(
    "tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    spec = WindowAggSpec(
        name="hourly_by_type",
        kind="tumbling",
        ts_col="ts",
        duration="1 hour",
        group_cols=("event_type",),
        aggs={
            "n_events": "count(*)",
            "total_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
        },
    )
    return build_window_agg(events, spec)


@register(
    "sliding_10m_5m",
    oracle="""
    WITH starts AS (
        SELECT event_id, event_type,
               unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                       time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])
                   AS window_start
        FROM events
    )
    SELECT window_start, window_start + INTERVAL 10 MINUTE AS window_end,
           event_type, COUNT(*) AS n_events
    FROM starts
    GROUP BY 1, 2, 3
    """,
)
def sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event lands in 2 overlapping windows (10-min length, 5-min
    slide); the oracle materializes both epoch-aligned starts explicitly."""
    events = load_table(spark, sf_dir, "events")
    spec = WindowAggSpec(
        name="popularity_10m_5m",
        kind="sliding",
        ts_col="ts",
        duration="10 minutes",
        slide="5 minutes",
        group_cols=("event_type",),
        aggs={"n_events": "count(*)"},
    )
    return build_window_agg(events, spec)


@register(
    "session_window_30m",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 30 MINUTE AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, '30 minutes') per user. Session end = last event +
    gap; a new session starts when the gap is >= the duration (boundary
    event at exactly start+gap does NOT extend)."""
    events = load_table(spark, sf_dir, "events")
    spec = WindowAggSpec(
        name="customer_sessions",
        kind="session",
        ts_col="ts",
        duration="30 minutes",
        group_cols=("user_id",),
        aggs={
            "n_events": "count(*)",
            "session_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
        },
    )
    out = build_window_agg(events, spec)
    return out.select("user_id", "window_start", "window_end", "n_events", "session_value")


@register(
    "stream_dedup_first",
    oracle="""
    SELECT user_id, event_type, ts AS first_ts, event_id
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-FIRST per key — the batch projection of
    dropDuplicatesWithinWatermark semantics (earliest event survives within
    the horizon). The true streaming form runs in tests/test_streaming.py."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("first_ts"), "event_id")
    )


@register(
    "late_arrival_accounting",
    oracle="""
    WITH seq AS (
        SELECT event_id, ts, event_type,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS high_water
        FROM events
    ),
    flagged AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(date_diff('second', ts, high_water) AS BIGINT)
                   AS skew_s
        FROM seq
    )
    SELECT hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN skew_s > 600 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(MAX(skew_s) AS BIGINT) AS max_skew_s,
           ROUND(CAST(SUM(skew_s) AS DOUBLE) / COUNT(*), 2) AS avg_skew_s
    FROM flagged GROUP BY 1
    """,
)
def late_arrival_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness accounting — the measurement that SIZES a
    streaming watermark: replay events in arrival order (event_id is the
    arrival proxy), track the event-time high-water mark, and report per
    event-time hour how many events arrived more than 10 minutes behind
    it plus the worst/average lateness. Run this before choosing
    withWatermark()'s delay and dropDuplicatesWithinWatermark's window
    (streaming/windows.py); an unbounded max_skew_s says the source needs
    reordering or a bigger state budget.

    The running high-water window is per-arrival-sequence — at cluster
    scale arrival order exists per source partition (a Kafka partition),
    so the window partitions by source partition id and this global
    emulation is the single-partition special case. Exact integer
    second-diffs; one double division rounded at 2dp."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seq = events.select(
        "ts", F.max("ts").over(w).alias("high_water")
    )
    flagged = seq.select(
        F.date_trunc("hour", "ts").alias("hour"),
        (
            F.unix_timestamp("high_water") - F.unix_timestamp("ts")
        ).cast("bigint").alias("skew_s"),
    )
    return flagged.groupBy("hour").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("skew_s") > 600, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max("skew_s").cast("bigint").alias("max_skew_s"),
        F.round(
            F.sum("skew_s").cast("double") / F.count("*"), 2
        ).alias("avg_skew_s"),
    )
