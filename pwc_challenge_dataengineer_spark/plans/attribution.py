"""Marketing-attribution queries over the events stream (beyond-reference).

The reference's behavioral layer stops at funnels and cohort buckets
(src/etl/gold/spark_gold.py:169-198); revenue attribution is the natural
next ask of the same event stream. Two standard models:

- attribution_last_touch   each purchase's revenue credits the LAST
  non-purchase touchpoint the user hit before buying ('direct' when none).
- attribution_first_touch  all of a user's purchase revenue credits the
  user's very first touchpoint (acquisition-channel view).

Scale posture: both are one user-keyed window (single shuffle on user_id,
~events/user rows per partition) followed by a low-cardinality hash
aggregate on channel (map-side combined). No self-joins, no driver state.
Float parity: purchase values aggregate as DECIMAL(18,2) and convert to
double once (see plans/_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from .catalog import register


@register(
    "attribution_last_touch",
    oracle="""
    WITH touched AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_channel
        FROM events
    )
    SELECT COALESCE(prev_channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS attributed_revenue
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    preceding non-purchase event type of the same user (ts, event_id
    total order), 'direct' when the purchase is the user's first touch.
    One window + one tiny aggregate — a single user_id shuffle."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = events.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("prev_channel"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("prev_channel", F.lit("direct")).alias("channel")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
    )


@register(
    "attribution_first_touch",
    oracle="""
    WITH seq AS (
        SELECT event_type, value,
               first_value(event_type)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS first_channel
        FROM events
    )
    SELECT first_channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS attributed_revenue
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch (acquisition) attribution: every purchase a user makes
    credits the user's first-ever event type. Same single-shuffle shape as
    last-touch; the window is unbounded-preceding first_value, which Spark
    evaluates without buffering the full frame."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        "value",
        F.first("event_type").over(w).alias("first_channel"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("first_channel")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
    )
