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


@register(
    "attribution_path_removal",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touched AS (
        SELECT DISTINCT e.user_id, e.event_type AS channel
        FROM events e JOIN conv c ON e.user_id = c.user_id
        WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
    ),
    per_channel AS (
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_paths_with
        FROM touched GROUP BY 1
    ),
    totals AS (
        SELECT CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_conv,
               CAST(SUM(n_paths_with) AS BIGINT) AS touch_total
        FROM per_channel
    )
    SELECT p.channel, t.n_conv, p.n_paths_with,
           ROUND(CAST(p.n_paths_with AS DOUBLE) / t.n_conv, 6)
               AS removal_share,
           ROUND(CAST(p.n_paths_with AS DOUBLE) / t.touch_total, 6)
               AS weight
    FROM per_channel p, totals t
    """,
)
def attribution_path_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-removal attribution: for each channel, the share of converting
    users whose pre-conversion path contains that channel (the conversions
    'at risk' if the channel were removed — the path-counting
    approximation of a Markov removal effect), plus weights normalized
    across channels. Complements first/last-touch above: position-blind,
    whole-path credit.

    One shuffle to first-purchase times, one distinct over (user, channel)
    — the path never materializes as a string, so arbitrarily long
    histories cost nothing extra. Exact integer counts; two IEEE
    divisions on identical operands."""
    events = load_table(spark, sf_dir, "events")
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touched = (
        events.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    per_channel = touched.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_paths_with")
    )
    totals = per_channel.agg(
        F.sum("n_paths_with").cast("bigint").alias("touch_total")
    ).crossJoin(conv.agg(F.count("*").cast("bigint").alias("n_conv")))
    return per_channel.crossJoin(F.broadcast(totals)).select(
        "channel",
        "n_conv",
        "n_paths_with",
        F.round(
            F.col("n_paths_with").cast("double") / F.col("n_conv"), 6
        ).alias("removal_share"),
        F.round(
            F.col("n_paths_with").cast("double") / F.col("touch_total"), 6
        ).alias("weight"),
    )
