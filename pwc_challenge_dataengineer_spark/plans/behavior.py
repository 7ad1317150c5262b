"""User-behavior analytics over the events stream (beyond-reference surface).

The reference's behavioral analytics stop at cohort month buckets
(src/etl/gold/spark_gold.py:169-198) and 24 h purchase velocity
(src/streaming/realtime_analytics_ml.py:997-1022). These two are the standard
next steps a product-analytics warehouse runs at scale:

- funnel_stages      ordered view→click→purchase funnel (operators/funnel.py)
- user_retention_7d  day-N retention matrix by first-seen cohort date
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.funnel import funnel
from ..schemas import load_table
from .catalog import register


@register(
    "funnel_stages",
    oracle="""
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts >= s0.t
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
        WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    counts AS (
                  SELECT 0 AS stage_index, 'view' AS stage, COUNT(*) AS users FROM s0
        UNION ALL SELECT 1, 'click', COUNT(*) FROM s1
        UNION ALL SELECT 2, 'purchase', COUNT(*) FROM s2
    )
    SELECT stage_index, stage, users,
           CAST(users AS DOUBLE)
               / CAST(lag(users) OVER (ORDER BY stage_index) AS DOUBLE)
               AS conversion_from_prev,
           CAST(users AS DOUBLE)
               / CAST(first_value(users) OVER (ORDER BY stage_index) AS DOUBLE)
               AS conversion_from_first
    FROM counts
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click-after-view → purchase-after-click conversion funnel."""
    events = load_table(spark, sf_dir, "events")
    return funnel(events, ["view", "click", "purchase"])


@register(
    "user_retention_7d",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY 1
    ),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    ret AS (
        SELECT f.cohort_date,
               CAST(date_diff('day', f.cohort_date, a.d) AS INT) AS day_n,
               COUNT(*) AS active_users
        FROM first_seen f JOIN activity a ON f.user_id = a.user_id
        WHERE date_diff('day', f.cohort_date, a.d) BETWEEN 0 AND 7
        GROUP BY 1, 2
    ),
    cohort_size AS (
        SELECT cohort_date, COUNT(*) AS cohort_users FROM first_seen GROUP BY 1
    )
    SELECT r.cohort_date, r.day_n, r.active_users, c.cohort_users,
           CAST(r.active_users AS DOUBLE) / CAST(c.cohort_users AS DOUBLE)
               AS retention
    FROM ret r JOIN cohort_size c ON r.cohort_date = c.cohort_date
    """,
)
def user_retention_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N (0..7) retention by first-seen cohort date.

    Two aggregations sharing the user_id shuffle key (first-seen and
    distinct active-days both partial-aggregate map-side), one shuffle join
    on user_id, then a tiny cohort-keyed join. COUNT(DISTINCT user) is
    avoided: activity is pre-distinct'd per (user, day), so the retention
    count is a plain COUNT(*) — no second expand/shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    ret = (
        first_seen.join(activity, "user_id")
        .withColumn("day_n", F.datediff("d", "cohort_date"))
        .filter(F.col("day_n").between(0, 7))
        .groupBy("cohort_date", "day_n")
        .agg(F.count("*").alias("active_users"))
    )
    cohort_size = first_seen.groupBy("cohort_date").agg(
        F.count("*").alias("cohort_users")
    )
    return ret.join(cohort_size, "cohort_date").select(
        "cohort_date",
        "day_n",
        "active_users",
        "cohort_users",
        (
            F.col("active_users").cast("double")
            / F.col("cohort_users").cast("double")
        ).alias("retention"),
    )


@register(
    "ewma_user_value",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(list_reduce(
               list(value ORDER BY ts, event_id),
               (acc, x) -> 0.7::DOUBLE * acc + 0.3::DOUBLE * x), 6)
               AS ewma_last
    FROM events GROUP BY 1
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value
    (alpha=0.3), computed as a genuinely sequential fold inside
    applyInPandas — the template for order-dependent per-key state that no
    relational operator expresses (reference analog: the running ML
    feature state of src/streaming/realtime_analytics_ml.py, batch form).
    The oracle replays the identical IEEE recursion with DuckDB's
    list_reduce, so even this stateful loop is hash-verified, not
    rows-only: y_t = 0.7*y_{t-1} + 0.3*x_t, seeded with the first value,
    same float ops in the same order on both engines.

    Scale: one shuffle on user_id; each group's fold is O(n) in a single
    Arrow batch. A key whose history exceeds one batch graduates to
    transformWithState/applyInPandasWithState (streaming/stateful.py) —
    same recursion, checkpointed."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        y = None
        for x in pdf["value"].astype("float64"):
            y = x if y is None else 0.7 * y + 0.3 * x
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma_last": [round(y, 6)],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(fold, "user_id bigint, n_events bigint, ewma_last double")


@register(
    "event_pattern_match",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events GROUP BY 1
    )
    SELECT user_id,
           CAST(length(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'vp')) AS INT) AS n_view_then_buy,
           regexp_matches(seq, 'v.*c.*p') AS converted_path
    FROM seqs
    """,
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining over each user's ordered event stream — the
    MATCH_RECOGNIZE-style operator warehouses bolt on for path analysis,
    expressed relationally: collapse the stream to one ordered initials
    string per user (collect_list + array_sort with full tiebreakers, so
    the sequence is deterministic), then regexp for (a) immediate
    view→purchase adjacencies and (b) the view…click…purchase conversion
    subsequence. Complements funnel_stages: the funnel counts stage
    reachability, this classifies each user's full path shape. One
    shuffle (the groupBy); the regex runs once per user, not per event."""
    events = load_table(spark, sf_dir, "events")
    seqs = events.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("ini"),
                        )
                    )
                ),
                lambda s: s["ini"],
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("int").alias("seq_len"),
        F.regexp_count("seq", F.lit("vp")).cast("int").alias("n_view_then_buy"),
        F.col("seq").rlike("v.*c.*p").alias("converted_path"),
    )
