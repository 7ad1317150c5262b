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
from pyspark.sql.window import Window

from ..operators.funnel import funnel
from ..operators.sessionize import sessionize
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


@register(
    "max_concurrent_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    intervals AS (
        SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
        FROM sess GROUP BY 1, 2
    ),
    sweep AS (
        SELECT s AS t, 1 AS delta FROM intervals
        UNION ALL SELECT e, -1 FROM intervals
    ),
    running AS (
        SELECT t, delta,
               SUM(delta) OVER (ORDER BY t, delta DESC
                                ROWS UNBOUNDED PRECEDING) AS concurrency
        FROM sweep
    )
    SELECT CAST(t AS DATE) AS day,
           CAST(MAX(concurrency) AS INT) AS max_concurrent
    FROM running GROUP BY 1
    """,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the interval sweep: sessionize
    (30-min gap, same semantics as the `sessionization` query), collapse
    each session to [start, end], emit +1/-1 endpoint events, and take the
    running sum ordered by (time, +1 before -1) so coincident start/end
    counts as overlap — the standard concurrency/occupancy operator.
    Within a timestamp tie the running sum is monotone, so the per-day max
    is order-deterministic without further tiebreakers. The sweep is
    2x|sessions| rows; its global window is the measurement-scale
    formulation — at 100 TB partition the sweep by day and add a
    carried-in count of sessions spanning midnight (same monoid)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    sess = sessionize(events, "user_id", "ts", gap_minutes=30,
                      tiebreakers=["event_id"])
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    sweep = intervals.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        intervals.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy(F.asc("t"), F.desc("delta")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = sweep.withColumn("concurrency", F.sum("delta").over(w))
    return running.groupBy(F.col("t").cast("date").alias("day")).agg(
        F.max("concurrency").cast("int").alias("max_concurrent")
    )


@register(
    "itemset_pairs_support",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events)
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_cooccur,
           round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n.n_users), 6) AS support
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    CROSS JOIN n
    GROUP BY 1, 2
    """,
)
def itemset_pairs_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining, the 2-itemset pass: per event-type pair,
    how many users exhibit both (support). This is the first (and at k=2,
    usually only affordable) level of Apriori/FP-growth on behavioral
    data; the pre-distinct (user, item) projection keeps the self-join at
    |users| x |itemsets-per-user choose 2| — item vocabularies are small,
    so the pair explosion is bounded per user, and the heavy lifting is
    one user-keyed shuffle. Complements basket_features (per-customer
    stats) with the cross-population co-occurrence view."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    n = events.agg(F.count_distinct("user_id").alias("n_users"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("item_a"),
        F.col("b.event_type").alias("item_b"),
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_cooccur"))
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "n_cooccur",
            F.round(
                F.col("n_cooccur").cast("double") / F.col("n_users"), 6
            ).alias("support"),
        )
    )


@register(
    "ab_test_zscore",
    oracle="""
    WITH agg AS (
        SELECT
            CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END) AS BIGINT) AS n_ctrl,
            CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END) AS BIGINT) AS n_treat,
            CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                                     AND value > 200 THEN user_id END) AS BIGINT) AS conv_ctrl,
            CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                                     AND value > 200 THEN user_id END) AS BIGINT) AS conv_treat
        FROM events
    )
    SELECT n_ctrl, n_treat, conv_ctrl, conv_treat,
           CAST(conv_ctrl AS DOUBLE) / n_ctrl AS p_ctrl,
           CAST(conv_treat AS DOUBLE) / n_treat AS p_treat,
           (CAST(conv_treat AS DOUBLE) / n_treat - CAST(conv_ctrl AS DOUBLE) / n_ctrl)
           / sqrt((CAST(conv_ctrl + conv_treat AS DOUBLE) / (n_ctrl + n_treat))
                  * (1 - CAST(conv_ctrl + conv_treat AS DOUBLE) / (n_ctrl + n_treat))
                  * (CAST(1 AS DOUBLE) / n_ctrl + CAST(1 AS DOUBLE) / n_treat))
               AS z_score
    FROM agg
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B split (variant = user_id parity,
    conversion = a high-value purchase, value > 200 — every user has SOME
    purchase in the synthetic data, which would pool to p=1 and a zero
    standard error): the experimentation primitive every growth stack
    computes. One pass of conditional distinct counts, then
    closed-form pooled z. Every float op after the exact integer counts is
    a division/multiply/sqrt of identical operands in identical order —
    sqrt is IEEE correctly-rounded in both engines — so even the test
    statistic hash-matches. At scale the distinct counts are the only
    shuffle (4 conditional aggregates share one pass)."""
    events = load_table(spark, sf_dir, "events")
    is_ctrl = F.col("user_id") % 2 == 0
    is_conv = (F.col("event_type") == "purchase") & (F.col("value") > 200)
    agg = events.agg(
        F.count_distinct(F.when(is_ctrl, F.col("user_id"))).cast("bigint").alias("n_ctrl"),
        F.count_distinct(F.when(~is_ctrl, F.col("user_id"))).cast("bigint").alias("n_treat"),
        F.count_distinct(F.when(is_ctrl & is_conv, F.col("user_id")))
        .cast("bigint")
        .alias("conv_ctrl"),
        F.count_distinct(F.when(~is_ctrl & is_conv, F.col("user_id")))
        .cast("bigint")
        .alias("conv_treat"),
    )
    p_ctrl = F.col("conv_ctrl").cast("double") / F.col("n_ctrl")
    p_treat = F.col("conv_treat").cast("double") / F.col("n_treat")
    p_pool = (F.col("conv_ctrl") + F.col("conv_treat")).cast("double") / (
        F.col("n_ctrl") + F.col("n_treat")
    )
    se = F.sqrt(
        p_pool
        * (F.lit(1) - p_pool)
        * (
            F.lit(1).cast("double") / F.col("n_ctrl")
            + F.lit(1).cast("double") / F.col("n_treat")
        )
    )
    return agg.select(
        "n_ctrl",
        "n_treat",
        "conv_ctrl",
        "conv_treat",
        p_ctrl.alias("p_ctrl"),
        p_treat.alias("p_treat"),
        ((p_treat - p_ctrl) / se).alias("z_score"),
    )


@register(
    "distinct_users_7d",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS uday, user_id FROM events)
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
    FROM days JOIN pairs ON uday BETWEEN day - 6 AND day
    GROUP BY day
    """,
)
def distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — the windowed
    COUNT(DISTINCT) that plain window frames can't express (distinct isn't
    decomposable over frames). Implemented as the scale-correct expansion:
    pre-distinct (day, user) pairs, then a banded spine join multiplies
    the data by at most 7, and one hash aggregate finishes it. The
    sketch-based alternative for when exactness can yield is
    hll_distinct_users (mergeable registers; union the 7 daily sketches
    instead of re-joining)."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(F.col("ts").cast("date").alias("day")).distinct()
    pairs = events.select(
        F.col("ts").cast("date").alias("uday"), "user_id"
    ).distinct()
    return (
        days.join(
            pairs,
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("users_7d"))
    )


@register(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    islands AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                          AS INT) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island,
               CAST(COUNT(*) AS BIGINT) AS streak_len,
               MIN(day) AS streak_start
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           MAX(streak_len) AS longest_streak,
           MIN(streak_start) AS first_active_day
    FROM streaks GROUP BY user_id
    """,
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user via the
    classic date-minus-row_number island key (pure integer/date
    arithmetic — exact in both engines). Distinct (user, day) first so
    the window runs over at most |users| x |days| rows, then two hash
    aggregates. The canonical sequence-analytics operator that
    sessionization (time-gap based) doesn't cover: calendar-grain
    continuity."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("bigint").alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
        F.min("streak_start").alias("first_active_day"),
    )


@register(
    "forward_fill_value",
    oracle="""
    WITH masked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT user_id, event_id,
           v IS NULL AS was_gap,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM masked
    """,
)
def forward_fill_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward) per user: error
    events report no reading (masked to NULL here — the synthetic table
    has no physical NULLs), and each gap inherits the most recent
    non-null value. This is the IGNORE NULLS window form — the one
    LAST_VALUE variant plain frames don't give you by default — via
    Spark's last(col, ignorenulls=True) over an unbounded-preceding
    frame. Values pass through unchanged (no arithmetic), so parity is
    exact. One shuffle on user_id; the running state is O(1) per
    partition at any scale."""
    events = load_table(spark, sf_dir, "events")
    masked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return masked.select(
        "user_id",
        "event_id",
        F.col("v").isNull().alias("was_gap"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    counts AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM counts
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: count (current, next) adjacent pairs via a lead() window with
    full tiebreakers, then row-normalize into transition probabilities.
    The behavioral-model primitive behind next-action prediction and
    anomalous-path scoring. Integer counts; each probability divides the
    same two exact integers. One user-keyed sort window + one tiny
    aggregate; the normalizing window runs over the 25-cell matrix."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(wrow).cast("double")
        ).alias("p"),
    )


@register(
    "new_vs_returning_daily",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY 1
    ),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT a.day,
           CAST(COUNT(CASE WHEN a.day = f.first_day THEN 1 END) AS BIGINT)
               AS new_users,
           CAST(COUNT(CASE WHEN a.day > f.first_day THEN 1 END) AS BIGINT)
               AS returning_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1
    """,
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the first chart on every
    product dashboard. Pre-distinct (user, day) activity joined to each
    user's first-seen day, classified by comparison, two conditional
    counts. Both aggregations share the user_id shuffle key and the
    final aggregate runs on |days| groups."""
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    activity = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("day") == F.col("first_day"), 1))
            .cast("bigint")
            .alias("new_users"),
            F.count(F.when(F.col("day") > F.col("first_day"), 1))
            .cast("bigint")
            .alias("returning_users"),
        )
    )


@register(
    "power_user_share",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT user_id, n_events,
               CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_users
        FROM per_user
    )
    SELECT MAX(n_users) AS n_users,
           CAST(COUNT(CASE WHEN rn <= (n_users + 99) // 100 THEN 1 END)
                AS BIGINT) AS n_power_users,
           CAST(SUM(CASE WHEN rn <= (n_users + 99) // 100 THEN n_events
                         ELSE 0 END) AS BIGINT) AS power_events,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(SUM(CASE WHEN rn <= (n_users + 99) // 100 THEN n_events
                         ELSE 0 END) AS DOUBLE) / SUM(n_events)
               AS power_share
    FROM ranked
    """,
)
def power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user concentration: what share of all events comes from the
    top 1% most-active users (ceil(n/100) by exact rank, user_id
    tiebreak). The engagement-inequality companion to gini_by_nation,
    computed with integer ranks and counts end-to-end; the single
    division at the end is deterministic. The global rank runs over
    |users| pre-aggregated rows, not raw events."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events")
    )
    w = Window.orderBy(F.desc("n_events"), "user_id")
    ranked = per_user.select(
        "user_id",
        "n_events",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n_users"),
    )
    is_power = F.col("rn") <= F.expr("(n_users + 99) div 100")
    return ranked.agg(
        F.max("n_users").alias("n_users"),
        F.count(F.when(is_power, 1)).cast("bigint").alias("n_power_users"),
        F.sum(F.when(is_power, F.col("n_events")).otherwise(0))
        .cast("bigint")
        .alias("power_events"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        (
            F.sum(F.when(is_power, F.col("n_events")).otherwise(0)).cast("double")
            / F.sum("n_events")
        ).alias("power_share"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_buy
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t_view
        WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    lags AS (
        SELECT p.user_id,
               CAST(floor(epoch(p.t_buy)) AS BIGINT)
                   - CAST(floor(epoch(v.t_view)) AS BIGINT) AS lag_s
        FROM p JOIN v ON p.user_id = v.user_id
    ),
    ranked AS (
        SELECT user_id, lag_s,
               CAST(row_number() OVER (ORDER BY lag_s, user_id) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM lags
    )
    SELECT MAX(n) AS n_converted,
           MIN(lag_s) AS min_s,
           MAX(lag_s) AS max_s,
           CAST(SUM(lag_s) AS DOUBLE) / MAX(n) AS avg_s,
           MIN(CASE WHEN rn = (n + 1) // 2 THEN lag_s END) AS p50_s
    FROM ranked
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the view->purchase funnel: per
    user, seconds from first view to first purchase at-or-after it, then
    min/avg/max and an exact discrete median by position pick. Completes
    funnel_stages (which counts WHO converts) with HOW FAST. Epoch-second
    arithmetic is integer-exact; the avg is one division of identical
    operands. Two min-aggregates share the user shuffle; the global rank
    runs over |converted users|."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        events.join(v, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_view"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    lags = p.join(v, "user_id").select(
        "user_id",
        (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view"))
        .cast("bigint")
        .alias("lag_s"),
    )
    ranked = lags.select(
        "lag_s",
        F.row_number().over(Window.orderBy("lag_s", "user_id")).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    return ranked.agg(
        F.max("n").alias("n_converted"),
        F.min("lag_s").alias("min_s"),
        F.max("lag_s").alias("max_s"),
        (F.sum("lag_s").cast("double") / F.max("n")).alias("avg_s"),
        F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("lag_s"))).alias(
            "p50_s"
        ),
    )


@register(
    "cuped_adjusted_lift",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                             THEN CAST(value AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DECIMAL(18,2)) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                             THEN CAST(value AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DECIMAL(18,2)) AS y
        FROM events GROUP BY 1, 2
    ),
    pooled AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx
        FROM per_user
    ),
    theta AS (
        SELECT n, sx,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS th
        FROM pooled
    )
    SELECT CAST(p.variant AS INT) AS variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(p.y) AS DOUBLE) / COUNT(*) AS mean_y,
           CAST(SUM(p.y) AS DOUBLE) / COUNT(*)
             - ANY_VALUE(t.th)
               * (CAST(SUM(p.x) AS DOUBLE) / COUNT(*)
                  - ANY_VALUE(t.sx) / ANY_VALUE(t.n)) AS mean_y_cuped
    FROM per_user p CROSS JOIN theta t
    GROUP BY p.variant
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout: adjust each
    variant's outcome mean (second-half-of-month spend) by
    theta * (pre-period mean - global pre-period mean), with theta =
    cov(x,y)/var(x) estimated from pooled exact-decimal moment sums —
    the standard trick that cuts experiment variance using pre-exposure
    behavior. Per-user totals re-cast to DECIMAL(18,2) (scale already 2,
    so no rounding) keep the cross-moments inside the 38-digit cap;
    every post-aggregation float op is the identical expression tree in
    both engines. Complements ab_test_zscore: same split, adjusted
    estimator."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    zero = F.lit(0).cast("decimal(18,2)")
    vdec = F.col("value").cast("decimal(18,2)")
    per_user = events.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.sum(F.when(F.col("ts") < cutoff, vdec).otherwise(zero))
        .cast("decimal(18,2)")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, vdec).otherwise(zero))
        .cast("decimal(18,2)")
        .alias("y"),
    )
    pooled = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    theta = pooled.select(
        "n",
        "sx",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("th"),
    )
    mean_y = F.sum("y").cast("double") / F.count("*")
    mean_x = F.sum("x").cast("double") / F.count("*")
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy(F.col("variant").cast("int").alias("variant"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            mean_y.alias("mean_y"),
            (
                mean_y
                - F.any_value("th") * (mean_x - F.any_value("sx") / F.any_value("n"))
            ).alias("mean_y_cuped"),
        )
    )


@register(
    "twap_user_value",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, ts, event_id,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_ts
        FROM events
    ),
    spans AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,2)) AS v,
               CAST(floor(epoch(next_ts)) AS BIGINT)
                   - CAST(floor(epoch(ts)) AS BIGINT) AS dur_s
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_secs,
           CAST(SUM(v * CAST(dur_s AS DECIMAL(10,0))) AS DOUBLE) / SUM(dur_s)
               AS twap
    FROM spans GROUP BY user_id
    """,
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each reading is
    weighted by how long it stayed current (until the next event), the
    estimator that de-biases irregular sampling — a burst of readings in
    one minute no longer dominates a quiet day. Complements
    ewma_user_value (recency weighting) with duration weighting. The
    value x duration products stay decimal x integer = exact; the final
    division is one double op. One user-keyed window + one aggregate on
    the same key — a single shuffle."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    spans = seq.select(
        "user_id",
        "v",
        (F.unix_timestamp("next_ts") - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("dur_s"),
    )
    return spans.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum("dur_s").cast("bigint").alias("total_secs"),
        (
            F.sum(F.col("v") * F.col("dur_s").cast("decimal(10,0)")).cast("double")
            / F.sum("dur_s")
        ).alias("twap"),
    )


@register(
    "itemset_triples_support",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events)
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           c.event_type AS item_c,
           CAST(COUNT(*) AS BIGINT) AS n_cooccur,
           round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n.n_users), 6) AS support
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN ut c ON b.user_id = c.user_id AND b.event_type < c.event_type
    CROSS JOIN n
    GROUP BY 1, 2, 3
    """,
)
def itemset_triples_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k=3 Apriori level: support of event-type triples per user
    population, extending itemset_pairs_support one join deeper. The
    a<b<c canonical ordering dedups permutations; both self-joins stay
    on the user_id shuffle key, so the chain is co-partitioned — the
    per-user blowup is (items-per-user choose 3), bounded by the tiny
    item vocabulary, never by |events|."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    n = events.agg(F.count_distinct("user_id").alias("n_users"))
    a, b, c = ut.alias("a"), ut.alias("b"), ut.alias("c")
    triples = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .join(
            c,
            (F.col("b.user_id") == F.col("c.user_id"))
            & (F.col("b.event_type") < F.col("c.event_type")),
        )
        .select(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
            F.col("c.event_type").alias("item_c"),
        )
    )
    return (
        triples.groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").alias("n_cooccur"))
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "item_c",
            F.col("n_cooccur").cast("bigint").alias("n_cooccur"),
            F.round(
                F.col("n_cooccur").cast("double") / F.col("n_users"), 6
            ).alias("support"),
        )
    )


@register(
    "dau_mau_stickiness",
    oracle="""
    WITH dau AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM events GROUP BY 1
    ),
    mau AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(dau) AS BIGINT) AS dau_days_sum,
           ANY_VALUE(mau) AS mau,
           (CAST(SUM(dau) AS DOUBLE) / COUNT(*)) / ANY_VALUE(mau)
               AS stickiness
    FROM dau CROSS JOIN mau
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness: average daily active users divided by monthly
    actives — the engagement-frequency ratio on every growth dashboard
    (the events table spans one month, so MAU is the global distinct).
    Two distinct-count aggregates; the ratio divides deterministic
    integer-derived doubles. At scale the daily distincts shuffle on
    (day) after per-partition partial distinct; the HLL-sketch variant
    (hll_distinct_users) is the approximate fallback."""
    events = load_table(spark, sf_dir, "events")
    dau = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    mau = events.agg(F.count_distinct("user_id").cast("bigint").alias("mau"))
    return dau.crossJoin(F.broadcast(mau)).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("dau_days_sum"),
        F.any_value("mau").alias("mau"),
        (
            (F.sum("dau").cast("double") / F.count("*")) / F.any_value("mau")
        ).alias("stickiness"),
    )


@register(
    "association_rules",
    oracle="""
    WITH ut AS MATERIALIZED (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
    marg AS MATERIALIZED (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM ut GROUP BY 1
    ),
    pairs AS (
        SELECT a.event_type AS ante, b.event_type AS cons,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type <> b.event_type
        GROUP BY 1, 2
    )
    SELECT p.ante, p.cons, p.n_both,
           round(CAST(p.n_both AS DOUBLE) / ma.n_item, 6) AS confidence,
           round(CAST(p.n_both AS DOUBLE) * n.n_users
                 / (ma.n_item * mc.n_item), 6) AS lift
    FROM pairs p
    JOIN marg ma ON p.ante = ma.event_type
    JOIN marg mc ON p.cons = mc.event_type
    CROSS JOIN n
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules ante -> cons over per-user event-type
    baskets: confidence = P(cons | ante) and lift =
    P(both) / (P(ante) P(cons)) — the rule-scoring pass that turns
    itemset_pairs_support's level-2 itemsets into actionable rules
    (market-basket / next-action recommendation). Both directions are
    emitted because confidence is asymmetric.

    Same bounded self-join as the support pass (per-user pair explosion is
    |itemsets-per-user|^2 over a small vocabulary), then two broadcast
    joins against the item marginals and one against the scalar user
    count. Counts are exact BIGINTs; confidence and lift are single
    divisions of identical integer operands in both engines, so the 6-dp
    round is parity-safe. At 100 TB the (user, item) distinct projection
    map-side combines before its one shuffle, and the vocabulary-sized
    marginals always broadcast."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    ut = ut.localCheckpoint(eager=False)  # 3 consumers: pairs x2 + marginals
    n = ut.agg(F.count_distinct("user_id").alias("n_users"))
    marg = ut.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_item"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    ma = marg.select(F.col("event_type").alias("ante"), F.col("n_item").alias("n_a"))
    mc = marg.select(F.col("event_type").alias("cons"), F.col("n_item").alias("n_c"))
    return (
        pairs.join(F.broadcast(ma), "ante")
        .join(F.broadcast(mc), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ante",
            "cons",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_c")),
                6,
            ).alias("lift"),
        )
    )


_PI_ITERS = 3


def _stationary_oracle() -> str:
    head = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    counts AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    p AS MATERIALIZED (
        SELECT from_type, to_type,
               CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM counts
    ),
    ns AS (SELECT CAST(COUNT(DISTINCT from_type) AS BIGINT) AS k FROM p),
    pi0 AS (
        SELECT DISTINCT from_type AS state, 1.0 / ns.k AS prob
        FROM p CROSS JOIN ns
    )"""
    steps = []
    for i in range(1, _PI_ITERS + 1):
        steps.append(f"""
    pi{i} AS (
        SELECT p.to_type AS state, SUM(pi.prob * p.p) AS prob
        FROM p JOIN pi{i - 1} pi ON p.from_type = pi.state
        GROUP BY 1
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT state, round(prob, 6) AS stationary_prob FROM pi{_PI_ITERS}
    """
    )


@register("markov_stationary_events", oracle=_stationary_oracle())
def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run state occupancy of the behavioral Markov chain: power
    iteration pi_{{k+1}} = pi_k P (3 rounds from uniform) over the same
    row-stochastic transition matrix event_transition_matrix builds — the
    'where do user journeys settle' summary behind engagement-mix
    forecasting, and the stochastic-matrix sibling of pagerank_bipartite
    (same iterate-join-aggregate shape, no damping because the empirical
    chain is already stochastic on its observed support).

    The matrix is |event-types|^2 cells (vocabulary-sized, broadcast);
    each iteration is one broadcast join + one |states|-row aggregate, so
    at 100 TB the only data-sized work is the one lead() window that
    builds the counts. The per-state float sum reorders across engines at
    ~1e-16; the 6-dp round pins it (pagerank precedent)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    wp = Window.partitionBy("from_type")
    p = counts.select(
        "from_type",
        "to_type",
        (F.col("n").cast("double") / F.sum("n").over(wp).cast("double")).alias(
            "p"
        ),
    )
    p = p.localCheckpoint(eager=False)  # reused every iteration
    ns = p.agg(F.countDistinct("from_type").alias("k"))
    pi = (
        p.select(F.col("from_type").alias("state"))
        .distinct()
        .crossJoin(F.broadcast(ns))
        .select("state", (F.lit(1.0) / F.col("k")).alias("prob"))
    )
    for _ in range(_PI_ITERS):
        pi = (
            p.join(F.broadcast(pi), p.from_type == pi.state)
            .groupBy(F.col("to_type").alias("state_next"))
            .agg(F.sum(F.col("prob") * F.col("p")).alias("prob"))
            .select(F.col("state_next").alias("state"), "prob")
        )
    return pi.select("state", F.round("prob", 6).alias("stationary_prob"))


# Support threshold = ceil(5% of distinct users), exact integer arithmetic
# ((n + 19) // 20) so it bites identically at every SF.


@register(
    "itemset_triples_support",
    oracle=f"""
    WITH ut AS MATERIALIZED (SELECT DISTINCT user_id, event_type FROM events),
    th AS (SELECT (CAST(COUNT(DISTINCT user_id) AS BIGINT) + 19) // 20 AS s
           FROM ut),
    pairs AS MATERIALIZED (
        SELECT a.event_type AS i1, b.event_type AS i2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
        HAVING COUNT(*) >= (SELECT s FROM th)
    ),
    cand AS (
        -- Apriori candidate generation: join frequent pairs sharing the
        -- first item, then prune candidates whose third side (i2, i3)
        -- is not itself a frequent pair.
        SELECT p1.i1, p1.i2 AS i2, p2.i2 AS i3
        FROM pairs p1 JOIN pairs p2
          ON p1.i1 = p2.i1 AND p1.i2 < p2.i2
        WHERE EXISTS (SELECT 1 FROM pairs p3
                      WHERE p3.i1 = p1.i2 AND p3.i2 = p2.i2)
    ),
    counts AS (
        SELECT c.i1, c.i2, c.i3, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM cand c
        JOIN ut a ON a.event_type = c.i1
        JOIN ut b ON b.user_id = a.user_id AND b.event_type = c.i2
        JOIN ut d ON d.user_id = a.user_id AND d.event_type = c.i3
        GROUP BY 1, 2, 3
    ),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut)
    SELECT c.i1, c.i2, c.i3, c.n_users AS n_cooccur,
           round(CAST(c.n_users AS DOUBLE) / n.n_users, 6) AS support
    FROM counts c CROSS JOIN n
    WHERE c.n_users >= (SELECT s FROM th)
    """,
)
def itemset_triples_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori level 3: frequent event-type TRIPLES with the real
    candidate-generation prune — triples are built only by joining
    frequent pairs that share their first item, then pruned unless every
    2-subset is frequent (the downward-closure property that makes
    Apriori tractable at scale: candidate count is bounded by the
    frequent-pair count squared over the vocabulary, never |users| x
    |items|^3). Counting joins the candidate list (broadcast — it is
    vocabulary-sized) against the distinct (user, item) projection three
    times, all on the user key — one shuffle family. Completes the
    itemset ladder: itemset_pairs_support (k=2) -> association_rules
    (rule scoring) -> this (k=3)."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    ut = ut.localCheckpoint(eager=False)  # 4 consumers
    a, b = ut.alias("a"), ut.alias("b")
    th = ut.agg(
        ((F.count_distinct("user_id").cast("bigint") + 19) / 20)
        .cast("bigint")
        .alias("s")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("i1"), F.col("b.event_type").alias("i2")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .crossJoin(F.broadcast(th))
        .filter(F.col("n") >= F.col("s"))
        .select("i1", "i2", "n")
    )
    p1, p2, p3 = pairs.alias("p1"), pairs.alias("p2"), pairs.alias("p3")
    cand = (
        p1.join(
            p2,
            (F.col("p1.i1") == F.col("p2.i1"))
            & (F.col("p1.i2") < F.col("p2.i2")),
        )
        .join(
            p3,
            (F.col("p3.i1") == F.col("p1.i2"))
            & (F.col("p3.i2") == F.col("p2.i2")),
            "left_semi",
        )
        .select(
            F.col("p1.i1").alias("i1"),
            F.col("p1.i2").alias("i2"),
            F.col("p2.i2").alias("i3"),
        )
    )
    ua, ub, ud = ut.alias("ua"), ut.alias("ub"), ut.alias("ud")
    counts = (
        ua.join(F.broadcast(cand), F.col("ua.event_type") == F.col("i1"))
        .join(
            ub,
            (F.col("ub.user_id") == F.col("ua.user_id"))
            & (F.col("ub.event_type") == F.col("i2")),
        )
        .join(
            ud,
            (F.col("ud.user_id") == F.col("ua.user_id"))
            & (F.col("ud.event_type") == F.col("i3")),
        )
        .groupBy("i1", "i2", "i3")
        .agg(F.count("*").cast("bigint").alias("n_cooccur"))
        .crossJoin(F.broadcast(th))
        .filter(F.col("n_cooccur") >= F.col("s"))
        .select("i1", "i2", "i3", "n_cooccur")
    )
    n = ut.agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    return counts.crossJoin(F.broadcast(n)).select(
        "i1",
        "i2",
        "i3",
        "n_cooccur",
        F.round(
            F.col("n_cooccur").cast("double") / F.col("n_users"), 6
        ).alias("support"),
    )


@register(
    "next_event_prediction_eval",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    trans AS (
        SELECT ts, event_type AS from_type, next_type AS to_type
        FROM seq WHERE next_type IS NOT NULL
    ),
    span AS (
        SELECT MIN(ts) AS t0,
               MIN(ts) + to_microseconds(
                   CAST(CAST(date_diff('microsecond', MIN(ts), MAX(ts))
                             AS BIGINT) * 4 // 5 AS BIGINT)) AS cutoff
        FROM trans
    ),
    train AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM trans CROSS JOIN span WHERE trans.ts < span.cutoff
        GROUP BY 1, 2
    ),
    model AS (
        SELECT from_type, to_type AS predicted_to FROM (
            SELECT from_type, to_type,
                   row_number() OVER (PARTITION BY from_type
                                      ORDER BY n DESC, to_type) AS rk
            FROM train
        ) WHERE rk = 1
    ),
    test AS (
        SELECT from_type, to_type
        FROM trans CROSS JOIN span WHERE trans.ts >= span.cutoff
    )
    SELECT t.from_type, m.predicted_to,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN t.to_type = m.predicted_to THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(CAST(SUM(CASE WHEN t.to_type = m.predicted_to
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS accuracy
    FROM test t JOIN model m ON t.from_type = m.from_type
    GROUP BY 1, 2
    """,
)
def next_event_prediction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtested evaluation of the first-order Markov next-event
    predictor: train the per-state argmax on the first 80% of the
    transition timeline (exact-microsecond cutoff), score hit@1 on the
    held-out tail — the eval harness that turns event_transition_matrix
    from a descriptive statistic into a measured model (compare accuracy
    against the majority-class floor to see if sequence context helps).
    Temporal (not random) splitting is the leakage-correct choice for
    sequence models, mirroring leakage_safe_split's cluster discipline.

    One lead() window builds transitions; train/test are pure predicates
    on a broadcast scalar cutoff; the model is a vocabulary-sized argmax
    (rank-1 pick with lexicographic ties). Integer-exact counts; one
    division per row."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "ts",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    trans = trans.localCheckpoint(eager=False)  # 3 consumers
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = trans.agg(
        F.min(t_us).alias("t0_us"), F.max(t_us).alias("t1_us")
    ).select(
        (
            F.col("t0_us")
            + F.expr("(CAST((t1_us - t0_us) AS BIGINT) * 4) div 5")
        ).alias("cutoff_us")
    )
    with_cut = trans.crossJoin(F.broadcast(span)).select(
        "from_type", "to_type", (t_us < F.col("cutoff_us")).alias("is_train")
    )
    train = (
        with_cut.filter("is_train")
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rk = Window.partitionBy("from_type").orderBy(F.desc("n"), "to_type")
    model = (
        train.select("from_type", "to_type", F.row_number().over(rk).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("predicted_to"))
    )
    test = with_cut.filter(~F.col("is_train")).select("from_type", "to_type")
    hit = F.when(F.col("to_type") == F.col("predicted_to"), 1).otherwise(0)
    return (
        test.join(F.broadcast(model), "from_type")
        .groupBy("from_type", "predicted_to")
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.sum(hit).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(hit).cast("double") / F.count("*"), 6
            ).alias("accuracy"),
        )
    )


_REC_K = 3
_REC_MIN_CO = 2  # support prune on co-purchase pairs (triangle_count precedent)


@register(
    "item_item_cf_recs",
    oracle=f"""
    WITH ut AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS user_id, l_partkey AS item
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    item_n AS MATERIALIZED (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ),
    co AS (
        SELECT a.item AS i, b.item AS j, CAST(COUNT(*) AS BIGINT) AS n_ij
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.item <> b.item
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_REC_MIN_CO}
    ),
    sim AS MATERIALIZED (
        SELECT co.i, co.j,
               CAST(co.n_ij AS DOUBLE)
               / (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE)))
                   AS s
        FROM co
        JOIN item_n ni ON co.i = ni.item
        JOIN item_n nj ON co.j = nj.item
    ),
    scores AS (
        SELECT u.user_id, sim.j AS item,
               SUM(sim.s) AS score, CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM ut u JOIN sim ON u.item = sim.i
        WHERE NOT EXISTS (
            SELECT 1 FROM ut h
            WHERE h.user_id = u.user_id AND h.item = sim.j
        )
        GROUP BY 1, 2
    )
    SELECT user_id, item, n_sources,
           round(score, 6) AS score,
           CAST(rk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY round(score, 6) DESC, item) AS rk
        FROM scores
    ) WHERE rk <= {_REC_K}
    """,
)
def item_item_cf_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering, the workhorse recommender, on
    the customer <- co-purchase -> part graph: item similarity =
    co-occurrence cosine over binary customer vectors (n_ij /
    sqrt(n_i n_j), support-pruned at 2 co-buyers — the same
    hairball-prune as triangle_count), each customer's score for an
    UNSEEN part = sum of similarities from the parts they bought; top-3
    per customer with deterministic ties (6-dp-rounded score then item).
    The anti-join on purchase history is the 'don't recommend what they
    already buy' filter.

    Scale posture: the pruned similarity matrix is the shuffled side of
    one item-keyed join from the (customer, item) projection (at 100 TB
    it is NOT broadcastable and this is the standard item-CF shuffle),
    followed by a per-customer aggregate and a top-k window — the
    candidate fan-out per owned item is bounded by that item's pruned
    co-purchase degree. Ranking compares the same 6-dp-rounded doubles
    in both engines (the cosine_topk idiom)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ut = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
    )
    ut = ut.localCheckpoint(eager=False)  # 4 consumers
    item_n = ut.groupBy("item").agg(F.count("*").cast("bigint").alias("n"))
    # Support-prune BEFORE the pair join (r14): n_ij <= min(n_i, n_j), so
    # an item with fewer than _REC_MIN_CO distinct buyers can never pass
    # the n_ij >= _REC_MIN_CO filter below — dropping those rows from BOTH
    # pair-join inputs is semantics-free and shrinks the quadratic
    # per-user fan-out at its source (guide §3.2: reduce the big side
    # before the join). The broadcast semi is narrow (no new exchange);
    # at a scale where the frequent-item list outgrows broadcast, the
    # same prune becomes a Bloom filter over item ids (§3.2) — false
    # positives only cost pair rows the n_ij filter still removes.
    freq = item_n.filter(F.col("n") >= _REC_MIN_CO).select("item")
    utf = ut.join(F.broadcast(freq), "item", "left_semi")
    a, b = utf.alias("a"), utf.alias("b")
    # co-occurrence counts are symmetric (binary vectors), so generate each
    # unordered pair ONCE (a.item < b.item) and mirror after the aggregate
    # + support filter: halves the pair fan-out and the (i, j) shuffle
    # (26.3M -> 13.1M pair rows at sf0.1); the mirror union doubles a
    # pruned ~0.4M-row table instead
    co_lt = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("i"), F.col("b.item").alias("j"))
        .agg(F.count("*").cast("bigint").alias("n_ij"))
        .filter(F.col("n_ij") >= _REC_MIN_CO)
    )
    co = co_lt.unionByName(
        co_lt.select(F.col("j").alias("i"), F.col("i").alias("j"), "n_ij")
    )
    ni = item_n.select(F.col("item").alias("i"), F.col("n").alias("n_i"))
    nj = item_n.select(F.col("item").alias("j"), F.col("n").alias("n_j"))
    sim = (
        co.join(ni, "i")
        .join(nj, "j")
        .select(
            "i",
            "j",
            (
                F.col("n_ij").cast("double")
                / (
                    F.sqrt(F.col("n_i").cast("double"))
                    * F.sqrt(F.col("n_j").cast("double"))
                )
            ).alias("s"),
        )
    )
    seen = ut.select(
        F.col("user_id").alias("u2"), F.col("item").alias("j2")
    )
    scores = (
        ut.join(sim, ut.item == sim.i)
        .join(
            seen,
            (F.col("user_id") == F.col("u2")) & (F.col("j") == F.col("j2")),
            "left_anti",
        )
        .groupBy("user_id", F.col("j").alias("rec_item"))
        .agg(
            F.sum("s").alias("score"),
            F.count("*").cast("bigint").alias("n_sources"),
        )
    )
    rk = Window.partitionBy("user_id").orderBy(
        F.desc(F.round("score", 6)), "rec_item"
    )
    return (
        scores.select(
            "user_id",
            F.col("rec_item").alias("item"),
            "n_sources",
            F.round("score", 6).alias("score"),
            F.row_number().over(rk).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= _REC_K)
    )


def _qini_sql(events: str, hash_expr: str) -> str:
    """Shared uplift/Qini SQL body; ``hash_expr`` is the dialect's
    md5->BIGINT spelling with {x} as the key placeholder."""
    h = hash_expr.format(x="user_id")
    return f"""
    WITH users AS (
        SELECT user_id, ({h}) % 2 = 0 AS treated FROM {events} GROUP BY 1
    ),
    score AS (
        SELECT user_id, CAST(COUNT(CASE WHEN event_type = 'click'
                                        THEN 1 END) AS BIGINT) AS s
        FROM {events} WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1
    ),
    outcome AS (
        SELECT user_id,
               CAST(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(18,2)))
                    AS DOUBLE) AS y
        FROM {events}
        WHERE ts >= TIMESTAMP '2024-01-16' AND event_type = 'purchase'
        GROUP BY 1
    ),
    ranked AS (
        SELECT u.user_id, u.treated,
               COALESCE(o.y, 0.0) AS y,
               ntile(10) OVER (ORDER BY COALESCE(s.s, 0) DESC, u.user_id)
                   AS decile
        FROM users u
        LEFT JOIN score s ON u.user_id = s.user_id
        LEFT JOIN outcome o ON u.user_id = o.user_id
    ),
    per_decile AS (
        SELECT decile,
               CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
               CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_c,
               SUM(CASE WHEN treated THEN y ELSE 0.0 END) AS r_t,
               SUM(CASE WHEN NOT treated THEN y ELSE 0.0 END) AS r_c
        FROM ranked GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_t, n_c,
           round(r_t / n_t - r_c / n_c, 6) AS uplift_per_user,
           round(SUM(r_t) OVER w
                 - SUM(r_c) OVER w
                   * (CAST(SUM(n_t) OVER w AS DOUBLE)
                      / CAST(SUM(n_c) OVER w AS DOUBLE)), 6) AS qini_cum
    FROM per_decile
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """


@register(
    "uplift_qini_eval",
    oracle=_qini_sql(
        "events", "('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::BIGINT"
    ),
)
def uplift_qini_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-model evaluation via the Qini curve: users are hash-split
    into treatment/control (the randomized premise uplift modeling
    assumes), scored by pre-period engagement (first-half-of-Jan
    clicks), decile-ranked, and each decile reports incremental value
    per user (treated minus control means) plus the cumulative Qini
    statistic Q(k) = cumR_t - cumR_c * cumN_t/cumN_c — the standard
    targeting-quality read (a good uplift score front-loads positive
    increments). Completes the experimentation suite
    (ab_test_zscore / cuped / diff_in_diff / covariate_adjusted_att)
    with the *targeting* evaluation none of them provide.

    Scale posture: user-grain aggregates + one decile ntile (a range
    sort over |users| scored rows — range-partitioned at scale, same
    shape as rfm_segmentation's scaled path) + a 10-row windowed
    cumulative. Outcome sums are DECIMAL-exact; uplift/Qini carry the
    6-dp pin over identical expressions."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("qini_events")
    return spark.sql(
        _qini_sql(
            "qini_events",
            "CAST(conv(substring(md5(CAST({x} AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)",
        )
    )


def _dwell_sql(events: str, us_diff: str) -> str:
    """Shared process-mining dwell SQL; ``us_diff`` is the dialect's
    microsecond-difference spelling with {a}(earlier)/{b}(later)."""
    gap = us_diff.format(a="ts", b="nxt_ts")
    return f"""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               LEAD(event_type) OVER w AS nxt,
               LEAD(ts) OVER w AS nxt_ts
        FROM {events}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    edges AS (
        SELECT event_type AS src, nxt AS dst,
               CAST({gap} AS BIGINT) AS gap_us,
               user_id, event_id
        FROM seq WHERE nxt IS NOT NULL
    ),
    ranked AS (
        SELECT src, dst, gap_us,
               CAST(row_number() OVER (PARTITION BY src, dst
                        ORDER BY gap_us, user_id, event_id) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY src, dst) AS BIGINT) AS n
        FROM edges
    )
    SELECT src, dst, CAST(MAX(n) AS BIGINT) AS n_transitions,
           CAST(MAX(CASE WHEN rn = (n + 1) / 2 THEN gap_us END)
                AS BIGINT) AS median_gap_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) / 10 THEN gap_us END)
                AS BIGINT) AS p90_gap_us
    FROM ranked
    GROUP BY 1, 2
    """


@register(
    "process_dwell_times",
    oracle=_dwell_sql("events", "date_diff('microsecond', {a}, {b})"),
)
def process_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining bottleneck read: for every directly-follows
    transition in the event log (the edges event_transition_matrix
    counts), the exact lower-median and p90 dwell time in microseconds —
    the numbers that turn a directly-follows graph into a bottleneck
    diagnosis (which step users stall on, and how heavy its tail is).

    Shape: one user-keyed window for the LEAD pairing, one edge-keyed
    rank window, rank-position picks — all integer-exact (microsecond
    gaps, ceil-rank positions in pure integer arithmetic), no floats
    anywhere. At 100 TB both windows partition by real keys (user, then
    the 25-edge grain)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("pd_events")
    return spark.sql(
        _dwell_sql("pd_events", "(unix_micros(CAST({b} AS TIMESTAMP)) - unix_micros(CAST({a} AS TIMESTAMP)))")
    )


def _burstiness_sql(events: str, epochms: str) -> str:
    """Shared burstiness SQL body; ``epochms`` is the dialect's
    timestamp->epoch-milliseconds spelling with {x} placeholder (Spark
    unix_millis vs DuckDB epoch_ms). Gaps are exact BIGINT milliseconds;
    sum-of-squares rides in DECIMAL(38,0) (squared gaps can exceed
    BIGINT); mean/variance/B are single IEEE expressions over the exact
    sums, emitted unrounded."""
    ems = epochms.format(x="ts")
    return f"""
    WITH ordered AS (
        SELECT user_id, CAST({ems} AS BIGINT) AS ms
        FROM {events}
    ),
    gaps AS (
        SELECT user_id,
               ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms)
                   AS g
        FROM ordered
    ),
    stats AS (
        SELECT user_id,
               CAST(COUNT(g) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS sg,
               SUM(CAST(g AS DECIMAL(38,0)) * g) AS sgg
        FROM gaps WHERE g IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(g) >= 5
    )
    SELECT user_id, n AS n_gaps,
           CAST(sg AS DOUBLE) / n / 1000 AS mean_gap_sec,
           sqrt((n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)))
               / n / 1000 AS std_gap_sec,
           (n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
               / n / (CAST(sg AS DOUBLE) * 1000) AS fano_factor_sec,
           (sqrt(n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / n
            - CAST(sg AS DOUBLE) / n)
           / (sqrt(n * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / n
              + CAST(sg AS DOUBLE) / n) AS burstiness
    FROM stats
    """


@register(
    "burstiness_fano",
    oracle=_burstiness_sql("events", "epoch_ms({x})"),
)
def burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user temporal burstiness of the event stream: population
    std/mean of inter-event gaps -> the Goh-Barabasi burstiness index
    B = (sigma - mu)/(sigma + mu) (-1 = perfectly periodic, 0 = Poisson,
    -> 1 = bursty) plus the per-second Fano factor — the
    activity-pattern features behavioral segmentation and bot detection
    feed on. Gaps are exact BIGINT milliseconds via one LAG window per
    user; variance comes from exact integer/decimal sufficient sums, so
    every emitted double is a single deterministic expression.

    Scale: one window + one groupBy, both partitioned by user_id — the
    natural key distribution; no global stage. Reference scope:
    src/analytics behavioral features; public method: Goh & Barabasi
    2008."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "bf_events"
    )
    return spark.sql(
        _burstiness_sql("bf_events", "unix_millis(CAST({x} AS TIMESTAMP))")
    )
