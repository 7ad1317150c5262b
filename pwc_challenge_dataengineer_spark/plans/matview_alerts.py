"""Materialized-view KPIs, alert-rule evaluation, partition profiling,
embedding near-dup (SURVEY.md §2.4, §2.9, §2.11, north-star ops).

- matview_hourly_kpis  the Postgres matview SQL of materialized_views_manager
                       .py:237-261 (executive revenue KPIs: DATE_TRUNC hour
                       buckets, PERCENTILE_CONT 0.5/0.95, LAG growth rate)
                       re-expressed as one Spark plan over `events`. In the
                       engine this is a periodically refreshed gold table;
                       here the defining query is what's checked.
- alert_eval           realtime_gold_processor.py:333-397 builtin alert rules
                       + :608-689 threshold scan, batch-emulated: each rule
                       is a predicate over the hourly aggregates; fired
                       alerts union lazily (cooldown/notification routing is
                       sink-side foreachBatch behavior, not query semantics).
- profile_skew         intelligent_partitioning.py:84-356 profiler core: per
                       candidate partition column — cardinality, null share,
                       top-value skew share (drives partition suitability).
- embedding_near_dup   cosine-threshold near-duplicate pairs over the
                       embedding column — exact, via blocked GEMM
                       (functions/similarity.py cosine_near_dup_blocked);
                       the LSH-bucketed variant (ann_lsh_topk) trades
                       exactness for sub-quadratic candidate generation.

Scale notes: every aggregate here shuffles once on its group key; the LAG /
growth window runs over post-aggregation hourly rows (bounded by the time
range, not data volume). Near-dup flops are O(n²·d) spread over block-pair
GEMM tasks; shuffle is O(n·d·B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.similarity import as_double_array
from ..schemas import load_table
from .catalog import register

_VAL_DEC = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"


@register(
    "matview_hourly_kpis",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS time_bucket,
           {_VAL_DEC} AS total_revenue,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_customers,
           {_VAL_DEC} / COUNT(*) AS average_transaction_value,
           {_VAL_DEC} / NULLIF(COUNT(DISTINCT user_id), 0) AS revenue_per_customer,
           round(quantile_cont(value, 0.5), 6) AS median_transaction_value,
           round(quantile_cont(value, 0.95), 6) AS p95_transaction_value,
           COUNT(*) AS total_transactions,
           CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT)
               AS high_value_transactions
    FROM events
    GROUP BY 1
    """,
)
def matview_hourly_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly revenue-KPI matview body. The growth-rate LAG column is kept in
    matview_hourly_growth (separate query) so each stays one-shuffle."""
    events = load_table(spark, sf_dir, "events")
    vsum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    return events.groupBy(F.date_trunc("hour", "ts").alias("time_bucket")).agg(
        vsum.alias("total_revenue"),
        F.countDistinct("user_id").alias("unique_customers"),
        (vsum / F.count("*")).alias("average_transaction_value"),
        (vsum / F.nullif(F.countDistinct("user_id"), F.lit(0))).alias(
            "revenue_per_customer"
        ),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median_transaction_value"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_transaction_value"),
        F.count("*").alias("total_transactions"),
        F.sum(F.when(F.col("value") > 400, 1).otherwise(0)).alias(
            "high_value_transactions"
        ),
    )


@register(
    "matview_hourly_growth",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS time_bucket, {_VAL_DEC} AS total_revenue
        FROM events GROUP BY 1
    )
    SELECT time_bucket, total_revenue,
           CASE WHEN lag(total_revenue) OVER (ORDER BY time_bucket) IS NULL THEN 0
                ELSE (total_revenue - lag(total_revenue) OVER (ORDER BY time_bucket))
                     / NULLIF(lag(total_revenue) OVER (ORDER BY time_bucket), 0) * 100
           END AS revenue_growth_rate
    FROM hourly
    """,
)
def matview_hourly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour growth (materialized_views_manager.py:246-250). The
    unpartitioned LAG window runs over post-agg hourly rows — bounded by the
    calendar, not by data volume, so scale-safe."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("time_bucket")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_revenue")
    )
    prev = F.lag("total_revenue").over(Window.orderBy("time_bucket"))
    return hourly.select(
        "time_bucket",
        "total_revenue",
        F.when(prev.isNull(), F.lit(0.0))
        .otherwise((F.col("total_revenue") - prev) / F.nullif(prev, F.lit(0)) * 100)
        .alias("revenue_growth_rate"),
    )


# (rule_id, metric, op, threshold, severity) — realtime_gold_processor.py:333-397
# adapted to the events schema; cooldown/channels are sink-side concerns.
ALERT_RULES: list[tuple[str, str, str, float, str]] = [
    ("high_revenue_spike", "total_revenue", ">", 1000.0, "HIGH"),
    ("transaction_volume_drop", "transaction_count", "<", 10.0, "MEDIUM"),
    ("high_error_rate", "error_rate", ">", 0.3, "HIGH"),
    ("avg_value_degradation", "avg_value", "<", 30.0, "CRITICAL"),
]


@register(
    "alert_eval",
    oracle=f"""
    WITH m AS (
        SELECT date_trunc('hour', ts) AS time_bucket,
               {_VAL_DEC} AS total_revenue,
               CAST(COUNT(*) AS DOUBLE) AS transaction_count,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS error_rate,
               {_VAL_DEC} / COUNT(*) AS avg_value
        FROM events GROUP BY 1
    )
    SELECT time_bucket, 'high_revenue_spike' AS rule_id, 'total_revenue' AS metric_name,
           total_revenue AS metric_value, CAST(1000.0 AS DOUBLE) AS threshold_value, 'HIGH' AS severity
    FROM m WHERE total_revenue > 1000.0
    UNION ALL
    SELECT time_bucket, 'transaction_volume_drop', 'transaction_count',
           transaction_count, CAST(10.0 AS DOUBLE), 'MEDIUM' FROM m WHERE transaction_count < 10.0
    UNION ALL
    SELECT time_bucket, 'high_error_rate', 'error_rate',
           error_rate, CAST(0.3 AS DOUBLE), 'HIGH' FROM m WHERE error_rate > 0.3
    UNION ALL
    SELECT time_bucket, 'avg_value_degradation', 'avg_value',
           avg_value, CAST(30.0 AS DOUBLE), 'CRITICAL' FROM m WHERE avg_value < 30.0
    """,
)
def alert_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold alert rules over hourly metrics. One aggregation pass; each
    rule is a cheap filter+project over it, unioned lazily (Catalyst shares
    the agg subplan via the repeated reference)."""
    events = load_table(spark, sf_dir, "events")
    vsum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    m = events.groupBy(F.date_trunc("hour", "ts").alias("time_bucket")).agg(
        vsum.alias("total_revenue"),
        F.count("*").cast("double").alias("transaction_count"),
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("error_rate"),
        (vsum / F.count("*")).alias("avg_value"),
    )
    ops = {
        ">": lambda c, t: c > t,
        "<": lambda c, t: c < t,
        ">=": lambda c, t: c >= t,
        "<=": lambda c, t: c <= t,
        "==": lambda c, t: c == t,
        "!=": lambda c, t: c != t,
    }
    fired = []
    for rule_id, metric, op, threshold, severity in ALERT_RULES:
        fired.append(
            m.filter(ops[op](F.col(metric), F.lit(threshold))).select(
                "time_bucket",
                F.lit(rule_id).alias("rule_id"),
                F.lit(metric).alias("metric_name"),
                F.col(metric).alias("metric_value"),
                F.lit(threshold).alias("threshold_value"),
                F.lit(severity).alias("severity"),
            )
        )
    out = fired[0]
    for f in fired[1:]:
        out = out.unionByName(f)
    return out


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority")


@register(
    "profile_skew",
    oracle="""
    WITH counts AS (
        SELECT 'o_orderstatus' AS column_name, CAST(o_orderstatus AS VARCHAR) AS v,
               COUNT(*) AS cnt
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR), COUNT(*)
        FROM orders GROUP BY 2
    ),
    ranked AS (
        SELECT *,
               -- CAST: DuckDB window SUM(BIGINT) promotes to HUGEINT
               CAST(SUM(cnt) OVER (PARTITION BY column_name) AS BIGINT) AS total_rows,
               CAST(COUNT(*) OVER (PARTITION BY column_name) AS BIGINT) AS cardinality,
               row_number() OVER (PARTITION BY column_name ORDER BY cnt DESC, v) AS rn
        FROM counts
    )
    SELECT column_name, cardinality, total_rows,
           v AS top_value, cnt AS top_count,
           CAST(cnt AS DOUBLE) / total_rows AS skew_share,
           CAST(total_rows AS DOUBLE) / cardinality AS avg_rows_per_value
    FROM ranked WHERE rn = 1
    """,
)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-suitability profile per candidate column: cardinality,
    top-value skew share, avg group size (intelligent_partitioning.py
    :160-235 signals). One groupBy per column over the same scan, then a
    tiny window over the per-value counts."""
    orders = load_table(spark, sf_dir, "orders")
    per_col = []
    for c in _PROFILE_COLS:
        per_col.append(
            orders.groupBy(F.col(c).cast("string").alias("v"))
            .agg(F.count("*").alias("cnt"))
            .select(F.lit(c).alias("column_name"), "v", "cnt")
        )
    counts = per_col[0]
    for p in per_col[1:]:
        counts = counts.unionByName(p)
    w = Window.partitionBy("column_name")
    ranked = counts.select(
        "*",
        F.sum("cnt").over(w).alias("total_rows"),
        F.count("*").over(w).alias("cardinality"),
        F.row_number()
        .over(Window.partitionBy("column_name").orderBy(F.col("cnt").desc(), "v"))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "column_name",
        "cardinality",
        "total_rows",
        F.col("v").alias("top_value"),
        F.col("cnt").alias("top_count"),
        (F.col("cnt").cast("double") / F.col("total_rows")).alias("skew_share"),
        (F.col("total_rows").cast("double") / F.col("cardinality")).alias(
            "avg_rows_per_value"
        ),
    )


_COS_PAIR_SQL = """
    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
"""


@register(
    "embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_PAIR_SQL}, 6) AS cosine_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id AND round({_COS_PAIR_SQL}, 6) >= 0.3
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (0.3 here —
    the synthetic embeddings top out at cos≈0.51). Exact semantics via
    block-matrix GEMM (functions/similarity.py cosine_near_dup_blocked):
    B·(B+1)/2 block-pair tasks, one BLAS matmul each — 63 s → <2 s at sf0.1
    vs the naive pair join, and the layout that scales to 100 TB (shuffle is
    O(n·d·B), flops spread across executors). The hyperplane-LSH variant
    (ann_lsh_topk) drops the exactness for sub-quadratic candidates."""
    from ..functions.similarity import cosine_near_dup_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_blocked(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.3, n_blocks=8
    )


@register(
    "alert_eval_cooldown",
    oracle=f"""
    WITH RECURSIVE m AS (
        SELECT date_trunc('hour', ts) AS window_start,
               {_VAL_DEC} AS total_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    viol AS (
        SELECT rule_id, severity, cooldown_min, window_start, metric_value,
               row_number() OVER (PARTITION BY rule_id ORDER BY window_start) AS rn
        FROM (
            SELECT 'high_revenue_spike' AS rule_id, 'high' AS severity,
                   360 AS cooldown_min, window_start,
                   total_revenue AS metric_value
            FROM m WHERE total_revenue > 1000.0
            UNION ALL
            SELECT 'volume_drop', 'medium', 720, window_start,
                   CAST(n_events AS DOUBLE)
            FROM m WHERE n_events < 8
        )
    ),
    scan AS (
        SELECT rule_id, severity, cooldown_min, window_start, metric_value,
               rn, window_start AS last_fired, true AS fired
        FROM viol WHERE rn = 1
        UNION ALL
        SELECT v.rule_id, v.severity, v.cooldown_min, v.window_start,
               v.metric_value, v.rn,
               CASE WHEN v.window_start >= s.last_fired
                         + to_minutes(CAST(s.cooldown_min AS BIGINT))
                    THEN v.window_start ELSE s.last_fired END,
               v.window_start >= s.last_fired
                   + to_minutes(CAST(s.cooldown_min AS BIGINT))
        FROM scan s JOIN viol v
          ON v.rule_id = s.rule_id AND v.rn = s.rn + 1
    )
    SELECT rule_id, severity, window_start, metric_value
    FROM scan WHERE fired
    """,
)
def alert_eval_cooldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert rules with severity + event-time cooldown
    (realtime_gold_processor.py:97-118, 608-689: the reference suppresses
    re-fires with a driver-side cache TTL; streaming/alerts.py re-expresses
    that as kept-based suppression over the metric series — deterministic
    and replayable). Oracle: recursive CTE advancing one violation at a
    time, carrying the last-KEPT fire time per rule."""
    from ..streaming.alerts import CooldownAlertRule, evaluate_with_cooldown

    events = load_table(spark, sf_dir, "events")
    # checkpoint the hourly aggregate (hours-count rows): find_violations
    # filters it once per rule, and without the barrier each rule branch
    # re-scans and re-aggregates the full events table
    m = events.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_revenue"),
        F.count("*").alias("n_events"),
    ).localCheckpoint(eager=False)
    rules = [
        CooldownAlertRule("high_revenue_spike", "total_revenue", ">", 1000.0,
                          severity="high", cooldown_minutes=360),
        CooldownAlertRule("volume_drop", "n_events", "<", 8, severity="medium",
                          cooldown_minutes=720),
    ]
    return evaluate_with_cooldown(m, rules, "window_start")
