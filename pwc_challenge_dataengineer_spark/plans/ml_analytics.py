"""dbt-macro analytics + ML feature surface (SURVEY.md §2.10, §2.12).

The reference ships its "advanced analytics UDF library" as dbt SQL macros
and pandas feature builders; here each is a distributed DataFrame plan:

- clv_estimate        dbt/macros/dimensional_modeling.sql:3-109 (CLV =
                      AOV x frequency x 0.3 margin x horizon x (1-churn));
                      divergence: the macro ROUNDs to 2dp after a division,
                      we keep full doubles so the oracle hash can't flake on
                      half-cent ties (see plans/_parity.py)
- churn_scoring       dbt/macros/advanced_analytics.sql:3-141 (4 risk
                      components 0-5 -> composite 0-20 -> probability tier)
- basket_features     src/etl/transformations/advanced_features.py:236-271
                      (per-invoice size/diversity/value + size category)
- customer_behavior   advanced_features.py:172-234 (tenure, AOV, diversity,
                      loyalty score) — groupBy, never a pandas merge-back
- kmeans_segments     advanced_features.py:364-408 + realtime_analytics_ml
                      .py:536-595 (k=5, seed=42, standardized features via
                      pyspark.ml; rows-only check — iterative, non-SQL)
- referential_integrity  dbt/macros/data_quality_checks.sql FK orphan tests
                      re-expressed as left_anti counts
- freshness_by_type   data_quality_checks.sql:1-5 test_data_freshness
- rowcount_anomaly    data_quality_checks.sql:8-35 test_row_count_anomaly
                      (daily-count variance vs trailing mean, >50% flagged)
- intersect_customers / except_customers  full-row set ops (SURVEY §2.7 —
                      absent in reference, Spark intersect()/except())

All "current_date" anchors are a fixed AS_OF (2001-09-01, just past the
testdata's max order date) so results are deterministic and oracle-stable.
At 100 TB every query here stays a single shuffle-by-key aggregation (or a
co-partitioned orderkey join); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from ._parity import dec, money_sum_sql
from .catalog import register

AS_OF = "2001-09-01"
_AS_OF_SQL = f"DATE '{AS_OF}'"


def _customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order rollup shared by clv/churn (one shuffle on custkey)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.min(F.to_date("o_orderdate")).alias("first_purchase_date"),
        F.max(F.to_date("o_orderdate")).alias("last_purchase_date"),
        F.count("*").alias("total_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_spent"),
    )


_CUSTOMER_ORDERS_SQL = f"""
    SELECT o_custkey AS customer_id,
           CAST(MIN(o_orderdate) AS DATE) AS first_purchase_date,
           CAST(MAX(o_orderdate) AS DATE) AS last_purchase_date,
           COUNT(*) AS total_orders,
           {money_sum_sql('o_totalprice')} AS total_spent
    FROM orders GROUP BY 1
"""


@register(
    "clv_estimate",
    oracle=f"""
    WITH cm AS ({_CUSTOMER_ORDERS_SQL}),
    m AS (
        SELECT *,
               total_spent / total_orders AS avg_order_value,
               date_diff('day', first_purchase_date, {_AS_OF_SQL}) AS lifetime_days,
               CAST(total_orders AS DOUBLE)
                   / date_diff('day', first_purchase_date, {_AS_OF_SQL})
                   AS purchase_frequency_per_day,
               CAST(CASE WHEN date_diff('day', last_purchase_date, {_AS_OF_SQL}) <= 30 THEN 0.1
                    WHEN date_diff('day', last_purchase_date, {_AS_OF_SQL}) <= 90 THEN 0.3
                    WHEN date_diff('day', last_purchase_date, {_AS_OF_SQL}) <= 180 THEN 0.6
                    WHEN date_diff('day', last_purchase_date, {_AS_OF_SQL}) <= 365 THEN 0.8
                    ELSE 0.95 END AS DOUBLE) AS churn_probability
        FROM cm WHERE total_orders > 0
    )
    SELECT customer_id,
           total_spent AS historical_value,
           avg_order_value * (purchase_frequency_per_day * 360) * 0.3
               * (1 - churn_probability) AS predicted_clv,
           total_spent + avg_order_value * (purchase_frequency_per_day * 360) * 0.3
               * (1 - churn_probability) AS total_clv,
           CASE WHEN total_spent + avg_order_value * (purchase_frequency_per_day * 360)
                     * 0.3 * (1 - churn_probability) >= 1000 THEN 'High Value'
                WHEN total_spent + avg_order_value * (purchase_frequency_per_day * 360)
                     * 0.3 * (1 - churn_probability) >= 500 THEN 'Medium Value'
                WHEN total_spent + avg_order_value * (purchase_frequency_per_day * 360)
                     * 0.3 * (1 - churn_probability) >= 100 THEN 'Low Value'
                ELSE 'Minimal Value' END AS clv_segment,
           purchase_frequency_per_day,
           churn_probability,
           CAST(lifetime_days AS BIGINT) AS lifetime_days
    FROM m
    """,
)
def clv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    as_of = F.lit(AS_OF).cast("date")
    m = (
        _customer_orders(spark, sf_dir)
        .filter(F.col("total_orders") > 0)
        .withColumn("avg_order_value", F.col("total_spent") / F.col("total_orders"))
        .withColumn("lifetime_days", F.datediff(as_of, "first_purchase_date"))
        .withColumn(
            "purchase_frequency_per_day",
            F.col("total_orders").cast("double") / F.col("lifetime_days"),
        )
        .withColumn("recency_days", F.datediff(as_of, "last_purchase_date"))
        .withColumn(
            "churn_probability",
            F.when(F.col("recency_days") <= 30, 0.1)
            .when(F.col("recency_days") <= 90, 0.3)
            .when(F.col("recency_days") <= 180, 0.6)
            .when(F.col("recency_days") <= 365, 0.8)
            .otherwise(0.95),
        )
    )
    predicted = (
        F.col("avg_order_value")
        * (F.col("purchase_frequency_per_day") * F.lit(360))
        * F.lit(0.3)
        * (F.lit(1) - F.col("churn_probability"))
    )
    total_clv = F.col("total_spent") + predicted
    return m.select(
        "customer_id",
        F.col("total_spent").alias("historical_value"),
        predicted.alias("predicted_clv"),
        total_clv.alias("total_clv"),
        F.when(total_clv >= 1000, "High Value")
        .when(total_clv >= 500, "Medium Value")
        .when(total_clv >= 100, "Low Value")
        .otherwise("Minimal Value")
        .alias("clv_segment"),
        "purchase_frequency_per_day",
        "churn_probability",
        F.col("lifetime_days").cast("long").alias("lifetime_days"),
    )


@register(
    "churn_scoring",
    oracle=f"""
    WITH act AS (
        SELECT o_custkey AS customer_id,
               CAST(MIN(o_orderdate) AS DATE) AS first_purchase_date,
               COUNT(*) AS total_orders,
               {money_sum_sql('o_totalprice')} AS total_spent,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE), {_AS_OF_SQL})
                   AS days_since_last,
               {money_sum_sql(f"CASE WHEN o_orderdate >= {_AS_OF_SQL} - INTERVAL 90 DAY THEN o_totalprice ELSE 0 END")}
                   AS recent_revenue,
               COUNT(CASE WHEN o_orderdate >= {_AS_OF_SQL} - INTERVAL 90 DAY THEN 1 END)
                   AS recent_transactions,
               {money_sum_sql(f"CASE WHEN o_orderdate >= {_AS_OF_SQL} - INTERVAL 180 DAY AND o_orderdate < {_AS_OF_SQL} - INTERVAL 90 DAY THEN o_totalprice ELSE 0 END")}
                   AS previous_period_revenue,
               COUNT(*) * 30.0
                   / GREATEST(date_diff('day', CAST(MIN(o_orderdate) AS DATE), {_AS_OF_SQL}), 1)
                   AS purchase_frequency_monthly
        FROM orders GROUP BY 1
    ),
    risk AS (
        SELECT *,
               CASE WHEN days_since_last <= 7 THEN 0 WHEN days_since_last <= 30 THEN 1
                    WHEN days_since_last <= 60 THEN 2 WHEN days_since_last <= 90 THEN 3
                    WHEN days_since_last <= 180 THEN 4 ELSE 5 END AS recency_risk,
               CASE WHEN purchase_frequency_monthly >= 2 THEN 0
                    WHEN purchase_frequency_monthly >= 1 THEN 1
                    WHEN purchase_frequency_monthly >= 0.5 THEN 2
                    WHEN purchase_frequency_monthly >= 0.25 THEN 3
                    WHEN purchase_frequency_monthly >= 0.1 THEN 4 ELSE 5 END AS frequency_risk,
               CASE WHEN recent_revenue > previous_period_revenue * 1.2 THEN 0
                    WHEN recent_revenue > previous_period_revenue * 0.8 THEN 1
                    WHEN recent_revenue > previous_period_revenue * 0.5 THEN 2
                    WHEN recent_revenue > previous_period_revenue * 0.2 THEN 3
                    WHEN recent_revenue > 0 THEN 4 ELSE 5 END AS revenue_trend_risk,
               CASE WHEN recent_transactions >= 5 THEN 0 WHEN recent_transactions >= 3 THEN 1
                    WHEN recent_transactions >= 2 THEN 2 WHEN recent_transactions >= 1 THEN 3
                    WHEN recent_transactions = 0 AND days_since_last <= 180 THEN 4
                    ELSE 5 END AS activity_risk
        FROM act
    )
    SELECT customer_id, total_orders, total_spent,
           CAST(days_since_last AS BIGINT) AS days_since_last,
           purchase_frequency_monthly,
           CAST(recency_risk AS INT) AS recency_risk,
           CAST(frequency_risk AS INT) AS frequency_risk,
           CAST(revenue_trend_risk AS INT) AS revenue_trend_risk,
           CAST(activity_risk AS INT) AS activity_risk,
           CAST(recency_risk + frequency_risk + revenue_trend_risk + activity_risk AS INT)
               AS churn_risk_score,
           CAST(CASE WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 4 THEN 0.1
                WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 8 THEN 0.3
                WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 12 THEN 0.6
                WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 16 THEN 0.8
                ELSE 0.95 END AS DOUBLE) AS churn_probability,
           CASE WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 4 THEN 'Low Risk'
                WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 8 THEN 'Medium Risk'
                WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 12 THEN 'High Risk'
                ELSE 'Critical Risk' END AS churn_risk_category,
           CASE WHEN recency_risk >= 4 THEN 'Re-engagement Campaign'
                WHEN frequency_risk >= 4 THEN 'Increase Purchase Frequency'
                WHEN revenue_trend_risk >= 4 THEN 'Value Recovery Campaign'
                WHEN activity_risk >= 4 THEN 'Activity Stimulation'
                ELSE 'Monitor' END AS recommended_action
    FROM risk
    """,
)
def churn_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    as_of = F.lit(AS_OF).cast("date")
    orders = load_table(spark, sf_dir, "orders")
    recent = F.col("o_orderdate") >= F.date_sub(as_of, 90)
    previous = (F.col("o_orderdate") >= F.date_sub(as_of, 180)) & (
        F.col("o_orderdate") < F.date_sub(as_of, 90)
    )
    act = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.min(F.to_date("o_orderdate")).alias("first_purchase_date"),
        F.count("*").alias("total_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_spent"),
        F.datediff(as_of, F.max(F.to_date("o_orderdate"))).alias("days_since_last"),
        F.sum(F.when(recent, dec("o_totalprice")).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("recent_revenue"),
        F.count(F.when(recent, 1)).alias("recent_transactions"),
        F.sum(F.when(previous, dec("o_totalprice")).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("previous_period_revenue"),
    )
    act = act.withColumn(
        "purchase_frequency_monthly",
        F.col("total_orders")
        * F.lit(30.0)
        / F.greatest(F.datediff(as_of, "first_purchase_date"), F.lit(1)),
    )
    d, fq, rr, rt = (
        F.col("days_since_last"),
        F.col("purchase_frequency_monthly"),
        F.col("recent_revenue"),
        F.col("recent_transactions"),
    )
    risk = (
        act.withColumn(
            "recency_risk",
            F.when(d <= 7, 0).when(d <= 30, 1).when(d <= 60, 2).when(d <= 90, 3)
            .when(d <= 180, 4).otherwise(5),
        )
        .withColumn(
            "frequency_risk",
            F.when(fq >= 2, 0).when(fq >= 1, 1).when(fq >= 0.5, 2).when(fq >= 0.25, 3)
            .when(fq >= 0.1, 4).otherwise(5),
        )
        .withColumn(
            "revenue_trend_risk",
            F.when(rr > F.col("previous_period_revenue") * 1.2, 0)
            .when(rr > F.col("previous_period_revenue") * 0.8, 1)
            .when(rr > F.col("previous_period_revenue") * 0.5, 2)
            .when(rr > F.col("previous_period_revenue") * 0.2, 3)
            .when(rr > 0, 4)
            .otherwise(5),
        )
        .withColumn(
            "activity_risk",
            F.when(rt >= 5, 0).when(rt >= 3, 1).when(rt >= 2, 2).when(rt >= 1, 3)
            .when((rt == 0) & (d <= 180), 4).otherwise(5),
        )
    )
    score = (
        F.col("recency_risk")
        + F.col("frequency_risk")
        + F.col("revenue_trend_risk")
        + F.col("activity_risk")
    )
    return risk.select(
        "customer_id",
        "total_orders",
        "total_spent",
        F.col("days_since_last").cast("long").alias("days_since_last"),
        "purchase_frequency_monthly",
        F.col("recency_risk").cast("int").alias("recency_risk"),
        F.col("frequency_risk").cast("int").alias("frequency_risk"),
        F.col("revenue_trend_risk").cast("int").alias("revenue_trend_risk"),
        F.col("activity_risk").cast("int").alias("activity_risk"),
        score.cast("int").alias("churn_risk_score"),
        F.when(score <= 4, 0.1).when(score <= 8, 0.3).when(score <= 12, 0.6)
        .when(score <= 16, 0.8).otherwise(0.95).alias("churn_probability"),
        F.when(score <= 4, "Low Risk").when(score <= 8, "Medium Risk")
        .when(score <= 12, "High Risk").otherwise("Critical Risk")
        .alias("churn_risk_category"),
        F.when(F.col("recency_risk") >= 4, "Re-engagement Campaign")
        .when(F.col("frequency_risk") >= 4, "Increase Purchase Frequency")
        .when(F.col("revenue_trend_risk") >= 4, "Value Recovery Campaign")
        .when(F.col("activity_risk") >= 4, "Activity Stimulation")
        .otherwise("Monitor")
        .alias("recommended_action"),
    )


@register(
    "basket_features",
    oracle=f"""
    WITH b AS (
        SELECT l_orderkey AS invoice_no,
               COUNT(*) AS basket_size,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS basket_diversity,
               SUM(l_quantity) AS basket_total_quantity,
               {money_sum_sql('l_extendedprice')} / COUNT(*) AS basket_avg_price
        FROM lineitem GROUP BY 1
    )
    SELECT *,
           basket_total_quantity * basket_avg_price AS basket_total_value,
           CASE WHEN basket_size <= 1 THEN 'Single' WHEN basket_size <= 3 THEN 'Small'
                WHEN basket_size <= 10 THEN 'Medium' ELSE 'Large' END
               AS basket_size_category
    FROM b
    """,
)
def basket_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket rollup. One shuffle on orderkey; the size category is
    the reference's pd.cut bins [0,1,3,10,inf]."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    b = lineitem.groupBy(F.col("l_orderkey").alias("invoice_no")).agg(
        F.count("*").alias("basket_size"),
        F.countDistinct("l_partkey").alias("basket_diversity"),
        F.sum("l_quantity").alias("basket_total_quantity"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias(
            "basket_avg_price"
        ),
    )
    return b.select(
        "*",
        (F.col("basket_total_quantity") * F.col("basket_avg_price")).alias(
            "basket_total_value"
        ),
        F.when(F.col("basket_size") <= 1, "Single")
        .when(F.col("basket_size") <= 3, "Small")
        .when(F.col("basket_size") <= 10, "Medium")
        .otherwise("Large")
        .alias("basket_size_category"),
    )


@register(
    "customer_behavior",
    oracle=f"""
    SELECT o_custkey AS customer_id,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS product_diversity,
           {money_sum_sql('l_extendedprice')} AS total_spend,
           {money_sum_sql('l_extendedprice')} / COUNT(DISTINCT o_orderkey)
               AS avg_order_value,
           CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                          CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS tenure_days,
           CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                          CAST(MAX(o_orderdate) AS DATE)) AS DOUBLE)
               / COUNT(DISTINCT o_orderkey) AS avg_days_between_orders,
           CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
               / GREATEST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                                    CAST(MAX(o_orderdate) AS DATE)), 1) * 100
               AS loyalty_score
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def customer_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenure/AOV/diversity/loyalty per customer. orders ⋈ lineitem is a
    co-partitioned shuffle join on orderkey (both sides hash the same key, so
    at 100 TB this is one exchange each, no broadcast needed), then a single
    groupBy(custkey)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    g = j.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        F.countDistinct("l_partkey").alias("product_diversity"),
        F.sum(dec("l_extendedprice")).cast("double").alias("total_spend"),
        F.min(F.to_date("o_orderdate")).alias("first_order"),
        F.max(F.to_date("o_orderdate")).alias("last_order"),
    )
    tenure = F.datediff("last_order", "first_order")
    return g.select(
        "customer_id",
        "order_count",
        "product_diversity",
        "total_spend",
        (F.col("total_spend") / F.col("order_count")).alias("avg_order_value"),
        tenure.cast("long").alias("tenure_days"),
        (tenure.cast("double") / F.col("order_count")).alias("avg_days_between_orders"),
        (F.col("order_count").cast("double") / F.greatest(tenure, F.lit(1)) * 100).alias(
            "loyalty_score"
        ),
    )


@register("kmeans_segments", oracle=None)  # iterative pyspark.ml — rows-only check
def kmeans_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans customer segmentation, k=5 seed=42 on standardized RFM features
    (advanced_features.py:364-408 semantics via pyspark.ml — distributed
    Lloyd iterations instead of sklearn on the driver). Returns per-cluster
    sizes + centroid-ish means; cluster IDs are not stable across runs, so
    rows are ordered by size for the rows-only check."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    rfm = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit(AS_OF).cast("date"), F.max(F.to_date("o_orderdate"))
            ).cast("double").alias("recency"),
            F.count("*").cast("double").alias("frequency"),
            F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
        )
    )
    assembled = VectorAssembler(
        inputCols=["recency", "frequency", "monetary"], outputCol="raw"
    ).transform(rfm)
    scaled = (
        StandardScaler(inputCol="raw", outputCol="features", withMean=True)
        .fit(assembled)
        .transform(assembled)
    )
    model = KMeans(k=5, seed=42, featuresCol="features").fit(scaled)
    return (
        model.transform(scaled)
        .groupBy("prediction")
        .agg(
            F.count("*").alias("cluster_size"),
            F.avg("recency").alias("avg_recency"),
            F.avg("frequency").alias("avg_frequency"),
            F.avg("monetary").alias("avg_monetary"),
        )
        .orderBy(F.col("cluster_size").desc(), "prediction")
        .drop("prediction")
    )


@register(
    "referential_integrity",
    oracle="""
    SELECT 'lineitem_orderkey' AS check_name,
           CAST(COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT) AS orphan_count
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_partkey',
           CAST(COUNT(CASE WHEN p.p_partkey IS NULL THEN 1 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'orders_custkey',
           CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'customer_nationkey',
           CAST(COUNT(CASE WHEN n.n_nationkey IS NULL THEN 1 END) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan counts (dbt relationship-test semantics) as left_anti
    aggregates — each check is one anti-join count, unioned lazily."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "part", "customer", "nation")}

    def orphans(name: str, child: DataFrame, parent: DataFrame, ck: str, pk: str) -> DataFrame:
        anti = child.join(parent, child[ck] == parent[pk], "left_anti")
        return anti.agg(
            F.lit(name).alias("check_name"), F.count("*").alias("orphan_count")
        )

    checks = [
        orphans("lineitem_orderkey", t["lineitem"], t["orders"], "l_orderkey", "o_orderkey"),
        orphans("lineitem_partkey", t["lineitem"], t["part"], "l_partkey", "p_partkey"),
        orphans("orders_custkey", t["orders"], t["customer"], "o_custkey", "c_custkey"),
        orphans("customer_nationkey", t["customer"], t["nation"], "c_nationkey", "n_nationkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "freshness_by_type",
    oracle=f"""
    SELECT event_type,
           MAX(ts) AS latest_event,
           CAST((epoch(TIMESTAMP '2001-09-01 00:00:00')
                 - epoch(date_trunc('hour', MAX(ts)))) / 3600 AS BIGINT) AS hours_stale,
           (epoch(TIMESTAMP '2001-09-01 00:00:00')
            - epoch(date_trunc('hour', MAX(ts)))) / 3600 <= 24 AS is_fresh
    FROM events GROUP BY 1
    """,
)
def freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """test_data_freshness per event_type against the fixed AS_OF anchor.
    Staleness is hour-truncated epoch arithmetic (boundary-crossing count),
    identical on both engines; the NTZ→TZ cast is identity under the
    session's UTC timezone."""
    events = load_table(spark, sf_dir, "events")
    as_of_s = F.lit(f"{AS_OF} 00:00:00").cast("timestamp").cast("long")
    latest = F.max("ts")
    latest_hr_s = F.date_trunc("hour", latest).cast("timestamp").cast("long")
    stale = ((as_of_s - latest_hr_s) / 3600).cast("long")
    return events.groupBy("event_type").agg(
        latest.alias("latest_event"),
        stale.alias("hours_stale"),
        (stale <= 24).alias("is_fresh"),
    )


@register(
    "rowcount_anomaly",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS daily_count
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT *,
               CAST(SUM(daily_count) OVER () AS DOUBLE) / COUNT(*) OVER () AS avg_count
        FROM daily
    )
    SELECT event_date, daily_count, avg_count,
           ABS(daily_count - avg_count) / avg_count * 100 AS variance_pct
    FROM stats
    WHERE ABS(daily_count - avg_count) / avg_count * 100 > 50
    """,
)
def rowcount_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """test_row_count_anomaly: days whose event count deviates >50% from the
    overall daily mean. The unpartitioned window runs over #days rows
    (post-aggregation) — scale-safe."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("daily_count")
    )
    w = Window.partitionBy()
    stats = daily.withColumn(
        "avg_count",
        F.sum("daily_count").over(w).cast("double") / F.count("*").over(w),
    )
    variance = F.abs(F.col("daily_count") - F.col("avg_count")) / F.col("avg_count") * 100
    return stats.select(
        "event_date", "daily_count", "avg_count", variance.alias("variance_pct")
    ).filter(variance > 50)


_Y2000 = "SELECT DISTINCT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 2000"
_Y2001 = "SELECT DISTINCT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 2001"


def _year_customers(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.year("o_orderdate") == year)
        .select(F.col("o_custkey").alias("customer_id"))
        .distinct()
    )


@register("intersect_customers", oracle=f"{_Y2000} INTERSECT {_Y2001}")
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row INTERSECT (customers active in both 2000 and 2001)."""
    return _year_customers(spark, sf_dir, 2000).intersect(
        _year_customers(spark, sf_dir, 2001)
    )


@register("except_customers", oracle=f"{_Y2000} EXCEPT {_Y2001}")
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row EXCEPT (2000 customers who lapsed in 2001)."""
    return _year_customers(spark, sf_dir, 2000).exceptAll(
        _year_customers(spark, sf_dir, 2001)
    ).distinct()


@register(
    "pandas_scoring",
    oracle="""
    SELECT vec_id, label,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                 list_transform(range(0, 64), j -> ((j * 37) % 19 - 9) / 10.0)), 6)
               AS margin,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                 list_transform(range(0, 64), j -> ((j * 37) % 19 - 9) / 10.0)), 6) > 0
               AS predicted
    FROM embeddings
    """,
)
def pandas_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized linear-model scoring via Arrow-batched Pandas UDF
    (functions/scoring.py — the realtime_analytics_ml.py:26 pandas_udf
    scoring path with a reproducible weight ramp). The UDF is the pattern a
    real model would use; the fixed weights make it oracle-checkable."""
    from ..functions.scoring import score_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    return score_embeddings(emb, "embedding", dim=64).select(
        "vec_id", "label", "margin", "predicted"
    )


@register(
    "score_decile_lift",
    oracle="""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spend
        FROM orders GROUP BY 1
    ),
    flagged AS (
        SELECT s.custkey, s.total_spend,
               CASE WHEN EXISTS (
                   SELECT 1 FROM orders o
                   JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                   WHERE o.o_custkey = s.custkey AND l.l_returnflag = 'R'
               ) THEN 1 ELSE 0 END AS is_returner
        FROM spend s
    ),
    ranked AS (
        SELECT *, ntile(10) OVER (ORDER BY total_spend DESC, custkey) AS decile
        FROM flagged
    ),
    base AS (
        SELECT CAST(SUM(is_returner) AS DOUBLE) / COUNT(*) AS base_rate,
               CAST(SUM(is_returner) AS BIGINT) AS total_pos
        FROM ranked
    )
    SELECT r.decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r.is_returner) AS BIGINT) AS n_returners,
           round(CAST(SUM(r.is_returner) AS DOUBLE) / COUNT(*), 6)
               AS decile_rate,
           round(CAST(SUM(r.is_returner) AS DOUBLE) / b.total_pos, 6)
               AS capture_rate,
           round((CAST(SUM(r.is_returner) AS DOUBLE) / COUNT(*))
                 / b.base_rate, 6) AS lift
    FROM ranked r CROSS JOIN base b
    GROUP BY 1, b.total_pos, b.base_rate
    """,
)
def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the standard scored-model evaluation artifact
    (reference analog: the churn/CLV scoring macros feed exactly this
    report downstream): customers ranked by exact-decimal total spend
    into deciles, each decile's returner rate vs the base rate (lift) and
    its share of all returners (capture). The ntile runs over the
    |customers|-sized aggregate with a full tiebreaker, so ordering — and
    therefore every decile boundary — is engine-deterministic. Replace
    total_spend with any model score (e.g. functions/scoring.py's pandas
    UDF output) and the same plan evaluates it."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend")
    )
    returners = (
        orders.join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .withColumn("is_returner", F.lit(1))
    )
    spend = spend.join(F.broadcast(returners), "custkey", "left").withColumn(
        "is_returner", F.coalesce("is_returner", F.lit(0))
    )
    w = Window.orderBy(F.desc("total_spend"), F.asc("custkey"))
    ranked = spend.withColumn("decile", F.ntile(10).over(w))
    base = ranked.agg(
        (F.sum("is_returner").cast("double") / F.count("*")).alias("base_rate"),
        F.sum("is_returner").alias("total_pos"),
    )
    g = ranked.crossJoin(F.broadcast(base)).groupBy(
        "decile", "total_pos", "base_rate"
    )
    rate = F.sum("is_returner").cast("double") / F.count("*")
    return g.agg(
        F.count("*").alias("n_customers"),
        F.sum("is_returner").alias("n_returners"),
        F.round(rate, 6).alias("decile_rate"),
        F.round(
            F.sum("is_returner").cast("double") / F.col("total_pos"), 6
        ).alias("capture_rate"),
        F.round(rate / F.col("base_rate"), 6).alias("lift"),
    ).select(
        "decile",
        "n_customers",
        "n_returners",
        "decile_rate",
        "capture_rate",
        "lift",
    )


@register(
    "classifier_eval",
    oracle="""
    WITH y96 AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    ),
    y97 AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    lab AS (
        SELECT c_custkey,
               COALESCE(y96.n, 0) >= 3 AS pred,
               COALESCE(y97.n, 0) >= 3 AS actual
        FROM customer
        LEFT JOIN y96 ON c_custkey = y96.o_custkey
        LEFT JOIN y97 ON c_custkey = y97.o_custkey
    ),
    cm AS (
        SELECT
            CAST(COUNT(CASE WHEN pred AND actual THEN 1 END) AS BIGINT) AS tp,
            CAST(COUNT(CASE WHEN pred AND NOT actual THEN 1 END) AS BIGINT) AS fp,
            CAST(COUNT(CASE WHEN NOT pred AND actual THEN 1 END) AS BIGINT) AS fn,
            CAST(COUNT(CASE WHEN NOT pred AND NOT actual THEN 1 END) AS BIGINT) AS tn
        FROM lab
    )
    SELECT tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / (tp + fp) AS precision_,
           CAST(tp AS DOUBLE) / (tp + fn) AS recall_,
           2 * (CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn))
             / (CAST(tp AS DOUBLE) / (tp + fp) + CAST(tp AS DOUBLE) / (tp + fn))
               AS f1
    FROM cm
    """,
)
def classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix evaluation of the naive persistence model 'a
    customer active in 1996 (>=3 orders) stays active in 1997' —
    the TP/FP/FN/TN + precision/recall/F1 scorecard every model-serving
    pipeline emits (reference analog: the model-evaluation half of
    src/streaming/realtime_analytics_ml.py). Label construction is two
    filtered pre-aggregations left-joined onto the customer dim, so the
    shuffles run on |customers-with-orders|, not |orders|. All metrics
    are divisions of identical integer-derived doubles in identical
    order — F1 included — so the whole scorecard hash-matches."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def year_counts(y0: str, y1: str, name: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .groupBy("o_custkey")
            .agg(F.count("*").alias(name))
        )

    lab = (
        customer.join(
            year_counts("1996-01-01", "1997-01-01", "n96"),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .drop("o_custkey")
        .join(
            year_counts("1997-01-01", "1998-01-01", "n97"),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(
            (F.coalesce("n96", F.lit(0)) >= 3).alias("pred"),
            (F.coalesce("n97", F.lit(0)) >= 3).alias("actual"),
        )
    )
    cm = lab.agg(
        F.count(F.when(F.col("pred") & F.col("actual"), 1)).cast("bigint").alias("tp"),
        F.count(F.when(F.col("pred") & ~F.col("actual"), 1)).cast("bigint").alias("fp"),
        F.count(F.when(~F.col("pred") & F.col("actual"), 1)).cast("bigint").alias("fn"),
        F.count(F.when(~F.col("pred") & ~F.col("actual"), 1)).cast("bigint").alias("tn"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        prec.alias("precision_"),
        rec.alias("recall_"),
        (F.lit(2) * prec * rec / (prec + rec)).alias("f1"),
    )


@register(
    "chisq_segment_priority",
    oracle="""
    WITH cells AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS pri,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT seg, pri, o,
               SUM(o) OVER (PARTITION BY seg) AS r,
               SUM(o) OVER (PARTITION BY pri) AS c,
               SUM(o) OVER () AS n
        FROM cells
    ),
    terms AS (
        SELECT seg, pri,
               CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                   AS term
        FROM tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT pri) - 1) AS BIGINT)
               AS dof,
           list_reduce(
               list_prepend(0.0::DOUBLE, list(term ORDER BY seg, pri)),
               (acc, x) -> acc + x) AS chi2
    FROM terms
    """,
)
def chisq_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between market segment and order
    priority. The statistic is rearranged to the all-integer form
    (o*N - r*c)^2 / (N*r*c) per cell — numerator and denominator exact —
    and the 25 per-cell terms are summed by an ORDERED fold (sorted
    array + aggregate() in Spark, list_reduce over an ORDER BY list in
    DuckDB) rather than a SUM(), because a parallel double sum commits
    to no addition order and the hash compare demands one. The contingency
    table is tiny post-aggregation; everything after the one fact shuffle
    is a 25-row computation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    tot = cells.select(
        "seg",
        "pri",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("r"),
        F.sum("o").over(Window.partitionBy("pri")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    d = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    terms = tot.select(
        "seg",
        "pri",
        (
            d * d
            / (
                F.col("n").cast("double")
                * F.col("r").cast("double")
                * F.col("c").cast("double")
            )
        ).alias("term"),
    )
    return terms.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        (
            (F.count_distinct("seg") - 1) * (F.count_distinct("pri") - 1)
        ).cast("bigint").alias("dof"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("seg", "pri", "term"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2"),
    )


@register(
    "cusum_monthly_revenue",
    oracle="""
    WITH RECURSIVE monthly AS (
        SELECT n_name,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT n_name, CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS mu
        FROM monthly GROUP BY 1
    ),
    ranked AS (
        SELECT m.n_name, m.month, m.rev, s.mu,
               CAST(row_number() OVER (PARTITION BY m.n_name ORDER BY m.month)
                    AS INT) AS rn
        FROM monthly m JOIN stats s ON m.n_name = s.n_name
    ),
    rec AS (
        SELECT n_name, month, rev, mu, rn,
               greatest(0.0::DOUBLE, rev - mu) AS cusum
        FROM ranked WHERE rn = 1
        UNION ALL
        SELECT r.n_name, r.month, r.rev, r.mu, r.rn,
               greatest(0.0::DOUBLE, rec.cusum + (r.rev - r.mu))
        FROM rec JOIN ranked r ON r.n_name = rec.n_name AND r.rn = rec.rn + 1
    )
    SELECT n_name AS nation, month, rev, round(cusum, 6) AS cusum
    FROM rec
    """,
)
def cusum_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector over each nation's monthly revenue:
    s_t = max(0, s_{t-1} + (x_t - mean)) — the classic changepoint
    statistic whose reset-at-zero makes it inexpressible as any window
    frame (it is not a prefix sum). Runs as a per-nation sequential fold
    in applyInPandas (the ewma_user_value template); the oracle replays
    the identical IEEE recursion as a recursive CTE, so the whole
    detector path is hash-verified. The mean is an exact-decimal two-pass
    statistic broadcast back onto the series. 25 nations x ~80 months:
    the fold is trivially partition-local; at scale the number of
    parallel series is the parallelism."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("rev"))
    )
    stats = monthly.groupBy("n_name").agg(
        (
            F.sum(F.col("rev").cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("mu")
    )
    joined = monthly.join(stats, "n_name").select("n_name", "month", "rev", "mu")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month", kind="mergesort")
        s = 0.0
        out = []
        mu = float(pdf["mu"].iloc[0])
        for x in pdf["rev"].astype("float64"):
            s = max(0.0, s + (x - mu))
            out.append(round(s, 6))
        res = pdf[["n_name", "month", "rev"]].copy()
        res["cusum"] = out
        return res.rename(columns={"n_name": "nation"})

    return joined.groupBy("n_name").applyInPandas(
        fold, "nation string, month date, rev double, cusum double"
    )


@register(
    "kmeans_quality_check",
    # Contract oracle (same doctrine as pca_reconstruction_check): the
    # fixed-seed Lloyd result is engine-specific, but a VALID clustering's
    # invariants are not — the partition property (cluster sizes sum to n,
    # k non-empty clusters) and the objective property (within-cluster SS
    # strictly below the total SS of the standardized features, since k>1
    # centroids always beat the single global mean). The Spark side
    # verifies those distributed and emits booleans; the oracle pins the
    # contract plus the data-derived point count.
    oracle="""
    SELECT 5 AS k,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_points,
           TRUE AS sizes_sum_to_n,
           TRUE AS all_clusters_nonempty,
           TRUE AS wss_below_total_ss
    FROM orders
    """,
)
def kmeans_quality_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity contract for the fixed-seed KMeans segmentation
    (kmeans_segments' pipeline): partition + objective invariants checked
    distributed, only k scalars and the 5 cluster sizes reach the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    rfm = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit(AS_OF).cast("date"), F.max(F.to_date("o_orderdate"))
            ).cast("double").alias("recency"),
            F.count("*").cast("double").alias("frequency"),
            F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
        )
    )
    assembled = VectorAssembler(
        inputCols=["recency", "frequency", "monetary"], outputCol="raw"
    ).transform(rfm)
    scaled = (
        StandardScaler(inputCol="raw", outputCol="features", withMean=True)
        .fit(assembled)
        .transform(assembled)
    )
    k = 5
    model = KMeans(k=k, seed=42, featuresCol="features").fit(scaled)
    # consumed by four separate actions (sizes, per-dim means, total SS,
    # count) — checkpoint or each action re-runs assemble+scale+predict
    preds = model.transform(scaled).localCheckpoint(eager=False)
    sizes = {
        r["prediction"]: r["c"]
        for r in preds.groupBy("prediction").agg(F.count("*").alias("c")).collect()
    }
    n_points = sum(sizes.values())
    # total SS of the standardized features around the global mean — the
    # k=1 objective the trained WSS must beat
    sq = F.aggregate(
        vector_to_array("features"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    mean_vec = [
        r["m"]
        for r in preds.select(
            F.posexplode(vector_to_array("features")).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .orderBy("pos")
        .collect()
    ]
    total_sq = preds.agg(F.sum(sq).alias("s")).first()["s"]
    total_ss = total_sq - n_points * sum(m * m for m in mean_vec)
    wss = model.summary.trainingCost
    return spark.createDataFrame(
        [
            (
                k,
                n_points,
                n_points == rfm.count(),
                len(sizes) == k and all(v > 0 for v in sizes.values()),
                bool(wss < total_ss),
            )
        ],
        "k INT, n_points BIGINT, sizes_sum_to_n BOOLEAN, "
        "all_clusters_nonempty BOOLEAN, wss_below_total_ss BOOLEAN",
    )


@register(
    "infogain_best_split",
    oracle="""
    WITH bucketed AS (
        SELECT o_orderstatus AS cls,
               CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) / 50000)
                    AS BIGINT) AS bk,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    cands AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS t),
    sides AS (
        SELECT c.t, b.cls,
               CAST(SUM(CASE WHEN b.bk < c.t THEN b.cnt ELSE 0 END)
                    AS BIGINT) AS nl,
               CAST(SUM(CASE WHEN b.bk >= c.t THEN b.cnt ELSE 0 END)
                    AS BIGINT) AS nr
        FROM cands c, bucketed b
        GROUP BY 1, 2
    ),
    tsum AS (
        SELECT t, CAST(SUM(nl) AS BIGINT) AS n_left,
               CAST(SUM(nr) AS BIGINT) AS n_right
        FROM sides GROUP BY t
    ),
    ent AS (
        SELECT s.t,
               SUM(CASE WHEN s.nl > 0 THEN
                   -(CAST(s.nl AS DOUBLE) / ts.n_left)
                    * log2(CAST(s.nl AS DOUBLE) / ts.n_left)
                   ELSE 0 END) AS hl,
               SUM(CASE WHEN s.nr > 0 THEN
                   -(CAST(s.nr AS DOUBLE) / ts.n_right)
                    * log2(CAST(s.nr AS DOUBLE) / ts.n_right)
                   ELSE 0 END) AS hr
        FROM sides s JOIN tsum ts USING (t)
        GROUP BY s.t
    ),
    pcls AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS c FROM bucketed
             GROUP BY 1),
    ptot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pcls),
    pent AS (
        SELECT SUM(-(CAST(p.c AS DOUBLE) / t.n)
                   * log2(CAST(p.c AS DOUBLE) / t.n)) AS h,
               MAX(t.n) AS n
        FROM pcls p, ptot t
    ),
    scored AS (
        SELECT ts.t * 50000 AS split_at, ts.n_left, ts.n_right,
               ROUND(pe.h - (ts.n_left * e.hl + ts.n_right * e.hr) / pe.n, 6)
                   AS info_gain
        FROM tsum ts JOIN ent e USING (t), pent pe
    )
    SELECT split_at, n_left, n_right, info_gain,
           row_number() OVER (ORDER BY info_gain DESC, split_at) = 1
               AS is_best
    FROM scored
    """,
)
def infogain_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump feature evaluation: the information gain of splitting
    orders on each candidate o_totalprice threshold (50k..450k) against
    the o_orderstatus class, with the argmax flagged — the single-feature
    scoring primitive behind tree building and feature selection.

    The fact table folds ONCE into a (class, price-bucket) contingency
    table (map-side combined, <=30 rows at any SF); every candidate split
    is then evaluated over that tiny table, so adding candidates costs
    nothing at scale. Counts are exact integers; entropies are fixed
    <=3-term sums of identical IEEE operands rounded at 6dp, and the
    argmax ranks the ROUNDED gain with a threshold tiebreak so the flag
    is deterministic cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    bucketed = orders.groupBy(
        F.col("o_orderstatus").alias("cls"),
        F.floor(F.col("o_totalprice").cast("decimal(18,2)") / 50000)
        .cast("bigint")
        .alias("bk"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    cands = spark.range(1, 10).select(F.col("id").alias("t"))
    sides = (
        F.broadcast(cands)
        .crossJoin(bucketed)
        .groupBy("t", "cls")
        .agg(
            F.sum(F.when(F.col("bk") < F.col("t"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(
                F.when(F.col("bk") >= F.col("t"), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("nr"),
        )
    )
    tsum = sides.groupBy("t").agg(
        F.sum("nl").cast("bigint").alias("n_left"),
        F.sum("nr").cast("bigint").alias("n_right"),
    )
    pl = F.col("nl").cast("double") / F.col("n_left")
    pr = F.col("nr").cast("double") / F.col("n_right")
    ent = (
        sides.join(tsum, "t")
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("nl") > 0, -pl * F.log2(pl)).otherwise(0.0)
            ).alias("hl"),
            F.sum(
                F.when(F.col("nr") > 0, -pr * F.log2(pr)).otherwise(0.0)
            ).alias("hr"),
        )
    )
    pcls = bucketed.groupBy("cls").agg(
        F.sum("cnt").cast("bigint").alias("c")
    )
    ptot = pcls.agg(F.sum("c").cast("bigint").alias("n"))
    pp = F.col("c").cast("double") / F.col("n")
    pent = (
        pcls.crossJoin(F.broadcast(ptot))
        .agg(
            F.sum(-pp * F.log2(pp)).alias("h"),
            F.max("n").alias("n"),
        )
    )
    scored = (
        tsum.join(ent, "t")
        .crossJoin(F.broadcast(pent))
        .select(
            (F.col("t") * 50000).alias("split_at"),
            "n_left",
            "n_right",
            F.round(
                F.col("h")
                - (
                    F.col("n_left") * F.col("hl")
                    + F.col("n_right") * F.col("hr")
                )
                / F.col("n"),
                6,
            ).alias("info_gain"),
        )
    )
    from pyspark.sql.window import Window as W

    wbest = W.orderBy(F.desc("info_gain"), F.asc("split_at"))
    return scored.select(
        "split_at",
        "n_left",
        "n_right",
        "info_gain",
        (F.row_number().over(wbest) == 1).alias("is_best"),
    )


def _roc_auc_sql(orders: str, customer: str) -> str:
    """Shared ROC-AUC/Gini/KS SQL body (identical text on both engines).

    Score = 1996 spend (DECIMAL-exact, so the doubles agree bit-for-bit);
    label = >=3 orders in 1997. Average ranks are exact multiples of 0.5
    (rank + (ties-1)/2), so the Mann-Whitney sum is float-exact and the
    final AUC is a single division of exact values — no rounding needed.
    """
    return f"""
    WITH spend96 AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM {orders}
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    ),
    y97 AS (
        SELECT o_custkey, COUNT(*) AS n FROM {orders}
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    lab AS (
        SELECT c_custkey, COALESCE(sp.s, 0.0) AS score,
               COALESCE(y97.n, 0) >= 3 AS actual
        FROM {customer}
        LEFT JOIN spend96 sp ON c_custkey = sp.o_custkey
        LEFT JOIN y97 ON c_custkey = y97.o_custkey
    ),
    ranked AS (
        SELECT actual,
               CAST(rank() OVER (ORDER BY score) AS DOUBLE)
                 + (CAST(COUNT(*) OVER (PARTITION BY score) AS DOUBLE) - 1.0)
                   / 2.0 AS r
        FROM lab
    ),
    agg AS (
        SELECT CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS np,
               CAST(SUM(CASE WHEN NOT actual THEN 1 ELSE 0 END) AS BIGINT)
                   AS nn,
               SUM(CASE WHEN actual THEN r ELSE 0.0 END) AS srp
        FROM ranked
    ),
    by_score AS (
        SELECT score,
               CAST(COUNT(CASE WHEN actual THEN 1 END) AS BIGINT) AS p,
               CAST(COUNT(CASE WHEN NOT actual THEN 1 END) AS BIGINT) AS q
        FROM lab GROUP BY 1
    ),
    ecdf AS (
        SELECT SUM(p) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cp,
               SUM(q) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cq
        FROM by_score
    ),
    ks AS (
        SELECT MAX(ABS(CAST(e.cp AS DOUBLE) / CAST(a.np AS DOUBLE)
                       - CAST(e.cq AS DOUBLE) / CAST(a.nn AS DOUBLE)))
                   AS ks_stat
        FROM ecdf e CROSS JOIN agg a
    ),
    auc AS (
        SELECT np, nn,
               (srp - (CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1.0)
                       / 2.0))
                 / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc
        FROM agg
    )
    SELECT a.np AS n_pos, a.nn AS n_neg, a.auc,
           2.0 * a.auc - 1.0 AS gini, k.ks_stat
    FROM auc a CROSS JOIN ks k
    """


@register("roc_auc_eval", oracle=_roc_auc_sql("orders", "customer"))
def roc_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney with average-rank tie handling), Gini
    coefficient and KS statistic for a continuous scorer — the
    threshold-free counterpart to classifier_eval's confusion matrix.
    Score = customer's 1996 spend; label = >=3 orders in 1997 (the same
    persistence setup, now ranking-based). AUC from the rank-sum identity
    needs ONE global rank over |customer| scored rows — at 100 TB the
    rank runs on the post-aggregation customer grain (not the fact
    table), and could shard by score range with offset stitching; KS
    folds the same ECDFs. Exact float parity: average ranks are halves,
    DECIMAL-exact scores, single final divisions — no rounding."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("roc_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "roc_customer"
    )
    return spark.sql(_roc_auc_sql("roc_orders", "roc_customer"))


def _ips_sql(events: str) -> str:
    """Shared off-policy evaluation SQL body (identical on both engines).

    Train half (Jan 1-15) ranks actions per context by DECIMAL-exact mean
    reward; the stochastic target policy assigns rational weights
    (6-rank)/15 so pi is exact. Eval half (Jan 16+) estimates the policy
    value by inverse-propensity scoring against the empirical logging
    propensities. Weights and propensities are exact rationals; only the
    final importance-weighted sums need the 6-dp pin."""
    return f"""
    WITH ev AS (
        SELECT user_id % 4 AS ctx, event_type AS action,
               CAST(COALESCE(value, 0.0) AS DECIMAL(18,2)) AS r,
               ts < TIMESTAMP '2024-01-16' AS is_train
        FROM {events}
    ),
    train_rank AS (
        SELECT ctx, action,
               rank() OVER (PARTITION BY ctx
                            ORDER BY CAST(SUM(r) AS DOUBLE) / COUNT(*) DESC,
                                     action) AS rk
        FROM ev WHERE is_train GROUP BY ctx, action
    ),
    pi AS (
        SELECT ctx, action,
               CAST(6 - rk AS DOUBLE) / 15.0 AS pi_w
        FROM train_rank
    ),
    eval_n AS (
        SELECT ctx, CAST(COUNT(*) AS BIGINT) AS n_ctx FROM ev
        WHERE NOT is_train GROUP BY 1
    ),
    prop AS (
        SELECT ctx, action, CAST(COUNT(*) AS BIGINT) AS n_a
        FROM ev WHERE NOT is_train GROUP BY 1, 2
    ),
    weighted AS (
        SELECT e.ctx,
               COALESCE(pi.pi_w, 0.0)
                 * (CAST(en.n_ctx AS DOUBLE) / CAST(pr.n_a AS DOUBLE)) AS w,
               CAST(e.r AS DOUBLE) AS r
        FROM ev e
        JOIN eval_n en ON e.ctx = en.ctx
        JOIN prop pr ON e.ctx = pr.ctx AND e.action = pr.action
        LEFT JOIN pi ON e.ctx = pi.ctx AND e.action = pi.action
        WHERE NOT e.is_train
    )
    SELECT w.ctx AS context,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           round(SUM(w.w * w.r) / COUNT(*), 6) AS ips_value,
           round(SUM(w.w * w.r) / SUM(w.w), 6) AS snips_value,
           round(SUM(w.r) / COUNT(*), 6) AS logged_value
    FROM weighted w
    GROUP BY 1
    """


@register("offline_policy_eval_ips", oracle=_ips_sql("events"))
def offline_policy_eval_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterfactual (off-policy) evaluation: estimate what a new
    recommendation policy would earn from logged interaction data alone —
    the standard IPS estimator plus its self-normalized variant (SNIPS),
    next to the logging policy's realized value. Target policy: per
    context (user_id % 4), a rank-based stochastic policy fit on the
    first half of January (rational weights (6-rank)/15 over actions
    ranked by DECIMAL-exact mean reward); evaluation on the second half
    reweights each logged (context, action, reward) by
    pi(a|ctx)/p_log(a|ctx) with empirical logging propensities.

    The temporal split prevents the policy from seeing its own eval
    window (same discipline as next_event_prediction_eval). Scale
    posture: two grouped aggregates and one broadcast-sized policy join
    (|contexts| x |actions| rows) over a single pass of the fact —
    no shuffle beyond the context/action groupings. Exactness: pi and
    propensities are exact rationals; only the final weighted sums carry
    the 6-dp pin."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ips_events")
    return spark.sql(_ips_sql("ips_events"))


def _att_sql(orders: str, customer: str) -> str:
    """Shared stratified-ATT SQL body (identical text on both engines)."""
    return f"""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
        FROM {orders}
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    pop AS (
        SELECT c_custkey, c_nationkey,
               CAST(floor(CAST(c_acctbal AS DOUBLE) / 2500.0) AS BIGINT)
                   AS bal_band,
               c_mktsegment = 'BUILDING' AS treated,
               COALESCE(s.y, 0.0) AS y
        FROM {customer} LEFT JOIN spend s ON c_custkey = s.o_custkey
    ),
    strata AS (
        SELECT c_nationkey, bal_band,
               CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
               CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_c,
               SUM(CASE WHEN treated THEN y ELSE 0.0 END) AS sy_t,
               SUM(CASE WHEN NOT treated THEN y ELSE 0.0 END) AS sy_c
        FROM pop GROUP BY 1, 2
    ),
    matched AS (SELECT * FROM strata WHERE n_t > 0 AND n_c > 0)
    SELECT c_nationkey AS nationkey,
           CAST(SUM(n_t) AS BIGINT) AS n_treated,
           CAST(SUM(n_c) AS BIGINT) AS n_control,
           CAST(COUNT(*) AS BIGINT) AS n_strata,
           round(SUM(CAST(n_t AS DOUBLE)
                     * (sy_t / n_t - sy_c / n_c))
                 / SUM(CAST(n_t AS DOUBLE)), 6) AS att_adjusted,
           round(SUM(sy_t) / SUM(CAST(n_t AS DOUBLE))
                 - SUM(sy_c) / SUM(CAST(n_c AS DOUBLE)), 6) AS diff_naive
    FROM matched
    GROUP BY 1
    """


@register("covariate_adjusted_att", oracle=_att_sql("orders", "customer"))
def covariate_adjusted_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified covariate adjustment (direct standardization): the
    average effect of a self-selected 'treatment' (BUILDING market
    segment) on 1997 spend, adjusted by exact stratification on
    nation x account-balance band — the treated-weighted average of
    within-stratum mean differences, next to the naive unadjusted
    difference so the confounding correction is visible. This is the
    observational-causal counterpart to the randomized-experiment suite
    (ab_test_zscore / cuped_adjusted_lift / diff_in_diff): no
    randomization assumed, common-support enforced (strata lacking
    either group are dropped, and the output reports how many survive).

    Scale posture: one fact pre-aggregation to customer grain, one
    stratum aggregate, one nation rollup — all map-side-combinable
    grouped sums; no joins beyond the customer-grain broadcast-sized
    spend table. Exactness: within-stratum means are DECIMAL-exact sums
    divided once; only the cross-band weighted averages carry the 6-dp
    pin."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("att_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "att_customer"
    )
    return spark.sql(_att_sql("att_orders", "att_customer"))


def _kfold_sql(lineitem: str, hash_expr: str) -> str:
    """Shared k-fold CV OLS SQL body. All statistics derive from
    DECIMAL-exact per-fold sufficient sums; train-side sums are
    total-minus-fold (one scan, no per-fold passes), and the test MSE is
    expanded into sufficient statistics (mean(y^2) - 2a*mean(y) - ... )
    so no row-order float accumulation exists anywhere — every value is
    a chain of identical IEEE ops on identical operands, bit-exact
    cross-engine with no rounding."""
    h = hash_expr.format(x="CAST(l_orderkey AS STRING) || ':' || CAST(l_linenumber AS STRING)")
    return f"""
    WITH pts AS (
        SELECT ({h}) % 5 AS fold,
               CAST(l_quantity AS DECIMAL(18,2)) AS x,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM {lineitem}
    ),
    per_fold AS (
        SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sxd, SUM(y) AS syd,
               SUM(x * x) AS sxxd, SUM(x * y) AS sxyd,
               SUM(y * y) AS syyd
        FROM pts GROUP BY 1
    ),
    -- totals sum the per-fold DECIMALs (exact, order-free) and cast ONCE;
    -- summing fold-level doubles here would reintroduce order-dependent
    -- float accumulation across the 5 rows.
    tot AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS n,
               CAST(SUM(sxd) AS DOUBLE) AS sx,
               CAST(SUM(syd) AS DOUBLE) AS sy,
               CAST(SUM(sxxd) AS DOUBLE) AS sxx,
               CAST(SUM(sxyd) AS DOUBLE) AS sxy,
               CAST(SUM(syyd) AS DOUBLE) AS syy
        FROM per_fold
    ),
    pf AS (
        SELECT fold, n, CAST(sxd AS DOUBLE) AS sx,
               CAST(syd AS DOUBLE) AS sy, CAST(sxxd AS DOUBLE) AS sxx,
               CAST(sxyd AS DOUBLE) AS sxy, CAST(syyd AS DOUBLE) AS syy
        FROM per_fold
    ),
    fit AS (
        SELECT f.fold, f.n AS n_test,
               CAST(t.n - f.n AS BIGINT) AS n_train,
               ((t.n - f.n) * (t.sxy - f.sxy)
                - (t.sx - f.sx) * (t.sy - f.sy))
               / ((t.n - f.n) * (t.sxx - f.sxx)
                  - (t.sx - f.sx) * (t.sx - f.sx)) AS b,
               f.sx AS sx, f.sy AS sy, f.sxx AS sxx, f.sxy AS sxy,
               f.syy AS syy, CAST(f.n AS DOUBLE) AS nf,
               (t.sy - f.sy) / (t.n - f.n) AS my_tr,
               (t.sx - f.sx) / (t.n - f.n) AS mx_tr
        FROM pf f CROSS JOIN tot t
    ),
    eval_ AS (
        SELECT fold, n_train, n_test, b AS slope,
               my_tr - b * mx_tr AS a,
               (syy - 2.0 * (my_tr - b * mx_tr) * sy - 2.0 * b * sxy
                + nf * (my_tr - b * mx_tr) * (my_tr - b * mx_tr)
                + 2.0 * (my_tr - b * mx_tr) * b * sx + b * b * sxx)
               / nf AS mse,
               (syy - sy * sy / nf) / nf AS var_y
        FROM fit
    )
    SELECT CAST(fold AS BIGINT) AS fold, n_train, n_test, slope,
           a AS intercept, mse AS test_mse,
           1.0 - mse / var_y AS test_r2
    FROM eval_
    """


@register(
    "kfold_cv_ols",
    oracle=_kfold_sql(
        "lineitem",
        "('0x' || substr(md5({x}), 1, 15))::BIGINT",
    ),
)
def kfold_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated simple OLS (extendedprice on quantity):
    per fold, fit on the other four folds and report held-out MSE and
    R^2 — the model-selection loop every feature pipeline runs, done the
    distributed way. ONE scan computes per-fold DECIMAL-exact sufficient
    sums; each fold's training sums are total-minus-fold, and held-out
    error expands into sufficient statistics, so adding folds costs
    nothing and no row ever flows twice. Deterministic without rounding:
    every emitted number is a fixed chain of IEEE ops on DECIMAL-exact
    operands (no order-dependent float accumulation)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "cv_lineitem"
    )
    return spark.sql(
        _kfold_sql(
            "cv_lineitem",
            "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)",
        )
    )


def _brier_sql(lineitem: str, part: str) -> str:
    """Shared calibration / Brier-decomposition SQL body (identical text
    on both engines)."""
    return f"""
    WITH base AS (
        SELECT p_brand,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               l_shipdate < TIMESTAMP '1995-06-17' AS is_train
        FROM {lineitem} JOIN {part} ON l_partkey = p_partkey
    ),
    pred AS (
        SELECT p_brand,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p_hat
        FROM base WHERE is_train GROUP BY 1
    ),
    ev AS (
        SELECT b.p_brand, pr.p_hat,
               CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(b.y) AS BIGINT) AS s_k,
               CAST(SUM(b.y) AS DOUBLE) / COUNT(*) AS o_k
        FROM base b JOIN pred pr ON b.p_brand = pr.p_brand
        WHERE NOT b.is_train
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n_k) AS DOUBLE) AS n,
               CAST(SUM(s_k) AS DOUBLE) / CAST(SUM(n_k) AS DOUBLE) AS ybar
        FROM ev
    ),
    comp AS (
        SELECT
            round(SUM(n_k * (p_hat - o_k) * (p_hat - o_k)) / t.n, 6)
                AS reliability,
            round(SUM(n_k * (o_k - t.ybar) * (o_k - t.ybar)) / t.n, 6)
                AS resolution,
            round(t.ybar * (1.0 - t.ybar), 6) AS uncertainty,
            round(SUM(n_k * (p_hat * p_hat)
                      - 2.0 * p_hat * s_k
                      + s_k) / t.n, 6) AS brier_direct,
            CAST(t.n AS BIGINT) AS n_eval
        FROM ev CROSS JOIN tot t
        GROUP BY t.n, t.ybar
    )
    SELECT n_eval, brier_direct, reliability, resolution, uncertainty,
           round(reliability - resolution + uncertainty, 6)
               AS brier_decomposed
    FROM comp
    """


@register(
    "calibration_brier_decomposition",
    oracle=_brier_sql("lineitem", "part"),
)
def calibration_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-forecast calibration audit via the Murphy decomposition
    of the Brier score: a per-brand return-rate forecaster is fit on the
    pre-split half of shipments and scored on the rest, emitting the
    directly-computed Brier score next to reliability - resolution +
    uncertainty. Both sides are computed INDEPENDENTLY (the direct score
    from per-row expansion sum(p^2 - 2py + y), the decomposition from
    bin moments), so the hash match machine-checks Murphy's identity on
    real data — same proof-by-identity flavor as
    price_volume_decomposition. Completes the scorer-evaluation family:
    roc_auc_eval ranks, this calibrates.

    Scale posture: everything folds to the 25-brand grain in one pass of
    the fact (map-side combinable); forecasts join back as a broadcast.
    Rates are exact integer divisions; the 25-term component sums carry
    the 6-dp pin."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "cal_lineitem"
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("cal_part")
    return spark.sql(_brier_sql("cal_lineitem", "cal_part"))


def _spearman_sql(orders: str) -> str:
    """Shared Spearman/Pearson SQL body (identical text on both engines).

    Average ranks are exact multiples of 0.5, their products multiples of
    0.25, and all moment sums stay far inside double's exact-integer
    range, so every statistic is a fixed IEEE chain on identical operands
    — bit-exact with no rounding. Raw-value moments go through DECIMAL."""
    return f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS spend,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM {orders} GROUP BY 1
    ),
    ranked AS (
        SELECT spend, n_orders,
               CAST(rank() OVER (ORDER BY spend) AS DOUBLE)
                 + (CAST(COUNT(*) OVER (PARTITION BY spend) AS DOUBLE)
                    - 1.0) / 2.0 AS rx,
               CAST(rank() OVER (ORDER BY n_orders) AS DOUBLE)
                 + (CAST(COUNT(*) OVER (PARTITION BY n_orders) AS DOUBLE)
                    - 1.0) / 2.0 AS ry
        FROM cust
    ),
    m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
               SUM(rx * ry) AS sxy,
               CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS vx,
               CAST(SUM(n_orders) AS DOUBLE) AS vy,
               CAST(SUM(CAST(spend AS DECIMAL(18,2))
                        * CAST(n_orders AS DECIMAL(18,2))) AS DOUBLE)
                   AS vxy,
               CAST(SUM(CAST(spend AS DECIMAL(18,2))
                        * CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS vxx,
               CAST(SUM(n_orders * n_orders) AS DOUBLE) AS vyy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
               AS spearman_rho,
           (n * vxy - vx * vy)
             / (sqrt(n * vxx - vx * vx) * sqrt(n * vyy - vy * vy))
               AS pearson_r
    FROM m
    """


@register("spearman_rank_corr", oracle=_spearman_sql("orders"))
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-aware, via Pearson on average
    ranks) between customer spend and order count, with the raw Pearson
    alongside — the robust/linear contrast every metric review wants
    (Spearman survives the heavy spend tail that drags Pearson). The
    rank trick from roc_auc_eval generalizes: average ranks are exact
    halves, so ALL rank moments are float-exact regardless of
    aggregation order and the statistic needs no rounding; raw moments
    accumulate in DECIMAL and cast once.

    Scale: one customer-grain aggregate, two global rank windows (range-
    partitionable at scale, rfm precedent), one moment fold."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sp_orders")
    return spark.sql(_spearman_sql("sp_orders"))


def _mann_whitney_sql(lineitem: str) -> str:
    """Shared Mann-Whitney U SQL body (identical text on both engines).
    All rank arithmetic stays in BIGINT via the doubled-average-rank
    trick (r2 = 2*rank_min + ties - 1 = twice the midrank), so the U
    statistic, tie term and group sizes are exact integers; the only
    doubles are the final z / effect-size divisions of exact integers
    (deterministic IEEE on both engines, emitted UNROUNDED)."""
    return f"""
    WITH vals AS (
        SELECT l_extendedprice AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
        FROM {lineitem}
    ),
    tied AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(g) AS BIGINT) AS c1
        FROM vals GROUP BY v
    ),
    ranked AS (
        SELECT c, c1,
               CAST(SUM(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM tied
    ),
    stats AS (
        SELECT CAST(SUM(c1 * (2 * (cum - c) + c + 1)) AS BIGINT)
                   AS sum_r2_g1,
               CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c - c1) AS BIGINT) AS n2,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term
        FROM ranked
    )
    SELECT n1, n2,
           (CAST(sum_r2_g1 AS DOUBLE) - n1 * (n1 + CAST(1.0 AS DOUBLE)))
               / 2 AS u1,
           ((CAST(sum_r2_g1 AS DOUBLE) - n1 * (n1 + CAST(1.0 AS DOUBLE)))
               / 2
            - n1 * CAST(n2 AS DOUBLE) / 2)
           / sqrt(n1 * CAST(n2 AS DOUBLE) / 12.0
                  * ((n + 1) - CAST(tie_term AS DOUBLE) / (n * (n - CAST(1.0 AS DOUBLE)))))
               AS z_score,
           (CAST(sum_r2_g1 AS DOUBLE) - n1 * (n1 + CAST(1.0 AS DOUBLE)))
               / (n1 * CAST(n2 AS DOUBLE)) - 1 AS rank_biserial
    FROM stats
    """


@register("mann_whitney_u", oracle=_mann_whitney_sql("lineitem"))
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: do returned line items
    ('R') draw from a different extended-price distribution than the
    rest? Midranks via the doubled-rank BIGINT trick (ties exact, no
    floats in the ranking), normal approximation with the standard tie
    correction, and the rank-biserial effect size r = 2U/(n1 n2) - 1.
    The nonparametric two-sample complement to roc_auc_eval (U/(n1 n2)
    IS the AUC between the groups).

    Scale: one groupBy on the DECIMAL value domain (bounded by the
    price grid), one ordered prefix-sum over the distinct values —
    value-domain-bounded and range-partitionable, the same documented
    posture as the ECDF/KS family — then a single-row reduce. Reference
    scope: src/analytics (statistical comparisons); public method:
    Mann & Whitney 1947."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "mwu_lineitem"
    )
    return spark.sql(_mann_whitney_sql("mwu_lineitem"))


def _odds_ratio_sql(lineitem: str) -> str:
    """Shared 2x2 odds-ratio SQL body: exact integer cell counts with
    the Haldane-Anscombe +0.5 correction applied uniformly; OR, lnOR,
    Woolf SE and the 95% CI are single IEEE expressions (unrounded)."""
    return f"""
    WITH cells AS (
        SELECT
            CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_quantity > 25
                          THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_quantity <= 25
                          THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(SUM(CASE WHEN l_returnflag <> 'R' AND l_quantity > 25
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(SUM(CASE WHEN l_returnflag <> 'R' AND l_quantity <= 25
                          THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM {lineitem}
    )
    SELECT a, b, c, d,
           -- +0.5 smoothing via doubled integer counts (2a+1 etc.):
           -- exact BIGINT products, one double division (a raw 0.5
           -- literal parses as DECIMAL in Spark and diverges from the
           -- oracle's double arithmetic)
           (2 * a + 1) * (2 * d + 1)
               / CAST((2 * b + 1) * (2 * c + 1) AS DOUBLE) AS odds_ratio,
           ln((2 * a + 1) * (2 * d + 1)
              / CAST((2 * b + 1) * (2 * c + 1) AS DOUBLE)) AS ln_or,
           sqrt(CAST(2.0 AS DOUBLE) / (2 * a + 1) + CAST(2.0 AS DOUBLE) / (2 * b + 1)
                + CAST(2.0 AS DOUBLE) / (2 * c + 1) + CAST(2.0 AS DOUBLE) / (2 * d + 1))
               AS woolf_se,
           exp(ln((2 * a + 1) * (2 * d + 1)
                  / CAST((2 * b + 1) * (2 * c + 1) AS DOUBLE))
               - 1.959963984540054
                 * sqrt(CAST(2.0 AS DOUBLE) / (2 * a + 1) + CAST(2.0 AS DOUBLE) / (2 * b + 1)
                        + CAST(2.0 AS DOUBLE) / (2 * c + 1) + CAST(2.0 AS DOUBLE) / (2 * d + 1)))
               AS ci95_low,
           exp(ln((2 * a + 1) * (2 * d + 1)
                  / CAST((2 * b + 1) * (2 * c + 1) AS DOUBLE))
               + 1.959963984540054
                 * sqrt(CAST(2.0 AS DOUBLE) / (2 * a + 1) + CAST(2.0 AS DOUBLE) / (2 * b + 1)
                        + CAST(2.0 AS DOUBLE) / (2 * c + 1) + CAST(2.0 AS DOUBLE) / (2 * d + 1)))
               AS ci95_high
    FROM cells
    """


@register("odds_ratio_2x2", oracle=_odds_ratio_sql("lineitem"))
def odds_ratio_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 odds ratio: is a returned line item more likely to be a
    large-quantity one? Exact integer cell counts, Haldane-Anscombe
    +0.5 smoothing (uniform, so the estimate is defined even with an
    empty cell), Woolf's log-scale standard error and the 95% Wald CI —
    the epidemiology-standard association readout complementing
    gtest_independence's global test.

    Scale: one map-side-combined 4-cell conditional aggregation, single
    row out. Public method: Woolf 1955; Haldane 1956."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "or_lineitem"
    )
    return spark.sql(_odds_ratio_sql("or_lineitem"))


def _kappa_sql(lineitem: str) -> str:
    """Shared Cohen's-kappa SQL body: 2x2 agreement counts are exact
    BIGINT; observed/expected agreement and kappa are single IEEE
    expressions over them."""
    return f"""
    WITH judged AS (
        SELECT CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS r1,
               CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS r2
        FROM {lineitem}
    ),
    cells AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r1 * r2) AS BIGINT) AS a,
               CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS b,
               CAST(SUM((1 - r1) * r2) AS BIGINT) AS c,
               CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS d
        FROM judged
    )
    SELECT n, a, b, c, d,
           (a + CAST(d AS DOUBLE)) / n AS observed_agreement,
           ((a + b) * (a + CAST(c AS DOUBLE)) + (c + d) * (b + CAST(d AS DOUBLE)))
               / (CAST(n AS DOUBLE) * n) AS expected_agreement,
           ((a + CAST(d AS DOUBLE)) / n
            - ((a + b) * (a + CAST(c AS DOUBLE))
               + (c + d) * (b + CAST(d AS DOUBLE)))
              / (CAST(n AS DOUBLE) * n))
           / (1 - ((a + b) * (a + CAST(c AS DOUBLE))
                   + (c + d) * (b + CAST(d AS DOUBLE)))
                  / (CAST(n AS DOUBLE) * n)) AS cohens_kappa
    FROM cells
    """


@register("cohens_kappa_agreement", oracle=_kappa_sql("lineitem"))
def cohens_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two derived binary judgments of a line item
    (high-price vs high-quantity): chance-corrected agreement — the
    label-quality metric annotation pipelines report when two raters
    (or a heuristic vs a model) tag the same corpus. Exact integer
    agreement table; kappa is one expression.

    Scale: one conditional aggregation, single row. Public method:
    Cohen 1960."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ck_lineitem"
    )
    return spark.sql(_kappa_sql("ck_lineitem"))


def _grubbs_sql(orders: str) -> str:
    """Shared Grubbs-outlier SQL body: n-scaled deviations keep the
    argmax comparison exact (|n*x - sx| in BIGINT); the G statistic is
    one IEEE expression over exact sums, tiebreak on date."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders} GROUP BY 1
    ),
    stats AS (
        SELECT d, cents,
               CAST(SUM(cents) OVER () AS BIGINT) AS sx,
               SUM(CAST(cents AS DECIMAL(38,0)) * cents) OVER () AS sxx,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    ranked AS (
        SELECT d, cents, sx, sxx, n,
               ROW_NUMBER() OVER (
                   ORDER BY ABS(n * cents - sx) DESC, d) AS rk
        FROM stats
    )
    SELECT n AS n_days, d AS outlier_date,
           CAST(cents AS DOUBLE) / 100 AS outlier_value_dollars,
           CAST(sx AS DOUBLE) / n / 100 AS mean_dollars,
           ABS(n * cents - CAST(sx AS DOUBLE)) / n
               / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                      / (n * (n - CAST(1.0 AS DOUBLE))))
               AS grubbs_g
    FROM ranked WHERE rk = 1
    """


@register("grubbs_outlier_day", oracle=_grubbs_sql("orders"))
def grubbs_outlier_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test statistic for the most extreme daily revenue: the
    maximum studentized deviation G = max|x - xbar|/s with its date —
    the single-outlier screen complementing the 3-sigma and MAD family
    (Grubbs is the version with an exact small-sample critical value).
    The argmax compares exact n-scaled integer deviations; G is one
    expression over exact sums; date tiebreak pins ties.

    Scale: daily groupBy then calendar-bounded windows. Public method:
    Grubbs 1950."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "gr_orders"
    )
    return spark.sql(_grubbs_sql("gr_orders"))


# ---------------------------------------------------------------------------
# kmeans_lloyd_fixed: VALUE-ORACLED Lloyd's k-means (r10 verdict task 2).
# The library variant (kmeans_segments) stays rows-only because pyspark.ml's
# init is engine-specific; this variant makes the whole training loop
# deterministic and cross-engine reproducible, the bpe_learn_merges doctrine
# applied to Lloyd's:
#   * exact-integer features (days BIGINT, count BIGINT, money CENTS via
#     DECIMAL — sums are order-independent and engine-identical);
#   * deterministic init: the k lowest customer ids seed the centroids, and
#     the seed's cid IS the stable cluster id;
#   * centroids as exact_int_sum / count in DOUBLE — IEEE division of
#     identical operands is identical in Spark and DuckDB;
#   * fixed tiebreaks: argmin by (distance, cluster_id) via row_number;
#   * ROUNDS unrolled rounds, mirrored 1:1 by unrolled CTEs in the oracle;
#   * empty clusters carry their previous centroid (LEFT JOIN + COALESCE).
# Scale shape: the k-row centroid table broadcasts each round; points stay
# distributed; the update is a map-side-combined groupBy on k keys — the
# canonical distributed-Lloyd plan at any corpus size.

_KM_K = 4
_KM_ROUNDS = 3
# distance is computed in a scaled space: monetary cents / 10000.0 keeps the
# three axes within ~1 order of magnitude (pure-double scaling — the same
# literal division in both engines, deterministic)
_KM_MC_SCALE = "10000.0"


def _km_dist(pr, pf, pm, cr, cf, cm):
    """((dr*dr + df*df) + dm*dm) with an explicit, engine-shared tree."""
    dr = pr - cr
    df_ = pf - cf
    dm = pm - cm
    return (dr * dr + df_ * df_) + dm * dm


def _km_oracle() -> str:
    dist = (
        "((CAST(p.r AS DOUBLE) - c.cr) * (CAST(p.r AS DOUBLE) - c.cr)"
        " + (CAST(p.f AS DOUBLE) - c.cf) * (CAST(p.f AS DOUBLE) - c.cf))"
        f" + ((CAST(p.mc AS DOUBLE) / {_KM_MC_SCALE}) - c.cm)"
        f" * ((CAST(p.mc AS DOUBLE) / {_KM_MC_SCALE}) - c.cm)"
    )
    parts = [
        f"""
    WITH pts AS (
        SELECT o_custkey AS cid,
               CAST(date_diff('day', MAX(o_orderdate), {_AS_OF_SQL}) AS BIGINT) AS r,
               CAST(COUNT(*) AS BIGINT) AS f,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS mc
        FROM orders GROUP BY 1
    ),
    ctr0 AS (
        SELECT cid AS cluster_id,
               CAST(r AS DOUBLE) AS cr,
               CAST(f AS DOUBLE) AS cf,
               CAST(mc AS DOUBLE) / {_KM_MC_SCALE} AS cm
        FROM pts ORDER BY cid LIMIT {_KM_K}
    )"""
    ]
    for i in range(1, _KM_ROUNDS + 1):
        parts.append(
            f""",
    asg{i} AS (
        SELECT cid, r, f, mc, cluster_id FROM (
            SELECT p.*, c.cluster_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.cid
                       ORDER BY {dist} ASC, c.cluster_id ASC) AS rn
            FROM pts p CROSS JOIN ctr{i - 1} c
        ) WHERE rn = 1
    ),
    upd{i} AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS sr,
               CAST(SUM(f) AS BIGINT) AS sf,
               CAST(SUM(mc) AS BIGINT) AS sm
        FROM asg{i} GROUP BY 1
    ),
    ctr{i} AS (
        SELECT c.cluster_id,
               COALESCE(CAST(u.sr AS DOUBLE) / CAST(u.n AS DOUBLE), c.cr) AS cr,
               COALESCE(CAST(u.sf AS DOUBLE) / CAST(u.n AS DOUBLE), c.cf) AS cf,
               COALESCE((CAST(u.sm AS DOUBLE) / {_KM_MC_SCALE}) / CAST(u.n AS DOUBLE), c.cm) AS cm
        FROM ctr{i - 1} c LEFT JOIN upd{i} u USING (cluster_id)
    )"""
        )
    parts.append(
        f"""
    SELECT u.cluster_id,
           u.n AS cluster_size,
           u.sr AS sum_recency,
           u.sf AS sum_frequency,
           u.sm AS sum_monetary_cents,
           c.cr AS ctr_recency,
           c.cf AS ctr_frequency,
           c.cm AS ctr_monetary_scaled
    FROM upd{_KM_ROUNDS} u JOIN ctr{_KM_ROUNDS} c USING (cluster_id)
    ORDER BY u.cluster_id
    """
    )
    return "".join(parts)


@register("kmeans_lloyd_fixed", oracle=_km_oracle())
def kmeans_lloyd_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed Lloyd's k-means, value-oracled end to
    end (k={_KM_K}, {_KM_ROUNDS} unrolled rounds) — the trainable-loop
    counterpart of kmeans_segments with every nondeterminism pinned
    (see the block comment above). Reference parity: the clustering
    surface of advanced_features.py:364-408, re-expressed as a fully
    reproducible training loop."""
    orders = load_table(spark, sf_dir, "orders")
    # checkpoint the feature table: every round's assignment crossJoin
    # re-reads it, and without the barrier each round re-scans orders and
    # re-runs the RFM aggregation
    pts = orders.groupBy(F.col("o_custkey").alias("cid")).agg(
        F.datediff(
            F.lit(AS_OF).cast("date"), F.max(F.to_date("o_orderdate"))
        )
        .cast("bigint")
        .alias("r"),
        F.count("*").cast("bigint").alias("f"),
        F.sum(dec("o_totalprice") * 100).cast("bigint").alias("mc"),
    ).localCheckpoint(eager=False)
    mc_scale = float(_KM_MC_SCALE)
    pr = F.col("r").cast("double")
    pf = F.col("f").cast("double")
    pm = F.col("mc").cast("double") / mc_scale
    ctr = (
        pts.orderBy("cid")
        .limit(_KM_K)
        .select(
            F.col("cid").alias("cluster_id"),
            pr.alias("cr"),
            pf.alias("cf"),
            pm.alias("cm"),
        )
    )
    from pyspark.sql.window import Window

    upd = None
    for _i in range(_KM_ROUNDS):
        dist = _km_dist(pr, pf, pm, F.col("cr"), F.col("cf"), F.col("cm"))
        w = Window.partitionBy("cid").orderBy(
            dist.asc(), F.col("cluster_id").asc()
        )
        asg = (
            pts.crossJoin(F.broadcast(ctr))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cid", "r", "f", "mc", "cluster_id")
        )
        upd = asg.groupBy("cluster_id").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("r").cast("bigint").alias("sr"),
            F.sum("f").cast("bigint").alias("sf"),
            F.sum("mc").cast("bigint").alias("sm"),
        )
        ctr = (
            ctr.alias("c")
            .join(upd.alias("u"), "cluster_id", "left")
            .select(
                "cluster_id",
                F.coalesce(
                    F.col("u.sr").cast("double")
                    / F.col("u.n").cast("double"),
                    F.col("c.cr"),
                ).alias("cr"),
                F.coalesce(
                    F.col("u.sf").cast("double")
                    / F.col("u.n").cast("double"),
                    F.col("c.cf"),
                ).alias("cf"),
                F.coalesce(
                    (F.col("u.sm").cast("double") / mc_scale)
                    / F.col("u.n").cast("double"),
                    F.col("c.cm"),
                ).alias("cm"),
            )
            # K rows; referenced twice next round (assignment broadcast +
            # centroid update join) — without the barrier the centroid
            # lineage doubles per round (2^rounds recomputes of round 1)
            .localCheckpoint(eager=False)
        )
    return (
        upd.join(ctr, "cluster_id")
        .select(
            "cluster_id",
            F.col("n").alias("cluster_size"),
            F.col("sr").alias("sum_recency"),
            F.col("sf").alias("sum_frequency"),
            F.col("sm").alias("sum_monetary_cents"),
            F.col("cr").alias("ctr_recency"),
            F.col("cf").alias("ctr_frequency"),
            F.col("cm").alias("ctr_monetary_scaled"),
        )
        .orderBy("cluster_id")
    )
