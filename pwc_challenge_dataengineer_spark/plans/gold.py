"""Gold analytics tables, re-expressed on the driver's TPC-H-ish testdata.

Reference semantics (SURVEY.md §2.4/§2.5; src/etl/gold/spark_gold.py):
- sales_summary      spark_gold.py:48-65   (groupBy country/year/month, 6 aggs + ratio)
- product_analysis   spark_gold.py:68-90   (product aggs + revenue rank in country)
- customer_metrics   spark_gold.py:97-111  (per-customer lifetime aggs + datediff)
- time_series        spark_gold.py:144-166 (daily metrics + 7-day moving average)
- cohort_analysis    spark_gold.py:169-198 (first-purchase cohort, months_between periods)
- rfm_segmentation   spark_gold.py:113-135 (ntile(5) scores + segment mapping)
- customer_segmentation spark_gold.py:252-259 (value-tier case mapping)

Mapping (FIXTURES.md): country→nation, invoice→order, product→part,
line grain→lineitem.

Scale notes: the dimension joins (nation: 25 rows, region: 5, part: small)
are explicitly broadcast. Aggregations are plain groupBy so Catalyst does
partial (map-side) aggregation before the shuffle. The one structurally
non-scalable construct in the reference — a GLOBAL ntile window for RFM — is
kept for exact oracle parity at test SF, with the 100 TB path (approxQuantile
bucket boundaries) implemented in operators/scalable.py.

Float parity with the DuckDB oracle: see plans/_parity.py — money aggregates
run in exact DECIMAL and are emitted as deterministic doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from ._parity import REV_DEC_SQL, REV_SUM_SQL, dec, money_sum, money_sum_sql, rev_dec, rev_sum
from .catalog import register


def _sales_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation star join.

    orders/customer shuffle-join on their keys; nation is broadcast.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )


_SALES_BASE_SQL = """
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
"""


@register(
    "sales_summary",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT)  AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           count(*) AS transaction_count,
           {REV_SUM_SQL} AS total_revenue,
           {REV_SUM_SQL} / count(*) AS avg_line_amount,
           SUM(l_quantity) AS total_quantity,
           COUNT(DISTINCT o_custkey) AS unique_customers,
           COUNT(DISTINCT l_orderkey) AS unique_invoices,
           {REV_SUM_SQL} / COUNT(DISTINCT o_custkey) AS revenue_per_customer
    {_SALES_BASE_SQL}
    GROUP BY 1, 2, 3
    """,
)
def sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13: aggregate-before-join (guide §2.3). lineitem first collapses to
    ORDER grain (count/revenue/quantity per l_orderkey — decimal sums are
    associative, so sum-of-order-sums is bit-identical to the flat sum);
    the order-grain rows then flow through the dim joins, ~4x fewer rows
    and bytes than line grain. An order has exactly one (custkey,
    orderdate), so every order lands in one group: COUNT(DISTINCT
    l_orderkey) becomes a plain COUNT(*) at order grain, leaving ONE
    distinct aggregate — the Expand×3 over the joined line rows disappears
    from the plan. At 100 TB the groupBy(l_orderkey) exchange doubles as
    the join exchange (same key), so this also removes a full shuffle of
    the fact table."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("__n_lines"),
        F.sum(rev_dec()).alias("__rev"),
        F.sum("l_quantity").alias("__qty"),
    )
    joined = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    rev = F.sum("__rev").cast("double")
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(
        F.sum("__n_lines").alias("transaction_count"),
        rev.alias("total_revenue"),
        (rev / F.sum("__n_lines")).alias("avg_line_amount"),
        F.sum("__qty").alias("total_quantity"),
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.count("*").alias("unique_invoices"),
        (rev / F.countDistinct("o_custkey")).alias("revenue_per_customer"),
    )


@register(
    "product_analysis",
    oracle=f"""
    WITH prod AS (
        SELECT p_partkey, p_name, p_brand,
               {REV_SUM_SQL} AS total_revenue,
               SUM(l_quantity) AS total_quantity,
               count(*) AS times_sold,
               COUNT(DISTINCT l_orderkey) AS unique_orders
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3
    )
    SELECT *,
           CAST(row_number() OVER (
               PARTITION BY p_brand
               ORDER BY total_revenue DESC, p_partkey) AS INT) AS revenue_rank
    FROM prod
    """,
)
def product_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13: aggregate-before-join (guide §2.3) — lineitem collapses to PART
    grain before the dim join (the join is key-preserving: p_partkey is the
    part table's key, so per-partkey groups are identical on either side of
    it). The broadcast join then probes #parts rows instead of #lineitems
    (~30x fewer here), and the aggregate hash map keys on one bigint
    instead of (bigint, name, brand). Measured 2.0x at sf0.1."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = lineitem.groupBy("l_partkey").agg(
        rev_sum().alias("total_revenue"),
        F.sum("l_quantity").alias("total_quantity"),
        F.count("*").alias("times_sold"),
        F.countDistinct("l_orderkey").alias("unique_orders"),
    )
    prod = per_part.join(
        F.broadcast(part), per_part.l_partkey == part.p_partkey
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "total_revenue",
        "total_quantity",
        "times_sold",
        "unique_orders",
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("total_revenue").desc(), F.col("p_partkey")
    )
    return prod.withColumn("revenue_rank", F.row_number().over(w))


@register(
    "customer_metrics",
    oracle=f"""
    SELECT c_custkey AS customer_id, c_name AS customer_name, n_name AS nation,
           {money_sum_sql('o_totalprice')} AS total_spent,
           COUNT(*) AS total_orders,
           {money_sum_sql('o_totalprice')} / COUNT(*) AS avg_order_value,
           CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
           CAST(MAX(o_orderdate) AS DATE) AS last_order_date,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS INT)
               AS customer_lifespan_days
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13: aggregate-before-join (guide §2.3). The group key's extra
    columns (c_name, n_name) are functionally determined by c_custkey, so
    orders first collapses to CUSTOMER grain on its own key and the dim
    joins run at customer grain (~10x fewer probe rows), with the aggregate
    hash map keyed on one bigint instead of (bigint, string, string).
    Inner-join semantics are preserved: a custkey with no customer row
    drops after the pre-aggregation exactly as its order rows dropped
    before it."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        money_sum("o_totalprice").alias("total_spent"),
        F.count("*").alias("total_orders"),
        (money_sum("o_totalprice") / F.count("*")).alias("avg_order_value"),
        F.min(F.to_date("o_orderdate")).alias("first_order_date"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias(
            "customer_lifespan_days"
        ),
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation"),
            "total_spent",
            "total_orders",
            "avg_order_value",
            "first_order_date",
            "last_order_date",
            "customer_lifespan_days",
        )
    )


@register(
    "time_series_daily",
    oracle=f"""
    WITH daily AS (
        SELECT n_name AS nation,
               CAST(o_orderdate AS DATE) AS order_date,
               SUM({REV_DEC_SQL}) AS rev_dec,
               SUM(l_quantity) AS daily_quantity,
               COUNT(DISTINCT l_orderkey) AS daily_orders
        {_SALES_BASE_SQL}
        GROUP BY 1, 2
    )
    SELECT nation, order_date,
           CAST(rev_dec AS DOUBLE) AS daily_revenue,
           daily_quantity, daily_orders,
           CAST(SUM(rev_dec) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS revenue_ma7
    FROM daily
    WINDOW w AS (PARTITION BY nation ORDER BY order_date
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def time_series_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily metrics + 7-day moving average (spark_gold.py:144-166).

    The moving average is SUM-over-frame / COUNT-over-frame with the sum in
    exact decimal, so the value is order-independent and oracle-identical.
    """
    # r13: aggregate-before-join (guide §2.3) — lineitem collapses to order
    # grain first (decimal sums are associative), the dim joins run at ~4x
    # fewer rows, and COUNT(DISTINCT l_orderkey) becomes COUNT(*) at order
    # grain (orders land in exactly one (nation, day) group), dropping the
    # two-phase distinct aggregation. Measured 1.19x at sf0.1.
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(rev_dec()).alias("__rev"),
        F.sum("l_quantity").alias("__qty"),
    )
    daily = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.to_date("o_orderdate").alias("order_date"),
        )
        .agg(
            F.sum("__rev").alias("rev_dec"),
            F.sum("__qty").alias("daily_quantity"),
            F.count("*").alias("daily_orders"),
        )
    )
    w = Window.partitionBy("nation").orderBy("order_date").rowsBetween(-6, 0)
    return daily.select(
        "nation",
        "order_date",
        F.col("rev_dec").cast("double").alias("daily_revenue"),
        "daily_quantity",
        "daily_orders",
        (F.sum("rev_dec").over(w).cast("double") / F.count("*").over(w)).alias(
            "revenue_ma7"
        ),
    )


@register(
    "cohort_analysis",
    oracle=f"""
    WITH firsts AS (
        SELECT o_custkey,
               CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort_month
        FROM orders GROUP BY 1
    )
    SELECT cohort_month,
           CAST((year(date_trunc('month', o_orderdate)) - year(cohort_month)) * 12
              + (month(date_trunc('month', o_orderdate)) - month(cohort_month))
              AS INT) AS period_number,
           COUNT(DISTINCT o.o_custkey) AS active_customers,
           {money_sum_sql('o_totalprice')} AS cohort_revenue
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)
def cohort_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-purchase cohorts (spark_gold.py:169-198). The period number is
    whole months between cohort month and order month, computed with integer
    year/month arithmetic so Spark and the oracle agree exactly."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.to_date(F.date_trunc("month", F.min("o_orderdate"))).alias("cohort_month")
    )
    om = F.to_date(F.date_trunc("month", F.col("o_orderdate")))
    return (
        orders.join(firsts, "o_custkey")
        .withColumn(
            "period_number",
            (F.year(om) - F.year("cohort_month")) * 12
            + (F.month(om) - F.month("cohort_month")),
        )
        .groupBy("cohort_month", "period_number")
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            money_sum("o_totalprice").alias("cohort_revenue"),
        )
    )


# RFM: scores via global ntile(5) with deterministic tiebreaks. Recency is
# anchored to the dataset's max order date (not wall-clock) for determinism.
_RFM_SQL = f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
    base AS (
        SELECT o_custkey AS customer_id,
               CAST(date_diff('day', MAX(o_orderdate), (SELECT max_date FROM anchor)) AS INT)
                   AS recency_days,
               COUNT(*) AS frequency,
               {money_sum_sql('o_totalprice')} AS monetary
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT *,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, customer_id) AS INT) AS recency_score,
           CAST(ntile(5) OVER (ORDER BY frequency ASC,  customer_id) AS INT) AS frequency_score,
           CAST(ntile(5) OVER (ORDER BY monetary ASC,   customer_id) AS INT) AS monetary_score
        FROM base
    )
    SELECT *,
           recency_score * 100 + frequency_score * 10 + monetary_score AS rfm_code,
           CASE
             WHEN recency_score >= 4 AND frequency_score >= 4 AND monetary_score >= 4
                  THEN 'champion'
             WHEN frequency_score >= 4 THEN 'loyal'
             WHEN monetary_score >= 4 THEN 'big_spender'
             WHEN recency_score <= 2 AND frequency_score >= 3 THEN 'at_risk'
             WHEN recency_score <= 2 THEN 'hibernating'
             ELSE 'regular'
           END AS rfm_segment
    FROM scored
"""


@register("rfm_segmentation", oracle=_RFM_SQL)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation (spark_gold.py:113-135).

    NOTE 100 TB: the unpartitioned ntile window sorts all customers through a
    single task. This exact-quintile version exists for oracle parity; the
    scale path is ``operators.scalable.quantile_bucket`` (approxQuantile
    boundaries + broadcast range lookup), same segment mapping.
    """
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("max_date"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            money_sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("max_date", "last_order"))
        .drop("last_order", "max_date")
    )
    scored = (
        base.withColumn(
            "recency_score",
            F.ntile(5).over(Window.orderBy(F.col("recency_days").desc(), "customer_id")),
        )
        .withColumn(
            "frequency_score",
            F.ntile(5).over(Window.orderBy(F.col("frequency").asc(), "customer_id")),
        )
        .withColumn(
            "monetary_score",
            F.ntile(5).over(Window.orderBy(F.col("monetary").asc(), "customer_id")),
        )
    )
    return scored.select(
        "customer_id",
        "recency_days",
        "frequency",
        "monetary",
        "recency_score",
        "frequency_score",
        "monetary_score",
        (
            F.col("recency_score") * 100
            + F.col("frequency_score") * 10
            + F.col("monetary_score")
        ).alias("rfm_code"),
        F.when(
            (F.col("recency_score") >= 4)
            & (F.col("frequency_score") >= 4)
            & (F.col("monetary_score") >= 4),
            "champion",
        )
        .when(F.col("frequency_score") >= 4, "loyal")
        .when(F.col("monetary_score") >= 4, "big_spender")
        .when((F.col("recency_score") <= 2) & (F.col("frequency_score") >= 3), "at_risk")
        .when(F.col("recency_score") <= 2, "hibernating")
        .otherwise("regular")
        .alias("rfm_segment"),
    )


@register(
    "customer_segmentation",
    oracle=f"""
    WITH m AS (
        SELECT o_custkey AS customer_id,
               {money_sum_sql('o_totalprice')} AS total_spent,
               COUNT(*) AS total_orders,
               {money_sum_sql('o_totalprice')} / COUNT(*) AS avg_order_value
        FROM orders GROUP BY 1
    )
    SELECT *,
           CASE WHEN total_spent >= 300000 THEN 'high_value'
                WHEN total_spent >= 150000 THEN 'medium_value'
                ELSE 'low_value' END AS value_segment,
           CASE WHEN total_orders >= 15 THEN 'frequent'
                WHEN total_orders >= 8  THEN 'regular'
                ELSE 'occasional' END AS frequency_segment
    FROM m
    """,
)
def customer_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-based value/frequency tiers (spark_gold.py:252-259 table 3)."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        money_sum("o_totalprice").alias("total_spent"),
        F.count("*").alias("total_orders"),
        (money_sum("o_totalprice") / F.count("*")).alias("avg_order_value"),
    )
    return m.select(
        "*",
        F.when(F.col("total_spent") >= 300000, "high_value")
        .when(F.col("total_spent") >= 150000, "medium_value")
        .otherwise("low_value")
        .alias("value_segment"),
        F.when(F.col("total_orders") >= 15, "frequent")
        .when(F.col("total_orders") >= 8, "regular")
        .otherwise("occasional")
        .alias("frequency_segment"),
    )


_RFM_SCALED_SQL = f"""
    WITH base AS (
        SELECT o_custkey AS customer_id,
               CAST(date_diff('day', MAX(o_orderdate),
                    (SELECT MAX(o_orderdate) FROM orders)) AS INT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               {money_sum_sql('o_totalprice')} AS monetary
        FROM orders GROUP BY 1
    ),
    b AS (
        SELECT quantile_disc(CAST(recency_days AS DOUBLE), 0.2) AS r1,
               quantile_disc(CAST(recency_days AS DOUBLE), 0.4) AS r2,
               quantile_disc(CAST(recency_days AS DOUBLE), 0.6) AS r3,
               quantile_disc(CAST(recency_days AS DOUBLE), 0.8) AS r4,
               quantile_disc(CAST(frequency AS DOUBLE), 0.2) AS f1,
               quantile_disc(CAST(frequency AS DOUBLE), 0.4) AS f2,
               quantile_disc(CAST(frequency AS DOUBLE), 0.6) AS f3,
               quantile_disc(CAST(frequency AS DOUBLE), 0.8) AS f4,
               quantile_disc(monetary, 0.2) AS m1,
               quantile_disc(monetary, 0.4) AS m2,
               quantile_disc(monetary, 0.6) AS m3,
               quantile_disc(monetary, 0.8) AS m4
        FROM base
    ),
    scored AS (
        SELECT customer_id, recency_days, frequency, monetary,
               CAST(6 - (CASE WHEN recency_days > r4 THEN 5
                              WHEN recency_days > r3 THEN 4
                              WHEN recency_days > r2 THEN 3
                              WHEN recency_days > r1 THEN 2
                              ELSE 1 END) AS INT) AS recency_score,
               CAST(CASE WHEN frequency > f4 THEN 5
                         WHEN frequency > f3 THEN 4
                         WHEN frequency > f2 THEN 3
                         WHEN frequency > f1 THEN 2
                         ELSE 1 END AS INT) AS frequency_score,
               CAST(CASE WHEN monetary > m4 THEN 5
                         WHEN monetary > m3 THEN 4
                         WHEN monetary > m2 THEN 3
                         WHEN monetary > m1 THEN 2
                         ELSE 1 END AS INT) AS monetary_score
        FROM base CROSS JOIN b
    )
    SELECT *,
           recency_score * 100 + frequency_score * 10 + monetary_score AS rfm_code,
           CASE WHEN recency_score >= 4 AND frequency_score >= 4
                     AND monetary_score >= 4 THEN 'champion'
                WHEN frequency_score >= 4 THEN 'loyal'
                WHEN monetary_score >= 4 THEN 'big_spender'
                WHEN recency_score <= 2 AND frequency_score >= 3 THEN 'at_risk'
                WHEN recency_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS rfm_segment
    FROM scored
"""


@register("rfm_segmentation_scaled", oracle=_RFM_SCALED_SQL)
def rfm_segmentation_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB RFM path (SURVEY §7.3.1 divergence note): quintiles from
    approxQuantile boundaries + a codegen'd CASE lookup instead of the
    exact path's three unpartitioned ntile sorts. Cost: one boundary
    aggregation per feature + one scan — no global sort anywhere.

    Divergence vs exact ntile: customers tied ON a boundary value all land
    in the lower bucket (ntile splits ties by the customer_id tiebreaker to
    equalize bucket sizes), so bucket populations differ near ties —
    especially for the small-integer frequency feature. The oracle pins the
    SAME boundary semantics via quantile_disc, verified value-exact against
    approxQuantile(ε=1e-6) on this data."""
    from ..operators.scalable import quantile_bucket

    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("max_date"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            money_sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("max_date", "last_order"))
        .drop("last_order", "max_date")
    )
    scored = quantile_bucket(
        base, "recency_days", 5, out_col="recency_score",
        relative_error=1e-6, descending=True,
    )
    scored = quantile_bucket(
        scored, "frequency", 5, out_col="frequency_score", relative_error=1e-6
    )
    scored = quantile_bucket(
        scored, "monetary", 5, out_col="monetary_score", relative_error=1e-6
    )
    return scored.select(
        "customer_id",
        "recency_days",
        "frequency",
        "monetary",
        "recency_score",
        "frequency_score",
        "monetary_score",
        (
            F.col("recency_score") * 100
            + F.col("frequency_score") * 10
            + F.col("monetary_score")
        ).alias("rfm_code"),
        F.when(
            (F.col("recency_score") >= 4)
            & (F.col("frequency_score") >= 4)
            & (F.col("monetary_score") >= 4),
            "champion",
        )
        .when(F.col("frequency_score") >= 4, "loyal")
        .when(F.col("monetary_score") >= 4, "big_spender")
        .when((F.col("recency_score") <= 2) & (F.col("frequency_score") >= 3), "at_risk")
        .when(F.col("recency_score") <= 2, "hibernating")
        .otherwise("regular")
        .alias("rfm_segment"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_m
        FROM orders GROUP BY 1
    ),
    cohort_sizes AS (
        SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM firsts GROUP BY 1
    ),
    rev AS (
        SELECT f.cohort_m,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cohort_m
                   AS month_n,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(r.cohort_m AS INT) AS cohort_m,
           CAST(r.month_n AS INT) AS month_n,
           s.cohort_users,
           CAST(SUM(r.rev_dec) OVER (PARTITION BY r.cohort_m ORDER BY r.month_n
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / s.cohort_users AS cum_ltv_per_user
    FROM rev r JOIN cohort_sizes s ON r.cohort_m = s.cohort_m
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV triangle: for each acquisition cohort (first-order
    month), revenue per cohort member accumulated over months-since-
    acquisition — the curve whose plateau IS the LTV estimate, the
    payback-period chart every subscription/retail business draws.
    Months are compared as year*12+month integers (Spark months_between
    is fractional and DuckDB date_diff('month') is calendar-boundary —
    neither matches the other; explicit integer arithmetic matches
    itself). Decimal cumsum inside the per-cohort window; one division
    by the integer cohort size. Shuffles: custkey (firsts), cohort join,
    cohort-keyed window — each over progressively tinier data."""
    orders = load_table(spark, sf_dir, "orders")
    month_idx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = orders.groupBy("o_custkey").agg(F.min(month_idx).alias("cohort_m"))
    cohort_sizes = firsts.groupBy("cohort_m").agg(
        F.count("*").cast("bigint").alias("cohort_users")
    )
    rev = (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_m", (month_idx - F.col("cohort_m")).alias("month_n")
        )
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("month_n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.join(F.broadcast(cohort_sizes), "cohort_m").select(
        F.col("cohort_m").cast("int").alias("cohort_m"),
        F.col("month_n").cast("int").alias("month_n"),
        "cohort_users",
        (F.sum("rev_dec").over(w).cast("double") / F.col("cohort_users")).alias(
            "cum_ltv_per_user"
        ),
    )
