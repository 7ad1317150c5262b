"""Star-schema build (SURVEY.md §1.4 / §7.1 step 4).

The reference loads dims through a driver-side row-by-row SQLModel upsert
loop (build_gold.py:92-172 — the worst anti-pattern in the codebase). Here
surrogate keys are assigned DISTRIBUTED: row_number over the sorted natural
key for small dims, and a generated calendar dim. Fact build = broadcast
left joins on natural keys (build_gold.py:214-233 semantics).

- dim_date_build     generated calendar+fiscal dim (star_schema_builder.py:
                     96-193: month/day names, ISO week, weekend, July-start
                     fiscal year/quarter/month)
- dim_product_build  surrogate keys via row_number over natural key
- fact_sale_build    degenerate invoice attrs + measures incl. derived
                     discount/tax/profit/margin (build_gold.py:222-233,
                     resolvers.py:88-101 field surface)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from .catalog import register


@register(
    "dim_date_build",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds
    )
    SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS INT) AS date_key,
           d AS date,
           CAST(year(d) AS INT) AS year,
           CAST(quarter(d) AS INT) AS quarter,
           CAST(month(d) AS INT) AS month,
           CAST(day(d) AS INT) AS day,
           monthname(d) AS month_name,
           dayname(d) AS day_name,
           CAST(weekofyear(d) AS INT) AS week_of_year,
           isodow(d) >= 6 AS is_weekend,
           CAST(CASE WHEN month(d) >= 7 THEN year(d) + 1 ELSE year(d) END AS INT)
               AS fiscal_year,
           CAST(((month(d) + 5) % 12) // 3 + 1 AS INT) AS fiscal_quarter,
           CAST(((month(d) + 5) % 12) + 1 AS INT) AS fiscal_month
    FROM days
    """,
)
def dim_date_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dim generated over the orders date span; July-start fiscal
    calendar (star_schema_builder.py:154-184)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    d = F.col("d")
    fiscal_month0 = (F.month(d) + 5) % 12  # Jul→0 ... Jun→11
    return days.select(
        (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).cast("int").alias("date_key"),
        d.alias("date"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.weekofyear(d).alias("week_of_year"),
        (((F.dayofweek(d) + 5) % 7 + 1) >= 6).alias("is_weekend"),
        F.when(F.month(d) >= 7, F.year(d) + 1).otherwise(F.year(d)).cast("int").alias("fiscal_year"),
        F.expr(f"CAST({'((month(d) + 5) % 12) DIV 3 + 1'} AS INT)").alias("fiscal_quarter"),
        (fiscal_month0 + 1).cast("int").alias("fiscal_month"),
    )


@register(
    "dim_product_build",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS product_key,
           CAST(p_partkey AS VARCHAR) AS stock_code,
           p_name AS description,
           p_type AS category,
           p_brand AS brand,
           p_retailprice AS price
    FROM part
    """,
)
def dim_product_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate keys via row_number over the sorted natural key. A global
    window is acceptable for DIMENSIONS (bounded row count); facts never get
    one. For billion-row dims switch to zipWithIndex-free monotonic ids +
    a key-map table, or keep natural keys."""
    part = load_table(spark, sf_dir, "part")
    w = Window.orderBy("p_partkey")
    return part.select(
        F.row_number().over(w).cast("bigint").alias("product_key"),
        F.col("p_partkey").cast("string").alias("stock_code"),
        F.col("p_name").alias("description"),
        F.col("p_type").alias("category"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("price"),
    )


@register(
    "fact_sale_build",
    oracle="""
    SELECT l_orderkey * 10 + l_linenumber AS sale_id,
           CAST(year(l_shipdate) * 10000 + month(l_shipdate) * 100 + day(l_shipdate) AS INT)
               AS date_key,
           l_partkey AS product_key,
           o_custkey AS customer_key,
           CAST(c_nationkey AS BIGINT) AS country_key,
           l_orderkey AS invoice_key,
           CAST(l_quantity AS INT) AS quantity,
           l_extendedprice / l_quantity AS unit_price,
           l_extendedprice * (1 - l_discount) AS total_amount,
           l_extendedprice * l_discount AS discount_amount,
           l_extendedprice * (1 - l_discount) * l_tax AS tax_amount,
           l_extendedprice * (1 - l_discount) - l_quantity * p_retailprice * 0.8e0
               AS profit_amount,
           (l_extendedprice * (1 - l_discount) - l_quantity * p_retailprice * 0.8e0)
               / (l_extendedprice * (1 - l_discount)) AS margin_percentage
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    """,
)
def fact_sale_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact build: natural-key joins (part/customer broadcast-able), measures
    derived row-wise (deterministic IEEE — no aggregation). sale_id is a
    deterministic business-key composite, NOT monotonically_increasing_id
    (partition-layout-dependent, SURVEY §7.3 item 4)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    total = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    profit = total - F.col("l_quantity") * F.col("p_retailprice") * 0.8
    sd = F.col("l_shipdate")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("sale_id"),
            (F.year(sd) * 10000 + F.month(sd) * 100 + F.dayofmonth(sd))
            .cast("int")
            .alias("date_key"),
            F.col("l_partkey").alias("product_key"),
            F.col("o_custkey").alias("customer_key"),
            F.col("c_nationkey").cast("bigint").alias("country_key"),
            F.col("l_orderkey").alias("invoice_key"),
            F.col("l_quantity").cast("int").alias("quantity"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
            total.alias("total_amount"),
            (F.col("l_extendedprice") * F.col("l_discount")).alias("discount_amount"),
            (total * F.col("l_tax")).alias("tax_amount"),
            profit.alias("profit_amount"),
            (profit / total).alias("margin_percentage"),
        )
    )


@register(
    "late_dim_repair",
    oracle="""
    WITH partial_dim AS (
        SELECT c_custkey, c_name FROM customer WHERE c_custkey % 11 <> 0
    ),
    phase1 AS (
        SELECT o_orderkey,
               COALESCE(d.c_custkey, -1) AS member_key_p1
        FROM orders LEFT JOIN partial_dim d ON o_custkey = d.c_custkey
    ),
    phase2 AS (
        SELECT p.o_orderkey, p.member_key_p1,
               COALESCE(d.c_custkey, -1) AS member_key_p2
        FROM phase1 p
        JOIN orders o ON p.o_orderkey = o.o_orderkey
        LEFT JOIN customer d ON o.o_custkey = d.c_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_facts,
           CAST(COUNT(CASE WHEN member_key_p1 = -1 THEN 1 END) AS BIGINT)
               AS unknown_after_load,
           CAST(COUNT(CASE WHEN member_key_p1 = -1 AND member_key_p2 <> -1
                           THEN 1 END) AS BIGINT) AS repaired,
           CAST(COUNT(CASE WHEN member_key_p2 = -1 THEN 1 END) AS BIGINT)
               AS still_unknown
    FROM phase2
    """,
)
def late_dim_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving dimension handling: facts loaded before their
    dimension member exists take the 'unknown member' (-1) surrogate,
    then a repair pass re-resolves them once the dim catches up — the
    standard inferred-member pattern (Kimball) behind every streaming
    star schema. Simulated by hiding every 11th customer during phase 1
    and restoring the full dim in phase 2; the report counts
    unknown->repaired transitions. Both phases are broadcast dim joins;
    the repair re-touches only rows, not history rewrites."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    partial = cust.filter(F.col("c_custkey") % 11 != 0).select(
        F.col("c_custkey").alias("p1_key")
    )
    full = cust.select(F.col("c_custkey").alias("p2_key"))
    j = (
        orders.join(F.broadcast(partial), orders.o_custkey == F.col("p1_key"), "left")
        .join(F.broadcast(full), orders.o_custkey == F.col("p2_key"), "left")
        .select(
            F.coalesce("p1_key", F.lit(-1)).alias("m1"),
            F.coalesce("p2_key", F.lit(-1)).alias("m2"),
        )
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_facts"),
        F.count(F.when(F.col("m1") == -1, 1)).cast("bigint").alias(
            "unknown_after_load"
        ),
        F.count(F.when((F.col("m1") == -1) & (F.col("m2") != -1), 1))
        .cast("bigint")
        .alias("repaired"),
        F.count(F.when(F.col("m2") == -1, 1)).cast("bigint").alias(
            "still_unknown"
        ),
    )
