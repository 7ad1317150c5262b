"""Datamart / serving-layer queries (SURVEY.md §3.2, §2.6).

The reference serves these through FastAPI → SQLAlchemy → Postgres
(src/api/v1/services/datamart_service.py); here each endpoint is a
parameterized function over the warehouse tables executed by Spark —
same result surface, Catalyst instead of Postgres as the optimizer.

- sales_analytics_quarterly  datamart_service.py:94-176 (+granularity map :585-597)
- top10_products_by_qty      datamart_service.py:314-376 (top-N by metric)
- country_performance        datamart_service.py:378-419 (share-of-total via
                             window sum over unpartitioned frame — tiny input)
- seasonal_trends            datamart_service.py:421-473 (month-of-year profile)
- paginated_orders           sales_repository.py:65-110 (sort map + offset page)
- keyset_orders_page         cursor_pagination.py (cursor predicate + limit)
- purchase_history_last3     datamart_service.py:237-248 (per-customer drill-down)
- customer_drilldown         datamart_service.py:217-312 (profile + favorite brand)
- sort_mapped_orders         sales_repository.py:65-77 (sort=field:dir whitelist)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.pagination import paginate_keyset, paginate_offset
from ..schemas import load_table
from ._parity import REV_SUM_SQL, dec, money_sum_sql, rev_sum
from .catalog import register


@register(
    "sales_analytics_quarterly",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS period_year,
           CAST(quarter(o_orderdate) AS INT) AS period_quarter,
           COUNT(*) AS order_count,
           {money_sum_sql('o_totalprice')} AS revenue,
           {money_sum_sql('o_totalprice')} / COUNT(*) AS avg_order_value,
           COUNT(DISTINCT o_custkey) AS active_customers
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY 1, 2
    """,
)
def sales_analytics_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sales_analytics(spark, sf_dir, granularity="quarter")


def sales_analytics(
    spark: SparkSession, sf_dir: str, granularity: str = "month"
) -> DataFrame:
    """Parameterized time-granularity analytics (year/quarter/month/day)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    keys = [F.year("o_orderdate").alias("period_year")]
    if granularity == "quarter":
        keys.append(F.quarter("o_orderdate").alias("period_quarter"))
    elif granularity == "month":
        keys.append(F.month("o_orderdate").alias("period_month"))
    elif granularity == "day":
        keys.append(F.to_date("o_orderdate").alias("period_date"))
    return orders.groupBy(*keys).agg(
        F.count("*").alias("order_count"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        (F.sum(dec("o_totalprice")).cast("double") / F.count("*")).alias(
            "avg_order_value"
        ),
        F.countDistinct("o_custkey").alias("active_customers"),
    )


@register(
    "top10_products_by_qty",
    oracle="""
    SELECT p_partkey, p_name, p_brand,
           SUM(l_quantity) AS total_quantity,
           COUNT(*) AS times_sold
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2, 3
    ORDER BY total_quantity DESC, p_partkey
    LIMIT 10
    """,
)
def top10_products_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_products(spark, sf_dir, metric="quantity", n=10)


def top_products(
    spark: SparkSession, sf_dir: str, metric: str = "revenue", n: int = 10
) -> DataFrame:
    """Top-N products by a caller-selected metric. orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-N, no global sort."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from ._parity import rev_sum

    metric_col = {
        "revenue": rev_sum().alias("total_revenue"),
        "quantity": F.sum("l_quantity").alias("total_quantity"),
        "orders": F.countDistinct("l_orderkey").alias("unique_orders"),
    }[metric]
    sort_name = {"revenue": "total_revenue", "quantity": "total_quantity", "orders": "unique_orders"}[metric]
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(metric_col, F.count("*").alias("times_sold"))
        .orderBy(F.col(sort_name).desc(), "p_partkey")
        .limit(n)
    )


@register(
    "country_performance",
    oracle=f"""
    WITH per_nation AS (
        SELECT n_name AS nation, r_name AS region,
               COUNT(DISTINCT o_orderkey) AS orders_cnt,
               COUNT(DISTINCT o_custkey) AS customers_cnt,
               {money_sum_sql('o_totalprice')} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    )
    SELECT *,
           revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER () AS DOUBLE)
               AS revenue_share,
           CAST(rank() OVER (ORDER BY revenue DESC, nation) AS INT) AS revenue_rank
    FROM per_nation
    """,
)
def country_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation performance with share-of-total. The unpartitioned window
    runs over ≤ #nations rows (post-aggregation), so it is scale-safe."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.countDistinct("o_orderkey").alias("orders_cnt"),
            F.countDistinct("o_custkey").alias("customers_cnt"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.col("revenue").desc(), "nation")
    return per_nation.select(
        "*",
        (F.col("revenue") / F.sum(dec("revenue")).over(w_all).cast("double")).alias(
            "revenue_share"
        ),
        F.rank().over(w_rank).alias("revenue_rank"),
    )


@register(
    "seasonal_trends",
    oracle=f"""
    WITH m AS (
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS order_month,
               {money_sum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT order_month,
           CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_monthly_revenue,
           CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
           COUNT(*) AS years_observed
    FROM m GROUP BY 1
    """,
)
def seasonal_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality profile (two-phase aggregation; the rev
    re-cast to DECIMAL keeps the second sum exact too)."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("order_month")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("rev"))
    return m.groupBy("order_month").agg(
        (F.sum(dec("rev")).cast("double") / F.count("*")).alias("avg_monthly_revenue"),
        F.sum(dec("rev")).cast("double").alias("total_revenue"),
        F.count("*").alias("years_observed"),
    )


@register(
    "paginated_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 50 OFFSET 100
    """,
)
def paginated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset pagination, page 3 of size 50 (sort-mapped 'date:desc')."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", F.to_date("o_orderdate").alias("order_date")
    )
    return paginate_offset(
        orders, sort_cols=[("order_date", "desc"), ("o_orderkey", "desc")], page=3, page_size=50
    )


@register(
    "keyset_orders_page",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
       OR (o_orderdate = TIMESTAMP '1999-06-01 00:00:00' AND o_orderkey > 0)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 50
    """,
)
def keyset_orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset page after cursor (1999-06-01, 0) — the predicate pushes down
    to the parquet scan, unlike OFFSET."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    import datetime

    return paginate_keyset(
        orders,
        sort_col="o_orderdate",
        key_col="o_orderkey",
        cursor=(datetime.datetime(1999, 6, 1), 0),
        page_size=50,
    )


@register(
    "purchase_history_last3",
    oracle="""
    SELECT o_custkey AS customer_id, o_orderkey, o_totalprice,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS INT) AS recency_rank
    FROM orders
    QUALIFY recency_rank <= 3
    """,
)
def purchase_history_last3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer drill-down: 3 most recent orders for every customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.select(
            F.col("o_custkey").alias("customer_id"),
            "o_orderkey",
            "o_totalprice",
            F.to_date("o_orderdate").alias("order_date"),
        )
        .withColumn(
            "recency_rank",
            F.row_number().over(
                Window.partitionBy("customer_id").orderBy(
                    F.col("order_date").desc(), F.col("o_orderkey").desc()
                )
            ),
        )
        .filter(F.col("recency_rank") <= 3)
    )


@register(
    "customer_drilldown",
    oracle=f"""
    WITH o AS (SELECT * FROM orders WHERE o_custkey <= 300),
    summary AS (
        SELECT o_custkey AS customer_id,
               COUNT(*) AS total_orders,
               {money_sum_sql('o_totalprice')} AS total_spent,
               {money_sum_sql('o_totalprice')} / COUNT(*) AS avg_order_value,
               CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
               CAST(MAX(o_orderdate) AS DATE) AS last_order_date
        FROM o GROUP BY 1
    ),
    brand_spend AS (
        SELECT o_custkey AS customer_id, p_brand, {REV_SUM_SQL} AS spend
        FROM o
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2
    ),
    fav AS (
        SELECT customer_id, p_brand AS favorite_brand
        FROM brand_spend
        QUALIFY row_number() OVER (
            PARTITION BY customer_id ORDER BY spend DESC, p_brand) = 1
    )
    SELECT s.*, f.favorite_brand
    FROM summary s LEFT JOIN fav f USING (customer_id)
    """,
)
def customer_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer drill-down profile (datamart_service.py:217-312): order
    totals, AOV, tenure dates, plus favorite brand by net spend (window
    rank 1). The custkey predicate pushes to both parquet scans; lineitem
    rows for other customers are dropped by the join on the pre-filtered
    order keys, never scanned into the aggregation."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    summary = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("*").alias("total_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_spent"),
        (F.sum(dec("o_totalprice")).cast("double") / F.count("*")).alias(
            "avg_order_value"
        ),
        F.min(F.to_date("o_orderdate")).alias("first_order_date"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
    )
    brand_spend = (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(part.select("p_partkey", "p_brand")), lineitem.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("o_custkey").alias("customer_id"), "p_brand")
        .agg(rev_sum().alias("spend"))
    )
    fav = (
        brand_spend.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("customer_id").orderBy(
                    F.col("spend").desc(), "p_brand"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("customer_id", F.col("p_brand").alias("favorite_brand"))
    )
    return summary.join(fav, "customer_id", "left")


# Whitelist of API sort fields → physical columns (sales_repository.py:65-77).
# Unknown fields raise instead of silently sorting by nothing.
_ORDER_SORT_FIELDS = {
    "date": "o_orderdate",
    "total": "o_totalprice",
    "customer": "o_custkey",
    "id": "o_orderkey",
}


def sort_mapped_orders_page(
    spark: SparkSession, sf_dir: str, sort: str = "total:desc", n: int = 20
) -> DataFrame:
    """API `sort=field:dir` mapping: parse, whitelist-map, apply with a
    deterministic key tiebreak. orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-N, no global sort)."""
    field, _, direction = sort.partition(":")
    if field not in _ORDER_SORT_FIELDS:
        raise ValueError(f"unsupported sort field: {field!r}")
    col = F.col(_ORDER_SORT_FIELDS[field])
    col = col.desc() if direction == "desc" else col.asc()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    return orders.orderBy(col, "o_orderkey").limit(n)


@register(
    "sort_mapped_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_mapped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sort_mapped_orders_page(spark, sf_dir, sort="total:desc", n=20)


@register(
    "yoy_revenue_growth",
    oracle="""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           lag(revenue, 12) OVER (ORDER BY month) AS revenue_prev_year,
           round((revenue - lag(revenue, 12) OVER (ORDER BY month))
                 / lag(revenue, 12) OVER (ORDER BY month), 6) AS yoy_growth
    FROM m
    """,
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the other classic
    period-comparison window (monthly_growth covers MoM): lag 12 over the
    month series, growth as a ratio of the exact DECIMAL-summed revenues.
    The window is over the ~80-row month aggregate, so the unpartitioned
    sort is a non-issue at any source scale — the shuffle happens on the
    month key during aggregation, map-side combined."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    return m.select(
        "month",
        "revenue",
        prev.alias("revenue_prev_year"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


@register(
    "nation_share_of_region",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))))
                        OVER (PARTITION BY r.r_name) AS DOUBLE), 6)
               AS share_of_region
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its region —
    the window-over-aggregate idiom (SUM(SUM(..)) OVER) that every BI
    layer generates. Decimal-exact inner sums; the share divides the
    nation's deterministic double by the region's (a window over the
    25-row aggregate, so the unpartitioned concern never arises). Dims
    broadcast; one fact shuffle on the nation key."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    from pyspark.sql.window import Window

    j = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    agg = j.groupBy(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    w = Window.partitionBy("region")
    return agg.select(
        "nation",
        "region",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double"),
            6,
        ).alias("share_of_region"),
    )


@register(
    "time_decay_revenue",
    oracle="""
    SELECT o_custkey AS customer_id,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(
               CAST(o_totalprice AS DECIMAL(18,2))
               * CAST(power(2.0, 10 - least(
                     CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-08-01') AS BIGINT) // 180,
                     10)) AS BIGINT)
           ) * 100 AS BIGINT) AS decayed_q,
           CAST(CAST(SUM(
               CAST(o_totalprice AS DECIMAL(18,2))
               * CAST(power(2.0, 10 - least(
                     CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-08-01') AS BIGINT) // 180,
                     10)) AS BIGINT)
           ) * 100 AS BIGINT) AS DOUBLE) / 102400.0 AS decayed_revenue
    FROM orders
    GROUP BY o_custkey
    """,
)
def time_decay_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted customer value: revenue decayed by a half-life of
    180 days (weight = 2^-floor(age/180), capped at 2^-10) — the feature
    every churn/propensity model wants instead of raw lifetime sums.
    Parity trick: summing cents * DECIMAL(12,10) weights is exact but the
    final decimal->double conversions of the two engines can disagree by
    1 ulp, which flips 6-dp formatting on the half-ties binary weights
    produce systematically. So the sum is kept INTEGER end-to-end —
    weights scaled to 2^(10-k) (an int), money to cents — giving a
    BIGINT quantum `decayed_q`, and the currency-unit view divides that
    one integer by 102400.0 (cents * 2^10): a single IEEE division of
    identical operands. One map-side-combinable aggregate; no joins."""
    orders = load_table(spark, sf_dir, "orders")
    age_days = F.datediff(
        F.lit("2001-08-01").cast("timestamp"), F.col("o_orderdate")
    )
    k = F.least(F.floor(age_days / 180), F.lit(10))
    weight_int = F.pow(F.lit(2.0), F.lit(10) - k).cast("bigint")
    q = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * weight_int) * 100
    ).cast("bigint")
    return (
        orders.groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            q.alias("decayed_q"),
        )
        .withColumn(
            "decayed_revenue",
            F.col("decayed_q").cast("double") / F.lit(102400.0),
        )
    )


@register(
    "brand_cross_sell",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    """,
)
def brand_cross_sell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase matrix: for every brand pair, how many orders
    contain both — the cross-sell signal behind 'frequently bought
    together'. Pre-distinct (order, brand) caps the self-join blowup at
    |brands-per-order choose 2| (brands are a 25-value dim, so <=300
    pairs per order worst-case); the heavy lifting is one order-keyed
    shuffle. Same 2-itemset shape as itemset_pairs_support but over a
    joined dimension attribute rather than a raw event column."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.alias("a")
    b = ob.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


@register(
    "dow_seasonality_index",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(isodow(o_orderdate) AS INT) AS dow,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM orders GROUP BY 1, 2
    ),
    per_dow AS (
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(rev_dec) AS DOUBLE) AS rev,
               CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*) AS avg_daily_rev
        FROM daily GROUP BY 1
    ),
    overall AS (
        SELECT CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*) AS overall_avg
        FROM daily
    )
    SELECT dow, n_days, avg_daily_rev,
           avg_daily_rev / overall_avg AS seasonality_index
    FROM per_dow CROSS JOIN overall
    """,
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: average daily revenue per ISO
    weekday divided by the overall average daily revenue — the
    multiplicative seasonal factor a forecasting pipeline divides out
    before trend fitting. ISO weekday (Mon=1) on both engines (Spark's
    dayofweek() is Sunday-1, so weekday()+1 aligns with DuckDB's
    isodow). Two-level exact-decimal aggregation; the index is a
    division of two deterministic doubles. Everything after the one
    date-grain shuffle is a 7-row computation."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("dow"),
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    per_dow = daily.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("rev_dec").cast("double").alias("rev"),
        (F.sum("rev_dec").cast("double") / F.count("*")).alias("avg_daily_rev"),
    )
    overall = daily.agg(
        (F.sum("rev_dec").cast("double") / F.count("*")).alias("overall_avg")
    )
    return per_dow.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        "avg_daily_rev",
        (F.col("avg_daily_rev") / F.col("overall_avg")).alias("seasonality_index"),
    )


@register(
    "basket_jaccard_yoy",
    oracle="""
    WITH b96 AS (
        SELECT DISTINCT o_custkey AS cust, p_brand
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN part ON l_partkey = p_partkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    b97 AS (
        SELECT DISTINCT o_custkey AS cust, p_brand
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN part ON l_partkey = p_partkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    ),
    u AS (
        SELECT COALESCE(a.cust, b.cust) AS cust,
               a.p_brand IS NOT NULL AS in96,
               b.p_brand IS NOT NULL AS in97
        FROM b96 a FULL OUTER JOIN b97 b
          ON a.cust = b.cust AND a.p_brand = b.p_brand
    )
    SELECT cust,
           CAST(COUNT(CASE WHEN in96 THEN 1 END) AS BIGINT) AS n96,
           CAST(COUNT(CASE WHEN in97 THEN 1 END) AS BIGINT) AS n97,
           CAST(COUNT(CASE WHEN in96 AND in97 THEN 1 END) AS BIGINT) AS n_both,
           CAST(COUNT(CASE WHEN in96 AND in97 THEN 1 END) AS DOUBLE)
               / COUNT(*) AS jaccard
    FROM u GROUP BY cust
    """,
)
def basket_jaccard_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year brand-basket stability: per customer, the Jaccard
    similarity between the set of brands bought in 1996 and in 1997 —
    the loyalty/assortment-drift metric. Set algebra runs as a full
    outer join on (customer, brand) with presence flags (|union| is the
    row count, |intersect| the both-flag count), so no array
    materialization and one shuffle on the composite key. Integer
    counts; one division. Customers active in only one year score 0."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def brands(y0: str, y1: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .join(li, orders.o_orderkey == li.l_orderkey)
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .select(F.col("o_custkey").alias("cust"), "p_brand")
            .distinct()
        )
    a = brands("1996-01-01", "1997-01-01").withColumnRenamed("p_brand", "brand_a")
    b = brands("1997-01-01", "1998-01-01").select(
        F.col("cust").alias("cust_b"), F.col("p_brand").alias("brand_b")
    )
    u = a.join(
        b,
        (a.cust == b.cust_b) & (F.col("brand_a") == F.col("brand_b")),
        "full_outer",
    ).select(
        F.coalesce("cust", "cust_b").alias("cust"),
        F.col("brand_a").isNotNull().alias("in96"),
        F.col("brand_b").isNotNull().alias("in97"),
    )
    both = F.count(F.when(F.col("in96") & F.col("in97"), 1))
    return u.groupBy("cust").agg(
        F.count(F.when(F.col("in96"), 1)).cast("bigint").alias("n96"),
        F.count(F.when(F.col("in97"), 1)).cast("bigint").alias("n97"),
        both.cast("bigint").alias("n_both"),
        (both.cast("double") / F.count("*")).alias("jaccard"),
    )


@register(
    "inter_order_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
                    AS BIGINT) AS gap_days,
               o_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    g AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL),
    ranked AS (
        SELECT gap_days,
               CAST(row_number() OVER (ORDER BY gap_days, o_custkey, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM g
    )
    SELECT MAX(n) AS n_gaps,
           MIN(gap_days) AS min_days,
           MAX(gap_days) AS max_days,
           CAST(SUM(gap_days) AS DOUBLE) / MAX(n) AS avg_days,
           MIN(CASE WHEN rn = (n + 1) // 2 THEN gap_days END) AS p50_days,
           MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_days END) AS p90_days
    FROM ranked
    """,
)
def inter_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of days between a
    customer's consecutive orders (lag window per customer), summarized
    with exact discrete p50/p90 via position pick — the replenishment-
    cycle input to reorder-reminder and churn-window models. Integer day
    arithmetic end-to-end; one customer-keyed window, then a global rank
    over |orders - customers| gap rows."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
            .cast("bigint")
            .alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    ranked = gaps.select(
        "gap_days",
        F.row_number()
        .over(Window.orderBy("gap_days", "o_custkey", "o_orderkey"))
        .cast("bigint")
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    return ranked.agg(
        F.max("n").alias("n_gaps"),
        F.min("gap_days").alias("min_days"),
        F.max("gap_days").alias("max_days"),
        (F.sum("gap_days").cast("double") / F.max("n")).alias("avg_days"),
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_days"))
        ).alias("p50_days"),
        F.min(
            F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("gap_days"))
        ).alias("p90_days"),
    )


@register(
    "segment_migration_matrix",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                         AND o_orderdate < TIMESTAMP '1997-01-01'
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS s96,
               SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                         AND o_orderdate < TIMESTAMP '1998-01-01'
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS s97
        FROM orders GROUP BY 1
        HAVING s96 > 0 AND s97 > 0
    ),
    tiers AS (
        SELECT o_custkey,
               CAST(ntile(3) OVER (ORDER BY s96, o_custkey) AS INT) AS tier96,
               CAST(ntile(3) OVER (ORDER BY s97, o_custkey) AS INT) AS tier97
        FROM spend
    )
    SELECT tier96, tier97, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM tiers GROUP BY 1, 2
    """,
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier migration matrix: tercile of 1996 spend vs
    tercile of 1997 spend for customers active in both years — the
    upgrade/downgrade flow behind 'are our best customers staying'.
    ntile has the same fill-first definition in both engines and the
    custkey tiebreak pins boundary assignment; spends are exact decimal
    sums. The unpartitioned ntile runs over |active customers|
    post-aggregation (the quantile_bucket scale path applies beyond
    that). One custkey shuffle + one 9-cell aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(18,2)")

    def year_spend(y0: str, y1: str):
        in_year = (F.col("o_orderdate") >= F.lit(y0).cast("timestamp")) & (
            F.col("o_orderdate") < F.lit(y1).cast("timestamp")
        )
        return F.sum(F.when(in_year, dec("o_totalprice")).otherwise(zero))

    spend = (
        orders.groupBy("o_custkey")
        .agg(
            year_spend("1996-01-01", "1997-01-01").alias("s96"),
            year_spend("1997-01-01", "1998-01-01").alias("s97"),
        )
        .filter((F.col("s96") > 0) & (F.col("s97") > 0))
    )
    tiers = spend.select(
        F.ntile(3).over(Window.orderBy("s96", "o_custkey")).cast("int").alias("tier96"),
        F.ntile(3).over(Window.orderBy("s97", "o_custkey")).cast("int").alias("tier97"),
    )
    return tiers.groupBy("tier96", "tier97").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


@register(
    "new_customer_revenue_share",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey, MIN(year(o_orderdate)) AS first_year
        FROM orders GROUP BY 1
    )
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN year(o.o_orderdate) = f.first_year
                         THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               AS new_customer_revenue,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue,
           CAST(SUM(CASE WHEN year(o.o_orderdate) = f.first_year
                         THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS new_share
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1
    """,
)
def new_customer_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth quality: per year, the share of revenue from customers
    acquired that year vs the existing base — the acquisition-vs-
    retention revenue split. First-order year derived once per customer
    and joined back (both aggregations share the custkey shuffle);
    conditional decimal sums; one division of deterministic doubles per
    year row."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("first_year")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    j = orders.join(firsts, "o_custkey")
    is_new = F.year("o_orderdate") == F.col("first_year")
    new_rev = F.sum(F.when(is_new, dec("o_totalprice")).otherwise(zero)).cast(
        "double"
    )
    tot_rev = F.sum(dec("o_totalprice")).cast("double")
    return j.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        new_rev.alias("new_customer_revenue"),
        tot_rev.alias("total_revenue"),
        (new_rev / tot_rev).alias("new_share"),
    )


@register(
    "discount_band_effects",
    oracle="""
    SELECT CAST(round(l_discount * 100) AS INT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price
    FROM lineitem
    GROUP BY 1
    """,
)
def discount_band_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-response profile: average quantity and line price per
    discount percentage point — the raw table behind any price-
    elasticity fit. The discount doubles are exact hundredths, so
    round(x*100) buckets identically in both engines. Single map-side-
    combinable aggregate over the fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.round(F.col("l_discount") * 100).cast("int").alias("discount_pct")
    ).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias(
            "avg_price"
        ),
    )


@register(
    "skyline_parts_price_size",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name, p_size,
               CAST(p_retailprice AS DECIMAL(18,2)) AS price
        FROM part
    )
    SELECT a.p_partkey, a.p_name, CAST(a.p_size AS INT) AS p_size,
           CAST(a.price AS DOUBLE) AS retail_price
    FROM p a
    WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.p_size >= a.p_size AND b.price <= a.price
          AND (b.p_size > a.p_size OR b.price < a.price)
    )
    """,
)
def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: maximize p_size, minimize
    retail price — no other part is at least as large AND at most as
    expensive with one strict. The oracle states dominance directly
    (NOT EXISTS anti-join — quadratic, fine for an oracle); the Spark
    plan is the DISTRIBUTED shape: (1) each hash bucket computes its
    PARTIAL skyline with a sorted sweep (sort by size desc then price,
    keep rows whose price strictly undercuts the running minimum of all
    larger-or-equal sizes seen — one window per bucket), which is sound
    because skyline(U_i skyline(B_i)) = skyline(U_i B_i) for any
    partitioning; (2) the surviving candidates — expected O(log n) per
    bucket for anti-correlated-at-worst data — union into one final
    sweep over a set orders of magnitude smaller than the input.
    Tie policy: equal (size, price) points dominate nothing mutually,
    so ALL of an equivalence class survive (both engines agree by
    construction)."""
    from pyspark.sql.window import Window

    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_name",
        "p_size",
        F.col("p_retailprice").cast("decimal(18,2)").alias("price"),
    )

    def sweep(df, bucket_col):
        w = (
            Window.partitionBy(bucket_col)
            .orderBy(F.col("p_size").desc(), "price", "p_partkey")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # min price among rows with size >= mine, EXCLUDING my own
        # (size, price) class: a row survives iff no prior row in the
        # sweep order has price <= mine with a strict edge. Equal
        # (size, price) classmates sort adjacently; the strict-dominance
        # check below keeps them all.
        prior_min = F.min("price").over(w)
        # dominated iff a sweep-prior row (all have size >= mine) beats my
        # price strictly, OR matches it while some same-price row is
        # strictly larger (the equal-price strict-size edge); exact
        # (size, price) ties dominate nothing mutually and all survive
        return df.withColumn("__pm", prior_min).withColumn(
            "__dominated",
            F.col("__pm").isNotNull()
            & (
                (F.col("__pm") < F.col("price"))
                | (
                    (F.col("__pm") == F.col("price"))
                    & (
                        F.max(F.col("p_size")).over(
                            Window.partitionBy(bucket_col, "price")
                        )
                        > F.col("p_size")
                    )
                )
            ),
        ).filter(~F.col("__dominated")).drop("__pm", "__dominated")

    # stage 1: partial skyline per hash bucket; stage 2: final sweep
    bucketed = p.withColumn("__b", F.pmod(F.xxhash64("p_partkey"), F.lit(32)))
    partial = sweep(bucketed, "__b")
    final = sweep(partial.withColumn("__g", F.lit(0)), "__g")
    return final.select(
        "p_partkey",
        "p_name",
        F.col("p_size").cast("int").alias("p_size"),
        F.col("price").cast("double").alias("retail_price"),
    )


@register(
    "price_volume_mix",
    oracle=f"""
    WITH yr AS (
        SELECT CAST(year(MAX(l_shipdate)) - 1 AS BIGINT) AS cy FROM lineitem
    ),
    by_brand AS (
        SELECT p_brand AS brand,
               CAST(year(l_shipdate) AS BIGINT) AS y,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q,
               {REV_SUM_SQL} AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        CROSS JOIN yr
        WHERE CAST(year(l_shipdate) AS BIGINT) IN (yr.cy - 1, yr.cy)
        GROUP BY 1, 2
    ),
    ref AS (SELECT brand, q AS q0, rev AS rev0 FROM by_brand, yr
            WHERE y = yr.cy - 1),
    cur AS (SELECT brand, q AS q1, rev AS rev1 FROM by_brand, yr
            WHERE y = yr.cy),
    joined AS (
        SELECT COALESCE(r.brand, c.brand) AS brand,
               COALESCE(r.q0, 0.0) AS q0, COALESCE(r.rev0, 0.0) AS rev0,
               COALESCE(c.q1, 0.0) AS q1, COALESCE(c.rev1, 0.0) AS rev1
        FROM ref r FULL OUTER JOIN cur c ON r.brand = c.brand
    )
    SELECT brand,
           CASE WHEN q0 = 0 THEN 'new'
                WHEN q1 = 0 THEN 'discontinued'
                ELSE 'continuing' END AS status,
           q0, q1, rev0, rev1,
           rev1 - rev0 AS delta,
           CASE WHEN q0 = 0 THEN rev1
                WHEN q1 = 0 THEN 0.0 - rev0
                ELSE (q1 - q0) * (rev0 / q0) END AS volume_effect,
           CASE WHEN q0 = 0 OR q1 = 0 THEN 0.0
                ELSE (rev1 / q1 - rev0 / q0) * q0 END AS price_effect,
           CASE WHEN q0 = 0 OR q1 = 0 THEN 0.0
                ELSE (q1 - q0) * (rev1 / q1 - rev0 / q0) END AS cross_effect
    FROM joined
    """,
)
def price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix decomposition — the classic 'why did revenue
    move' BI operator: per brand, the year-over-year revenue delta split
    into volume effect ((q1-q0) * p0), price effect ((p1-p0) * q0) and
    the cross term, which reconcile to the delta by construction; new and
    discontinued brands get their whole delta attributed as volume with
    an explicit status. One aggregate over the two-year slice (predicate
    pushed to the scan) + a brand-keyed full outer join — dimension-sized
    after aggregation, so trivially small at any fact scale.

    Parity: quantities and revenues are exact DECIMAL sums cast to double
    once; every effect is one CASE of identical IEEE expressions, and
    outputs stay UNROUNDED (the half-tie rule). The decomposition's float
    residual vs the exact delta is identical cross-engine because the
    operand order is mirrored."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    yr = li.agg((F.year(F.max("l_shipdate")) - 1).cast("bigint").alias("cy"))
    by_brand = (
        li.join(part, li.l_partkey == part.p_partkey)
        .crossJoin(F.broadcast(yr))
        .filter(
            (F.year("l_shipdate").cast("bigint") == F.col("cy") - 1)
            | (F.year("l_shipdate").cast("bigint") == F.col("cy"))
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("bigint").alias("y"),
        )
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("q"),
            rev_sum().alias("rev"),
        )
        .crossJoin(F.broadcast(yr))
    )
    ref = by_brand.filter(F.col("y") == F.col("cy") - 1).select(
        "brand", F.col("q").alias("q0"), F.col("rev").alias("rev0")
    )
    cur = by_brand.filter(F.col("y") == F.col("cy")).select(
        F.col("brand").alias("brand_c"),
        F.col("q").alias("q1"),
        F.col("rev").alias("rev1"),
    )
    joined = (
        ref.join(cur, ref.brand == cur.brand_c, "full_outer")
        .select(
            F.coalesce("brand", "brand_c").alias("brand"),
            F.coalesce("q0", F.lit(0.0)).alias("q0"),
            F.coalesce("rev0", F.lit(0.0)).alias("rev0"),
            F.coalesce("q1", F.lit(0.0)).alias("q1"),
            F.coalesce("rev1", F.lit(0.0)).alias("rev1"),
        )
    )
    q0, q1 = F.col("q0"), F.col("q1")
    rev0, rev1 = F.col("rev0"), F.col("rev1")
    return joined.select(
        "brand",
        F.when(q0 == 0, "new")
        .when(q1 == 0, "discontinued")
        .otherwise("continuing")
        .alias("status"),
        "q0",
        "q1",
        "rev0",
        "rev1",
        (rev1 - rev0).alias("delta"),
        F.when(q0 == 0, rev1)
        .when(q1 == 0, F.lit(0.0) - rev0)
        .otherwise((q1 - q0) * (rev0 / q0))
        .alias("volume_effect"),
        F.when((q0 == 0) | (q1 == 0), F.lit(0.0))
        .otherwise((rev1 / q1 - rev0 / q0) * q0)
        .alias("price_effect"),
        F.when((q0 == 0) | (q1 == 0), F.lit(0.0))
        .otherwise((q1 - q0) * (rev1 / q1 - rev0 / q0))
        .alias("cross_effect"),
    )


def _share_shift_sql(lineitem: str, orders: str, part: str) -> str:
    """Shared share-shift mover SQL body (identical on both engines)."""
    return f"""
    WITH rev AS (
        SELECT p_brand,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                              AND o_orderdate < TIMESTAMP '1997-01-01'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS r96,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                              AND o_orderdate < TIMESTAMP '1998-01-01'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS r97
        FROM {lineitem}
        JOIN {orders} ON l_orderkey = o_orderkey
        JOIN {part} ON l_partkey = p_partkey
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(CAST(r96 AS DECIMAL(18,2))) AS DOUBLE) AS t96,
               CAST(SUM(CAST(r97 AS DECIMAL(18,2))) AS DOUBLE) AS t97
        FROM rev
    )
    SELECT r.p_brand, r.r96 AS revenue_96, r.r97 AS revenue_97,
           100.0 * (r.r97 / t.t97 - r.r96 / t.t96) AS delta_share_pts,
           100.0 * (r.r97 - r.r96) / t.t96 AS growth_contribution_pts
    FROM rev r CROSS JOIN tot t
    ORDER BY ABS(r.r97 / t.t97 - r.r96 / t.t96) DESC, r.p_brand
    LIMIT 20
    """


@register(
    "share_shift_movers",
    oracle=_share_shift_sql("lineitem", "orders", "part"),
)
def share_shift_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue-share movers between 1996 and 1997 by brand: the
    'what drove the change' decomposition every ops review asks for —
    share-point delta (mix shift) plus each brand's contribution to
    total growth, ranked by absolute share movement. Complements
    psi_feature_drift (a distribution TEST, not a ranking) and
    price_volume_decomposition (P x Q bridge within a brand): this one
    attributes the aggregate move across brands.

    Scale: one fact pass into a 25-row brand grain (map-side combined),
    a 1-row total, and a broadcast cross join — the ranking sorts 25
    rows. Parity: DECIMAL-exact revenue sums; every emitted ratio is a
    fixed chain of IEEE ops on those exact values (brand revenues sum
    decimal-side before the single cast), so no rounding is needed; the
    ORDER BY key is the same exact expression with a brand tiebreak."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ss_lineitem"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ss_orders")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("ss_part")
    return spark.sql(_share_shift_sql("ss_lineitem", "ss_orders", "ss_part"))


def _adoption_sql(lineitem: str, orders: str, part: str) -> str:
    """Shared brand adoption-curve SQL body (identical on both engines)."""
    return f"""
    WITH firsts AS (
        SELECT p_brand, o_custkey,
               MIN(CAST(date_trunc('month', o_orderdate) AS DATE))
                   AS first_month
        FROM {lineitem}
        JOIN {orders} ON l_orderkey = o_orderkey
        JOIN {part} ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    monthly AS (
        SELECT p_brand, first_month AS month,
               CAST(COUNT(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY 1, 2
    )
    SELECT p_brand, month, n_new,
           CAST(SUM(n_new) OVER (PARTITION BY p_brand ORDER BY month
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
               AS cum_adopters
    FROM monthly
    """


@register(
    "adoption_curve_by_brand",
    oracle=_adoption_sql("lineitem", "orders", "part"),
)
def adoption_curve_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-adopter curve per brand: monthly count of customers making
    their FIRST-ever purchase of the brand, plus the cumulative adopter
    base — the product-adoption S-curve marketing reads against Bass
    diffusion. Charging each (brand, customer) to its first-occurrence
    month is the same distributed trick as vocab_growth_curve: the
    expensive distinct-so-far becomes one grouped MIN plus a window over
    the tiny brand x month grid (~25 x 84 rows), never a rescan per
    month. Integer-exact throughout (counts and a windowed cumulative
    sum); no floats at all."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ad_lineitem"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ad_orders")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("ad_part")
    return spark.sql(_adoption_sql("ad_lineitem", "ad_orders", "ad_part"))


def _newsvendor_sql(lineitem: str) -> str:
    """Shared newsvendor SQL body. The critical-fractile quantile is an
    exact integer-rank pick over each brand-bucket's discrete quantity
    distribution (rank*denominator comparisons, no division); expected
    over/underage units at the chosen stock level are exact integer
    sums scaled once to doubles."""
    return f"""
    WITH demand AS (
        SELECT l_partkey % 25 AS brand_bucket,
               CAST(l_quantity AS BIGINT) AS q
        FROM {lineitem}
    ),
    ranked AS (
        SELECT brand_bucket, q,
               CAST(ROW_NUMBER() OVER (PARTITION BY brand_bucket
                                       ORDER BY q, q) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY brand_bucket) AS BIGINT)
                   AS n
        FROM demand
    ),
    -- critical fractile for cost ratio cu/(cu+co) = 3/(3+1) = 3/4:
    -- smallest order statistic with rank >= ceil(3n/4), picked by the
    -- integer comparison 4*rn >= 3*n (div-free)
    stock AS (
        SELECT brand_bucket, MIN(q) AS s_star,
               MAX(n) AS n
        FROM ranked WHERE 4 * rn >= 3 * n
        GROUP BY brand_bucket
    )
    SELECT d.brand_bucket,
           CAST(MAX(s.n) AS BIGINT) AS n_obs,
           CAST(MAX(s.s_star) AS BIGINT) AS stock_level,
           CAST(SUM(CASE WHEN d.q < s.s_star THEN s.s_star - d.q
                         ELSE 0 END) AS DOUBLE) / MAX(s.n)
               AS expected_overage_units,
           CAST(SUM(CASE WHEN d.q > s.s_star THEN d.q - s.s_star
                         ELSE 0 END) AS DOUBLE) / MAX(s.n)
               AS expected_underage_units
    FROM demand d JOIN stock s ON d.brand_bucket = s.brand_bucket
    GROUP BY d.brand_bucket
    """


@register("newsvendor_quantile", oracle=_newsvendor_sql("lineitem"))
def newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor critical-fractile stocking level per brand bucket:
    the 3/4 demand quantile (underage cost 3x overage) picked by exact
    integer-rank comparison over the discrete quantity distribution,
    plus the resulting expected overage/underage units — the classic
    single-period inventory optimum, computed distribution-free from
    the empirical demand. Exact integer sums throughout; one scale to
    double at the end.

    Scale: two partitioned windows + one groupBy, all keyed on the
    25-bucket brand dimension (map-side combinable). Public method:
    the newsvendor critical fractile (Arrow-Harris-Marschak 1951
    lineage)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "nv_lineitem"
    )
    return spark.sql(_newsvendor_sql("nv_lineitem"))


def _abc_xyz_sql(lineitem: str) -> str:
    """Shared ABC-XYZ SQL body. ABC uses DECIMAL-exact revenue shares
    via an ordered cumulative window; XYZ uses the coefficient of
    variation from exact integer monthly sums; class edges are exact
    rational comparisons (cum*10 vs total thresholds, 20*var vs mean^2
    bands) so no float rounding decides a class."""
    return f"""
    WITH monthly AS (
        SELECT l_partkey % 100 AS sku_bucket,
               CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) * 12
                    + EXTRACT(MONTH FROM CAST(l_shipdate AS DATE))
                    AS BIGINT) AS mi,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {lineitem}
        GROUP BY 1, 2
    ),
    per_sku AS (
        SELECT sku_bucket,
               CAST(SUM(cents) AS BIGINT) AS rev,
               CAST(COUNT(*) AS BIGINT) AS m,
               SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS revsq
        FROM monthly GROUP BY 1
    ),
    abc AS (
        SELECT sku_bucket, rev, m, revsq,
               CAST(SUM(rev) OVER (ORDER BY rev DESC, sku_bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(SUM(rev) OVER () AS BIGINT) AS total
        FROM per_sku
    )
    SELECT sku_bucket,
           CAST(rev AS DOUBLE) / 100 AS revenue_dollars,
           CASE WHEN cum * 10 <= total * 8 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           sqrt((m * CAST(revsq AS DOUBLE) - CAST(rev AS DOUBLE) * rev))
               / rev AS cv,
           -- XYZ bands at CV 0.1 / 0.25: exact rational comparison
           -- m*revsq - rev^2 vs (band*rev)^2 -> scaled by 10^2 / 4^2
           CASE WHEN (m * CAST(revsq AS DOUBLE) - CAST(rev AS DOUBLE) * rev)
                     * 100 <= CAST(rev AS DOUBLE) * rev THEN 'X'
                WHEN (m * CAST(revsq AS DOUBLE) - CAST(rev AS DOUBLE) * rev)
                     * 16 <= CAST(rev AS DOUBLE) * rev THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM abc
    """


@register("abc_xyz_matrix", oracle=_abc_xyz_sql("lineitem"))
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory segmentation per SKU bucket: revenue-share ABC
    classes (80/95 cut on the DECIMAL-exact cumulative share, ordered
    deterministically) crossed with demand-variability XYZ classes
    (coefficient of variation of monthly revenue, banded at 0.1/0.25 by
    exact rational comparison) — the 9-cell planning matrix
    replenishment policy is keyed on, extending abc_classification with
    the variability axis. No float rounding ever decides a class.

    Scale: monthly groupBy (map-side combine) collapses to the
    SKU-bucket x month grid; one ordered window over 100 buckets.
    Public method: ABC-XYZ analysis (Dickie 1951; coefficient-of-
    variation banding)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ax_lineitem"
    )
    return spark.sql(_abc_xyz_sql("ax_lineitem"))
