"""Window-function operator queries (SURVEY.md §2.5 / §2.6).

Each query exercises one window construct from the reference with an exact
DuckDB oracle:

- dedup_latest        spark_silver.py:126-153 (row_number keep-latest)
- running_total       windowing.py:153-159 (unbounded-preceding sum)
- monthly_growth      materialized_views_manager.py:247-250 (LAG growth rate)
- customer_rank       windowing.py:265-272 (dense_rank / percent_rank)
- sessionization      realtime_gold_processor.py:550-580 batch equivalent
- purchase_velocity_24h realtime_analytics_ml.py:997-1022 (rangeBetween -86400)
- scd2_rebuild        windowing.py:94-108 (lag-hash change suppression +
                      lead valid_to + version + is_current)
- top3_per_nation     datamart_service.py:351-356 (top-N per group)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import dedup_keep_latest
from ..operators.scd2 import scd2_rebuild
from ..operators.sessionize import sessionize
from ..schemas import load_table
from ._parity import REV_SUM_SQL, dec, money_sum_sql, rev_dec, rev_sum
from .catalog import register


@register(
    "dedup_latest",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value, props
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user, event_type)."""
    events = load_table(spark, sf_dir, "events")
    return dedup_keep_latest(
        events, keys=["user_id", "event_type"], order_col="ts", tiebreakers=["event_id"]
    ).select("event_id", "user_id", "event_type", "ts", "value", "props")


@register(
    "running_total",
    oracle="""
    SELECT o_custkey AS customer_id, o_orderkey AS order_id,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
    FROM orders
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "monthly_growth",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               {money_sum_sql('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           revenue - lag(revenue) OVER (ORDER BY month) AS revenue_delta,
           (revenue - lag(revenue) OVER (ORDER BY month))
               / lag(revenue) OVER (ORDER BY month) AS growth_rate
    FROM monthly
    """,
)
def monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth via LAG. The single global window is
    fine here: it runs over one row per month, not per event."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("revenue_delta"),
        ((F.col("revenue") - prev) / prev).alias("growth_rate"),
    )


@register(
    "customer_rank",
    oracle=f"""
    WITH spend AS (
        SELECT n_name AS nation, c_custkey AS customer_id,
               {money_sum_sql('o_totalprice')} AS total_spent
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    )
    SELECT *,
           CAST(dense_rank() OVER (PARTITION BY nation ORDER BY total_spent DESC) AS INT)
               AS spend_rank,
           percent_rank() OVER (PARTITION BY nation ORDER BY total_spent DESC)
               AS spend_percentile
    FROM spend
    """,
)
def customer_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_custkey").alias("customer_id")
        )
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("total_spent"))
    )
    w = Window.partitionBy("nation").orderBy(F.col("total_spent").desc())
    return spend.select(
        "*",
        F.dense_rank().over(w).alias("spend_rank"),
        F.percent_rank().over(w).alias("spend_percentile"),
    )


@register(
    "sessionization",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                   AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
           CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) AS duration_seconds
    FROM sessions
    GROUP BY 1, 2
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based (30 min) session aggregation, batch form of session_window."""
    events = load_table(spark, sf_dir, "events")
    sess = sessionize(events, "user_id", "ts", gap_minutes=30, tiebreakers=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(dec("value")).cast("double").alias("session_value"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_seconds"
        ),
    )


@register(
    "purchase_velocity_24h",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS events_24h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def purchase_velocity_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h behavioral window (rangeBetween on epoch MICROSECONDS).

    Whole-second epochs are a cross-engine trap with sub-second timestamps:
    Spark's unix_timestamp TRUNCATES to seconds while DuckDB's epoch() keeps
    the fractional part, so an event sitting exactly across the truncated
    24h boundary is inside one engine's frame and outside the other's
    (surfaced by the sf0.1 full-catalog gate — one user had a purchase
    86400.3s before another). Integer microseconds (unix_micros /
    epoch_us) are exact and identical on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # ts is TIMESTAMP_NTZ; the cast to TIMESTAMP is exact under the
        # session's pinned UTC timezone (session.py)
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-86400 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("events_24h"),
        F.sum(dec("value")).over(w).cast("double").alias("value_24h"),
    )


@register(
    "scd2_rebuild",
    oracle="""
    WITH hashed AS (
        SELECT user_id, ts, event_id, event_type, value,
               md5(concat_ws(chr(31),
                   coalesce(event_type, chr(0)),
                   coalesce(CAST(value AS VARCHAR), chr(0)))) AS h
        FROM events
    ),
    changed AS (
        SELECT * FROM (
            SELECT *, lag(h) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ph
            FROM hashed
        ) WHERE ph IS NULL OR h <> ph
    )
    SELECT user_id, event_type, value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS INT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM changed
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_rebuild_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 full-history rebuild treating events as a user-state change log:
    tracked attributes (event_type, value), change-suppressed via lag hash."""
    events = load_table(spark, sf_dir, "events")
    out = scd2_rebuild(
        events,
        key_cols=["user_id"],
        attr_cols=["event_type", "value"],
        ts_col="ts",
        tiebreakers=["event_id"],
    )
    return out.select(
        "user_id", "event_type", "value", "valid_from", "valid_to", "version", "is_current"
    )


@register(
    "top3_per_nation",
    oracle=f"""
    WITH spend AS (
        SELECT n_name AS nation, c_custkey AS customer_id, c_name AS customer_name,
               {money_sum_sql('o_totalprice')} AS total_spent
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3
    )
    SELECT * FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY nation ORDER BY total_spent DESC, customer_id) AS INT) AS rank
        FROM spend
    ) WHERE rank <= 3
    """,
)
def top3_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: rank-and-filter. At scale Catalyst rewrites the
    rank<=k filter into a per-partition top-k (WindowGroupLimit).

    r13: aggregate-before-join (guide §2.3) — orders collapses to customer
    grain on its own key first (the nation/name group columns are
    functionally determined by c_custkey), so the dim joins probe ~10x
    fewer rows and the aggregate keys on one bigint instead of
    (string, bigint, string). Inner-join semantics unchanged: custkeys
    with no customer row drop after the pre-agg as their orders did
    before."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_spent")
    )
    spend = (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            "total_spent",
        )
    )
    w = Window.partitionBy("nation").orderBy(F.col("total_spent").desc(), "customer_id")
    return spend.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


@register(
    "rank_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cum_dist,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           first_value(o_totalprice) OVER w AS min_in_status,
           last_value(o_totalprice) OVER (
               PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS max_in_status
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions (percent_rank / cume_dist / ntile /
    first_value / last_value) per order status — the §2.5 surface the other
    queries don't touch. last_value needs the full-partition frame (the
    default frame ends at CURRENT ROW); orderkey tiebreak keeps both engines'
    orderings identical."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_totalprice").over(w).alias("min_in_status"),
        F.last("o_totalprice").over(w_full).alias("max_in_status"),
    )


@register(
    "gini_by_nation",
    oracle="""
    WITH cust_rev AS (
        SELECT c_nationkey, o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c_nationkey, rev_dec,
               CAST(row_number() OVER (PARTITION BY c_nationkey
                                       ORDER BY rev_dec, o_custkey) AS BIGINT) AS i
        FROM cust_rev
    )
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev_dec) AS DOUBLE) AS total_revenue,
           2 * CAST(SUM(i * rev_dec) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(rev_dec) AS DOUBLE))
               - (CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*)) AS gini
    FROM ranked JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-revenue concentration per nation —
    the inequality metric behind 'whale' analysis. Uses the closed
    rank-sum form G = 2*Sum(i*x_i)/(n*Sum(x_i)) - (n+1)/n over ascending
    revenues, so the whole statistic reduces to two exact decimal sums
    (rank * DECIMAL stays decimal) and a fixed arithmetic tail on
    deterministic doubles. Rank ties broken by custkey so both engines
    rank identically. One shuffle for the per-customer rollup, one
    bounded per-nation window."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust_rev = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("rev_dec", "o_custkey")
    ranked = cust_rev.withColumn("i", F.row_number().over(w).cast("bigint"))
    n = F.count("*").cast("bigint")
    sx = F.sum("rev_dec").cast("double")
    sixi = F.sum(F.col("i") * F.col("rev_dec")).cast("double")
    return (
        ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            n.alias("n_customers"),
            sx.alias("total_revenue"),
            (
                F.lit(2) * sixi / (n.cast("double") * sx)
                - ((n + F.lit(1)).cast("double") / n)
            ).alias("gini"),
        )
    )


@register(
    "abc_classification",
    oracle="""
    WITH prod_rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(rev_dec) AS total_dec FROM prod_rev),
    cum AS (
        SELECT l_partkey, rev_dec,
               SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum_dec
        FROM prod_rev
    )
    SELECT l_partkey,
           CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) AS cum_share,
           CASE WHEN CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) <= 0.8 THEN 'A'
                WHEN CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum CROSS JOIN tot
    """,
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: products ranked by revenue,
    cut at 80% / 95% cumulative share. The cumulative sum runs in exact
    decimal over a (rev DESC, partkey) total order, and each row's share
    divides the same two deterministic doubles in both engines, so even
    rows sitting exactly on a boundary classify identically. The global
    ordered window is the scale caveat — the registered scale path for
    unpartitioned ntile/cumsum shapes is quantile_bucket
    (operators/scalable.py): pre-bucket by range, cumsum per bucket, add
    bucket offsets."""
    li = load_table(spark, sf_dir, "lineitem")
    prod_rev = li.groupBy("l_partkey").agg(F.sum(rev_dec()).alias("rev_dec"))
    w = (
        Window.orderBy(F.desc("rev_dec"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = prod_rev.withColumn("cum_dec", F.sum("rev_dec").over(w))
    tot = prod_rev.agg(F.sum("rev_dec").alias("total_dec"))
    share = F.col("cum_dec").cast("double") / F.col("total_dec").cast("double")
    return cum.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        F.col("rev_dec").cast("double").alias("revenue"),
        share.alias("cum_share"),
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "rolling_corr_rev_orders",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ),
    framed AS (
        SELECT day,
               CAST(row_number() OVER w_ord AS BIGINT) AS rn,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(rev) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(cnt AS DECIMAL(18,0))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(rev * CAST(cnt AS DECIMAL(18,0))) OVER w AS DOUBLE) AS sxy,
               CAST(SUM(rev * rev) OVER w AS DOUBLE) AS sxx,
               CAST(SUM(CAST(cnt AS DECIMAL(18,0))
                        * CAST(cnt AS DECIMAL(18,0))) OVER w AS DOUBLE) AS syy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               w_ord AS (ORDER BY day)
    )
    SELECT day,
           (n * sxy - sx * sy)
           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
               AS corr_7d
    FROM framed WHERE rn >= 7
    """,
)
def rolling_corr_rev_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling Pearson correlation between daily revenue
    and daily order count — the co-movement diagnostic behind 'is average
    order value drifting'. Every frame statistic (Σx, Σy, Σxy, Σx², Σy²)
    accumulates in exact DECIMAL inside the window (decimal window sums
    are exact integers underneath in both engines, immune to each
    engine's frame-evaluation order), and the correlation closed form
    then runs identical IEEE ops — sqrt is correctly-rounded — on
    identical doubles. Partial leading frames (rn < 7) are excluded so
    no zero-variance division arises. One date-grain aggregate, one
    ordered window over |days| rows."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(dec("o_totalprice")).alias("rev"),
        F.count("*").cast("bigint").alias("cnt"),
    )
    cnt_dec = F.col("cnt").cast("decimal(18,0)")
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    w_ord = Window.orderBy("day")
    framed = daily.select(
        "day",
        F.row_number().over(w_ord).cast("bigint").alias("rn"),
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("rev").over(w).cast("double").alias("sx"),
        F.sum(cnt_dec).over(w).cast("double").alias("sy"),
        F.sum(F.col("rev") * cnt_dec).over(w).cast("double").alias("sxy"),
        F.sum(F.col("rev") * F.col("rev")).over(w).cast("double").alias("sxx"),
        F.sum(cnt_dec * cnt_dec).over(w).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return framed.filter(F.col("rn") >= 7).select(
        "day",
        (
            (n * F.col("sxy") - sx * sy)
            / (
                F.sqrt(n * F.col("sxx") - sx * sx)
                * F.sqrt(n * F.col("syy") - sy * sy)
            )
        ).alias("corr_7d"),
    )


@register(
    "longest_revenue_decline",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    ),
    flagged AS (
        SELECT month, rev,
               CASE WHEN rev < lag(rev) OVER (ORDER BY month)
                    THEN 1 ELSE 0 END AS declining,
               CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS rn
        FROM monthly
    ),
    islands AS (
        SELECT month, rn,
               rn - CAST(SUM(declining) OVER (ORDER BY month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS grp
        FROM flagged WHERE declining = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_decline_runs,
           CAST(COALESCE(MAX(run_len), 0) AS BIGINT) AS longest_decline_months,
           MIN(first_month) AS earliest_decline_start
    FROM (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS run_len,
               MIN(month) AS first_month
        FROM islands GROUP BY grp
    )
    """,
)
def longest_revenue_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive month-over-month revenue declines —
    gaps-and-islands on a CONDITION (rev < prev) rather than on calendar
    adjacency (user_activity_streaks' variant): declining months group by
    rn minus the running count of declines, which is constant exactly
    within a maximal consecutive run. Decimal comparisons, integer island
    arithmetic. Everything after the month rollup is a |months|-row
    computation."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    w = Window.orderBy("month")
    flagged = monthly.select(
        "month",
        F.when(F.col("rev") < F.lag("rev").over(w), 1).otherwise(0).alias(
            "declining"
        ),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    islands = flagged.filter(F.col("declining") == 1).select(
        "month",
        (
            F.col("rn")
            - F.sum("declining")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint")
        ).alias("grp"),
    )
    runs = islands.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("run_len"),
        F.min("month").alias("first_month"),
    )
    return runs.agg(
        F.count("*").cast("bigint").alias("n_decline_runs"),
        F.coalesce(F.max("run_len"), F.lit(0)).cast("bigint").alias(
            "longest_decline_months"
        ),
        F.min("first_month").alias("earliest_decline_start"),
    )


@register(
    "remaining_backlog",
    oracle="""
    SELECT o_custkey AS customer_id, o_orderkey AS order_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
               AS remaining_spend,
           CAST(count(*) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
               AS remaining_orders
    FROM orders
    """,
)
def remaining_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse running total: from each order forward, the customer's
    remaining lifetime spend and order count — the CURRENT ROW TO
    UNBOUNDED FOLLOWING frame (running_total's mirror), the shape behind
    remaining-contract-value and burn-down reports. Exact decimal window
    sums; one customer-keyed sort window."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("remaining_spend"),
        F.count("*").over(w).cast("bigint").alias("remaining_orders"),
    )


@register(
    "nth_order_value",
    oracle="""
    SELECT o_custkey AS customer_id,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders,
           CAST(nth_value(CAST(o_totalprice AS DECIMAL(18,2)), 3) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS DOUBLE) AS third_order_value
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    """,
)
def nth_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-order value per customer via nth_value over the full
    partition frame (NULL for customers with fewer than three orders) —
    the onboarding-milestone metric ('what does the third purchase look
    like'). nth_value needs the explicit unbounded-both-ends frame in
    both engines or the default running frame truncates it; one row per
    customer via the same keep-first window. Single shuffle, both
    windows share it."""
    orders = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = order_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        orders.select(
            F.col("o_custkey").alias("customer_id"),
            F.count("*")
            .over(Window.partitionBy("o_custkey"))
            .cast("bigint")
            .alias("n_orders"),
            F.nth_value(dec("o_totalprice"), 3)
            .over(full)
            .cast("double")
            .alias("third_order_value"),
            F.row_number().over(order_w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
