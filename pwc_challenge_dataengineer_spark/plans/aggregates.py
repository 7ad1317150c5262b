"""Aggregation-variety queries (SURVEY.md §2.4).

- pivot_returnflag     dataframe_ops.py:266-279 (groupBy().pivot().agg())
- rollup_quarterly     datamart_service.py:459-472 — the reference aggregates
                       months→quarters in a driver-side Python loop; here it
                       is a real ROLLUP (grouping sets), fully distributed
- cube_status          cube() over returnflag × linestatus (available-free
                       analog, SURVEY §2.4 'grouping sets' row)
- percentiles_disc     materialized_views_manager.py:251-252 PERCENTILE_CONT
                       re-expressed as deterministic discrete percentiles
                       (row_number index selection — engine-exact; the
                       interpolating variants differ at ulp level between
                       engines and live in quality functions instead)
- histogram_totalprice stream_aggregations.py:375-453 histogram aggregator →
                       floor-bucket groupBy
- conditional_aggs     realtime_gold_processor.py:186-187 (sum(case when))
- null_profile         spark_silver.py:203-206 per-column null loop → ONE
                       aggregation pass over all columns
- mode_per_user        advanced_features.py mode → count + row_number
- grouped_stats        spark_silver.py:174-191 mean/stddev — stddev computed
                       from exact decimal sums (sqrt((Σx²−(Σx)²/n)/(n−1)))
                       so both engines emit bit-identical doubles
- distinct_counts      spark_gold.py:59-60 exact countDistinct battery
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from ._parity import REV_DEC_SQL, REV_SUM_SQL, dec, money_sum_sql, rev_dec
from .catalog import register


@register(
    "pivot_returnflag",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN {REV_DEC_SQL} END) AS DOUBLE) AS "A",
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN {REV_DEC_SQL} END) AS DOUBLE) AS "N",
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {REV_DEC_SQL} END) AS DOUBLE) AS "R"
    FROM lineitem
    GROUP BY 1
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — never let Spark scan for distinct
    pivot values at 100 TB."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(rev_dec()).cast("double"))
    )


@register(
    "rollup_quarterly",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           COUNT(*) AS order_count,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP(1, 2)
    """,
)
def rollup_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_quarter", F.quarter("o_orderdate"))
        .rollup("order_year", "order_quarter")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


@register(
    "cube_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS line_count,
           {REV_SUM_SQL} AS revenue,
           SUM(l_quantity) AS total_qty
    FROM lineitem
    GROUP BY CUBE(1, 2)
    """,
)
def cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("line_count"),
        F.sum(rev_dec()).cast("double").alias("revenue"),
        F.sum("l_quantity").alias("total_qty"),
    )


@register(
    "percentiles_disc",
    oracle="""
    WITH ranked AS (
        SELECT n_name AS nation, o_totalprice,
               row_number() OVER (PARTITION BY n_name ORDER BY o_totalprice, o_orderkey) AS idx,
               COUNT(*) OVER (PARTITION BY n_name) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT nation,
           MAX(CASE WHEN idx = CAST(ceil(0.25 * n) AS BIGINT) THEN o_totalprice END) AS p25,
           MAX(CASE WHEN idx = CAST(ceil(0.50 * n) AS BIGINT) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN idx = CAST(ceil(0.95 * n) AS BIGINT) THEN o_totalprice END) AS p95
    FROM ranked
    GROUP BY 1
    """,
)
def percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles via rank-index selection: picks actual data
    values, so Spark and DuckDB agree exactly (no interpolation arithmetic).
    The 100 TB path swaps this for percentile_approx behind the same API."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "o_totalprice", "o_orderkey")
    )
    w = Window.partitionBy("nation").orderBy("o_totalprice", "o_orderkey")
    ranked = base.withColumn("idx", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("nation"))
    )

    def pick(p: float):
        return F.max(
            F.when(
                F.col("idx") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        )

    return ranked.groupBy("nation").agg(
        pick(0.25).alias("p25"), pick(0.50).alias("p50"), pick(0.95).alias("p95")
    )


@register(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 25000) * 25000 AS DOUBLE) AS bucket_low,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: floor-bucket groupBy (map-side combinable —
    the scalable form of the reference's in-process histogram aggregator)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000)
    return orders.groupBy(
        bucket.cast("bigint").alias("bucket"),
        (bucket * 25000).cast("double").alias("bucket_low"),
    ).agg(F.count("*").alias("n_orders"))


@register(
    "conditional_aggs",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) AS line_count,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS return_count,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS return_rate,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
               AS discounted_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    is_return = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("line_count"),
            F.sum(is_return).alias("return_count"),
            (F.sum(is_return).cast("double") / F.count("*")).alias("return_rate"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "discounted_count"
            ),
        )
    )


@register(
    "null_profile",
    oracle="""
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
           CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props
    FROM events
    """,
)
def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts in ONE aggregation pass — replaces the
    reference's per-column filter(isNull).count() loop (N full scans)."""
    events = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("total_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        for c in events.columns
    ]
    return events.agg(*aggs)


@register(
    "mode_per_user",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_type AS top_event_type, n AS occurrences
    FROM counts
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) = 1
    """,
)
def mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode = count + row_number (ties broken lexicographically)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("top_event_type"), F.col("n").alias("occurrences")
        )
    )


@register(
    "grouped_stats",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_price,
           sqrt((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                          * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/stddev per segment from exact decimal Σx and Σx² — deterministic
    across engines, unlike streaming-variance stddev_samp."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    d = dec("o_totalprice")
    sum_x = F.sum(d).cast("double")
    sum_x2 = F.sum(d * d).cast("double")
    n = F.count("*")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            n.alias("n"),
            (sum_x / n).alias("mean_price"),
            F.sqrt((sum_x2 - sum_x * sum_x / n) / (n - F.lit(1))).alias("stddev_price"),
        )
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS customers_with_orders,
           COUNT(DISTINCT o_orderkey) AS orders_cnt,
           COUNT(DISTINCT o_orderpriority) AS priorities,
           COUNT(DISTINCT CAST(year(o_orderdate) AS INT)) AS years_active
    FROM orders
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count battery. At 100 TB swap for
    approx_count_distinct (HLL) behind the approximate=True flag — flagged
    divergence per SURVEY §2.4."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("customers_with_orders"),
        F.countDistinct("o_orderkey").alias("orders_cnt"),
        F.countDistinct("o_orderpriority").alias("priorities"),
        F.countDistinct(F.year("o_orderdate").cast("int")).alias("years_active"),
    )


@register(
    "grouping_sets_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS order_count,
           {money_sum_sql('o_totalprice')} AS revenue,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    """,
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.4 — absent in the reference, free in
    Spark): per-status, per-priority, cross, and grand-total aggregates in
    one shuffle pass, with grouping() flags disambiguating NULL keys."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], ["o_orderstatus", "o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("order_count"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


@register(
    "time_series_gapfill",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events),
    cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type, c.d AS event_date,
           COALESCE(daily.rev, CAST(0 AS DOUBLE)) AS revenue,
           daily.rev IS NULL AS gap_filled
    FROM cal c
    CROSS JOIN types t
    LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = c.d
    """,
)
def time_series_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event type: missing calendar days filled with
    zero revenue (warehouse resample/gap-fill — the dashboard op the
    reference fakes client-side). The calendar derives from a single-row
    min/max agg exploded via sequence(); the spine (days × types) is tiny
    and broadcast into the left join against the daily aggregate."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("rev"))
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    types = events.select("event_type").distinct()
    spine = cal.crossJoin(types)
    return (
        spine.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.col("d").alias("event_date"),
            F.coalesce("rev", F.lit(0.0)).alias("revenue"),
            F.col("rev").isNull().alias("gap_filled"),
        )
    )


@register(
    "hypertable_rollup",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1
    ),
    daily AS (
        SELECT date_trunc('day', bucket) AS bucket,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(CAST(total_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM hourly GROUP BY 1
    ),
    monthly AS (
        SELECT date_trunc('month', bucket) AS bucket,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(CAST(total_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM daily GROUP BY 1
    )
    SELECT 'hour' AS level, * FROM hourly
    UNION ALL SELECT 'day', * FROM daily
    UNION ALL SELECT 'month', * FROM monthly
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical continuous aggregate (the hypertable/TimescaleDB rollup
    pattern): each coarser level re-aggregates the FINER AGGREGATE, never
    the raw events — at 100 TB the daily rollup reads #hours rows, not the
    event table, and the chain shares one scan + one wide shuffle. Sums
    re-enter DECIMAL at each level so the chain stays bit-exact (see
    plans/_parity.py)."""
    events = load_table(spark, sf_dir, "events")
    vdec = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("n_events"), vdec.alias("total_value")
    )
    def up(df, unit):
        return df.groupBy(F.date_trunc(unit, "bucket").alias("bucket")).agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    daily = up(hourly, "day")
    monthly = up(daily, "month")
    lvl = lambda df, name: df.select(F.lit(name).alias("level"), "bucket", "n_events", "total_value")
    return lvl(hourly, "hour").unionByName(lvl(daily, "day")).unionByName(lvl(monthly, "month"))


def _cms_col_sql(row: int, key: str = "event_type", width: int = 64) -> str:
    return (
        f"CAST(('0x' || substr(md5('{row}:' || {key}), 1, 8))::BIGINT"
        f" % {width} AS INT)"
    )


@register(
    "cms_event_counts",
    oracle=f"""
    WITH cells AS (
        SELECT r.row, CASE r.row
            WHEN 0 THEN {_cms_col_sql(0)} WHEN 1 THEN {_cms_col_sql(1)}
            WHEN 2 THEN {_cms_col_sql(2)} WHEN 3 THEN {_cms_col_sql(3)} END AS col
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS row) r
    ),
    sketch AS (SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    probes AS (
        SELECT DISTINCT event_type FROM events
    ),
    probe_cells AS (
        SELECT p.event_type, r.row, CASE r.row
            WHEN 0 THEN {_cms_col_sql(0, 'p.event_type')}
            WHEN 1 THEN {_cms_col_sql(1, 'p.event_type')}
            WHEN 2 THEN {_cms_col_sql(2, 'p.event_type')}
            WHEN 3 THEN {_cms_col_sql(3, 'p.event_type')} END AS col
        FROM probes p, (SELECT unnest([0, 1, 2, 3]) AS row) r
    )
    SELECT pc.event_type,
           MIN(COALESCE(s.cnt, 0)) AS estimated_count,
           (SELECT COUNT(*) FROM events e WHERE e.event_type = pc.event_type)
               AS true_count
    FROM probe_cells pc LEFT JOIN sketch s ON s.row = pc.row AND s.col = pc.col
    GROUP BY 1
    """,
)
def cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimates vs exact counts
    (functions/sketches.py — d=4, w=64, md5 hash rows; cell tables are
    additive so sketches built per-partition/per-day merge by union+sum).
    With 5 distinct keys and w=64 the estimates equal the true counts unless
    rows collide — the oracle proves the sketch algebra, not luck.

    One scan: events aggregate to per-key counts ONCE (the true_count the
    query needs anyway), then the sketch is built FROM those counts via
    cell additivity (cms_build weight_col — identical sketch, |keys| input
    rows instead of |events|), probes are the same tiny frame, and both
    final joins broadcast. r01 shape; the r02 regression (2.18×) came from
    scanning events three times (sketch + distinct probes + true counts)."""
    from ..functions.sketches import cms_build, cms_estimate

    events = load_table(spark, sf_dir, "events")
    per_key = events.groupBy("event_type").agg(
        F.count("*").alias("true_count")
    )
    sketch = cms_build(per_key, "event_type", weight_col="true_count")
    est = cms_estimate(sketch, per_key.select("event_type"), "event_type")
    return est.join(F.broadcast(per_key), "event_type")


_HH_KEY = "CAST(p.user_id AS VARCHAR)"
_HH_W = 1024
# Per-user event counts cluster around 66 at every SF (users scale with
# events in this data); 80 sits just above p90, so true heavy hitters exist
# at every test scale and the candidate set mixes them with collision FPs.
_HH_THRESH = 80


@register(
    "cms_heavy_hitters",
    # Sketch-driven heavy-hitter candidates over a WIDE key domain (users,
    # not the 5 event types): CMS never underestimates, so filtering on the
    # estimate keeps every true heavy hitter and admits only collision-
    # inflated false positives — is_true_heavy exposes exactly which. The
    # sketch is d=4 × w=1024 (vs 64 for the tiny-domain demo) so cells hold
    # ~1-2 keys and the candidate set stays tight.
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
        FROM events GROUP BY 1
    ),
    probe AS (
        SELECT p.user_id, p.true_count, r.row,
               CASE r.row
                   WHEN 0 THEN {_cms_col_sql(0, _HH_KEY, _HH_W)}
                   WHEN 1 THEN {_cms_col_sql(1, _HH_KEY, _HH_W)}
                   WHEN 2 THEN {_cms_col_sql(2, _HH_KEY, _HH_W)}
                   WHEN 3 THEN {_cms_col_sql(3, _HH_KEY, _HH_W)} END AS col
        FROM per_key p, (SELECT unnest([0, 1, 2, 3]) AS row) r
    ),
    cells AS (
        SELECT row, col, SUM(true_count) AS cnt
        FROM probe GROUP BY 1, 2
    ),
    est AS (
        -- CAST: DuckDB promotes SUM(BIGINT) to HUGEINT; Spark emits bigint.
        -- Pin the oracle's arrow type to int64 so typed hashes agree.
        SELECT p.user_id, p.true_count,
               CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS estimated_count
        FROM probe p LEFT JOIN cells s ON s.row = p.row AND s.col = p.col
        GROUP BY 1, 2
    )
    SELECT user_id, estimated_count, true_count,
           true_count >= {_HH_THRESH} AS is_true_heavy
    FROM est WHERE estimated_count >= {_HH_THRESH}
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a Count-Min Sketch over the user key
    domain: report every user whose ESTIMATED event count passes the
    threshold. The point-estimate is an upper bound, so the candidate set
    provably contains all true heavy hitters (no false negatives — the
    guarantee that lets a 100 TB pipeline shortlist keys from a d·w-cell
    sketch instead of a full exact count); collision-inflated false
    positives carry is_true_heavy = false. Same one-scan layout as
    cms_event_counts: per-key counts feed the weighted sketch build, the
    probes, and the comparison column."""
    from ..functions.sketches import cms_build, cms_estimate

    events = load_table(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(
        F.count("*").alias("true_count")
    )
    sketch = cms_build(per_key, "user_id", width=_HH_W, weight_col="true_count")
    est = cms_estimate(
        sketch, per_key.select("user_id"), "user_id", width=_HH_W
    )
    return (
        est.join(F.broadcast(per_key), "user_id")
        .filter(F.col("estimated_count") >= _HH_THRESH)
        .select(
            "user_id",
            "estimated_count",
            "true_count",
            (F.col("true_count") >= _HH_THRESH).alias("is_true_heavy"),
        )
    )


@register(
    "unpivot_measures",
    oracle="""
    WITH long AS (
        SELECT l_returnflag, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM long GROUP BY 1, 2
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of the lineitem measures then re-aggregate —
    the inverse of pivot_returnflag. DataFrame.unpivot emits the long form
    in ONE pass over the scan (no 4× self-union); the aggregate shuffles on
    (returnflag, measure)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    long = lineitem.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    ).unpivot(
        ids=["l_returnflag"],
        values=["quantity", "extendedprice", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@register(
    "collect_set_priorities",
    oracle="""
    SELECT o_custkey AS customer_id,
           array_to_string(array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority), ',')
               AS priorities_csv,
           CAST(COUNT(DISTINCT o_orderpriority) AS INT) AS n_priorities
    FROM orders GROUP BY 1
    """,
)
def collect_set_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct order priorities per customer as a
    sorted CSV (collect_set is unordered — sort_array makes it deterministic
    before serialization, the invariant every array-agg query here follows)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities_csv"
        ),
        F.countDistinct("o_orderpriority").cast("int").alias("n_priorities"),
    )


@register(
    "order_ship_lag",
    oracle="""
    WITH lags AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days,
               l_orderkey, l_linenumber
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    ranked AS (
        SELECT o_orderpriority, lag_days,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY lag_days, l_orderkey, l_linenumber)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        FROM lags
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           MIN(lag_days) AS min_lag,
           MAX(lag_days) AS max_lag,
           CAST(SUM(lag_days) AS DOUBLE) / MAX(n) AS avg_lag,
           MIN(CASE WHEN rn = (n + 1) // 2 THEN lag_days END) AS p50_lag,
           MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END) AS p90_lag
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def order_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority class: min/max/avg plus
    EXACT discrete p50/p90 — computed by explicit position pick
    (row_number against (n+1)//2 and ceil(0.9n), full tiebreakers) rather
    than each engine's quantile function, whose interpolation/selection
    conventions differ. Integer day arithmetic end-to-end; the only
    doubles are the avg division of identical operands. One fact join,
    one per-priority sort window, one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lags = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lag_days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "lag_days", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = lags.select(
        "o_orderpriority",
        "lag_days",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    p50_pos = F.expr("(n + 1) div 2")
    p90_pos = F.expr("(9 * n + 9) div 10")
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_lines"),
        F.min("lag_days").alias("min_lag"),
        F.max("lag_days").alias("max_lag"),
        (F.sum("lag_days").cast("double") / F.max("n")).alias("avg_lag"),
        F.min(F.when(F.col("rn") == p50_pos, F.col("lag_days"))).alias("p50_lag"),
        F.min(F.when(F.col("rn") == p90_pos, F.col("lag_days"))).alias("p90_lag"),
    )


@register(
    "supplier_hhi",
    oracle=f"""
    WITH srev AS (
        SELECT s_nationkey, l_suppkey,
               SUM({REV_DEC_SQL}) AS rev_dec
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT s_nationkey, CAST(SUM(rev_dec) AS DOUBLE) AS t
        FROM srev GROUP BY 1
    ),
    shares AS (
        SELECT s.s_nationkey, s.l_suppkey,
               (CAST(s.rev_dec AS DOUBLE) / t.t)
               * (CAST(s.rev_dec AS DOUBLE) / t.t) AS sh2
        FROM srev s JOIN tot t ON s.s_nationkey = t.s_nationkey
    )
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           round(list_reduce(
               list_prepend(0.0::DOUBLE, list(sh2 ORDER BY l_suppkey)),
               (acc, x) -> acc + x), 6) AS hhi
    FROM shares JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation: sum of squared market shares — the antitrust/market-structure
    statistic. Each share squares a deterministic double (exact decimal
    revenue / exact decimal total), and the per-nation sum of those
    squares runs as an ORDERED fold keyed by suppkey (same device as
    chisq_segment_priority) because squared shares are irrational doubles
    whose parallel summation order Spark doesn't pin. Rounded to 6dp at
    the end — a presentation round on an already-deterministic value,
    not a tie-breaker. One fact shuffle; everything after is per-nation
    supplier lists."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    srev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(rev_dec()).alias("rev_dec"))
    )
    tot = srev.groupBy("s_nationkey").agg(
        F.sum("rev_dec").cast("double").alias("t")
    )
    share = F.col("rev_dec").cast("double") / F.col("t")
    shares = srev.join(tot, "s_nationkey").select(
        "s_nationkey", "l_suppkey", (share * share).alias("sh2")
    )
    return (
        shares.join(F.broadcast(nation), shares.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("l_suppkey", "sh2"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["sh2"],
                ),
                6,
            ).alias("hhi"),
        )
    )


@register(
    "winsorized_mean_price",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
               CAST(row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
                                                l_orderkey, l_linenumber)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        FROM lineitem
    ),
    bounds AS (
        SELECT l_returnflag,
               MIN(CASE WHEN rn = (n + 19) // 20 THEN price END) AS lo,
               MIN(CASE WHEN rn = (19 * n + 19) // 20 THEN price END) AS hi
        FROM ranked GROUP BY 1
    )
    SELECT r.l_returnflag,
           CAST(MAX(r.n) AS BIGINT) AS n_lines,
           CAST(MAX(b.lo) AS DOUBLE) AS p05,
           CAST(MAX(b.hi) AS DOUBLE) AS p95,
           CAST(SUM(LEAST(GREATEST(r.price, b.lo), b.hi)) AS DOUBLE) / MAX(r.n)
               AS winsorized_mean
    FROM ranked r JOIN bounds b ON r.l_returnflag = b.l_returnflag
    GROUP BY r.l_returnflag
    """,
)
def winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (5%/95%) of extended price per return flag: clamp
    outliers to exact discrete percentile bounds (position-picked ranks,
    full tiebreakers — not engine quantile functions) and average the
    clamped values in exact decimal. The robust-statistics companion to
    mad_outliers: trims influence instead of flagging. The clamp happens
    in DECIMAL so the final sum/count division is the only float op.
    One per-group sort window, a 3-row bounds join back, one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    w = Window.partitionBy("l_returnflag").orderBy(
        price, "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        price.alias("price"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    bounds = ranked.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 19) div 20"), F.col("price"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("(19 * n + 19) div 20"), F.col("price"))
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("price"), F.col("lo")), F.col("hi"))
    return (
        ranked.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n_lines"),
            F.max("lo").cast("double").alias("p05"),
            F.max("hi").cast("double").alias("p95"),
            (F.sum(clamped).cast("double") / F.max("n")).alias("winsorized_mean"),
        )
    )


@register(
    "nested_order_lines",
    oracle="""
    WITH ranked AS (
        SELECT l_orderkey,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber,
                                           CAST(l_quantity AS BIGINT),
                                           CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS rn
        FROM lineitem
    )
    SELECT l_orderkey,
           CAST(COUNT(*) AS INT) AS n_lines,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(MAX(price) AS DOUBLE) AS max_price,
           CAST(MIN(CASE WHEN rn = 1 THEN qty END) AS BIGINT) AS first_line_qty
    FROM ranked
    GROUP BY l_orderkey
    """,
)
def nested_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nest-then-compute over complex types: collect each order's lines
    into a sorted ARRAY<STRUCT>, then derive stats purely with
    higher-order functions (aggregate / transform / array_max /
    element_at) — the document-model pipeline shape (orders as nested
    records, as a Delta/Iceberg silver table would store them). The
    oracle computes the same stats relationally, so parity proves the
    nested path is lossless: integer fold for quantity, decimal max for
    price, element_at(1) for the first line after the deterministic
    array_sort (linenumbers repeat within synthetic orders, so the sort
    key — and the oracle's matching row_number — is the full
    (ln, qty, price) struct order, not linenumber alone). At scale the collect_list is bounded by lines-per-order
    (~7), not data size."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").cast("bigint").alias("qty"),
                    dec("l_extendedprice").alias("price"),
                )
            )
        ).alias("lines")
    )
    return nested.select(
        "l_orderkey",
        F.size("lines").cast("int").alias("n_lines"),
        F.aggregate(
            F.transform("lines", lambda x: x["qty"]),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_qty"),
        F.array_max(F.transform("lines", lambda x: x["price"]))
        .cast("double")
        .alias("max_price"),
        F.element_at("lines", 1)["qty"].alias("first_line_qty"),
    )


@register(
    "pivot_multi_agg",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN {REV_DEC_SQL} END) AS DOUBLE) AS A_revenue,
           CAST(COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) AS A_n,
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN {REV_DEC_SQL} END) AS DOUBLE) AS N_revenue,
           CAST(COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS BIGINT) AS N_n,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {REV_DEC_SQL} END) AS DOUBLE) AS R_revenue,
           CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS R_n
    FROM lineitem
    GROUP BY 1
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivot value (revenue + count
    per return flag) — Spark names the spread columns {value}_{agg
    alias}, and the oracle mirrors that contract with conditional
    aggregates. Same explicit-value-list rule as pivot_returnflag: never
    let the engine scan for distinct pivot values at scale. One
    map-side-combinable aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            F.sum(rev_dec()).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


@register(
    "tail_risk_orders",
    oracle="""
    WITH ranked AS (
        SELECT n_name AS nation,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               CAST(row_number() OVER (PARTITION BY n_name
                                       ORDER BY o_totalprice, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT nation,
           MAX(n) AS n_orders,
           CAST(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN price END)
                AS DOUBLE) AS p99,
           CAST(SUM(CASE WHEN rn > n - (n + 99) // 100 THEN price END)
                AS DOUBLE) / MAX((n + 99) // 100) AS tail_mean
    FROM ranked
    GROUP BY nation
    """,
)
def tail_risk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-risk profile per nation: exact discrete p99 order value plus
    the mean of the top 1% (the CVaR/expected-shortfall companion — p99
    says where the tail starts, tail_mean says how bad it is inside).
    Both statistics are position-picked with integer arithmetic
    ((99n+99)//100 and a top-k band of (n+99)//100 rows), summed in
    exact decimal, divided once. One sort window per nation over
    post-join rows."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), dec("o_totalprice").alias("price"), "o_orderkey")
    )
    w = Window.partitionBy("nation").orderBy("price", "o_orderkey")
    wn = Window.partitionBy("nation")
    ranked = base.select(
        "nation",
        "price",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    k = F.expr("(n + 99) div 100")
    return ranked.groupBy("nation").agg(
        F.max("n").alias("n_orders"),
        F.min(
            F.when(F.col("rn") == F.expr("(99 * n + 99) div 100"), F.col("price"))
        )
        .cast("double")
        .alias("p99"),
        (
            F.sum(F.when(F.col("rn") > F.col("n") - k, F.col("price"))).cast(
                "double"
            )
            / F.max(k)
        ).alias("tail_mean"),
    )
