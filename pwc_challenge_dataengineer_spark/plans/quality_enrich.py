"""Data-quality + enrichment queries (SURVEY.md §2.11 / §2.12).

- quality_score_lineitem  realtime_silver_processor.py:156-322 weighted rule
                          engine → score, 5-tier label, issues array
- completeness_events     spark_silver.py:156-171 completeness score
- outlier_3sigma          spark_silver.py:174-191 (distributed, no collect)
- temporal_features       advanced_features.py:27-71, 326-362 (+cyclical)
- currency_enrich         realtime_silver_processor.py:427-445 via broadcast
                          lookup join (scale path for big maps)
- customer_id_cleanup     realtime_silver_processor.py:351-364
- product_categorize      enrichment.py:188-210 keyword categorization
- return_risk_enrich      realtime_silver_processor.py:403-470 (line_total,
                          return detection, risk scoring)
- json_extract_props      cdc_processor.py:219 from_json / get_json_object
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.enrichment import (
    categorize_by_keywords,
    clean_customer_id,
    risk_score,
)
from ..functions.quality import (
    LINEITEM_RULES,
    apply_quality_rules,
    completeness_score,
    outlier_3sigma,
)
from ..schemas import load_table
from .catalog import register

# Rule expressions inlined into the oracle (must mirror LINEITEM_RULES).
_RULE_SQL = {
    "valid_orderkey": "l_orderkey IS NOT NULL",
    "valid_quantity": "l_quantity > 0",
    "valid_price": "l_extendedprice >= 0",
    "valid_discount": "l_discount BETWEEN 0 AND 0.5",
    "not_returned": "l_returnflag <> 'R'",
    "has_shipdate": "l_shipdate IS NOT NULL",
}
_WEIGHTS = {r.name: r.weight for r in LINEITEM_RULES}
_TOTAL_W = sum(_WEIGHTS.values())
_SCORE_SQL = "(" + " + ".join(
    f"(CASE WHEN coalesce(({_RULE_SQL[r.name]}), FALSE) THEN {r.weight} ELSE 0.0 END)"
    for r in LINEITEM_RULES
) + f") / {_TOTAL_W}"
_ISSUES_SQL = "list_filter([" + ", ".join(
    f"CASE WHEN NOT coalesce(({_RULE_SQL[r.name]}), FALSE) THEN '{r.name}' END"
    for r in LINEITEM_RULES
) + "], x -> x IS NOT NULL)"


@register(
    "quality_score_lineitem",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {_SCORE_SQL} AS quality_score,
           CASE WHEN {_SCORE_SQL} >= 0.95 THEN 'excellent'
                WHEN {_SCORE_SQL} >= 0.85 THEN 'good'
                WHEN {_SCORE_SQL} >= 0.70 THEN 'fair'
                WHEN {_SCORE_SQL} >= 0.50 THEN 'poor'
                ELSE 'critical' END AS quality_tier,
           {_ISSUES_SQL} AS quality_issues
    FROM lineitem
    """,
)
def quality_score_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return apply_quality_rules(lineitem).select(
        "l_orderkey", "l_linenumber", "quality_score", "quality_tier", "quality_issues"
    )


@register(
    "completeness_events",
    oracle="""
    SELECT event_id,
           CAST((CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN event_type IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 4
               AS completeness_score
    FROM events
    """,
)
def completeness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return completeness_score(
        events, ["user_id", "event_type", "value", "props"]
    ).select("event_id", "completeness_score")


@register(
    "outlier_3sigma",
    oracle="""
    WITH stats AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               COUNT(o_totalprice) AS n
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           abs(o_totalprice - s / n) > 3 * sqrt((s2 - s * s / n) / (n - 1))
               AS is_outlier
    FROM orders, stats
    """,
)
def outlier_3sigma_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return outlier_3sigma(orders, "o_totalprice").select(
        "o_orderkey", "o_totalprice", "is_outlier"
    )


@register(
    "temporal_features",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS year,
           CAST(month(o_orderdate) AS INT) AS month,
           CAST(quarter(o_orderdate) AS INT) AS quarter,
           CAST(day(o_orderdate) AS INT) AS day_of_month,
           CAST(isodow(o_orderdate) AS INT) AS day_of_week,
           isodow(o_orderdate) >= 6 AS is_weekend,
           CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'winter'
                WHEN month(o_orderdate) IN (3, 4, 5) THEN 'spring'
                WHEN month(o_orderdate) IN (6, 7, 8) THEN 'summer'
                ELSE 'autumn' END AS season,
           round(sin(2 * pi() * (month(o_orderdate) - 1) / 12), 6) AS month_sin,
           round(cos(2 * pi() * (month(o_orderdate) - 1) / 12), 6) AS month_cos
    FROM orders
    """,
)
def temporal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.enrichment import add_temporal_features

    orders = load_table(spark, sf_dir, "orders")
    return add_temporal_features(orders, "o_orderdate").select(
        "o_orderkey",
        "year",
        "month",
        "quarter",
        "day_of_month",
        "day_of_week",
        "is_weekend",
        "season",
        "month_sin",
        "month_cos",
    )


_CURRENCIES = ["USD", "EUR", "GBP", "JPY", "AUD"]


@register(
    "currency_enrich",
    oracle=f"""
    SELECT c_custkey, n_name AS nation,
           CASE (CAST(substr(n_name, 8) AS INT) % 5)
                WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' WHEN 2 THEN 'GBP'
                WHEN 3 THEN 'JPY' ELSE 'AUD' END AS currency_code
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def currency_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency assignment via broadcast lookup join (the when-chain in the
    reference does not scale to big alias maps; a broadcast join does)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lookup = spark.createDataFrame(
        [(f"NATION_{i}", _CURRENCIES[i % 5]) for i in range(25)],
        T.StructType(
            [
                T.StructField("nation_name", T.StringType(), False),
                T.StructField("currency_code", T.StringType(), False),
            ]
        ),
    )
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(lookup), F.col("n_name") == F.col("nation_name"))
        .select("c_custkey", F.col("n_name").alias("nation"), "currency_code")
    )


@register(
    "customer_id_cleanup",
    oracle="""
    WITH messy AS (
        SELECT event_id,
               CASE user_id % 5
                    WHEN 0 THEN CAST(user_id AS VARCHAR)
                    WHEN 1 THEN ''
                    WHEN 2 THEN ' guest '
                    WHEN 3 THEN 'user-abc'
                    ELSE NULL END AS raw_id
        FROM events
    )
    SELECT event_id, raw_id,
           CASE WHEN raw_id IS NULL OR trim(raw_id) = '' THEN 'ANONYMOUS'
                WHEN upper(trim(raw_id)) IN ('GUEST', 'ANON', 'ANONYMOUS') THEN 'GUEST'
                WHEN regexp_matches(trim(raw_id), '^[0-9]+$') THEN trim(raw_id)
                ELSE 'INVALID' END AS clean_id
    FROM messy
    """,
)
def customer_id_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy-id synthesis + the reference's cleanup chain."""
    events = load_table(spark, sf_dir, "events")
    messy = events.select(
        "event_id",
        F.when(F.col("user_id") % 5 == 0, F.col("user_id").cast("string"))
        .when(F.col("user_id") % 5 == 1, "")
        .when(F.col("user_id") % 5 == 2, " guest ")
        .when(F.col("user_id") % 5 == 3, "user-abc")
        .alias("raw_id"),
    )
    return messy.withColumn("clean_id", clean_customer_id(F.col("raw_id")))


@register(
    "product_categorize",
    oracle="""
    SELECT p_partkey, p_name,
           CASE WHEN lower(p_name) LIKE '%bolt%' OR lower(p_name) LIKE '%rod%'
                     THEN 'fasteners'
                WHEN lower(p_name) LIKE '%widget%' OR lower(p_name) LIKE '%gizmo%'
                     THEN 'gadgets'
                WHEN lower(p_name) LIKE '%anvil%' OR lower(p_name) LIKE '%plate%'
                     THEN 'heavy_goods'
                ELSE 'other' END AS category
    FROM part
    """,
)
def product_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    cats = {
        "fasteners": ["bolt", "rod"],
        "gadgets": ["widget", "gizmo"],
        "heavy_goods": ["anvil", "plate"],
    }
    return part.select(
        "p_partkey", "p_name", categorize_by_keywords(F.col("p_name"), cats).alias("category")
    )


@register(
    "return_risk_enrich",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS line_amount,
           (l_returnflag = 'R') AS is_return,
           CAST(CASE WHEN l_returnflag = 'R' THEN 0.8
                WHEN abs(l_extendedprice * (1 - l_discount)) > 100000 THEN 0.9
                WHEN l_quantity > 1000 THEN 0.7
                WHEN l_extendedprice * (1 - l_discount) < 0 THEN 0.6
                ELSE 0.1 END AS DOUBLE) AS risk_score
    FROM lineitem
    """,
)
def return_risk_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    is_ret = F.col("l_returnflag") == "R"
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        amount.alias("line_amount"),
        is_ret.alias("is_return"),
        risk_score(amount, F.col("l_quantity"), is_ret).alias("risk_score"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_value,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    WHERE props IS NOT NULL
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsing (from_json with explicit schema — the
    cdc_processor envelope pattern, applied to the events props column)."""
    events = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType(), True)])
    return (
        events.filter(F.col("props").isNotNull())
        .withColumn("__p", F.from_json("props", schema))
        .select(
            "event_id",
            F.col("__p.k").alias("k_value"),
            (F.col("__p.k") % 10).alias("k_bucket"),
        )
    )


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
               AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
               AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE)
               / COUNT(*) AS avg_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT)
                         > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events GROUP BY 1
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured stats through Spark 4's VARIANT type: parse the
    props JSON once into a variant (binary-encoded, no schema declared
    up front — the open-schema path the reference's get_json_object
    string-walk can't type) and extract a typed field with variant_get.
    Aggregation arithmetic stays integer-exact; the avg is a division of
    deterministic values. At scale VARIANT beats per-access JSON string
    parsing: one parse, columnar binary thereafter."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
        F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high"),
    )


@register(
    "order_total_reconciliation",
    oracle="""
    WITH line_totals AS (
        SELECT l_orderkey,
               SUM((CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2))))
                   * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS charge_dec
        FROM lineitem GROUP BY 1
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN charge_dec IS NULL THEN 1 END) AS BIGINT)
               AS n_missing_lines,
           CAST(COUNT(CASE WHEN abs(CAST(o_totalprice AS DECIMAL(18,2))
                                    - charge_dec) <= CAST(0.01 AS DECIMAL(18,2))
                           THEN 1 END) AS BIGINT) AS n_reconciled,
           CAST(MAX(abs(CAST(o_totalprice AS DECIMAL(18,2)) - charge_dec))
                AS DOUBLE) AS max_abs_diff
    FROM orders LEFT JOIN line_totals ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial reconciliation: does each order header's total match the
    sum of its line charges (extprice * (1-disc) * (1+tax)) within a
    cent? The audit-balancing control every finance-grade pipeline runs
    between fact grains — reported per order status as reconciled /
    missing-lines / max divergence. All comparisons happen in exact
    DECIMAL (the tolerance is a decimal literal), so the verdict is
    engine-exact. One orderkey aggregate + one co-keyed left join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
    ) * (F.lit(1).cast("decimal(4,2)") + F.col("l_tax").cast("decimal(4,2)"))
    line_totals = li.groupBy("l_orderkey").agg(F.sum(charge).alias("charge_dec"))
    j = orders.join(line_totals, orders.o_orderkey == line_totals.l_orderkey, "left")
    diff = F.abs(
        F.col("o_totalprice").cast("decimal(18,2)") - F.col("charge_dec")
    )
    return j.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.count(F.when(F.col("charge_dec").isNull(), 1))
        .cast("bigint")
        .alias("n_missing_lines"),
        F.count(F.when(diff <= F.lit("0.01").cast("decimal(18,2)"), 1))
        .cast("bigint")
        .alias("n_reconciled"),
        F.max(diff).cast("double").alias("max_abs_diff"),
    )


@register(
    "cross_field_consistency",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(CASE WHEN l_shipdate < o_orderdate THEN 1 END) AS BIGINT)
               AS n_ship_before_order,
           CAST(COUNT(CASE WHEN l_shipdate >= o_orderdate
                            AND date_diff('day', o_orderdate, l_shipdate) <= 180
                           THEN 1 END) AS BIGINT) AS n_within_sla,
           CAST(COUNT(CASE WHEN l_shipdate >= o_orderdate
                            AND date_diff('day', o_orderdate, l_shipdate) <= 180
                           THEN 1 END) AS DOUBLE) / COUNT(*) AS sla_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field (inter-table) consistency rule: a line must not ship
    before its order exists, and should ship within the 180-day SLA —
    the temporal-integrity check that single-column dbt tests
    (value_range_check, accepted_values_check) can't express because it
    relates two columns across a join. Reported per priority class with
    violation and SLA-hit counts; integer day arithmetic, one division.
    One co-keyed join + aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    before = F.col("l_shipdate") < F.col("o_orderdate")
    within = (~before) & (
        F.datediff("l_shipdate", "o_orderdate") <= 180
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.count(F.when(before, 1)).cast("bigint").alias("n_ship_before_order"),
        F.count(F.when(within, 1)).cast("bigint").alias("n_within_sla"),
        (F.count(F.when(within, 1)).cast("double") / F.count("*")).alias(
            "sla_rate"
        ),
    )
