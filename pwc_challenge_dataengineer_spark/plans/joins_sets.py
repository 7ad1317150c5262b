"""Join + set-operation queries (SURVEY.md §2.3 / §2.7).

- left_anti_idempotent  build_gold.py:244-245 (skip already-loaded rows)
- semi_join_active      repository EXISTS patterns (sales_repository.py:33-47)
- left_outer_enrich     sales_repository.py:44 (nullable dim key outer join)
- star_join_filtered    datamart_service.py:128-140 (SQL star join, filters +
                        group-by over fact ⋈ 3 dims)
- union_by_name         spark_bronze.py:151-168 (heterogeneous file union,
                        missing columns null-filled)
- change_classify       windowing.py:386-391 + scd2.py:78-90 (composite-key
                        equi-join change detection via checksum full-outer)
- broadcast_region_join engine_strategy.py:439-447 (explicit broadcast of a
                        small dim through a two-level hierarchy)

Scale notes: anti/semi joins stay as hash joins on the key (no distinct
needed); the union path uses unionByName(allowMissingColumns=True) exactly
like the reference but without its per-file .cache() loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.incremental import checksum_classify_changes
from ..schemas import load_table
from ._parity import REV_SUM_SQL, dec, money_sum_sql
from .catalog import register


@register(
    "left_anti_idempotent",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F'
    )
    """,
)
def left_anti_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-load pattern: keep only lineitems whose order is NOT in the
    already-finalized ('F') set — the reference's left_anti dedup before a
    fact append."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    finalized = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return lineitem.join(
        finalized, lineitem.l_orderkey == finalized.o_orderkey, "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")


@register(
    "semi_join_active",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with recent activity (EXISTS → left_semi, no duplicate
    explosion, no distinct needed)."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "left_outer_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_name AS customer_name,
           c.c_mktsegment AS segment,
           (c.c_custkey IS NULL) AS is_anonymous
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def left_outer_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nullable-key enrichment: events whose user may not exist in the
    customer dim (the reference's fact ⋈ dim_customer left outer)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey, "left_outer"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").isNull().alias("is_anonymous"),
    )


@register(
    "star_join_filtered",
    oracle=f"""
    SELECT r_name AS region, o_orderpriority AS priority,
           COUNT(*) AS line_count,
           {REV_SUM_SQL} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag <> 'R'
    GROUP BY 1, 2
    """,
)
def star_join_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered star join through the full geo hierarchy, expressed via the
    Spark SQL surface (same Catalyst plan as the DataFrame form)."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        f"""
        SELECT r_name AS region, o_orderpriority AS priority,
               COUNT(*) AS line_count,
               {REV_SUM_SQL} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_returnflag <> 'R'
        GROUP BY 1, 2
        """
    )


@register(
    "union_by_name",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS amount,
           o_orderpriority AS priority, 'current' AS source_file
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey AS order_id, o_totalprice AS amount,
           NULL AS priority, 'archive' AS source_file
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-file union: the 'archive' slice lacks the priority
    column; unionByName(allowMissingColumns=True) null-fills it."""
    orders = load_table(spark, sf_dir, "orders")
    current = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
        F.lit("current").alias("source_file"),
    )
    archive = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("amount"),
        F.lit("archive").alias("source_file"),
    )
    return current.unionByName(archive, allowMissingColumns=True)


@register(
    "change_classify",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 10 <> 0
    ),
    new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END
                   AS c_acctbal
        FROM customer WHERE c_custkey % 10 <> 1
    )
    SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                WHEN md5(concat_ws(chr(31), coalesce(n.c_name, chr(0)),
                         coalesce(CAST(n.c_acctbal AS VARCHAR), chr(0))))
                  <> md5(concat_ws(chr(31), coalesce(o.c_name, chr(0)),
                         coalesce(CAST(o.c_acctbal AS VARCHAR), chr(0))))
                     THEN 'update'
                ELSE 'unchanged' END AS change_type
    FROM new n FULL OUTER JOIN old o ON n.c_custkey = o.c_custkey
    """,
)
def change_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-based snapshot diff (two deterministic synthetic snapshots of
    customer) → insert/update/unchanged/delete. NOTE: cross-engine string
    parity of CAST(double AS VARCHAR) holds because c_acctbal is 2-decimal;
    the checksum column itself is not emitted."""
    customer = load_table(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    new = customer.filter(F.col("c_custkey") % 10 != 1).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return checksum_classify_changes(
        old, new, key_cols=["c_custkey"], value_cols=["c_name", "c_acctbal"]
    )


@register(
    "broadcast_region_join",
    oracle=f"""
    SELECT r_name AS region,
           COUNT(DISTINCT s_suppkey) AS suppliers,
           {money_sum_sql('s_acctbal')} AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def broadcast_region_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.countDistinct("s_suppkey").alias("suppliers"),
            F.sum(dec("s_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "asof_purchase_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, CAST(MAX(value) AS DOUBLE) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_value AS asof_click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): each purchase event picks up
    the user's latest click value at or before it — union-sort trick, one
    shuffle on user_id, vs DuckDB's native ASOF JOIN as the oracle. The
    right side is pre-deduped per (user, ts) so tie semantics are unambiguous
    on both engines."""
    from ..operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return asof_join_backward(
        purchases, clicks, keys=["user_id"], ts_col="ts", right_cols=["click_value"]
    ).select("event_id", "user_id", "ts", "value", "asof_click_value")


@register(
    "range_join_purchase_errors",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id,
           p.user_id, p.ts AS purchase_ts, e.ts AS error_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND epoch(e.ts) >= epoch(p.ts) - 3600
     AND epoch(e.ts) <= epoch(p.ts) + 3600
    """,
)
def range_join_purchase_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: error events within ±1 h of each purchase, same user
    (operators/asof.py range_join_banded — banded equi-join, not a per-key
    nested loop; the DuckDB oracle states the raw inequality form)."""
    from ..operators.asof import range_join_banded

    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    out = range_join_banded(
        p, e, keys=["user_id"], left_ts="p_ts", right_ts="e_ts",
        lower_s=-3600, upper_s=3600,
    )
    return out.select(
        "purchase_id", "error_id", "user_id",
        F.col("p_ts").alias("purchase_ts"), F.col("e_ts").alias("error_ts"),
    )


@register(
    "multi_source_merge",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, event_type, ts, value,
               CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS src_priority
        FROM events
    )
    SELECT event_id, user_id, event_type, ts, value,
           CAST(src_priority AS INT) AS src_priority
    FROM tagged
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY src_priority, ts DESC, event_id DESC) = 1
    """,
)
def multi_source_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source conflict resolution: when the same logical record
    arrives from several feeds (even event_ids stand in for the
    authoritative source, odd for the backfill), keep one row per
    (user, event_type) by source priority first, recency second — the
    golden-record survivorship rule of every MDM/ingest-merge pipeline.
    A single composite-ordered window over the unioned feeds; at scale
    this is one shuffle on the merge key regardless of source count
    (sources union before the window, they don't join)."""
    events = load_table(spark, sf_dir, "events")
    tagged = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(2).cast("int").alias(
            "src_priority"
        ),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "src_priority", F.desc("ts"), F.desc("event_id")
    )
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
