"""TPC-H classics, adapted to the simplified testdata star schema.

The reference's analytics services compute ad-hoc variants of these shapes
(src/api/v1/services/datamart_service.py, src/etl/gold/build_gold.py); the
canonical TPC-H formulations are the industry-standard statement of the same
operator mix — scan + filter + star join + grouped aggregate + top-N — so we
register them verbatim (modulo columns the synthetic schema omits:
o_shippriority -> o_orderpriority in Q3; address/phone/comment dropped in
Q10). The full 22-query suite is covered: the partsupp-dependent family
(Q2/Q9/Q11/Q16/Q20) runs against a partsupp EMULATED from lineitem (see
_PS_SQL), commit/receipt-date lateness (Q4/Q21) is adapted to shipdate-vs-
orderdate lag / l_returnflag='R', and l_shipmode buckets (Q12) map to
l_linestatus — every adaptation is noted on its query. Every money
aggregate follows plans/_parity.py: DECIMAL-exact
sums/products cast to double at the end, divisions of deterministic doubles,
never ROUND after a division.

Scale notes (100 TB): each query is one fact-table scan with filters pushed
to parquet, broadcast dims (customer/supplier/nation/region all fit in a
few GB at SF100k; customer is broadcast here and would become a shuffle join
at true scale — Catalyst/AQE makes that call from stats, the plan shape is
unchanged), and a single hash-aggregate shuffle on the group keys. Q18's
having-clause pre-aggregates lineitem by orderkey BEFORE joining orders
(semi-join reduction), so the join input is |orders-over-threshold|, not
|lineitem|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from ._parity import REV_DEC_SQL, REV_SUM_SQL, dec, money_sum, money_sum_sql, rev_dec, rev_sum
from .catalog import register

# (1 +/- x) factors for discount/tax stay in DECIMAL(4,2) so the Q1 triple
# product extprice*(1-disc)*(1+tax) lands at DECIMAL(30,6) — exact, inside
# Spark's 38-digit cap (DECIMAL(18,2) factors would overflow it and trigger
# precision-loss truncation that DuckDB doesn't mirror).
_D42 = "decimal(4,2)"


def _one_minus_disc() -> F.Column:
    return F.lit(1).cast(_D42) - F.col("l_discount").cast(_D42)


def _one_plus_tax() -> F.Column:
    return F.lit(1).cast(_D42) + F.col("l_tax").cast(_D42)


_CHARGE_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))))"
    " * (1 + CAST(l_tax AS DECIMAL(4,2)))"
)


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           {money_sum_sql('l_extendedprice')} AS sum_base_price,
           {REV_SUM_SQL} AS sum_disc_price,
           CAST(SUM({_CHARGE_SQL}) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical map-side-combinable grouped
    aggregate. 2 group keys x 8 aggregates over the full fact scan; the
    shipdate filter pushes to the parquet reader. At scale this is the
    best-case shape: partial aggregation collapses each task to ~|groups|
    rows (6 here) before the single tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    charge = (dec("l_extendedprice") * _one_minus_disc()) * _one_plus_tax()
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        rev_sum().alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").cast("bigint").alias("count_order"),
    )


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {REV_SUM_SQL} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-15'
      AND l_shipdate > TIMESTAMP '1997-06-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (o_shippriority -> o_orderpriority: the
    synthetic orders table has no shippriority column). Top-10 unshipped
    orders by revenue for one market segment. The segment filter reduces
    customer to ~1/5 before the broadcast; l_orderkey tiebreak makes the
    LIMIT deterministic across engines."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_sum().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {REV_SUM_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the 6-table star join with the
    c_nationkey = s_nationkey co-location predicate (revenue only counts
    when customer and supplier share a nation). All dims broadcast; the
    only shuffle is lineitem->orders (and the final 5-row aggregate).
    Region filter prunes nation before it ever touches the fact side."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(rev_sum().alias("revenue"))
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: pure scan-filter-sum, zero
    joins — the query that exists to prove filter pushdown + vectorized
    scan. All four predicates reach the parquet reader (shipdate range is
    a row-group min/max prune at scale). The discount BETWEEN compares the
    raw doubles identically in both engines; the product goes decimal for
    the exact sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * F.col("l_discount").cast(_D42))
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {REV_SUM_SQL} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (address/phone/comment columns
    dropped — absent from the synthetic schema): top-20 customers by
    revenue lost to returns in one quarter. Return-flag + quarter filters
    cut the fact before the join; c_custkey tiebreak pins the LIMIT."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev_sum().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV_DEC_SQL}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100
           / {REV_SUM_SQL} AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional-aggregate ratio over a
    fact->part join (p_type is a flat category here, so the LIKE 'PROMO%'
    of stock TPC-H becomes equality). Part broadcasts; the month filter
    prunes the scan. (a*100)/b on the two deterministic doubles — no
    post-division rounding."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev_dec()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    return joined.agg(
        (promo * 100 / rev_sum()).alias("promo_revenue_pct")
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: the having-subquery shape. The
    scale-critical move is aggregating lineitem by orderkey FIRST and
    filtering on the threshold — the orders/customer join then sees only
    the surviving keys (a semi-join reduction), not the raw fact. The
    per-order qty sum is reused as both the filter and the output
    aggregate, so lineitem is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            dec("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {REV_SUM_SQL} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: bilateral trade revenue between two
    nations (NATION_9/NATION_10 — the busiest trading pair in the
    synthetic dim, which has no real country names) by ship year. The nation dim joins twice under different
    aliases (supplier side and customer side) with a disjunctive
    cross-filter — the canonical aliased-dimension pattern. Both nation
    copies broadcast; the disjunction evaluates post-join on two
    broadcast-resolved attributes, and the 2-year shipdate range pushes
    to the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_9")
                & (F.col("cust_nation") == "NATION_10")
            )
            | (
                (F.col("supp_nation") == "NATION_10")
                & (F.col("cust_nation") == "NATION_9")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(rev_sum().alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {REV_DEC_SQL} AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN part ON l_partkey = p_partkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: one nation's (NATION_9 — the synthetic
    dim has no real country names) share of ECONOMY-part revenue sold
    into the EUROPE customer market, per year (LIKE-style p_type
    predicate flattened to equality for the synthetic category dim). The conditional-sum-over-sum ratio on exact
    decimals; 7-table join where every dim broadcasts and the fact
    shuffles once for the orders join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_dec().alias("volume"),
            "supp_nation",
        )
    )
    return sales.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "tpch_q13",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: the left-join-then-
    histogram shape whose whole point is keeping zero-order customers
    (COUNT(o_orderkey) over a left join counts non-null matches, so
    orderless customers land in the c_count=0 bucket instead of
    vanishing). Two cascaded aggregates; the first shuffles on custkey,
    the second on the tiny count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no, {REV_SUM_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: argmax via self-referencing scalar
    subquery — revenue view computed once, its MAX broadcast back as a
    filter. The decimal-exact revenue makes the equality comparison safe
    (both engines derive the identical double for every supplier and for
    the max). Spark shape: aggregate, cross-join the 1-row max, filter,
    then broadcast-join supplier names."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        rev_sum().alias("total_revenue")
    )
    mx = revenue0.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue0.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey AS pk,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*)) AS threshold
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avg_qty ON l_partkey = pk
    WHERE p_brand = 'Brand#3' AND l_quantity < threshold
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated aggregate
    subquery (per-part 20%-of-average-quantity threshold) decorrelated
    into an aggregate-then-join — the rewrite Catalyst itself applies to
    correlated scalar subqueries, made explicit. The threshold is
    0.2 * (exact-decimal sum / count): identical double both engines, so
    the < comparison is deterministic. Brand filter narrows the probe
    side before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT {REV_SUM_SQL} AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under disjunctive predicates
    (shipmode/container clauses dropped — absent columns): three
    brand/size/quantity bands OR-ed together across both join sides.
    The optimizer test here is that the part-side conjuncts (brand,
    size) still prune the broadcast build side: Catalyst extracts the
    common disjunct per side rather than evaluating the whole OR
    post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        rev_sum().alias("revenue"), F.count("*").cast("bigint").alias("n_lines")
    )


@register(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0
    ),
    eligible AS (
        SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal
        FROM customer CROSS JOIN avg_bal
        WHERE c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
    )
    SELECT CAST(cntrycode AS INT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible
    GROUP BY 1
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: rich customers (balance above
    the positive-balance average — scalar subquery) with no orders since
    1999 (anti join; every synthetic customer has SOME order, so the
    stock 'never ordered' predicate is vacuous here), grouped by country code (nationkey%10 stands in for the
    phone-prefix code the synthetic schema lacks). Composes the scalar-
    subquery broadcast and the left_anti join in one query; the average
    is exact-decimal-derived so the > threshold comparison is
    deterministic in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("ab")
    )
    eligible = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
    )
    return eligible.groupBy(
        (F.col("c_nationkey") % 10).cast("int").alias("cntrycode")
    ).agg(
        F.count("*").cast("bigint").alias("numcust"),
        F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


# --- emulated partsupp --------------------------------------------------
#
# The synthetic schema has no partsupp table, so the Q2/Q9/Q11/Q16/Q20
# family derives one from lineitem: every (part, supplier) pair that ever
# traded is a partsupp row, its supplycost is the cheapest extendedprice
# seen for the pair (exact DECIMAL min — engine-identical), and its
# availqty is the total quantity shipped (exact DECIMAL sum, re-cast to
# DECIMAL(18,2) so downstream products stay inside the 38-digit cap with
# IDENTICAL precision/scale on both engines). One groupBy over the fact
# table — at 100 TB this is a map-side-combinable aggregate whose output
# (|part|x|supp| pairs actually traded) is dimension-sized.

_PS_SQL = """ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS ps_availqty
        FROM lineitem GROUP BY 1, 2
    )"""


def _emulated_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(dec("l_extendedprice")).alias("ps_supplycost"),
        F.sum(dec("l_quantity")).cast("decimal(18,2)").alias("ps_availqty"),
    )


def _tpch_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    """Register __t_<name> temp views for the spark.sql-expressed queries
    (Q2's correlated scalar subquery, Q21's EXISTS/NOT EXISTS — shapes the
    SQL surface states directly and Catalyst decorrelates)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"__t_{t}")


@register(
    "tpch_q2",
    oracle=f"""
    WITH {_PS_SQL},
    costs AS (
        SELECT p_partkey, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name,
               ps.ps_supplycost
        FROM part
        JOIN ps ON ps_partkey = p_partkey
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE p_size = 15 AND p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
    )
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey,
           CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM costs c
    WHERE ps_supplycost = (SELECT MIN(c2.ps_supplycost) FROM costs c2
                           WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier: the CORRELATED SCALAR MIN SUBQUERY
    over a 4-way dimension join (partsupp emulated — see _PS_SQL). Stated
    as actual correlated SQL on the Spark side too: Catalyst decorrelates
    the scalar subquery into an aggregate + join (the rewrite tpch_q17
    spells out by hand), so the executed plan is a per-part min aggregate
    joined back on (partkey, min) — no per-row subquery execution at any
    scale. s_name is unique per supplier, making the LIMIT deterministic."""
    _tpch_views(spark, sf_dir, "part", "supplier", "nation", "region")
    _emulated_partsupp(spark, sf_dir).createOrReplaceTempView("__t_ps")
    return spark.sql(
        """
        WITH costs AS (
            SELECT p_partkey, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name,
                   ps.ps_supplycost
            FROM __t_part
            JOIN __t_ps ps ON ps.ps_partkey = p_partkey
            JOIN __t_supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN __t_nation n ON n.n_nationkey = s.s_nationkey
            JOIN __t_region r ON r.r_regionkey = n.n_regionkey
            WHERE p_size = 15 AND p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
        )
        SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
               p_partkey, CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
        FROM costs c
        WHERE ps_supplycost = (SELECT MIN(c2.ps_supplycost) FROM costs c2
                               WHERE c2.p_partkey = c.p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking: correlated EXISTS with a non-equi
    date predicate (commit<receipt lateness adapted to 'shipped more than
    60 days after ordering' — the synthetic lineitem has no commit/receipt
    dates). Spark shape: LEFT SEMI join on the order key carrying the
    extra inequality — one pass, no subquery per row, the decorrelation
    Catalyst applies to EXISTS itself."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    qualified = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


@register(
    "tpch_q9",
    oracle=f"""
    WITH {_PS_SQL}
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {REV_SUM_SQL}
           - CAST(SUM(ps_supplycost * CAST(l_quantity AS DECIMAL(18,2)))
                  AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit: LIKE-filtered part dimension drives a
    five-way join back onto the fact table (including the emulated
    partsupp, itself an aggregate OF the fact table), profit grouped by
    supplier nation x order year. Parity: revenue and cost are summed as
    exact decimals SEPARATELY and subtracted as doubles — a single
    decimal (rev - cost) expression would exceed the 38-digit cap and the
    engines truncate differently. Plan shape at scale: part/supplier/
    nation broadcast; lineitem shuffles once on (partkey, suppkey) for
    the partsupp join, then once for the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    ps = _emulated_partsupp(spark, sf_dir)
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        (
            rev_sum()
            - F.sum(F.col("ps_supplycost") * dec("l_quantity")).cast("double")
        ).alias("sum_profit")
    )


@register(
    "tpch_q11",
    oracle=f"""
    WITH {_PS_SQL},
    scoped AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS v
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
    ),
    tot AS (SELECT CAST(SUM(v) AS DOUBLE) * 2.0 / COUNT(DISTINCT ps_partkey)
                AS threshold FROM scoped)
    SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
    FROM scoped
    GROUP BY 1
    HAVING CAST(SUM(v) AS DOUBLE) > (SELECT threshold FROM tot)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: per-part inventory value within one
    nation, kept only where it exceeds a GLOBAL-scalar threshold (HAVING
    against a subquery over the same scoped set). value = supplycost *
    availqty as DECIMAL(37,4) on both engines (the availqty re-cast in
    the emulated partsupp is what keeps the product inside 38 digits);
    the threshold comparison happens between doubles derived from exact
    decimal sums. The canonical fixed fraction (0.0001/SF) is replaced by
    a data-adaptive '2x the mean per-part value' so the query selects a
    meaningful subset at EVERY scale factor instead of emptying out as
    the part count grows. Spark shape: the scoped aggregate computed once, the
    one-row total broadcast back — no second scan."""
    ps = _emulated_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    scoped = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    )
    per_part = scoped.groupBy("ps_partkey").agg(
        F.sum("v").cast("double").alias("value")
    )
    tot = scoped.agg(
        (
            F.sum("v").cast("double")
            * F.lit(2.0)
            / F.count_distinct("ps_partkey")
        ).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus AS ship_bucket,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                AS BIGINT) AS high_line_count,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority split (l_shipmode absent;
    l_linestatus stands in as the ship bucket): the two-way CONDITIONAL
    COUNT over a fact-dimension join, one year of shipments. Conditional
    COUNT (not SUM of CASE) keeps both engines in BIGINT — DuckDB
    promotes SUM(int) to HUGEINT, which the typed hash rejects."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_bucket"))
        .agg(
            F.count(F.when(high, 1)).cast("bigint").alias("high_line_count"),
            F.count(F.when(~high, 1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q16",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship: DISTINCT supplier count per
    part attribute triple, excluding suppliers matching a NOT IN subquery
    (negative balance stands in for the complaints LIKE — the synthetic
    supplier has no comment column). s_suppkey is non-null, so NOT IN is
    exactly a LEFT ANTI join — the rewrite Spark's optimizer needs
    null-safety proofs for is stated directly in the plan."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        pairs.join(F.broadcast(part), pairs.ps_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), "ps_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q20",
    oracle="""
    WITH q97 AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ),
    ptot AS (
        SELECT l_partkey AS tp,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    ),
    qualified AS (
        SELECT DISTINCT q.l_suppkey AS qs
        FROM q97 q
        JOIN ptot ON tp = q.l_partkey
        WHERE q.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          AND q.qty > 0.3 * total_qty
    )
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name LIKE 'NATION_1%'
      AND s_suppkey IN (SELECT qs FROM qualified)
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: the NESTED SEMI-JOIN CHAIN —
    suppliers IN (pairs over parts IN (LIKE-filtered parts) whose year
    quantity exceeds a correlated per-part threshold). availqty > 0.5 *
    correlated-sum is adapted to 'this supplier shipped >30% of the
    part's 1997 volume' (same correlated-threshold shape, no partsupp
    stock column to compare against). Spark shape: two aggregates of the
    same filtered scan (shuffle reuse), broadcast part filter, LEFT SEMI
    into supplier — every IN becomes a semi join, nothing row-at-a-time."""
    li97 = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    q97 = li97.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).cast("double").alias("qty")
    )
    ptot = li97.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum(dec("l_quantity")).cast("double").alias("total_qty")
    )
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select(F.col("p_partkey").alias("l_partkey"))
    qualified = (
        q97.join(F.broadcast(red), "l_partkey", "left_semi")
        .join(ptot, q97.l_partkey == ptot.tp)
        .filter(F.col("qty") > F.lit(0.3) * F.col("total_qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualified, "s_suppkey", "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the MULTI-CORRELATED
    EXISTS + NOT EXISTS self-join trio on the fact table ('late' adapted
    to l_returnflag = 'R' — no commit/receipt dates). Stated as actual
    correlated SQL: Catalyst decorrelates EXISTS into a LEFT SEMI join
    and NOT EXISTS into a LEFT ANTI join on l_orderkey, each carrying
    the <> predicate — three passes over lineitem co-partitioned on the
    order key, no per-row subqueries. At 100 TB all three legs shuffle
    on l_orderkey once and AQE coalesces; the equivalent manual rewrite
    (one aggregate computing per-order supplier/late-supplier counts) is
    a further optimization the optimizer is free to reach via RewriteWithExpression."""
    _tpch_views(spark, sf_dir, "lineitem", "orders", "supplier", "nation", "region")
    return spark.sql(
        """
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM __t_lineitem l1
        JOIN __t_orders ON o_orderkey = l1.l_orderkey
        JOIN __t_supplier ON s_suppkey = l1.l_suppkey
        JOIN __t_nation ON n_nationkey = s_nationkey
        JOIN __t_region ON r_regionkey = n_regionkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND r_name = 'EUROPE'
          AND EXISTS (SELECT 1 FROM __t_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __t_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )
