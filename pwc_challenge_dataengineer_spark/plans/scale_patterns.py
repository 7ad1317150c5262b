"""Scale-pattern operators proven equal to their naive formulations —
the 100 TB playbook (salting, mergeable partial aggregates, exact-decimal
statistics) registered as oracle queries so the driver's correctness gate
continuously certifies that the skew-safe / incremental plan computes the
SAME answer as the textbook plan (reference analog: the Spark tuning layer,
src/etl/spark/spark_config_optimizer.py, which sets AQE/skew knobs but never
restructures a plan — these operators are the restructurings).

- salted_skew_join            operators/scalable.py:salted_join driven
  end-to-end; oracle is the plain join+aggregate.
- matview_incremental_refresh merge of partial aggregates (old matview +
  delta partition) vs full recompute — the algebra behind incremental
  materialized-view maintenance: SUM/COUNT are commutative monoids, so the
  refresh touches only the delta.
- price_qty_corr              Pearson correlation from exact DECIMAL moment
  sums (sum x, y, xy, x^2, y^2) — order-insensitive, engine-exact; a plain
  corr() over doubles is neither.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scalable import salted_join
from ..schemas import load_table
from .catalog import register
from ._parity import money_sum, money_sum_sql


@register(
    "salted_skew_join",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join of the events fact to the customer dim via
    operators/scalable.py:salted_join (16 deterministic salts from
    event_id, small side replicated x16), then a per-nation rollup. The
    oracle is the textbook join — the whole point is that salting is
    result-invariant. At 100 TB this is the shape for a key too hot for
    AQE's skew split (a single user with billions of events): the hot key
    fans over 16 tasks instead of one."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_join(
        events, customer, keys=["user_id"], salt_source="event_id", n_salts=16
    )
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_events"),
        money_sum("value").alias("total_value"),
    )


_CUTOFF = "2000-01-01"


@register(
    "matview_incremental_refresh",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {money_sum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
    """,
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the monthly-KPI matview is
    rebuilt by MERGING the pre-existing aggregate (orders before
    {_CUTOFF}) with a partial aggregate of only the delta partition
    (orders on/after it), then summing the mergeable partials. The oracle
    recomputes from scratch — equality certifies the refresh algebra.
    DECIMAL partial sums make the merge exact regardless of split point or
    order. At 100 TB the delta is one day of partitions; the refresh cost
    is O(delta), not O(history) — this is why every agg in the matview
    layer is restricted to commutative monoids (SUM/COUNT/MIN/MAX)."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        )

    old = partial(orders.filter(F.col("o_orderdate") < _CUTOFF))
    delta = partial(orders.filter(F.col("o_orderdate") >= _CUTOFF))
    merged = old.unionByName(delta)
    return merged.groupBy("month").agg(
        F.sum("n_orders").alias("n_orders"),
        F.sum("rev_dec").cast("double").alias("revenue"),
    )


_MOMS = """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4)))
                    AS DOUBLE) AS syy
        FROM lineitem GROUP BY 1
"""


@register(
    "price_qty_corr",
    oracle=f"""
    WITH m AS ({_MOMS})
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS corr_qty_price
    FROM m
    """,
)
def price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    from exact DECIMAL moment sums (n, sum x, sum y, sum xy, sum x^2,
    sum y^2). Decimal sums are integers underneath — identical in any
    partition order and engine — so the closed-form corr of their double
    casts is bit-deterministic, where corr_samp over doubles is not.
    Single map-side-combined aggregation; the moments are also mergeable,
    so this corr can be maintained incrementally like the matview above."""
    li = load_table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(18,2)")
    pd_ = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qd).cast("double").alias("sx"),
        F.sum(pd_).cast("double").alias("sy"),
        F.sum((qd * pd_).cast("decimal(30,4)")).cast("double").alias("sxy"),
        F.sum((qd * qd).cast("decimal(30,4)")).cast("double").alias("sxx"),
        F.sum((pd_ * pd_).cast("decimal(30,4)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / F.sqrt(
        (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
    )
    return m.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price")
    )


@register(
    "pareto_skyline_customers",
    oracle="""
    WITH pts AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spend,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT p.custkey, p.total_spend, p.n_orders
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.total_spend >= p.total_spend AND q.n_orders >= p.n_orders
          AND (q.total_spend > p.total_spend OR q.n_orders > p.n_orders)
    )
    """,
)
def pareto_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of customers over (total spend, order
    count): customers no one dominates on both dimensions. The oracle
    states the textbook quadratic NOT-EXISTS definition; the Spark plan
    implements the O(n log n) sweep instead — sort by spend desc (orders
    desc, key as tiebreakers) and keep each point whose order count
    strictly exceeds the running max of everything before it, plus ties
    of frontier points. The hash compare proves the sweep computes the
    definition — the same prove-the-restructuring pattern as
    salted_skew_join. At scale the sweep is one window over the
    |customers| aggregate; the quadratic self-join never runs."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    pts = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    w = (
        Window.orderBy(
            F.desc("total_spend"), F.desc("n_orders"), F.asc("custkey")
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = pts.withColumn("prev_max_orders", F.max("n_orders").over(w))
    # A point survives if nothing before it (higher or equal spend, sorted
    # first) has >= its order count — except exact (spend, orders) ties
    # with a frontier point, which are mutually non-dominating and stay.
    frontier = swept.filter(
        F.col("prev_max_orders").isNull()
        | (F.col("n_orders") > F.col("prev_max_orders"))
    ).select("total_spend", "n_orders").distinct()
    return pts.join(
        F.broadcast(frontier), ["total_spend", "n_orders"], "left_semi"
    ).select("custkey", "total_spend", "n_orders")


@register(
    "revenue_trend_forecast",
    oracle="""
    WITH daily AS (
        SELECT n.n_name AS nation,
               date_diff('day', DATE '1995-01-01',
                         CAST(o.o_orderdate AS DATE)) AS x,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    m AS (
        -- every moment sums exactly (BIGINT / DECIMAL) before ONE cast to
        -- double, so the closed-form OLS arithmetic is order-insensitive
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
               CAST(MAX(x) AS BIGINT) AS x_max
        FROM daily GROUP BY 1
    )
    SELECT nation, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 + (n * sxy - sx * sy) / (n * sxx - sx * sx) * (x_max + 1),
                 6) AS forecast_next_day
    FROM m
    """,
)
def revenue_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS revenue trend + one-step forecast from closed-form
    moment sums — grouped linear regression as a pure aggregation, the
    scale-safe substitute for per-group model fitting: x (day index) and
    x² sum exactly as integers, y sums exactly as DECIMAL, so the
    slope/intercept arithmetic over their double casts is identical on
    both engines (same discipline as price_qty_corr above). The daily
    rollup is one join-then-agg; the regression itself adds NO shuffle —
    the moments ride the same groupBy — and the moments are mergeable, so
    the trend can be maintained incrementally per partition/day at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01")
            ).alias("x"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y")
        )
    )
    m = daily.groupBy("nation").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.max("x").cast("bigint").alias("x_max"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    intercept = (sy - slope * sx) / n
    return m.select(
        "nation",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(intercept + slope * (F.col("x_max") + 1), 6).alias(
            "forecast_next_day"
        ),
    )


# --- Exact quantiles without a global sort (round 5) ------------------------

_EQ_BINS = 4096
_EQ_QUANTS = ((50, 2, 1), (90, 10, 9), (99, 100, 99))  # (label, den, num)


@register(
    "exact_quantile_binned",
    oracle=f"""
    WITH c AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    ranked AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM c
    )
    SELECT q, rank_target,
           ROUND(CAST(v AS DOUBLE) / 100, 2) AS value
    FROM (
        {" UNION ALL ".join(
            f'''SELECT CAST({lbl} AS INT) AS q,
               MAX((({num} * n + {den} - 1) // {den})) AS rank_target,
               MIN(CASE WHEN rn = ({num} * n + {den} - 1) // {den}
                        THEN cents END) AS v
            FROM ranked'''
            for (lbl, den, num) in _EQ_QUANTS)}
    )
    """,
)
def exact_quantile_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete p50/p90/p99 of order value with NO global sort —
    the at-scale replacement for position-pick quantiles (whose
    row_number ranking moves the whole relation through one task): one
    stats pass (min/max/count), one binned-histogram pass ({_EQ_BINS}
    fixed-width bins — a bounded dictionary, so the cumulative window
    over it is scale-free), then one refinement pass that scans ONLY the
    rows of each quantile's target bin (~n/{_EQ_BINS} of the data) and
    position-picks within it. Ranks are ceil(q*n) (discrete lower
    quantile), matching the oracle's full-sort position pick exactly —
    the hash compare proves the binned path selects the identical
    element. Money quantized to cents (ROUND(x*100) — deterministic IEEE
    on both engines for 2dp inputs) so bin arithmetic is integer-exact.

    Scale: passes are O(n) scans with map-side-combined aggregations;
    the only windows run over the {_EQ_BINS}-row bin table and the
    single target bin's distinct values. For heavy-tailed domains where
    one bin still holds too much, the same refinement recurses (bin the
    target bin again) — noted, not needed at any tested SF."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    c = orders.select(cents.alias("cents"), "o_orderkey")
    stats = c.agg(
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.count("*").cast("bigint").alias("n"),
    )
    # fixed-width binning; W >= 1 integer
    binned = c.crossJoin(F.broadcast(stats)).select(
        "cents",
        "o_orderkey",
        "n",
        F.expr(
            f"(cents - mn) div (((mx - mn) div {_EQ_BINS}) + 1)"
        ).alias("bin"),
    )
    hist = binned.groupBy("bin", "n").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "bin",
        "n",
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("cum_before"),
        F.sum("cnt").over(w_cum).alias("cum_incl"),
    )
    quants = None
    for lbl, den, num in _EQ_QUANTS:
        qd = cum.select(
            F.lit(lbl).cast("int").alias("q"),
            F.expr(f"({num} * n + {den} - 1) div {den}").alias(
                "rank_target"
            ),
            "bin",
            "cum_before",
            "cum_incl",
        ).filter(
            (F.col("rank_target") > F.col("cum_before"))
            & (F.col("rank_target") <= F.col("cum_incl"))
        )
        quants = qd if quants is None else quants.unionByName(qd)
    # refinement: scan only the target bins (tiny broadcast semi-filter)
    target = binned.join(
        F.broadcast(quants.select("q", "bin", "rank_target", "cum_before")),
        "bin",
    )
    w_in = Window.partitionBy("q").orderBy("cents", "o_orderkey")
    picked = (
        target.withColumn("rn_in", F.row_number().over(w_in))
        .filter(
            F.col("cum_before") + F.col("rn_in") == F.col("rank_target")
        )
        .select(
            "q",
            "rank_target",
            F.round(F.col("cents").cast("double") / 100, 2).alias("value"),
        )
    )
    return picked


_OLS_MOMS = """
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))
                    AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))
                    AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))
                    AS DECIMAL(30,4))) AS DOUBLE) AS syy
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
"""


@register(
    "grouped_ols_price_on_qty",
    oracle=f"""
    WITH m AS ({_OLS_MOMS})
    SELECT p_brand, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS r2
    FROM m
    """,
)
def grouped_ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand ordinary least squares of extended price on quantity —
    closed-form slope/intercept/R² from the five exact DECIMAL moment
    sums (the per-group regression every elasticity/price-curve report
    runs; same moment machinery as price_qty_corr, extended to the fit
    itself). Decimal sums are integers underneath, so the moments are
    engine- and partition-order-identical; the coefficient formulas are
    fixed IEEE expressions on those identical doubles, rounded at 6dp.

    Scale: ONE map-side-combined groupBy over the joined fact — the
    whole regression is 6 aggregate columns; no per-group data movement,
    no solver. This is the pattern that replaces collect()-per-group
    sklearn loops: any GLM with sufficient statistics fits the same
    shape."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum((x * y).cast("decimal(30,4)")).cast("double").alias("sxy"),
            F.sum((x * x).cast("decimal(30,4)")).cast("double").alias("sxx"),
            F.sum((y * y).cast("decimal(30,4)")).cast("double").alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den_x
    return m.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round((num * num) / (den_x * den_y), 6).alias("r2"),
    )


_BOOT_B = 20
# Cumulative Poisson(1) probabilities for the inverse-CDF ladder; plain
# decimal literals parse to the identical double in both engines.
_POIS_CUM = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _pois_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"CASE{branches} ELSE {len(_POIS_CUM)} END"


@register(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
    weighted AS (
        SELECT r.b,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                   || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT
                   % 1000000 AS h,
               CAST(o_totalprice AS DECIMAL(18,2)) AS x
        FROM orders CROSS JOIN reps r
    ),
    wts AS (
        SELECT b, x, {_pois_case_sql("(h / 1000000.0)")} AS w FROM weighted
    ),
    means AS (
        SELECT b,
               CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS BIGINT)
                   AS replica_mean,
               CAST(SUM(w) AS BIGINT) AS n_eff
        FROM wts GROUP BY b
    ),
    ranked AS (
        SELECT b, replica_mean, n_eff,
               CAST(row_number() OVER (ORDER BY replica_mean, b) AS INT) AS rk
        FROM means
    )
    SELECT b, replica_mean, n_eff,
           MAX(CASE WHEN rk = 2 THEN replica_mean END) OVER () AS ci_lo,
           MAX(CASE WHEN rk = {_BOOT_B - 1} THEN replica_mean END) OVER ()
               AS ci_hi
    FROM ranked
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bootstrap via Poissonization (Efron's Poisson
    bootstrap — the form that actually distributes): instead of resampling
    n rows with replacement (which needs global coordination), every row
    enters each of 20 replicas with an independent Poisson(1) weight, here
    drawn DETERMINISTICALLY by inverse-CDF over an md5-derived uniform, so
    both engines build bit-identical replicas and the whole CI is
    hash-verified. Emits each replica's weighted mean of order value plus
    the 10th/90th-percentile band (2nd / 19th order statistic of 20).

    One explode(x20) + hash aggregate with map-side combine — no shuffle
    of the fact beyond the 20-group aggregate; weighted sums stay in
    exact DECIMAL x integer, divided once (unrounded doubles, half-tie
    rule). At 100 TB the replica count is the only fan-out factor and the
    per-replica partial aggregates fuse into one pass over the scan."""
    from pyspark.sql.window import Window

    from ..functions.dedup_fuzzy import spread_small_scan

    # the x20 replica fan-out does an md5 per (row, replica) directly on
    # the scan; at bench SF orders is ONE split, so the whole 3M-hash
    # stage ran on one task. Spread when splits < cores (no-op at scale);
    # measured 4.4 -> 1.2 s at sf0.1, rows identical.
    orders = spread_small_scan(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    reps = spark.range(0, _BOOT_B).select(F.col("id").cast("int").alias("b"))
    weighted = orders.crossJoin(F.broadcast(reps)).select(
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("o_orderkey").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000
        ).alias("h"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    u = F.col("h") / F.lit(1000000.0)
    w = F.lit(len(_POIS_CUM))
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        w = F.when(u < _POIS_CUM[k], F.lit(k)).otherwise(w)
    means = (
        weighted.select("b", "x", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("x")).cast("double")
                / F.sum("w").cast("bigint")
            ).alias("replica_mean"),
            F.sum("w").cast("bigint").alias("n_eff"),
        )
    )
    ranked = means.select(
        "b",
        "replica_mean",
        "n_eff",
        F.row_number()
        .over(Window.orderBy("replica_mean", "b"))
        .cast("int")
        .alias("rk"),
    )
    wa = Window.partitionBy()
    return ranked.select(
        "b",
        "replica_mean",
        "n_eff",
        F.max(F.when(F.col("rk") == 2, F.col("replica_mean"))).over(wa).alias(
            "ci_lo"
        ),
        F.max(
            F.when(F.col("rk") == _BOOT_B - 1, F.col("replica_mean"))
        ).over(wa).alias("ci_hi"),
    )
