"""Classical time-series diagnostics over the daily revenue series
(beyond-reference; complements cusum_monthly_revenue / rolling_corr /
time_series_daily).

- acf_daily_revenue    lag-1..7 autocorrelation of the daily revenue
  series (observed days, consecutive-row lags) — the seasonality /
  persistence diagnostic behind any forecasting choice.
- bollinger_breakouts  7-day rolling mean +/- 2 sigma envelope with
  breakout flags — the volatility-band anomaly detector.
- max_drawdown_user    per-user running balance, running peak, and
  maximum drawdown — the classic risk statistic, computed with two
  stacked windows.

Float parity (plans/_parity.py discipline): every sum that feeds a
statistic accumulates in DECIMAL (exact in any partition order / engine),
converts to DOUBLE once, and the closed forms are pure IEEE ops on
identical operands. Daily revenue is quantized to DECIMAL(18,2) *before*
any product so squares stay inside decimal precision bounds on both
engines (Spark and DuckDB both round half-up for positive casts).

Scale posture: the daily series is calendar-bounded (~2.4k rows at any
SF), so its unpartitioned windows are trivially single-task; the per-user
drawdown windows shuffle once on user_id. Nothing quadratic, nothing on
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from ._parity import rev_dec
from .catalog import register

# Daily revenue in exact 1e-4-dollar integer units. Quantizing the 4-decimal
# per-row revenue DOWN to cents would hit half-cent ties that Spark (HALF_UP)
# and DuckDB round differently; scaling UP to integers involves no rounding
# at all, so the series is bit-identical across engines at any SF.
_DAILY_SQL = """
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS DECIMAL(18,0))
                        * CAST(100 - CAST(l_discount AS DECIMAL(18,2)) * 100
                               AS DECIMAL(18,0)))
                    AS DECIMAL(18,0)) AS r
        FROM lineitem GROUP BY 1
"""


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p100 = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    )
    d100 = (
        F.lit(100) - F.col("l_discount").cast("decimal(18,2)") * 100
    ).cast("decimal(18,0)")
    return li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(p100 * d100).cast("decimal(18,0)").alias("r")
    )


@register(
    "acf_daily_revenue",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    lagged AS (
        SELECT r,
               lag(r, 1) OVER (ORDER BY d) AS l1,
               lag(r, 2) OVER (ORDER BY d) AS l2,
               lag(r, 3) OVER (ORDER BY d) AS l3,
               lag(r, 4) OVER (ORDER BY d) AS l4,
               lag(r, 5) OVER (ORDER BY d) AS l5,
               lag(r, 6) OVER (ORDER BY d) AS l6,
               lag(r, 7) OVER (ORDER BY d) AS l7
        FROM daily
    ),
    stacked AS (
                  SELECT 1 AS k, r, l1 AS rl FROM lagged WHERE l1 IS NOT NULL
        UNION ALL SELECT 2, r, l2 FROM lagged WHERE l2 IS NOT NULL
        UNION ALL SELECT 3, r, l3 FROM lagged WHERE l3 IS NOT NULL
        UNION ALL SELECT 4, r, l4 FROM lagged WHERE l4 IS NOT NULL
        UNION ALL SELECT 5, r, l5 FROM lagged WHERE l5 IS NOT NULL
        UNION ALL SELECT 6, r, l6 FROM lagged WHERE l6 IS NOT NULL
        UNION ALL SELECT 7, r, l7 FROM lagged WHERE l7 IS NOT NULL
    ),
    moments AS (
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(r) AS DOUBLE) AS sx,
               CAST(SUM(rl) AS DOUBLE) AS sy,
               CAST(SUM(CAST(CAST(r AS DECIMAL(19,0)) * CAST(rl AS DECIMAL(19,0))
                             AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(CAST(r AS DECIMAL(19,0)) * CAST(r AS DECIMAL(19,0))
                             AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(CAST(rl AS DECIMAL(19,0)) * CAST(rl AS DECIMAL(19,0))
                             AS DECIMAL(38,4))) AS DOUBLE) AS syy
        FROM stacked GROUP BY 1
    )
    SELECT k, n_pairs,
           (CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n_pairs AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n_pairs AS DOUBLE) * syy - sy * sy))
               AS acf
    FROM moments
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 sample autocorrelation of daily revenue. The five frame
    moments accumulate in exact decimal and the Pearson closed form runs
    once per lag in double — identical operands, identical IEEE result on
    both engines, so no rounding is needed. The global window is safe: the
    series has one row per calendar day."""
    daily = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("d")
    lag_cols = [F.lag("r", k).over(w).alias(f"l{k}") for k in range(1, 8)]
    lagged = daily.select("r", *lag_cols)
    pairs = ", ".join(f"{k}, l{k}" for k in range(1, 8))
    stacked = lagged.select(
        "r", F.expr(f"stack(7, {pairs}) AS (k, rl)")
    ).filter(F.col("rl").isNotNull())
    moments = stacked.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("r").cast("double").alias("sx"),
        F.sum("rl").cast("double").alias("sy"),
        F.sum((F.col("r") * F.col("rl")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("rl") * F.col("rl")).cast("decimal(38,4)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    return moments.select(
        "k",
        "n_pairs",
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("acf"),
    )


@register(
    "bollinger_breakouts",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    framed AS (
        SELECT d, r,
               CAST(COUNT(*) OVER w AS BIGINT) AS n7,
               CAST(SUM(r) OVER w AS DECIMAL(19,0)) AS s7,
               CAST(SUM(CAST(CAST(r AS DECIMAL(19,0)) * CAST(r AS DECIMAL(19,0))
                             AS DECIMAL(38,0))) OVER w AS DECIMAL(38,0)) AS q7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    vx AS (
        SELECT d, r, s7,
               q7 * CAST(7 AS DECIMAL(1,0)) - s7 * s7 AS v42x
        FROM framed
        WHERE n7 = 7
    ),
    vn AS (
        SELECT d, r, s7,
               CAST(CAST(CAST(v42x AS HUGEINT) // 1000000000000
                         AS DECIMAL(26,0)) AS DOUBLE) * 1e12
                   + CAST(CAST(CAST(v42x AS HUGEINT) % 1000000000000
                               AS BIGINT) AS DOUBLE) AS v42
        FROM vx
    )
    SELECT d,
           CAST(r AS DOUBLE) AS revenue,
           CAST(s7 AS DOUBLE) / 7.0 AS mean7,
           sqrt(v42 / 42.0) AS sd7,
           CAST(CASE
                WHEN CAST(r AS DOUBLE)
                     > CAST(s7 AS DOUBLE) / 7.0 + 2.0 * sqrt(v42 / 42.0)
                THEN 1
                WHEN CAST(r AS DOUBLE)
                     < CAST(s7 AS DOUBLE) / 7.0 - 2.0 * sqrt(v42 / 42.0)
                THEN -1
                ELSE 0 END AS INT) AS breakout
    FROM vn
    """,
)
def bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily revenue: trailing 7-day mean and sample
    std, breakout = +1/-1 when the day closes outside mean +/- 2 sigma.
    The variance numerator 7*sum(x^2) - sum(x)^2 is catastrophically
    cancelling in double (the two terms agree to ~10 digits), so it is
    computed EXACTLY in decimal and converted to double once — otherwise
    1-ulp differences in each engine's decimal->double cast blow up into
    visible sd differences. Only full frames (7 observed days) emit.

    Cross-engine parity bound: the numerator v42x is split hi/lo at 10^12
    with INTEGER arithmetic on both engines (DuckDB `//` on HUGEINT; Spark
    exact decimal division — the quotient is integral by construction), so
    both halves are exactly double-representable while hi < 2^53, i.e.
    v42x < 9.0e27 — daily revenue (1e-4-dollar units) up to ~1.1e13, which
    is ~SF 100 for this data shape (sf0.1 sits at v42x ~ 9e21, comfortably
    inside; the previous 10^6 split put sf0.1 exactly AT its boundary and
    DuckDB's DECIMAL `/` promoted to DOUBLE, double-rounding hi).  q7 is
    DECIMAL(38,0) on both sides so 7*r^2 fits to ~SF 1000 without
    overflow; beyond SF ~100 sd7 degrades gracefully (correlated ulp
    error, not engine divergence on hi), and the documented exactness
    claim stops at SF 100 — not 'any SF'."""
    daily = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("d").rowsBetween(-6, 0)
    framed = daily.select(
        "d",
        "r",
        F.count("*").over(w).cast("bigint").alias("n7"),
        F.sum("r").over(w).cast("decimal(19,0)").alias("s7"),
        F.sum((F.col("r") * F.col("r")).cast("decimal(38,0)"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("q7"),
    ).filter(F.col("n7") == 7)
    # v42 exceeds 2^53, and int128-decimal -> double casts are not
    # correctly rounded in every engine; split into two exactly-double
    # halves at 10^12 (hi stays < 2^53 while v42x < 9e27, ~SF 100) and
    # recombine with two IEEE ops (both correctly rounded). The division
    # is exact: (v42x - lo) is divisible by 10^12 by construction.
    v42x = (
        F.col("q7") * F.lit(7).cast("decimal(1,0)")
        - F.col("s7") * F.col("s7")
    )
    lo = v42x % F.lit(1000000000000)
    hi = ((v42x - lo) / F.lit(1000000000000)).cast("decimal(26,0)")
    framed = framed.withColumn(
        "v42", hi.cast("double") * F.lit(1e12) + lo.cast("double")
    )
    rd = F.col("r").cast("double")
    mean7 = F.col("s7").cast("double") / F.lit(7.0)
    sd7 = F.sqrt(F.col("v42") / F.lit(42.0))
    return framed.select(
        "d",
        rd.alias("revenue"),
        mean7.alias("mean7"),
        sd7.alias("sd7"),
        F.when(rd > mean7 + F.lit(2.0) * sd7, F.lit(1))
        .when(rd < mean7 - F.lit(2.0) * sd7, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("breakout"),
    )


@register(
    "max_drawdown_user",
    oracle="""
    WITH bal AS (
        SELECT user_id, ts, event_id,
               SUM(CAST(value AS DECIMAL(18,2)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS balance
        FROM events
    ),
    dd AS (
        SELECT user_id, balance,
               MAX(balance)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM bal
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(peak - balance) AS DOUBLE) AS max_drawdown,
           CAST(MAX(peak) AS DOUBLE) AS peak_balance
    FROM dd
    GROUP BY 1
    """,
)
def max_drawdown_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's running value balance: running
    decimal cumsum, running peak over the same order, max(peak - balance).
    Two stacked windows + one aggregate, all keyed on user_id — a single
    shuffle, and every intermediate is exact decimal so the drawdown is
    engine-invariant to the cent."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bal = events.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).alias("balance"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = bal.select(
        "user_id",
        "balance",
        F.max("balance").over(wp).alias("peak"),
    )
    return dd.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(F.col("peak") - F.col("balance"))
        .cast("double")
        .alias("max_drawdown"),
        F.max("peak").cast("double").alias("peak_balance"),
    )


@register(
    "stl_decompose_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    framed AS (
        SELECT d, r,
               CAST(isodow(d) AS INT) AS dow,
               CAST(COUNT(*) OVER w AS BIGINT) AS n7,
               CAST(SUM(r) OVER w AS DECIMAL(19,0)) AS s7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    interior AS (
        SELECT d, dow, r, s7,
               CAST(r AS DECIMAL(19,0)) * 7 - s7 AS detr7
        FROM framed WHERE n7 = 7
    ),
    seasonal AS (
        SELECT dow, CAST(SUM(detr7) AS DOUBLE) / COUNT(*) AS seas7
        FROM interior GROUP BY dow
    ),
    resid AS (
        SELECT i.d, i.dow, i.r, i.s7, s.seas7,
               CAST(i.detr7 AS DOUBLE) - s.seas7 AS resid7
        FROM interior i JOIN seasonal s USING (dow)
    ),
    mad AS (SELECT quantile_cont(abs(resid7), 0.5) AS mad7 FROM resid)
    SELECT r.d, r.dow,
           ROUND(CAST(r.r AS DOUBLE) / 1e4, 4) AS revenue,
           ROUND(CAST(r.s7 AS DOUBLE) / 7e4, 4) AS trend,
           ROUND(r.seas7 / 7e4, 4) AS seasonal,
           ROUND(r.resid7 / 7e4, 4) AS residual,
           abs(r.resid7) > 5 * m.mad7 AS is_anomaly
    FROM resid r, mad m
    """,
)
def stl_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition of daily revenue: centered 7-day moving-average
    trend, ISO-day-of-week seasonal component from the detrended series, and
    MAD-thresholded residual anomalies (|residual| > 5 x median|residual|).

    Float parity: the series stays in exact 1e-4-dollar integer units through
    the trend window (detr7 = 7*r - s7 is an exact decimal, avoiding the /7
    division), the seasonal means and residuals are single IEEE ops on
    identical operands, and the anomaly threshold is an exact percentile
    (sorted-value pick/interpolate, no order-dependent summation).

    Scale posture: the daily series is calendar-bounded (~2.4k rows at any
    SF), so the unpartitioned trend window and the 7-row seasonal broadcast
    are trivially cheap; all heavy lifting is the map-side-combined daily
    groupBy. Reference parity: the reference's seasonal-trend analytics live
    in src/analytics (advanced_analytics time-series helpers)."""
    daily = _daily_revenue(spark, sf_dir).withColumn(
        "dow", (F.weekday("d") + 1).cast("int")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    framed = daily.select(
        "d",
        "r",
        "dow",
        F.count("*").over(w7).cast("bigint").alias("n7"),
        F.sum("r").over(w7).cast("decimal(19,0)").alias("s7"),
    )
    interior = framed.filter(F.col("n7") == 7).withColumn(
        "detr7", F.col("r").cast("decimal(19,0)") * 7 - F.col("s7")
    )
    seasonal = interior.groupBy("dow").agg(
        (F.sum("detr7").cast("double") / F.count("*")).alias("seas7")
    )
    resid = interior.join(F.broadcast(seasonal), "dow").withColumn(
        "resid7", F.col("detr7").cast("double") - F.col("seas7")
    )
    mad = resid.agg(
        F.expr("percentile(abs(resid7), 0.5)").alias("mad7")
    )
    return resid.crossJoin(F.broadcast(mad)).select(
        "d",
        "dow",
        F.round(F.col("r").cast("double") / 1e4, 4).alias("revenue"),
        F.round(F.col("s7").cast("double") / 7e4, 4).alias("trend"),
        F.round(F.col("seas7") / 7e4, 4).alias("seasonal"),
        F.round(F.col("resid7") / 7e4, 4).alias("residual"),
        (F.abs(F.col("resid7")) > 5 * F.col("mad7")).alias("is_anomaly"),
    )


@register(
    "theil_sen_trend",
    oracle="""
    WITH monthly AS (
        SELECT p.p_brand,
               CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT)
                   AS m,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                             AS DECIMAL(18,0))
                        * CAST(100 - CAST(l.l_discount AS DECIMAL(18,2)) * 100
                               AS DECIMAL(18,0)))
                    AS DECIMAL(19,0)) AS r
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.p_brand,
               CAST(b.r - a.r AS DOUBLE) / (b.m - a.m) AS slope
        FROM monthly a
        JOIN monthly b ON a.p_brand = b.p_brand AND a.m < b.m
    ),
    months AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly
        GROUP BY 1
    )
    SELECT s.p_brand, mo.n_months,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(s.slope, 0.5) / 1e4, 6) AS slope_usd_per_month
    FROM slopes s JOIN months mo USING (p_brand)
    GROUP BY s.p_brand, mo.n_months
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per brand: the median of all pairwise
    month-over-month revenue slopes — the outlier-resistant alternative to
    the OLS fit in revenue_trend_forecast (one wild month cannot move a
    median of ~3.5k pairwise slopes the way it moves a least-squares line).

    Float parity: monthly revenue accumulates in exact 1e-4-dollar decimals;
    each slope is one IEEE division of identical operands; the median is an
    exact percentile (sort + pick), never an order-dependent sum.

    Scale posture: the pairwise self-join is per-brand over a
    calendar-bounded series (~84 months at any SF), so it is O(brands x 84^2)
    regardless of fact size; the heavy work is the map-side-combined monthly
    rollup. The lineitem->part join shuffles on partkey at scale (part grows
    with SF, so no broadcast is assumed)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    p100 = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    )
    d100 = (
        F.lit(100) - F.col("l_discount").cast("decimal(18,2)") * 100
    ).cast("decimal(18,0)")
    monthly = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("m"),
        )
        .agg(F.sum(p100 * d100).cast("decimal(19,0)").alias("r"))
    )
    a = monthly.select(
        "p_brand", F.col("m").alias("ma"), F.col("r").alias("ra")
    )
    b = monthly.select(
        "p_brand", F.col("m").alias("mb"), F.col("r").alias("rb")
    )
    slopes = (
        a.join(b, "p_brand")
        .filter(F.col("ma") < F.col("mb"))
        .select(
            "p_brand",
            (
                (F.col("rb") - F.col("ra")).cast("double")
                / (F.col("mb") - F.col("ma"))
            ).alias("slope"),
        )
    )
    months = monthly.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_months")
    )
    return (
        slopes.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("percentile(slope, 0.5)").alias("med"),
        )
        .join(F.broadcast(months), "p_brand")
        .select(
            "p_brand",
            "n_months",
            "n_pairs",
            F.round(F.col("med") / 1e4, 6).alias("slope_usd_per_month"),
        )
    )


_MONTHLY_SQL = """
        SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS DECIMAL(18,0))
                        * CAST(100 - CAST(l_discount AS DECIMAL(18,2)) * 100
                               AS DECIMAL(18,0)))
                    AS DECIMAL(19,0)) AS r
        FROM lineitem GROUP BY 1
"""


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p100 = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    )
    d100 = (
        F.lit(100) - F.col("l_discount").cast("decimal(18,2)") * 100
    ).cast("decimal(18,0)")
    return li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("m")
    ).agg(F.sum(p100 * d100).cast("decimal(19,0)").alias("r"))


@register(
    "forecast_backtest_mape",
    oracle=f"""
    WITH monthly AS ({_MONTHLY_SQL}),
    lagged AS (
        SELECT m, r,
               lag(r, 1)  OVER w AS l1,
               lag(r, 2)  OVER w AS l2,
               lag(r, 3)  OVER w AS l3,
               lag(r, 12) OVER w AS l12,
               row_number() OVER w AS rn
        FROM monthly
        WINDOW w AS (ORDER BY m)
    ),
    evalm AS (
        SELECT m, CAST(r AS DOUBLE) AS y,
               CAST(l1 AS DOUBLE) AS f_naive,
               CAST(l12 AS DOUBLE) AS f_seasonal,
               CAST(l1 + l2 + l3 AS DOUBLE) / 3 AS f_ma3
        FROM lagged WHERE rn > 12
    ),
    apes AS (
        SELECT method, ape, m FROM (
            SELECT m, 'naive1' AS method,
                   abs(y - f_naive) / y AS ape FROM evalm
            UNION ALL
            SELECT m, 'seasonal12', abs(y - f_seasonal) / y FROM evalm
            UNION ALL
            SELECT m, 'ma3', abs(y - f_ma3) / y FROM evalm
        )
    )
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_months,
           ROUND(AVG(ape), 6) AS mape,
           ROUND(MAX(ape), 6) AS max_ape
    FROM apes GROUP BY method
    """,
)
def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest: replay three zero-parameter
    forecasters (naive last-month, seasonal-naive month-minus-12, and a
    3-month moving average) over every month with a full history window and
    score them by MAPE / worst-case APE — the evaluation harness that picks
    a baseline before anyone reaches for a model (complements
    revenue_trend_forecast's OLS and theil_sen_trend's robust slope).

    Parity: monthly revenue is exact decimal; every forecast and APE is a
    fixed IEEE expression on identical operands; only the final AVG sums
    doubles (70-odd values, ~1 ulp noise, rounded at 6dp).

    Scale: the series is calendar-bounded, so the lag window is a
    single-task detail; the heavy work is the map-side-combined monthly
    rollup over lineitem."""
    monthly = _monthly_revenue(spark, sf_dir)
    w = Window.orderBy("m")
    lagged = monthly.select(
        "m",
        "r",
        F.lag("r", 1).over(w).alias("l1"),
        F.lag("r", 2).over(w).alias("l2"),
        F.lag("r", 3).over(w).alias("l3"),
        F.lag("r", 12).over(w).alias("l12"),
        F.row_number().over(w).alias("rn"),
    )
    ev = lagged.filter(F.col("rn") > 12).select(
        "m",
        F.col("r").cast("double").alias("y"),
        F.col("l1").cast("double").alias("f_naive"),
        F.col("l12").cast("double").alias("f_seasonal"),
        (
            (F.col("l1") + F.col("l2") + F.col("l3")).cast("double") / 3
        ).alias("f_ma3"),
    )
    apes = (
        ev.select(
            "m",
            F.lit("naive1").alias("method"),
            (F.abs(F.col("y") - F.col("f_naive")) / F.col("y")).alias("ape"),
        )
        .unionAll(
            ev.select(
                "m",
                F.lit("seasonal12").alias("method"),
                (F.abs(F.col("y") - F.col("f_seasonal")) / F.col("y")).alias(
                    "ape"
                ),
            )
        )
        .unionAll(
            ev.select(
                "m",
                F.lit("ma3").alias("method"),
                (F.abs(F.col("y") - F.col("f_ma3")) / F.col("y")).alias(
                    "ape"
                ),
            )
        )
    )
    return apes.groupBy("method").agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.round(F.avg("ape"), 6).alias("mape"),
        F.round(F.max("ape"), 6).alias("max_ape"),
    )


@register(
    "kaplan_meier_churn",
    oracle="""
    WITH span AS (
        SELECT o_custkey,
               date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                         MAX(CAST(o_orderdate AS DATE))) AS dur,
               MAX(CAST(o_orderdate AS DATE)) AS last_d
        FROM orders GROUP BY 1
    ),
    horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
    obs AS (
        SELECT s.o_custkey, c.c_mktsegment,
               CAST(FLOOR(s.dur / 30.0) AS BIGINT) AS tb,
               s.last_d < h.mx - INTERVAL 180 DAY AS churned
        FROM span s
        JOIN customer c ON s.o_custkey = c.c_custkey, horizon h
    ),
    bucketed AS (
        SELECT c_mktsegment, tb,
               CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                   AS d_events,
               CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_censored
        FROM obs GROUP BY 1, 2
    ),
    risk AS (
        SELECT c_mktsegment, tb, d_events, c_censored,
               CAST(SUM(d_events + c_censored) OVER (
                        PARTITION BY c_mktsegment ORDER BY tb
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - (d_events + c_censored)
                    AS BIGINT) AS left_before,
               CAST(SUM(d_events + c_censored) OVER (
                        PARTITION BY c_mktsegment) AS BIGINT) AS total
        FROM bucketed
    ),
    km AS (
        SELECT c_mktsegment, tb, d_events, c_censored,
               total - left_before AS n_risk,
               SUM(CASE WHEN d_events < total - left_before
                        THEN ln(1.0 - CAST(d_events AS DOUBLE)
                                      / (total - left_before))
                        ELSE NULL END) OVER (
                   PARTITION BY c_mktsegment ORDER BY tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lnsurv,
               MAX(CASE WHEN d_events >= total - left_before
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY c_mktsegment ORDER BY tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS extinct
        FROM risk
    )
    SELECT c_mktsegment, tb * 30 AS t_days, n_risk, d_events, c_censored,
           CASE WHEN extinct = 1 THEN 0.0
                ELSE ROUND(exp(lnsurv), 6) END AS survival
    FROM km
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer engagement per market
    segment: duration = days between a customer's first and last order,
    an observation is a churn EVENT if the last order predates the
    dataset horizon by >180 days and right-CENSORED otherwise, durations
    grouped into 30-day buckets. S(t) multiplies the per-bucket hazard
    complements (1 - d/n) over buckets <= t — computed as exp of a
    cumulative ln-sum so both engines evaluate the identical expression.
    An all-events bucket (d == n) is an explicit extinction flag, NOT a
    ln(0) evaluation: DuckDB's ln(0) raises Out of Range and Spark-4
    ANSI ln(0.0) returns NULL (which a window SUM would silently skip),
    so both engines guard the hazard term with d < n and emit survival
    0.0 for the extinct bucket and every later one via a cumulative
    extinction marker.

    Parity: counts and at-risk denominators are exact integers; the only
    floats are the per-bucket ln terms (identical operands) accumulated
    over a calendar-bounded bucket count (<~80 rows/segment, ~1 ulp),
    rounded at 6dp.

    Scale: one shuffle to per-customer spans, one to (segment, bucket);
    the survival windows run over the tiny bucketed series."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    span = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.max(F.col("o_orderdate").cast("date")),
            F.min(F.col("o_orderdate").cast("date")),
        ).alias("dur"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    horizon = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("mx")
    )
    obs = (
        span.join(cust, span.o_custkey == cust.c_custkey)
        .crossJoin(F.broadcast(horizon))
        .select(
            "c_mktsegment",
            F.floor(F.col("dur") / 30.0).cast("bigint").alias("tb"),
            (F.col("last_d") < F.date_sub(F.col("mx"), 180)).alias(
                "churned"
            ),
        )
    )
    bucketed = obs.groupBy("c_mktsegment", "tb").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0))
        .cast("bigint")
        .alias("d_events"),
        F.sum(F.when(F.col("churned"), 0).otherwise(1))
        .cast("bigint")
        .alias("c_censored"),
    )
    leaving = F.col("d_events") + F.col("c_censored")
    wcum = (
        Window.partitionBy("c_mktsegment")
        .orderBy("tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("c_mktsegment")
    risk = bucketed.select(
        "c_mktsegment",
        "tb",
        "d_events",
        "c_censored",
        (F.sum(leaving).over(wcum) - leaving)
        .cast("bigint")
        .alias("left_before"),
        F.sum(leaving).over(wall).cast("bigint").alias("total"),
    )
    n_risk = F.col("total") - F.col("left_before")
    km = risk.select(
        "c_mktsegment",
        "tb",
        "d_events",
        "c_censored",
        n_risk.alias("n_risk"),
        F.sum(
            F.when(
                F.col("d_events") < n_risk,
                F.log(
                    1.0 - F.col("d_events").cast("double") / n_risk
                ),
            )
        )
        .over(wcum)
        .alias("lnsurv"),
        F.max(
            F.when(F.col("d_events") >= n_risk, 1).otherwise(0)
        )
        .over(wcum)
        .alias("extinct"),
    )
    return km.select(
        "c_mktsegment",
        (F.col("tb") * 30).alias("t_days"),
        "n_risk",
        "d_events",
        "c_censored",
        F.when(F.col("extinct") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("lnsurv"), 6))
        .alias("survival"),
    )


@register(
    "price_volume_decomposition",
    oracle="""
    WITH yr AS (
        SELECT CAST(year(MAX(l_shipdate)) - 1 AS BIGINT) AS y FROM lineitem
    ),
    agg AS (
        SELECT p.p_brand,
               CAST(year(l.l_shipdate) AS BIGINT) AS yy,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS qty,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey, yr
        WHERE CAST(year(l.l_shipdate) AS BIGINT) IN (yr.y, yr.y - 1)
        GROUP BY 1, 2
    ),
    pivoted AS (
        SELECT a.p_brand,
               a.qty AS qty_y, a.rev AS rev_y,
               b.qty AS qty_p, b.rev AS rev_p
        FROM agg a JOIN agg b
          ON a.p_brand = b.p_brand AND a.yy = b.yy + 1
        JOIN yr ON a.yy = yr.y
    )
    SELECT p_brand,
           ROUND(rev_y - rev_p, 4) AS rev_change,
           ROUND((qty_y - qty_p) * (rev_p / qty_p), 4) AS volume_effect,
           ROUND((rev_y / qty_y - rev_p / qty_p) * qty_y, 4)
               AS price_effect
    FROM pivoted
    """,
)
def price_volume_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of year-over-year revenue change per
    brand: dR = dQ x p_prior (volume effect) + dP x q_current (price
    effect) — the FP&A bridge that says WHY revenue moved, with the
    identity rev_change == volume_effect + price_effect holding exactly
    by construction. The comparison year is data-derived (last complete
    year), so the query works unchanged at any SF.

    Parity: quantities and revenues aggregate in exact decimals and
    convert to double once; effects are fixed IEEE expressions on those
    identical operands, rounded at 4dp. One filtered fact scan,
    map-side-combined (brand, year) rollup, tiny self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    yr = li.agg(
        (F.year(F.max("l_shipdate")) - 1).cast("bigint").alias("y")
    )
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .crossJoin(F.broadcast(yr))
        .filter(
            (F.year("l_shipdate").cast("bigint") == F.col("y"))
            | (F.year("l_shipdate").cast("bigint") == F.col("y") - 1)
        )
        .groupBy(
            "p_brand", F.year("l_shipdate").cast("bigint").alias("yy")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("rev"),
        )
    )
    a = agg.select(
        "p_brand",
        F.col("yy").alias("ya"),
        F.col("qty").alias("qty_y"),
        F.col("rev").alias("rev_y"),
    )
    b = agg.select(
        "p_brand",
        F.col("yy").alias("yb"),
        F.col("qty").alias("qty_p"),
        F.col("rev").alias("rev_p"),
    )
    piv = (
        a.join(b, "p_brand")
        .filter(F.col("ya") == F.col("yb") + 1)
        .crossJoin(F.broadcast(yr))
        .filter(F.col("ya") == F.col("y"))
    )
    return piv.select(
        "p_brand",
        F.round(F.col("rev_y") - F.col("rev_p"), 4).alias("rev_change"),
        F.round(
            (F.col("qty_y") - F.col("qty_p"))
            * (F.col("rev_p") / F.col("qty_p")),
            4,
        ).alias("volume_effect"),
        F.round(
            (
                F.col("rev_y") / F.col("qty_y")
                - F.col("rev_p") / F.col("qty_p")
            )
            * F.col("qty_y"),
            4,
        ).alias("price_effect"),
    )


@register(
    "forecast_conformal_band",
    oracle=f"""
    WITH monthly AS ({_MONTHLY_SQL}),
    lagged AS (
        SELECT m, r,
               lag(r, 1) OVER w AS l1, lag(r, 2) OVER w AS l2,
               lag(r, 3) OVER w AS l3,
               row_number() OVER w AS rn,
               COUNT(*) OVER () AS n_all
        FROM monthly WINDOW w AS (ORDER BY m)
    ),
    scored AS (
        SELECT m, CAST(r AS DOUBLE) AS y,
               CAST(l1 + l2 + l3 AS DOUBLE) / 3 AS f_ma3,
               abs(CAST(r AS DOUBLE) - CAST(l1 + l2 + l3 AS DOUBLE) / 3)
                   AS abs_resid,
               rn, n_all
        FROM lagged WHERE rn > 3
    ),
    q AS (
        SELECT quantile_cont(abs_resid, 0.9) AS q90
        FROM scored, (SELECT MAX(n_all) AS n FROM scored) t
        WHERE rn <= t.n - 6
    )
    SELECT s.m,
           ROUND(s.y / 1e4, 4) AS actual,
           ROUND(s.f_ma3 / 1e4, 4) AS forecast,
           ROUND((s.f_ma3 - q.q90) / 1e4, 4) AS band_lo,
           ROUND((s.f_ma3 + q.q90) / 1e4, 4) AS band_hi,
           s.abs_resid <= q.q90 AS in_band
    FROM scored s, q, (SELECT MAX(n_all) AS n FROM scored) t
    WHERE s.rn > t.n - 6
    """,
)
def forecast_conformal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction band for the MA3 forecaster: calibrate
    the 90th percentile of absolute residuals on all but the last 6
    months, then emit the band and the coverage flag for the 6 held-out
    months — distribution-free uncertainty quantification on top of
    forecast_backtest_mape's point forecasts.

    Parity: forecasts/residuals are fixed IEEE ops on exact-decimal
    monthly sums; the calibration quantile is an exact sorted-value
    interpolation (no order-dependent summation anywhere); the band
    comparison uses the same unrounded doubles on both engines.

    Scale: calendar-bounded series — the windows and the quantile run
    over <=100 rows regardless of fact size."""
    monthly = _monthly_revenue(spark, sf_dir)
    w = Window.orderBy("m")
    lagged = monthly.select(
        "m",
        "r",
        F.lag("r", 1).over(w).alias("l1"),
        F.lag("r", 2).over(w).alias("l2"),
        F.lag("r", 3).over(w).alias("l3"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n_all"),
    )
    f_ma3 = (F.col("l1") + F.col("l2") + F.col("l3")).cast("double") / 3
    scored = lagged.filter(F.col("rn") > 3).select(
        "m",
        F.col("r").cast("double").alias("y"),
        f_ma3.alias("f_ma3"),
        F.abs(F.col("r").cast("double") - f_ma3).alias("abs_resid"),
        "rn",
        "n_all",
    )
    q = (
        scored.filter(F.col("rn") <= F.col("n_all") - 6)
        .agg(F.expr("percentile(abs_resid, 0.9)").alias("q90"))
    )
    return (
        scored.filter(F.col("rn") > F.col("n_all") - 6)
        .crossJoin(F.broadcast(q))
        .select(
            "m",
            F.round(F.col("y") / 1e4, 4).alias("actual"),
            F.round(F.col("f_ma3") / 1e4, 4).alias("forecast"),
            F.round((F.col("f_ma3") - F.col("q90")) / 1e4, 4).alias(
                "band_lo"
            ),
            F.round((F.col("f_ma3") + F.col("q90")) / 1e4, 4).alias(
                "band_hi"
            ),
            (F.col("abs_resid") <= F.col("q90")).alias("in_band"),
        )
    )


@register(
    "time_weighted_value",
    oracle="""
    WITH seg AS (
        SELECT user_id, ts, value,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM events WHERE event_type = 'view'
    ),
    w AS (
        SELECT user_id,
               CAST(date_diff('second', ts, nxt) AS BIGINT) AS dur_s,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM seg WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(SUM(v * dur_s) AS DOUBLE) / SUM(dur_s) AS twap
    FROM w GROUP BY 1
    HAVING SUM(dur_s) > 0
    """,
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    holds until the next one, so its weight is the seconds until the
    user's next view event — the correct average for irregularly
    sampled state (sensor readings, prices, engagement levels), where a
    plain AVG over-weights bursts. Segments come from one lead() per
    user; weights are exact integer seconds; the weighted sum
    accumulates in exact DECIMAL (value is 2dp) so the single closing
    division is the only float op — _parity's never-round-after-divide
    rule applies and the double is engine-identical.

    Scale: one user-keyed window + one groupBy on the same key — the
    exchange is reused; no global ordering anywhere."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.lead("ts").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    dur = (
        F.unix_timestamp(F.col("nxt").cast("timestamp"))
        - F.unix_timestamp(F.col("ts").cast("timestamp"))
    ).cast("bigint")
    return (
        seg.select("user_id", dur.alias("dur_s"), "v")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.sum("dur_s").cast("bigint").alias("total_s"),
            (
                F.sum(F.col("v") * F.col("dur_s")).cast("double")
                / F.sum("dur_s")
            ).alias("twap"),
        )
        .filter(F.col("total_s") > 0)
    )


@register(
    "clamped_running_balance",
    oracle="""
    WITH deltas AS (
        SELECT user_id, ts, event_id,
               CAST(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE -CAST(value AS DECIMAL(18,2)) END
                    AS DECIMAL(18,2)) AS d
        FROM events WHERE event_type IN ('purchase', 'error')
    ),
    folded AS (
        -- the literal recurrence: S_t = max(0, S_{t-1} + d_t)
        SELECT user_id,
               list(d ORDER BY ts, event_id) AS ds,
               list(event_id ORDER BY ts, event_id) AS ids
        FROM deltas GROUP BY 1
    ),
    states AS (
        SELECT user_id, ids,
               list_transform(
                   range(1, len(ds) + 1),
                   i -> list_reduce(
                            list_prepend(CAST(0 AS DECIMAL(18,2)), ds[1:i]),
                            (acc, x) -> greatest(CAST(0 AS DECIMAL(18,2)),
                                                 CAST(acc + x AS DECIMAL(18,2))))
               ) AS bals
        FROM folded
    )
    SELECT user_id,
           CAST(u.ids[u.i] AS BIGINT) AS event_id,
           CAST(u.bals[u.i] AS DOUBLE) AS balance
    FROM (
        SELECT user_id, ids, bals, unnest(range(1, len(ids) + 1)) AS i
        FROM states
    ) u
    """,
)
def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance clamped at zero — S_t = max(0, S_{t-1} + d_t) per
    user (purchases add value, errors subtract; the inventory /
    prepaid-credit recurrence that a plain cumulative SUM gets wrong the
    moment a balance would go negative). The recurrence is NON-associative,
    but it has a window-expressible closed form:

        S_t = P_t - least(0, min_{k<=t} P_k)

    (P = unclamped prefix sum): whenever the running prefix dips to a new
    minimum the clamp resets the floor, and subtracting that floor
    reproduces every reset exactly. The Spark plan computes the CLOSED
    FORM (two stacked windows per user); the DuckDB oracle executes the
    LITERAL RECURRENCE (list_reduce fold per prefix) — the hash match is
    a machine-checked proof of the identity on real data, not a
    same-formula-twice tautology. Exact DECIMAL end to end; cast to
    double only at output.

    Scale: two frames over one user-keyed sort — the standard
    turn-a-fold-into-windows trick (same family as ewma's linear fold,
    but via prefix-min rather than geometric reweighting)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    d = F.when(
        F.col("event_type") == "purchase",
        F.col("value").cast("decimal(18,2)"),
    ).otherwise(-F.col("value").cast("decimal(18,2)"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = events.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(d.cast("decimal(18,2)")).over(w).alias("p"),
    )
    # second frame over the SAME (ts, event_id) sort — Spark reuses the
    # per-user sort across both windows
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return pref.select(
        "user_id",
        "event_id",
        (F.col("p") - F.least(F.lit(0).cast("decimal(18,2)"),
                              F.min("p").over(w2)))
        .cast("double")
        .alias("balance"),
    )


# Exactly-representable smoothing constants: 0.5/0.25/0.75 are binary
# fractions, so both engines' literals are the identical double and the
# recurrence stays bit-reproducible cross-engine.
_HOLT_A = 0.5
_HOLT_B = 0.25


# Shared recursive-CTE chain: nation-monthly revenue -> Holt fold (ends at
# `rec` with nation, month, y, rn, s, b). Used by holt_linear_forecast and
# backtest_forecast_accuracy.
_HOLT_SQL_CHAIN = """
    WITH RECURSIVE magg AS (
        SELECT n_name AS nation,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(o_totalprice) AS DOUBLE) AS y
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT nation, month, y,
               CAST(row_number() OVER (
                   PARTITION BY nation ORDER BY month) AS BIGINT) AS rn
        FROM magg
    ),
    rec AS (
        SELECT nation, month, y, rn, y AS s, CAST(0.0 AS DOUBLE) AS b
        FROM m WHERE rn = 1
        UNION ALL
        SELECT m.nation, m.month, m.y, m.rn,
               0.5 * m.y + 0.5 * (rec.s + rec.b),
               0.25 * ((0.5 * m.y + 0.5 * (rec.s + rec.b)) - rec.s)
                   + 0.75 * rec.b
        FROM rec JOIN m ON m.nation = rec.nation AND m.rn = rec.rn + 1
    )"""


@register(
    "holt_linear_forecast",
    oracle=_HOLT_SQL_CHAIN
    + """
    SELECT nation, month,
           y AS revenue,
           s AS level,
           b AS trend,
           s + b AS forecast_next
    FROM rec
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend, alpha=0.5
    beta=0.25) over each nation's monthly revenue, with the one-step-ahead
    forecast — the workhorse trending-series forecaster one rung above the
    EWMA already in this family. The recurrence is NON-associative (like
    clamped_running_balance) and, unlike that one, has no prefix closed
    form, so the distributed shape is per-series sequential: applyInPandas
    per nation, each bounded series folded in one task — at 100 TB
    parallelism comes from the series count, never the series length,
    which the monthly grain bounds by construction.

    Cross-engine parity without tolerance: the monthly revenue enters as
    one exact DECIMAL sum cast to double, the smoothing constants are
    binary fractions (identical literals), and the pandas fold mirrors the
    oracle's recursive-CTE expression tree operation-for-operation, so
    every level/trend double is bit-identical before the 6-dp round."""
    # UNROUNDED doubles on purpose: both engines fold the identical IEEE
    # expression tree on identical operands, so the bits match exactly —
    # a 6-dp SQL round would reintroduce the cross-engine half-tie class
    # (round-half-even vs half-away) the parity rules exist to avoid.
    return _holt_folded(spark, sf_dir).select(
        "nation",
        "month",
        F.col("y").alias("revenue"),
        "level",
        "trend",
        (F.col("level") + F.col("trend")).alias("forecast_next"),
    )


def _holt_folded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark twin of _HOLT_SQL_CHAIN: (nation, month, y, level,
    trend) after the per-series pandas fold."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.sum("o_totalprice").cast("double").alias("y"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month", kind="mergesort").reset_index(drop=True)
        levels, trends = [], []
        s = b = None
        for y in pdf["y"].astype("float64"):
            y = float(y)
            if s is None:
                s, b = y, 0.0
            else:
                s_new = 0.5 * y + 0.5 * (s + b)
                b = 0.25 * (s_new - s) + 0.75 * b
                s = s_new
            levels.append(s)
            trends.append(b)
        out = pdf[["nation", "month", "y"]].copy()
        out["level"] = levels
        out["trend"] = trends
        return out

    return monthly.groupBy("nation").applyInPandas(
        fold, "nation string, month date, y double, level double, trend double"
    )


@register(
    "backtest_forecast_accuracy",
    oracle=_HOLT_SQL_CHAIN
    + """,
    lagd AS (
        SELECT nation, rn, month, y,
               lag(y, 1) OVER w AS y1,
               lag(y, 12) OVER w AS y12,
               lag(s + b, 1) OVER w AS holt_prev,
               MAX(rn) OVER (PARTITION BY nation) AS max_rn
        FROM rec WINDOW w AS (PARTITION BY nation ORDER BY rn)
    ),
    train_scale AS (
        SELECT nation, AVG(ABS(y - y1)) AS scale
        FROM lagd WHERE rn <= max_rn - 12 AND y1 IS NOT NULL
        GROUP BY 1
    ),
    errs AS (
        SELECT nation, 'naive' AS method, y - y1 AS e
        FROM lagd WHERE rn > max_rn - 12 AND y1 IS NOT NULL
        UNION ALL
        SELECT nation, 'snaive', y - y12
        FROM lagd WHERE rn > max_rn - 12 AND y12 IS NOT NULL
        UNION ALL
        SELECT nation, 'holt', y - holt_prev
        FROM lagd WHERE rn > max_rn - 12 AND holt_prev IS NOT NULL
    )
    SELECT e.nation, e.method,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           round(AVG(ABS(e.e)), 6) AS mae,
           round(sqrt(AVG(e.e * e.e)), 6) AS rmse,
           round(AVG(ABS(e.e)) / ts.scale, 6) AS mase
    FROM errs e JOIN train_scale ts ON e.nation = ts.nation
    GROUP BY e.nation, e.method, ts.scale
    """,
)
def backtest_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting — the model-selection harness the forecasting
    family needs: one-step-ahead errors of three forecasters (naive lag-1,
    seasonal-naive lag-12, Holt level+trend from holt_linear_forecast's
    shared fold) over each nation's last 12 observed months, scored as
    MAE, RMSE and MASE (MAE scaled by the naive forecaster's TRAINING-
    period error — the scale-free metric that makes accuracy comparable
    across nations of different revenue magnitude; MASE < 1 beats naive).
    Lags are in observed-month index space, so sparse series stay
    well-defined at any SF.

    Built entirely on the shared Holt fold + three lag windows over the
    SAME nation-keyed sort (one shuffle); the eval/train split is a pure
    rn predicate against the per-nation max. Error terms are differences
    of bit-identical doubles; the per-method averages sum 12 such terms,
    and the final divisions mirror operand-for-operand."""
    from pyspark.sql.window import Window

    folded = _holt_folded(spark, sf_dir)
    w = Window.partitionBy("nation").orderBy("month")
    rn = F.row_number().over(w).cast("bigint")
    lagd = folded.select(
        "nation",
        "month",
        "y",
        rn.alias("rn"),
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 12).over(w).alias("y12"),
        F.lag(F.col("level") + F.col("trend"), 1).over(w).alias("holt_prev"),
    ).withColumn(
        "max_rn", F.max("rn").over(Window.partitionBy("nation"))
    )
    is_eval = F.col("rn") > F.col("max_rn") - 12
    train = lagd.filter(
        (F.col("rn") <= F.col("max_rn") - 12) & F.col("y1").isNotNull()
    )
    scale = train.groupBy("nation").agg(
        F.avg(F.abs(F.col("y") - F.col("y1"))).alias("scale")
    )
    errs = None
    for method, fc in (("naive", "y1"), ("snaive", "y12"), ("holt", "holt_prev")):
        part = (
            lagd.filter(is_eval & F.col(fc).isNotNull())
            .select(
                "nation",
                F.lit(method).alias("method"),
                (F.col("y") - F.col(fc)).alias("e"),
            )
        )
        errs = part if errs is None else errs.unionByName(part)
    return (
        errs.join(F.broadcast(scale), "nation")
        .groupBy("nation", "method", "scale")
        .agg(
            F.count("*").cast("bigint").alias("n_eval"),
            F.avg(F.abs("e")).alias("mae_raw"),
            F.avg(F.col("e") * F.col("e")).alias("mse_raw"),
        )
        .select(
            "nation",
            "method",
            "n_eval",
            F.round("mae_raw", 6).alias("mae"),
            F.round(F.sqrt("mse_raw"), 6).alias("rmse"),
            F.round(F.col("mae_raw") / F.col("scale"), 6).alias("mase"),
        )
    )


@register(
    "seasonal_indices",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS DECIMAL(18,0))) AS BIGINT) AS yc
        FROM orders GROUP BY 1
    ),
    framed AS (
        SELECT month, yc,
               CAST(month(month) AS INT) AS moy,
               CAST(SUM(yc) OVER (ORDER BY month
                    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT)
                   AS s11,
               CAST(lag(yc, 6) OVER (ORDER BY month) AS BIGINT) AS l6,
               CAST(lead(yc, 6) OVER (ORDER BY month) AS BIGINT) AS f6
        FROM monthly
    ),
    ratios AS (
        SELECT moy,
               CAST(yc AS DOUBLE) * 24.0
                   / (2 * s11 + l6 + f6) AS ratio
        FROM framed
        WHERE l6 IS NOT NULL AND f6 IS NOT NULL
    ),
    idx AS (
        SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_obs,
               AVG(ratio) AS raw_index
        FROM ratios GROUP BY 1
    ),
    tot AS (SELECT SUM(raw_index) AS s, COUNT(*) AS k FROM idx)
    SELECT idx.moy AS month_of_year, idx.n_obs,
           round(idx.raw_index, 6) AS raw_index,
           round(idx.raw_index * tot.k / tot.s, 6) AS normalized_index
    FROM idx CROSS JOIN tot
    """,
)
def seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition, the ratio-to-moving-average
    step: each month's revenue divided by its centered 2x12 moving
    average (the standard even-period centering: twice the 11-month sum
    plus the two half-weighted endpoints, over 24), averaged per calendar
    month and normalized to mean 1 — the multiplicative seasonal index
    a demand-planning pipeline feeds back into deseasonalized forecasts
    (composing with holt_linear_forecast / backtest_forecast_accuracy).

    Parity: monthly revenue is held as exact integer CENTS, so every
    window sum is exact in any accumulation order — the ratio is the
    only division (identical operands cross-engine). The calendar-bounded
    global series (~80 rows at any SF) makes the unpartitioned window the
    documented safe case (acf_daily_revenue precedent)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    )
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(cents).cast("bigint").alias("yc"))
    w = Window.orderBy("month")
    framed = monthly.select(
        "month",
        "yc",
        F.month("month").cast("int").alias("moy"),
        F.sum("yc").over(w.rowsBetween(-5, 5)).cast("bigint").alias("s11"),
        F.lag("yc", 6).over(w).cast("bigint").alias("l6"),
        F.lead("yc", 6).over(w).cast("bigint").alias("f6"),
    )
    ratios = framed.filter(
        F.col("l6").isNotNull() & F.col("f6").isNotNull()
    ).select(
        "moy",
        (
            F.col("yc").cast("double")
            * 24.0
            / (2 * F.col("s11") + F.col("l6") + F.col("f6"))
        ).alias("ratio"),
    )
    idx = ratios.groupBy("moy").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.avg("ratio").alias("raw_index"),
    )
    tot = idx.agg(
        F.sum("raw_index").alias("s"), F.count("*").alias("k")
    )
    return idx.crossJoin(F.broadcast(tot)).select(
        F.col("moy").alias("month_of_year"),
        "n_obs",
        F.round("raw_index", 6).alias("raw_index"),
        F.round(F.col("raw_index") * F.col("k") / F.col("s"), 6).alias(
            "normalized_index"
        ),
    )


def _life_table_sql(orders: str, datediff: str) -> str:
    """Shared life-table SQL body; ``datediff`` is the dialect's day-diff
    spelling with {a}/{b} placeholders (DuckDB date_diff vs Spark datediff).
    """
    dd = datediff.format(a="MIN(CAST(o_orderdate AS DATE))",
                         b="MAX(CAST(o_orderdate AS DATE))")
    return f"""
    WITH span AS (
        SELECT o_custkey, {dd} AS dur,
               MAX(CAST(o_orderdate AS DATE)) AS last_d
        FROM {orders} GROUP BY 1
    ),
    horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM {orders}),
    obs AS (
        SELECT CAST(FLOOR(s.dur / 30.0) AS BIGINT) AS tb,
               s.last_d < h.mx - INTERVAL 180 DAY AS churned
        FROM span s CROSS JOIN horizon h
    ),
    bucketed AS (
        SELECT tb,
               CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                   AS d_events,
               CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_censored
        FROM obs GROUP BY 1
    ),
    risk AS (
        SELECT tb, d_events, c_censored,
               CAST(SUM(d_events + c_censored) OVER (ORDER BY tb
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - (d_events + c_censored) AS BIGINT) AS left_before,
               CAST(SUM(d_events + c_censored) OVER () AS BIGINT) AS total
        FROM bucketed
    )
    SELECT tb * 30 AS t_days,
           total - left_before AS n_risk, d_events, c_censored,
           CAST(d_events AS DOUBLE) / (total - left_before) AS hazard,
           round(SUM(CAST(d_events AS DOUBLE) / (total - left_before))
                     OVER (ORDER BY tb ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW), 6) AS cum_hazard,
           round(exp(0.0 - SUM(CAST(d_events AS DOUBLE)
                               / (total - left_before))
                         OVER (ORDER BY tb ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW)), 6)
               AS surv_nelson_aalen
    FROM risk
    """


@register(
    "life_table_nelson_aalen",
    oracle=_life_table_sql(
        "orders", "date_diff('day', {a}, {b})"
    ),
)
def life_table_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actuarial life table with the Nelson-Aalen cumulative-hazard
    estimator: per 30-day tenure bucket, the at-risk count, churn events,
    censored exits, discrete hazard d/n, cumulative hazard H = sum d/n
    and the derived survival exp(-H). Complements kaplan_meier_churn —
    NA is the additive-hazard dual of KM's product form (preferred for
    hazard-rate reads and small-risk-set stability) under the same
    180-day-inactivity churn definition and right-censoring.

    Scale posture: customer-grain span aggregate, ~35-bucket table,
    windowed cumulative sums over the ordered buckets — the wide work is
    one orders scan. The per-bucket hazard is an exact two-integer
    division (emitted unrounded); the ordered cumulative sums carry the
    6-dp pin."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lt_orders")
    return spark.sql(_life_table_sql("lt_orders", "datediff({b}, {a})"))


# Holt-Winters additive: alpha/beta/gamma are binary fractions so the
# literals are identical doubles in both engines (same policy as Holt).
_HW_SQL = """
    WITH RECURSIVE magg AS (
        SELECT n_name AS nation,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(o_totalprice) AS DOUBLE) AS y
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT nation, month, y,
               CAST(row_number() OVER (
                   PARTITION BY nation ORDER BY month) AS BIGINT) AS rn
        FROM magg
    ),
    rec AS (
        SELECT nation, month, y, rn, y AS s, CAST(0.0 AS DOUBLE) AS b,
               CAST(0.0 AS DOUBLE) AS c1, CAST(0.0 AS DOUBLE) AS c2,
               CAST(0.0 AS DOUBLE) AS c3, CAST(0.0 AS DOUBLE) AS c4
        FROM m WHERE rn = 1
        UNION ALL
        SELECT m.nation, m.month, m.y, m.rn,
               0.5 * (m.y - rec.c1) + 0.5 * (rec.s + rec.b),
               0.25 * ((0.5 * (m.y - rec.c1) + 0.5 * (rec.s + rec.b))
                       - rec.s) + 0.75 * rec.b,
               rec.c2, rec.c3, rec.c4,
               0.25 * (m.y - rec.s - rec.b) + 0.75 * rec.c1
        FROM rec JOIN m ON m.nation = rec.nation AND m.rn = rec.rn + 1
    )
    SELECT nation, month, y AS revenue, s AS level, b AS trend,
           c4 AS seasonal_upd, s + b + c1 AS forecast_next
    FROM rec
    """


@register("holt_winters_additive", oracle=_HW_SQL)
def holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple exponential smoothing (level + trend +
    period-4 seasonal; alpha=0.5, beta=gamma=0.25) over each nation's
    monthly revenue — the seasonal rung above holt_linear_forecast.
    Seasonal state rotates through four columns in the oracle's recursive
    CTE (use c1, emit the update as the new c4), so the cross-engine
    check machine-verifies the full three-state recurrence, not just the
    level/trend pair; seasonals initialize at 0 and are learned online.

    Distributed shape: same as Holt — per-series sequential fold via
    applyInPandas, parallel across nations; series length is bounded by
    the monthly grain so 100 TB parallelism comes from series count.
    Parity: exact DECIMAL monthly sums cast once, binary-fraction
    constants, the pandas fold mirrors the oracle's expression tree
    op-for-op — unrounded doubles, bit-identical."""
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.sum("o_totalprice").cast("double").alias("y"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month", kind="mergesort").reset_index(drop=True)
        rows = []
        s = b = None
        c = [0.0, 0.0, 0.0, 0.0]  # rotating: c[0] is the current slot
        for y in pdf["y"].astype("float64"):
            y = float(y)
            if s is None:
                s, b = y, 0.0
                rows.append((s, b, 0.0, s + b + c[0]))
                continue
            # mirror the oracle's expression tree exactly (snew repeated)
            s_new = 0.5 * (y - c[0]) + 0.5 * (s + b)
            b_new = 0.25 * ((0.5 * (y - c[0]) + 0.5 * (s + b)) - s) + 0.75 * b
            c_new = 0.25 * (y - s - b) + 0.75 * c[0]
            c = [c[1], c[2], c[3], c_new]
            s, b = s_new, b_new
            rows.append((s, b, c_new, s + b + c[0]))
        out = pdf[["nation", "month", "y"]].copy()
        out["level"] = [r[0] for r in rows]
        out["trend"] = [r[1] for r in rows]
        out["seasonal_upd"] = [r[2] for r in rows]
        out["forecast_next"] = [r[3] for r in rows]
        return out

    return (
        monthly.groupBy("nation")
        .applyInPandas(
            fold,
            "nation string, month date, y double, level double, "
            "trend double, seasonal_upd double, forecast_next double",
        )
        .select(
            "nation",
            "month",
            F.col("y").alias("revenue"),
            "level",
            "trend",
            "seasonal_upd",
            "forecast_next",
        )
    )


def _littles_law_sql(orders: str, lineitem: str, daydiff: str) -> str:
    """Shared Little's-law SQL body; ``daydiff`` is the dialect's day
    difference with {a}(earlier)/{b}(later) placeholders."""
    dwell = daydiff.format(a="arr", b="done")
    ov = daydiff.format(
        a="GREATEST(arr, q.qs)", b="LEAST(done, q.qe)"
    )
    qlen = daydiff.format(a="q.qs", b="q.qe")
    quarters = ", ".join(
        f"(DATE '{y}-{m:02d}-01', DATE '{y2}-{m2:02d}-01')"
        for (y, m, y2, m2) in [
            (1996, 1, 1996, 4), (1996, 4, 1996, 7), (1996, 7, 1996, 10),
            (1996, 10, 1997, 1), (1997, 1, 1997, 4), (1997, 4, 1997, 7),
            (1997, 7, 1997, 10), (1997, 10, 1998, 1),
        ]
    )
    return f"""
    WITH spans AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS arr,
               MAX(CAST(l.l_shipdate AS DATE)) AS done
        FROM {orders} o JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    q AS (SELECT * FROM (VALUES {quarters}) t(qs, qe)),
    arrivals AS (
        SELECT q.qs, CAST(COUNT(*) AS BIGINT) AS n_arr,
               CAST(SUM({dwell}) AS BIGINT) AS sum_dwell
        FROM spans CROSS JOIN q
        WHERE arr >= q.qs AND arr < q.qe
        GROUP BY 1
    ),
    wip AS (
        SELECT q.qs, CAST(SUM({ov}) AS BIGINT) AS sum_overlap,
               CAST(MAX({qlen}) AS BIGINT) AS q_days
        FROM spans CROSS JOIN q
        WHERE arr < q.qe AND done > q.qs
        GROUP BY 1
    )
    SELECT a.qs AS quarter_start, a.n_arr AS arrivals,
           CAST(a.sum_dwell AS DOUBLE) / a.n_arr AS mean_dwell_days,
           CAST(a.n_arr AS DOUBLE) / w.q_days AS arrival_rate_per_day,
           CAST(w.sum_overlap AS DOUBLE) / w.q_days AS avg_wip,
           (CAST(w.sum_overlap AS DOUBLE) / w.q_days)
             / ((CAST(a.n_arr AS DOUBLE) / w.q_days)
                * (CAST(a.sum_dwell AS DOUBLE) / a.n_arr))
               AS littles_ratio
    FROM arrivals a JOIN wip w ON a.qs = w.qs
    """


@register(
    "littles_law_wip",
    oracle=_littles_law_sql(
        "orders", "lineitem", "date_diff('day', {a}, {b})"
    ),
)
def littles_law_wip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law operational diagnostic per quarter: average
    work-in-progress L (time-integral of open orders over the quarter,
    from exact interval-overlap days), arrival rate lambda, mean dwell W
    (order date to last lineitem ship date), and the ratio L/(lambda*W) —
    exactly 1 in steady state, drifting when flow is filling or
    draining across the window edges. The flow-balance read every ops
    review wants from an order book, computed exactly instead of from a
    WIP snapshot.

    Shape: one order-grain span aggregate, then overlap joins against an
    8-row literal quarter table (broadcast; the overlap filter bounds
    each order to the quarters it touches). All integer day arithmetic
    with single exact divisions — emitted unrounded."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ll_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ll_lineitem"
    )
    return spark.sql(
        _littles_law_sql("ll_orders", "ll_lineitem", "datediff({b}, {a})")
    )


def _acf_sql(orders: str, max_lag: int = 14) -> str:
    """Shared autocorrelation SQL body. Daily revenue goes to integer
    CENTS (exact BIGINT); per-lag sufficient statistics are BIGINT /
    DECIMAL(38,0) sums (cross-products exceed BIGINT range), so every
    aggregate is exact; each r_k is one IEEE expression over those exact
    stats — identical doubles on both engines, emitted unrounded."""
    lag_cols = ",\n               ".join(
        f"LAG(x_cents, {k}) OVER (ORDER BY d) AS x{k}"
        for k in range(1, max_lag + 1)
    )
    stats = []
    for k in range(1, max_lag + 1):
        mk = f"CAST(COUNT(x{k}) AS BIGINT)"
        sa = f"CAST(SUM(CASE WHEN x{k} IS NOT NULL THEN x0 END) AS BIGINT)"
        sb = f"CAST(SUM(x{k}) AS BIGINT)"
        sab = (f"SUM(CASE WHEN x{k} IS NOT NULL THEN "
               f"CAST(x0 AS DECIMAL(38,0)) * x{k} END)")
        saa = (f"SUM(CASE WHEN x{k} IS NOT NULL THEN "
               f"CAST(x0 AS DECIMAL(38,0)) * x0 END)")
        sbb = f"SUM(CAST(x{k} AS DECIMAL(38,0)) * x{k})"
        num = f"({mk} * CAST({sab} AS DOUBLE) - CAST({sa} AS DOUBLE) * CAST({sb} AS DOUBLE))"
        va = f"({mk} * CAST({saa} AS DOUBLE) - CAST({sa} AS DOUBLE) * CAST({sa} AS DOUBLE))"
        vb = f"({mk} * CAST({sbb} AS DOUBLE) - CAST({sb} AS DOUBLE) * CAST({sb} AS DOUBLE))"
        stats.append(f"{num} / sqrt({va} * {vb}) AS acf_lag_{k}")
    stats_sql = ",\n           ".join(stats)
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS x_cents
        FROM {orders} GROUP BY 1
    ),
    lagged AS (
        SELECT x_cents AS x0,
               {lag_cols}
        FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           {stats_sql}
    FROM lagged
    """


@register("acf_daily_revenue", oracle=_acf_sql("orders"))
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function of the daily revenue series at
    lags 1..14 (per-lag Pearson over the observed day sequence — TPC-H
    order dates are dense, so row-lag == day-lag): the periodicity
    diagnostic that justifies the 7-day windows used across the
    time-series family. Revenue is summed in exact integer cents; all
    sufficient statistics are exact BIGINT/DECIMAL sums, so the doubles
    are single deterministic expressions (no float accumulation — the
    order-dependent-sum flake class is structurally excluded).

    Scale: the day grid is calendar-bounded (~2.4k rows regardless of
    data size after the map-side-combined daily groupBy), so the single
    ordered window pass and the 84-aggregate reduce are O(days), not
    O(orders). Reference scope: src/analytics trend diagnostics; public
    method: Box & Jenkins sample ACF."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "acf_orders"
    )
    return spark.sql(_acf_sql("acf_orders"))


def _cusum_cp_sql(orders: str) -> str:
    """Shared offline-CUSUM changepoint SQL body. The centered cumulative
    sum S_t = sum_{i<=t}(x_i - xbar) is kept exact by scaling through n:
    n*S_t = n*CS_t - t*SX (all BIGINT), so the argmax is an integer
    comparison; doubles appear only in the final S/sigma normalizations
    of exact integers (unrounded)."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM {orders} GROUP BY 1
    ),
    walked AS (
        SELECT d, x,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
               CAST(SUM(x) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cs,
               CAST(SUM(x) OVER () AS BIGINT) AS sx,
               CAST(COUNT(*) OVER () AS BIGINT) AS n,
               CAST(SUM(x * x) OVER () AS BIGINT) AS sxx
        FROM daily
    ),
    scored AS (
        SELECT d, t, n, sx, sxx,
               n * cs - t * sx AS ns,
               ROW_NUMBER() OVER (
                   ORDER BY ABS(n * cs - t * sx) DESC, d
               ) AS rk
        FROM walked
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           d AS changepoint_date,
           CAST(t AS BIGINT) AS changepoint_index,
           CAST(ns AS DOUBLE) / n AS s_max,
           (CAST(ABS(ns) AS DOUBLE) / n)
           / (sqrt((sxx - CAST(sx AS DOUBLE) * sx / n)
                   / (n - CAST(1.0 AS DOUBLE))) * sqrt(CAST(n AS DOUBLE)))
               AS normalized_stat
    FROM scored WHERE rk = 1
    """


@register("cusum_changepoint_day", oracle=_cusum_cp_sql("orders"))
def cusum_changepoint_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint location over the daily order-count
    series: the day t maximizing |S_t|, S_t the mean-centered cumulative
    sum — the classical single-changepoint estimator (the retrospective
    complement to cusum_monthly_revenue's sequential one-sided
    detector). Integer-exact via n-scaling (n*S_t is BIGINT), with the
    sigma-normalized statistic for a Kolmogorov-style threshold.

    Scale: daily groupBy (map-side combine) collapses to the
    calendar-bounded day grid; both windows run over that grid.
    Deterministic argmax tiebreak on date. Public method: Page 1954 /
    Pettitt-style retrospective CUSUM."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ccp_orders"
    )
    return spark.sql(_cusum_cp_sql("ccp_orders"))


def _theil_sen_sql(orders: str, customer: str, nation: str) -> str:
    """Shared Theil-Sen SQL body. Revenue in exact integer cents; each
    pairwise slope is one double division of exact integers; the median
    picks rows by the div-free predicate 2*rn BETWEEN m AND m+2 (one row
    for odd m, the two middles for even m — AVG over <= 2 doubles is
    deterministic). Tiebreak (slope, ia, ib) pins rank order."""
    return f"""
    WITH monthly AS (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
                    + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE))
                    AS BIGINT) AS mi,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders}
        JOIN {customer} ON o_custkey = c_custkey
        JOIN {nation} ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.nation,
               (b.cents - CAST(a.cents AS DOUBLE)) / (b.mi - a.mi) AS slope,
               a.mi AS ia, b.mi AS ib
        FROM monthly a
        JOIN monthly b ON a.nation = b.nation AND b.mi > a.mi
    ),
    ranked AS (
        SELECT nation, slope,
               ROW_NUMBER() OVER (PARTITION BY nation
                                  ORDER BY slope, ia, ib) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS m
        FROM slopes
    )
    SELECT nation,
           CAST(MAX(m) AS BIGINT) AS n_pairs,
           AVG(CASE WHEN 2 * rn BETWEEN m AND m + 2 THEN slope END)
               AS sen_slope_cents_per_month,
           AVG(CASE WHEN 2 * rn BETWEEN m AND m + 2 THEN slope END) / 100
               AS sen_slope_dollars_per_month
    FROM ranked
    GROUP BY nation
    """


@register(
    "theil_sen_slope",
    oracle=_theil_sen_sql("orders", "customer", "nation"),
)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of monthly revenue per nation: the
    median of all pairwise month-to-month slopes — the
    breakdown-point-29% alternative to OLS trend fitting (immune to the
    outlier months that bend zipf/holt-style least squares). Exact
    integer-cents arithmetic end to end; the median is an integer-rank
    pick, not a percentile approximation.

    Scale: the pair lattice folds to the calendar grid (months^2 per
    nation, ~3.2k pairs x 25 nations regardless of row count), the
    documented fold-to-grid posture; the only data-sized work is the
    map-side-combined monthly groupBy. Public method: Theil 1950 /
    Sen 1968."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"ts_{t}")
    return spark.sql(_theil_sen_sql("ts_orders", "ts_customer", "ts_nation"))


def _km_sql(orders: str, datediff: str) -> str:
    """Shared Kaplan-Meier SQL body (same censoring frame as
    _life_table_sql). The product limit rides as an ordered-window sum
    of log terms (sequential adds in pinned bucket order — the
    deterministic accumulation class), with the d = n absorbing state
    handled explicitly instead of through ln(0)."""
    dd = datediff.format(a="MIN(CAST(o_orderdate AS DATE))",
                         b="MAX(CAST(o_orderdate AS DATE))")
    return f"""
    WITH span AS (
        SELECT o_custkey, {dd} AS dur,
               MAX(CAST(o_orderdate AS DATE)) AS last_d
        FROM {orders} GROUP BY 1
    ),
    horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM {orders}),
    obs AS (
        SELECT CAST(FLOOR(s.dur / 30.0) AS BIGINT) AS tb,
               s.last_d < h.mx - INTERVAL 180 DAY AS churned
        FROM span s CROSS JOIN horizon h
    ),
    bucketed AS (
        SELECT tb,
               CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                   AS d_events,
               CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_censored
        FROM obs GROUP BY 1
    ),
    risk AS (
        SELECT tb, d_events, c_censored,
               CAST(SUM(d_events + c_censored) OVER () -
                    (SUM(d_events + c_censored) OVER (ORDER BY tb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - (d_events + c_censored)) AS BIGINT) AS n_risk
        FROM bucketed
    ),
    walked AS (
        SELECT tb, d_events, c_censored, n_risk,
               SUM(CASE WHEN d_events < n_risk
                        THEN ln(1 - CAST(d_events AS DOUBLE) / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY tb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS log_surv,
               MAX(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY tb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS absorbed,
               SUM(CASE WHEN d_events < n_risk
                        THEN CAST(d_events AS DOUBLE)
                             / (n_risk * CAST(n_risk - d_events AS DOUBLE))
                        ELSE 0.0 END)
                   OVER (ORDER BY tb
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS greenwood_sum
        FROM risk
    )
    SELECT tb * 30 AS t_days, n_risk, d_events, c_censored,
           CASE WHEN absorbed = 1 THEN 0.0 ELSE exp(log_surv) END
               AS km_survival,
           CASE WHEN absorbed = 1 THEN 0.0
                ELSE exp(log_surv) * sqrt(greenwood_sum) END
               AS greenwood_se
    FROM walked
    """


@register(
    "kaplan_meier_tenure",
    oracle=_km_sql("orders", "date_diff('day', {a}, {b})"),
)
def kaplan_meier_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival of customer tenure (30-day
    buckets, censoring at the 180-day inactivity horizon) with the
    Greenwood standard error — the multiplicative dual of
    life_table_nelson_aalen on the identical censoring frame, so the
    two estimators cross-check each other (S_KM <= S_NA pointwise);
    distinct from the per-mktsegment kaplan_meier_churn, which buckets
    by event-time order rather than 30-day tenure.
    The product is an ordered log-sum (deterministic sequential
    accumulation); an exhausted risk set (d = n) absorbs to S = 0
    explicitly rather than through ln(0).

    Scale: customer-level groupBy then a ~bucket-count-sized ordered
    window (tenure grid, data-size-free). Public method:
    Kaplan & Meier 1958; Greenwood 1926."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "km_orders"
    )
    return spark.sql(_km_sql("km_orders", "datediff({b}, {a})"))


def _mann_kendall_sql(orders: str) -> str:
    """Shared Mann-Kendall SQL body. S (sign-pair sum), tie groups and
    the variance polynomial are all exact BIGINT; the z statistic is one
    IEEE expression over them (Kendall's continuity-corrected normal
    approximation), emitted unrounded."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM {orders} GROUP BY 1
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                    AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    ties AS (
        SELECT CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                   AS tie_poly
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
              FROM daily GROUP BY x) t
    ),
    n_obs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
    SELECT n_obs.n AS n_days, pairs.s AS s_statistic,
           (n_obs.n * (n_obs.n - 1) * (2 * n_obs.n + 5) - ties.tie_poly)
               / CAST(18.0 AS DOUBLE) AS var_s,
           CASE WHEN pairs.s > 0 THEN (pairs.s - 1)
                WHEN pairs.s < 0 THEN (pairs.s + 1)
                ELSE 0 END
           / sqrt((n_obs.n * (n_obs.n - 1) * (2 * n_obs.n + 5)
                   - ties.tie_poly) / CAST(18.0 AS DOUBLE)) AS z_score,
           CAST(pairs.s AS DOUBLE)
               / (n_obs.n * (n_obs.n - CAST(1.0 AS DOUBLE)) / 2)
               AS kendall_tau
    FROM pairs CROSS JOIN ties CROSS JOIN n_obs
    """


@register("mann_kendall_trend", oracle=_mann_kendall_sql("orders"))
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on the daily order-count
    series: the sign-pair statistic S, its tie-corrected variance, the
    continuity-corrected z, and Kendall's tau-a — the
    distribution-free companion to theil_sen_slope (MK tests the trend
    the Sen slope estimates). Everything up to the final division is
    exact BIGINT.

    Scale: the pair join folds to the calendar grid (days^2 ~ 2.9M
    comparisons regardless of data size — grid-bounded, one equi-free
    range self-join of a ~2.4k-row frame). Public method: Mann 1945 /
    Kendall 1975."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "mk_orders"
    )
    return spark.sql(_mann_kendall_sql("mk_orders"))


def _runs_test_sql(orders: str) -> str:
    """Shared Wald-Wolfowitz runs-test SQL body. Signs come from the
    exact integer comparison against twice-the-total (median-free
    two-sided split via the mean in cents); run count, n+ and n- are
    exact BIGINTs; z is one IEEE expression (unrounded)."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders} GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS sc,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM daily
    ),
    signed AS (
        -- above/below the mean, exactly: cents * n vs total (no division)
        SELECT d.d,
               CASE WHEN d.cents * t.n > t.sc THEN 1 ELSE 0 END AS pos
        FROM daily d CROSS JOIN tot t
    ),
    runs AS (
        SELECT pos,
               CASE WHEN LAG(pos) OVER (ORDER BY d) IS NULL
                         OR LAG(pos) OVER (ORDER BY d) <> pos
                    THEN 1 ELSE 0 END AS is_start
        FROM signed
    ),
    stats AS (
        SELECT CAST(SUM(is_start) AS BIGINT) AS r,
               CAST(SUM(pos) AS BIGINT) AS n1,
               CAST(SUM(1 - pos) AS BIGINT) AS n2
        FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           1 + 2 * n1 * CAST(n2 AS DOUBLE) / (n1 + n2) AS expected_runs,
           (r - (1 + 2 * n1 * CAST(n2 AS DOUBLE) / (n1 + n2)))
           / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                  / ((n1 + CAST(n2 AS DOUBLE)) * (n1 + n2)
                     * (n1 + n2 - 1))) AS z_score
    FROM stats
    """


@register("runs_test_residuals", oracle=_runs_test_sql("orders"))
def runs_test_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily revenue
    series around its mean: are above/below-mean days independently
    mixed, or do they clump (autocorrelation / regime persistence the
    ACF corroborates)? The above-mean indicator is the exact integer
    comparison cents*n > total (division-free), runs are counted with
    one LAG over the calendar grid, and z is a single expression over
    exact counts.

    Scale: daily groupBy then a calendar-bounded ordered window.
    Public method: Wald & Wolfowitz 1940."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "rt_orders"
    )
    return spark.sql(_runs_test_sql("rt_orders"))


def _decomp_sql(orders: str, dow: str) -> str:
    """Shared classical-decomposition SQL body; ``dow`` is the dialect's
    day-of-week spelling with {x} placeholder (both map Sunday=1..7
    here: Spark dayofweek, DuckDB dayofweek()+1). The centered 7-day
    trend stays division-free (trend7 = windowed SUM, detrended7 =
    7*x - trend7 — exact BIGINT cents), so every per-DOW statistic is a
    single IEEE expression over exact integer sums."""
    dw = dow.format(x="d")
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders} GROUP BY 1
    ),
    windowed AS (
        SELECT d, cents,
               CAST(SUM(cents) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS BIGINT) AS trend7,
               CAST(COUNT(*) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS BIGINT) AS w
        FROM daily
    ),
    detr AS (
        -- interior days only (full 7-day window): exact 7x - trend
        SELECT {dw} AS dow, 7 * cents - trend7 AS d7
        FROM windowed WHERE w = 7
    )
    SELECT CAST(dow AS BIGINT) AS day_of_week,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(d7) AS DOUBLE) / (7 * COUNT(*)) / 100
               AS seasonal_index_dollars,
           sqrt((COUNT(*) * CAST(SUM(CAST(d7 AS DECIMAL(38,0)) * d7)
                                 AS DOUBLE)
                 - CAST(SUM(d7) AS DOUBLE) * CAST(SUM(d7) AS DOUBLE)))
               / (7 * COUNT(*)) / 100 AS remainder_std_dollars
    FROM detr
    GROUP BY dow
    """


@register(
    "classical_decomposition",
    oracle=_decomp_sql("orders", "dayofweek({x}) + 1"),
)
def classical_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue: centered
    7-day moving-average trend, per-day-of-week seasonal index
    (mean detrended value) and the within-DOW remainder spread — the
    Box-Jenkins preprocessing step whose seasonal indexes justify (or
    refute) weekday effects before modeling. The trend division never
    happens: detrended values ride as exact 7x - sum7 integer cents, so
    the per-DOW statistics are deterministic single expressions.

    Scale: daily groupBy then one calendar-bounded ordered window and a
    7-group reduce. Public method: classical seasonal decomposition
    (Persons 1919 lineage)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "cd_orders"
    )
    return spark.sql(_decomp_sql("cd_orders", "dayofweek({x})"))


def _page_hinkley_sql(orders: str) -> str:
    """Shared Page-Hinkley SQL body. Residuals against the RUNNING mean
    use one double division of exact integers per row; the PH walk and
    its prefix minimum are ordered-window accumulations (deterministic
    sequential adds); the argmax pick is rank-based with a date
    tiebreak."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders} GROUP BY 1
    ),
    walked AS (
        SELECT d, cents,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
               CAST(SUM(cents) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cs
        FROM daily
    ),
    resid AS (
        SELECT d, t,
               cents - CAST(cs AS DOUBLE) / t AS r
        FROM walked
    ),
    ph AS (
        SELECT d, t,
               SUM(r) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u
        FROM resid
    ),
    exc AS (
        SELECT d, t, u,
               u - MIN(u) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS excursion
        FROM ph
    ),
    picked AS (
        SELECT d, t, excursion,
               ROW_NUMBER() OVER (ORDER BY excursion DESC, d) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM exc
    )
    SELECT n AS n_days,
           d AS peak_date,
           t AS peak_index,
           excursion / 100 AS max_excursion_dollars
    FROM picked WHERE rk = 1
    """


@register("page_hinkley_drift", oracle=_page_hinkley_sql("orders"))
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift statistic over daily revenue: the cumulative
    sum of residuals against the RUNNING mean, tracked against its
    prefix minimum — the sequential mean-shift detector (the online
    counterpart of cusum_changepoint_day's retrospective scan; PH's
    running-mean residual adapts to slow drift where global-mean CUSUM
    does not). Reports the peak excursion and its date; thresholding is
    the caller's policy knob. Ordered-window accumulations only —
    deterministic on both engines.

    Scale: calendar-bounded windows over the daily grid. Public
    method: Page 1954; Hinkley 1971."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ph_orders"
    )
    return spark.sql(_page_hinkley_sql("ph_orders"))


def _hurst_sql(orders: str) -> str:
    """Shared R/S Hurst SQL body. Per block-size branch (8/16/32/64, a
    UNION ALL over literals): b-scaled deviations (b*x - S_b) keep the
    within-block cumulative walk exact BIGINT; R/S per block is one IEEE
    expression; per-size means and the final log-log OLS use a 4-column
    PIVOT (fixed expression order — no float aggregation ordering
    anywhere)."""
    branches = "\n        UNION ALL ".join(
        f"""SELECT {b} AS b, block_id, pos, cents,
               CAST(SUM(cents) OVER (PARTITION BY block_id) AS BIGINT)
                   AS sb,
               SUM(CAST(cents AS DECIMAL(38,0)) * cents)
                   OVER (PARTITION BY block_id) AS sbb,
               CAST(COUNT(*) OVER (PARTITION BY block_id) AS BIGINT)
                   AS cb
        FROM (SELECT CAST(FLOOR((rn - 1) / {b}.0) AS BIGINT) AS block_id,
                     rn - 1 - {b} * CAST(FLOOR((rn - 1) / {b}.0) AS BIGINT)
                         AS pos,
                     cents, rn
              FROM indexed) i{b}"""
        for b in (8, 16, 32, 64)
    )
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders} GROUP BY 1
    ),
    indexed AS (
        SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM daily
    ),
    blocked AS (
        {branches}
    ),
    walked AS (
        SELECT b, block_id, sb, sbb, cb,
               CAST(SUM(b * cents - sb) OVER (PARTITION BY b, block_id
                    ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumdev
        FROM blocked WHERE cb = b
    ),
    per_block AS (
        SELECT b, block_id,
               (MAX(cumdev) - CAST(MIN(LEAST(cumdev, 0)) AS DOUBLE))
                   / (b * sqrt((b * CAST(MAX(sbb) AS DOUBLE)
                                - CAST(MAX(sb) AS DOUBLE) * MAX(sb))) / b)
                   AS rs
        FROM walked
        GROUP BY b, block_id, sb
        HAVING b * MAX(sbb) > CAST(MAX(sb) AS DOUBLE) * MAX(sb)
    ),
    ordered AS (
        SELECT b, rs,
               ROW_NUMBER() OVER (PARTITION BY b ORDER BY block_id) AS rn2,
               CAST(COUNT(*) OVER (PARTITION BY b) AS BIGINT) AS nb,
               SUM(rs) OVER (PARTITION BY b ORDER BY block_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_rs
        FROM per_block
    ),
    mean_rs AS (
        SELECT b, cum_rs / nb AS mrs, nb
        FROM ordered WHERE rn2 = nb
    ),
    pivoted AS (
        SELECT MAX(CASE WHEN b = 8 THEN ln(mrs) END) AS y8,
               MAX(CASE WHEN b = 16 THEN ln(mrs) END) AS y16,
               MAX(CASE WHEN b = 32 THEN ln(mrs) END) AS y32,
               MAX(CASE WHEN b = 64 THEN ln(mrs) END) AS y64,
               MAX(CASE WHEN b = 8 THEN nb END) AS nb8,
               MAX(CASE WHEN b = 64 THEN nb END) AS nb64
        FROM mean_rs
    )
    SELECT nb8 AS n_blocks_8, nb64 AS n_blocks_64,
           ((ln(CAST(8 AS DOUBLE)) * y8 + ln(CAST(16 AS DOUBLE)) * y16
             + ln(CAST(32 AS DOUBLE)) * y32 + ln(CAST(64 AS DOUBLE)) * y64)
            - (ln(CAST(8 AS DOUBLE)) + ln(CAST(16 AS DOUBLE))
               + ln(CAST(32 AS DOUBLE)) + ln(CAST(64 AS DOUBLE)))
              * (y8 + y16 + y32 + y64) / 4)
           / ((ln(CAST(8 AS DOUBLE)) * ln(CAST(8 AS DOUBLE))
               + ln(CAST(16 AS DOUBLE)) * ln(CAST(16 AS DOUBLE))
               + ln(CAST(32 AS DOUBLE)) * ln(CAST(32 AS DOUBLE))
               + ln(CAST(64 AS DOUBLE)) * ln(CAST(64 AS DOUBLE)))
              - (ln(CAST(8 AS DOUBLE)) + ln(CAST(16 AS DOUBLE))
                 + ln(CAST(32 AS DOUBLE)) + ln(CAST(64 AS DOUBLE)))
                * (ln(CAST(8 AS DOUBLE)) + ln(CAST(16 AS DOUBLE))
                   + ln(CAST(32 AS DOUBLE)) + ln(CAST(64 AS DOUBLE))) / 4)
               AS hurst_exponent
    FROM pivoted
    """


@register("hurst_exponent", oracle=_hurst_sql("orders"))
def hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range (R/S) analysis
    over block sizes 8/16/32/64: H ~ 0.5 = random walk increments,
    H > 0.5 = long-range persistence — the memory diagnostic that
    complements the ACF's short-lag view. Within-block cumulative
    deviations ride as exact b-scaled BIGINTs; per-size means use
    ordered accumulation and the final log-log OLS is a 4-point pivot
    with a fixed expression order, so no float sum anywhere depends on
    partitioning.

    Scale: four calendar-grid-bounded window passes (one per block
    size) over the ~2.4k-day series; data-sized work is only the daily
    groupBy. Public method: Hurst 1951; Mandelbrot & Wallis 1969."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "hx_orders"
    )
    return spark.sql(_hurst_sql("hx_orders"))
