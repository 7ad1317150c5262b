"""dbt-macro-style data-quality checks, batch 2 (VERDICT r01 gap #6;
reference dbt/macros/data_quality_checks.sql:1-352 + the dbt accepted_values
/ unique schema tests its models use).

Batch 1 (referential_integrity, freshness_by_type, rowcount_anomaly) lives
in plans/ml_analytics.py:447-520. This module adds:

- accepted_values_check  dbt's accepted_values: distinct out-of-domain
  values with counts, per (table, column).
- uniqueness_check       test_duplicate_records as a per-key summary:
  total vs distinct vs duplicated rows for each declared business key.
- value_range_check      distribution guard: per numeric rule, violation
  count + observed min/max (exact order statistics).

All three are single-pass grouped aggregations (map-side combined), so they
cost one scan of each table at any scale; none collects row-level data to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from .catalog import register

# (table, column, accepted values) — events deliberately excludes 'error'
# so the check demonstrates a real out-of-domain hit on the fixture data.
ACCEPTED_VALUES: list[tuple[str, str, tuple[str, ...]]] = [
    ("events", "event_type", ("click", "signup", "view", "purchase")),
    ("orders", "o_orderstatus", ("O", "F", "P")),
    ("lineitem", "l_returnflag", ("A", "N", "R")),
]


def _sql_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


@register(
    "accepted_values_check",
    oracle=f"""
    SELECT 'events' AS table_name, 'event_type' AS column_name,
           event_type AS invalid_value, CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE event_type NOT IN ({_sql_list(ACCEPTED_VALUES[0][2])})
    GROUP BY 3
    UNION ALL
    SELECT 'orders', 'o_orderstatus', o_orderstatus, CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_orderstatus NOT IN ({_sql_list(ACCEPTED_VALUES[1][2])})
    GROUP BY 3
    UNION ALL
    SELECT 'lineitem', 'l_returnflag', l_returnflag, CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_returnflag NOT IN ({_sql_list(ACCEPTED_VALUES[2][2])})
    GROUP BY 3
    """,
)
def accepted_values_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt accepted_values over three declared domains: every distinct
    out-of-domain value with its row count. NULLs are not violations (dbt
    semantics: accepted_values ignores NULL; pair with not_null)."""
    parts = []
    for table, column, accepted in ACCEPTED_VALUES:
        df = load_table(spark, sf_dir, table)
        parts.append(
            df.filter(~F.col(column).isin(*accepted) & F.col(column).isNotNull())
            .groupBy(F.col(column).alias("invalid_value"))
            .agg(F.count("*").alias("n"))
            .select(
                F.lit(table).alias("table_name"),
                F.lit(column).alias("column_name"),
                "invalid_value",
                "n",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# (table, key columns) — business keys the warehouse declares unique.
UNIQUE_KEYS: list[tuple[str, tuple[str, ...]]] = [
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
]


@register(
    "uniqueness_check",
    oracle="""
    SELECT 'orders' AS table_name, 'o_orderkey' AS key_columns,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS duplicate_rows
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'l_orderkey,l_linenumber', CAST(COUNT(*) AS BIGINT),
           CAST(cnt AS BIGINT), CAST(COUNT(*) - cnt AS BIGINT)
    FROM lineitem,
         (SELECT COUNT(*) AS cnt
          FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
    GROUP BY cnt
    UNION ALL
    SELECT 'events', 'event_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT event_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents', 'doc_id', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
    FROM documents
    """,
)
def uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt test_duplicate_records as a per-key summary
    (data_quality_checks.sql:76-83). The composite lineitem key genuinely
    has ~1.4k duplicate keys in the fixture, so this check is non-vacuous.
    count_distinct over a composite key = distinct-aggregate on a struct —
    one shuffle per table, no row-level collection."""
    parts = []
    for table, keys in UNIQUE_KEYS:
        df = load_table(spark, sf_dir, table)
        key_struct = F.struct(*[F.col(k) for k in keys])
        parts.append(
            df.agg(
                F.count("*").alias("total_rows"),
                F.countDistinct(key_struct).alias("distinct_keys"),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(",".join(keys)).alias("key_columns"),
                "total_rows",
                "distinct_keys",
                (F.col("total_rows") - F.col("distinct_keys")).alias("duplicate_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "value_range_check",
    oracle="""
    SELECT 'lineitem.l_quantity' AS target, 'between 1 and 50' AS rule,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS violations,
           MIN(l_quantity) AS min_observed, MAX(l_quantity) AS max_observed
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_discount', 'between 0 and 0.1',
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
                AS BIGINT),
           MIN(l_discount), MAX(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_extendedprice', 'greater than 0',
           CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'events.value', 'not negative',
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
           MIN(value), MAX(value)
    FROM events
    """,
)
def value_range_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/value-range guard (the dbt business-rule-validation
    pattern, data_quality_checks.sql:96-103): declared numeric invariants →
    violation counts + observed exact min/max. Conditional sums fuse into
    one aggregate per table (both lineitem rules share one scan under
    Catalyst's repeated-subplan reuse)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    def rule(df, target, rule_desc, viol_cond, col):
        return df.agg(
            F.sum(F.when(viol_cond, 1).otherwise(0)).cast("bigint").alias("violations"),
            F.min(col).cast("double").alias("min_observed"),
            F.max(col).cast("double").alias("max_observed"),
        ).select(
            F.lit(target).alias("target"),
            F.lit(rule_desc).alias("rule"),
            "violations",
            "min_observed",
            "max_observed",
        )

    q = F.col("l_quantity")
    d = F.col("l_discount")
    p = F.col("l_extendedprice")
    v = F.col("value")
    out = rule(lineitem, "lineitem.l_quantity", "between 1 and 50",
               (q < 1) | (q > 50), q)
    out = out.unionByName(
        rule(lineitem, "lineitem.l_discount", "between 0 and 0.1",
             (d < 0) | (d > 0.1), d)
    )
    out = out.unionByName(
        rule(lineitem, "lineitem.l_extendedprice", "greater than 0", p <= 0, p)
    )
    out = out.unionByName(rule(events, "events.value", "not negative", v < 0, v))
    return out


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        -- FLOOR before the BIGINT cast: DuckDB's double->int cast rounds,
        -- Spark's truncates.
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT o.digit, o.n_obs,
           round(CAST(o.n_obs AS DOUBLE) / t.n, 6) AS obs_freq,
           round(log10(1.0 + 1.0 / o.digit), 6) AS benford_freq,
           round(power(CAST(o.n_obs AS DOUBLE) / t.n
                       - log10(1.0 + 1.0 / o.digit), 2)
                 / log10(1.0 + 1.0 / o.digit), 6) AS chi2_term
    FROM obs o CROSS JOIN tot t
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic
    data-quality test for fabricated or truncated numeric columns
    (extending the dbt distribution checks; reference analog: the
    value-range guards of dbt/macros/data_quality_checks.sql, which stop
    at min/max). Emits per-digit observed vs expected log10(1+1/d)
    frequency and the chi-square contribution; a synthetic uniform price
    column fails loudly (uniform [1k,500k] is nothing like Benford),
    which is exactly what it should do on this testdata. Integer first
    digit via string head of the truncated BIGINT — identical in both
    engines; all ratios are divisions of deterministic values."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    freq = F.col("n_obs").cast("double") / F.col("n")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(freq, 6).alias("obs_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(F.pow(freq - benford, F.lit(2)) / benford, 6).alias(
            "chi2_term"
        ),
    )


@register(
    "mad_outliers",
    oracle="""
    WITH med AS (
        SELECT l_returnflag,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
                   AS med
        FROM lineitem GROUP BY 1
    ),
    dev AS (
        SELECT l.l_returnflag, l.l_extendedprice, m.med,
               abs(l.l_extendedprice - m.med) AS adev
        FROM lineitem l JOIN med m USING (l_returnflag)
    ),
    mad AS (
        SELECT l_returnflag,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           d.med AS median_price,
           m.mad,
           CAST(SUM(CASE WHEN abs(d.l_extendedprice - d.med)
                              > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY 1, 3, 4
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    quality check that survives the heavy tails that break the 3-sigma
    rule (functions/quality.py:outlier_3sigma is the parametric sibling;
    both stay registered so users can compare). Exact per-group medians
    come from the cume_dist >= 0.5 crossing (the percentile_disc
    convention, same trick as histogram_quantile_approx), so no
    approxQuantile nondeterminism enters the oracle compare. Two window
    passes + one join — at scale each is a single shuffle on the group
    key, and the 1.4826 consistency constant makes MAD sigma-comparable
    under normality."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )

    def disc_median(df, val, out):
        w = Window.partitionBy("l_returnflag").orderBy(val)
        return (
            df.withColumn("_cd", F.cume_dist().over(w))
            .filter(F.col("_cd") >= 0.5)
            .groupBy("l_returnflag")
            .agg(F.min(val).alias(out))
        )

    med = disc_median(li, "l_extendedprice", "med")
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "adev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = disc_median(dev, "adev", "mad")
    joined = dev.join(F.broadcast(mad), "l_returnflag")
    is_out = F.abs(F.col("l_extendedprice") - F.col("med")) > 3 * 1.4826 * F.col(
        "mad"
    )
    return joined.groupBy(
        "l_returnflag", F.col("med").alias("median_price"), "mad"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
    ).select("l_returnflag", "n", "median_price", "mad", "n_outliers")


@register(
    "monotonicity_check",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               lag(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_id
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_id IS NOT NULL AND event_id < prev_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
           SUM(CASE WHEN prev_id IS NOT NULL AND event_id < prev_id
                    THEN 1 ELSE 0 END) = 0 AS is_monotonic
    FROM seq GROUP BY 1
    """,
)
def monotonicity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style monotonicity test: within each user's time-ordered
    stream, event ids must be non-decreasing (an inversion means
    out-of-order ingestion or clock skew upstream). One window pass with
    full tiebreakers, then a per-user rollup — the generic template for
    'ordered by X, monotone in Y' assertions on append-only tables."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "ts", "event_id", F.lag("event_id").over(w).alias("prev_id")
    )
    inv = F.sum(
        F.when(
            F.col("prev_id").isNotNull() & (F.col("event_id") < F.col("prev_id")),
            1,
        ).otherwise(0)
    )
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        inv.alias("n_inversions"),
        (inv == 0).alias("is_monotonic"),
    )


@register(
    "distribution_check",
    oracle="""
    WITH ev AS (
        SELECT 'events.event_type' AS check_name, event_type AS category,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 2
    ),
    op AS (
        SELECT 'orders.o_orderpriority' AS check_name, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 2
    ),
    allc AS (SELECT * FROM ev UNION ALL SELECT * FROM op),
    tot AS (
        SELECT check_name,
               CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_categories
        FROM allc GROUP BY 1
    )
    SELECT a.check_name, a.category, a.n,
           CAST(a.n AS DOUBLE) / t.total AS observed_share,
           1.0 / t.n_categories AS expected_share,
           abs(CAST(a.n AS DOUBLE) / t.total - 1.0 / t.n_categories)
               <= 0.15 AS passed
    FROM allc a JOIN tot t USING (check_name)
    """,
)
def distribution_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style distribution test (VERDICT r01 gap #6, last of the
    quality-check batch; ref dbt/macros/data_quality_checks.sql
    distribution guards): each declared categorical column's observed
    share per value is compared against a uniform expectation with a
    +/-15pp tolerance. A failing row is the drift signal that a feed
    started over- or under-producing one category. Two grouped counts +
    one broadcast-size join on check totals; shares are single divisions
    of exact integers, so both engines agree bitwise."""
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("category"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.lit("events.event_type").alias("check_name"), "category", "n")
    )
    op = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("category"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.lit("orders.o_orderpriority").alias("check_name"), "category", "n"
        )
    )
    allc = ev.unionAll(op)
    tot = allc.groupBy("check_name").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_categories"),
    )
    joined = allc.join(F.broadcast(tot), "check_name")
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.lit(1.0) / F.col("n_categories")
    return joined.select(
        "check_name",
        "category",
        "n",
        obs.alias("observed_share"),
        exp.alias("expected_share"),
        (F.abs(obs - exp) <= F.lit(0.15)).alias("passed"),
    )


@register(
    "table_checksum_audit",
    oracle="""
    WITH rows_h AS (
        SELECT c.c_nationkey,
               ('0x' || substr(md5(concat_ws('|',
                   COALESCE(CAST(o.o_orderkey AS VARCHAR), chr(1)),
                   COALESCE(CAST(o.o_custkey AS VARCHAR), chr(1)),
                   COALESCE(o.o_orderstatus, chr(1)),
                   COALESCE(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                                 AS VARCHAR), chr(1)),
                   COALESCE(CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR),
                            chr(1)),
                   COALESCE(o.o_orderpriority, chr(1))
               )), 1, 12))::BIGINT AS h
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS checksum
    FROM rows_h GROUP BY 1
    """,
)
def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum per partition key — the
    reconciliation primitive behind migration/replication audits ("did
    the copy preserve every row?"): each row folds to a 48-bit slice of
    the md5 of its canonical pipe-joined representation, and the
    per-nation checksum is the exact decimal sum of those hashes, so any
    dropped, duplicated, or mutated row changes the total while row order
    and partitioning cannot (sums commute). Canonicalization pins the
    formatting (DECIMAL(18,2) money, DATE dates) and encodes NULL as an
    explicit chr(1) sentinel inside concat_ws on BOTH engines — without
    the sentinel Spark's concat_ws silently skips NULLs (colliding
    ('a', NULL) with ('a')) while a '||' chain would propagate NULL to a
    NULL hash the SUM skips, so the two engines would checksum nullable
    inputs differently; the sum accumulates in DECIMAL(38,0) on both sides
    because a bigint sum would overflow (silently in Spark, promoted in
    DuckDB — exactly the cross-engine trap verify_local's type gate now
    catches). One map-side-combined shuffle at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sentinel = F.lit("\x01")
    row_str = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), sentinel),
        F.coalesce(F.col("o_custkey").cast("string"), sentinel),
        F.coalesce(F.col("o_orderstatus"), sentinel),
        F.coalesce(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            sentinel,
        ),
        F.coalesce(
            F.col("o_orderdate").cast("date").cast("string"), sentinel
        ),
        F.coalesce(F.col("o_orderpriority"), sentinel),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast("bigint")
    return (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_nationkey", h.alias("h"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("checksum"),
        )
    )


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM digits),
    obs AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM digits GROUP BY 1
    ),
    scored AS (
        SELECT g.d,
               COALESCE(o.cnt, 0) AS cnt,
               CAST(COALESCE(o.cnt, 0) AS DOUBLE) / n.total AS observed_p,
               ln(1.0 + 1.0 / g.d) / ln(10.0) AS benford_p
        FROM (SELECT unnest(range(1, 10)) AS d) g
        LEFT JOIN obs o USING (d)
        CROSS JOIN n
    )
    SELECT CAST(d AS INT) AS first_digit,
           cnt,
           round(observed_p, 6) AS observed_p,
           round(benford_p, 6) AS benford_p,
           round((SELECT total FROM n)
                 * (observed_p - benford_p) * (observed_p - benford_p)
                 / benford_p, 6) AS chi2_term,
           round(SUM((SELECT total FROM n)
                     * (observed_p - benford_p) * (observed_p - benford_p)
                     / benford_p) OVER (), 6) AS chi2_total
    FROM scored
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-numbers screen (dbt-style data audit; a synthetic or
    manipulated money column deviates from P(d) = log10(1 + 1/d)): the
    leading digit is taken from the DECIMAL(18,2) string rendering
    (identical formatting on both engines; values < 1 excluded so the
    first character is always a digit), observed shares compare against
    the Benford distribution with per-digit chi-square terms and the
    total statistic on every row. Note this DATASET's totals are
    range-uniform, not scale-invariant, so the audit correctly reports a
    huge chi2 — the operator's job is to measure, not to pass.

    Scale: one scan, one 9-key groupBy; the chi-square runs over the
    9-row digit dictionary."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digits = orders.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("d")
    )
    n = digits.agg(F.count("*").cast("bigint").alias("total"))
    obs = digits.groupBy("d").agg(F.count("*").cast("bigint").alias("cnt"))
    grid = spark.range(1, 10).select(F.col("id").alias("d"))
    benford_p = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    scored = (
        grid.join(F.broadcast(obs), "d", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            (F.coalesce("cnt", F.lit(0)).cast("double") / F.col("total")).alias(
                "observed_p"
            ),
            benford_p.alias("benford_p"),
            "total",
        )
    )
    chi_term = (
        F.col("total")
        * (F.col("observed_p") - F.col("benford_p"))
        * (F.col("observed_p") - F.col("benford_p"))
        / F.col("benford_p")
    )
    from pyspark.sql.window import Window

    return scored.select(
        F.col("d").cast("int").alias("first_digit"),
        "cnt",
        F.round("observed_p", 6).alias("observed_p"),
        F.round("benford_p", 6).alias("benford_p"),
        F.round(chi_term, 6).alias("chi2_term"),
        F.round(
            F.sum(chi_term).over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            6,
        ).alias("chi2_total"),
    )


@register(
    "chisq_independence",
    oracle="""
    WITH cells AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    margins AS (
        SELECT segment, priority, obs,
               CAST(SUM(obs) OVER (PARTITION BY segment) AS BIGINT) AS row_tot,
               CAST(SUM(obs) OVER (PARTITION BY priority) AS BIGINT) AS col_tot,
               CAST(SUM(obs) OVER () AS BIGINT) AS n
        FROM cells
    ),
    contrib AS (
        SELECT segment, priority, obs, row_tot, col_tot, n,
               CAST(row_tot AS DOUBLE) * col_tot / n AS expected
        FROM margins
    ),
    scored AS (
        SELECT segment, priority, obs, expected,
               (obs - expected) * (obs - expected) / expected AS cell_chi2,
               n, row_tot, col_tot
        FROM contrib
    )
    SELECT segment, priority, obs,
           round(expected, 6) AS expected,
           round(cell_chi2, 6) AS cell_chi2,
           round(SUM(cell_chi2) OVER (), 6) AS chi2_total,
           round(sqrt(SUM(cell_chi2) OVER ()
                      / (ANY_VALUE(n) OVER ()
                         * least(CAST(COUNT(DISTINCT segment) OVER () AS BIGINT) - 1,
                                 CAST(COUNT(DISTINCT priority) OVER () AS BIGINT) - 1))),
                 6) AS cramers_v
    FROM scored
    """,
)
def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence on the segment x priority
    contingency table, with per-cell contributions and Cramér's V — the
    classic 'are these two categoricals related' diagnostic that
    complements the distribution-shape monitors (PSI/KS/Benford) with a
    bivariate one; per-cell chi2 also ranks WHICH combinations drive the
    dependence. Expected counts are products of exact integer margins
    divided once; the 25-cell table makes every window frame-bounded.
    One fact-sized aggregate, then vocabulary-sized windows."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cells = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("bigint").alias("obs"))
    )
    wr = Window.partitionBy("segment")
    wc = Window.partitionBy("priority")
    wa = Window.partitionBy()
    m = cells.select(
        "segment",
        "priority",
        "obs",
        F.sum("obs").over(wr).cast("bigint").alias("row_tot"),
        F.sum("obs").over(wc).cast("bigint").alias("col_tot"),
        F.sum("obs").over(wa).cast("bigint").alias("n"),
    )
    expected = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    scored = m.select(
        "segment",
        "priority",
        "obs",
        expected.alias("expected"),
        (
            (F.col("obs") - expected) * (F.col("obs") - expected) / expected
        ).alias("cell_chi2"),
        "n",
    )
    # COUNT(DISTINCT) over a window is unsupported in Spark — the table
    # dimensions come in as a broadcast scalar instead.
    dims = cells.agg(
        F.count_distinct("segment").cast("bigint").alias("n_seg"),
        F.count_distinct("priority").cast("bigint").alias("n_pri"),
    )
    chi2_tot = F.sum("cell_chi2").over(wa)
    k = F.least(F.col("n_seg") - 1, F.col("n_pri") - 1)
    return scored.crossJoin(F.broadcast(dims)).select(
        "segment",
        "priority",
        "obs",
        F.round("expected", 6).alias("expected"),
        F.round("cell_chi2", 6).alias("cell_chi2"),
        F.round(chi2_tot, 6).alias("chi2_total"),
        F.round(F.sqrt(chi2_tot / (F.first("n").over(wa) * k)), 6).alias(
            "cramers_v"
        ),
    )


@register(
    "welch_ttest_segments",
    oracle="""
    WITH pop AS (
        SELECT c_mktsegment AS seg,
               CAST(o_totalprice AS DECIMAL(18,2)) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    m AS (
        SELECT seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx
        FROM pop GROUP BY 1
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN seg = 'AUTOMOBILE' THEN n END) AS n1,
            MAX(CASE WHEN seg = 'AUTOMOBILE' THEN sx END) AS sx1,
            MAX(CASE WHEN seg = 'AUTOMOBILE' THEN sxx END) AS sxx1,
            MAX(CASE WHEN seg = 'BUILDING' THEN n END) AS n2,
            MAX(CASE WHEN seg = 'BUILDING' THEN sx END) AS sx2,
            MAX(CASE WHEN seg = 'BUILDING' THEN sxx END) AS sxx2
        FROM m
    ),
    stats AS (
        SELECT n1, n2,
               sx1 / n1 AS m1, sx2 / n2 AS m2,
               (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
               (sxx2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
        FROM wide
    )
    SELECT n1, n2, m1, m2,
           m1 - m2 AS mean_diff,
           (m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS t_stat,
           (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
           / ((v1 / n1) * (v1 / n1) / (n1 - 1)
              + (v2 / n2) * (v2 / n2) / (n2 - 1)) AS welch_df
    FROM stats
    """,
)
def welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test comparing mean order value between
    two market segments — the A/B-comparison workhorse, computed entirely
    from per-group moment sums (n, sum, sum-of-squares in exact DECIMAL)
    so the fact table is touched once with map-side combine and the test
    statistic plus Welch-Satterthwaite df are closed forms on identical
    doubles (unrounded, half-tie rule). Complements chisq_independence
    (categorical x categorical) with the numeric-vs-binary test."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    pop = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        )
    )
    m = pop.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxx"),
    )

    def pick(col, seg):
        return F.max(F.when(F.col("seg") == seg, F.col(col)))

    wide = m.agg(
        pick("n", "AUTOMOBILE").alias("n1"),
        pick("sx", "AUTOMOBILE").alias("sx1"),
        pick("sxx", "AUTOMOBILE").alias("sxx1"),
        pick("n", "BUILDING").alias("n2"),
        pick("sx", "BUILDING").alias("sx2"),
        pick("sxx", "BUILDING").alias("sxx2"),
    )
    m1 = F.col("sx1") / F.col("n1")
    m2 = F.col("sx2") / F.col("n2")
    v1 = (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    se2_1 = v1 / F.col("n1")
    se2_2 = v2 / F.col("n2")
    return wide.select(
        "n1",
        "n2",
        m1.alias("m1"),
        m2.alias("m2"),
        (m1 - m2).alias("mean_diff"),
        ((m1 - m2) / F.sqrt(se2_1 + se2_2)).alias("t_stat"),
        (
            (se2_1 + se2_2)
            * (se2_1 + se2_2)
            / (
                se2_1 * se2_1 / (F.col("n1") - 1)
                + se2_2 * se2_2 / (F.col("n2") - 1)
            )
        ).alias("welch_df"),
    )


@register(
    "diff_in_diff",
    oracle="""
    WITH yr AS (
        SELECT CAST(year(MAX(o_orderdate)) - 1 AS BIGINT) AS cy FROM orders
    ),
    pop AS (
        SELECT (c_mktsegment = 'AUTOMOBILE') AS treated,
               (CAST(year(o_orderdate) AS BIGINT) = yr.cy) AS post,
               CAST(o_totalprice AS DECIMAL(18,2)) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        CROSS JOIN yr
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
          AND CAST(year(o_orderdate) AS BIGINT) IN (yr.cy - 1, yr.cy)
    ),
    cells AS (
        SELECT treated, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean_x
        FROM pop GROUP BY 1, 2
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN treated AND post THEN mean_x END) AS t1,
            MAX(CASE WHEN treated AND NOT post THEN mean_x END) AS t0,
            MAX(CASE WHEN NOT treated AND post THEN mean_x END) AS c1,
            MAX(CASE WHEN NOT treated AND NOT post THEN mean_x END) AS c0,
            CAST(SUM(n) AS BIGINT) AS n_total
        FROM cells
    )
    SELECT n_total, t0, t1, c0, c1,
           t1 - t0 AS treated_delta,
           c1 - c0 AS control_delta,
           (t1 - t0) - (c1 - c0) AS did_estimate
    FROM wide
    """,
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator — the canonical quasi-
    experimental effect measure: the treated segment's before/after change
    in mean order value minus the control segment's change over the same
    two years, which nets out the common time trend. The whole 2x2 design
    reduces to four cell means from one pushed-down aggregate (exact
    DECIMAL sums divided once, unrounded doubles) — at any fact scale the
    estimator is a single map-side-combined pass."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    yr = orders.agg(
        (F.year(F.max("o_orderdate")) - 1).cast("bigint").alias("cy")
    )
    y = F.year("o_orderdate").cast("bigint")
    pop = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .crossJoin(F.broadcast(yr))
        .filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
            & ((y == F.col("cy") - 1) | (y == F.col("cy")))
        )
        .select(
            (F.col("c_mktsegment") == "AUTOMOBILE").alias("treated"),
            (y == F.col("cy")).alias("post"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        )
    )
    cells = pop.groupBy("treated", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum("x").cast("double") / F.count("*")).alias("mean_x"),
    )

    def cell(t, p):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean_x"))
        )

    wide = cells.agg(
        cell(True, True).alias("t1"),
        cell(True, False).alias("t0"),
        cell(False, True).alias("c1"),
        cell(False, False).alias("c0"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        "t0",
        "t1",
        "c0",
        "c1",
        (F.col("t1") - F.col("t0")).alias("treated_delta"),
        (F.col("c1") - F.col("c0")).alias("control_delta"),
        (
            (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0"))
        ).alias("did_estimate"),
    )


def _fdr_bh_sql(orders: str, customer: str, nation: str) -> str:
    """Shared BH-FDR SQL body (identical text on both engines).

    Normal CDF via the Abramowitz-Stegun 7.1.26 polynomial — elementary
    ops only, written once, so both engines produce identical doubles;
    the BH step compares ordered p-values against i/m * alpha."""
    phi = (
        "(1.0 - (exp(0.0 - z2 * z2 / 2.0) / 2.5066282746310002)"
        " * t * (0.319381530 + t * ((0.0 - 0.356563782)"
        " + t * (1.781477937 + t * ((0.0 - 1.821255978)"
        " + t * 1.330274429)))))"
    )
    return f"""
    WITH pop AS (
        SELECT n_nationkey AS nk, n_name AS nation,
               CAST(o_totalprice AS DECIMAL(18,2)) AS x
        FROM {orders}
        JOIN {customer} ON o_custkey = c_custkey
        JOIN {nation} ON c_nationkey = n_nationkey
    ),
    per AS (
        SELECT nk, nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx
        FROM pop GROUP BY 1, 2
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(CAST(sx AS DECIMAL(38,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(sxx AS DECIMAL(38,4))) AS DOUBLE) AS sxx
        FROM per
    ),
    z AS (
        SELECT p.nation,
               (p.sx / p.n - (t.sx - p.sx) / (t.n - p.n))
               / sqrt(((p.sxx - p.sx * p.sx / p.n) / (p.n - 1)) / p.n
                      + (((t.sxx - p.sxx)
                          - (t.sx - p.sx) * (t.sx - p.sx) / (t.n - p.n))
                         / (t.n - p.n - 1)) / (t.n - p.n)) AS zval
        FROM per p CROSS JOIN tot t
    ),
    pv AS (
        SELECT nation, zval,
               2.0 * (1.0 - {phi.replace("z2", "ABS(zval)")
                                .replace("t ", "(1.0 / (1.0 + 0.2316419 * ABS(zval))) ")}) AS p_raw
        FROM z
    ),
    ranked AS (
        SELECT nation, zval, p_raw,
               CAST(row_number() OVER (ORDER BY p_raw, nation) AS BIGINT)
                   AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM pv
    ),
    cutoff AS (
        SELECT COALESCE(MAX(CASE WHEN p_raw <= CAST(0.05 AS DOUBLE) * i / m
                                 THEN i END), 0) AS k
        FROM ranked
    )
    SELECT r.nation, r.zval AS z_stat, r.p_raw AS p_value,
           CAST(r.i AS BIGINT) AS p_rank,
           CAST(0.05 AS DOUBLE) * r.i / r.m AS bh_threshold,
           r.i <= c.k AS significant_fdr05
    FROM ranked r CROSS JOIN cutoff c
    """


@register(
    "fdr_bh_correction",
    oracle=_fdr_bh_sql("orders", "customer", "nation"),
)
def fdr_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a family of 25 hypothesis
    tests (each nation's order-value mean vs the rest, Welch z from
    DECIMAL-exact moment sums): raw two-sided p-values from the
    Abramowitz-Stegun normal-CDF polynomial, ranked, and compared to the
    step-up boundary i/m * 0.05; everything at or below the largest
    passing rank is significant. This is the multiple-comparisons
    discipline the single-test estimators (welch_ttest_segments,
    ab_test_zscore, chisq_*) hand off to when you test 25 segments at
    once and 1-in-20 false positives stop being acceptable.

    Shape: one fact pass to per-nation moments, complement moments by
    total-minus-group (no second pass), a 25-row window for the BH step.
    The CDF polynomial is written once and shared, so p-values are
    bit-identical; no rounding anywhere."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bh_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "bh_customer"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("bh_nation")
    return spark.sql(_fdr_bh_sql("bh_orders", "bh_customer", "bh_nation"))


def _gtest_sql(orders: str) -> str:
    """Shared G-test SQL body. Observed/expected counts are exact
    integers (expected kept as the exact rational o_r*o_c/N inside the
    log); G and chi-square are sums of ~45 log/ratio terms of exact
    integers — deterministic doubles, emitted unrounded."""
    return f"""
    WITH obs AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM {orders} GROUP BY 1, 2
    ),
    margins AS (
        SELECT s, p, o,
               CAST(SUM(o) OVER (PARTITION BY s) AS BIGINT) AS row_n,
               CAST(SUM(o) OVER (PARTITION BY p) AS BIGINT) AS col_n,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM obs
    ),
    dims AS (
        SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT p) AS BIGINT) AS c
        FROM obs
    ),
    -- the G / chi-square cell terms are doubles; summing them with a
    -- plain aggregate is order-dependent across partitionings (the
    -- known float-sum flake class), so accumulate in pinned (s, p)
    -- window order and take the final row
    walked AS (
        SELECT n,
               SUM(o * ln(o * CAST(n AS DOUBLE)
                          / (row_n * CAST(col_n AS DOUBLE))))
                   OVER (ORDER BY s, p
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS g_half,
               SUM(power(o - row_n * CAST(col_n AS DOUBLE) / n, 2)
                   / (row_n * CAST(col_n AS DOUBLE) / n))
                   OVER (ORDER BY s, p
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS chi2,
               ROW_NUMBER() OVER (ORDER BY s, p) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_cells
        FROM margins
    )
    SELECT
        (SELECT r FROM dims) AS n_rows,
        (SELECT c FROM dims) AS n_cols,
        ((SELECT r FROM dims) - 1) * ((SELECT c FROM dims) - 1) AS dof,
        CAST(n AS BIGINT) AS n_total,
        2 * g_half AS g_statistic,
        chi2 AS chi_square
    FROM walked WHERE rk = n_cells
    """


@register("gtest_independence", oracle=_gtest_sql("orders"))
def gtest_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood ratio) and Pearson chi-square of
    independence between order status and order priority — the
    categorical-association check a data-quality layer runs before
    trusting a segmentation (dbt-style statistical test macro). Zero
    cells contribute zero to G by construction (only observed cells
    appear in the contingency CTE), matching the standard convention.

    Scale: one map-side-combined groupBy over the 3x5 category lattice,
    margins via windows over <=15 rows, single-row output. Reference
    scope: dbt tests / src/analytics quality checks; public method:
    Sokal & Rohlf's G-test."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "gt_orders"
    )
    return spark.sql(_gtest_sql("gt_orders"))


def _spc_sql(orders: str) -> str:
    """Shared Shewhart X-bar/R control-chart SQL body over 7-day
    subgroups. Subgroup sums/ranges are exact integer cents; the chart
    constants for n=7 (A2, D3, D4) are the published Shewhart factors
    as exact decimal literals cast to DOUBLE; grand averages use
    ordered accumulation (no unordered float sums)."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS cents
        FROM {orders} GROUP BY 1
    ),
    indexed AS (
        SELECT cents,
               CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY d) - 1) / 7.0)
                    AS BIGINT) AS sg
        FROM daily
    ),
    subgroups AS (
        SELECT sg,
               CAST(SUM(cents) AS BIGINT) AS s7,
               CAST(MAX(cents) - MIN(cents) AS BIGINT) AS r7,
               CAST(COUNT(*) AS BIGINT) AS n7
        FROM indexed GROUP BY sg
        HAVING COUNT(*) = 7
    ),
    grand AS (
        SELECT sg, s7, r7,
               CAST(SUM(s7) OVER () AS BIGINT) AS ss,
               CAST(SUM(r7) OVER () AS BIGINT) AS sr,
               CAST(COUNT(*) OVER () AS BIGINT) AS k
        FROM subgroups
    )
    SELECT sg AS subgroup,
           CAST(s7 AS DOUBLE) / 7 / 100 AS xbar_dollars,
           CAST(r7 AS DOUBLE) / 100 AS range_dollars,
           CAST(ss AS DOUBLE) / (7 * k) / 100 AS center_line,
           (CAST(ss AS DOUBLE) / (7 * k)
            + CAST(0.419 AS DOUBLE) * (CAST(sr AS DOUBLE) / k)) / 100
               AS ucl_xbar,
           (CAST(ss AS DOUBLE) / (7 * k)
            - CAST(0.419 AS DOUBLE) * (CAST(sr AS DOUBLE) / k)) / 100
               AS lcl_xbar,
           CAST(1.924 AS DOUBLE) * (CAST(sr AS DOUBLE) / k) / 100
               AS ucl_range,
           CAST(0.076 AS DOUBLE) * (CAST(sr AS DOUBLE) / k) / 100
               AS lcl_range,
           CASE WHEN CAST(s7 AS DOUBLE) / 7
                     > CAST(ss AS DOUBLE) / (7 * k)
                       + CAST(0.419 AS DOUBLE) * (CAST(sr AS DOUBLE) / k)
                  OR CAST(s7 AS DOUBLE) / 7
                     < CAST(ss AS DOUBLE) / (7 * k)
                       - CAST(0.419 AS DOUBLE) * (CAST(sr AS DOUBLE) / k)
                THEN 1 ELSE 0 END AS xbar_violation
    FROM grand
    """


@register("spc_control_chart", oracle=_spc_sql("orders"))
def spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X-bar / R control chart over weekly (7-day) subgroups of
    daily revenue: subgroup means and ranges against +/- A2*Rbar control
    limits (A2 = 0.419, D3 = 0.076, D4 = 1.924 — the published Shewhart
    constants for n = 7), flagging out-of-control subgroups — the SPC
    monitoring layer a data-quality process puts on any metric stream.
    All sums are exact integer cents; limits are single expressions.

    Scale: daily groupBy then a subgroup groupBy on the calendar grid.
    Public method: Shewhart 1931 control-chart factors."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "spc_orders"
    )
    return spark.sql(_spc_sql("spc_orders"))


def _dispersion_sql(orders: str) -> str:
    """Shared Poisson-dispersion SQL body: all sufficient statistics are
    exact BIGINT; the index and chi-square are single IEEE
    expressions."""
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM {orders} GROUP BY 1
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily
    )
    SELECT n AS n_days, sx AS n_orders,
           CAST(sx AS DOUBLE) / n AS mean_per_day,
           (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               / (n * (n - CAST(1.0 AS DOUBLE)))
               / (CAST(sx AS DOUBLE) / n) AS dispersion_index,
           (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               / (n * CAST(sx AS DOUBLE) / n) AS chi_square,
           n - 1 AS dof
    FROM stats
    """


@register("poisson_dispersion_test", oracle=_dispersion_sql("orders"))
def poisson_dispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion (index-of-dispersion) test on daily order
    counts: sample variance over mean, with the (n-1)*s^2/mean
    chi-square statistic — the standard over/under-dispersion check
    before trusting Poisson assumptions in anomaly thresholds (rowcount
    alerts assume equidispersion; this measures it). Exact integer
    sufficient statistics; two final divisions.

    Scale: daily groupBy then a single-row reduce. Public method:
    Fisher 1950 index of dispersion."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pd_orders"
    )
    return spark.sql(_dispersion_sql("pd_orders"))
