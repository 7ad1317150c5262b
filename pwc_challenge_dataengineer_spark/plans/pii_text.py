"""PII redaction + repetition analysis over documents — LLM training-data
hygiene operators (extending the SURVEY §2 text-analysis family; reference
analog: the silver layer's regex cleaning rules,
src/streaming/realtime_silver_processor.py:365-426, generalized to the
redaction/repetition checks every pretraining pipeline runs).

- pii_redact         typed-placeholder redaction (email/IPv4/phone) with
  per-category match counts. The synthetic corpus contains no PII, so both
  sides deterministically inject doc_id-derived PII first — the check is
  then non-vacuous: every row must detect and strip all three categories.
- repetition_stats   type-token ratio + top-token share per document (the
  classic repetition filter for machine-generated/boilerplate text).

Both are pure column/aggregation plans: a regexp chain (codegen'd, no UDF)
and a two-level explode→groupBy. At 100 TB the explode's partial aggregation
collapses token rows before the doc-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import pii_counts, redact_pii
from ..schemas import load_table
from .catalog import register

# doc_id-derived synthetic PII, byte-identical on both engines.
_AUG_SQL = """
    text || ' contact doc' || CAST(doc_id AS VARCHAR)
         || '@example.com ip 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
         || ' phone +1-555-01' || CAST(doc_id % 90 + 10 AS VARCHAR)
"""


@register(
    "pii_redact",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS text FROM documents)
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                       '[EMAIL]', 'g'),
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                   '[IP]', 'g'),
               '\\+\\d{{1,3}}-\\d{{3}}-\\d{{4}}', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT)
               AS n_email,
           CAST(len(regexp_extract_all(text,
                '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS INT)
               AS n_ipv4,
           CAST(len(regexp_extract_all(text,
                '\\+\\d{{1,3}}-\\d{{3}}-\\d{{4}}')) AS INT) AS n_phone
    FROM aug
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII redaction with per-category counts
    (functions/text.py:redact_pii). Email is replaced first so the IP
    pattern can't half-match an address's dotted domain."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact doc"), F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0.0."), (F.col("doc_id") % 250).cast("string"),
        F.lit(" phone +1-555-01"), (F.col("doc_id") % 90 + 10).cast("string"),
    )
    base = docs.select("doc_id", aug.alias("text"))
    counts = pii_counts(F.col("text"))
    return base.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
    )


@register(
    "repetition_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    agg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS max_tok
        FROM cnt GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_distinct,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
           round(CAST(max_tok AS DOUBLE) / n_tokens, 6) AS top_token_ratio,
           (CAST(n_distinct AS DOUBLE) / n_tokens < 0.3
            OR CAST(max_tok AS DOUBLE) / n_tokens > 0.1) AS is_repetitive
    FROM agg
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile: type-token ratio and the share of
    the single most frequent token — the standard boilerplate/degenerate-
    text filter. Two-level aggregation: token counts collapse in the first
    groupBy (map-side combined), so the doc-level pass sees |vocab| rows
    per doc, not |tokens|."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("tok"),
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_tok"),
    )
    ttr = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top = F.col("max_tok").cast("double") / F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(top, 6).alias("top_token_ratio"),
        ((ttr < 0.3) | (top > 0.1)).alias("is_repetitive"),
    )


@register(
    "k_anonymity_check",
    oracle="""
    WITH qi AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket
        FROM customer
    ),
    joined AS (
        SELECT q.c_nationkey, q.c_mktsegment, q.bal_bucket,
               q.c_custkey, o.o_orderpriority
        FROM qi q LEFT JOIN orders o ON q.c_custkey = o.o_custkey
    )
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l,
           COUNT(DISTINCT c_custkey) < 5 AS k_violation,
           COUNT(DISTINCT o_orderpriority) < 3 AS l_violation
    FROM joined
    GROUP BY 1, 2, 3
    """,
)
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the quasi-identifier tuple
    (nation, market segment, balance bucket): k = how many customers
    share each QI combination (re-identification risk when k < 5), l =
    how many distinct sensitive values (order priority) appear inside the
    group (attribute-disclosure risk when l < 3). The privacy gate a
    training-data pipeline runs before releasing per-customer features —
    complements pii_redact (which scrubs direct identifiers; this audits
    the indirect ones). Two distinct-counts share one QI-keyed shuffle;
    integer thresholds, exact parity."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    qi = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("bal_bucket"),
    )
    joined = qi.join(orders, qi.c_custkey == orders.o_custkey, "left")
    k = F.count_distinct("c_custkey")
    l = F.count_distinct("o_orderpriority")
    return joined.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        k.cast("bigint").alias("k"),
        l.cast("bigint").alias("l"),
        (k < 5).alias("k_violation"),
        (l < 3).alias("l_violation"),
    )


_K_ANON = 5
_L_DIV = 3


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH joined AS (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS order_year,
               c_mktsegment AS segment,
               o_orderpriority AS sensitive
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT nation, order_year, segment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct,
           COUNT(*) >= {_K_ANON} AS is_k_anonymous,
           COUNT(DISTINCT sensitive) >= {_L_DIV} AS is_l_diverse
    FROM joined
    GROUP BY 1, 2, 3
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy-compliance companion
    to pii_redact: group the fact by its quasi-identifiers (nation, order
    year, market segment), and flag equivalence classes smaller than k=5
    (re-identifiable) or with fewer than l=3 distinct values of the
    sensitive attribute (attribute-disclosable even when k holds — the
    homogeneity attack l-diversity exists to catch). Releasing only
    groups passing both flags is the standard anonymization gate.

    One hash aggregate over the joined quasi-identifier projection with
    broadcast dims; counts exact. At 100 TB the QI-group count is bounded
    by the QI domain product, so the aggregate output is tiny no matter
    the fact size."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("sensitive"),
        )
    )
    return joined.groupBy("nation", "order_year", "segment").agg(
        F.count("*").cast("bigint").alias("group_size"),
        F.countDistinct("sensitive").cast("bigint").alias("l_distinct"),
        (F.count("*") >= _K_ANON).alias("is_k_anonymous"),
        (F.countDistinct("sensitive") >= _L_DIV).alias("is_l_diverse"),
    )


@register(
    "k_anon_generalize",
    oracle=f"""
    WITH joined AS (
        SELECT o_orderkey,
               n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS order_year,
               c_mktsegment AS segment
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    ),
    sized AS (
        SELECT o_orderkey, nation, order_year, segment,
               COUNT(*) OVER (PARTITION BY nation, order_year, segment)
                   AS sz0,
               COUNT(*) OVER (PARTITION BY nation, order_year) AS sz1,
               COUNT(*) OVER (PARTITION BY nation) AS sz2
        FROM joined
    )
    SELECT o_orderkey,
           CASE WHEN sz0 >= {_K_ANON} THEN 0
                WHEN sz1 >= {_K_ANON} THEN 1
                ELSE 2 END AS gen_level,
           CASE WHEN sz0 >= {_K_ANON}
                    THEN nation || '|' || CAST(order_year AS VARCHAR)
                         || '|' || segment
                WHEN sz1 >= {_K_ANON}
                    THEN nation || '|' || CAST(order_year AS VARCHAR) || '|*'
                ELSE nation || '|*|*' END AS released_qi,
           CAST(CASE WHEN sz0 >= {_K_ANON} THEN sz0
                     WHEN sz1 >= {_K_ANON} THEN sz1
                     ELSE sz2 END AS BIGINT) AS group_size
    FROM sized
    """,
)
def k_anon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity ENFORCEMENT by generalization ladder: each row releases
    its quasi-identifiers at the finest level whose equivalence class
    reaches k=5 — (nation, year, segment) -> (nation, year, *) ->
    (nation, *, *) — the minimal-information-loss ladder an anonymizing
    release pipeline applies after k_anonymity_audit finds violations.

    Three window counts over progressively coarser partitions of the SAME
    user-keyed shuffle family (Catalyst chains them without re-sorting the
    widest partitioning), then a pure CASE projection; no per-row state.
    Note the residual: a (nation) class below k would need suppression —
    on this schema every nation clears k at any SF, so the ladder
    terminates; integer-exact output."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "o_orderkey",
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    sz0 = F.count("*").over(
        Window.partitionBy("nation", "order_year", "segment")
    )
    sz1 = F.count("*").over(Window.partitionBy("nation", "order_year"))
    sz2 = F.count("*").over(Window.partitionBy("nation"))
    sized = joined.select(
        "o_orderkey", "nation", "order_year", "segment",
        sz0.alias("sz0"), sz1.alias("sz1"), sz2.alias("sz2"),
    )
    fine = F.col("sz0") >= _K_ANON
    mid = F.col("sz1") >= _K_ANON
    yr = F.col("order_year").cast("string")
    return sized.select(
        "o_orderkey",
        F.when(fine, 0).when(mid, 1).otherwise(2).alias("gen_level"),
        F.when(fine, F.concat_ws("|", "nation", yr, "segment"))
        .when(mid, F.concat(F.concat_ws("|", "nation", yr), F.lit("|*")))
        .otherwise(F.concat(F.col("nation"), F.lit("|*|*")))
        .alias("released_qi"),
        F.when(fine, F.col("sz0"))
        .when(mid, F.col("sz1"))
        .otherwise(F.col("sz2"))
        .cast("bigint")
        .alias("group_size"),
    )


def _t_close_sql(orders: str, customer: str, nation: str) -> str:
    """Shared t-closeness SQL body (identical text on both engines)."""
    return f"""
    WITH joined AS (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS order_year,
               c_mktsegment AS segment,
               o_orderpriority AS sensitive
        FROM {orders}
        JOIN {customer} ON o_custkey = c_custkey
        JOIN {nation} ON c_nationkey = n_nationkey
    ),
    gdist AS (
        SELECT sensitive, CAST(COUNT(*) AS BIGINT) AS n_a FROM joined
        GROUP BY 1
    ),
    gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM joined),
    grp AS (
        SELECT nation, order_year, segment,
               CAST(COUNT(*) AS BIGINT) AS n_g
        FROM joined GROUP BY 1, 2, 3
    ),
    cell AS (
        SELECT nation, order_year, segment, sensitive,
               CAST(COUNT(*) AS BIGINT) AS n_ga
        FROM joined GROUP BY 1, 2, 3, 4
    ),
    grid AS (
        SELECT g.nation, g.order_year, g.segment, g.n_g,
               a.sensitive, a.n_a, COALESCE(c.n_ga, 0) AS n_ga
        FROM grp g
        CROSS JOIN gdist a
        LEFT JOIN cell c
          ON c.nation = g.nation AND c.order_year = g.order_year
         AND c.segment = g.segment AND c.sensitive = a.sensitive
    )
    SELECT gr.nation, gr.order_year, gr.segment,
           CAST(MAX(gr.n_g) AS BIGINT) AS group_size,
           round(0.5 * SUM(ABS(CAST(gr.n_ga AS DOUBLE) / gr.n_g
                               - CAST(gr.n_a AS DOUBLE) / t.n)), 6)
               AS tv_distance,
           0.5 * SUM(ABS(CAST(gr.n_ga AS DOUBLE) / gr.n_g
                         - CAST(gr.n_a AS DOUBLE) / t.n)) <= 0.2
               AS is_t_close
    FROM grid gr CROSS JOIN gtot t
    GROUP BY gr.nation, gr.order_year, gr.segment, t.n
    """


@register(
    "t_closeness_check",
    oracle=_t_close_sql("orders", "customer", "nation"),
)
def t_closeness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness — the third rung of the anonymization ladder after
    k-anonymity and l-diversity (both in k_anonymity_audit): per
    quasi-identifier group, the total-variation distance between the
    group's sensitive-attribute distribution and the global one, flagged
    at t=0.2. l-diversity counts values; t-closeness bounds how much the
    group's distribution LEAKS relative to the corpus (skewness attack).

    Shape: two grouped aggregates + a |groups| x |sensitive-domain| grid
    join (sensitive domain is 5 priorities — broadcast); group count is
    bounded by the QI domain product at any fact size. Fractions are
    exact divisions; the 5-term TV sum carries the 6-dp pin (and the
    boolean gate is computed from the same expression both engines)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tc_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tc_customer"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("tc_nation")
    return spark.sql(_t_close_sql("tc_orders", "tc_customer", "tc_nation"))
