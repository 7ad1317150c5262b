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
