"""Crawl-side web-curation operators (r9): URL canonicalization and
per-host document caps.

These round out the curation surface the r8 verdict asked for (item 8):
before any dedup/quality stage, a crawl pipeline canonicalizes URLs (so
the same page fetched under `HTTP://WWW.x.COM:80/a/?b=2&a=1#frag` and
`https://x.com/a?a=1&b=2` dedups) and caps documents per host (so one
hot site cannot dominate the training mix). The reference's ingestion
layer normalizes source identifiers the same way (reference:
src/etl/bronze — source canonicalization before keying).

The documents table has no URL column, so a deterministic raw URL is
synthesized per document from (doc_id, source) with the SAME closed form
on both engines — mixed-case scheme/host, www. prefixes, default and
explicit ports, trailing slashes, unordered query params, utm_* junk,
fragments — and the canonicalization query then parses the RAW string
generically (split_part/regexp, no knowledge of the generation shape).
Everything is scalar string expressions + one partitioned window: fully
codegen'd, shuffle only on the host key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from .catalog import register

# Raw-URL closed form, shared verbatim by both engines (valid in Spark SQL
# and DuckDB: CASE/||/CAST only).
_RAW_URL = """
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END)
    || '://'
    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
    || source || '.Example.COM'
    || (CASE WHEN doc_id % 4 = 0 THEN ':80'
             WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END)
    || '/articles/' || CAST(doc_id % 50 AS BIGINT)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
             WHEN doc_id % 7 = 0 THEN '?b=2&a=1&x=' || CAST(doc_id % 9 AS BIGINT)
             ELSE '?a=1&b=2' END)
    || (CASE WHEN doc_id % 3 = 1 THEN '#sec' ELSE '' END)
"""

# Generic canonicalization over a column named raw_url — again one SQL
# text both engines accept. Rules (the standard crawl set): drop fragment,
# lowercase scheme+host, strip leading www., drop default ports (http:80 /
# https:443), strip trailing slash off non-root paths, drop utm_* params,
# sort the remaining params.
_CANON_PARTS = """
    split_part(raw_url, '#', 1) AS nofrag,
    lower(split_part(split_part(raw_url, '#', 1), '://', 1)) AS scheme,
    split_part(split_part(raw_url, '#', 1), '://', 2) AS rest
"""

_CANON_SQL = """
    WITH parts AS (
        SELECT doc_id, raw_url, {canon_parts}
        FROM wc_raw
    ),
    hp AS (
        SELECT *,
               split_part(split_part(rest, '/', 1), ':', 1) AS host0,
               split_part(split_part(rest, '/', 1), ':', 2) AS port,
               substr(split_part(rest, '?', 1),
                      length(split_part(rest, '/', 1)) + 1) AS path0,
               CASE WHEN rest LIKE '%?%'
                    THEN split_part(rest, '?', 2) ELSE '' END AS qstr
        FROM parts
    ),
    canon AS (
        SELECT doc_id, raw_url, scheme,
               CASE WHEN lower(host0) LIKE 'www.%'
                    THEN substr(lower(host0), 5)
                    ELSE lower(host0) END AS host,
               CASE WHEN port = '' THEN ''
                    WHEN scheme = 'http'  AND port = '80'  THEN ''
                    WHEN scheme = 'https' AND port = '443' THEN ''
                    ELSE ':' || port END AS portpart,
               CASE WHEN path0 <> '/' AND path0 LIKE '%/'
                    THEN substr(path0, 1, length(path0) - 1)
                    ELSE path0 END AS path,
               {qsort} AS q
        FROM hp
    )
    SELECT doc_id, raw_url,
           scheme || '://' || host || portpart || path
                  || (CASE WHEN q <> '' THEN '?' || q ELSE '' END)
               AS canon_url,
           host
    FROM canon
"""

# utm test via substr, not LIKE: Spark treats backslash as the default
# LIKE escape, DuckDB only honors an explicit ESCAPE clause — substr is
# identical on both engines.
_QSORT_SPARK = (
    "array_join(sort_array(filter(split(qstr, '&'),"
    " p -> substr(p, 1, 4) <> 'utm_' AND p <> '')), '&')"
)
_QSORT_DUCK = (
    "array_to_string(list_sort(list_filter(string_split(qstr, '&'),"
    " p -> substr(p, 1, 4) <> 'utm_' AND p <> '')), '&')"
)


def _canon_oracle() -> str:
    return (
        "WITH wc_raw AS (SELECT doc_id, "
        + _RAW_URL
        + " AS raw_url FROM documents), q AS ("
        + _CANON_SQL.format(canon_parts=_CANON_PARTS, qsort=_QSORT_DUCK)
        + ") SELECT * FROM q"
    )


@register("url_canonicalize", oracle=_canon_oracle())
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (r8 verdict item 8): parse the raw URL
    generically and apply the standard crawl normalization rules so that
    byte-different spellings of the same page key identically. Pure
    scalar string expressions — at 100 TB this fuses into the scan's
    codegen stage, no shuffle, no UDF; the oracle runs the SAME SQL text
    modulo the two engines' list-function spellings."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    raw = docs.selectExpr("doc_id", f"{_RAW_URL} AS raw_url")
    raw.createOrReplaceTempView("wc_raw")
    return spark.sql(
        _CANON_SQL.format(canon_parts=_CANON_PARTS, qsort=_QSORT_SPARK)
    )


_HOST_CAP = 20


def _host_cap_oracle() -> str:
    return f"""
    WITH wc_raw AS (SELECT doc_id, {_RAW_URL} AS raw_url FROM documents),
    canon AS ({_CANON_SQL.format(canon_parts=_CANON_PARTS, qsort=_QSORT_DUCK)})
    SELECT doc_id, host,
           CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id)
                AS BIGINT) AS host_rank,
           CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS host_docs,
           row_number() OVER (PARTITION BY host ORDER BY doc_id)
               <= {_HOST_CAP} AS kept
    FROM canon
    """


@register("per_host_cap", oracle=_host_cap_oracle())
def per_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document caps (r8 verdict item 8): after canonicalization,
    keep at most {cap} documents per host with a DETERMINISTIC keep rank
    (doc_id order — first-crawled wins; swap the ORDER BY for a quality
    score to keep the best instead). The window is PARTITIONED by host —
    shuffle on the host key only, each host ranks its own slice; at web
    scale a pathological mega-host makes its partition large, in which
    case the standard mitigation is a pre-filter that samples each host
    down near the cap before the exact rank (same two-pass idea as
    perplexity_prune_scaled) — the cap semantics are unchanged."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    raw = docs.selectExpr("doc_id", f"{_RAW_URL} AS raw_url")
    raw.createOrReplaceTempView("wc_raw")
    canon = spark.sql(
        _CANON_SQL.format(canon_parts=_CANON_PARTS, qsort=_QSORT_SPARK)
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    return canon.select(
        "doc_id",
        "host",
        F.row_number().over(w).cast("bigint").alias("host_rank"),
        F.count("*").over(Window.partitionBy("host")).cast("bigint").alias(
            "host_docs"
        ),
        (F.row_number().over(w) <= _HOST_CAP).alias("kept"),
    )


per_host_cap.__doc__ = per_host_cap.__doc__.format(cap=_HOST_CAP)
