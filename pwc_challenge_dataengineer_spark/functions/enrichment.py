"""Enrichment operators (SURVEY.md §2.12).

- country canonicalization (realtime_silver_processor.py:365-383): alias →
  canonical name. Reference uses a when-chain; we expose both a when-chain
  and a broadcast-lookup join (the scale path for big alias maps).
- currency-by-country mapping (realtime_silver_processor.py:427-445)
- customer-id cleanup (realtime_silver_processor.py:351-364)
- line_total + return detection + risk scoring
  (realtime_silver_processor.py:403-470)
- temporal features incl. cyclical encodings (advanced_features.py:27-71,
  326-362) — sin/cos rounded to 6dp so libm differences between engines
  cannot leak into correctness hashes
- keyword product categorization (enrichment.py:188-210)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

COUNTRY_ALIASES = {
    "UK": "United Kingdom",
    "GB": "United Kingdom",
    "GREAT BRITAIN": "United Kingdom",
    "USA": "United States",
    "US": "United States",
    "EIRE": "Ireland",
    "RSA": "South Africa",
}

CURRENCY_BY_COUNTRY = {
    "United Kingdom": "GBP",
    "United States": "USD",
    "Germany": "EUR",
    "France": "EUR",
    "Ireland": "EUR",
    "Japan": "JPY",
    "Australia": "AUD",
}


def canonicalize_country(col: Column) -> Column:
    """Alias → canonical, else initcap of the trimmed raw value."""
    up = F.upper(F.trim(col))
    expr = F.initcap(F.trim(col))
    for alias, canon in COUNTRY_ALIASES.items():
        expr = F.when(up == alias, canon).otherwise(expr)
    return expr


def currency_lookup_df(spark: SparkSession, mapping: dict[str, str] | None = None):
    """Currency mapping as a broadcast-able lookup DataFrame (the scale path
    — a when-chain with 10k branches does not codegen)."""
    mapping = mapping or CURRENCY_BY_COUNTRY
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], ["country_name", "currency_code"]
    )


def clean_customer_id(col: Column) -> Column:
    """ANONYMOUS/GUEST/numeric-id normalization (reference :351-364)."""
    trimmed = F.trim(col)
    return (
        F.when(trimmed.isNull() | (trimmed == ""), "ANONYMOUS")
        .when(F.upper(trimmed).isin("GUEST", "ANON", "ANONYMOUS"), "GUEST")
        .when(trimmed.rlike("^[0-9]+$"), trimmed)
        .otherwise("INVALID")
    )


def line_total(quantity: Column, unit_price: Column) -> Column:
    return F.coalesce(quantity * unit_price, F.lit(0.0))


def detect_return(quantity: Column, description: Column) -> Column:
    """qty<0 or CANCEL/RETURN/REFUND in the text (reference :411-426)."""
    up = F.upper(F.coalesce(description, F.lit("")))
    return (
        (quantity < 0)
        | up.contains("CANCEL")
        | up.contains("RETURN")
        | up.contains("REFUND")
    )


def risk_score(amount: Column, quantity: Column, is_return: Column) -> Column:
    """Case-chain risk scoring (reference :454-470)."""
    return (
        F.when(is_return, 0.8)
        .when(F.abs(amount) > 100000, 0.9)
        .when(quantity > 1000, 0.7)
        .when(amount < 0, 0.6)
        .otherwise(0.1)
    )


def add_temporal_features(df: DataFrame, ts_col: str) -> DataFrame:
    """Calendar + cyclical features. dayofweek is ISO (Mon=1) to match both
    engines' isodow; sin/cos rounded to 6dp for cross-engine determinism."""
    ts = F.col(ts_col)
    month = F.month(ts)
    dow_iso = (F.dayofweek(ts) + 5) % 7 + 1  # Spark dayofweek: Sun=1 → ISO Mon=1
    pi = 3.141592653589793
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", month)
        .withColumn("quarter", F.quarter(ts))
        .withColumn("day_of_month", F.dayofmonth(ts))
        .withColumn("day_of_week", dow_iso.cast("int"))
        .withColumn("is_weekend", dow_iso >= 6)
        .withColumn(
            "season",
            F.when(month.isin(12, 1, 2), "winter")
            .when(month.isin(3, 4, 5), "spring")
            .when(month.isin(6, 7, 8), "summer")
            .otherwise("autumn"),
        )
        .withColumn("month_sin", F.round(F.sin(2 * pi * (month - 1) / 12), 6))
        .withColumn("month_cos", F.round(F.cos(2 * pi * (month - 1) / 12), 6))
    )


def categorize_by_keywords(col: Column, categories: dict[str, list[str]], default: str = "other") -> Column:
    """First-match keyword categorization over lowercase text."""
    low = F.lower(F.coalesce(col, F.lit("")))
    expr: Column = F.lit(default)
    for cat, kws in reversed(list(categories.items())):
        cond = F.lit(False)
        for kw in kws:
            cond = cond | low.contains(kw)
        expr = F.when(cond, cat).otherwise(expr)
    return expr
