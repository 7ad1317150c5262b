"""Deduplication operators.

Reference: window dedup-keep-latest (src/etl/silver/spark_silver.py:126-153,
src/etl/silver/clean_silver.py:177-181) — `row_number() over (partition by
business_key order by ingestion_timestamp desc) = 1`.

Scale notes: row_number-over-partition shuffles once on the business key and
never collects to the driver; skewed keys are handled by AQE skew-join/agg
splitting. For the streaming variant use
``df.dropDuplicatesWithinWatermark(keys)`` (see streaming/transforms.py) —
the reference's unbounded window on a stream is unsound (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_keep_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key: the latest by ``order_col``.

    ``tiebreakers`` make the survivor deterministic when ``order_col`` ties
    (always pass them in tests compared against an external oracle).
    """
    ordering: list[Column] = [F.col(order_col).desc()]
    for t in tiebreakers or []:
        ordering.append(F.col(t).desc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Exact content dedup: one survivor (min id) per content fingerprint.

    Fingerprint = md5 of the (optionally lower/trimmed) content columns. This
    is a single hash-shuffle groupBy — the 100 TB-safe shape for exact dedup.
    """
    cols = [
        F.lower(F.trim(F.col(c))) if normalize else F.col(c) for c in content_cols
    ]
    fp = F.md5(F.concat_ws("\x1f", *cols))
    keyed = df.withColumn("__fp", fp)
    survivors = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return keyed.join(survivors, ["__fp", id_col], "left_semi").drop("__fp")
