"""Incremental / CDC batch operators.

Reference: src/etl/incremental/incremental_etl_processor.py:26-330 —
high-water-mark reads (HighWaterMarkManager :92-120), checksum change
detection (ChecksumCalculator :122-154), change classification
(ChangeDetector :155-330). All re-expressed as pure DataFrame transforms:
the watermark is a pushed-down filter (partition/rowgroup pruning applies),
checksums are distributed md5 hashes, classification is one full-outer join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def high_watermark_filter(df: DataFrame, ts_col: str, watermark) -> DataFrame:
    """Rows strictly newer than the recorded high-water mark. The comparison
    is a plain predicate so it reaches the parquet scan (PushedFilters)."""
    return df.filter(F.col(ts_col) > F.lit(watermark))


def row_checksum(cols: list[str]) -> Column:
    """Deterministic row checksum over the given columns (null-safe)."""
    return F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
        )
    )


def checksum_classify_changes(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Compare two snapshots by checksum → insert/update/unchanged/delete."""
    o = old.select(
        *[F.col(k).alias(f"o_{k}") for k in key_cols],
        row_checksum(value_cols).alias("o_sum"),
    )
    n = new.select(*key_cols, row_checksum(value_cols).alias("n_sum"))
    cond = [n[k] == o[f"o_{k}"] for k in key_cols]
    key0 = key_cols[0]
    return (
        n.join(o, cond, "full_outer")
        .select(
            *[F.coalesce(n[k], o[f"o_{k}"]).alias(k) for k in key_cols],
            F.when(o[f"o_{key0}"].isNull(), "insert")
            .when(n[key0].isNull(), "delete")
            .when(F.col("n_sum") != F.col("o_sum"), "update")
            .otherwise("unchanged")
            .alias("change_type"),
        )
    )
