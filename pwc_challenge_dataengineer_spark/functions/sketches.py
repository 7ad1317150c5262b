"""Distributed sketches beyond Spark's built-ins.

Spark ships HLL (approx_count_distinct) and KLL-ish quantiles
(percentile_approx / approxQuantile); this module adds a Count-Min Sketch —
the classic heavy-hitter / frequency-estimate structure for unbounded key
domains (the LLM-pipeline use: token/shingle frequency caps on corpora too
large for exact counts).

Construction is pure DataFrame algebra, so it merges the same way sketches
do: the (row, col) cell counts are additive, a union of two sketches'
cell tables followed by a groupBy-sum IS the merged sketch. Hash rows are
md5-derived (engine-reproducible, like the MinHash path), depth d rows ×
width w columns.

Estimate(key) = min over rows of cell(row, hash_row(key) mod w) — an upper
bound on the true count with error ≤ ε·N at probability 1-δ where
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, row: int, width: int) -> Column:
    """Column index for ``key`` in hash row ``row``: first 8 md5 hex nibbles
    of "row:key" as an int, mod width. conv() returns a string; cast back."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width).cast("int")


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-Min cell table: (row, col, cnt). One pass — each input row
    contributes to ``depth`` cells via a small explode; partial aggregation
    collapses to d·w cells before the shuffle, so shuffle volume is the
    sketch size, not the data size."""
    key = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cell(key, r, width).alias("col")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.row", "rc.col")
    return cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-query the sketch for each key: min over rows of its cell."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cell(key, r, width).alias("col")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, "rc.row", "rc.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("estimated_count"))
    )
