"""100 TB-scale replacements for constructs that don't survive scale-up.

The reference's RFM scoring uses GLOBAL ntile windows
(src/etl/gold/spark_gold.py:113-135): an unpartitioned sort that funnels
every row through one task. At 1000 executors that's the whole job's
bottleneck. The scale path here:

- ``quantile_bucket``: approxQuantile boundaries (driver gets K doubles, not
  rows) → bucket assignment as a codegen'd CASE chain. One pass, no global
  sort, divergence vs exact ntile only at boundary ties (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bucket(
    df: DataFrame,
    col: str,
    n_buckets: int = 5,
    out_col: str | None = None,
    relative_error: float = 1e-4,
    descending: bool = False,
) -> DataFrame:
    """Assign 1..n quantile bucket via approxQuantile boundaries.

    Unlike global ntile, cost is one aggregation pass; the boundary list
    (n_buckets-1 doubles) broadcasts inside the CASE expression.
    """
    out_col = out_col or f"{col}_bucket"
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.approxQuantile(col, probs, relative_error)
    expr = F.lit(1)
    for i, b in enumerate(bounds, start=1):
        expr = F.when(F.col(col) > F.lit(b), i + 1).otherwise(expr)
    if descending:
        expr = (F.lit(n_buckets + 1) - expr).cast("int")
    return df.withColumn(out_col, expr.cast("int"))
