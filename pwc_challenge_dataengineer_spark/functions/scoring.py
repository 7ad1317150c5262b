"""Vectorized model scoring via Arrow-batched Pandas UDF.

The reference imports ``pandas_udf`` for its ML scoring path
(src/streaming/realtime_analytics_ml.py:26, model scoring over streaming
features). Here the operator is a real vectorized scorer: a linear model
w·x over the embedding column, computed in numpy over Arrow batches —
the 10-100× faster path vs a row-at-a-time Python UDF, and the exact
plumbing a real model (sklearn/torch) would use (swap ``_score_batch``).

Determinism/parity: the weights are a fixed deterministic ramp
(w_j = ((j*37) mod 19 - 9) / 10), so the DuckDB oracle can rebuild them
with ``list_transform(range(...))``. numpy's pairwise summation and a
sequential SQL fold can differ by ~1 ulp on 64-dim dots — scores are
rounded to 6 dp on both sides before compare.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def linear_weights(dim: int) -> list[float]:
    """Deterministic weight ramp reproducible in any engine."""
    return [((j * 37) % 19 - 9) / 10.0 for j in range(dim)]


def score_embeddings(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Add ``margin`` (w·x, 6dp) and ``predicted`` (margin > 0) via a scalar
    Pandas UDF. Batches arrive as pandas Series of lists; the matmul runs
    over a (batch, dim) float64 matrix — one BLAS call per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(linear_weights(dim), dtype=np.float64)

    @pandas_udf(T.DoubleType())
    def margin_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch (empty partition)
            return pd.Series([], dtype="float64")
        mat = np.vstack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        return pd.Series(np.round(mat @ w, 6))

    return df.withColumn("margin", margin_udf(F.col(vec_col))).withColumn(
        "predicted", F.col("margin") > 0
    )
