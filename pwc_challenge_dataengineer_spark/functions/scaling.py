"""Feature-scaling operators: StandardScaler / MinMaxScaler as closed-form
column expressions, PCA via pyspark.ml.

The reference's streaming ML pipeline chains VectorAssembler →
StandardScaler/MinMaxScaler → PCA (src/streaming/realtime_analytics_ml.py:
38-41, 536-595) through MLlib fit/transform. Scalers are closed-form
(mean/std, min/max), so the Spark-first shape is: one partial aggregate to a
single stats row, broadcast it back, and scale with pure column arithmetic —
no MLlib fit pass, no vector column materialization, and the whole transform
stays inside whole-stage codegen.

Cross-engine float parity: callers pass exact-decimal sums (plans/_parity.py
``dec``) for money columns so mean/std are deterministic doubles; the final
``(x - mean) / std`` is IEEE arithmetic on identical operands — identical in
Spark and DuckDB.

Scale: stats aggregation is a map-side-combined global agg to ONE row; the
join back is a broadcast nested-loop of a 1-row table (no shuffle of the fact
side). At 100 TB this is a single pass + a second scan of the fact — the same
cost MLlib's StandardScaler.fit + transform pays, without the Python/JVM
vector boxing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _exact(col: str | Column, exact_decimal: bool) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)") if exact_decimal else c


def standard_scale(
    df: DataFrame,
    cols: dict[str, bool],
    suffix: str = "_z",
) -> DataFrame:
    """Append z-scored columns ``<name><suffix>`` for each ``name: exact``
    entry (exact=True → decimal-exact moments, for 2-dec money columns).

    std is the sample std from exact Σx / Σx² (the grouped_stats idiom):
    deterministic across engines, unlike streaming-variance stddev_samp.
    """
    aggs = []
    for name, exact in cols.items():
        x = _exact(name, exact)
        aggs.append(F.sum(x).cast("double").alias(f"__sum_{name}"))
        aggs.append(F.sum(x * x).cast("double").alias(f"__sum2_{name}"))
    aggs.append(F.count(F.lit(1)).alias("__n"))
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    n = F.col("__n")
    for name in cols:
        mean = F.col(f"__sum_{name}") / n
        std = F.sqrt(
            (F.col(f"__sum2_{name}") - F.col(f"__sum_{name}") * F.col(f"__sum_{name}") / n)
            / (n - F.lit(1))
        )
        out = out.withColumn(
            f"{name}{suffix}", (F.col(name).cast("double") - mean) / std
        )
    return out.drop("__n", *[c for name in cols for c in (f"__sum_{name}", f"__sum2_{name}")])


def minmax_scale(
    df: DataFrame,
    cols: list[str],
    suffix: str = "_scaled",
) -> DataFrame:
    """Append min-max scaled columns ``(x - min) / (max - min)`` — exact
    order-statistics, so engine-deterministic with no decimal plumbing."""
    aggs = []
    for name in cols:
        aggs.append(F.min(name).cast("double").alias(f"__min_{name}"))
        aggs.append(F.max(name).cast("double").alias(f"__max_{name}"))
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for name in cols:
        lo, hi = F.col(f"__min_{name}"), F.col(f"__max_{name}")
        out = out.withColumn(
            f"{name}{suffix}",
            (F.col(name).cast("double") - lo) / (hi - lo),
        )
    return out.drop(*[c for name in cols for c in (f"__min_{name}", f"__max_{name}")])


def pca_project(
    df: DataFrame,
    array_col: str,
    k: int,
    id_cols: list[str],
    out_col: str = "pc",
    canonical_signs: bool = False,
) -> DataFrame:
    """Project an ``array<float>`` column onto its top-k principal
    components (pyspark.ml PCA — distributed Gram-matrix eigendecomposition,
    realtime_analytics_ml.py:564-575's PCA stage).

    Returns id_cols + ``out_col`` array<double> of length k.

    ``canonical_signs`` fixes the per-component sign ambiguity (an
    eigenvector and its negation are equally valid): each component is
    flipped so its FIRST coordinate of magnitude > 1e-6 is positive.
    Comparing coordinates against a threshold (not argmax) makes the
    convention immune to solver noise — argmax|w_d| flips randomly when
    two coordinates tie in magnitude, a threshold only misfires if a
    coordinate sits within solver precision of 1e-6, measure-zero for
    real data. With distinct eigenvalues this makes the projection fully
    deterministic and cross-engine portable; the value oracle on the
    analytic fixture (plans/feature_pipeline.py pca_fixture_projection)
    pins it. ORDER needs no convention: Spark already returns components
    sorted by descending eigenvalue, unique when eigenvalues are
    distinct (repeated eigenvalues leave a rotation ambiguity inside the
    eigenspace that NO convention can fix — the irreducible case, which
    is why pca_embeddings on arbitrary data stays rows-only).
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = df.withColumn(
        "__vec", array_to_vector(F.col(array_col).cast("array<double>"))
    ).localCheckpoint(eager=False)  # fit's covariance pass AND transform
    # each read this frame — without a barrier the caller's whole upstream
    # (scan, feature build) runs twice
    model = PCA(k=k, inputCol="__vec", outputCol="__pc").fit(vecs)
    out = model.transform(vecs).select(
        *id_cols, vector_to_array("__pc").alias(out_col)
    )
    if canonical_signs:
        # model.pc is dims x k and driver-side tiny (the basis, not data)
        W = model.pc.toArray()
        signs = []
        for j in range(k):
            lead = next((v for v in W[:, j] if abs(v) > 1e-6), 1.0)
            signs.append(1.0 if lead > 0 else -1.0)
        out = out.withColumn(
            out_col,
            F.array(
                *[
                    (F.col(out_col)[j] * F.lit(signs[j])).alias(f"_{j}")
                    for j in range(k)
                ]
            ),
        )
    return out, model
