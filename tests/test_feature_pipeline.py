"""Scaler golden tests + PCA reconstruction-error pin
(reference realtime_analytics_ml.py:38-41, 536-595)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.functions.scaling import (
    minmax_scale,
    pca_project,
    standard_scale,
)


def test_standard_scale_golden(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 4.0), (3, 6.0)], ["id", "x"])
    out = {r.id: r.x_z for r in standard_scale(df, {"x": False}).collect()}
    # mean 4, sample std 2 → z = (-1, 0, 1)
    assert out[1] == -1.0 and out[2] == 0.0 and out[3] == 1.0


def test_minmax_scale_golden(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 15.0), (3, 20.0)], ["id", "x"])
    out = {r.id: r.x_scaled for r in minmax_scale(df, ["x"]).collect()}
    assert out == {1: 0.0, 2: 0.5, 3: 1.0}


def test_scale_plan_has_single_agg_and_broadcast(spark):
    """The stats pass must be ONE aggregate broadcast back — no extra
    shuffle of the feature side and no sort."""
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2.0).alias("x"))
    plan = standard_scale(df, {"x": False})._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Sort" not in plan


def test_pca_reconstruction_bound(spark, sf_dir):
    """Top-8 of 64 dims must capture a nontrivial variance share (pin like
    the IVF recall bound): guards against a broken projection wiring."""
    from pwc_challenge_dataengineer_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    projected, model = pca_project(emb, "embedding", k=8, id_cols=["vec_id"])
    var = model.explainedVariance.toArray()
    assert len(var) == 8 and all(v >= 0 for v in var)
    # components come variance-sorted; top-8 capture > 10% of 64 dims even
    # for near-isotropic synthetic data (8/64 = 12.5% expected at isotropy)
    assert 0.10 <= float(sum(var)) <= 1.0 + 1e-9
    first = projected.first()
    assert len(first.pc) == 8 and all(not math.isnan(v) for v in first.pc)
