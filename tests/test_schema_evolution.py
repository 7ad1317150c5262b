"""Schema-evolution engine tests: registry compat enforcement, evolve-on-read
over genuinely heterogeneous parquet files, widening rules.

(Reference semantics: src/streaming/schema_evolution_manager.py:43-220.)"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pwc_challenge_dataengineer_spark.sources.schema_evolution import (
    SchemaRegistry,
    check_compatibility,
    conform_to,
    diff_schemas,
    evolve_read,
    is_widening,
)


def _st(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


V1 = _st(("id", T.IntegerType(), True), ("name", T.StringType(), True))
V2_WIDENED = _st(
    ("id", T.LongType(), True),
    ("name", T.StringType(), True),
    ("score", T.DoubleType(), True),
)
V3_BREAKING = _st(("id", T.LongType(), True))  # drops name


def test_widening_rules():
    assert is_widening(T.IntegerType(), T.LongType())
    assert is_widening(T.IntegerType(), T.DoubleType())
    assert is_widening(T.LongType(), T.DoubleType())
    assert is_widening(T.FloatType(), T.DoubleType())
    assert is_widening(T.BooleanType(), T.StringType())
    assert not is_widening(T.LongType(), T.IntegerType())  # narrowing
    assert not is_widening(T.StringType(), T.IntegerType())
    assert is_widening(T.StringType(), T.StringType())  # identity


def test_diff_and_compat_classification():
    changes = {(c["field"], c["change_type"]): c for c in diff_schemas(V1, V2_WIDENED)}
    assert changes[("score", "add_column")]["backward_safe"]
    assert changes[("id", "change_type")]["backward_safe"]  # int→bigint widens
    ok, issues = check_compatibility(V1, V2_WIDENED, "full")
    assert ok and issues == []
    ok, issues = check_compatibility(V1, V3_BREAKING, "backward")
    assert not ok and any("drop_column" in i for i in issues)
    # forward-compat: added REQUIRED column breaks old readers
    v_required = _st(("id", T.IntegerType(), True), ("name", T.StringType(), True),
                     ("tag", T.StringType(), False))
    ok, _ = check_compatibility(V1, v_required, "forward")
    assert not ok
    assert check_compatibility(V1, V3_BREAKING, "none") == (True, [])


def test_registry_enforces_compat_mode(tmp_path):
    reg = SchemaRegistry(str(tmp_path / "registry"))
    assert reg.register("orders", V1) == 1
    assert reg.register("orders", V2_WIDENED) == 2
    with pytest.raises(ValueError, match="backward compatibility"):
        reg.register("orders", V3_BREAKING)  # drop breaks backward
    assert reg.register("orders", V3_BREAKING, mode="none") == 3
    assert reg.latest_version("orders") == 3
    assert reg.get_schema("orders", 1) == V1
    assert reg.get_schema("orders") == V3_BREAKING


def test_evolve_read_heterogeneous_parquet(spark, tmp_path):
    """Two parquet generations with different physical schemas on disk
    union onto the target without rewriting either file."""
    gen1 = spark.createDataFrame([(1, "a")], _st(("id", T.IntegerType(), True),
                                                 ("label", T.StringType(), True)))
    gen2 = spark.createDataFrame(
        [(2, "b", 0.5)],
        _st(("id", T.LongType(), True), ("name", T.StringType(), True),
            ("score", T.DoubleType(), True)),
    )
    p1, p2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    gen1.write.parquet(p1)
    gen2.write.parquet(p2)
    target = _st(("id", T.LongType(), True), ("name", T.StringType(), True),
                 ("score", T.DoubleType(), True))
    out = evolve_read(spark, [p1, p2], target, renames={"label": "name"})
    rows = sorted(out.collect(), key=lambda r: r.id)
    assert [tuple(r) for r in rows] == [(1, "a", None), (2, "b", 0.5)]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "string", "double",
    ]


def test_conform_rejects_narrowing_and_missing_required(spark):
    df = spark.createDataFrame([(1,)], _st(("id", T.LongType(), True)))
    with pytest.raises(ValueError, match="not a safe widening"):
        conform_to(df, _st(("id", T.IntegerType(), True)))
    with pytest.raises(ValueError, match="required column"):
        conform_to(df, _st(("id", T.LongType(), True), ("k", T.StringType(), False)))


def test_evolve_read_plan_is_shuffle_free(spark):
    """Evolve-on-read is projections + union: the physical plan must carry
    ZERO exchanges, so it costs the same as reading the generations raw."""
    gen1 = spark.range(10).selectExpr("CAST(id AS INT) AS id", "'x' AS label")
    gen2 = spark.range(10, 20).selectExpr("id", "'y' AS name", "CAST(id AS DOUBLE) AS score")
    target = _st(("id", T.LongType(), True), ("name", T.StringType(), True),
                 ("score", T.DoubleType(), True))
    out = evolve_read(spark, [gen1, gen2], target, renames={"label": "name"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
