"""The verify_local type gate must catch engine type-promotion divergence.

Two promotion-class escapes shipped red at the driver before this check
existed (r2 bollinger DECIMAL-division, r3 cms_heavy_hitters HUGEINT):
DuckDB promotes SUM(BIGINT) to HUGEINT (arrow decimal128(38,0)) while
Spark emits bigint, and both stringify identically — only the arrow
schema reveals it. These tests seed exactly that fixture and assert the
comparator fails it, plus the acceptable-pair cases stay green.
"""

import sys

sys.path.insert(0, "/root/repo/scripts")

import duckdb
import pytest
from pyspark.sql import types as T

from verify_local import arrow_kind, compare, spark_kind, type_mismatches


def _duck_schema(sql: str):
    return duckdb.connect().execute(sql).arrow().schema


def test_hugeint_promotion_is_caught():
    # DuckDB SUM over BIGINT -> HUGEINT -> arrow decimal128(38,0).
    schema = _duck_schema("SELECT SUM(x) AS s FROM (VALUES (1::BIGINT)) t(x)")
    assert arrow_kind(schema.field("s").type).startswith("decimal")
    spark_schema = T.StructType([T.StructField("s", T.LongType())])
    mis = type_mismatches(spark_schema, schema)
    assert mis and "s" in mis[0]


def test_double_vs_decimal_is_caught():
    # The r2 bollinger class: decimal division vs double.
    schema = _duck_schema("SELECT 1.5::DOUBLE AS v")
    spark_schema = T.StructType([T.StructField("v", T.DecimalType(12, 2))])
    assert type_mismatches(spark_schema, schema)


def test_int_width_pairs_are_accepted():
    # int32 vs int64 pairs exist in driver-green rows; widths are lumped.
    schema = _duck_schema("SELECT 1::INTEGER AS a, 1::BIGINT AS b")
    spark_schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.IntegerType())]
    )
    assert type_mismatches(spark_schema, schema) == []


def test_decimal_scale_must_agree_precision_may_differ():
    schema = _duck_schema("SELECT 1.23::DECIMAL(38, 2) AS d")
    same_scale = T.StructType([T.StructField("d", T.DecimalType(22, 2))])
    assert type_mismatches(same_scale, schema) == []
    diff_scale = T.StructType([T.StructField("d", T.DecimalType(22, 4))])
    assert type_mismatches(diff_scale, schema)


def test_compare_flags_seeded_hugeint_fixture():
    # End-to-end: identical values, divergent types -> compare() FAILs.
    tbl = duckdb.connect().execute(
        "SELECT k, SUM(v) AS total FROM (VALUES ('a', 10::BIGINT), ('a', 5::BIGINT)) t(k, v) GROUP BY 1"
    ).arrow()
    spark_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("total", T.LongType())]
    )
    problems = compare(spark_schema, ["k", "total"], [("a", 15)], tbl)
    assert problems and "type kinds differ" in problems[0]
    # Pin the oracle with a CAST and the same fixture goes green.
    tbl2 = duckdb.connect().execute(
        "SELECT k, CAST(SUM(v) AS BIGINT) AS total FROM (VALUES ('a', 10::BIGINT), ('a', 5::BIGINT)) t(k, v) GROUP BY 1"
    ).arrow()
    assert compare(spark_schema, ["k", "total"], [("a", 15)], tbl2) == []


def test_spark_kind_mapping():
    assert spark_kind(T.LongType()) == "int"
    assert spark_kind(T.DoubleType()) == "float"
    assert spark_kind(T.ArrayType(T.FloatType())) == "list<float>"
    assert spark_kind(T.DecimalType(38, 0)) == "decimal(s=0)"
