"""Empty-input hardening: core operators must return empty results (same
schema), not raise, when fed zero rows — the guarantee that keeps an
incremental pipeline alive on a quiet partition/day."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pwc_challenge_dataengineer_spark.operators.asof import asof_join_backward
from pwc_challenge_dataengineer_spark.operators.dedup import dedup_keep_latest
from pwc_challenge_dataengineer_spark.operators.funnel import funnel
from pwc_challenge_dataengineer_spark.operators.scd2 import scd2_apply, scd2_rebuild
from pwc_challenge_dataengineer_spark.operators.sessionize import sessionize

TS = datetime.datetime

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _empty_events(spark):
    return spark.createDataFrame([], _EVENT_SCHEMA)


def test_sessionize_empty(spark):
    out = sessionize(_empty_events(spark), "user_id", "ts", gap_minutes=30)
    assert out.count() == 0


def test_dedup_empty(spark):
    out = dedup_keep_latest(_empty_events(spark), ["user_id"], "ts")
    assert out.count() == 0


def test_scd2_rebuild_empty(spark):
    out = scd2_rebuild(
        _empty_events(spark),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
    )
    assert out.count() == 0
    assert {"valid_from", "valid_to", "version", "is_current"} <= set(out.columns)


def test_funnel_empty(spark):
    out = funnel(_empty_events(spark), ["view", "click"])
    rows = {r.stage: r.users for r in out.collect()}
    assert rows == {"view": 0, "click": 0}


def test_asof_join_empty_left(spark):
    left = _empty_events(spark).select("user_id", "ts", "event_id")
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1), 10.0)], ["user_id", "ts", "value"]
    )
    out = asof_join_backward(
        left, right, keys=["user_id"], ts_col="ts", right_cols=["value"]
    )
    assert out.count() == 0


def test_scd2_apply_empty_source(spark):
    target_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("attr", T.StringType()),
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
            T.StructField("version", T.IntegerType()),
            T.StructField("is_current", T.BooleanType()),
        ]
    )
    target = spark.createDataFrame(
        [(1, "a", TS(2024, 1, 1), None, 1, True)], target_schema
    )
    source = spark.createDataFrame(
        [], T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("attr", T.StringType()),
                T.StructField("valid_from", T.TimestampType()),
            ]
        )
    )
    # incremental semantics: an empty change batch is a no-op
    out = scd2_apply(
        target, source, key_cols=["k"], attr_cols=["attr"],
        effective_ts=TS(2024, 2, 1), snapshot=False,
    )
    assert out.filter(F.col("is_current")).count() == 1
    # snapshot semantics: an empty snapshot means every entity is gone
    out_snap = scd2_apply(
        target, source, key_cols=["k"], attr_cols=["attr"],
        effective_ts=TS(2024, 2, 1), snapshot=True,
    )
    assert out_snap.filter(F.col("is_current")).count() == 0
    assert out_snap.filter(~F.col("is_current")).count() == 1
