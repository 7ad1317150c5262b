"""Cooldown alert semantics (reference realtime_gold_processor.py:97-118,
608-689): kept-based suppression, severity validation, streaming run."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.streaming.alerts import (
    CooldownAlertRule,
    apply_cooldown,
    evaluate_with_cooldown,
    find_violations,
)

TS = datetime.datetime


def _metrics(spark, rows):
    return spark.createDataFrame(rows, "window_start TIMESTAMP, v DOUBLE")


def test_cooldown_is_kept_based_not_lag_based(spark):
    """Violations at t=0, 6, 12 min with a 10-min cooldown: fires at 0 AND
    12 (12 ≥ last-KEPT 0 + 10). A lag-based suppressor would wrongly mute
    t=12 because its previous violation (t=6) is within 10 min."""
    base = TS(2024, 1, 1, 0, 0)
    m = _metrics(spark, [
        (base, 5.0),
        (base + datetime.timedelta(minutes=6), 6.0),
        (base + datetime.timedelta(minutes=12), 7.0),
    ])
    rules = [CooldownAlertRule("r", "v", ">", 0.0, cooldown_minutes=10)]
    fired = sorted(
        evaluate_with_cooldown(m, rules, "window_start").collect(),
        key=lambda r: r.window_start,
    )
    assert [r.window_start for r in fired] == [
        base, base + datetime.timedelta(minutes=12),
    ]


def test_burst_fires_once_per_cooldown(spark):
    base = TS(2024, 1, 1)
    m = _metrics(
        spark,
        [(base + datetime.timedelta(minutes=i), 1.0) for i in range(0, 60, 5)],
    )
    rules = [CooldownAlertRule("burst", "v", ">=", 1.0, cooldown_minutes=30)]
    fired = evaluate_with_cooldown(m, rules, "window_start").collect()
    assert sorted(r.window_start for r in fired) == [
        base, base + datetime.timedelta(minutes=30),
    ]


def test_rules_are_independent(spark):
    base = TS(2024, 1, 1)
    m = _metrics(spark, [(base, 5.0), (base + datetime.timedelta(minutes=1), 5.0)])
    rules = [
        CooldownAlertRule("a", "v", ">", 0.0, severity="high", cooldown_minutes=60),
        CooldownAlertRule("b", "v", ">", 0.0, severity="critical", cooldown_minutes=60),
    ]
    fired = evaluate_with_cooldown(m, rules, "window_start").collect()
    by_rule = {r.rule_id: r for r in fired}
    assert set(by_rule) == {"a", "b"}  # each rule fires once, independently
    assert by_rule["a"].severity == "high" and by_rule["b"].severity == "critical"


def test_invalid_rule_rejected(spark):
    m = _metrics(spark, [(TS(2024, 1, 1), 1.0)])
    with pytest.raises(ValueError, match="severity"):
        find_violations(m, [CooldownAlertRule("x", "v", ">", 0, severity="loud")], "window_start")
    with pytest.raises(ValueError, match="operator"):
        find_violations(m, [CooldownAlertRule("x", "v", "~", 0)], "window_start")


def test_cooldown_in_streaming_foreachbatch(spark, sf_dir, tmp_path):
    """The engine runs unchanged inside foreachBatch on a bounded file
    stream: per-batch hourly aggregates → cooldown → collected alerts."""
    from pwc_challenge_dataengineer_spark.schemas import load_table

    src = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        load_table(spark, sf_dir, "events").schema
    ).parquet(src)

    collected: list = []

    def _on_batch(batch_df, _bid):
        m = batch_df.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv")
        )
        rules = [CooldownAlertRule("rev", "tv", ">", 50.0, severity="high",
                                   cooldown_minutes=360)]
        collected.extend(evaluate_with_cooldown(m, rules, "window_start").collect())

    q = (
        stream.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert collected, "expected at least one fired alert from the replay"
    assert all(r.severity == "high" and r.rule_id == "rev" for r in collected)
    # suppression held inside the batch: consecutive fires ≥ cooldown apart
    times = sorted(r.window_start for r in collected)
    for a, b in zip(times, times[1:]):
        assert (b - a) >= datetime.timedelta(minutes=360)
