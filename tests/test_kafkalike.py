"""Kafka-semantics source/sink (sources/kafkalike.py) — proves the
reference's exact Kafka option surface jar-free: subscribe,
startingOffsets (earliest/latest/per-partition JSON with -2/-1),
endingOffsets, maxOffsetsPerTrigger (proportional-to-lag rate cap),
failOnDataLoss (raise vs skip on retention truncation), offset resume
from the checkpoint WAL, and the Kafka wire schema.

Reference capability: src/streaming/spark_structured_streaming.py
157-183 (_create_kafka_source option surface) and 275-391
(_create_kafka_sink)."""

from __future__ import annotations

import json
import os

import pytest

from pwc_challenge_dataengineer_spark.sources.kafkalike import (
    KafkaLikeBroker,
    KafkaLikeStreamReader,
    _allocate_cap,
    register_kafkalike,
)

KAFKA_COLS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]


def _mk_broker(tmp_path, n=20, partitions=2, topic="orders"):
    broker = KafkaLikeBroker(str(tmp_path / "broker"))
    broker.create_topic(topic, partitions=partitions)
    for i in range(n):
        broker.produce(
            topic, json.dumps({"i": i}), key=f"k{i}", partition=i % partitions
        )
    return broker


# -------------------------------------------------------------- unit level


def test_allocate_cap_proportional_to_lag():
    start = {"t": {"0": 0, "1": 0}}
    avail = {"t": {"0": 90, "1": 10}}  # lags 90 + 10
    out = _allocate_cap(start, avail, 50)
    assert out == {"t": {"0": 45, "1": 5}}
    # remainder goes to deterministic (topic, partition) order
    out = _allocate_cap(start, avail, 7)  # 6.3 -> 6, 0.7 -> 0, left 1
    assert out["t"]["0"] + out["t"]["1"] == 7
    # under-cap passes through untouched
    assert _allocate_cap(start, avail, 1000) == avail


def test_allocate_cap_remainder_round_robin():
    # equal lags + a cap smaller than the partition count: the rounding
    # remainder must spread one offset per partition (round-robin), not
    # hand the whole budget to one partition
    start = {"t": {str(p): 0 for p in range(12)}}
    avail = {"t": {str(p): 100 for p in range(12)}}
    out = _allocate_cap(start, avail, 5)
    got = [out["t"][str(p)] for p in range(12)]
    assert sum(got) == 5
    assert max(got) == 1, got  # no partition hogs the budget
    # numeric partition order: p2 is served before p10
    assert got[:5] == [1, 1, 1, 1, 1] and got[5:] == [0] * 7, got


def test_starting_offsets_resolution(tmp_path):
    broker = _mk_broker(tmp_path, n=20, partitions=2)
    broker.truncate("orders", 0, 3)  # retention on p0
    opts = {
        "path": broker.root,
        "subscribe": "orders",
        "startingOffsets": "earliest",
    }
    r = KafkaLikeStreamReader(opts)
    assert r.initialOffset() == {"orders": {"0": 3, "1": 0}}
    r = KafkaLikeStreamReader({**opts, "startingOffsets": "latest"})
    assert r.initialOffset() == {"orders": {"0": 10, "1": 10}}
    r = KafkaLikeStreamReader(
        {
            **opts,
            "startingOffsets": json.dumps(
                {"orders": {"0": 5, "1": -2}}
            ),
        }
    )
    assert r.initialOffset() == {"orders": {"0": 5, "1": 0}}
    r = KafkaLikeStreamReader(
        {**opts, "startingOffsets": json.dumps({"orders": {"0": -1, "1": 7}})}
    )
    assert r.initialOffset() == {"orders": {"0": 10, "1": 7}}
    with pytest.raises(ValueError, match="missing offset"):
        KafkaLikeStreamReader(
            {**opts, "startingOffsets": json.dumps({"orders": {"0": 5}})}
        ).initialOffset()


def test_latest_offset_caps_per_trigger(tmp_path):
    broker = _mk_broker(tmp_path, n=100, partitions=2)
    r = KafkaLikeStreamReader(
        {
            "path": broker.root,
            "subscribe": "orders",
            "startingOffsets": "earliest",
            "maxOffsetsPerTrigger": "30",
        }
    )
    r.initialOffset()
    e1 = r.latestOffset()
    assert sum(e1["orders"].values()) == 30
    e2 = r.latestOffset()
    assert sum(e2["orders"].values()) == 60
    # planning a batch re-seeds the cap base (checkpoint-replay path)
    r2 = KafkaLikeStreamReader(
        {
            "path": broker.root,
            "subscribe": "orders",
            "startingOffsets": "earliest",
            "maxOffsetsPerTrigger": "10",
        }
    )
    r2.partitions({"orders": {"0": 20, "1": 20}}, {"orders": {"0": 25, "1": 25}})
    e = r2.latestOffset()
    assert sum(e["orders"].values()) == 60  # 25+25 base + 10 cap


def test_fail_on_data_loss_semantics(tmp_path):
    broker = _mk_broker(tmp_path, n=20, partitions=1)
    broker.truncate("orders", 0, 8)
    r = KafkaLikeStreamReader(
        {"path": broker.root, "subscribe": "orders"}
    )
    with pytest.raises(ValueError, match="data loss"):
        r.partitions({"orders": {"0": 2}}, {"orders": {"0": 20}})
    r2 = KafkaLikeStreamReader(
        {
            "path": broker.root,
            "subscribe": "orders",
            "failOnDataLoss": "false",
        }
    )
    with pytest.warns(UserWarning, match="skipping lost offsets"):
        slices = r2.partitions({"orders": {"0": 2}}, {"orders": {"0": 20}})
    assert len(slices) == 1 and slices[0].lo == 8 and slices[0].hi == 20


# ------------------------------------------------------------- spark level


def test_batch_read_full_and_ranged(spark, tmp_path):
    broker = _mk_broker(tmp_path, n=20, partitions=2)
    register_kafkalike(spark)
    df = (
        spark.read.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", "orders")
        .load()
    )
    assert df.columns == KAFKA_COLS
    rows = df.collect()
    assert len(rows) == 20
    got = {(r.partition, r.offset) for r in rows}
    assert got == {(p, o) for p in (0, 1) for o in range(10)}
    r0 = next(r for r in rows if r.partition == 0 and r.offset == 0)
    assert json.loads(bytes(r0.value).decode()) == {"i": 0}
    assert bytes(r0.key).decode() == "k0"
    assert r0.timestampType == 0 and r0.topic == "orders"
    # offset-ranged batch read (startingOffsets + endingOffsets JSON)
    ranged = (
        spark.read.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", "orders")
        .option("startingOffsets", json.dumps({"orders": {"0": 5, "1": 8}}))
        .option("endingOffsets", json.dumps({"orders": {"0": 7, "1": -1}}))
        .load()
    )
    got = {(r.partition, r.offset) for r in ranged.collect()}
    assert got == {(0, 5), (0, 6), (1, 8), (1, 9)}


def _run_stream(spark, broker, out, ckpt, topics="orders", **opts):
    reader = (
        spark.readStream.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", topics)
        .option("startingOffsets", "earliest")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    seen = []

    def on_batch(df, bid):
        rows = df.collect()
        seen.append(len(rows))
        if rows:
            df.sparkSession.createDataFrame(rows, df.schema).write.mode(
                "append"
            ).parquet(out)

    q = (
        reader.load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return seen


def test_stream_two_topics_and_offset_resume(spark, tmp_path):
    broker = KafkaLikeBroker(str(tmp_path / "broker"))
    for t, n in (("orders", 6), ("clicks", 4)):
        broker.create_topic(t, partitions=1)
        for i in range(n):
            broker.produce(t, f"{t}-{i}")
    register_kafkalike(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, broker, out, ckpt, topics="orders, clicks")
    vals = {bytes(r.value).decode() for r in spark.read.parquet(out).collect()}
    assert vals == {f"orders-{i}" for i in range(6)} | {
        f"clicks-{i}" for i in range(4)
    }
    # produce more, restart from the same checkpoint: ONLY new records
    for i in range(6, 9):
        broker.produce("orders", f"orders-{i}")
    _run_stream(spark, broker, out, ckpt, topics="orders, clicks")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 13  # 10 + 3, no re-delivery
    vals = {bytes(r.value).decode() for r in rows}
    assert {f"orders-{i}" for i in range(9)} <= vals


def test_stream_max_offsets_per_trigger(spark, tmp_path):
    """AvailableNow falls back to single-batch for Python stream sources,
    so the cap needs a processing-time trigger: run micro-batches until
    all 100 records land, assert every trigger stayed <= the cap."""
    import time

    broker = _mk_broker(tmp_path, n=100, partitions=2)
    register_kafkalike(spark)
    out = str(tmp_path / "out")
    sizes = []
    total = [0]

    def on_batch(df, bid):
        rows = df.collect()
        sizes.append(len(rows))
        if rows:
            df.sparkSession.createDataFrame(rows, df.schema).write.mode(
                "append"
            ).parquet(out)
        total[0] += len(rows)  # after the write: stop() can't race it

    q = (
        spark.readStream.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", "orders")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "30")
        .load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 180
    while total[0] < 100 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    batches = [s for s in sizes if s]
    assert sum(batches) == 100
    assert max(batches) <= 30
    assert len(batches) >= 4
    rows = spark.read.parquet(out).collect()
    assert {(r.partition, r.offset) for r in rows} == {
        (p, o) for p in (0, 1) for o in range(50)
    }


def test_stream_data_loss_raise_and_skip(spark, tmp_path):
    broker = _mk_broker(tmp_path, n=10, partitions=1)
    register_kafkalike(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, broker, out, ckpt)  # consume all 10
    for i in range(10, 16):
        broker.produce("orders", json.dumps({"i": i}))
    broker.truncate("orders", 0, 13)  # ages out offsets 10-12
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="data loss"):
        _run_stream(spark, broker, out, ckpt)
    sizes = _run_stream(
        spark, broker, out, ckpt, failOnDataLoss="false"
    )
    assert sum(sizes) == 3  # offsets 13..15; 10-12 skipped
    assert (
        spark.read.parquet(out).count() == 13
    )  # 10 original + 3 survivors


def test_batch_sink_round_trip(spark, tmp_path):
    root = str(tmp_path / "broker")
    KafkaLikeBroker(root).create_topic("sunk", partitions=1)
    register_kafkalike(spark)
    src = spark.createDataFrame(
        [(f"k{i}", f"v{i}", 0) for i in range(7)],
        "key STRING, value STRING, partition INT",
    )
    (
        src.write.format("kafkalike")
        .option("path", root)
        .option("topic", "sunk")
        .mode("append")
        .save()
    )
    back = (
        spark.read.format("kafkalike")
        .option("path", root)
        .option("subscribe", "sunk")
        .load()
    )
    rows = back.collect()
    assert len(rows) == 7
    assert {bytes(r.value).decode() for r in rows} == {
        f"v{i}" for i in range(7)
    }
    assert {r.offset for r in rows} == set(range(7))


def test_stream_sink_round_trip(spark, tmp_path):
    """readStream from one topic -> writeStream into another, both
    kafkalike — the reference's kafka-to-kafka pipeline shape."""
    broker = _mk_broker(tmp_path, n=8, partitions=1, topic="in")
    broker.create_topic("out_topic", partitions=1)
    register_kafkalike(spark)
    q = (
        spark.readStream.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", "in")
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
        .writeStream.format("kafkalike")
        .option("path", broker.root)
        .option("topic", "out_topic")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    back = (
        spark.read.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", "out_topic")
        .load()
    )
    vals = {bytes(r.value).decode() for r in back.collect()}
    assert vals == {json.dumps({"i": i}) for i in range(8)}


def test_kafkalike_silver_gold_windowed_agg(spark, tmp_path):
    """The existing silver->gold streaming pipeline (parse_kafka_json ->
    watermarked tumbling window agg, streaming/sources.py +
    streaming/windows.py) runs unchanged on the kafkalike source — the
    wire schema matches the real connector, so the reference's
    kafka->silver->gold shape is proven end to end jar-free."""
    from pyspark.sql import types as T

    from pwc_challenge_dataengineer_spark.streaming.sources import (
        parse_kafka_json,
    )
    from pwc_challenge_dataengineer_spark.streaming.windows import (
        WindowAggSpec,
        build_window_agg,
    )

    broker = KafkaLikeBroker(str(tmp_path / "broker"))
    broker.create_topic("events", partitions=2)
    base = 1704067200000  # 2024-01-01T00:00Z
    for i in range(40):
        broker.produce(
            "events",
            json.dumps({"event_type": "click" if i % 2 else "view", "v": i}),
            partition=i % 2,
            ts_ms=base + i * 60_000,  # one record per minute
        )
    register_kafkalike(spark)
    payload = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    raw = (
        spark.readStream.format("kafkalike")
        .option("path", broker.root)
        .option("subscribe", "events")
        .option("startingOffsets", "earliest")
        .load()
    )
    silver = parse_kafka_json(raw, payload)
    gold = build_window_agg(
        silver,
        WindowAggSpec(
            name="qh_by_type",
            kind="tumbling",
            ts_col="kafka_timestamp",
            duration="15 minutes",
            group_cols=("event_type",),
            aggs={"n": "count(*)", "sum_v": "sum(v)"},
        ),
    )
    q = (
        gold.writeStream.format("memory")
        .queryName("kafkalike_gold")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("SELECT * FROM kafkalike_gold").collect()
    got = {
        (r.event_type, r.window_start.minute, r.n, r.sum_v) for r in rows
    }
    # 40 minutes of data -> windows at :00 :15 :30; views even i, clicks odd
    want = set()
    for start in (0, 15, 30):
        for et, parity in (("view", 0), ("click", 1)):
            idx = [
                i
                for i in range(40)
                if i % 2 == parity and start <= i < start + 15
            ]
            if idx:
                want.add((et, start, len(idx), sum(idx)))
    assert got == want


def test_subscribe_pattern_and_assign(tmp_path):
    """The two remaining Kafka subscription modes: subscribePattern
    (regex over topic names) and assign (explicit topic-partition JSON),
    mirroring the real connector's mutually-exclusive trio."""
    broker = KafkaLikeBroker(str(tmp_path / "broker"))
    for t in ("orders.us", "orders.eu", "clicks"):
        broker.create_topic(t, partitions=2)
        for i in range(4):
            broker.produce(t, f"{t}-{i}", partition=i % 2)
    r = KafkaLikeStreamReader(
        {
            "path": broker.root,
            "subscribePattern": "orders\\..*",
            "startingOffsets": "earliest",
        }
    )
    assert r.initialOffset() == {
        "orders.us": {"0": 0, "1": 0},
        "orders.eu": {"0": 0, "1": 0},
    }
    r2 = KafkaLikeStreamReader(
        {
            "path": broker.root,
            "assign": json.dumps({"orders.us": [0], "clicks": [1]}),
            "startingOffsets": "earliest",
        }
    )
    offs = r2.initialOffset()
    assert offs == {"orders.us": {"0": 0}, "clicks": {"1": 0}}
    slices = r2.partitions(offs, {"orders.us": {"0": 2}, "clicks": {"1": 2}})
    assert {(s.topic, s.partition) for s in slices} == {
        ("orders.us", 0),
        ("clicks", 1),
    }
    with pytest.raises(ValueError, match="exactly one"):
        KafkaLikeStreamReader(
            {
                "path": broker.root,
                "subscribe": "clicks",
                "subscribePattern": ".*",
            }
        )
    with pytest.raises(ValueError, match="matches no topics"):
        KafkaLikeStreamReader(
            {"path": broker.root, "subscribePattern": "nope\\..*"}
        ).initialOffset()


def test_subscribe_pattern_spark_batch(spark, tmp_path):
    broker = KafkaLikeBroker(str(tmp_path / "broker"))
    for t in ("t.a", "t.b", "other"):
        broker.create_topic(t, partitions=1)
        broker.produce(t, f"v-{t}")
    register_kafkalike(spark)
    df = (
        spark.read.format("kafkalike")
        .option("path", broker.root)
        .option("subscribePattern", "t\\..*")
        .load()
    )
    assert {r.topic for r in df.collect()} == {"t.a", "t.b"}
