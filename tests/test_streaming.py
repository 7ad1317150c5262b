"""True Structured Streaming tests: file source → transforms → sinks with
availableNow triggers (bounded replay of the events table, per SURVEY §5)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pwc_challenge_dataengineer_spark.schemas import TRANSACTION_EVENT_SCHEMA, load_table
from pwc_challenge_dataengineer_spark.streaming.cdc import (
    apply_changes_to_table,
    latest_state_per_key,
    parse_debezium,
)
from pwc_challenge_dataengineer_spark.streaming.sinks import (
    AlertRule,
    evaluate_alerts,
    start_memory_sink,
)
from pwc_challenge_dataengineer_spark.streaming.transforms import (
    dedup_within_watermark,
    silver_clean_events,
)
from pwc_challenge_dataengineer_spark.streaming.windows import DEFAULT_SPECS, WindowAggSpec, build_window_agg

# NB: watermarks require TIMESTAMP (not NTZ); with a UTC session the stored
# micros read identically either way.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write the events table as micro-batch-able parquet files."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_df, name, mode="append"):
    q = start_memory_sink(stream_df, name, output_mode=mode)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir):
    spec = WindowAggSpec(
        name="hourly",
        kind="tumbling",
        ts_col="ts",
        duration="1 hour",
        group_cols=("event_type",),
        aggs={"n_events": "count(*)"},
        watermark="1 minute",
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events_dir)
    # complete mode: emit every window, incl. ones the final watermark has
    # not yet finalized — append would drop the tail vs the batch run.
    got = _run_stream(
        spark, build_window_agg(stream, spec), "t_tumbling", mode="complete"
    ).collect()
    expected = build_window_agg(load_table(spark, sf_dir, "events"), spec).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_session_window_stream(spark, sf_dir, events_dir):
    spec = WindowAggSpec(
        name="sessions",
        kind="session",
        ts_col="ts",
        duration="30 minutes",
        group_cols=("user_id",),
        aggs={"n_events": "count(*)"},
        watermark="1 minute",
    )
    # complete mode: every merged session emitted (append would hold back
    # sessions newer than the final watermark; update is unsupported here)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_stream(spark, build_window_agg(stream, spec), "t_sessions", mode="complete").collect()
    expected = build_window_agg(load_table(spark, sf_dir, "events"), spec).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_drop_duplicates_within_watermark(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, "A"),
        (1, base + datetime.timedelta(minutes=1), "A-dup"),
        (2, base, "B"),
    ]
    src = str(tmp_path / "dup_events")
    spark.createDataFrame(rows, ["key", "ts", "payload"]).write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("key", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("payload", T.StringType(), True),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = dedup_within_watermark(stream, ["key"], "ts", "10 minutes")
    out = _run_stream(spark, deduped, "t_dedup").collect()
    assert len(out) == 2  # one per key within the watermark horizon


def test_silver_clean_stream(spark, tmp_path):
    rows = [
        ("inv1", "sku1", "widget", 2, 5.0, "123", "UK",
         datetime.datetime(2024, 1, 1, 10)),
        (None, "sku2", "gone", 1, 1.0, "x", "US",
         datetime.datetime(2024, 1, 1, 10)),  # rejected: null invoice
        ("inv3", "sku3", "RETURN damaged", -1, 2.0, "guest", "DE",
         datetime.datetime(2024, 1, 1, 11)),
    ]
    src = str(tmp_path / "txn_events")
    spark.createDataFrame(rows, TRANSACTION_EVENT_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(TRANSACTION_EVENT_SCHEMA).parquet(src)
    out = _run_stream(spark, silver_clean_events(stream), "t_silver").collect()
    by_inv = {r.invoice_no: r for r in out}
    assert set(by_inv) == {"inv1", "inv3"}
    assert by_inv["inv1"].line_total == 10.0 and not by_inv["inv1"].is_return
    assert by_inv["inv3"].is_return and by_inv["inv3"].risk_score == 0.8
    assert by_inv["inv3"].customer_id == "GUEST"


def test_alert_rules(spark):
    agg = spark.createDataFrame(
        [("click", 500.0), ("error", 12000.0)], ["event_type", "total_value"]
    )
    fired = evaluate_alerts(
        agg,
        [
            AlertRule("high_value", "total_value", ">", 10000.0, "critical"),
            AlertRule("negative", "total_value", "<", 0.0),
        ],
    )
    assert fired == [{"rule": "high_value", "severity": "critical", "violations": 1}]


def test_cdc_parse_and_apply(spark):
    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    envelopes = [
        ('{"op":"c","ts_ms":1,"after":{"id":1,"v":"a"},"before":null}',),
        ('{"op":"u","ts_ms":2,"after":{"id":1,"v":"a2"},"before":{"id":1,"v":"a"}}',),
        ('{"op":"d","ts_ms":3,"before":{"id":2,"v":"b"},"after":null}',),
        ('{"op":"c","ts_ms":4,"after":{"id":3,"v":"c"},"before":null}',),
    ]
    raw = spark.createDataFrame(envelopes, ["value"])
    changes = parse_debezium(raw, payload)
    assert {r.op for r in changes.collect()} == {"c", "u", "d"}

    latest = {r.id: r.v for r in latest_state_per_key(changes, ["id"]).collect()}
    assert latest == {1: "a2", 3: "c"}  # id 2's latest op is delete

    target = spark.createDataFrame([(2, "b"), (9, "z")], ["id", "v"])
    merged = {r.id: r.v for r in apply_changes_to_table(target, changes, ["id"]).collect()}
    assert merged == {1: "a2", 3: "c", 9: "z"}  # 2 deleted, 9 untouched


def test_default_specs_build(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "kafka_timestamp")
    for spec in DEFAULT_SPECS:
        df = build_window_agg(events, spec)
        assert df.count() > 0, spec.name


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState running per-user totals: the final emitted
    snapshot per key must equal the batch groupBy over all micro-batches."""
    import datetime

    from pwc_challenge_dataengineer_spark.streaming.stateful import running_user_totals

    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 7, "click", 10.50, "{}"),
        (2, base, 7, "view", 2.25, "{}"),
        (3, base, 8, "click", 5.00, "{}"),
        (4, base, 7, "purchase", 1.25, "{}"),
    ]
    src = str(tmp_path / "stateful_events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(2).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = _run_stream(spark, running_user_totals(stream), "t_stateful", mode="update")
    # update mode re-emits a row per key per touching batch; the running
    # count is monotone, so the max-count row per key IS the final snapshot
    # (no reliance on sink insertion order)
    snap = {}
    for r in out.collect():
        if r.user_id not in snap or r.n_events > snap[r.user_id][0]:
            snap[r.user_id] = (r.n_events, r.total_value)
    assert snap[7] == (3, 14.0)
    assert snap[8] == (1, 5.0)


def test_sliding_stream_matches_batch(spark, sf_dir, events_dir):
    spec = WindowAggSpec(
        name="sliding",
        kind="sliding",
        ts_col="ts",
        duration="2 hours",
        slide="1 hour",
        group_cols=("event_type",),
        aggs={"n_events": "count(*)"},
        watermark="1 minute",
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_stream(
        spark, build_window_agg(stream, spec), "t_sliding", mode="complete"
    ).collect()
    expected = build_window_agg(load_table(spark, sf_dir, "events"), spec).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_stream_stream_join(spark, tmp_path):
    """Stream-stream windowed join: purchases matched to clicks within the
    preceding hour per user; result equals the batch inequality join."""
    import datetime

    from pwc_challenge_dataengineer_spark.streaming.transforms import stream_stream_join

    B = datetime.datetime(2024, 1, 1, 12, 0, 0)
    mins = lambda n: B + datetime.timedelta(minutes=n)
    purchases = [(1, mins(60)), (1, mins(200)), (2, mins(30))]
    clicks = [(1, mins(10)), (1, mins(55)), (1, mins(190)), (2, mins(29)), (2, mins(100))]
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    spark.createDataFrame(purchases, ["user_id", "p_ts"]).write.parquet(pdir)
    spark.createDataFrame(clicks, ["user_id", "c_ts"]).write.parquet(cdir)
    p_schema = "user_id BIGINT, p_ts TIMESTAMP"
    c_schema = "user_id BIGINT, c_ts TIMESTAMP"
    ps = spark.readStream.schema(p_schema).parquet(pdir)
    cs = spark.readStream.schema(c_schema).parquet(cdir)
    joined = stream_stream_join(
        ps, cs, keys=["user_id"], left_ts="p_ts", right_ts="c_ts"
    ).select(ps["user_id"], "p_ts", "c_ts")
    got = sorted(map(tuple, _run_stream(spark, joined, "t_ssj").collect()))
    expected = sorted(
        (u, pt, ct)
        for u, pt in purchases
        for cu, ct in clicks
        if cu == u and pt - datetime.timedelta(hours=1) <= ct <= pt
    )
    assert got == expected


def test_stateful_running_totals_tws(spark, tmp_path):
    """transformWithStateInPandas variant must produce the same final
    snapshots as the applyInPandasWithState path and the batch groupBy.

    The TWS state-server protocol needs google.protobuf in the Python
    workers (pyspark/sql/streaming/proto/StateMessage_pb2); the real
    wheel is absent in this sandbox, so the vendored mini runtime
    (vendor/protoshim, enabled by session.get_spark before JVM launch)
    fills in — this test runs LIVE against the JVM's Java protobuf,
    which is the strongest wire-format check the shim has
    (tests/test_protoshim.py pins the golden bytes)."""
    import datetime

    pytest.importorskip("google.protobuf")  # real wheel or protoshim
    from pwc_challenge_dataengineer_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 7, "click", 10.50, "{}"),
        (2, base, 7, "view", 2.25, "{}"),
        (3, base, 8, "click", 5.00, "{}"),
        (4, base, 7, "purchase", 1.25, "{}"),
    ]
    src = str(tmp_path / "tws_events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(2).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = _run_stream(
            spark, running_user_totals_tws(stream), "t_tws", mode="update"
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    snap = {}
    for r in out.collect():
        if r.user_id not in snap or r.n_events > snap[r.user_id][0]:
            snap[r.user_id] = (r.n_events, r.total_value)
    assert snap[7] == (3, 14.0)
    assert snap[8] == (1, 5.0)


def test_recommended_watermark_retains_99pct(spark, sf_dir, tmp_path):
    """Close the watermark-sizing loop LIVE: replay events in the same
    deterministic arrival order watermark_recommendation models, stream a
    windowed count with the recommended delay, and assert >= 99% of
    events survive the watermark — and that a 0 s watermark does not
    (the test must bite)."""
    from pwc_challenge_dataengineer_spark.plans.streaming_batch import (
        _WM_DELAY_MOD,
        _WM_HASH,
        watermark_recommendation,
    )

    rec_rows = watermark_recommendation(spark, sf_dir).collect()
    # one stream, one watermark: take the max recommended across sources
    rec_s = max(r.recommended_watermark_s for r in rec_rows)
    n_total = sum(r.n_events for r in rec_rows)

    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    arr = events.withColumn(
        "arr_key",
        F.unix_timestamp("ts")
        + (F.col("event_id") * F.lit(_WM_HASH)) % F.lit(_WM_DELAY_MOD),
    )
    src = str(tmp_path / "arrival_stream")
    # 30 chunks in arrival order. FileStreamSource consumes files in
    # MODIFICATION-TIME order, so the chunks must be written sequentially
    # (a parallel range-partitioned write lands with scrambled mtimes and
    # the watermark jumps straight to the stream's end).
    from pyspark.sql.window import Window as _W

    bucketed = arr.withColumn(
        "__b", F.ntile(40).over(_W.orderBy("arr_key", "event_id"))
    ).cache()
    for b in range(1, 41):
        bucketed.filter(F.col("__b") == b).drop("__b").coalesce(
            1
        ).write.mode("append").parquet(src)
    bucketed.unpersist()

    schema = spark.read.parquet(src).schema

    def retained(delay_s: int, name: str) -> int:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        # Late rows drop only against the watermark of the PREVIOUS
        # micro-batch (Spark 3.4+ late-event semantics — verified on this
        # build: a row is accepted in batch N if it beats the watermark
        # committed after batch N-2), so the effective tolerance is
        # delay + one batch's event-time span + the window tail. The
        # 0..3-day straggler model keeps p99 lateness far above that
        # slack at 40 replay batches, which is what lets the 0 s
        # control condition actually drop rows.
        agg = (
            stream.withWatermark("ts", f"{delay_s} seconds")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # update mode re-emits growing counts; the max per window is final
        out = spark.sql(
            f"SELECT SUM(mx) AS total FROM (SELECT window, MAX(n) AS mx "
            f"FROM {name} GROUP BY window)"
        ).collect()
        return out[0].total or 0

    kept = retained(int(rec_s), "t_wm_rec")
    assert kept >= 0.99 * n_total, (kept, n_total, rec_s)
    kept_zero = retained(0, "t_wm_zero")
    # the control must BITE: the measured distribution is ~50% late at
    # replay granularity, so a 0 s watermark loses far more than 1%
    assert kept_zero < 0.99 * n_total, (kept_zero, n_total)
    assert kept_zero < kept, (kept_zero, kept)


def test_session_append_mode_finalizes_on_watermark(spark, tmp_path):
    """Append-mode session windows LIVE under a controlled late-data
    schedule (SURVEY §7.3.9; reference realtime_gold_processor.py:550-580
    emits finalized 30-min customer sessions to files, i.e. append mode).

    Four single-file chunks replayed with maxFilesPerTrigger=1 (file
    source consumes in mtime order), session gap 10 min, watermark 5 min:

      chunk 0: u1@10:00, u1@10:05, u2@10:02        -> wm after b0 = 10:00
      chunk 1: u1@10:07 (LATE but accepted -> merges into u1's open
               session, extending its end to 10:17), u3@11:00
                                                    -> wm after b1 = 10:55
      chunk 2: u3@12:00                             -> wm after b2 = 11:55
      chunk 3: u4@10:06 (TOO LATE: late-row filtering in batch N uses the
               watermark committed after batch N-2 — Spark's one-batch
               lag, measured in test_recommended_watermark_retains_99pct —
               so 10:06 < 10:55 -> dropped, no session may appear for u4),
               u5@13:00 (flush)

    Asserts exact finalized rows INCLUDING the late-merge extension, the
    too-late drop, and that append held back the one session the final
    watermark never passed (u5's) — the property complete mode cannot show.
    """
    base = datetime.datetime(2024, 3, 1, 10, 0, 0)

    def _at(minutes):
        return base + datetime.timedelta(minutes=minutes)

    chunks = [
        [(1, _at(0), 1.0), (1, _at(5), 1.0), (2, _at(2), 1.0)],
        [(1, _at(7), 1.0), (3, _at(60), 1.0)],
        [(3, _at(120), 1.0)],
        [(4, _at(6), 1.0), (5, _at(180), 1.0)],
    ]
    src = str(tmp_path / "session_late_stream")
    for rows in chunks:  # sequential single-file writes -> mtime order
        spark.createDataFrame(
            rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
        ).coalesce(1).write.mode("append").parquet(src)

    spec = WindowAggSpec(
        name="sessions_append",
        kind="session",
        ts_col="ts",
        duration="10 minutes",
        group_cols=("user_id",),
        aggs={"n_events": "count(*)"},
        watermark="5 minutes",
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = {
        (r.user_id, r.window_start, r.window_end, r.n_events)
        for r in _run_stream(
            spark, build_window_agg(stream, spec), "t_sessions_append"
        ).collect()
    }

    finalized = {
        (1, _at(0), _at(17), 3),  # late 10:07 merged: end 10:07+gap
        (2, _at(2), _at(12), 1),
        (3, _at(60), _at(70), 1),
        (3, _at(120), _at(130), 1),
    }
    # u3's 12:00 session finalizes only if the engine ran a no-data batch
    # after chunk 3 (wm eviction lags one batch); accept either, but it
    # must carry exactly these values if present.
    assert finalized - got in (set(), {(3, _at(120), _at(130), 1)}), got
    # too-late u4 event dropped; unfinalized u5 session held back by append
    assert not any(r[0] == 4 for r in got), got
    assert not any(r[0] == 5 for r in got), got
    assert got <= finalized, got
