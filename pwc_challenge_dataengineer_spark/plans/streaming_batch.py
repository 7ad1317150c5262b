"""Streaming operators, batch-checked (SURVEY.md §2.9).

Structured Streaming window functions (`window`, `session_window`) evaluate
identically on batch DataFrames, so the window-agg registry
(streaming/windows.py) is verified here against DuckDB arithmetic oracles;
the streaming-only behaviors (watermark lateness, dropDuplicatesWithin-
Watermark, foreachBatch, triggers) are exercised in tests/test_streaming.py
with availableNow triggers.

- tumbling_hourly     window(ts, '1 hour')  ↔ epoch-aligned date_trunc
- sliding_10m_5m      window(ts, '10m', '5m') ↔ two shifted 5-min buckets
- session_window_30m  session_window(ts, '30m') per user ↔ gap-based
                      sessionization (new session iff gap >= 30 min)
- stream_dedup_first  dropDuplicates keep-first semantics, batch-projected
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from ..streaming.windows import WindowAggSpec, build_window_agg
from .catalog import register


@register(
    "tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    spec = WindowAggSpec(
        name="hourly_by_type",
        kind="tumbling",
        ts_col="ts",
        duration="1 hour",
        group_cols=("event_type",),
        aggs={
            "n_events": "count(*)",
            "total_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
        },
    )
    return build_window_agg(events, spec)


@register(
    "sliding_10m_5m",
    oracle="""
    WITH starts AS (
        SELECT event_id, event_type,
               unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                       time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])
                   AS window_start
        FROM events
    )
    SELECT window_start, window_start + INTERVAL 10 MINUTE AS window_end,
           event_type, COUNT(*) AS n_events
    FROM starts
    GROUP BY 1, 2, 3
    """,
)
def sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event lands in 2 overlapping windows (10-min length, 5-min
    slide); the oracle materializes both epoch-aligned starts explicitly."""
    events = load_table(spark, sf_dir, "events")
    spec = WindowAggSpec(
        name="popularity_10m_5m",
        kind="sliding",
        ts_col="ts",
        duration="10 minutes",
        slide="5 minutes",
        group_cols=("event_type",),
        aggs={"n_events": "count(*)"},
    )
    return build_window_agg(events, spec)


@register(
    "session_window_30m",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 30 MINUTE AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, '30 minutes') per user. Session end = last event +
    gap; a new session starts when the gap is >= the duration (boundary
    event at exactly start+gap does NOT extend)."""
    events = load_table(spark, sf_dir, "events")
    spec = WindowAggSpec(
        name="customer_sessions",
        kind="session",
        ts_col="ts",
        duration="30 minutes",
        group_cols=("user_id",),
        aggs={
            "n_events": "count(*)",
            "session_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
        },
    )
    out = build_window_agg(events, spec)
    return out.select("user_id", "window_start", "window_end", "n_events", "session_value")


@register(
    "stream_dedup_first",
    oracle="""
    SELECT user_id, event_type, ts AS first_ts, event_id
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-FIRST per key — the batch projection of
    dropDuplicatesWithinWatermark semantics (earliest event survives within
    the horizon). The true streaming form runs in tests/test_streaming.py."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("first_ts"), "event_id")
    )


@register(
    "late_arrival_accounting",
    oracle="""
    WITH seq AS (
        SELECT event_id, ts, event_type,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS high_water
        FROM events
    ),
    flagged AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(date_diff('second', ts, high_water) AS BIGINT)
                   AS skew_s
        FROM seq
    )
    SELECT hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN skew_s > 600 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(MAX(skew_s) AS BIGINT) AS max_skew_s,
           ROUND(CAST(SUM(skew_s) AS DOUBLE) / COUNT(*), 2) AS avg_skew_s
    FROM flagged GROUP BY 1
    """,
)
def late_arrival_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness accounting — the measurement that SIZES a
    streaming watermark: replay events in arrival order (event_id is the
    arrival proxy), track the event-time high-water mark, and report per
    event-time hour how many events arrived more than 10 minutes behind
    it plus the worst/average lateness. Run this before choosing
    withWatermark()'s delay and dropDuplicatesWithinWatermark's window
    (streaming/windows.py); an unbounded max_skew_s says the source needs
    reordering or a bigger state budget.

    The running high-water window is per-arrival-sequence — at cluster
    scale arrival order exists per source partition (a Kafka partition),
    so the window partitions by source partition id and this global
    emulation is the single-partition special case. Exact integer
    second-diffs; one double division rounded at 2dp."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seq = events.select(
        "ts", F.max("ts").over(w).alias("high_water")
    )
    flagged = seq.select(
        F.date_trunc("hour", "ts").alias("hour"),
        (
            F.unix_timestamp("high_water") - F.unix_timestamp("ts")
        ).cast("bigint").alias("skew_s"),
    )
    return flagged.groupBy("hour").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("skew_s") > 600, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max("skew_s").cast("bigint").alias("max_skew_s"),
        F.round(
            F.sum("skew_s").cast("double") / F.count("*"), 2
        ).alias("avg_skew_s"),
    )


# Synthetic arrival-delay model: 0..3 days per event, hash of event_id —
# the straggler-client shape (mobile devices syncing days later) rather
# than network jitter: the events table spans a month, so meaningful
# reordering at replay granularity needs delays comparable to the
# stream's batch span, and day-scale stragglers are the realistic source
# of exactly that in event analytics.
_WM_DELAY_MOD = 259201
_WM_HASH = 2654435761  # Knuth multiplicative constant


@register(
    "watermark_recommendation",
    oracle=f"""
    WITH arr AS (
        SELECT event_id, event_type, ts,
               epoch_us(ts) // 1000000
               + (event_id * {_WM_HASH}) % {_WM_DELAY_MOD} AS arr_key
        FROM events
    ),
    seq AS (
        SELECT event_type, event_id, ts,
               MAX(ts) OVER (ORDER BY arr_key, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS hw
        FROM arr
    ),
    late AS (
        SELECT event_type, event_id,
               GREATEST(CAST(0 AS BIGINT),
                        CAST(date_diff('second', ts, hw) AS BIGINT))
                   AS skew_s
        FROM seq
    ),
    ranked AS (
        SELECT event_type, skew_s,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY skew_s, event_id)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM late
    ),
    rec AS (
        SELECT event_type, MAX(n) AS n_events,
               MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN skew_s END)
                   AS recommended_watermark_s
        FROM ranked GROUP BY 1
    )
    SELECT r.event_type, r.n_events, r.recommended_watermark_s,
           ROUND(CAST(SUM(CASE WHEN l.skew_s <= r.recommended_watermark_s
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / r.n_events, 6) AS retained_fraction
    FROM rec r JOIN late l USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def watermark_recommendation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the loop late_arrival_accounting opens: per source
    (event_type), recommend withWatermark()'s delay as the exact discrete
    p99 of observed per-event lateness, and emit the retained fraction
    that delay achieves on the measured distribution (>= 0.99 by
    construction of the quantile pick — the column PROVES it rather than
    asserting it).

    The batch tables record no arrival time, so arrival is a documented
    deterministic model: arrival key = event-time seconds + a Knuth-hash
    straggler delay of 0..3 days per event_id (the same permutation in
    both engines — see _WM_DELAY_MOD for why day-scale). Lateness = event-time high-water at arrival minus own
    event time, floored at 0. tests/test_streaming.py replays the same
    arrival order through a LIVE stream with the recommended delay and
    asserts >= 99% of events survive the watermark — and that a 0 s
    watermark does not.

    Scale shape: the arrival-order high-water window is the same
    per-source-partition sequence as late_arrival_accounting (global
    emulation = single-partition special case; a Kafka deployment
    partitions it by source partition id); the quantile is an exact
    position pick per source, never a global sort of the corpus."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    arr = events.select(
        "event_id",
        "event_type",
        "ts",
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            + (F.col("event_id") * F.lit(_WM_HASH)) % F.lit(_WM_DELAY_MOD)
        ).alias("arr_key"),
    )
    w_arr = Window.orderBy("arr_key", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seq = arr.select(
        "event_type",
        "event_id",
        "ts",
        F.max("ts").over(w_arr).alias("hw"),
    )
    late = seq.select(
        "event_type",
        "event_id",
        F.greatest(
            F.lit(0).cast("bigint"),
            (
                F.unix_timestamp(F.col("hw").cast("timestamp"))
                - F.unix_timestamp(F.col("ts").cast("timestamp"))
            ).cast("bigint"),
        ).alias("skew_s"),
    ).localCheckpoint(eager=False)
    w_rank = Window.partitionBy("event_type").orderBy("skew_s", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = late.select(
        "event_type",
        "skew_s",
        F.row_number().over(w_rank).cast("bigint").alias("rn"),
        F.count("*").over(w_all).cast("bigint").alias("n"),
    )
    rec = ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(99 * n + 99) div 100"),
                F.col("skew_s"),
            )
        ).alias("recommended_watermark_s"),
    )
    return (
        rec.join(late, "event_type")
        .groupBy("event_type", "n_events", "recommended_watermark_s")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("skew_s") <= F.col("recommended_watermark_s"), 1
                    ).otherwise(0)
                ).cast("double")
                / F.col("n_events"),
                6,
            ).alias("retained_fraction")
        )
    )


_TICKS_N = 50000
_TICKS_SEED = 7


@register(
    "custom_datasource_ticks",
    oracle=f"""
    WITH ticks AS (
        SELECT i AS tick_id,
               ({_TICKS_SEED} * 31 + i * 17) % 100000 AS price_cents,
               i % 7 + 1 AS qty
        FROM (SELECT unnest(range(0, {_TICKS_N})) AS i)
    )
    SELECT CAST(tick_id % 10 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(price_cents * qty) AS BIGINT) AS notional_cents,
           CAST(MIN(price_cents) AS BIGINT) AS min_price_cents,
           CAST(MAX(price_cents) AS BIGINT) AS max_price_cents
    FROM ticks
    GROUP BY 1
    """,
)
def custom_datasource_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads the custom Python DataSource (sources/python_datasource.py —
    the Spark-4 connector-extensibility API) with real partition planning:
    8 RangePartitions generate their row slices executor-side, no driver
    data movement, and the deterministic closed form makes the whole
    source path oracle-verifiable — the DuckDB oracle regenerates the
    ticks analytically, so schema mapping, partition boundaries (a
    dropped/duplicated slice changes the counts) and value fidelity are
    all hash-checked. Aggregation is one map-side-combined groupBy on a
    derived bucket; notional stays in exact integer cents."""
    from ..sources.python_datasource import register_ticks_source

    register_ticks_source(spark)
    df = (
        spark.read.format("synthetic_ticks")
        .option("n_rows", str(_TICKS_N))
        .option("n_partitions", "8")
        .option("seed", str(_TICKS_SEED))
        .load()
    )
    return (
        df.groupBy((F.col("tick_id") % 10).alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_ticks"),
            F.sum(F.col("price_cents") * F.col("qty"))
            .cast("bigint")
            .alias("notional_cents"),
            F.min("price_cents").cast("bigint").alias("min_price_cents"),
            F.max("price_cents").cast("bigint").alias("max_price_cents"),
        )
    )


_KL_N = 2000  # records produced into the kafkalike broker
_KL_PARTS = 4
# per-partition starting offsets for the ranged read (exercises the
# earliest-special -2 and explicit offsets in the oracled path)
_KL_STARTS = {0: 100, 1: 0, 2: 0, 3: 250}


@register(
    "kafkalike_topic_ingest",
    oracle=f"""
    WITH rec AS (
        SELECT i,
               i % {_KL_PARTS} AS partition,
               i // {_KL_PARTS} AS "offset",
               (i * 7919 + 13) % 100000 AS amount_cents
        FROM (SELECT unnest(range(0, {_KL_N})) AS i)
    )
    SELECT CAST(partition AS INT) AS partition,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
           CAST(MIN("offset") AS BIGINT) AS first_offset,
           CAST(MAX("offset") AS BIGINT) AS last_offset
    FROM rec
    WHERE "offset" >= CASE partition
        WHEN 0 THEN {_KL_STARTS[0]} WHEN 1 THEN {_KL_STARTS[1]}
        WHEN 2 THEN {_KL_STARTS[2]} ELSE {_KL_STARTS[3]} END
    GROUP BY partition
    """,
)
def kafkalike_topic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-semantics connector end-to-end through the oracle gate: a
    deterministic closed-form event stream is produced into a file-backed
    kafkalike broker (sources/kafkalike.py — the jar-free stand-in for
    the reference's Kafka source, src/streaming/
    spark_structured_streaming.py:157-183), then batch-read with the
    real option surface (subscribe + per-partition startingOffsets JSON
    mixing explicit offsets and the -2 earliest special), JSON-decoded
    and aggregated per partition. The DuckDB oracle regenerates the
    stream analytically, so partition routing, offset assignment,
    ranged-read boundaries and value fidelity are all hash-checked.
    One Spark task per topic-partition — the real connector's
    partition->task mapping."""
    import json as _json
    import tempfile

    from ..sources.kafkalike import KafkaLikeBroker, register_kafkalike

    root = tempfile.mkdtemp(prefix="kafkalike_demo_")
    broker = KafkaLikeBroker(root)
    broker.create_topic("events", partitions=_KL_PARTS)
    for i in range(_KL_N):
        broker.produce(
            "events",
            _json.dumps({"a": (i * 7919 + 13) % 100000}),
            key=f"k{i}",
            partition=i % _KL_PARTS,
        )
    register_kafkalike(spark)
    starts = _json.dumps(
        {"events": {"0": _KL_STARTS[0], "1": -2, "2": 0, "3": _KL_STARTS[3]}}
    )
    df = (
        spark.read.format("kafkalike")
        .option("path", root)
        .option("subscribe", "events")
        .option("startingOffsets", starts)
        .load()
    )
    return (
        df.withColumn(
            "amount_cents",
            F.get_json_object(F.col("value").cast("string"), "$.a").cast(
                "bigint"
            ),
        )
        .groupBy("partition")
        .agg(
            F.count("*").cast("bigint").alias("n_records"),
            F.sum("amount_cents").cast("bigint").alias("total_cents"),
            F.min("offset").cast("bigint").alias("first_offset"),
            F.max("offset").cast("bigint").alias("last_offset"),
        )
    )
