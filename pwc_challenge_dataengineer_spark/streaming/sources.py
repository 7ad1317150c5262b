"""Streaming source factory.

Reference: src/streaming/spark_structured_streaming.py:130-264 — kafka,
socket, rate, file-watch, delta sources with rate caps. Same surface, thin
wrappers over ``spark.readStream`` so options stay declarative.

Scale notes: ``maxOffsetsPerTrigger`` / ``maxFilesPerTrigger`` bound
micro-batch size (backpressure); partitions of the Kafka topic set source
parallelism — repartition after parse only if the key distribution is skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int = 10_000,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka stream (requires the spark-sql-kafka package on the classpath;
    not bundled in this environment). The full option-surface SEMANTICS —
    subscribe, startingOffsets (earliest/latest/per-partition JSON),
    maxOffsetsPerTrigger rate allocation, failOnDataLoss — are proven
    jar-free by the ``kafkalike`` Python DataSource
    (sources/kafkalike.py, tests/test_kafkalike.py), which emits the same
    wire schema; swap ``format("kafka")`` in when the jar is present."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def parse_kafka_json(raw: DataFrame, schema: T.StructType, ts_col: str = "kafka_timestamp") -> DataFrame:
    """value bytes → typed columns; Kafka ingest time kept as event-time
    fallback (reference realtime_silver_processor.py:684-721)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j"),
        F.col("timestamp").alias(ts_col),
    ).select("j.*", ts_col)


def file_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )
