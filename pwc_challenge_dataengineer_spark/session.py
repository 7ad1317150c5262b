"""SparkSession factory.

Reference builds one session per ETL stage with AQE + Kryo + a warehouse dir
(reference: src/etl/bronze/spark_bronze.py:32-55, src/etl/spark/session_manager.py:217-219).
We centralize that into a single factory with scale-aware defaults:

- AQE on (runtime coalescing, skew-join splitting, auto-broadcast demotion)
- ``spark.sql.shuffle.partitions`` sized to cores for local mode; on a real
  cluster this should be ~2-3x total executor cores (or left to AQE's
  coalescing with a high initial value).
- UTC session timezone so results are comparable across engines (DuckDB
  oracle timestamps are UTC-naive).
- Arrow enabled for the pandas-UDF slow paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "pwc-challenge-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-sane defaults.

    In local mode there is a single JVM; ``spark.driver.memory`` must be set
    before JVM launch, so we only set it if no session exists yet.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS

    # google.protobuf (needed worker-side by transformWithStateInPandas's
    # state-server protocol) is absent in this environment; the vendored
    # mini runtime fills in BEFORE JVM launch so spawned Python workers
    # inherit it via PYTHONPATH. No-op where the real wheel exists.
    from .vendor import enable_protoshim

    enable_protoshim()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # The events table stores TIMESTAMP(NANOS) which Spark rejects by
        # default; read nanos as long and convert in schemas.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
