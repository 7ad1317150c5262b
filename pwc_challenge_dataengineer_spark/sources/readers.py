"""Batch readers.

Mirrors the reference's source surface (SURVEY.md §2.1) with the same option
sets, re-expressed as thin wrappers over ``spark.read`` so Catalyst keeps
pushdown/pruning:

- CSV with the reference's options (reference: src/etl/bronze/spark_bronze.py:98-104,
  src/etl/spark/enhanced_bronze.py:187-197)
- large-file CSV path that skips inference (spark_bronze.py:119-146) — kept
  for API parity, but we do NOT blind-repartition(8); AQE handles splits.
- JSON (enhanced_bronze.py:199-205), Parquet (enhanced_bronze.py:207-209)
- Excel via pandas (enhanced_bronze.py:211-219) — gated on openpyxl
- JDBC (build_gold.py:240-244) — gated, partitioned-read aware
- Delta time travel (delta_lake_manager.py:260-310) — stubbed (no Delta jars
  in this environment); parquet is the storage format here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_DEFAULT_OPTIONS = {
    "header": "true",
    "multiLine": "true",
    "escape": '"',
    "ignoreLeadingWhiteSpace": "true",
    "ignoreTrailingWhiteSpace": "true",
    "timestampFormat": "M/d/yyyy H:mm",
}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan. Explicit schema by default; inference is opt-in (it costs an
    extra full pass over the file — unacceptable on 100 TB inputs)."""
    opts = dict(CSV_DEFAULT_OPTIONS)
    opts.update(options)
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_csv_large(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_columns: int = 50,
    **options: str,
) -> DataFrame:
    """Large-file CSV path: schema mandatory (no inference pass), bounded
    column count. Unlike the reference we do not hard-code repartition(8);
    file splitting + AQE coalescing pick parallelism from the data size."""
    return read_csv(spark, path, schema=schema, maxColumns=str(max_columns), **options)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read.option("multiLine", "true").option(
        "allowComments", "true"
    ).option("allowUnquotedFieldNames", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (built into Spark; same pushdown/pruning surface as parquet —
    PushedFilters + ReadSchema apply identically)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text scan — the raw-corpus entry point
    for document pipelines before any parsing."""
    return spark.read.option("wholetext", str(wholetext).lower()).text(path)


def read_excel(spark: SparkSession, path: str, sheet_name: str | int = 0) -> DataFrame:
    """Excel scan via the pure-stdlib SpreadsheetML parser (sources/xlsx.py
    — zipfile + xml.etree, no openpyxl): driver-side for one reference
    workbook, matching the reference's pandas.read_excel usage
    (enhanced_bronze.py:211-219). For a drop-zone DIRECTORY of workbooks
    use ``xlsx.read_excel_dir`` — binaryFile scan + executor-side parse."""
    from .xlsx import read_excel_stdlib

    return read_excel_stdlib(spark, path, sheet_name)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC scan. For any non-trivial table, pass a partition column so the
    read parallelizes across executors instead of a single connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_delta(
    spark: SparkSession,
    path: str,
    version_as_of: int | None = None,
    timestamp_as_of: str | None = None,
) -> DataFrame:
    """Delta scan with time travel. Prefers delta-spark jars when present;
    without them, falls back to JSON-commit log replay
    (``sources.delta_log.read_delta_log`` — the public-protocol reader:
    tombstone removes, accumulate adds, read the surviving files), which
    covers any Delta table whose log is plain JSON commits. Checkpointed
    logs need the real jars and raise. ``VersionedTable`` +
    ``delta_log.export_delta_log`` are the write side of the same
    protocol."""
    reader = spark.read.format("delta")
    if version_as_of is not None:
        reader = reader.option("versionAsOf", str(version_as_of))
    if timestamp_as_of is not None:
        reader = reader.option("timestampAsOf", timestamp_as_of)
    try:
        return reader.load(path)
    except Exception as exc:  # pragma: no cover - jar-dependent
        # fall back ONLY when the delta data source itself is absent; a
        # genuine Delta error (bad version, corrupt table) with jars
        # present must surface, not be papered over by log replay
        msg = str(exc)
        if not (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source" in msg
            or "Failed to find the data source" in msg
        ):
            raise
        from .delta_log import read_delta_log

        ts_ms = None
        if timestamp_as_of is not None:
            import datetime

            dt = datetime.datetime.fromisoformat(timestamp_as_of)
            if dt.tzinfo is None:
                # session timezone is UTC (session.py); a naive literal
                # must not be re-interpreted in the OS-local zone
                dt = dt.replace(tzinfo=datetime.timezone.utc)
            ts_ms = int(dt.timestamp() * 1000)
        try:
            return read_delta_log(spark, path, version_as_of, ts_ms)
        except FileNotFoundError:
            raise NotImplementedError(
                "Delta reads require delta-spark on the classpath "
                "(no _delta_log JSON commits found to replay)"
            ) from exc


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """XML scan — native in Spark 4 (the spark-xml package was merged
    upstream in 4.0, no jar needed). Schema inference walks the files
    once; pass an explicit schema to skip that pass at scale. rowTag
    selects the repeating element; attributes surface as ``_attr``
    columns."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def _is_missing_avro_source(exc: Exception) -> bool:
    """True ONLY for the specific failed-to-find-data-source condition.

    Matching any message containing "avro" (the former check) would also
    catch a genuine error raised while the spark-avro jar IS present —
    e.g. a missing path named ``.../orders_avro`` — and silently retry it
    through the more limited avrolite reader, masking the real failure.
    """
    from pyspark.errors import AnalysisException

    cond = ""
    if isinstance(exc, AnalysisException):
        for probe in ("getCondition", "getErrorClass"):
            try:
                cond = getattr(exc, probe)() or ""
                if cond:
                    break
            except Exception:
                continue
    return (
        cond in ("DATA_SOURCE_NOT_FOUND", "FAILED_TO_LOAD_DATA_SOURCE")
        or "Failed to find data source: avro" in str(exc)
    )


def read_avro(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Avro scan. Prefers the JVM spark-avro module when its jar is on the
    classpath (columnar, codegen'd); without it, falls back to the
    pure-stdlib ``avrolite`` Python DataSource (sources/avrolite.py) —
    same container format, split-parallel reads, codecs null/deflate.
    The former hard NotImplementedError gate is thus closed jar-free,
    the same way ``kafkalike`` closed the Kafka gate."""
    try:
        reader = spark.read.format("avro")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(path)
    except Exception as exc:
        if not _is_missing_avro_source(exc):
            raise
        from .avrolite import register_avrolite

        register_avrolite(spark)
        reader = spark.read.format("avrolite")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(path)
