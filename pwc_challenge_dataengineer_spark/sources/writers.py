"""Batch writers.

Partitioned parquet sinks with the reference's layouts (SURVEY.md §2.1:
bronze partitioned by ingestion_date, silver by invoice_year, gold by
country — spark_bronze.py:321, spark_silver.py:288-293, spark_gold.py:201-221).

Scale notes baked in:
- never ``coalesce(1)`` (the reference does; it serializes the whole write
  through one task) — callers get AQE-coalesced output files instead.
- ``maxRecordsPerFile`` caps file size at high SF so a skewed partition
  (e.g. country=United Kingdom) doesn't produce one monster file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """JDBC sink (reference build_gold.py:252 fact append)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (native in Spark 4). One file per task like any
    FileFormat sink — the writer parallelizes; do not coalesce(1)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (built-in; same partitioned-layout semantics as parquet)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
