"""Canonical schema registry.

The reference declares one explicit schema for the retail sales table
(reference: src/etl/bronze/spark_bronze.py:20-29), a column-normalization map
(spark_bronze.py:183-209), a streaming event schema implied by the silver
stream cleaning (realtime_silver_processor.py:756-798), and an inferred star
schema (SURVEY.md §1.4 / FIXTURES.md §2). All of them live here as explicit
``StructType``s — schema inference is opt-in, never the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Retail sales (bronze canonical), reference spark_bronze.py:20-29
# ---------------------------------------------------------------------------

RAW_SALES_SCHEMA = T.StructType(
    [
        T.StructField("InvoiceNo", T.StringType(), True),
        T.StructField("StockCode", T.StringType(), True),
        T.StructField("Description", T.StringType(), True),
        T.StructField("Quantity", T.IntegerType(), True),
        T.StructField("InvoiceDate", T.StringType(), True),  # "M/d/yyyy H:mm"
        T.StructField("UnitPrice", T.DoubleType(), True),
        T.StructField("CustomerID", T.StringType(), True),
        T.StructField("Country", T.StringType(), True),
    ]
)

# Normalization map, reference spark_bronze.py:183-209.
COLUMN_NORMALIZATION = {
    "InvoiceNo": "invoice_no",
    "StockCode": "stock_code",
    "Description": "description",
    "Quantity": "quantity",
    "InvoiceDate": "invoice_timestamp",
    "UnitPrice": "unit_price",
    "CustomerID": "customer_id",
    "Country": "country",
}

REQUIRED_SALES_COLUMNS = list(COLUMN_NORMALIZATION.values())

INVOICE_TIMESTAMP_FORMAT = "M/d/yyyy H:mm"  # spark_bronze.py:102

# ---------------------------------------------------------------------------
# Streaming transaction events (Kafka JSON value), FIXTURES.md §3
# ---------------------------------------------------------------------------

TRANSACTION_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("invoice_no", T.StringType(), True),
        T.StructField("stock_code", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("unit_price", T.DoubleType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("kafka_timestamp", T.TimestampType(), True),
    ]
)

# Debezium-style CDC envelope (reference src/streaming/cdc_processor.py:219).
def cdc_envelope_schema(payload: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),  # c/u/d/r
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("table", T.StringType(), True),
                        T.StructField("lsn", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


# ---------------------------------------------------------------------------
# Star schema (gold), SURVEY.md §1.4 / FIXTURES.md §2
# ---------------------------------------------------------------------------

FACT_SALE_SCHEMA = T.StructType(
    [
        T.StructField("sale_id", T.LongType(), False),
        T.StructField("date_key", T.IntegerType(), True),
        T.StructField("product_key", T.LongType(), True),
        T.StructField("customer_key", T.LongType(), True),  # nullable dim key
        T.StructField("country_key", T.LongType(), True),
        T.StructField("invoice_key", T.LongType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("unit_price", T.DoubleType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("discount_amount", T.DoubleType(), True),
        T.StructField("tax_amount", T.DoubleType(), True),
        T.StructField("profit_amount", T.DoubleType(), True),
        T.StructField("margin_percentage", T.DoubleType(), True),
        T.StructField("invoice_timestamp", T.TimestampType(), True),
    ]
)

SCD2_COLUMNS = ["valid_from", "valid_to", "is_current", "version"]

# ---------------------------------------------------------------------------
# Driver-generated TPC-H-ish test tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table.

    The ``events`` table stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright. We flip the legacy nanos-as-long conf (safe at
    runtime, also on a caller-provided session), then rebuild an NTZ
    timestamp at microsecond precision — ``DIV 1000`` in integer space so no
    precision is lost through doubles, truncating exactly like DuckDB does.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the test tables as temp views for the Spark SQL surface."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
