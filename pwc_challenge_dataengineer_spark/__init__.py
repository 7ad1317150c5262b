"""PySpark-native analytics engine with the query and data-processing
capabilities of the PwC-Challenge-DataEngineer reference platform.

Everything here is idiomatic Spark DataFrame / SQL / Structured Streaming:
the logical plan is declared declaratively and Catalyst + Tungsten pick the
physical strategy. No custom execution engine, no RDD hot paths.

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, tuned shuffle partitions)
- ``schemas``    : canonical StructType registry (retail sales, star schema,
                   streaming events, TPC-H-ish test tables)
- ``sources``    : batch readers/writers (CSV/JSON/Parquet, stubs for
                   Excel/JDBC/Delta which need extra deps)
- ``operators``  : reusable DataFrame->DataFrame operators (dedup, windowing,
                   SCD2, joins, pagination, incremental/CDC)
- ``functions``  : column-level libraries (quality, enrichment, text,
                   fuzzy dedup, similarity, multimodal stubs)
- ``plans``      : gold analytics + datamart query layer + star schema build
- ``streaming``  : Structured Streaming sources/transforms/window-agg
                   registry/sinks/CDC
- ``etl``        : medallion bronze/silver/gold pipeline entry points
"""

__version__ = "0.1.0"
