"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (gold sales_summary) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full registered catalog from
``pwc_challenge_dataengineer_spark.plans.catalog`` — one entry per
implemented operator from SURVEY.md §2, each oracle aliased column-for-column
to its Spark counterpart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pwc_challenge_dataengineer_spark.plans.catalog import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["sales_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
