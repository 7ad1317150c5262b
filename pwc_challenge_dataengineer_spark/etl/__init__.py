"""Medallion pipeline: bronze (typed ingest + metadata + quality flags) →
silver (clean/filter/dedup/quality report) → gold (analytics tables + star
schema). Reference: scripts/run_etl_spark.py lifecycle (SURVEY.md §3.1)."""

from .bronze import ingest_bronze  # noqa: F401
from .gold_etl import build_gold_tables  # noqa: F401
from .silver import process_silver  # noqa: F401
