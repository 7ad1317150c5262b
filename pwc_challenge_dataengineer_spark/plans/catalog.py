"""Query/oracle registry backing the driver contract.

Every query is a ``(spark, sf_dir) -> DataFrame`` callable registered under a
stable name; ``ORACLES[name]`` holds the equivalent ANSI SQL that DuckDB runs
over the same parquet tables. The driver hash-compares both sides
(order-insensitive, columns sorted by name), so:

- every computed column is aliased identically in both dialects;
- floating aggregates are rounded (2dp money, 6dp ratios) on BOTH sides so
  IEEE summation-order differences between engines can't flip the hash;
- counts that DuckDB would widen to HUGEINT are cast back to BIGINT;
- ranking windows always carry a deterministic tiebreaker key.

Queries without an oracle (genuinely non-SQL-expressible: MinHash LSH,
SimHash, ANN, streaming-stateful) register with ``oracle=None`` and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_QUERY_MODULES = (
    "gold",
    "windows",
    "joins_sets",
    "aggregates",
    "datamart",
    "quality_enrich",
    "text_dedup",
    "similarity",
    "streaming_batch",
    "incremental",
    "star_schema",
    "ml_analytics",
    "matview_alerts",
    "behavior",
    "schema_evolution",
    "feature_pipeline",
    "dbt_checks",
    "storage_layout",
    "pii_text",
    "text_retrieval",
    "sampling",
    "scale_patterns",
    "sketch_parity",
    "python_surface",
    "graph",
    "attribution",
    "timeseries",
    "tpch",
    "training_prep",
    "linkage_spatial",
    "recursive_sql",
    "web_curation",
    "media_meta",
    "curation_extras",
    "lakehouse",
)


def _load_all() -> None:
    """Import every module that registers queries (import side effects)."""
    import importlib

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(f".{mod}", __package__)
        except ModuleNotFoundError as exc:
            if exc.name and exc.name.endswith(mod):
                continue  # module not written yet
            raise


_load_all()
