"""Windowed-aggregation registry for streams.

Reference: src/streaming/realtime_gold_processor.py:168-331 defines a catalog
of window aggregations (hourly revenue by country, 15-min segment perf,
5-min quality, product popularity sliding windows, 30-min customer sessions,
global ops metrics) driven by config dicts; :487-606 materializes them. Here
the registry is a dataclass + one builder that handles all four window
kinds; aggregate expressions are SQL strings (``F.expr``) exactly like the
reference's expr-maps.

Scale notes: watermark bounds state; ``update`` mode for dashboards,
``append`` for downstream files (finalized windows only). Session windows
require the watermark for state eviction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class WindowAggSpec:
    name: str
    kind: str  # tumbling | sliding | session | global
    ts_col: str
    duration: str | None = None  # window length / session gap
    slide: str | None = None  # sliding only
    group_cols: tuple[str, ...] = ()
    aggs: dict[str, str] = field(default_factory=dict)  # alias -> SQL expr
    watermark: str = "10 minutes"
    filter_expr: str | None = None  # pre-agg filter (reference :424-426)


DEFAULT_SPECS = (
    WindowAggSpec(
        name="hourly_by_type",
        kind="tumbling",
        ts_col="kafka_timestamp",
        duration="1 hour",
        group_cols=("event_type",),
        aggs={
            "n_events": "count(*)",
            "total_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
        },
    ),
    WindowAggSpec(
        name="popularity_10m_2m",
        kind="sliding",
        ts_col="kafka_timestamp",
        duration="10 minutes",
        slide="2 minutes",
        group_cols=("event_type",),
        aggs={"n_events": "count(*)"},
    ),
    WindowAggSpec(
        name="customer_sessions",
        kind="session",
        ts_col="kafka_timestamp",
        duration="30 minutes",
        group_cols=("user_id",),
        aggs={
            "n_events": "count(*)",
            "session_value": "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)",
        },
        watermark="5 minutes",
    ),
    WindowAggSpec(
        name="ops_global",
        kind="global",
        ts_col="kafka_timestamp",
        group_cols=("event_type",),
        aggs={"n_events": "count(*)", "avg_value": "avg(value)"},
    ),
)


def build_window_agg(stream: DataFrame, spec: WindowAggSpec) -> DataFrame:
    """Materialize one spec on a (possibly streaming) DataFrame.

    Works identically on batch DataFrames — the batch oracle queries in
    plans/streaming_batch.py reuse it.
    """
    df = stream
    if spec.filter_expr:
        df = df.filter(F.expr(spec.filter_expr))
    if df.isStreaming:
        df = df.withWatermark(spec.ts_col, spec.watermark)

    if spec.kind == "tumbling":
        window, struct_name = F.window(spec.ts_col, spec.duration), "window"
    elif spec.kind == "sliding":
        window, struct_name = F.window(spec.ts_col, spec.duration, spec.slide), "window"
    elif spec.kind == "session":
        window, struct_name = F.session_window(spec.ts_col, spec.duration), "session_window"
    elif spec.kind == "global":
        window, struct_name = None, None
    else:
        raise ValueError(f"unknown window kind: {spec.kind}")

    keys = ([window] if window is not None else []) + [F.col(c) for c in spec.group_cols]
    aggs = [F.expr(expr).alias(alias) for alias, expr in spec.aggs.items()]
    out = df.groupBy(*keys).agg(*aggs)
    if window is not None:
        out = out.select(
            F.col(f"{struct_name}.start").alias("window_start"),
            F.col(f"{struct_name}.end").alias("window_end"),
            *spec.group_cols,
            *spec.aggs.keys(),
        )
    return out
