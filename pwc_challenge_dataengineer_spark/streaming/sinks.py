"""Stream sinks + alert evaluation.

Reference: src/streaming/spark_structured_streaming.py:275-391 (sink
factory: delta/kafka/console/memory/file, output modes, triggers,
checkpoints) and realtime_gold_processor.py:333-397, 608-689 (threshold
alert rules evaluated per micro-batch in foreachBatch).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_OPS = {
    ">": operator.gt,
    ">=": operator.ge,
    "<": operator.lt,
    "<=": operator.le,
    "==": operator.eq,
    "!=": operator.ne,
}


@dataclass(frozen=True)
class AlertRule:
    name: str
    metric_col: str
    op: str  # > >= < <= == !=
    threshold: float
    severity: str = "warning"


def evaluate_alerts(batch_df: DataFrame, rules: list[AlertRule]) -> list[dict]:
    """Scan one micro-batch's aggregate output against threshold rules.

    Runs inside foreachBatch: ONE filtered count per rule over an already
    tiny aggregate frame (not the raw stream)."""
    fired = []
    for r in rules:
        cond = _OPS[r.op](F.col(r.metric_col), F.lit(r.threshold))
        n = batch_df.filter(cond).count()
        if n > 0:
            fired.append(
                {"rule": r.name, "severity": r.severity, "violations": n}
            )
    return fired


def start_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
    trigger: dict | None = None,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    writer = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.trigger(**(trigger or {"availableNow": True})).start()


def start_memory_sink(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Memory sink for tests/dashboards (bounded data only)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def start_foreach_batch(
    df: DataFrame,
    fn,
    checkpoint: str,
    output_mode: str = "update",
    trigger: dict | None = None,
) -> StreamingQuery:
    """foreachBatch sink: exactly-once-ish custom processing per micro-batch
    (Delta MERGE, cache refresh, alert fan-out in the reference)."""
    return (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def start_console_sink(
    df: DataFrame,
    output_mode: str = "append",
    trigger: dict | None = None,
    num_rows: int = 20,
) -> StreamingQuery:
    """Console sink (debug only — serializes through the driver)."""
    return (
        df.writeStream.format("console")
        .outputMode(output_mode)
        .option("numRows", str(num_rows))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def start_kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Kafka sink (requires spark-sql-kafka jars; the caller provides a
    DataFrame with a ``value`` column — use to_json for struct payloads)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"processingTime": "30 seconds"}))
        .start()
    )
