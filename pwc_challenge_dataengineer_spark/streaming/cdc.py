"""CDC ingestion: Debezium/Maxwell envelope parsing + merge apply.

Reference: src/streaming/cdc_processor.py:43-300, 436 — from_json on the
op/before/after envelope, op extraction, last-write-wins conflict
resolution, apply to the target table. Without Delta jars the apply step is
a join+union rewrite inside foreachBatch (same semantics as MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import cdc_envelope_schema


def parse_debezium(raw_json: DataFrame, payload_schema: T.StructType, value_col: str = "value") -> DataFrame:
    """Envelope JSON → (op, key payload columns, ts_ms). Delete events carry
    their row in ``before``; everything else in ``after``."""
    env = cdc_envelope_schema(payload_schema)
    parsed = raw_json.select(F.from_json(F.col(value_col), env).alias("e"))
    return parsed.select(
        F.col("e.op").alias("op"),
        F.col("e.ts_ms").alias("ts_ms"),
        F.when(F.col("e.op") == "d", F.col("e.before"))
        .otherwise(F.col("e.after"))
        .alias("row"),
    ).select("op", "ts_ms", "row.*")


def latest_state_per_key(changes: DataFrame, key_cols: list[str], ts_col: str = "ts_ms") -> DataFrame:
    """Last-write-wins collapse of a change log: newest op per key wins;
    keys whose newest op is a delete drop out."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") != "d"))
        .drop("__rn", "op")
    )


def apply_changes_to_table(target: DataFrame, changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE emulation: target rows not touched by the batch + surviving
    latest states (insert/update applied, deletes removed). With Delta this
    is one ``MERGE INTO``; the anti-join+union has identical semantics and
    stays fully distributed."""
    latest = latest_state_per_key(changes, key_cols)
    touched_keys = changes.select(*key_cols).distinct()
    untouched = target.join(touched_keys, key_cols, "left_anti")
    return untouched.unionByName(latest.select(*target.columns))
