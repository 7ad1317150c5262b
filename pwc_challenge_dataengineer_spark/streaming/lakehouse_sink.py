"""Streaming lakehouse sink: iceberg-lite as a ``foreachBatch`` target
with EXACTLY-ONCE replay semantics.

The reference lands streaming silver data in a lake table (see
/root/reference/src/streaming/realtime_silver_processor.py:704-715 —
its streaming->Delta write path); this is the Spark-first equivalent on
the in-repo Iceberg layout. Each micro-batch commits ONE snapshot whose
summary records the epoch id. Structured Streaming's foreachBatch
contract is at-least-once — after a crash between the table commit and
the checkpoint advance, the SAME batch id is replayed — so the sink
checks the table's own snapshot summaries first and skips ids it
already committed: the table, not the checkpoint, is the source of
truth for idempotence (the standard pattern every transactional-sink
integration uses).

Scale shape: the per-batch data write is one distributed
``repartition(col).write.partitionBy(col)`` job (no per-partition
driver loop, no coalesce funnel); manifest row counts come from the
written parquet footers; the commit itself is metadata-plane (one Avro
manifest + manifest list + JSON per batch). Each batch's files land
under a batch-scoped directory, so a replayed batch that died MID-WRITE
leaves only orphaned files that the re-run overwrites — never
half-visible table state, because visibility is the manifest commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.iceberg_lite import (
    _load_metadata,
    commit_snapshot,
    committed_batch_hwm,
)

_BATCH_KEY = "streaming-batch-id"


def committed_batch_ids(location: str) -> set[int]:
    """Epoch ids already committed to the table, read from the snapshot
    summaries — the replay-dedup source of truth."""
    try:
        md = _load_metadata(location)
    except FileNotFoundError:
        return set()
    if md is None:
        return set()
    out = set()
    for s in md["snapshots"]:
        v = (s.get("summary") or {}).get(_BATCH_KEY)
        if v is not None:
            out.add(int(v))
    return out


def _write_batch(df: DataFrame, part_col: str, out_dir: str):
    """One distributed partitioned write; manifest rows from footers."""
    from ..sources.parquet_meta import read_footer

    dir_col = f"__dir_{part_col}"
    (
        df.withColumn(dir_col, F.col(part_col))
        .repartition(F.col(dir_col))
        .write.mode("overwrite")
        .partitionBy(dir_col)
        .parquet(out_dir)
    )
    entries = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith(dir_col + "="):
            continue
        value = d.split("=", 1)[1]
        pdir = os.path.join(out_dir, d)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                path = os.path.join(pdir, f)
                entries.append((path, value, read_footer(path)[3]))
    return entries


def iceberg_batch_sink(location: str, partition_col: str):
    """Build the ``foreachBatch`` function: commit each micro-batch as
    one snapshot, skipping epoch ids the table already holds (replay
    after a checkpoint/commit race must not double-append)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Replay dedup consults BOTH the live per-snapshot batch ids
        # and the carried-forward high-water mark: snapshot expiration
        # / compaction may have dropped the snapshot that carried this
        # batch's id, but every later commit (including compaction's
        # replace) re-records the HWM in its own summary, and batch ids
        # are monotonic, so id <= HWM means already committed.
        hwm = committed_batch_hwm(location)
        if hwm is not None and batch_id <= hwm:
            return  # replayed batch: already visible in the table
        if batch_id in committed_batch_ids(location):
            return
        out_dir = os.path.join(location, "data", f"batch-{batch_id}")
        entries = _write_batch(batch_df, partition_col, out_dir)
        commit_snapshot(
            location,
            partition_col,
            entries,
            summary={_BATCH_KEY: str(batch_id)},
        )

    return sink
