"""Custom Spark 4 Python DataSource (pyspark.sql.datasource) — the
connector-extensibility surface of SURVEY §2.1: when a feed has no
built-in reader (internal REST APIs, proprietary tick feeds, device
telemetry), the Python DataSource API is the idiomatic Spark-4 way to make
it a first-class parallel source — partition planning on the driver, row
generation executor-side, schema declared up front — instead of
collect()-ing into createDataFrame (the driver-bottleneck anti-pattern).

``synthetic_ticks`` generates a deterministic tick series so the whole
path is oracle-verifiable: every field is a closed form of the row index,
which the DuckDB oracle of ``custom_datasource_ticks`` recomputes
analytically. Partitioning is real: ``partitions()`` splits the row range
into N ``RangePartition``s and each executor task generates only its
slice — reading with 8 partitions yields an 8-task scan, no driver data
movement.

Determinism contract: (seed, n_rows) fully define the dataset; re-reads
and retried tasks regenerate identical rows (a requirement for
exactly-once semantics under task retry at scale).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


class RangePartition(InputPartition):
    def __init__(self, part_id: int, start: int, end: int):
        self.part_id = part_id
        self.start = start
        self.end = end


def _tick_row(seed: int, i: int):
    """Closed-form tick generation — mirrored verbatim by the DuckDB
    oracle in plans/streaming_batch.py::custom_datasource_ticks."""
    import datetime

    price_cents = (seed * 31 + i * 17) % 100000
    qty = i % 7 + 1
    ts = datetime.datetime.fromtimestamp(
        _EPOCH_2024 + i, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (i, ts, price_cents, qty)


class TicksReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)  # ceil split
        return [
            RangePartition(p, p * per, min((p + 1) * per, self.n_rows))
            for p in range(self.n_partitions)
            if p * per < self.n_rows
        ]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            tick_id, ts, price_cents, qty = _tick_row(self.seed, i)
            yield (tick_id, partition.part_id, ts, price_cents, qty)


class TicksDataSource(DataSource):
    """spark.read.format("synthetic_ticks") after
    spark.dataSource.register(TicksDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return (
            "tick_id bigint, part_id int, ts timestamp, "
            "price_cents bigint, qty int"
        )

    def reader(self, schema):
        return TicksReader(self.options)


def register_ticks_source(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(TicksDataSource)


# --- Streaming variant -----------------------------------------------------
#
# SimpleDataSourceStreamReader is the micro-batch half of the same API:
# the engine asks for [start, next) slices, offsets are plain dicts that
# land in the checkpoint WAL, and readBetweenOffsets() must be able to
# REPLAY any committed slice after a crash — which the deterministic
# closed form gives for free (same property the batch reader's task-retry
# contract relies on). Each trigger emits `batch_size` ticks.

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class TicksStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 100))
        self.seed = int(options.get("seed", 0))
        self.max_rows = int(options.get("max_rows", 10**9))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch_size, self.max_rows)
        # materialized list, not a generator: the prefetched slice is
        # PICKLED into the micro-batch plan for the executors
        return list(self.readBetweenOffsets(start, {"i": hi})), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        for i in range(start["i"], end["i"]):
            tick_id, ts, price_cents, qty = _tick_row(self.seed, i)
            yield (tick_id, 0, ts, price_cents, qty)


class TicksStreamDataSource(DataSource):
    """spark.readStream.format("synthetic_ticks_stream")."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks_stream"

    def schema(self) -> str:
        return (
            "tick_id bigint, part_id int, ts timestamp, "
            "price_cents bigint, qty int"
        )

    def simpleStreamReader(self, schema):
        return TicksStreamReader(self.options)


def register_ticks_stream_source(spark) -> None:
    spark.dataSource.register(TicksStreamDataSource)
