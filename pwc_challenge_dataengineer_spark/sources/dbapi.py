"""Partitioned SQL-database reads/writes over Python DB-API — the JDBC
capability, testable in this environment.

Spark's JDBC source (reference: build_gold.py:240-252 writes gold marts to
Postgres) needs a JDBC driver jar and a live database, neither of which
ships here. The CAPABILITY it provides, though — range-partitioned parallel
reads with predicate pushdown, and per-partition batched appends — is a
connector pattern, not a jar: this module implements it over any picklable
DB-API ``connect`` factory (a top-level function or functools.partial that
returns a DB-API connection — it is shipped to the executors), exercised
against stdlib sqlite3 in tests. Partition semantics mirror spark.read.jdbc
exactly: ``num_partitions`` range slices of ``partition_column`` between the
bounds, first slice open below, last open above, so every row appears
exactly once regardless of bounds tightness. Each slice's SELECT runs
INSIDE an executor task — the driver never holds the table, and the slice
specs are seeded with sparkContext.parallelize(..., numSlices=n) so each
slice gets its own task (a hash repartition of n strings routinely
collides, silently serializing slices).

sqlite-specific honesty: it allows one writer at a time, so the append sink
serializes on the file lock (busy-timeout retries) — a server database
takes the partition appends genuinely in parallel.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_PY2SPARK = {int: "bigint", float: "double", str: "string", bytes: "binary", bool: "boolean"}
_WIDEN = {"boolean": 0, "bigint": 1, "double": 2, "string": 3, "binary": 3}


def sqlite_connect(db_path: str) -> Callable:
    """Picklable connect factory for a sqlite file (the test database)."""
    from functools import partial
    import sqlite3

    return partial(sqlite3.connect, db_path)


def _probe_schema(connect: Callable, query: str, probe_rows: int = 100) -> str:
    """Column names/types from a bounded probe. Value types over up to
    ``probe_rows`` rows, merged along boolean<bigint<double<string — one
    row is not enough (a leading NULL in a numeric column would pin
    'string' and crash the Arrow conversion on the executors); columns
    that are NULL through the whole probe fall back to string."""
    con = connect()
    try:
        cur = con.cursor()  # DB-API cursor (con.execute is sqlite-only sugar)
        cur.execute(f"SELECT * FROM ({query}) LIMIT {probe_rows}")
        names = [d[0] for d in cur.description]
        types: list[str | None] = [None] * len(names)
        for row in cur.fetchall():
            for i, v in enumerate(row):
                if v is None:
                    continue
                t = _PY2SPARK.get(type(v), "string")
                if types[i] is None or _WIDEN[t] > _WIDEN[types[i]]:
                    types[i] = t
        return ", ".join(
            f"`{n}` {t or 'string'}" for n, t in zip(names, types)
        )
    finally:
        con.close()


def range_predicates(
    partition_column: str, lower: int, upper: int, num_partitions: int
) -> list[str]:
    """The exact slice predicates spark.read.jdbc generates: stride =
    (upper - lower) / n, first slice unbounded below, last unbounded
    above — completeness does not depend on the bounds being tight."""
    n = max(1, num_partitions)
    if n == 1:
        return ["1=1"]
    stride = (upper - lower) // n or 1
    preds = []
    lo = lower
    for i in range(n):
        hi = lo + stride
        if i == 0:
            preds.append(f"{partition_column} < {hi}")
        elif i == n - 1:
            preds.append(f"{partition_column} >= {lo}")
        else:
            preds.append(f"{partition_column} >= {lo} AND {partition_column} < {hi}")
        lo = hi
    return preds


def read_sql_partitioned(
    spark: SparkSession,
    connect: Callable | str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
) -> DataFrame:
    """Parallel range-partitioned scan of ``table`` (or a subquery —
    anything legal after FROM). ``connect`` is a picklable zero-arg
    DB-API connection factory (a str is shorthand for a sqlite path).
    ``predicate`` pushes an extra WHERE down into every slice's SELECT,
    so filtering happens in the database, not in Spark — the JDBC
    pushdown contract."""
    import pandas as pd

    if isinstance(connect, str):
        connect = sqlite_connect(connect)
    base = f"SELECT * FROM {table}"
    where_extra = f" AND ({predicate})" if predicate else ""
    schema = _probe_schema(
        connect, base + (f" WHERE {predicate}" if predicate else "")
    )

    if partition_column is None:
        preds = ["1=1"]
    else:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound/upper_bound")
        preds = range_predicates(
            partition_column, lower_bound, upper_bound, num_partitions
        )
    # one slice per task, guaranteed (numSlices), not hash-hoped
    spec = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in preds], len(preds)),
        "pred string",
    )

    def fetch(batches):
        for pdf in batches:
            for pred in pdf["pred"]:
                con = connect()
                try:
                    out = pd.read_sql_query(
                        f"{base} WHERE {pred}{where_extra}", con
                    )
                finally:
                    con.close()
                if len(out):
                    yield out

    return spec.mapInPandas(fetch, schema)


def write_sql_append(
    df: DataFrame,
    connect: Callable | str,
    table: str,
    busy_timeout_ms: int = 60_000,
) -> None:
    """Per-partition batched INSERTs (executemany) — the JDBC append sink.
    Each partition opens its own connection inside foreachPartition;
    sqlite's single-writer lock serializes them (busy-timeout retries),
    a server database would take them in parallel."""
    if isinstance(connect, str):
        connect = sqlite_connect(connect)
    cols = df.columns
    placeholders = ", ".join("?" for _ in cols)
    collist = ", ".join(f'"{c}"' for c in cols)
    sql = f'INSERT INTO {table} ({collist}) VALUES ({placeholders})'

    def sink(rows) -> None:
        buf = [tuple(r) for r in rows]
        if not buf:
            return
        con = connect()
        try:
            cur = con.cursor()
            try:
                cur.execute(f"PRAGMA busy_timeout = {busy_timeout_ms}")
            except Exception:
                pass  # non-sqlite backends
            cur.executemany(sql, buf)
            con.commit()
        finally:
            con.close()

    df.foreachPartition(sink)
