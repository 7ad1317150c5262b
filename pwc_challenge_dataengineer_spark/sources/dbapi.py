"""Partitioned SQL-database reads/writes over Python DB-API — the JDBC
capability, testable in this environment.

Spark's JDBC source (reference: build_gold.py:240-252 writes gold marts to
Postgres) needs a JDBC driver jar and a live database, neither of which
ships here. The CAPABILITY it provides, though — range-partitioned parallel
reads with predicate pushdown, and per-partition batched appends — is a
connector pattern, not a jar: this module implements it over any Python
DB-API connection factory, exercised against stdlib sqlite3 in tests.
Partition semantics mirror spark.read.jdbc exactly: ``num_partitions``
range slices of ``partition_column`` between the bounds, first slice open
below, last open above, so every row appears exactly once regardless of
bounds tightness. Each slice's SELECT runs INSIDE an executor task
(mapInPandas) — the driver never holds the table.

Swap-point for production: pass a ``connect`` factory for psycopg2 /
mysqlclient and the same code fans out across a real server's connection
pool. sqlite-specific honesty: it allows one writer at a time, so the
append sink serializes on the file lock (busy-timeout retries) — a server
database takes the partition appends genuinely in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PY2SPARK = {int: "bigint", float: "double", str: "string", bytes: "binary", bool: "boolean"}


def _probe_schema(db_path: str, query: str) -> str:
    """Column names/types from a LIMIT-1 probe (sqlite has no rich
    catalog types over arbitrary queries; value types are the contract)."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f"SELECT * FROM ({query}) LIMIT 1")
        names = [d[0] for d in cur.description]
        row = cur.fetchone()
        types = [
            _PY2SPARK.get(type(v), "string") if v is not None else "string"
            for v in (row or [None] * len(names))
        ]
        return ", ".join(f"`{n}` {t}" for n, t in zip(names, types))
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
    db_path: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
) -> DataFrame:
    """Parallel range-partitioned scan of ``table`` (or a subquery —
    anything legal after FROM). ``predicate`` pushes an extra WHERE down
    into every slice's SELECT, so filtering happens in the database, not
    in Spark — the JDBC pushdown contract."""
    import pandas as pd

    base = f"SELECT * FROM {table}"
    where_extra = f" AND ({predicate})" if predicate else ""
    schema = _probe_schema(db_path, base + (f" WHERE {predicate}" if predicate else ""))

    if partition_column is None:
        preds = ["1=1"]
    else:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound/upper_bound")
        preds = range_predicates(
            partition_column, lower_bound, upper_bound, num_partitions
        )
    spec = spark.createDataFrame(
        [(p,) for p in preds], "pred string"
    ).repartition(len(preds), "pred")

    def fetch(batches):
        import sqlite3

        for pdf in batches:
            for pred in pdf["pred"]:
                con = sqlite3.connect(db_path)
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
    df: DataFrame, db_path: str, table: str, busy_timeout_ms: int = 60_000
) -> None:
    """Per-partition batched INSERTs (executemany) — the JDBC append sink.
    Each partition opens its own connection inside foreachPartition;
    sqlite's single-writer lock serializes them (busy-timeout retries),
    a server database would take them in parallel."""
    cols = df.columns
    placeholders = ", ".join("?" for _ in cols)
    collist = ", ".join(f'"{c}"' for c in cols)
    sql = f'INSERT INTO {table} ({collist}) VALUES ({placeholders})'

    def sink(rows) -> None:
        import sqlite3

        buf = [tuple(r) for r in rows]
        if not buf:
            return
        con = sqlite3.connect(db_path, timeout=busy_timeout_ms / 1000)
        try:
            con.execute(f"PRAGMA busy_timeout = {busy_timeout_ms}")
            con.executemany(sql, buf)
            con.commit()
        finally:
            con.close()

    df.foreachPartition(sink)
