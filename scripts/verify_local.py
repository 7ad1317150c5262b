"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, result
TYPES (arrow-schema kinds — the driver hashes typed values, so a DuckDB
HUGEINT/DOUBLE promotion diverges even when every cell stringifies the
same; two such escapes shipped red in r2/r3 before this check existed),
and values (order-insensitive; rows and columns sorted; floats
canonicalized).

Type rule: integer widths are lumped (the driver accepts int32-vs-int64
pairs in rows it already passes green); decimal/int/float are strictly
distinct kinds, and decimals must agree on SCALE (precision is allowed to
differ — both engines widen precision differently under SUM).

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    try:
        import datetime

        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, datetime.date):
            return v.strftime("%Y-%m-%d")
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


def spark_kind(dt) -> str:
    """Collapse a Spark DataType to a comparable type kind."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DecimalType):
        return f"decimal(s={dt.scale})"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_kind(dt.elementType)}>"
    return f"other:{dt.simpleString()}"


def arrow_kind(t) -> str:
    """Collapse an arrow type (DuckDB result schema) to the same kinds."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return f"decimal(s={t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_kind(t.value_type)}>"
    return f"other:{t}"


def type_mismatches(spark_schema, arrow_schema) -> list[str]:
    """Columns (matched by name) whose Spark vs oracle type kinds differ."""
    skinds = {f.name: spark_kind(f.dataType) for f in spark_schema.fields}
    out = []
    for field in arrow_schema:
        if field.name not in skinds:
            continue
        dk = arrow_kind(field.type)
        sk = skinds[field.name]
        if sk != dk:
            out.append(f"{field.name}: spark={sk} oracle={dk}")
    return out


def compare(sdf_schema, scols, srows, arrow_tbl) -> list[str]:
    """All divergences between a Spark result and a DuckDB arrow result."""
    dcols = arrow_tbl.schema.names
    dcols_py = [arrow_tbl.column(i).to_pylist() for i in range(arrow_tbl.num_columns)]
    drows = list(zip(*dcols_py)) if dcols_py else []
    if arrow_tbl.num_rows and not drows:
        drows = [()] * arrow_tbl.num_rows
    problems = []
    if len(srows) != arrow_tbl.num_rows:
        problems.append(f"rowcount spark={len(srows)} duckdb={arrow_tbl.num_rows}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
    else:
        tmis = type_mismatches(sdf_schema, arrow_tbl.schema)
        if tmis:
            problems.append("type kinds differ: " + "; ".join(tmis))
    if not problems:
        sset, dset = rowset(scols, srows), rowset(dcols, drows)
        if sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pwc_challenge_dataengineer_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = sdf.schema
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            skipped += 1
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed += 1
            continue
        problems = compare(sschema, scols, srows, tbl)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
