"""Cross-engine float-parity helpers.

The driver hash-compares Spark results against a DuckDB oracle. Double
summation order differs between engines (and between Spark partitions), so
``SUM(double)`` is only reproducible to ~1 ulp — and any post-hoc ROUND can
amplify a 1-ulp difference into a 0.01 difference when the true sum sits on a
rounding tie (common here: the test data's money columns are exact 2-decimal
values, so revenue sums land on half-cent ties ~1% of the time).

The fix is exact arithmetic end-to-end:

- cast money inputs to DECIMAL(18,2) *before* aggregating — sums/products of
  decimals are exact integers underneath, identical in any order and engine;
- cast the final aggregate back to DOUBLE (nearest-double of an exact decimal
  is deterministic and identical across engines);
- derive ratios by dividing those deterministic doubles (IEEE division of
  identical operands is identical) — never ROUND after a division.

Spark-side helpers below mirror the SQL snippets 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def rev_dec() -> Column:
    """Exact net-revenue expression: extendedprice * (1 - discount)."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))


def money_sum(col: str | Column) -> Column:
    """Exact decimal sum, emitted as a deterministic double."""
    return F.sum(dec(col)).cast("double")


def rev_sum() -> Column:
    return F.sum(rev_dec()).cast("double")


# --- SQL (DuckDB) counterparts -------------------------------------------

REV_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)
REV_SUM_SQL = f"CAST(SUM({REV_DEC_SQL}) AS DOUBLE)"


def money_sum_sql(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
