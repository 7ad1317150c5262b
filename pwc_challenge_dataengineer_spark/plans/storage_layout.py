"""Storage-layout queries: the Z-ORDER clustering code, oracle-pinned.

Reference: delta_lake_manager.py:312-321 (``OPTIMIZE ... ZORDER BY``) — the
physical rewrite lives in sources/versioned_store.py:VersionedTable.optimize
and is pinned by tests/test_versioned.py (per-file min/max shrink on every
z-ordered column). This module oracle-checks the math that drives it: the
Morton interleave must be bit-exact, or the clustering silently degrades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from ..sources.versioned_store import zorder_code
from .catalog import register

_BITS = 8


def _interleave_sql(b1: str, b2: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({b1} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({b2} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


@register(
    "zorder_code_orders",
    oracle=f"""
    WITH stats AS (
        SELECT CAST(MIN(o_custkey) AS DOUBLE) AS mn1,
               CAST(MAX(o_custkey) AS DOUBLE) AS mx1,
               MIN(o_totalprice) AS mn2, MAX(o_totalprice) AS mx2
        FROM orders
    ),
    b AS (
        SELECT o_orderkey,
               LEAST(CAST(FLOOR((CAST(o_custkey AS DOUBLE) - mn1)
                                / (mx1 - mn1) * 255) AS BIGINT), 255) AS b1,
               LEAST(CAST(FLOOR((o_totalprice - mn2)
                                / (mx2 - mn2) * 255) AS BIGINT), 255) AS b2
        FROM orders CROSS JOIN stats
    )
    SELECT o_orderkey,
           CAST({_interleave_sql('b1', 'b2', _BITS)} AS BIGINT) AS zcode
    FROM b
    """,
)
def zorder_code_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton code of (o_custkey, o_totalprice), 8 bits each: linear
    min/max bucketing then bit interleave — identical IEEE arithmetic on
    both engines, so the oracle is value-exact. This is the clustering key
    VersionedTable.optimize(zorder_by=...) sorts by."""
    orders = load_table(spark, sf_dir, "orders")
    coded = zorder_code(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        ["o_custkey", "o_totalprice"],
        bits_per_col=_BITS,
    )
    return coded.select("o_orderkey", F.col("__z").alias("zcode"))
