"""Schema-evolution queries (VERDICT r01 gap #3; reference
src/streaming/schema_evolution_manager.py + enhanced_bronze.py:221-236).

- schema_evolved_union    evolve-on-read over two heterogeneous generations
  of the orders table (narrow int/float types + missing column vs renamed +
  widened schema) conformed onto one target schema. The data path is two
  projections + a union — zero shuffle, so this costs the same as reading
  the generations directly at any scale.
- schema_compat_classify  change-taxonomy + backward/forward safety between
  the REAL parquet schema of lineitem (DESCRIBE on the oracle side, loaded
  StructType on the Spark side) and a pinned evolution target — so the
  classification is derived from the actual table schema, not constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import load_table
from ..sources.schema_evolution import diff_schemas, evolve_read
from .catalog import register


@register(
    "schema_evolved_union",
    oracle="""
    SELECT CAST(CAST(o_orderkey AS INTEGER) AS BIGINT) AS o_orderkey,
           CAST(CAST(o_totalprice AS FLOAT) AS DOUBLE) AS o_totalprice,
           o_orderstatus AS status,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus AS status, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def schema_evolved_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two generations of orders with different physical schemas:

    - gen1 (odd keys): narrow types (int key, float price), no priority
      column — an old producer.
    - gen2 (even keys): wide types, column renamed o_orderstatus→status
      upstream is emulated by the shared rename map.

    ``evolve_read`` widens gen1's int→bigint and float→double, NULL-fills
    the missing o_orderpriority, renames, and unions — per-column
    expressions only (sources/schema_evolution.py:conform_to)."""
    orders = load_table(spark, sf_dir, "orders")
    gen1 = orders.filter((orders.o_orderkey % 2) == 1).selectExpr(
        "CAST(o_orderkey AS INT) AS o_orderkey",
        "CAST(o_totalprice AS FLOAT) AS o_totalprice",
        "o_orderstatus",
    )
    gen2 = orders.filter((orders.o_orderkey % 2) == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    target = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("status", T.StringType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    return evolve_read(
        spark, [gen1, gen2], target, renames={"o_orderstatus": "status"}
    )


# DuckDB-side widening predicate — same map as TYPE_WIDENING
# (schema_evolution_manager.py:207-214) expressed over DuckDB type names.
_WIDEN_SQL = """
       (cur_type = 'INTEGER' AND tgt_type IN ('BIGINT', 'DOUBLE', 'FLOAT'))
    OR (cur_type = 'BIGINT' AND tgt_type IN ('DOUBLE', 'FLOAT'))
    OR (cur_type = 'FLOAT' AND tgt_type = 'DOUBLE')
    OR (cur_type = 'BOOLEAN' AND tgt_type = 'VARCHAR')
"""


@register(
    "schema_compat_classify",
    oracle=f"""
    WITH cur AS (
        SELECT column_name AS field, column_type AS cur_type
        FROM (DESCRIBE SELECT * FROM lineitem)
    ),
    tgt(field, tgt_type, tgt_nullable) AS (
        VALUES ('l_orderkey', 'BIGINT', true),
               ('l_partkey', 'BIGINT', true),
               ('l_suppkey', 'BIGINT', true),
               ('l_linenumber', 'BIGINT', true),
               ('l_quantity', 'DOUBLE', true),
               ('l_extendedprice', 'DOUBLE', true),
               ('l_discount', 'DOUBLE', true),
               ('l_returnflag', 'INTEGER', true),
               ('l_linestatus', 'VARCHAR', true),
               ('l_shipdate', 'TIMESTAMP', true),
               ('l_ship_mode', 'VARCHAR', true),
               ('l_audit_id', 'BIGINT', false)
    ),
    j AS (
        SELECT coalesce(c.field, t.field) AS field,
               c.cur_type, t.tgt_type, t.tgt_nullable
        FROM cur c FULL OUTER JOIN tgt t ON c.field = t.field
    )
    SELECT field,
           CASE WHEN cur_type IS NULL THEN 'add_column'
                WHEN tgt_type IS NULL THEN 'drop_column'
                ELSE 'change_type' END AS change_type,
           CASE WHEN cur_type IS NULL THEN 'low'
                WHEN tgt_type IS NULL THEN 'high'
                ELSE 'medium' END AS impact,
           CASE WHEN cur_type IS NULL THEN true
                WHEN tgt_type IS NULL THEN false
                ELSE {_WIDEN_SQL} END AS backward_safe,
           CASE WHEN cur_type IS NULL THEN tgt_nullable
                WHEN tgt_type IS NULL THEN true
                ELSE {_WIDEN_SQL} END AS forward_safe
    FROM j
    WHERE cur_type IS NULL OR tgt_type IS NULL OR cur_type <> tgt_type
    ORDER BY field
    """,
)
def schema_compat_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff the loaded lineitem schema against an evolution target that
    drops l_tax, widens l_linenumber int→bigint, incompatibly retypes
    l_returnflag string→int, and adds one nullable + one required column.
    The Spark side runs the same engine users call (diff_schemas); both
    sides read the CURRENT schema from the parquet itself."""
    current = load_table(spark, sf_dir, "lineitem").schema
    fields = []
    for f in current.fields:
        if f.name == "l_tax":
            continue  # dropped
        if f.name == "l_linenumber":
            fields.append(T.StructField(f.name, T.LongType(), f.nullable))
        elif f.name == "l_returnflag":
            fields.append(T.StructField(f.name, T.IntegerType(), f.nullable))
        else:
            fields.append(f)
    fields.append(T.StructField("l_ship_mode", T.StringType(), True))
    fields.append(T.StructField("l_audit_id", T.LongType(), False))
    target = T.StructType(fields)

    changes = diff_schemas(current, target)
    out_schema = T.StructType(
        [
            T.StructField("field", T.StringType()),
            T.StructField("change_type", T.StringType()),
            T.StructField("impact", T.StringType()),
            T.StructField("backward_safe", T.BooleanType()),
            T.StructField("forward_safe", T.BooleanType()),
        ]
    )
    rows = [
        (c["field"], c["change_type"], c["impact"], c["backward_safe"], c["forward_safe"])
        for c in changes
    ]
    return spark.createDataFrame(rows, out_schema).orderBy("field")
