"""Native recursive-CTE queries (Spark 4 ``WITH RECURSIVE``).

Spark 4.1 ships ANSI recursive CTEs (SPARK-24497), which subsume the
hand-rolled iterative loops warehouses bolt on for hierarchy walks. The
reference's hierarchy needs (category rollups, parent-child explosions —
dbt models and src/analytics aggregation layers) are expressed here
against a deterministic synthetic forest over ``part``:

    parent(p) = p div 10   (for p >= 10; partkeys < 10 are roots)
    edge_qty(p) = (p % 5) + 1

so every partkey has exactly one parent chain of depth <= 4 at sf0.01
(2000 parts) and <= 5 at sf0.1 (20000 parts) — a realistic BOM/category
tree whose shape scales with the data without any cycle risk.

Scale posture: recursion here is *frontier-linear* — each node is reached
exactly once (unique parent chains), so total recursive work is O(|part|)
rows regardless of depth, and each step is an equi-join (child div 10 =
parent) that Spark plans as a hash join per iteration. No path explosion:
we never enumerate multiple routes to a node. The recursion depth is
data-bounded at log10(|part|), far under Spark's
cteRecursionLevelLimit (100).

Both engines run the same recursive SQL text (dialect delta: integer
division is ``div`` in Spark, ``//`` in DuckDB; the Spark side reads the
table through a temp view named ``rcte_part``, the oracle reads the
pre-registered ``part`` view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import load_table
from .catalog import register


def _allow_big_recursion(spark: SparkSession, n_rows: int) -> None:
    """Raise Spark's recursive-CTE row guardrail (default 1,000,000
    cumulative rows across iterations — found the hard way at the x30
    scale stress: a 600k-node forest walks >1M closure rows, which is
    normal for real BOM/hierarchy data, not runaway recursion). The
    limit is a bounded multiple of the driving table's size — each of
    the registered recursions emits at most |table| * depth rows, so
    50x |table| still catches runaway recursion instead of disabling
    the guardrail session-wide (the old 2e9 constant did). Never
    LOWERS a limit someone already raised. The level limit (100) stays
    at its default: depth is log-bounded here and a depth blowup WOULD
    indicate a cycle bug."""
    want = max(1_000_000, 50 * n_rows)
    cur = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    if want > cur:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(want))


def _bom_sql(intdiv: str, part: str) -> str:
    """Top-down BOM explosion; ``intdiv`` = 'div' (Spark) or '//' (DuckDB)."""
    return f"""
    WITH RECURSIVE bom AS (
        SELECT p_partkey AS root, p_partkey AS node,
               CAST(1 AS BIGINT) AS acc_qty, 0 AS depth
        FROM {part} WHERE p_partkey < 10
        UNION ALL
        SELECT b.root, c.p_partkey AS node,
               b.acc_qty * ((c.p_partkey % 5) + 1) AS acc_qty,
               b.depth + 1 AS depth
        FROM bom b
        JOIN {part} c ON (c.p_partkey {intdiv} 10) = b.node
                      AND c.p_partkey >= 10
    )
    SELECT b.root AS root_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(b.depth) AS BIGINT) AS max_depth,
           CAST(SUM(b.acc_qty) AS BIGINT) AS total_units,
           CAST(SUM(CAST(b.acc_qty AS DECIMAL(18,2))
                    * CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS extended_cost
    FROM bom b JOIN {part} p ON p.p_partkey = b.node
    GROUP BY b.root
    """


@register("recursive_bom_explosion", oracle=_bom_sql("//", "part"))
def recursive_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level BOM explosion via native WITH RECURSIVE: from each root
    part, walk the synthetic parent-child forest multiplying per-edge
    quantities down the chain, then roll up node count, depth, total
    units and DECIMAL-exact extended cost per root. Each node is reached
    exactly once so recursive work is O(|part|). Full value oracle:
    identical SQL on DuckDB."""
    part = load_table(spark, sf_dir, "part")
    _allow_big_recursion(spark, part.count())
    part.createOrReplaceTempView("rcte_part")
    return spark.sql(_bom_sql("div", "rcte_part"))


def _closure_sql(intdiv: str, part: str) -> str:
    """Bottom-up ancestor-descendant transitive closure + rollup."""
    return f"""
    WITH RECURSIVE closure AS (
        SELECT p_partkey AS descendant,
               (p_partkey {intdiv} 10) AS ancestor, 1 AS dist
        FROM {part} WHERE p_partkey >= 10
        UNION ALL
        SELECT c.descendant, (c.ancestor {intdiv} 10) AS ancestor,
               c.dist + 1 AS dist
        FROM closure c WHERE c.ancestor >= 10
    )
    SELECT c.ancestor AS ancestor_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_descendants,
           CAST(MAX(c.dist) AS BIGINT) AS subtree_depth,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               AS subtree_price
    FROM closure c
    JOIN {part} p ON p.p_partkey = c.descendant
    JOIN {part} a ON a.p_partkey = c.ancestor
    GROUP BY c.ancestor
    HAVING COUNT(*) >= 5
    """


@register("recursive_closure_rollup", oracle=_closure_sql("//", "part"))
def recursive_closure_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-descendant transitive closure via native WITH RECURSIVE,
    walked bottom-up (each row climbs its own parent chain — O(depth)
    rows per node, no join inside the recursive step at all), then a
    rollup of descendant count / subtree depth / DECIMAL-exact subtree
    price per ancestor that exists in ``part`` and has >= 5 descendants.
    The closure is |part| * depth rows — linear in data at fixed tree
    arity. Full value oracle: identical SQL on DuckDB."""
    part = load_table(spark, sf_dir, "part")
    _allow_big_recursion(spark, part.count())
    part.createOrReplaceTempView("rcte_part")
    return spark.sql(_closure_sql("div", "rcte_part"))


def _paths_sql(intdiv: str, part: str) -> str:
    """Root-1 subtree path enumeration with materialized path strings."""
    return f"""
    WITH RECURSIVE paths AS (
        SELECT p_partkey AS node, CAST('1' AS STRING) AS path, 0 AS depth
        FROM {part} WHERE p_partkey = 1
        UNION ALL
        SELECT c.p_partkey AS node,
               p.path || '/' || CAST(c.p_partkey AS STRING) AS path,
               p.depth + 1 AS depth
        FROM paths p
        JOIN {part} c ON (c.p_partkey {intdiv} 10) = p.node
                      AND c.p_partkey >= 10
    )
    SELECT node, path, CAST(depth AS BIGINT) AS depth
    FROM paths
    """


@register("recursive_path_enumeration", oracle=_paths_sql("//", "part"))
def recursive_path_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-path enumeration of the root-1 subtree (the classic
    adjacency-list -> path-string conversion UIs and ltree-style indexes
    need), via native WITH RECURSIVE string accumulation. Each node has
    one parent chain so output is exactly the subtree size — no path
    explosion. Full value oracle: identical SQL on DuckDB."""
    part = load_table(spark, sf_dir, "part")
    _allow_big_recursion(spark, part.count())
    part.createOrReplaceTempView("rcte_part")
    return spark.sql(_paths_sql("div", "rcte_part"))
