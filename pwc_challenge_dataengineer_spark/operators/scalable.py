"""100 TB-scale replacements for constructs that don't survive scale-up.

The reference's RFM scoring uses GLOBAL ntile windows
(src/etl/gold/spark_gold.py:113-135): an unpartitioned sort that funnels
every row through one task. At 1000 executors that's the whole job's
bottleneck. The scale path here:

- ``quantile_bucket``: approxQuantile boundaries (driver gets K doubles, not
  rows) → bucket assignment as a codegen'd CASE chain. One pass, no global
  sort, divergence vs exact ntile only at boundary ties (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bucket(
    df: DataFrame,
    col: str,
    n_buckets: int = 5,
    out_col: str | None = None,
    relative_error: float = 1e-4,
    descending: bool = False,
) -> DataFrame:
    """Assign 1..n quantile bucket via approxQuantile boundaries.

    Unlike global ntile, cost is one aggregation pass; the boundary list
    (n_buckets-1 doubles) broadcasts inside the CASE expression.
    """
    out_col = out_col or f"{col}_bucket"
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.approxQuantile(col, probs, relative_error)
    expr = F.lit(1)
    for i, b in enumerate(bounds, start=1):
        expr = F.when(F.col(col) > F.lit(b), i + 1).otherwise(expr)
    if descending:
        expr = (F.lit(n_buckets + 1) - expr).cast("int")
    return df.withColumn(out_col, expr.cast("int"))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the large side, replicate the small side.

    When one join key dominates (a viral product, country=UK...), hash
    partitioning funnels that key's rows into one task. Salting splits each
    key into ``n_salts`` subkeys — the large side derives a deterministic
    salt from ``salt_source`` (a high-cardinality column; never rand(), so
    the plan stays reproducible), the small side is replicated ×n_salts via
    explode. Result rows are identical to the plain join; the hot key now
    spreads over n_salts tasks. AQE's skew-join split handles moderate skew
    automatically — this operator is for the pathological keys AQE can't
    split (e.g. a single key larger than an executor's memory).
    Cost: small side shuffles ×n_salts — keep n_salts ≲ 32.
    """
    salted_l = large.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts)).cast("int")
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted_s = small.withColumn("__salt", F.explode(salts))
    out = salted_l.join(salted_s, keys + ["__salt"])
    return out.drop("__salt")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    agg_cols: dict[str, str],
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skewed aggregation: groupBy(keys+salt) partial sums, then
    groupBy(keys) final sums. Spark's hash aggregate already does map-side
    partial aggregation, so this only pays off when a single group's partial
    rows still overwhelm one reducer (billions of rows per key at 100 TB);
    ``agg_cols`` maps output name -> input column (sums only — reassociable)."""
    partial = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    ).groupBy(*keys, "__salt").agg(
        *[F.sum(src).alias(name) for name, src in agg_cols.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in agg_cols]
    )


def grouped_exact_ranks(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rn",
    n_partitions: int | None = None,
) -> DataFrame:
    """EXACT per-group row_number WITHOUT the single-task-per-group
    window (r13 — the chain's kn-tercile stage was the last plan where
    ``Window.partitionBy(lang)`` funneled each language's entire corpus
    through ONE task: fine at x100 on local[32], the whole job's
    bottleneck at 1000 executors with a handful of languages).

    Standard distributed-rank shape: range-repartition on (group,
    order) so every group spans many globally-ORDERED partitions, count
    rows per (partition, group) — a tiny P x groups table — prefix-sum
    those into per-partition offsets, and the exact rank is offset +
    intra-partition row_number (a window keyed by (partition, group),
    so its partitions are slices, never whole groups).

    REQUIREMENT: ``order_cols`` must be a TOTAL ascending order within
    each group (append a unique id as the last key; encode desc/nulls
    ordering into derived columns). With a total order the rank is
    invariant to where the sampled range boundaries fall, so the
    checkpoint below only pins partition IDENTITY between the two reads,
    not the result. Rows pass through unchanged plus ``rank_col``."""
    from pyspark.sql.window import Window

    keys = [*group_cols, *order_cols]
    parts = (
        df.repartitionByRange(*keys)
        if n_partitions is None
        else df.repartitionByRange(n_partitions, *keys)
    )
    # freeze the sampled range boundaries: offsets and the final join
    # must observe the SAME partitioning (two lazy reads of an
    # unfrozen shuffle could re-sample)
    parts = parts.withColumn(
        "__gxr_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    counts = parts.groupBy("__gxr_pid", *group_cols).agg(
        F.count("*").alias("__gxr_c")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__gxr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__gxr_pid",
        *group_cols,
        F.coalesce(F.sum("__gxr_c").over(w_off), F.lit(0)).alias(
            "__gxr_off"
        ),
    )
    w_local = Window.partitionBy("__gxr_pid", *group_cols).orderBy(
        *order_cols
    )
    return (
        parts.join(F.broadcast(offsets), ["__gxr_pid", *group_cols])
        .withColumn(
            rank_col,
            (F.col("__gxr_off") + F.row_number().over(w_local)).cast(
                "long"
            ),
        )
        .drop("__gxr_pid", "__gxr_off")
    )
