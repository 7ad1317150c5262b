"""Distributed sketches beyond Spark's built-ins.

Spark ships HLL (approx_count_distinct) and KLL-ish quantiles
(percentile_approx / approxQuantile); this module adds a Count-Min Sketch —
the classic heavy-hitter / frequency-estimate structure for unbounded key
domains (the LLM-pipeline use: token/shingle frequency caps on corpora too
large for exact counts).

Construction is pure DataFrame algebra, so it merges the same way sketches
do: the (row, col) cell counts are additive, a union of two sketches'
cell tables followed by a groupBy-sum IS the merged sketch. Hash rows are
md5-derived (engine-reproducible, like the MinHash path), depth d rows ×
width w columns.

Estimate(key) = min over rows of cell(row, hash_row(key) mod w) — an upper
bound on the true count with error ≤ ε·N at probability 1-δ where
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, row: int, width: int) -> Column:
    """Column index for ``key`` in hash row ``row``: first 8 md5 hex nibbles
    of "row:key" as an int, mod width. conv() returns a string; cast back."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width).cast("int")


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """HyperLogLog register table per group: (group_cols..., bucket, max_rank)
    over a dense 2^p-bucket grid (empty buckets present with max_rank 0).

    A from-first-principles HLL with an md5 hash, so the whole sketch is
    reproducible in ANSI SQL (the same trick as the CMS above — Spark's
    approx_count_distinct is also HLL but its internal hash can't be
    replayed by an oracle). Hash = 60-bit md5 prefix; low p bits pick the
    bucket, the remaining 60-p bits yield the rank (position of the first
    set bit, counting from the MSB of that field; an all-zero field ranks
    61-p). Registers are mergeable: union two register tables and groupBy
    max — the same monoid HLL uses — so per-partition / per-day sketches
    roll up without rescanning."""
    m = 1 << p
    key = F.col(key_col)
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    rest = F.shiftrightunsigned(h, p)
    rank = F.when(rest == 0, F.lit(61 - p)).otherwise(
        F.lit(61 - p) - F.length(F.bin(rest))
    )
    observed = (
        df.select(*group_cols, (h % m).cast("int").alias("bucket"), rank.alias("r"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("max_rank"))
    )
    grid = (
        df.select(*group_cols)
        .distinct()
        .select(*group_cols, F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("bucket"))
    )
    return grid.join(observed, group_cols + ["bucket"], "left").select(
        *group_cols, "bucket", F.coalesce("max_rank", F.lit(0)).alias("max_rank")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Cardinality estimate from a register table: the standard bias-corrected
    harmonic mean, with linear counting when the raw estimate is small and
    empty buckets remain (the regime of every group at test scale). The
    alpha constant is written as the same arithmetic expression the oracle
    uses, so both engines fold it to the identical double."""
    m = 1 << p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("harm"),
        F.sum(F.when(F.col("max_rank") == 0, 1).otherwise(0)).alias("v_empty"),
    )
    raw = alpha * F.lit(float(m * m)) / F.col("harm")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("v_empty").cast("bigint").alias("v_empty"),
        est.alias("hll_raw"),
    )


def bloom_positions(df: DataFrame, key_col: str, k: int = 3, m: int = 1024) -> DataFrame:
    """Distinct Bloom-filter bit positions set by ``df[key_col]`` — the
    filter itself, as a table. Hash family is the CMS row family (md5 of
    "row:key"), so an oracle can rebuild the identical filter."""
    key = F.col(key_col)
    return (
        df.select(
            F.explode(F.array(*[_cell(key, i, m) for i in range(k)])).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    facts: DataFrame, key_col: str, bits: DataFrame, k: int = 3, m: int = 1024
) -> DataFrame:
    """Append ``bloom_pass`` to ``facts``: true iff all k hash positions of
    the key are set. The position set is collected into one array row and
    broadcast — at 100 TB the filter is m bits regardless of data size,
    which is the entire point: the probe is a map-side predicate, no
    shuffle, applied before the real (expensive) join."""
    key = F.col(key_col)
    bits_row = F.broadcast(bits.agg(F.sort_array(F.collect_set("pos")).alias("bits")))
    probed = facts.crossJoin(bits_row)
    passed = None
    for i in range(k):
        hit = F.array_contains(F.col("bits"), _cell(key, i, m))
        passed = hit if passed is None else passed & hit
    return probed.withColumn("bloom_pass", passed).drop("bits")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min cell table: (row, col, cnt). One pass — each input row
    contributes to ``depth`` cells via a small explode; partial aggregation
    collapses to d·w cells before the shuffle, so shuffle volume is the
    sketch size, not the data size.

    ``weight_col`` builds the sketch from PRE-AGGREGATED (key, count) rows
    instead of the raw stream — cell counts are additive, so summing the
    per-key weights into cells yields the identical sketch while reading
    |keys| rows instead of |events| rows. This is the same monoid the
    union+groupBy-sum merge uses."""
    key = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cell(key, r, width).alias("col")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
        *( [F.col(weight_col).alias("_w")] if weight_col else [] ),
    ).select("rc.row", "rc.col", *(["_w"] if weight_col else []))
    if weight_col:
        return cells.groupBy("row", "col").agg(F.sum("_w").alias("cnt"))
    return cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-query the sketch for each key: min over rows of its cell."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cell(key, r, width).alias("col")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, "rc.row", "rc.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("estimated_count"))
    )
