"""As-of (point-in-time) join — an operator Spark lacks natively.

Not present in the reference either (SURVEY §2.3 "not present: as-of"), but
it is the canonical custom operator a Spark engine should supply (the brief
names it), and the standard way to join slowly-changing reference data
(rates, quotes, model versions) to events without an interval table.

Semantics: for each left row, attach the single most recent right row with
``right.ts <= left.ts`` within the same key (backward as-of; strict=False).

Implementation is the union-sort trick, NOT a range join:

    tag left rows (side=1) and right rows (side=0), union, then one window
    ``last_value(right_payload, ignorenulls) over (partition by key
    order by ts, side rows unbounded preceding)`` — each left row picks up
    the latest right payload at or before it.

One shuffle on the key, O((|L|+|R|) log) sort within partitions — versus a
range join's O(|L|·|R|) per-key blowup. Ties (right.ts == left.ts) resolve
to the right row, matching DuckDB's ASOF JOIN (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreaker: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + latest right_cols at or before ts.

    ``tiebreaker`` orders simultaneous right rows (latest wins); left
    columns pass through unchanged; right misses yield NULLs.
    """
    l_tag = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        *keys,
        ts_col,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    order = [F.col(ts_col), F.col("__side")]
    if tiebreaker is not None:
        # right rows sort among themselves by the tiebreaker; left rows have
        # NULL there and must stay AFTER same-ts right rows (nulls last), so
        # equal-ts ties still resolve to the right row
        order.insert(1, F.when(F.col("__side") == 0, F.col(tiebreaker)).asc_nulls_last())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"__f_{c}"))
    return out.drop(
        "__side", *[f"__r_{c}" for c in right_cols], *[f"__f_{c}" for c in right_cols]
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    band_s: int | None = None,
) -> DataFrame:
    """Interval/range join: pairs with right_ts ∈ [left_ts+lower_s, left_ts+upper_s].

    A raw inequality join compiles to a nested-loop per key (O(|L|·|R|)).
    Banding makes it an equi-join: time is bucketed into ``band_s``-second
    bands (default = window width), the left side replicates into every band
    its window can overlap (a constant ≤ ⌈width/band⌉+1 copies), the join
    runs on (keys, band), and the exact predicate filters the band edges.
    Shuffle volume is O(|L|·bands + |R|) and the per-task work is hash-join
    sized — the layout that survives 100 TB event tables.
    """
    width = upper_s - lower_s
    band_s = band_s or max(width, 1)
    l_epoch = F.col(left_ts).cast("timestamp").cast("long")
    r_epoch = F.col(right_ts).cast("timestamp").cast("long")
    lo_band = F.floor((l_epoch + lower_s) / band_s)
    hi_band = F.floor((l_epoch + upper_s) / band_s)
    l_banded = left.withColumn(
        "__band", F.explode(F.sequence(lo_band, hi_band))
    )
    r_banded = right.withColumn("__band", F.floor(r_epoch / band_s))
    cond = (r_epoch >= l_epoch + lower_s) & (r_epoch <= l_epoch + upper_s)
    return (
        l_banded.join(r_banded, keys + ["__band"])
        .filter(cond)
        .drop("__band")
    )
