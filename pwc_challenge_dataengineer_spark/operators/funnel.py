"""Ordered-funnel analysis over an event stream.

Beyond the reference's surface (its closest analog is the cohort builder,
src/etl/gold/spark_gold.py:169-198): a standard large-scale product-analytics
operator for "how many users did A, then B after A, then C after B".

Scale design: each stage is one equi-join + partial aggregation on the user
key — Catalyst keeps the hash partitioning on ``user_col`` across stages, so
stages after the first reuse the shuffle instead of re-exchanging. Stage
reach-sets shrink monotonically (stage N+1 ⊆ stage N users), so join inputs
only get smaller down the funnel. The per-stage counts are combined lazily
(union of 1-row aggregates) — a single job materializes the whole funnel, and
no per-user data ever reaches the driver. For funnels deeper than ~4 stages,
persist each reach-set to stop subtree recomputation through the union.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    persist_stages: bool | None = None,
) -> DataFrame:
    """Per-stage funnel counts with conversion ratios.

    A user reaches stage N at the earliest event of ``stages[N]`` at-or-after
    their stage N-1 reach time (ties on the timestamp count as subsequent —
    same-instant A,B is a valid A→B progression).

    Returns one row per stage: (stage_index int, stage, users,
    conversion_from_prev double — NULL on stage 0, conversion_from_first
    double). The ratio divisions run on exact longs cast to double, never
    rounded (see plans/_parity.py rationale).

    ``persist_stages``: each stage's count aggregate re-walks the reach-set
    chain below it, so an unpersisted k-stage funnel does O(k²) subtree work.
    Default (None) auto-persists the intermediate reach-sets for funnels
    deeper than 3 stages (where the quadratic recompute starts to dominate);
    shallow funnels skip the cache-materialization overhead. Persisted sets
    stay cached for the job and are evicted LRU by Spark afterwards.
    """
    if not stages:
        raise ValueError("funnel requires at least one stage")
    do_persist = persist_stages if persist_stages is not None else len(stages) > 3
    reached: DataFrame | None = None
    stage_counts: list[DataFrame] = []
    for i, stage in enumerate(stages):
        ev = events.filter(F.col(type_col) == stage)
        if reached is None:
            reached = ev.groupBy(user_col).agg(F.min(ts_col).alias("t_reach"))
        else:
            reached = (
                ev.join(reached, user_col)
                .filter(F.col(ts_col) >= F.col("t_reach"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t_reach"))
            )
        if do_persist and i < len(stages) - 1:
            reached = reached.persist()
        stage_counts.append(
            reached.agg(
                F.lit(i).alias("stage_index"),
                F.lit(stage).alias("stage"),
                F.count("*").alias("users"),
            )
        )
    counts = stage_counts[0]
    for df in stage_counts[1:]:
        counts = counts.unionByName(df)
    # the window runs over len(stages) rows — scale-safe despite no partition
    w = Window.orderBy("stage_index")
    prev = F.lag("users").over(w).cast("double")
    first = F.first("users").over(w).cast("double")
    # zero-guards: an empty stage (quiet partition/day) must yield NULL
    # ratios, not a DIVIDE_BY_ZERO under ANSI mode
    return counts.select(
        "stage_index",
        "stage",
        "users",
        F.when(prev != 0, F.col("users").cast("double") / prev).alias(
            "conversion_from_prev"
        ),
        F.when(first != 0, F.col("users").cast("double") / first).alias(
            "conversion_from_first"
        ),
    )
