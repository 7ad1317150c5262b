"""Minimal reproducer: localCheckpoint leaves do NOT truncate Catalyst
stats estimation — a JOIN-shaped checkpoint chain costs 2^depth to plan.

This is the mechanism behind the r7 "fused-checkpoint anomaly" in the
streaming dedup store (see scripts/repro_fused_anomaly.py for the
end-to-end shape, and streaming/dedup_stream.py for the invariant the
production code keeps). What happens:

  * forcing a LogicalRDD (localCheckpoint leaf)'s stats re-enters its
    ORIGIN plan's stats estimation (SizeInBytesOnlyStatsPlanVisitor);
  * the analyzer clones self-referenced subtrees (DeduplicateRelations),
    so the per-node stats memo never hits across the clones;
  * hence a session-lived frame whose checkpoint ancestry references the
    previous checkpoint r times per level plans in O(r^depth). The dedup
    store's fused shape had r ≈ 4 (candidate-join sides + verify set +
    survivors filter) → per-batch wall ×4 every batch.

Run:  SHAPE=join  python scripts/repro_stats_ancestry.py   # 2^depth blowup
      SHAPE=union python scripts/repro_stats_ancestry.py   # flat (r = 1
      path into the prior leaf per level... union legs project the SAME
      leaf, but union stats are a sum over children visited once each —
      only JOIN recurses into both sides per candidate-plan clone)

Each level builds the next frame FROM the previous checkpoint and prints
the time to compute optimizedPlan().stats() plus the (constant) plan-tree
size, demonstrating the blowup is planner-side, not executor-side. On this
box SHAPE=join fits t_stats ≈ 1.3 µs × 2^depth for depth 12–18 while
oplen stays constant; SHAPE=union stays < 1 ms at every depth.

Production rule derived from this: anything a long-lived store retains
across micro-batches must have BOUNDED checkpoint-stats ancestry — derive
retained frames from aggregates/scans (ancestry depth ≤ ~3), never from a
join DAG over previously retained checkpoints.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.session import get_spark

SHAPE = os.environ.get("SHAPE", "join")
MAX_DEPTH = int(os.environ.get("MAX_DEPTH", "18"))

spark = get_spark()
spark.conf.set("spark.sql.shuffle.partitions", "4")

cur = (
    spark.range(100)
    .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    .groupBy("k")
    .agg(F.sum("v").alias("v"))
    .localCheckpoint(eager=True)
)
for depth in range(1, MAX_DEPTH + 1):
    a = cur.select("k", (F.col("v") + 1).alias("v"))
    b = cur.select(F.col("k").alias("k2"), (F.col("v") + 2).alias("v2"))
    if SHAPE == "join":
        nxt = a.join(b, a["k"] == b["k2"]).groupBy("k").agg(
            F.min("v2").alias("v")
        )
    else:
        c = cur.select("k", (F.col("v") + 3).alias("v"))
        nxt = (
            a.unionByName(cur.select("k", "v"))
            .unionByName(c)
            .groupBy("k")
            .agg(F.max("v").alias("v"))
        )
    op = nxt._jdf.queryExecution().optimizedPlan()
    oplen = len(op.treeString())
    t0 = time.time()
    op.stats().simpleString()
    t_stats = time.time() - t0
    t0 = time.time()
    cur = nxt.localCheckpoint(eager=True)
    t_ckpt = time.time() - t0
    print(
        f"SHAPE={SHAPE} depth={depth}: t_stats={t_stats:.4f}s "
        f"t_ckpt={t_ckpt:.3f}s oplen={oplen}",
        flush=True,
    )
    if t_stats > 60:
        print("aborting: stats estimation past 60s — blowup demonstrated")
        break
