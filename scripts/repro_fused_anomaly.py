#!/usr/bin/env python
"""Reproducer for the fused-checkpoint geometric slowdown (round 7,
unresolved — see SCALE.md "DedupSegmentStore latency investigation").

Shape: the streaming dedup batch body with the duplicate-of map FUSED
into one profiles-join checkpoint instead of the shipped two-checkpoint
shape. With the warm segment cache enabled, per-batch wall DOUBLES
roughly every batch from ~batch 7 (0.3 s -> 35 s by batch 10) even
though, measured per batch:

  - the analyzed AND executed plans are constant-size with ExistingRDD
    leaves (lineage truncation verified via rdd.toDebugString);
  - Spark job count (22) and task count (~130) are constant;
  - no large-task-binary warnings; driver threads and persistent-RDD
    counts flat;
  - trivial probe jobs (spark.range groupBy) and full store-cache scans
    stay at ~0.1 s after the slow batches — the session is healthy;
  - the verify subplans (cand/pairs/dupmap counts) stay at ~0.3 s; the
    slow steps are the prof-join-dupmap localCheckpoint itself (6 s at
    b10 for a 25x24-row join) and every downstream join over the
    just-checkpointed frame (35 s), each re-run equally slow.

Cache OFF (cache_max_rows=0) is flat. The shipped two-checkpoint shape
(dup0 checkpoint + anti-join) is flat with cache ON. Suspected area:
execution of joins whose both sides derive (through a checkpoint) from
the same parent RDD, interacting with session-reused checkpointed cache
frames — not yet isolated.

Usage: python scripts/repro_fused_anomaly.py [n_batches]
Prints per-batch wall; expect the blowup from ~batch 8.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pwc_challenge_dataengineer_spark.functions.dedup_fuzzy import (  # noqa: E402
    jaccard_verify_profiles,
    minhash_doc_profiles,
    profiles_to_signatures,
)
from pwc_challenge_dataengineer_spark.session import get_spark  # noqa: E402
from pwc_challenge_dataengineer_spark.streaming.dedup_stream import (  # noqa: E402
    N_BANDS,
    DedupSegmentStore,
    _resolve_chains,
)


def fused_batch(store, out, batch_df, batch_id):
    prof = minhash_doc_profiles(
        batch_df, "doc_id", "text", k=3, n_bands=N_BANDS
    ).localCheckpoint(eager=True)
    batch_sig = profiles_to_signatures(prof, "doc_id", N_BANDS)
    left = batch_sig.select(
        F.col("doc_id").alias("id_a"), "band", "signature",
        F.lit(False).alias("__stored"),
    )
    stored_sig = store.read_sigs()
    stored = store.read()
    if stored_sig is not None:
        left = stored_sig.select(
            F.col("doc_id").alias("id_a"), "band", "signature",
            F.lit(True).alias("__stored"),
        ).unionByName(left)
    cand = (
        left.join(
            batch_sig.select(
                F.col("doc_id").alias("id_b"), "band", "signature"
            ),
            ["band", "signature"],
        )
        .filter(
            (F.col("__stored") & (F.col("id_a") != F.col("id_b")))
            | (~F.col("__stored") & (F.col("id_a") < F.col("id_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    both_prof = stored.unionByName(prof.select("doc_id", "sh_set", "n_sh"))
    pairs = jaccard_verify_profiles(
        cand, both_prof, "doc_id", hint_small=True
    ).filter(F.col("jaccard") >= 0.5)
    dupmap = pairs.groupBy(F.col("id_b").alias("doc_id")).agg(
        F.min("id_a").alias("duplicate_of")
    )
    # THE fused checkpoint under investigation
    marked = prof.join(dupmap, "doc_id", "left").localCheckpoint(eager=True)
    dup0 = marked.filter(F.col("duplicate_of").isNotNull()).select(
        "doc_id", "duplicate_of"
    )
    dup_of = _resolve_chains(dup0)
    survivors = marked.filter(F.col("duplicate_of").isNull()).select(
        "doc_id", "sh_set", "n_sh", *[f"__s{b}" for b in range(N_BANDS)]
    )
    verdicts = (
        marked.select("doc_id")
        .join(dup_of, "doc_id", "left")
        .select(
            "doc_id",
            F.lit(int(batch_id)).alias("batch_id"),
            F.col("duplicate_of").isNotNull().alias("is_duplicate"),
            "duplicate_of",
        )
    )
    verdicts.write.mode("append").parquet(out)
    store.append(survivors, str(batch_id))
    if store.n_segments() >= 6:
        store.compact()


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    spark = get_spark("fused-anomaly-repro", shuffle_partitions=4)
    tmp = tempfile.mkdtemp(prefix="fused_anomaly_")
    store = DedupSegmentStore(spark, os.path.join(tmp, "store"))
    out = os.path.join(tmp, "verdicts")
    for b in range(n_batches):
        rows = [
            (
                b * 25 + i,
                f"doc {b} {i} "
                + " ".join(f"w{(b * 25 + i + j) % 97}" for j in range(12)),
            )
            for i in range(25)
        ]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        t0 = time.time()
        fused_batch(store, out, df, b)
        print(f"batch {b} {time.time() - t0:5.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
