"""End-to-end LLM training-data prep: raw documents → training shards.

One command demonstrating the whole curation surface composed as a single
pipeline (each stage is the same function/operator the query catalog
verifies against DuckDB — this script is the "a user could run their
pipeline on this engine" proof):

  1. text stats + quality scoring + language ID (built-in expressions,
     one projection — no Python in the row path);
  2. quality gate (score >= threshold) + PII redaction;
  3. exact dedup on the normalized content fingerprint (first-seen doc
     wins, deterministic);
  4. MinHash/LSH near-dup clustering (bucketed candidate join, exact
     Jaccard verify, distributed connected components) → keep the
     min-id representative per cluster;
  5. deterministic 80/10/10 train/val/test split (md5 bucket of doc_id —
     rerun- and append-stable, no RNG);
  6. write parquet shards partitioned by split.

Every stage is lazily composed; Spark runs ONE job graph per output
action. Prints a single JSON line of per-stage row counts and wall time.

Usage:
    python scripts/run_llm_prep.py [SF_DIR] [OUT_DIR] [--threshold 0.3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("out", nargs="?", default="/tmp/llm_prep_out")
    ap.add_argument("--threshold", type=float, default=0.3)
    ns = ap.parse_args()
    sf_dir, out, q_threshold = ns.sf_dir, ns.out, ns.threshold

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pwc_challenge_dataengineer_spark.functions.dedup_fuzzy import (
        connected_components,
        minhash_lsh_near_dups,
    )
    from pwc_challenge_dataengineer_spark.functions.text import (
        add_text_stats,
        detect_language,
        normalized_fingerprint,
        redact_pii,
    )
    from pwc_challenge_dataengineer_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("llm-prep")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1+2: stats (add_text_stats already emits quality_score — don't
    # evaluate the scoring expression tree twice), quality gate, language,
    # PII — one projection stage
    scored = add_text_stats(docs).withColumn("lang", detect_language(F.col("text")))
    kept = scored.filter(F.col("quality_score") >= q_threshold).withColumn(
        "text", redact_pii(F.col("text"))
    )

    # 3: exact dedup — first-seen (min doc_id) per normalized fingerprint.
    # Materialize ONCE with the dedup marker still attached, then take all
    # stage counts from the checkpointed frame: counting each lazy stage
    # separately would re-run the scan+score+redact lineage three times.
    fp_w = Window.partitionBy("__fp").orderBy("doc_id")
    staged = (
        kept.withColumn("__fp", normalized_fingerprint(F.col("text")))
        .withColumn("__rn", F.row_number().over(fp_w))
        .localCheckpoint(eager=True)
    )
    n_quality = staged.count()
    exact = staged.filter(F.col("__rn") == 1).drop("__fp", "__rn")
    n_exact = exact.count()

    # 4: near-dup clusters → keep the min-id representative per cluster
    # (profiles inside minhash_lsh_near_dups checkpoint themselves)
    pairs = minhash_lsh_near_dups(
        exact, "doc_id", "text", threshold=0.5, hint_small=True
    )
    comp = connected_components(pairs, edges_canonical=True, hint_small=True)
    dupes = comp.filter(F.col("component_id") != F.col("node_id")).select(
        F.col("node_id").alias("doc_id")
    )
    reps = exact.join(dupes, "doc_id", "left_anti")
    n_neardup = reps.count()

    # 5: deterministic split (md5 bucket — append-stable, no RNG)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 100
    )
    final = reps.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )

    # 6: sharded write, partitioned by split
    final.write.mode("overwrite").partitionBy("split").parquet(f"{out}/shards")
    splits = {
        r["split"]: r["n"]
        for r in spark.read.parquet(f"{out}/shards")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(
        json.dumps(
            {
                "raw_docs": n_raw,
                "after_quality_gate": n_quality,
                "after_exact_dedup": n_exact,
                "after_near_dedup": n_neardup,
                "splits": splits,
                "removed_pct": round(100.0 * (1 - n_neardup / max(n_raw, 1)), 2),
                "wall_sec": round(time.time() - t0, 1),
                "out": f"{out}/shards",
            }
        )
    )


if __name__ == "__main__":
    main()
