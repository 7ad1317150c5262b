"""Streaming near-duplicate ingestion: MinHash dedup of a document stream
against an accumulated signature store.

The LLM-pipeline shape this implements: documents arrive continuously; each
micro-batch must be deduplicated BOTH within itself and against everything
ingested before it, and only first-seen (representative) documents flow on to
the corpus. Spark has no built-in cross-batch fuzzy dedup —
``dropDuplicatesWithinWatermark`` is exact-key only — so this composes the
batch MinHash kit (functions/dedup_fuzzy.py) with the versioned store inside
``foreachBatch``:

  1. profile the incoming batch (one fused explode+groupBy: band minima +
     verify hash set per doc);
  2. LSH-join the batch signatures against the STORE's signatures (band,
     signature) — candidates only, sub-quadratic, the store side is
     pre-collapsed to one row per (band, signature) bucket head;
  3. exact-verify candidates with the stored hash sets (array_intersect
     Jaccard ≥ threshold → duplicate-of verdict, min doc_id wins ties);
  4. batch-internal near-dups collapse via the same pipeline before the
     store comparison (min-id representative);
  5. append the surviving representatives' profiles to the store (a
     VersionedTable commit per batch — replayable, time-travelable), and
     emit (doc_id, verdict, duplicate_of) for every input doc.

Exactly-once posture: the store commit is a keyed MERGE (insert-only on
doc_id), so a replayed micro-batch re-offers the same representatives and
matched keys stay untouched — idempotent, the same argument as the
foreachBatch MERGE crash-replay test. The verdict FILE sink is plain append
(at-least-once on replay; downstream dedupes on (batch_id, doc_id) — stated
honestly rather than claimed away).

Scale posture: the store grows with the UNIQUE corpus; its join side is
(band, signature) buckets — the LSH candidate join stays sub-quadratic and
the verify only touches candidates. At 100 TB the store becomes a bucketed
table keyed by (band, signature) so the join co-locates without a shuffle
of the accumulated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup_fuzzy import (
    jaccard_verify_profiles,
    minhash_doc_profiles,
    profiles_to_signatures,
)
from ..sources.versioned_store import VersionedTable

N_BANDS = 4


def _store_schema_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "doc_id BIGINT, sh_set ARRAY<BIGINT>, n_sh BIGINT, "
        "__s0 STRING, __s1 STRING, __s2 STRING, __s3 STRING",
    )


def _dedup_within(prof: DataFrame, threshold: float) -> tuple[DataFrame, DataFrame]:
    """Collapse near-dups INSIDE one batch: (representatives, dup_verdicts).

    Representative = min doc_id of each near-dup group (single-link over the
    verified pair set, one propagation round — batch-local groups are tiny;
    chains longer than one hop resolve on later batches against the store)."""
    sig = profiles_to_signatures(prof, "doc_id", N_BANDS)
    left = sig.select(F.col("doc_id").alias("id_a"), "band", "signature")
    right = sig.select(F.col("doc_id").alias("id_b"), "band", "signature")
    cand = (
        left.join(right, ["band", "signature"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = jaccard_verify_profiles(cand, prof, "doc_id", hint_small=True).filter(
        F.col("jaccard") >= threshold
    )
    rep_of = pairs.groupBy(F.col("id_b").alias("doc_id")).agg(
        F.min("id_a").alias("duplicate_of")
    )
    reps = prof.join(rep_of, "doc_id", "left_anti")
    return reps, rep_of


def make_dedup_batch_fn(
    store: VersionedTable, out_path: str, threshold: float = 0.5
):
    """foreachBatch function: cross-batch MinHash dedup against ``store``,
    verdicts appended to ``out_path`` as parquet."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.take(1):
            return
        prof = minhash_doc_profiles(
            batch_df, "doc_id", "text", k=3, n_bands=N_BANDS
        ).localCheckpoint(eager=True)

        reps, batch_dups = _dedup_within(prof, threshold)

        try:
            stored = store.read()
            store_exists = True
        except Exception:
            stored = _store_schema_df(spark)
            store_exists = False
        if stored.take(1):
            stored_sig = profiles_to_signatures(stored, "doc_id", N_BANDS)
            new_sig = profiles_to_signatures(reps, "doc_id", N_BANDS)
            cand = (
                new_sig.select(F.col("doc_id").alias("id_b"), "band", "signature")
                .join(
                    stored_sig.select(
                        F.col("doc_id").alias("id_a"), "band", "signature"
                    ),
                    ["band", "signature"],
                )
                .select("id_a", "id_b")
                .distinct()
            )
            both_prof = stored.unionByName(reps)
            store_pairs = jaccard_verify_profiles(
                cand, both_prof, "doc_id", hint_small=True
            ).filter(F.col("jaccard") >= threshold)
            store_dup_of = store_pairs.groupBy(F.col("id_b").alias("doc_id")).agg(
                F.min("id_a").alias("duplicate_of")
            )
        else:
            store_dup_of = spark.createDataFrame(
                [], "doc_id BIGINT, duplicate_of BIGINT"
            )

        survivors = reps.join(store_dup_of, "doc_id", "left_anti").select(
            "doc_id", "sh_set", "n_sh", *[f"__s{b}" for b in range(N_BANDS)]
        )
        # insert-only MERGE: replaying this batch re-offers the same rows,
        # matched keys are left untouched -> idempotent under crash-replay
        if store_exists:
            store.merge(survivors, keys=["doc_id"], when_matched_update=False)
        else:
            store.write(survivors)

        dup_of = batch_dups.unionByName(store_dup_of)
        verdicts = (
            batch_df.select("doc_id")
            .join(dup_of, "doc_id", "left")
            .select(
                "doc_id",
                F.lit(int(batch_id)).alias("batch_id"),
                F.col("duplicate_of").isNotNull().alias("is_duplicate"),
                "duplicate_of",
            )
        )
        verdicts.write.mode("append").parquet(out_path)

    return on_batch


def start_streaming_dedup(
    docs_stream: DataFrame,
    store: VersionedTable,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Wire the dedup batch function into a stream (availableNow by default
    semantics come from the caller's trigger via start_foreach_batch)."""
    from .sinks import start_foreach_batch

    return start_foreach_batch(
        docs_stream,
        make_dedup_batch_fn(store, out_path, threshold),
        checkpoint=checkpoint,
        output_mode="update",
    )
