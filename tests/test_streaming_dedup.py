"""Streaming cross-batch MinHash dedup: documents arriving over micro-batches
must dedupe against everything ingested before them, with only first-seen
representatives landing in the signature store — and per-batch latency must
stay bounded as the store accumulates (append-only segments + compaction,
not a full-snapshot rewrite per batch)."""

from __future__ import annotations

import time

from pwc_challenge_dataengineer_spark.streaming.dedup_stream import (
    DedupSegmentStore,
    make_dedup_batch_fn,
    start_streaming_dedup,
)

_BASE_A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
_BASE_B = "one two three four five six seven eight nine ten eleven twelve"


def test_streaming_minhash_dedup_cross_batch(spark, tmp_path):
    # batch 0: two originals; batch 1: near-copy of doc 1 + new original;
    # batch 2: near-copy of doc 1 again, near-copy of doc 4, and a
    # within-batch near-dup pair (6, 7)
    batches = [
        [(1, _BASE_A + " end1"), (2, "totally different words sharing nothing "
                                     "with any other document here at all")],
        [(3, _BASE_A + " end3"), (4, _BASE_B + " tail4")],
        [(5, _BASE_A + " end5"), (6, _BASE_B + " tail6"), (7, _BASE_B + " tail7")],
    ]
    src = str(tmp_path / "docs_src")
    for b in batches:
        spark.createDataFrame(b, "doc_id BIGINT, text STRING").coalesce(
            1
        ).write.mode("append").parquet(src)

    store = DedupSegmentStore(spark, str(tmp_path / "sig_store"))
    out = str(tmp_path / "verdicts")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_streaming_dedup(
        stream, store, out, checkpoint=str(tmp_path / "ckpt"), threshold=0.5
    )
    q.awaitTermination(240)

    verdicts = {
        r["doc_id"]: (r["is_duplicate"], r["duplicate_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert verdicts[1] == (False, None)
    assert verdicts[2] == (False, None)
    assert verdicts[4] == (False, None)
    assert verdicts[3] == (True, 1), verdicts  # cross-batch vs store
    assert verdicts[5] == (True, 1), verdicts  # two batches later, still doc 1
    assert verdicts[6] == (True, 4), verdicts  # cross-batch vs store
    # 7 collapses within its batch to 6, and 6 is itself a store-dup of 4:
    # the transitive pass resolves 7 -> 6 -> 4, so the verdict names a doc
    # that was actually RETAINED as a representative.
    assert verdicts[7] == (True, 4), verdicts

    # only first-seen representatives accumulated signatures
    assert {r["doc_id"] for r in store.read().collect()} == {1, 2, 4}


def test_short_docs_get_verdicts(spark, tmp_path):
    """Docs with fewer than k=3 tokens produce an EMPTY shingle array, so
    they have no natural profile row — they must still receive an explicit
    is_duplicate=false verdict (output completeness), and must NOT be
    appended to the signature store (a NULL-signature row can never match
    anything and would only grow the segments)."""
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    out = str(tmp_path / "verdicts")
    fn = make_dedup_batch_fn(store, out, threshold=0.5)
    fn(
        spark.createDataFrame(
            [
                (1, _BASE_A + " end1"),  # normal doc
                (2, "hi"),               # 1 token — shingle-less
                (3, "two words"),        # 2 tokens — shingle-less
                (4, ""),                 # empty text
            ],
            "doc_id BIGINT, text STRING",
        ),
        0,
    )
    # a second batch duplicating doc 1 — short docs from b0 must not have
    # polluted the store or the candidate join
    fn(
        spark.createDataFrame(
            [(5, _BASE_A + " end5"), (6, "ok")], "doc_id BIGINT, text STRING"
        ),
        1,
    )
    verdicts = {
        r["doc_id"]: (r["is_duplicate"], r["duplicate_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert set(verdicts) == {1, 2, 3, 4, 5, 6}, verdicts
    assert verdicts[2] == (False, None)
    assert verdicts[3] == (False, None)
    assert verdicts[4] == (False, None)
    assert verdicts[6] == (False, None)
    assert verdicts[5] == (True, 1), verdicts
    # only shingled representatives stored
    assert {r["doc_id"] for r in store.read().collect()} == {1}


def test_segment_store_replay_is_idempotent(spark, tmp_path):
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    out = str(tmp_path / "verdicts")
    fn = make_dedup_batch_fn(store, out, threshold=0.5)
    b0 = spark.createDataFrame(
        [(1, _BASE_A + " x"), (2, _BASE_B + " y")], "doc_id BIGINT, text STRING"
    )
    fn(b0, 0)
    n_before = store.read().count()
    fn(b0, 0)  # crash-replay of the same micro-batch
    assert store.read().count() == n_before
    assert store.n_segments() == 1
    # replayed verdicts are appended (at-least-once contract) but must not
    # mark a survivor as a duplicate of itself
    rows = spark.read.parquet(out).collect()
    assert all(r["duplicate_of"] != r["doc_id"] for r in rows)
    assert not any(r["is_duplicate"] for r in rows)


def test_per_batch_latency_bounded_with_compaction(spark, tmp_path):
    """20+ constant-size batches: per-batch wall time must not trend upward
    (append-only commits are O(batch); compaction bounds the segment/file
    count). The old full-snapshot MERGE grew linearly with the corpus."""
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    out = str(tmp_path / "verdicts")
    fn = make_dedup_batch_fn(store, out, threshold=0.5, compact_every=6)

    n_batches, per_batch = 22, 25
    times = []
    for b in range(n_batches):
        rows = [
            (b * per_batch + i, f"doc {b} {i} " + " ".join(
                f"w{(b * per_batch + i + j) % 97}" for j in range(12)))
            for i in range(per_batch)
        ]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        t0 = time.time()
        fn(df, b)
        times.append(time.time() - t0)

    # segment count bounded by compaction
    assert store.n_segments() <= 6
    # all unique docs retained exactly once across segments + compactions
    assert store.read().count() == store.read().select("doc_id").distinct().count()
    # latency gate: the median of the last 5 batches must stay within 2.5x
    # the median of batches 3-7 (early batches excluded: JVM/codegen warm-up).
    med = lambda xs: sorted(xs)[len(xs) // 2]
    early, late = med(times[3:8]), med(times[-5:])
    assert late <= max(2.5 * early, early + 2.0), (
        f"per-batch latency grew: early median {early:.2f}s -> "
        f"late median {late:.2f}s; all={['%.2f' % t for t in times]}"
    )


def test_replay_idempotent_after_compaction(spark, tmp_path):
    """A batch whose segment was folded into a compaction must still be
    recognized as applied — re-appending it would duplicate its survivors
    (the manifest's `applied` list survives the fold; `segments` doesn't)."""
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    for b in range(4):
        df = spark.createDataFrame(
            [(b * 10 + i, f"doc {b} {i} unique words {b}-{i}") for i in range(3)],
            "doc_id BIGINT, text STRING",
        )
        from pwc_challenge_dataengineer_spark.functions.dedup_fuzzy import (
            minhash_doc_profiles,
        )
        prof = minhash_doc_profiles(df, "doc_id", "text", k=3, n_bands=4)
        assert store.append(prof, seg_id=str(b)) is True
    n_before = store.read().count()
    rows_before = store.total_rows()
    store.compact()
    assert store.n_segments() == 1
    assert store.total_rows() == rows_before  # counts survive the fold
    # crash-replay of batch 2 AFTER compaction: must be a no-op
    df2 = spark.createDataFrame(
        [(2 * 10 + i, f"doc 2 {i} unique words 2-{i}") for i in range(3)],
        "doc_id BIGINT, text STRING",
    )
    from pwc_challenge_dataengineer_spark.functions.dedup_fuzzy import (
        minhash_doc_profiles,
    )
    prof2 = minhash_doc_profiles(df2, "doc_id", "text", k=3, n_bands=4)
    assert store.append(prof2, seg_id="2") is False
    assert store.read().count() == n_before


def test_cycle_in_dup_map_terminates(spark, tmp_path):
    """r8 ADVICE (high): re-delivering a stored representative alongside a
    SMALLER-id near-duplicate in one batch creates dmap[rep]=new (batch-
    internal pair, id-ordered) AND dmap[new]=rep (store-side pair, only
    filtered by id_a != id_b) — a 2-cycle the unguarded pointer chase
    looped on forever. The guard must terminate and break the cycle to the
    smallest id in it."""
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    out = str(tmp_path / "verdicts")
    fn = make_dedup_batch_fn(store, out, threshold=0.5)
    # batch 0: doc 5 becomes the stored representative
    fn(
        spark.createDataFrame([(5, _BASE_A + " end")],
                              "doc_id BIGINT, text STRING"),
        0,
    )
    # batch 1: doc 5 re-delivered verbatim + smaller-id near-dup doc 2
    fn(
        spark.createDataFrame(
            [(2, _BASE_A + " alt"), (5, _BASE_A + " end")],
            "doc_id BIGINT, text STRING",
        ),
        1,
    )
    verdicts = {
        (r["batch_id"], r["doc_id"]): (r["is_duplicate"], r["duplicate_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert verdicts[(0, 5)] == (False, None)
    # cycle {2, 5} broken deterministically to min id 2
    assert verdicts[(1, 5)] == (True, 2), verdicts
    assert verdicts[(1, 2)] == (False, None), verdicts


def test_negative_doc_id_rejected_not_corrupted(spark, tmp_path):
    """r8 ADVICE: sentinel rows live at doc_ids -1/-2/-3; a legal-BIGINT
    negative doc_id used to silently corrupt the batch counts. It must be
    rejected loudly instead."""
    import pytest as _pytest

    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    fn = make_dedup_batch_fn(store, str(tmp_path / "verdicts"), threshold=0.5)
    with _pytest.raises(ValueError, match="doc_id .*-1.* < 0|doc_id -1"):
        fn(
            spark.createDataFrame(
                [(-1, _BASE_A + " end"), (3, _BASE_B + " x")],
                "doc_id BIGINT, text STRING",
            ),
            0,
        )


def _mk_prof(spark, rows):
    from pwc_challenge_dataengineer_spark.functions.dedup_fuzzy import (
        minhash_doc_profiles,
    )

    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    return minhash_doc_profiles(df, "doc_id", "text", k=3, n_bands=4)


def test_tiered_compaction_folds_only_smallest(spark, tmp_path):
    """r13: size-tiered compaction — compact(fanout=k) merges only the k
    SMALLEST live segments, leaving bigger runs untouched (the O(store)
    every-fold rewrite was the one rising STREAM_BENCH tail). Rows are
    conserved and reads see everything."""
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    # one BIG segment (6 docs), then 4 micro segments (1 doc each)
    big = [(100 + i, f"big doc {i} words alpha beta gamma {i}") for i in range(6)]
    assert store.append(_mk_prof(spark, big), seg_id="big") is True
    for b in range(4):
        assert store.append(
            _mk_prof(spark, [(b, f"micro doc {b} unique tail {b}")]),
            seg_id=f"m{b}",
        )
    rows_before = store.total_rows()
    store.compact(fanout=4)  # folds the 4 micros, NOT the big segment
    segs = store._load()["segments"]
    assert "big" in segs and len(segs) == 2, segs
    assert store.total_rows() == rows_before
    assert store.read().count() == rows_before
    # fewer live segments than fanout: fold is a no-op (no all-fold)
    store.compact(fanout=4)
    assert store._load()["segments"] == segs


def test_ttl_expiry_drops_old_segments_keeps_replay_idempotent(
    spark, tmp_path
):
    """r13: ttl_appends expiry — segments beyond the append horizon are
    dropped whole (store size O(horizon)); a duplicate of a dropped doc
    is no longer detected (the documented bounded-state trade) but
    replaying the DROPPED batch is still a no-op, and newer docs still
    dedup."""
    store = DedupSegmentStore(spark, str(tmp_path / "store"))
    for b in range(5):
        assert store.append(
            _mk_prof(spark, [(b, f"doc number {b} unique body text {b}")]),
            seg_id=str(b),
        )
    # horizon 2: only the segments of the last 2 appends survive
    # (fanout larger than live count -> expiry only, no fold)
    store.compact(fanout=10, ttl_appends=2)
    state = store._load()
    assert state["segments"] == ["3", "4"], state["segments"]
    assert store.total_rows() == 2
    import os as _os

    assert not _os.path.isdir(
        _os.path.join(str(tmp_path / "store"), "profiles", "seg=0")
    )
    # replay of an EXPIRED batch: still applied, still a no-op
    assert store.has_segment("0") is True
    assert (
        store.append(
            _mk_prof(spark, [(0, "doc number 0 unique body text 0")]),
            seg_id="0",
        )
        is False
    )
    # expiry composes with a fold: survivors can still be folded later
    store.compact(fanout=2)
    assert len(store._load()["segments"]) == 1
    assert store.total_rows() == 2
