"""Streaming iceberg-lite sink: snapshot-per-batch commits with
exactly-once replay (batch id recorded in the snapshot summary; the
TABLE is the dedup source of truth, not the checkpoint)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
    _load_metadata,
    active_files,
    scan,
)
from pwc_challenge_dataengineer_spark.streaming.lakehouse_sink import (
    committed_batch_ids,
    iceberg_batch_sink,
)


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "k long, lang string")


def test_live_stream_commits_snapshot_per_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i in range(3):
        _mk_batch(
            spark, [(i * 10 + j, "en" if j % 2 == 0 else "de") for j in range(4)]
        ).coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    loc = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("k long, lang string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(iceberg_batch_sink(loc, "lang"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    md = _load_metadata(loc)
    n_snaps = len(md["snapshots"])
    assert n_snaps >= 1
    assert committed_batch_ids(loc) == set(range(n_snaps))
    df, n_live, n_pruned = scan(spark, loc)
    assert n_pruned == 0
    assert df.count() == 12
    assert sorted(r["k"] for r in df.collect()) == list(range(4)) + list(
        range(10, 14)
    ) + list(range(20, 24))
    # partition pruning works on the sink-written table
    df_en, _, pruned = scan(spark, loc, partition_pred=lambda p: p == "en")
    assert pruned > 0 and df_en.count() == 6


def test_replayed_batch_commits_exactly_once(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    sink = iceberg_batch_sink(loc, "lang")
    b0 = _mk_batch(spark, [(1, "en"), (2, "de")])
    b1 = _mk_batch(spark, [(3, "en")])
    sink(b0, 0)
    sink(b1, 1)
    snaps_before = len(_load_metadata(loc)["snapshots"])
    rows_before = sorted(
        r["k"] for r in scan(spark, loc)[0].collect()
    )
    # crash-replay: the SAME epoch id arrives again (possibly with the
    # same data) — the sink must skip, not double-append
    sink(b1, 1)
    sink(b0, 0)
    assert len(_load_metadata(loc)["snapshots"]) == snaps_before
    assert (
        sorted(r["k"] for r in scan(spark, loc)[0].collect()) == rows_before
    )
    # a NEW id still commits
    sink(_mk_batch(spark, [(4, "fr")]), 2)
    assert len(_load_metadata(loc)["snapshots"]) == snaps_before + 1
    assert committed_batch_ids(loc) == {0, 1, 2}
    # snapshot-per-batch time travel: snapshot 1 sees only batch 0
    assert sorted(
        r["k"] for r in scan(spark, loc, snapshot_id=1)[0].collect()
    ) == [1, 2]
    assert {p for _, p, _ in active_files(loc)} == {"en", "de", "fr"}


def test_mid_write_crash_leaves_no_half_visible_state(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    sink = iceberg_batch_sink(loc, "lang")
    sink(_mk_batch(spark, [(1, "en")]), 0)
    # simulate a crash AFTER data files landed but BEFORE the manifest
    # commit: orphan files under the batch dir must not be visible
    orphan_dir = os.path.join(loc, "data", "batch-99", "__dir_lang=en")
    os.makedirs(orphan_dir)
    _mk_batch(spark, [(999, "en")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(orphan_dir)
    df, _, _ = scan(spark, loc)
    assert sorted(r["k"] for r in df.collect()) == [1]
    # the replayed batch overwrites the orphans and commits cleanly
    sink(_mk_batch(spark, [(5, "en")]).withColumn("k", F.lit(5)), 99)
    df2, _, _ = scan(spark, loc)
    assert sorted(r["k"] for r in df2.collect()) == [1, 5]


def test_replay_exactly_once_survives_expire_and_compaction(
    spark, tmp_path
):
    """r10 ADVICE pin: replay dedup must survive table MAINTENANCE.
    expire_snapshots drops the snapshots that carried old batch ids,
    and compaction makes a 'replace' snapshot the newest — the
    carried-forward high-water mark in every commit's summary keeps
    the replay horizon intact, so a crash-replay of an expired batch
    still skips."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        compact_data_files,
        committed_batch_hwm,
        expire_snapshots,
    )

    loc = str(tmp_path / "tbl")
    sink = iceberg_batch_sink(loc, "lang")
    sink(_mk_batch(spark, [(1, "en"), (2, "de")]), 0)
    sink(_mk_batch(spark, [(3, "en")]), 1)
    sink(_mk_batch(spark, [(4, "fr")]), 2)
    assert committed_batch_hwm(loc) == 2

    # compaction commits a replace snapshot (no batch id of its own) —
    # the HWM must ride along in its summary
    compact_data_files(spark, loc, "lang")
    assert committed_batch_hwm(loc) == 2
    # expire everything but the compaction snapshot: the per-batch
    # summaries are GONE now
    expire_snapshots(loc, keep_last=1)
    assert committed_batch_ids(loc) == set()  # ids dropped with snaps
    assert committed_batch_hwm(loc) == 2  # ...but the horizon survives

    snaps_before = len(_load_metadata(loc)["snapshots"])
    rows_before = sorted(r["k"] for r in scan(spark, loc)[0].collect())
    # crash-replay of every expired batch: must all skip
    for bid in (0, 1, 2):
        sink(_mk_batch(spark, [(99, "en")]), bid)
    assert len(_load_metadata(loc)["snapshots"]) == snaps_before
    assert (
        sorted(r["k"] for r in scan(spark, loc)[0].collect()) == rows_before
    )
    # a genuinely NEW batch still commits, and advances the HWM
    sink(_mk_batch(spark, [(5, "zh")]), 3)
    assert committed_batch_hwm(loc) == 3
    assert sorted(
        r["k"] for r in scan(spark, loc)[0].collect()
    ) == rows_before + [5]
