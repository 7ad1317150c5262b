"""Streaming CDC -> SCD2 end-to-end: a Debezium-envelope file stream
maintains a versioned SCD2 dimension through foreachBatch, with per-key
event-time validity boundaries, change-only versioning, delete closes,
and crash-replay / kill-and-restart convergence.

Composes the proven pieces (streaming/cdc.py parse -> streaming/
cdc_scd2.py apply -> sources/versioned_store.py commit); the batch-mode
value oracle for the same semantics is plans/incremental.py
``cdc_scd2_state``. Reference intent: src/streaming/cdc_processor.py
43-300 + src/etl/spark/delta_lake_manager.py:373-416."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from pwc_challenge_dataengineer_spark.sources.versioned_store import VersionedTable
from pwc_challenge_dataengineer_spark.streaming.cdc_scd2 import (
    make_cdc_scd2_batch_fn,
)

PAYLOAD = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("balance", T.DoubleType(), True),
    ]
)


def _env(op, user_id, balance, ts_s):
    row = {"user_id": user_id, "balance": balance}
    return json.dumps(
        {
            "op": op,
            "before": row if op == "d" else None,
            "after": None if op == "d" else row,
            "ts_ms": ts_s * 1000,
            "source": {"table": "accounts", "lsn": ts_s},
        }
    )


# four micro-batches exercising every semantic leg:
#   b0: creates            b1: LWW within batch + a no-op upsert
#   b2: delete + create    b3: re-create after delete
CHUNKS = [
    [_env("c", 1, 10.0, 1), _env("c", 2, 20.0, 1)],
    [_env("u", 1, 12.0, 2), _env("u", 1, 15.0, 3), _env("u", 2, 20.0, 3)],
    [_env("d", 2, 20.0, 4), _env("c", 3, 30.0, 4)],
    [_env("c", 2, 25.0, 5)],
]

# (user_id, balance, valid_from_s, valid_to_s, is_current)
EXPECTED = {
    (1, 10.0, 1, 3, False),  # closed by the LWW-winning ts=3 update
    (1, 15.0, 3, None, True),  # ts=2 value lost within-batch, never a row
    (2, 20.0, 1, 4, False),  # closed by the delete at its OWN ts
    (2, 25.0, 5, None, True),  # re-insert after delete = fresh version
    (3, 30.0, 4, None, True),
}


def _write_chunks(spark, src, chunks):
    for rows in chunks:  # sequential single-file writes -> mtime order
        spark.createDataFrame(
            [(v,) for v in rows], "value STRING"
        ).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, table, checkpoint):
    stream = (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            make_cdc_scd2_batch_fn(table, PAYLOAD, ["user_id"], ["balance"])
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


def _state(table):
    return {
        (
            r.user_id,
            r.balance,
            r.valid_from.second + 60 * r.valid_from.minute,
            None
            if r.valid_to is None
            else r.valid_to.second + 60 * r.valid_to.minute,
            r.is_current,
        )
        for r in table.read().collect()
    }


def test_cdc_scd2_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    _write_chunks(spark, src, CHUNKS)
    table = VersionedTable(spark, str(tmp_path / "dim"))
    _run(spark, src, table, str(tmp_path / "ckpt"))
    assert _state(table) == EXPECTED


def test_cdc_scd2_kill_and_restart_converges(spark, tmp_path):
    """Stop after the first two batches, restart from the same checkpoint
    for the rest, then crash-replay the final batch directly — the
    dimension must converge to the exact single-run state each time."""
    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "ckpt")
    table = VersionedTable(spark, str(tmp_path / "dim"))

    _write_chunks(spark, src, CHUNKS[:2])
    _run(spark, src, table, ckpt)  # run 1: consumes b0, b1, then stops
    mid = _state(table)
    assert (1, 15.0, 3, None, True) in mid and len(mid) == 3

    _write_chunks(spark, src, CHUNKS[2:])
    _run(spark, src, table, ckpt)  # restart: same checkpoint, consumes rest
    assert _state(table) == EXPECTED

    # crash-replay: re-apply the last micro-batch through the batch fn
    # (as a restarted query would after a commit-before-checkpoint crash)
    fn = make_cdc_scd2_batch_fn(table, PAYLOAD, ["user_id"], ["balance"])
    replay = spark.createDataFrame([(v,) for v in CHUNKS[3]], "value STRING")
    fn(replay, 99)
    assert _state(table) == EXPECTED  # content fixed point


def test_cdc_scd2_split_commits_skip_history_rewrite(spark, tmp_path):
    """r14: each batch commits only the current slice + the versions it
    closed; prior history segments carry over by manifest reference. The
    store must (a) return the identical state through read(), (b) never
    rewrite an earlier append segment, (c) survive vacuum without
    dropping carried segments."""
    import os

    src = str(tmp_path / "cdc_src")
    _write_chunks(spark, src, CHUNKS)
    table = VersionedTable(spark, str(tmp_path / "dim"))
    _run(spark, src, table, str(tmp_path / "ckpt"))
    assert _state(table) == EXPECTED

    def seg_files(v):
        d = tmp_path / "dim" / f"v={v}" / "append"
        if not d.exists():
            return {}
        return {
            p.name: (p.stat().st_size, p.stat().st_mtime)
            for p in d.glob("*.parquet")
        }

    entries = json.load(open(tmp_path / "dim" / "_manifest.json"))
    assert all("appends" in e for e in entries)  # every commit was split
    # closed rows accumulated across batches via references, not rewrites:
    # the final version references earlier versions' append dirs
    final = entries[-1]
    assert any(a < final["version"] for a in final["appends"])
    before = {v: seg_files(v) for v in final["appends"]}

    # replay the last batch: a fixed point — new version, same state,
    # NO append segment rewritten (byte sizes and mtimes unchanged)
    fn = make_cdc_scd2_batch_fn(table, PAYLOAD, ["user_id"], ["balance"])
    replay = spark.createDataFrame([(v,) for v in CHUNKS[3]], "value STRING")
    fn(replay, 99)
    assert _state(table) == EXPECTED
    after = {v: seg_files(v) for v in before}
    assert after == before

    # vacuum to the newest commit only: carried segments survive
    table.vacuum(keep_last=1)
    assert _state(table) == EXPECTED
    # and the base (current slice) stays bounded by the live keys
    cur = table.read_base()
    assert cur.count() == sum(1 for r in EXPECTED if r[4])
    assert os.path.isdir(str(tmp_path / "dim"))


def test_cdc_scd2_cross_batch_late_event_dropped(spark, tmp_path):
    """A late event arriving in a LATER batch with a ts OLDER than the
    open version's valid_from lost the conflict by event time — it must
    be dropped, not close the current version with valid_to < valid_from
    and install the stale row as current (the reference cdc_processor
    resolves by event timestamp across state, not just within a batch)."""
    table = VersionedTable(spark, str(tmp_path / "dim"))
    fn = make_cdc_scd2_batch_fn(table, PAYLOAD, ["user_id"], ["balance"])
    b0 = spark.createDataFrame([(_env("c", 1, 10.0, 1),)], "value STRING")
    fn(b0, 0)
    b1 = spark.createDataFrame([(_env("u", 1, 15.0, 5),)], "value STRING")
    fn(b1, 1)
    assert _state(table) == {
        (1, 10.0, 1, 5, False),
        (1, 15.0, 5, None, True),
    }
    # batch 2: a straggler with ts=3 — older than the open version (ts=5)
    late = spark.createDataFrame([(_env("u", 1, 12.0, 3),)], "value STRING")
    fn(late, 2)
    assert _state(table) == {
        (1, 10.0, 1, 5, False),
        (1, 15.0, 5, None, True),
    }
    # a late DELETE older than the open version is likewise a no-op
    late_del = spark.createDataFrame([(_env("d", 1, 15.0, 2),)], "value STRING")
    fn(late_del, 3)
    assert _state(table) == {
        (1, 10.0, 1, 5, False),
        (1, 15.0, 5, None, True),
    }
    # and a genuinely-new event still applies
    fresh = spark.createDataFrame([(_env("u", 1, 20.0, 7),)], "value STRING")
    fn(fresh, 4)
    assert _state(table) == {
        (1, 10.0, 1, 5, False),
        (1, 15.0, 5, 7, False),
        (1, 20.0, 7, None, True),
    }


def test_cdc_scd2_late_event_after_delete_not_resurrected(spark, tmp_path):
    """After a DELETE there is no current row, so the open-version guard
    alone cannot see the key's event-time boundary — a straggler upsert
    with a ts OLDER than the delete must still be dropped (compared
    against max(valid_to) in history), not resurrect the key as current."""
    table = VersionedTable(spark, str(tmp_path / "dim"))
    fn = make_cdc_scd2_batch_fn(table, PAYLOAD, ["user_id"], ["balance"])
    fn(spark.createDataFrame([(_env("c", 1, 10.0, 1),)], "value STRING"), 0)
    fn(spark.createDataFrame([(_env("d", 1, 10.0, 5),)], "value STRING"), 1)
    assert _state(table) == {(1, 10.0, 1, 5, False)}
    # straggler upsert older than the delete: must NOT resurrect
    fn(spark.createDataFrame([(_env("u", 1, 12.0, 3),)], "value STRING"), 2)
    assert _state(table) == {(1, 10.0, 1, 5, False)}
    # an upsert at/after the delete boundary is a legitimate re-create
    fn(spark.createDataFrame([(_env("c", 1, 30.0, 8),)], "value STRING"), 3)
    assert _state(table) == {
        (1, 10.0, 1, 5, False),
        (1, 30.0, 8, None, True),
    }
