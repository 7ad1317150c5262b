"""Iceberg-lite table-layout tests: OCF metadata IO, snapshot commit
semantics (EXISTING carry-forward, DELETED tombstones), manifest-level
pruning, time travel, and the honest format gates. Spark only enters for
the scan() data plane; everything else is driver-side metadata, as in
real Iceberg engines."""

from __future__ import annotations

import json
import os

import pytest

from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
    _MANIFEST_LIST_SCHEMA,
    _MANIFEST_SCHEMA,
    active_files,
    commit_snapshot,
    read_ocf,
    write_ocf,
)


def _touch(path: str, size: int = 8) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(b"x" * size)
    return path


def test_ocf_round_trip_nested_records(tmp_path):
    p = str(tmp_path / "m.avro")
    rows = [
        (1, 5, ("/a.parquet", "PARQUET", ("en",), 100, 2048,
                '{"doc_id": [0, 99]}')),
        (0, 5, ("/b.parquet", "PARQUET", ("de",), 50, 1024, "")),
        (2, 6, ("/c.parquet", "PARQUET", ("zh",), 7, 99, "")),
    ]
    write_ocf(p, _MANIFEST_SCHEMA, rows)
    assert read_ocf(p) == rows
    lp = str(tmp_path / "l.avro")
    write_ocf(
        lp,
        _MANIFEST_LIST_SCHEMA,
        [(p, os.path.getsize(p), 0, 5, '{"lo": "de", "hi": "en"}')],
    )
    assert read_ocf(lp)[0][0] == p


def test_commit_carry_forward_and_tombstones(tmp_path):
    loc = str(tmp_path / "tbl")
    a = _touch(os.path.join(loc, "data", "a.parquet"))
    b = _touch(os.path.join(loc, "data", "b.parquet"))
    sid1 = commit_snapshot(loc, "lang", [(a, "en", 10), (b, "de", 20)])
    assert sid1 == 1
    assert sorted(p for p, _, _ in active_files(loc)) == sorted([a, b])
    c = _touch(os.path.join(loc, "data", "c.parquet"))
    sid2 = commit_snapshot(loc, "lang", [(c, "fr", 5)], deleted_paths=(b,))
    assert sid2 == 2
    # current snapshot: b tombstoned, a carried forward, c added
    now = active_files(loc)
    assert sorted(p for p, _, _ in now) == sorted([a, c])
    assert {part for _, part, _ in now} == {"en", "fr"}
    # time travel: snapshot 1 still sees a AND b
    then = active_files(loc, snapshot_id=1)
    assert sorted(p for p, _, _ in then) == sorted([a, b])
    # manifest REUSE (r13): snapshot 2's manifest holds ONLY its own
    # delta (c ADDED, b DELETED tombstone); snapshot 1's manifest is
    # referenced verbatim by snap-2's list, never rewritten
    entries = read_ocf(os.path.join(loc, "metadata", "manifest-2.avro"))
    assert sorted(e[0] for e in entries) == [1, 2]
    m1 = read_ocf(os.path.join(loc, "metadata", "manifest-1.avro"))
    assert sorted(e[0] for e in m1) == [1, 1]
    mlist = read_ocf(os.path.join(loc, "metadata", "snap-2.avro"))
    assert [os.path.basename(r[0]) for r in mlist] == [
        "manifest-1.avro",
        "manifest-2.avro",
    ]
    # and the new list row carries a partition summary
    import json as _json

    summ = _json.loads(mlist[1][4])
    assert (summ["lo"], summ["hi"], summ["n_deleted"]) == ("fr", "fr", 1)


def test_unknown_snapshot_and_version_gate(tmp_path):
    loc = str(tmp_path / "tbl")
    a = _touch(os.path.join(loc, "data", "a.parquet"))
    commit_snapshot(loc, "lang", [(a, "en", 1)])
    with pytest.raises(ValueError, match="unknown snapshot"):
        active_files(loc, snapshot_id=99)
    md_path = os.path.join(loc, "metadata", "v1.metadata.json")
    md = json.load(open(md_path))
    md["format-version"] = 2
    json.dump(md, open(md_path, "w"))
    with pytest.raises(NotImplementedError, match="format-version 1"):
        active_files(loc)


def test_metadata_versions_accumulate(tmp_path):
    loc = str(tmp_path / "tbl")
    a = _touch(os.path.join(loc, "data", "a.parquet"))
    commit_snapshot(loc, "lang", [(a, "en", 1)])
    b = _touch(os.path.join(loc, "data", "b.parquet"))
    commit_snapshot(loc, "lang", [(b, "de", 1)])
    files = sorted(os.listdir(os.path.join(loc, "metadata")))
    assert "v1.metadata.json" in files and "v2.metadata.json" in files
    assert "snap-1.avro" in files and "snap-2.avro" in files


def test_murmur3_iceberg_spec_vectors():
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        bucket_transform,
        murmur3_32,
    )

    # published in the Iceberg spec's appendix (hash requirements table)
    assert murmur3_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089
    # bucket is (hash & Integer.MAX_VALUE) % N and must be stable
    assert bucket_transform(34, 16) == bucket_transform(34, 16)
    assert 0 <= bucket_transform(-7, 8) < 8  # negative longs legal
    # tail handling: 1-3 trailing bytes exercise the partial block
    assert murmur3_32(b"a") != murmur3_32(b"ab") != murmur3_32(b"abc")


def test_all_pruned_scan_returns_empty_frame(tmp_path, spark):
    # ADVICE r9: a predicate matching no partition is a legitimate
    # outcome -> empty DataFrame with the table schema, not a crash
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import scan

    loc = str(tmp_path / "tbl")
    out = os.path.join(loc, "data", "lang=en")
    spark.createDataFrame(
        [(1, "en", 10)], "doc_id long, lang string, n int"
    ).coalesce(1).write.parquet(out)
    pq = next(
        os.path.join(out, f)
        for f in sorted(os.listdir(out))
        if f.endswith(".parquet")
    )
    commit_snapshot(loc, "lang", [(pq, "en", 1)])
    df, n_live, n_pruned = scan(
        spark, loc, partition_pred=lambda p: p == "zz"
    )
    assert (n_live, n_pruned) == (1, 1)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "lang", "n"]


def test_v2_deletes_and_sequence_rules(tmp_path, spark):
    """v2 row-level deletes: positional (<= rule), equality (strictly-
    less rule — a same-snapshot re-add survives), carry-forward of
    delete entries, and time travel across delete snapshots."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        active_entries_v2,
        commit_snapshot_v2,
        scan_v2,
    )
    from pyspark.sql import functions as F

    loc = str(tmp_path / "tbl")

    def write_one(subdir, rows):
        out = os.path.join(loc, subdir)
        spark.createDataFrame(
            rows, "k long, v string"
        ).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    # seq 1: one data file with rows k=0..4, v='a<k>'
    d1 = write_one("d1", [(k, f"a{k}") for k in range(5)])
    commit_snapshot_v2(loc, "p", added=[(d1, "x", 5)])
    # seq 2: positional delete of pos 1 and 3 in d1
    pout = os.path.join(loc, "pd")
    spark.createDataFrame(
        [(d1, 1), (d1, 3)], "file_path string, pos long"
    ).coalesce(1).write.parquet(pout)
    pd1 = next(
        os.path.join(pout, f)
        for f in sorted(os.listdir(pout))
        if f.endswith(".parquet")
    )
    commit_snapshot_v2(loc, "p", added_deletes=[(pd1, "", 1, None)])
    # seq 3: equality delete on v='a0' AND a re-added file with v='a0'
    eout = os.path.join(loc, "eq")
    spark.createDataFrame([("a0",)], "v string").coalesce(1).write.parquet(
        eout
    )
    eq1 = next(
        os.path.join(eout, f)
        for f in sorted(os.listdir(eout))
        if f.endswith(".parquet")
    )
    d2 = write_one("d2", [(99, "a0")])
    commit_snapshot_v2(
        loc, "p", added=[(d2, "x", 1)], added_deletes=[(eq1, "", 2, ("v",))]
    )

    # current snapshot: pos deletes drop k=1,3; eq delete drops the
    # ORIGINAL a0 row (seq 1 < 3) but NOT the re-added one (seq 3 == 3)
    df, n_live, n_pruned = scan_v2(spark, loc)
    got = sorted((r["k"], r["v"]) for r in df.collect())
    assert got == [(2, "a2"), (4, "a4"), (99, "a0")], got
    assert (n_live, n_pruned) == (2, 0)

    # time travel to seq 2: eq delete + re-add invisible, pos applied
    df2, _, _ = scan_v2(spark, loc, snapshot_id=2)
    got2 = sorted(r["k"] for r in df2.collect())
    assert got2 == [0, 2, 4], got2

    # carry-forward: current entries still carry the pos delete at its
    # ORIGINAL sequence number
    entries = active_entries_v2(loc)
    pos = [e for e in entries if e["content"] == 1]
    assert pos and pos[0]["seq"] == 2, entries

    # partition pruning on a v2 scan prunes without opening
    df3, n_live3, n_pruned3 = scan_v2(
        spark, loc, partition_pred=lambda p: p == "nope"
    )
    assert df3.count() == 0 and (n_live3, n_pruned3) == (2, 2)


def test_compaction_and_expiry(tmp_path, spark):
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        compact_data_files,
        expire_snapshots,
        scan,
    )

    loc = str(tmp_path / "tbl")

    def write_one(subdir, rows):
        out = os.path.join(loc, "data", subdir)
        spark.createDataFrame(
            rows, "k long, lang string"
        ).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    # two small files per partition across two commits
    a1 = write_one("a1", [(1, "en"), (2, "en")])
    b1 = write_one("b1", [(3, "de")])
    commit_snapshot(loc, "lang", [(a1, "en", 2), (b1, "de", 1)])
    a2 = write_one("a2", [(4, "en")])
    commit_snapshot(loc, "lang", [(a2, "en", 1)])

    sid, before, after = compact_data_files(spark, loc, "lang")
    assert before == 3 and after == 2  # one packed file per partition
    df, n_live, _ = scan(spark, loc)
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 4]
    # old snapshot still reads the old files (replace, not delete)
    old, n_old, _ = scan(spark, loc, snapshot_id=2)
    assert sorted(r["k"] for r in old.collect()) == [1, 2, 3, 4]

    n_exp, n_removed = expire_snapshots(loc, keep_last=1)
    assert n_exp == 2 and n_removed == 3  # all three small files gone
    assert not os.path.exists(a1) and not os.path.exists(a2)
    # current data intact; expired snapshot unreadable
    df2, _, _ = scan(spark, loc)
    assert sorted(r["k"] for r in df2.collect()) == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="unknown snapshot"):
        scan(spark, loc, snapshot_id=2)
    # ids keep growing past expiry: no reuse of expired snapshot ids
    c1 = write_one("c1", [(9, "fr")])
    new_sid = commit_snapshot(loc, "lang", [(c1, "fr", 1)])
    assert new_sid > sid


def test_v2_scan_survives_nasty_table_location(tmp_path, spark):
    """r10 ADVICE pin: Spark renders `_metadata.file_path` as a
    percent-encoded URI (space -> %20, %% -> %%25; unicode and '+'
    stay raw). A location containing those chars must NOT silently
    drop rows via a missed file_path join — the decode must invert
    Spark's encoding exactly, and positional deletes must still land
    on the right (file, pos)."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        commit_snapshot_v2,
        scan_v2,
    )

    loc = str(tmp_path / "nasty dir %20 ü+x" / "tbl")

    def write_one(subdir, rows, schema="k long, v string"):
        out = os.path.join(loc, subdir)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    d1 = write_one("d1", [(k, f"a{k}") for k in range(4)])
    commit_snapshot_v2(loc, "p", added=[(d1, "x", 4)])
    pd1 = write_one("pd", [(d1, 2)], "file_path string, pos long")
    commit_snapshot_v2(loc, "p", added_deletes=[(pd1, "", 1, None)])
    df, n_live, n_pruned = scan_v2(spark, loc)
    got = sorted(r["k"] for r in df.collect())
    # a broken join would either return [] (seq_map miss drops all
    # rows) or [0,1,2,3] (delete anti-join misses) — both fail here
    assert got == [0, 1, 3], got
    assert (n_live, n_pruned) == (1, 0)


def test_v2_equality_delete_null_matches_null(tmp_path, spark):
    """r10 ADVICE pin: Iceberg equality-delete matching is null-safe —
    a delete row carrying NULL in an equality column deletes data rows
    whose column is NULL (plain '==' would never match them)."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        commit_snapshot_v2,
        scan_v2,
    )

    loc = str(tmp_path / "tbl")

    def write_one(subdir, rows, schema="k long, v string"):
        out = os.path.join(loc, subdir)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    d1 = write_one("d1", [(1, "a"), (2, None), (3, "b")])
    commit_snapshot_v2(loc, "p", added=[(d1, "x", 3)])
    eq1 = write_one("eq", [(None,)], "v string")
    commit_snapshot_v2(loc, "p", added_deletes=[(eq1, "", 2, ("v",))])
    df, _, _ = scan_v2(spark, loc)
    got = sorted(r["k"] for r in df.collect())
    assert got == [1, 3], got  # the NULL row is gone


def test_fixture_dir_builds_once_under_concurrency(monkeypatch):
    """r10 ADVICE pin: two in-process threads that miss the memo
    simultaneously must NOT both rmtree+build the same nonce-suffixed
    location — the per-key lock serializes check-build-insert."""
    import threading
    import time

    from pwc_challenge_dataengineer_spark.plans import lakehouse as lh

    monkeypatch.setattr(lh, "_BUILT", {})
    monkeypatch.setattr(lh, "_KEY_LOCKS", {})
    calls = []

    def slow_build(location):
        calls.append(location)
        time.sleep(0.2)  # widen the race window

    results = []
    barrier = threading.Barrier(4)

    def worker():
        barrier.wait()
        results.append(
            lh._fixture_dir("racekind", "/nonexistent-sf", slow_build)
        )

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, calls  # built exactly once
    assert len(set(results)) == 1  # every thread got the same location


def test_schema_evolution_field_id_resolution(tmp_path, spark):
    """Field-id resolution across rename+add: renamed column carries
    data from pre-rename files; added column reads NULL from them;
    as-of reads to a pre-evolution snapshot surface the OLD names."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        scan_evolved,
        set_schema,
    )

    loc = str(tmp_path / "tbl")

    def write_one(subdir, rows, schema):
        out = os.path.join(loc, subdir)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    set_schema(
        loc,
        [{"id": 1, "name": "k"}, {"id": 2, "name": "body"}],
    )
    a = write_one("a", [(1, "old1"), (2, "old2")], "k long, body string")
    commit_snapshot(loc, "p", [(a, "x", 2)])
    set_schema(
        loc,
        [
            {"id": 1, "name": "k"},
            {"id": 2, "name": "text"},  # rename keeps id 2
            {"id": 3, "name": "score"},  # added
        ],
    )
    b = write_one(
        "b", [(3, "new3", 30)], "k long, text string, score long"
    )
    sid2 = commit_snapshot(loc, "p", [(b, "x", 1)])

    df, n_groups, n_pruned = scan_evolved(spark, loc)
    got = sorted(
        (r["k"], r["text"], r["score"]) for r in df.collect()
    )
    # a name-based read would yield text=NULL for k=1,2 — pinned here
    assert got == [(1, "old1", None), (2, "old2", None), (3, "new3", 30)]
    assert (n_groups, n_pruned) == (2, 0)

    # as-of the pre-evolution snapshot: old schema, old names
    old_df, n_old, _ = scan_evolved(spark, loc, snapshot_id=sid2 - 1)
    assert old_df.columns == ["k", "body"]
    assert sorted(r["body"] for r in old_df.collect()) == ["old1", "old2"]


def test_evolved_scan_survives_snapshot_expiry(tmp_path, spark):
    """r11 ADVICE pin (low): after expire_snapshots drops the snapshot
    that ADDED a still-live file, no surviving ADDED manifest row
    records its writer schema — the persisted file-schemas metadata map
    keeps scan_evolved's field-id resolution exact instead of
    KeyError-crashing."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        expire_snapshots,
        scan_evolved,
        set_schema,
    )

    loc = str(tmp_path / "tbl")

    def write_one(subdir, rows, schema):
        out = os.path.join(loc, subdir)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    set_schema(loc, [{"id": 1, "name": "k"}, {"id": 2, "name": "body"}])
    a = write_one("a", [(1, "old1"), (2, "old2")], "k long, body string")
    commit_snapshot(loc, "p", [(a, "x", 2)])
    set_schema(
        loc,
        [
            {"id": 1, "name": "k"},
            {"id": 2, "name": "text"},  # rename keeps id 2
            {"id": 3, "name": "score"},  # added
        ],
    )
    b = write_one("b", [(3, "new3", 30)], "k long, text string, score long")
    commit_snapshot(loc, "p", [(b, "x", 1)])

    n_expired, n_removed = expire_snapshots(loc, keep_last=1)
    assert n_expired == 1 and n_removed == 0  # file a carried, still live
    df, n_groups, _ = scan_evolved(spark, loc)
    got = sorted((r["k"], r["text"], r["score"]) for r in df.collect())
    assert got == [(1, "old1", None), (2, "old2", None), (3, "new3", 30)]
    assert n_groups == 2


def test_v2_commit_carries_batch_hwm(tmp_path, spark):
    """r11 ADVICE pin (low): a v2 delete/replace commit becoming the
    newest snapshot must carry the streaming-batch high-water mark
    forward, like every v1 commit — or a crash-replay after maintenance
    could double-append."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        _metadata_path,
        commit_snapshot_v2,
        committed_batch_hwm,
    )

    loc = str(tmp_path / "tbl")
    d1 = _touch(os.path.join(loc, "data", "d1.parquet"))
    commit_snapshot_v2(
        loc, "p", added=[(d1, "x", 1)], summary={"streaming-batch-id": "7"}
    )
    assert committed_batch_hwm(loc) == 7
    # a later v2 commit WITHOUT a batch id (e.g. a delete commit) must
    # still carry the horizon in ITS OWN summary — maintenance that
    # later drops the batch-7 snapshot then cannot lose the horizon
    commit_snapshot_v2(loc, "p", deleted_paths=(d1,))
    with open(_metadata_path(loc)) as fh:
        md = json.load(fh)
    newest = md["snapshots"][-1]
    assert newest["summary"]["streaming-batch-hwm"] == "7"
    assert committed_batch_hwm(loc) == 7


def test_metrics_bounds_skip_and_carry_forward(tmp_path, spark):
    """r12: manifest column-bounds skipping — a range predicate skips
    files whose recorded [lower, upper] cannot intersect WITHOUT opening
    them; files with NO recorded bounds are conservatively read; and
    EXISTING entries carry their bounds across later commits."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        scan_metrics,
    )

    loc = str(tmp_path / "tbl")

    def write_one(name, ids):
        out = os.path.join(loc, "data", name)
        spark.createDataFrame(
            [(i, f"v{i}") for i in ids], "id long, v string"
        ).coalesce(1).write.parquet(out)
        return next(
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        )

    lo_file = write_one("a", [0, 5, 9])       # bounds [0, 9]
    hi_file = write_one("b", [100, 150])      # bounds [100, 150]
    nb_file = write_one("c", [1000])          # committed WITHOUT bounds
    commit_snapshot(
        loc,
        "p",
        [(lo_file, "x", 3), (hi_file, "x", 2), (nb_file, "x", 1)],
        added_bounds={
            lo_file: {"id": [0, 9]},
            hi_file: {"id": [100, 150]},
        },
    )
    # range [0, 50): hi_file skipped on bounds; nb_file opened (no stats)
    df, n_live, n_part, n_skip = scan_metrics(spark, loc, "id", 0, 50)
    assert (n_live, n_part, n_skip) == (3, 0, 1)
    assert sorted(r["id"] for r in df.collect()) == [0, 5, 9, 1000]
    # boundary semantics: bounds inclusive, predicate [lo, hi)
    _, _, _, n_skip2 = scan_metrics(spark, loc, "id", 9, 100)  # touches lo
    assert n_skip2 == 1  # hi_file's [100,150] fails hi-exclusive 100
    # a second commit carries the bounds on EXISTING entries
    d_file = write_one("d", [7])
    commit_snapshot(loc, "p", [(d_file, "x", 1)])
    df3, n_live3, _, n_skip3 = scan_metrics(spark, loc, "id", 200, 900)
    assert (n_live3, n_skip3) == (4, 2)  # a, b skipped via carried bounds
    # c and d carry no bounds -> both conservatively opened; residual
    # filtering is the caller's job (bounds are file-level)
    assert sorted(r["id"] for r in df3.collect()) == [7, 1000]


def test_pre_bounds_v1_manifest_still_readable(tmp_path):
    """r12 ADVICE pin: the v1 manifest data_file record GREW a 'bounds'
    field, but read_ocf decodes with the file's embedded writer schema
    — manifests written before that change yield 5-tuples. A strict
    6-way unpack would make every pre-existing v1 table unreadable AND
    uncommittable (reads, commit carry-forward and expire all walk
    _active_entries_v1). The walk must tolerate old rows (bounds={})."""
    import copy

    loc = str(tmp_path / "tbl")
    a = _touch(os.path.join(loc, "data", "a.parquet"))
    b = _touch(os.path.join(loc, "data", "b.parquet"))
    commit_snapshot(loc, "lang", [(a, "en", 10), (b, "de", 20)])
    # simulate the pre-bounds writer: rewrite manifest-1 with the OLD
    # 5-field data_file schema (no 'bounds')
    old_schema = copy.deepcopy(_MANIFEST_SCHEMA)
    df_fields = old_schema["fields"][2]["type"]["fields"]
    assert df_fields[-1]["name"] == "bounds"
    old_schema["fields"][2]["type"]["fields"] = df_fields[:-1]
    mpath = os.path.join(loc, "metadata", "manifest-1.avro")
    rows = [
        (st, sid, tuple(df[:-1])) for st, sid, df in read_ocf(mpath)
    ]
    write_ocf(mpath, old_schema, rows)
    # reads tolerate the 5-field rows
    assert sorted(p for p, _, _ in active_files(loc)) == sorted([a, b])
    # and a NEW commit carries them forward (EXISTING) without error
    c = _touch(os.path.join(loc, "data", "c.parquet"))
    commit_snapshot(loc, "lang", [(c, "fr", 5)], deleted_paths=(b,))
    assert sorted(p for p, _, _ in active_files(loc)) == sorted([a, c])


def _write_pq(spark, path: str, vals) -> str:
    import shutil

    tmp = path + ".tmpdir"
    spark.createDataFrame([(v,) for v in vals], "id long").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.replace(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path


def test_manifest_summary_skipping_counts_opens(tmp_path, spark, monkeypatch):
    """r13: manifest-list partition summaries — a range scan opens only
    manifests whose [lo, hi] can intersect, pinned by instrumenting the
    OCF decoder: N one-partition commits, a one-partition range query
    must decode exactly 1 manifest + the list."""
    from pwc_challenge_dataengineer_spark.sources import iceberg_lite as il

    loc = str(tmp_path / "tbl")
    for i, part in enumerate(["a", "b", "c", "d"]):
        f = _write_pq(
            spark, os.path.join(loc, "data", f"{part}.parquet"), [i * 10]
        )
        commit_snapshot(loc, "p", [(f, part, 1)])
    opened = []
    real = il.read_ocf

    def counting(path):
        opened.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(il, "read_ocf", counting)
    df, n_manifests, n_skipped, n_live, n_pruned = il.scan_summaries(
        spark, loc, "b", "b"
    )
    assert (n_manifests, n_skipped, n_live, n_pruned) == (4, 3, 1, 0)
    assert [r["id"] for r in df.collect()] == [10]
    manifests_opened = [f for f in opened if f.startswith("manifest-")]
    assert len(manifests_opened) == 1, opened  # 3 of 4 never decoded


def test_tombstone_manifest_never_skipped(tmp_path, spark):
    """A skipped tombstone would RESURRECT a file added by an older
    manifest: deleting partition-a's file in a commit that also adds a
    partition-z file must keep a's file dead even for a range query
    [a, a] that excludes z."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        scan_summaries,
    )

    loc = str(tmp_path / "tbl")
    fa = _write_pq(spark, os.path.join(loc, "data", "a.parquet"), [1])
    commit_snapshot(loc, "p", [(fa, "a", 1)])
    fz = _write_pq(spark, os.path.join(loc, "data", "z.parquet"), [99])
    commit_snapshot(loc, "p", [(fz, "z", 1)], deleted_paths=(fa,))
    df, n_m, n_skipped, n_live, _ = scan_summaries(spark, loc, "a", "a")
    # manifest 2 has a tombstone -> opened despite its z-range summary
    assert n_skipped == 0 and n_live == 1
    assert df.count() == 0  # a's file is dead, not resurrected


def test_readd_after_delete_last_writer_wins(tmp_path, spark):
    """A path deleted at snapshot 2 and re-added at snapshot 3 is LIVE:
    the re-add entry (higher snapshot id) beats the old tombstone that
    snapshot 3's list still references via manifest reuse."""
    loc = str(tmp_path / "tbl")
    fa = _write_pq(spark, os.path.join(loc, "data", "a.parquet"), [1])
    commit_snapshot(loc, "p", [(fa, "a", 1)])
    commit_snapshot(loc, "p", [], deleted_paths=(fa,))
    assert active_files(loc) == []
    commit_snapshot(loc, "p", [(fa, "a", 1)])
    assert [p for p, _, _ in active_files(loc)] == [fa]
    # and time travel still sees each era correctly
    assert active_files(loc, snapshot_id=2) == []
    assert [p for p, _, _ in active_files(loc, snapshot_id=1)] == [fa]


def test_rewrite_manifests_then_expire_reclaims_chain(tmp_path, spark):
    """Incremental commits reuse every prior manifest, so the newest
    snapshot references the whole chain and expiry alone reclaims no
    manifest files. rewrite_manifests squashes live entries into
    per-partition manifests (tight summaries, zero tombstones); expiry
    after it removes the entire old chain while reads stay correct."""
    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        expire_snapshots,
        rewrite_manifests,
        scan_summaries,
    )

    loc = str(tmp_path / "tbl")
    paths = []
    for i, part in enumerate(["a", "b", "a", "c"]):
        f = _write_pq(
            spark, os.path.join(loc, "data", f"f{i}.parquet"), [i]
        )
        paths.append(f)
        commit_snapshot(loc, "p", [(f, part, 1)])
    commit_snapshot(loc, "p", [], deleted_paths=(paths[1],))
    n_before, n_after = rewrite_manifests(loc)
    assert n_before == 5 and n_after == 2  # partitions a (2 files) + c
    n_expired, n_files_removed = expire_snapshots(loc, keep_last=1)
    assert n_expired == 5
    assert n_files_removed == 1  # only b's file was dead
    mdir = os.path.join(loc, "metadata")
    live_manifests = sorted(
        f for f in os.listdir(mdir) if f.startswith("manifest-")
    )
    assert live_manifests == ["manifest-6-0.avro", "manifest-6-1.avro"]
    df, n_m, n_skipped, n_live, _ = scan_summaries(spark, loc, "a", "a")
    assert (n_m, n_skipped, n_live) == (2, 1, 2)
    assert sorted(r["id"] for r in df.collect()) == [0, 2]


def test_pre_summary_manifest_list_tolerated(tmp_path, spark):
    """Manifest lists written before the partition_summary field
    (4-tuples under the embedded writer schema) stay readable, and
    their manifests are conservatively never skipped."""
    import copy

    from pwc_challenge_dataengineer_spark.sources.iceberg_lite import (
        scan_summaries,
    )

    loc = str(tmp_path / "tbl")
    fa = _write_pq(spark, os.path.join(loc, "data", "a.parquet"), [1])
    commit_snapshot(loc, "p", [(fa, "a", 1)])
    # rewrite snap-1 with the OLD 4-field list schema
    old_schema = copy.deepcopy(_MANIFEST_LIST_SCHEMA)
    assert old_schema["fields"][-1]["name"] == "partition_summary"
    old_schema["fields"] = old_schema["fields"][:-1]
    lp = os.path.join(loc, "metadata", "snap-1.avro")
    rows = [tuple(r[:4]) for r in read_ocf(lp)]
    write_ocf(lp, old_schema, rows)
    assert [p for p, _, _ in active_files(loc)] == [fa]
    df, _n_m, n_skipped, n_live, _ = scan_summaries(spark, loc, "z", "z")
    assert n_skipped == 0 and n_live == 1  # no summary -> never skipped
    assert df.count() == 0  # file-level pruning still applies
