"""Delta transaction-log interop: spec-structure checks on the exported
_delta_log plus a full write→replay round trip. A REAL Delta reader is
not available in this environment (no delta-spark jars, no network for
DuckDB's delta extension) — these tests pin the public-protocol structure
and the log-replay semantics instead, as stated in the module."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pwc_challenge_dataengineer_spark.sources.delta_log import (
    export_delta_log,
    read_delta_log,
    replay_log,
)
from pwc_challenge_dataengineer_spark.sources.versioned_store import VersionedTable


def _mk_table(spark, path) -> VersionedTable:
    t = VersionedTable(spark, str(path))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING"))
    t.merge(
        spark.createDataFrame([(2, "B"), (3, "c")], "id BIGINT, v STRING"),
        keys=["id"],
    )
    t.delete_where(F.col("id") == 1)
    return t


def test_exported_log_is_spec_structured(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    log_dir = export_delta_log(t)
    commits = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    assert commits == [f"{i:020d}.json" for i in range(3)]
    v0 = [json.loads(l) for l in open(os.path.join(log_dir, commits[0]))]
    kinds = [next(iter(a)) for a in v0]
    # protocol + metaData must appear in version 0
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    proto = next(a["protocol"] for a in v0 if "protocol" in a)
    assert proto["minReaderVersion"] == 1 and proto["minWriterVersion"] == 2
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    # schemaString must parse as a Spark StructType and match the data
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert [f.name for f in schema.fields] == ["id", "v"]
    assert meta["format"]["provider"] == "parquet"
    # every referenced add file exists with the recorded size
    for c in commits:
        for line in open(os.path.join(log_dir, c)):
            a = json.loads(line)
            if "add" in a:
                p = os.path.join(t.path, a["add"]["path"])
                assert os.path.isfile(p)
                assert os.path.getsize(p) == a["add"]["size"]


def test_log_replay_round_trips_every_version(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    # latest: replayed read == the store's own current snapshot
    got = {(r["id"], r["v"]) for r in read_delta_log(spark, t.path).collect()}
    want = {(r["id"], r["v"]) for r in t.read().collect()}
    assert got == want == {(2, "B"), (3, "c")}
    # time travel by log version mirrors the store's version_as_of
    for v in range(3):
        got_v = {
            (r["id"], r["v"])
            for r in read_delta_log(spark, t.path, version_as_of=v).collect()
        }
        want_v = {
            (r["id"], r["v"]) for r in t.read(version_as_of=v).collect()
        }
        assert got_v == want_v, f"version {v}"


def _mk_long_table(spark, path, n_commits=13) -> VersionedTable:
    """A >10-commit table so export crosses Delta's checkpoint cadence."""
    t = VersionedTable(spark, str(path))
    t.write(
        spark.createDataFrame([(0, "v0")], "id BIGINT, v STRING")
    )
    for i in range(1, n_commits):
        t.merge(
            spark.createDataFrame([(i, f"v{i}")], "id BIGINT, v STRING"),
            keys=["id"],
        )
    return t


def test_checkpoint_written_at_delta_cadence(spark, tmp_path):
    t = _mk_long_table(spark, tmp_path / "tbl")
    log_dir = export_delta_log(t)
    ckpt = os.path.join(log_dir, f"{10:020d}.checkpoint.parquet")
    assert os.path.isfile(ckpt)
    lc = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
    assert lc["version"] == 10 and lc["size"] > 0
    # spec shape: struct columns, one non-null action per row
    import pyarrow.parquet as pq

    tbl = pq.read_table(ckpt)
    assert {"protocol", "metaData", "add", "remove"} <= set(tbl.column_names)
    protos = [p for p in tbl.column("protocol").to_pylist() if p]
    assert len(protos) == 1
    assert protos[0]["minReaderVersion"] == 1
    assert protos[0]["minWriterVersion"] == 2
    # feature lists are nullable spec fields, absent below reader v3
    assert protos[0].get("readerFeatures") is None
    adds = [a for a in tbl.column("add").to_pylist() if a]
    assert adds and all(a["path"].startswith("v=10/") for a in adds)


def test_checkpoint_round_trip_across_boundary(spark, tmp_path):
    """Time travel works on both sides of the checkpoint boundary while
    the full JSON history is present."""
    t = _mk_long_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    for v in (0, 5, 9, 10, 11, 12):
        got = {
            (r["id"], r["v"])
            for r in read_delta_log(spark, t.path, version_as_of=v).collect()
        }
        want = {
            (r["id"], r["v"]) for r in t.read(version_as_of=v).collect()
        }
        assert got == want, f"version {v}"
    # latest (no version) should load from the checkpoint + JSON tail
    got = {(r["id"], r["v"]) for r in read_delta_log(spark, t.path).collect()}
    assert got == {(r["id"], r["v"]) for r in t.read().collect()}


def test_checkpoint_survives_log_cleanup(spark, tmp_path):
    """The real-world case the r4 reader could not handle: aged JSON
    commits are cleaned up, only the checkpoint + tail remain."""
    t = _mk_long_table(spark, tmp_path / "tbl")
    log_dir = export_delta_log(t)
    for i in range(10):  # Delta log cleanup removes commits <= checkpoint
        os.remove(os.path.join(log_dir, f"{i:020d}.json"))
    # latest and any version >= checkpoint still reconstruct
    for v in (10, 11, 12):
        got = {
            (r["id"], r["v"])
            for r in read_delta_log(spark, t.path, version_as_of=v).collect()
        }
        want = {
            (r["id"], r["v"]) for r in t.read(version_as_of=v).collect()
        }
        assert got == want, f"version {v}"
    assert len(replay_log(t.path)) > 0
    # versions behind the cleaned history fail with an explanation
    with pytest.raises(ValueError, match="missing"):
        replay_log(t.path, version_as_of=5)


def test_timestamp_travel_across_checkpoint(spark, tmp_path):
    t = _mk_long_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    entries = t._load_manifest()
    for v in (9, 11):
        ts_ms = int(entries[v]["ts"] * 1000)
        got = {
            (r["id"], r["v"])
            for r in read_delta_log(
                spark, t.path, timestamp_as_of_ms=ts_ms
            ).collect()
        }
        want = {
            (r["id"], r["v"]) for r in t.read(version_as_of=v).collect()
        }
        assert got == want, f"ts of version {v}"


def test_timestamp_travel_checkpoint_only_log(spark, tmp_path):
    """Log cleanup can leave a checkpoint with NO JSON commits at all;
    timestamps at/after the checkpoint must serve the checkpoint snapshot
    (real Delta does), while earlier timestamps still raise."""
    import time

    t = _mk_long_table(spark, tmp_path / "tbl")
    log_dir = export_delta_log(t)
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    # with every commit gone the checkpoint's effective timestamp is its
    # file mtime (the commitInfo fallback Delta itself uses) — probe after
    now_ms = int(time.time() * 1000) + 1000
    got = {
        (r["id"], r["v"])
        for r in read_delta_log(
            spark, t.path, timestamp_as_of_ms=now_ms
        ).collect()
    }
    want = {(r["id"], r["v"]) for r in t.read(version_as_of=10).collect()}
    assert got == want
    with pytest.raises(ValueError, match="no commits"):
        replay_log(t.path, timestamp_as_of_ms=now_ms - 86_400_000)


def test_read_delta_falls_back_to_log_replay(spark, tmp_path):
    from pwc_challenge_dataengineer_spark.sources.readers import read_delta

    t = _mk_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    # no delta-spark jars in this env -> read_delta replays the JSON log
    got = {(r["id"], r["v"]) for r in read_delta(spark, t.path).collect()}
    assert got == {(2, "B"), (3, "c")}
    got_v0 = {
        (r["id"], r["v"])
        for r in read_delta(spark, t.path, version_as_of=0).collect()
    }
    assert got_v0 == {(1, "a"), (2, "b")}


def test_timestamp_time_travel_via_commit_info(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    entries = t._load_manifest()
    ts_v1_ms = int(entries[1]["ts"] * 1000)
    got = {
        (r["id"], r["v"])
        for r in read_delta_log(spark, t.path, timestamp_as_of_ms=ts_v1_ms).collect()
    }
    want = {(r["id"], r["v"]) for r in t.read(version_as_of=1).collect()}
    assert got == want


def test_export_refuses_vacuumed_history(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    t.vacuum(keep_last=2)  # drops v0 -> versions [1, 2], not contiguous-from-0
    with pytest.raises(ValueError, match="vacuumed"):
        export_delta_log(t)


def test_replay_rejects_version_past_end(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    with pytest.raises(ValueError, match="does not exist"):
        read_delta_log(spark, t.path, version_as_of=99)


def test_reexport_removes_stale_commits(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    log_dir = export_delta_log(t)
    # fake a stale higher-numbered commit from an earlier longer history
    stale = os.path.join(log_dir, f"{7:020d}.json")
    open(stale, "w").write(json.dumps({"add": {"path": "v=9/x.parquet",
                                               "partitionValues": {}, "size": 1,
                                               "modificationTime": 0,
                                               "dataChange": True}}) + "\n")
    export_delta_log(t)
    assert not os.path.exists(stale)
    got = {(r["id"], r["v"]) for r in read_delta_log(spark, t.path).collect()}
    assert got == {(2, "B"), (3, "c")}
