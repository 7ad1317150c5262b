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


def test_replay_rejects_checkpointed_logs(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "tbl")
    export_delta_log(t)
    open(os.path.join(t.path, "_delta_log", "_last_checkpoint"), "w").write("{}")
    with pytest.raises(NotImplementedError, match="checkpoint"):
        replay_log(t.path)


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
