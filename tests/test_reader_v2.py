"""Delta reader-v2/v3 features in the jar-free log replay: name-mode
column mapping and deletion vectors (roaring-bitmap codec, DV DELETE
transaction shape, checkpoint survival). Every end-to-end test carries a
PARITY check: the DV/mapped read must equal the same data read as plain
parquet minus the deleted row indexes.

Reference capability: src/etl/spark/delta_lake_manager.py:260-310 (reads
such tables through delta-spark jars). Spec: delta.io PROTOCOL.md
"Column Mapping", "Deletion Vectors"; RoaringFormatSpec.
"""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.sources import deletion_vectors as dv
from pwc_challenge_dataengineer_spark.sources.delta_log import (
    checkpoint_table,
    delete_rows_with_dv,
    read_delta_log,
    replay_snapshot,
    write_delta_table,
)


# ---------------------------------------------------------------- codec


def test_z85_spec_vector():
    # the reference vector from the Z85 spec (rfc.zeromq.org/spec/32)
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [0, 1, 5, 70_000, 2**31],
        list(range(5000)),  # > 4096 -> bitmap container
        [2**32 + 5, 3, 2**33 + 1],  # multiple 32-bit bitmaps
        list(range(0, 100_000, 7)),
    ],
)
def test_roaring_round_trip(vals):
    got = dv.roaring_array_deserialize(dv.roaring_array_serialize(vals))
    assert sorted(got) == sorted(set(vals))


def test_roaring_run_container_decode():
    # hand-crafted RUN-format bytes (cookie 12347): runs 10..20 and
    # 100..101 in container key 0 — the encoder never emits runs, so this
    # pins the decode path real writers exercise
    c = struct.pack("<i", dv._COOKIE_RUN | (0 << 16))
    c += b"\x01"  # run-flag bitset: container 0 is a run container
    c += struct.pack("<HH", 0, 13 - 1)
    c += struct.pack("<H", 2)
    c += struct.pack("<HH", 10, 10) + struct.pack("<HH", 100, 1)
    data = struct.pack("<q", 1) + c
    assert sorted(dv.roaring_array_deserialize(data)) == (
        list(range(10, 21)) + [100, 101]
    )


def test_dv_file_round_trip_multi_dv(tmp_path):
    root = str(tmp_path)
    descs = dv.write_dv_file(root, [[1, 2, 3], [10, 2**32 + 1], []])
    assert [d["cardinality"] for d in descs] == [3, 2, 0]
    assert all(d["storageType"] == "u" for d in descs)
    # one shared .bin file, different offsets
    assert len({d["pathOrInlineDv"] for d in descs}) == 1
    assert sorted(dv.read_dv_indexes(root, descs[0])) == [1, 2, 3]
    assert sorted(dv.read_dv_indexes(root, descs[1])) == [10, 2**32 + 1]
    assert dv.read_dv_indexes(root, descs[2]) == []


def test_dv_checksum_detects_corruption(tmp_path):
    root = str(tmp_path)
    (desc,) = dv.write_dv_file(root, [[5, 6]], prefix="")
    uid = desc["pathOrInlineDv"][-20:]
    import uuid as _uuid

    fpath = os.path.join(
        root, f"deletion_vector_{_uuid.UUID(bytes=dv.z85_decode(uid))}.bin"
    )
    raw = bytearray(open(fpath, "rb").read())
    raw[6] ^= 0xFF  # flip a byte inside the serialized DV
    open(fpath, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic"):
        dv.read_dv_indexes(root, desc)


def test_inline_dv_descriptor():
    d = dv.inline_dv_descriptor([0, 9, 12345])
    assert d["storageType"] == "i" and d["cardinality"] == 3
    assert sorted(dv.read_dv_indexes("/nonexistent", d)) == [0, 9, 12345]


# ------------------------------------------------------------ end-to-end


def _mk_df(spark, n=100):
    return spark.range(n).select(
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
    )


def test_dv_delete_end_to_end(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), n_files=3)
    n_del = delete_rows_with_dv(spark, path, F.col("bucket") == 2)
    assert n_del == 14  # ids 2,9,...,93
    got = {r["id"] for r in read_delta_log(spark, path).collect()}
    want = {i for i in range(100) if i % 7 != 2}
    assert got == want
    # protocol upgraded to reader v3 + deletionVectors
    snap = replay_snapshot(path)
    assert snap["protocol"]["minReaderVersion"] == 3
    assert "deletionVectors" in snap["protocol"]["readerFeatures"]
    # PARITY: plain parquet scan of the surviving files minus decoded DVs
    plain = spark.read.parquet(
        *[os.path.join(path, p) for p in snap["adds"]]
    ).count()
    dv_cards = sum(
        a["deletionVector"]["cardinality"]
        for a in snap["adds"].values()
        if a.get("deletionVector")
    )
    assert plain - dv_cards == len(want)
    # time travel still sees version 0 complete
    assert read_delta_log(spark, path, version_as_of=0).count() == 100


def test_dv_second_delete_merges(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), n_files=2)
    assert delete_rows_with_dv(spark, path, F.col("id") < 10) == 10
    assert delete_rows_with_dv(spark, path, F.col("id") < 20) == 10
    got = {r["id"] for r in read_delta_log(spark, path).collect()}
    assert got == set(range(20, 100))
    # every add has ONE (merged) DV, not chained descriptors
    snap = replay_snapshot(path)
    cards = sum(
        a["deletionVector"]["cardinality"] for a in snap["adds"].values()
    )
    assert cards == 20


def test_dv_full_file_delete_removes_file(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(40).select(
        F.col("id"), (F.col("id") < 20).cast("int").alias("half")
    )
    # partition the two halves into separate files via repartition on half
    write_delta_table(
        spark, path, df.repartition(2, "half"), n_files=2
    )
    before = set(replay_snapshot(path)["adds"])
    delete_rows_with_dv(spark, path, F.col("half") == 1)
    snap = replay_snapshot(path)
    got = {r["id"] for r in read_delta_log(spark, path).collect()}
    assert got == set(range(20, 40))
    # a file whose rows all died is REMOVED, not DV'd (when the hash
    # partitioning really split the halves into distinct files)
    if len(before) == 2 and any(
        not a.get("deletionVector") for a in snap["adds"].values()
    ):
        assert len(snap["adds"]) < len(before) or all(
            a.get("deletionVector") for a in snap["adds"].values()
        )


def test_column_mapping_read(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), column_mapping=True)
    # parquet files on disk carry PHYSICAL col-<uuid> names
    snap = replay_snapshot(path)
    phys = spark.read.parquet(
        os.path.join(path, next(iter(snap["adds"])))
    ).columns
    assert all(c.startswith("col-") for c in phys)
    meta_cfg = snap["metadata"]["configuration"]
    assert meta_cfg["delta.columnMapping.mode"] == "name"
    # replay read returns LOGICAL names and the same data
    df = read_delta_log(spark, path)
    assert df.columns == ["id", "bucket", "label"]
    assert df.count() == 100
    assert {r["label"] for r in df.filter(F.col("id") < 3).collect()} == {
        "row-0",
        "row-1",
        "row-2",
    }


def test_column_mapping_plus_dv(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), column_mapping=True)
    n = delete_rows_with_dv(spark, path, F.col("label") == "row-42")
    assert n == 1
    df = read_delta_log(spark, path)
    assert df.columns == ["id", "bucket", "label"]
    got = {r["id"] for r in df.collect()}
    assert got == set(range(100)) - {42}
    # protocol carries BOTH features after the upgrade from reader v2
    proto = replay_snapshot(path)["protocol"]
    assert set(proto["readerFeatures"]) >= {"columnMapping", "deletionVectors"}


def test_checkpoint_carries_dv_and_mapping(spark, tmp_path):
    """Checkpoint the DV+mapped table, delete every JSON commit (log
    cleanup), and read back purely from the checkpoint."""
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), column_mapping=True)
    delete_rows_with_dv(spark, path, F.col("bucket") == 0)
    want = {r["id"] for r in read_delta_log(spark, path).collect()}
    v = checkpoint_table(path)
    log_dir = os.path.join(path, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    df = read_delta_log(spark, path, version_as_of=v)
    assert df.columns == ["id", "bucket", "label"]
    assert {r["id"] for r in df.collect()} == want


def test_checkpoint_twice_and_dv_delete_after_checkpoint(spark, tmp_path):
    """Checkpoint-sourced adds must round-trip through a SECOND
    checkpoint and through delete_rows_with_dv: the arrow map type
    deserializes partitionValues as a list of tuples, which has to be
    normalized back to a dict before re-serialization (it crashed with
    AttributeError and wrote spec-invalid array-typed partitionValues
    into commit JSON otherwise)."""
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), n_files=3)
    delete_rows_with_dv(spark, path, F.col("bucket") == 2)
    v1 = checkpoint_table(path)
    # DV delete AFTER a checkpoint: copies checkpoint-sourced adds into
    # the new commit JSON — partitionValues must serialize as an object
    delete_rows_with_dv(spark, path, F.col("bucket") == 5)
    log_dir = os.path.join(path, "_delta_log")
    newest = sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f[0].isdigit()
    )[-1]
    with open(os.path.join(log_dir, newest)) as fh:
        for line in fh:
            act = json.loads(line)
            if "add" in act:
                assert isinstance(act["add"]["partitionValues"], dict)
    # checkpoint again on a snapshot whose adds came from the prior
    # checkpoint (crashed before the normalization fix)
    v2 = checkpoint_table(path)
    assert v2 > v1
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    got = {r["id"] for r in read_delta_log(spark, path, version_as_of=v2).collect()}
    assert got == {i for i in range(100) if i % 7 not in (2, 5)}


def test_unknown_reader_feature_still_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark))
    log_dir = os.path.join(path, "_delta_log")
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                        "writerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        read_delta_log(spark, path)


def test_id_mapping_mode_read(spark, tmp_path):
    """mode=id: fields match by delta.columnMapping.id against the
    parquet footers' field_id tags — NOT by name. Prove it by scrambling
    the log's physicalNames so a name-mode read would mis-bind: the id
    read must still return the right columns."""
    path = str(tmp_path / "tbl")
    write_delta_table(
        spark, path, _mk_df(spark), n_files=3, column_mapping="id"
    )
    log_dir = os.path.join(path, "_delta_log")
    v0 = [json.loads(l) for l in open(os.path.join(log_dir, f"{0:020d}.json"))]
    for a in v0:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            for f in sch["fields"]:  # garbage names; ids stay authoritative
                f["metadata"]["delta.columnMapping.physicalName"] = (
                    "wrong-" + f["name"]
                )
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in v0) + "\n")
    df = read_delta_log(spark, path)
    assert df.columns == ["id", "bucket", "label"]
    got = {(r["id"], r["bucket"], r["label"]) for r in df.collect()}
    assert got == {(i, i % 7, f"row-{i}") for i in range(100)}


def test_id_mapping_plus_dv_and_checkpoint(spark, tmp_path):
    """id-mode composes with the other reader-v2/v3 features: DV DELETE
    then checkpoint-only read must still field-id-match correctly."""
    path = str(tmp_path / "tbl")
    write_delta_table(
        spark, path, _mk_df(spark), n_files=3, column_mapping="id"
    )
    n = delete_rows_with_dv(spark, path, F.col("bucket") == 3)
    assert n == 14
    want = {i for i in range(100) if i % 7 != 3}
    assert {r["id"] for r in read_delta_log(spark, path).collect()} == want
    v = checkpoint_table(path)
    log_dir = os.path.join(path, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    df = read_delta_log(spark, path, version_as_of=v)
    assert df.columns == ["id", "bucket", "label"]
    assert {r["id"] for r in df.collect()} == want


def test_unknown_mapping_mode_still_raises(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_delta_table(spark, path, _mk_df(spark), column_mapping=True)
    log_dir = os.path.join(path, "_delta_log")
    v0 = [json.loads(l) for l in open(os.path.join(log_dir, f"{0:020d}.json"))]
    for a in v0:
        if "metaData" in a:
            a["metaData"]["configuration"]["delta.columnMapping.mode"] = "odd"
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in v0) + "\n")
    with pytest.raises(NotImplementedError, match="mode 'odd'"):
        read_delta_log(spark, path)
