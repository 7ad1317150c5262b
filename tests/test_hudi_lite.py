"""Hudi-lite COW layout tests: timeline completion, file-slice
selection under rewrites (the double-count trap), as-of time travel,
inflight invisibility, and the honest gates."""

from __future__ import annotations

import os

import pytest

from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
    commit,
    file_slices,
    snapshot,
)


@pytest.fixture()
def tiny(spark):
    def make(rows):
        return spark.createDataFrame(rows, "id long, v string")

    return make


def test_slice_selection_and_time_travel(spark, tiny, tmp_path):
    loc = str(tmp_path / "tbl")
    commit(loc, "20240101000001", [("p=a", "fg1", tiny([(1, "x"), (2, "y")]))])
    commit(loc, "20240101000002", [("p=a", "fg1", tiny([(1, "X"), (2, "Y")]))])
    # one file group, TWO physical slices on disk
    files = [
        f
        for f in os.listdir(os.path.join(loc, "p=a"))
        if f.endswith(".parquet")
    ]
    assert len(files) == 2
    df, n = snapshot(spark, loc)
    assert n == 1  # slice selection collapses the group
    assert sorted(r["v"] for r in df.collect()) == ["X", "Y"]
    old, n_old = snapshot(spark, loc, as_of="20240101000001")
    assert n_old == 1
    assert sorted(r["v"] for r in old.collect()) == ["x", "y"]


def test_new_file_group_invisible_before_its_instant(spark, tiny, tmp_path):
    loc = str(tmp_path / "tbl")
    commit(loc, "20240101000001", [("p=a", "fg1", tiny([(1, "x")]))])
    commit(loc, "20240101000002", [("p=b", "fg2", tiny([(2, "z")]))])
    assert len(file_slices(loc)) == 2
    assert len(file_slices(loc, as_of="20240101000001")) == 1


def test_inflight_slices_are_invisible(spark, tiny, tmp_path):
    # simulate a crashed writer: data file present, .commit never landed
    loc = str(tmp_path / "tbl")
    commit(loc, "20240101000001", [("p=a", "fg1", tiny([(1, "x")]))])
    orphan = os.path.join(loc, "p=a", "fg1_0-0_20240101000009.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not even parquet")
    slices = file_slices(loc)
    assert len(slices) == 1 and slices[0][2] == "20240101000001"


def test_gates(spark, tiny, tmp_path):
    loc = str(tmp_path / "tbl")
    commit(loc, "20240101000001", [("p=a", "fg1", tiny([(1, "x")]))])
    with pytest.raises(ValueError, match="unknown instant"):
        file_slices(loc, as_of="19990101000000")
    with open(os.path.join(loc, "p=a", "stray.parquet"), "wb") as fh:
        fh.write(b"")
    with pytest.raises(ValueError, match="non-Hudi"):
        file_slices(loc)
