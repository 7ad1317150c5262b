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
    import shutil

    loc = str(tmp_path / "tbl")
    commit(loc, "20240101000001", [("p=a", "fg1", tiny([(1, "x")]))])
    with pytest.raises(ValueError, match="unknown instant"):
        file_slices(loc, as_of="19990101000000")
    with open(os.path.join(loc, "p=a", "stray.parquet"), "wb") as fh:
        fh.write(b"")
    # index read path: stray unindexed files are INVISIBLE (the metadata
    # table is the source of truth — real Hudi's files index semantics)
    assert len(file_slices(loc)) == 1
    # walk fallback (pre-index tables): strays still fail loudly
    shutil.rmtree(os.path.join(loc, ".hoodie", "metadata"))
    with pytest.raises(ValueError, match="non-Hudi"):
        file_slices(loc)
    with pytest.raises(ValueError, match="require_index"):
        file_slices(loc, require_index=True)


def test_mor_merge_log_ordering_and_deletes(spark, tiny, tmp_path):
    """MOR: two successive logs on one group — later log wins over
    earlier log and base; delete sentinel removes; as-of before the
    logs sees only the base; a later base REWRITE absorbs the logs."""
    from pyspark.sql import functions as F

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        commit_mor,
        mor_file_slices,
        mor_incremental,
        mor_snapshot,
    )

    loc = str(tmp_path / "mor")
    t1, t2, t3, t4 = (f"2024010100000{i}" for i in (1, 2, 3, 4))
    commit_mor(
        loc, t1, base_writes=[("p=a", "fg1", tiny([(1, "x"), (2, "y")]))]
    )
    commit_mor(
        loc, t2,
        log_writes=[("p=a", "fg1", tiny([(1, "x2"), (3, "new")]))],
    )
    commit_mor(
        loc, t3,
        log_writes=[
            (
                "p=a",
                "fg1",
                tiny([(1, "x3")]).withColumn(
                    "_hoodie_is_deleted", F.lit(False)
                ).unionByName(
                    tiny([(2, "dead")]).withColumn(
                        "_hoodie_is_deleted", F.lit(True)
                    )
                ),
            )
        ],
    )
    df, n_groups, n_logs = mor_snapshot(spark, loc, key_col="id")
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == [(1, "x3"), (3, "new")], got  # t3 wins; 2 deleted
    assert (n_groups, n_logs) == (1, 2)

    # as-of t2: t3's update and delete invisible
    df2, _, n_logs2 = mor_snapshot(spark, loc, key_col="id", as_of=t2)
    got2 = sorted((r["id"], r["v"]) for r in df2.collect())
    assert got2 == [(1, "x2"), (2, "y"), (3, "new")] and n_logs2 == 1

    # incremental (t1, t3]: ids touched by the logs, latest state,
    # tombstoned key 2 excluded
    inc, n_src = mor_incremental(spark, loc, key_col="id", begin=t1, end=t3)
    got_inc = sorted((r["id"], r["v"]) for r in inc.collect())
    assert got_inc == [(1, "x3"), (3, "new")] and n_src == 2

    # base rewrite (compaction-style) at t4 absorbs the logs: older
    # logs no longer attach to the new base slice
    commit_mor(
        loc, t4, base_writes=[("p=a", "fg1", tiny([(1, "X"), (3, "N")]))]
    )
    slices = mor_file_slices(loc)
    assert slices[0][2] == t4 and slices[0][4] == []
    df4, _, n_logs4 = mor_snapshot(spark, loc, key_col="id")
    got4 = sorted((r["id"], r["v"]) for r in df4.collect())
    assert got4 == [(1, "X"), (3, "N")] and n_logs4 == 0


def test_mor_merge_determinism_tiebreaks(spark, tiny, tmp_path):
    """r10 ADVICE pin: within-instant merge order is deterministic —
    a base write and a log write for the same group in ONE commit
    resolve log-over-base, and two versions of a key in ONE log file
    resolve by the explicit `_hoodie_seq` (upsert then delete)."""
    from pyspark.sql import functions as F

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        commit_mor,
        mor_snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1 = "20240101000001"
    # ONE delta commit: base slice AND a log for the same file group —
    # the log must beat the base at the same instant, always
    commit_mor(
        loc,
        t1,
        base_writes=[("p=a", "fg1", tiny([(1, "base"), (2, "keep")]))],
        log_writes=[("p=a", "fg1", tiny([(1, "log")]))],
    )
    df, _, _ = mor_snapshot(spark, loc, key_col="id")
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == [(1, "log"), (2, "keep")], got

    # ONE log carrying upsert (seq 1) then delete (seq 2) of key 2:
    # the delete must win because its seq is higher
    t2 = "20240101000002"
    upsert = tiny([(2, "resurrect")]).select(
        "*",
        F.lit(False).alias("_hoodie_is_deleted"),
        F.lit(1).cast("long").alias("_hoodie_seq"),
    )
    delete = tiny([(2, "tomb")]).select(
        "*",
        F.lit(True).alias("_hoodie_is_deleted"),
        F.lit(2).cast("long").alias("_hoodie_seq"),
    )
    commit_mor(
        loc, t2, log_writes=[("p=a", "fg1", upsert.unionByName(delete))]
    )
    df2, _, _ = mor_snapshot(spark, loc, key_col="id")
    got2 = sorted((r["id"], r["v"]) for r in df2.collect())
    assert got2 == [(1, "log")], got2  # key 2 deleted, deterministically

    # seq order reversed -> the upsert wins instead
    t3 = "20240101000003"
    up3 = tiny([(2, "back")]).select(
        "*",
        F.lit(False).alias("_hoodie_is_deleted"),
        F.lit(9).cast("long").alias("_hoodie_seq"),
    )
    del3 = tiny([(2, "tomb")]).select(
        "*",
        F.lit(True).alias("_hoodie_is_deleted"),
        F.lit(3).cast("long").alias("_hoodie_seq"),
    )
    commit_mor(loc, t3, log_writes=[("p=a", "fg1", up3.unionByName(del3))])
    df3, _, _ = mor_snapshot(spark, loc, key_col="id")
    got3 = sorted((r["id"], r["v"]) for r in df3.collect())
    assert got3 == [(1, "log"), (2, "back")], got3


def test_mor_duplicate_keys_without_seq_rejected(spark, tiny, tmp_path):
    """Writing the same key twice in one log WITHOUT `_hoodie_seq` is
    rejected at write time when key_col is given (the read would
    otherwise pick a winner nondeterministically)."""
    import pytest as _pytest

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        commit_mor,
    )

    loc = str(tmp_path / "tbl")
    dup = tiny([(1, "a"), (1, "b")])
    with _pytest.raises(ValueError, match="duplicate id"):
        commit_mor(
            loc,
            "20240101000001",
            log_writes=[("p=a", "fg1", dup)],
            key_col="id",
        )


def test_mor_snapshot_survives_nasty_table_location(spark, tiny, tmp_path):
    """r10 ADVICE pin (hudi leg): the base-row file_path join must
    survive a table location with space/%/unicode/+ — a missed join
    would silently drop every base row."""
    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        commit_mor,
        mor_snapshot,
    )

    loc = str(tmp_path / "nasty dir %20 ü+x" / "tbl")
    t1, t2 = "20240101000001", "20240101000002"
    commit_mor(
        loc, t1, base_writes=[("p=a", "fg1", tiny([(1, "x"), (2, "y")]))]
    )
    commit_mor(loc, t2, log_writes=[("p=a", "fg1", tiny([(2, "Y")]))])
    df, n_groups, n_logs = mor_snapshot(spark, loc, key_col="id")
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == [(1, "x"), (2, "Y")], got
    assert (n_groups, n_logs) == (1, 1)


def test_mor_compaction_and_cleaning_lifecycle(spark, tiny, tmp_path):
    """compact_logs absorbs logs into new base slices (data identical,
    zero logs after; pre-compaction time travel intact), clean_slices
    reclaims only unreachable slices and reads past the clean horizon
    fail loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        clean_slices,
        commit_mor,
        compact_logs,
        mor_snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3, t4 = (f"2024010100000{i}" for i in (1, 2, 3, 4))
    commit_mor(
        loc,
        t1,
        base_writes=[
            ("p=a", "fg1", tiny([(1, "x"), (2, "y")])),
            ("p=b", "fg2", tiny([(3, "z")])),
        ],
    )
    upd = tiny([(1, "X")]).withColumn("_hoodie_is_deleted", F.lit(False))
    dele = tiny([(2, "tomb")]).withColumn(
        "_hoodie_is_deleted", F.lit(True)
    )
    commit_mor(loc, t2, log_writes=[("p=a", "fg1", upd.unionByName(dele))])

    n_groups, n_logs = compact_logs(spark, loc, key_col="id", instant=t3)
    assert (n_groups, n_logs) == (1, 1)
    df, ng, nl = mor_snapshot(spark, loc, key_col="id")
    assert nl == 0 and ng == 2
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == [(1, "X"), (3, "z")], got
    # pre-compaction horizon still merges the (uncleaned) log
    df2, _, nl2 = mor_snapshot(spark, loc, key_col="id", as_of=t2)
    assert nl2 == 1
    assert sorted((r["id"], r["v"]) for r in df2.collect()) == got

    # duplicate/old compaction instants rejected
    with _pytest.raises(ValueError, match="must follow|already"):
        compact_logs(spark, loc, key_col="id", instant=t2)

    n_files, n_logdirs = clean_slices(loc, t4, keep_last=1)
    assert (n_files, n_logdirs) == (1, 1)  # fg1 old base + its log dir
    df3, _, _ = mor_snapshot(spark, loc, key_col="id")
    assert sorted((r["id"], r["v"]) for r in df3.collect()) == got
    with _pytest.raises(ValueError, match="clean horizon"):
        mor_snapshot(spark, loc, key_col="id", as_of=t2)


def test_clustering_replacecommit_lifecycle(spark, tiny, tmp_path):
    """cluster_cow rewrites file groups into range-contiguous new groups
    under a .replacecommit; replaced groups invisible at/after the
    instant, visible to earlier time travel; cleaner reclaims them."""
    import pytest as _pytest

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        clean_slices,
        cluster_cow,
        commit,
        file_slices,
        snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))
    commit(
        loc,
        t1,
        [
            ("p=a", "fg1", tiny([(1, "a"), (9, "i"), (3, "c")])),
            ("p=a", "fg2", tiny([(7, "g"), (2, "b")])),
        ],
    )
    n_new, n_replaced = cluster_cow(
        spark, loc, "id", t2, groups_per_partition=2
    )
    assert (n_new, n_replaced) == (2, 2)
    slices = file_slices(loc)
    assert [fid for _p, fid, _i, _path in slices] == [
        f"clus0-{t2}", f"clus1-{t2}"
    ]
    df, n = snapshot(spark, loc)
    assert n == 2
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3, 7, 9]
    # range contiguity on id: stride = (9-1)//2+1 = 5 -> [1,5] / [6,10]
    g0 = spark.read.parquet(slices[0][3])
    g1 = spark.read.parquet(slices[1][3])
    assert sorted(r["id"] for r in g0.collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in g1.collect()) == [7, 9]
    # pre-clustering horizon sees the ORIGINAL groups
    old, n_old = snapshot(spark, loc, as_of=t1)
    assert n_old == 2
    assert sorted(r["id"] for r in old.collect()) == [1, 2, 3, 7, 9]
    # duplicate/old instants rejected
    with _pytest.raises(ValueError, match="must follow|already"):
        cluster_cow(spark, loc, "id", t1)
    # cleaner reclaims the replaced groups; older reads fail loudly
    n_files, _n_logs = clean_slices(loc, t3, keep_last=1)
    assert n_files == 2
    df2, _ = snapshot(spark, loc)
    assert sorted(r["id"] for r in df2.collect()) == [1, 2, 3, 7, 9]
    with _pytest.raises(ValueError, match="clean horizon"):
        snapshot(spark, loc, as_of=t1)


def test_cluster_null_sort_col_rows_survive(spark, tiny, tmp_path):
    """r11 ADVICE pin (medium): rows whose clustering key is NULL must
    survive cluster_cow — a NULL group index would route them to a
    staging partition the slice renamer never renames, silently losing
    them. NULLs cluster deterministically into group 0; an all-NULL
    partition (min/max agg sees no values) also survives."""
    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        cluster_cow,
        commit,
        snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2 = "20240101000001", "20240101000002"
    commit(
        loc,
        t1,
        [
            ("p=a", "fg1", tiny([(1, "a"), (None, "nul1"), (9, "i")])),
            # partition where EVERY sort_col value is NULL
            ("p=b", "fg2", tiny([(None, "nul2"), (None, "nul3")])),
        ],
    )
    n_new, n_replaced = cluster_cow(
        spark, loc, "id", t2, groups_per_partition=2
    )
    assert (n_new, n_replaced) == (4, 2)
    df, _n = snapshot(spark, loc)
    got = sorted(
        [(r["id"], r["v"]) for r in df.collect()],
        key=lambda t: (t[0] is None, t),
    )
    assert got == [
        (1, "a"), (9, "i"), (None, "nul1"), (None, "nul2"), (None, "nul3")
    ], got


def test_compact_logs_same_file_id_across_partitions(spark, tiny, tmp_path):
    """r11 ADVICE pin (medium): file ids are only per-partition unique.
    Compaction keyed on fid alone would tag BOTH partitions' groups to
    one slice — one partition absorbing the other's rows and the other
    physically erased at the new horizon. The write map keys on
    (partition, file_id)."""
    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        commit_mor,
        compact_logs,
        mor_snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))
    # SAME fid "fg1" in two partitions, disjoint keys
    commit_mor(
        loc,
        t1,
        base_writes=[
            ("p=a", "fg1", tiny([(1, "a1"), (2, "a2")])),
            ("p=b", "fg1", tiny([(11, "b1"), (12, "b2")])),
        ],
    )
    commit_mor(
        loc,
        t2,
        log_writes=[
            ("p=a", "fg1", tiny([(1, "A1")])),
            ("p=b", "fg1", tiny([(11, "B1")])),
        ],
    )
    n_groups, n_logs = compact_logs(spark, loc, key_col="id", instant=t3)
    assert (n_groups, n_logs) == (2, 2)
    df, ng, nl = mor_snapshot(spark, loc, key_col="id")
    assert (ng, nl) == (2, 0)
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == [(1, "A1"), (2, "a2"), (11, "B1"), (12, "b2")], got
    # each partition's compacted slice holds ONLY its own rows
    import os as _os

    for part, lo, hi in (("p=a", 1, 2), ("p=b", 11, 12)):
        files = [
            f
            for f in _os.listdir(_os.path.join(loc, part))
            if f.endswith(".parquet") and f"_{t3}." in f
        ]
        assert len(files) == 1, files
        rows = spark.read.parquet(
            _os.path.join(loc, part, files[0])
        ).collect()
        assert sorted(r["id"] for r in rows) == [lo, hi]


def test_clean_skips_concurrent_staging_dirs(spark, tiny, tmp_path):
    """r11 ADVICE pin (low): the cleaner must not delete part-files
    inside a concurrent writer's .staging_/.tmp_ directories (their
    files don't start with '.', only the directory does); slice walkers
    must also not trip over them."""
    import os as _os

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        clean_slices,
        commit,
        file_slices,
        snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))
    commit(loc, t1, [("p=a", "fg1", tiny([(1, "x")]))])
    commit(loc, t2, [("p=a", "fg1", tiny([(1, "X")]))])
    # simulate an in-flight writer: staged part file, no .commit yet
    staged = _os.path.join(
        loc, f".staging_{t3}", "__hudi_w=0", "part-00000.parquet"
    )
    _os.makedirs(_os.path.dirname(staged))
    with open(staged, "wb") as fh:
        fh.write(b"in-flight")
    tmp_staged = _os.path.join(loc, "p=a", f".tmp_fg9_{t3}", "part-0.parquet")
    _os.makedirs(_os.path.dirname(tmp_staged))
    with open(tmp_staged, "wb") as fh:
        fh.write(b"in-flight")
    # readers ignore the staging area entirely
    assert len(file_slices(loc)) == 1
    n_files, n_logdirs = clean_slices(loc, t3, keep_last=1)
    assert (n_files, n_logdirs) == (1, 0)  # only the t1 slice reclaimed
    assert _os.path.exists(staged) and _os.path.exists(tmp_staged)
    df, _ = snapshot(spark, loc)
    assert [r["v"] for r in df.collect()] == ["X"]


def test_index_read_path_performs_no_listing(
    spark, tiny, tmp_path, monkeypatch
):
    """r12 pin: snapshot/time-travel/MOR reads on an indexed table
    perform ZERO directory listings — os.walk is instrumented and must
    never fire. The files index is maintained per commit from write
    stats (never by listing), survives compaction/clean, and the
    cleaner prunes reclaimed entries from the newest index."""
    from pwc_challenge_dataengineer_spark.sources import hudi_lite as hl

    loc = str(tmp_path / "tbl")
    t1, t2, t3, t4 = (f"2024010100000{i}" for i in (1, 2, 3, 4))
    hl.commit(loc, t1, [("p=a", "fg1", tiny([(1, "x"), (2, "y")]))])
    hl.commit(loc, t2, [("p=a", "fg1", tiny([(1, "X"), (2, "Y")]))])
    mloc = str(tmp_path / "mor")
    hl.commit_mor(
        mloc, t1, base_writes=[("p=a", "fg1", tiny([(1, "b")]))]
    )
    hl.commit_mor(mloc, t2, log_writes=[("p=a", "fg1", tiny([(1, "L")]))])

    walks = {"n": 0}
    real_walk = os.walk

    def counting_walk(*a, **kw):
        walks["n"] += 1
        return real_walk(*a, **kw)

    monkeypatch.setattr(os, "walk", counting_walk)
    df, n = hl.snapshot(spark, loc, require_index=True)
    assert n == 1 and sorted(r["v"] for r in df.collect()) == ["X", "Y"]
    old, _ = hl.snapshot(spark, loc, as_of=t1, require_index=True)
    assert sorted(r["v"] for r in old.collect()) == ["x", "y"]
    mdf, ng, nl = hl.mor_snapshot(
        spark, mloc, key_col="id", require_index=True
    )
    assert (ng, nl) == (1, 1)
    assert [r["v"] for r in mdf.collect()] == ["L"]
    assert walks["n"] == 0, f"read path listed directories {walks['n']}x"
    monkeypatch.setattr(os, "walk", real_walk)

    # maintenance keeps the index usable: compaction commits an index
    # for its instant; the cleaner (which MAY walk — it reclaims disk)
    # prunes reclaimed entries from the newest index
    ngc, nlogs = hl.compact_logs(spark, mloc, key_col="id", instant=t3)
    assert (ngc, nlogs) == (1, 1)
    hl.clean_slices(mloc, t4, keep_last=1)
    monkeypatch.setattr(os, "walk", counting_walk)
    mdf2, ng2, nl2 = hl.mor_snapshot(
        spark, mloc, key_col="id", require_index=True
    )
    assert (ng2, nl2) == (1, 0)
    assert [r["v"] for r in mdf2.collect()] == ["L"]
    assert walks["n"] == 0
    idx = hl._load_files_index(mloc, t3)
    assert idx["p=a"]["logs"] == []  # cleaner pruned the absorbed log


def test_index_rebuild_covers_pre_index_commits(spark, tiny, tmp_path):
    """r12 review pin: a commit on a table whose earlier instants have
    no files index (pre-index/upgraded table, wiped metadata dir) must
    NOT write an incomplete prev+stats index — readers prefer the index
    and the CLEANER computes reachability through it, so incompleteness
    means silent row loss and deletion of LIVE files. The writer
    detects uncovered completed instants and rebuilds the full listing
    once."""
    import shutil

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        clean_slices,
        commit,
        snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))
    commit(loc, t1, [("p=a", "fg1", tiny([(1, "x")]))])
    # simulate a pre-index table: wipe the metadata dir entirely
    shutil.rmtree(os.path.join(loc, ".hoodie", "metadata"))
    commit(loc, t2, [("p=b", "fg2", tiny([(2, "y")]))])
    # the t2 index must cover t1's group — index-only read sees both
    df, n = snapshot(spark, loc, require_index=True)
    assert n == 2
    assert sorted(r["v"] for r in df.collect()) == ["x", "y"]
    # and the cleaner (reachability via the index) must keep BOTH
    # groups' live bases: nothing is reclaimable here
    n_files, n_logs = clean_slices(loc, t3, keep_last=1)
    assert (n_files, n_logs) == (0, 0)
    df2, _ = snapshot(spark, loc, require_index=True)
    assert sorted(r["v"] for r in df2.collect()) == ["x", "y"]


def test_root_partition_walk_uses_canonical_spelling(spark, tiny, tmp_path):
    """r12 ADVICE pin: the index-recovery WALK spelled the table-root
    partition '.' (os.path.relpath) while writer stats spell it '' — on
    an unpartitioned table a rebuild could index the same physical file
    under TWO partition keys, doubling its rows on snapshot reads. The
    walk must normalize to the canonical '' spelling."""
    import json
    import shutil

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        _load_files_index,
    )

    loc = str(tmp_path / "tbl")
    t1, t2 = "20240101000001", "20240101000002"
    commit(loc, t1, [("", "fg1", tiny([(1, "x")]))])
    # pre-index table: wipe metadata so the t2 commit rebuilds via walk
    shutil.rmtree(os.path.join(loc, ".hoodie", "metadata"))
    commit(loc, t2, [("", "fg2", tiny([(2, "y")]))])
    idx = _load_files_index(loc, t2)
    assert idx is not None and set(idx) == {""}, idx  # one spelling only
    df, n = snapshot(spark, loc, require_index=True)
    assert n == 2
    assert sorted(r["v"] for r in df.collect()) == ["x", "y"]  # no doubling


def test_colstats_skipping_no_footer_reads_on_read_path(
    spark, tiny, tmp_path, monkeypatch
):
    """r13: metadata-table col-stats skipping. Bounds are recorded at
    COMMIT time from parquet footers; the READ path must resolve them
    from col-stats-<instant>.json alone — zero footer decodes, zero
    listing — and drop only groups whose bounds cannot intersect."""
    from pwc_challenge_dataengineer_spark.sources import hudi_lite, parquet_meta
    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        file_slices_skipping,
        snapshot_skipping,
    )

    loc = str(tmp_path / "tbl")
    t1 = "20240101000001"

    def mk(lo_id, n):
        return spark.createDataFrame(
            [(lo_id + i, "v") for i in range(n)], "id long, v string"
        )

    commit(
        loc,
        t1,
        [
            ("p=a", "fg-lo", mk(0, 5)),      # id [0, 4]
            ("p=a", "fg-hi", mk(100, 5)),    # id [100, 104]
            ("p=b", "fg-mid", mk(50, 5)),    # id [50, 54]
        ],
        stats_columns=["id"],
    )

    def boom(*a, **k):
        raise AssertionError("footer decoded on the read path")

    monkeypatch.setattr(parquet_meta, "int64_column_stats", boom)
    walks = []
    real_walk = os.walk
    monkeypatch.setattr(
        hudi_lite.os, "walk", lambda *a, **k: walks.append(a) or real_walk(*a, **k)
    )
    kept, n_total, n_skipped = file_slices_skipping(
        loc, "id", 0, 60, require_index=True
    )
    assert (n_total, n_skipped) == (3, 1)
    assert sorted(fid for _p, fid, _i, _pp in kept) == ["fg-lo", "fg-mid"]
    assert walks == []  # listing-free AND footer-free
    df, n_total2, n_sk2 = snapshot_skipping(
        spark, loc, "id", 0, 60, require_index=True
    )
    assert (n_total2, n_sk2) == (3, 1)
    assert sorted(r["id"] for r in df.collect()) == list(range(5)) + list(
        range(50, 55)
    )
    # boundary semantics: bounds inclusive, predicate hi-exclusive
    _, _, n_sk3 = file_slices_skipping(loc, "id", 4, 100, require_index=True)
    assert n_sk3 == 1  # fg-lo touches lo (kept); fg-hi fails hi-exclusive
    # all-skipped returns a schema-only frame, still without opening data
    e, n_t4, n_sk4 = snapshot_skipping(spark, loc, "id", 200, 300)
    assert (n_t4, n_sk4, e.count()) == (3, 3, 0)


def test_colstats_carry_forward_and_clean_prune(spark, tiny, tmp_path):
    """Col-stats chain semantics: a later commit (even WITHOUT
    stats_columns) carries previous bounds forward so old groups stay
    skippable; a no-stats slice is conservatively kept; the cleaner
    prunes reclaimed entries from the newest col-stats file."""
    import json as _json

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        _col_stats_path,
        clean_slices,
        file_slices_skipping,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))

    def mk(lo_id, n):
        return spark.createDataFrame(
            [(lo_id + i, "v") for i in range(n)], "id long, v string"
        )

    commit(loc, t1, [("p=a", "fg1", mk(0, 5))], stats_columns=["id"])
    # t2 rewrites fg1 and adds fg2 WITHOUT stats: fg2 unskippable,
    # fg1's new slice has no bounds either (its t1 bounds must not
    # leak onto the new file), old entries carry forward harmlessly
    commit(loc, t2, [("p=a", "fg1", mk(1000, 5)), ("p=a", "fg2", mk(100, 5))])
    kept, n_total, n_skipped = file_slices_skipping(loc, "id", 0, 10)
    assert (n_total, n_skipped) == (2, 0)  # no stats on live slices -> no skip
    # t3 re-records stats on a rewrite of fg1
    commit(loc, t3, [("p=a", "fg1", mk(2000, 5))], stats_columns=["id"])
    kept3, n_t3, n_sk3 = file_slices_skipping(loc, "id", 0, 10)
    assert (n_t3, n_sk3) == (2, 1)  # fg1 [2000,2004] skipped; fg2 no stats
    assert [fid for _p, fid, _i, _pp in kept3] == ["fg2"]
    # cleaner reclaims fg1's t1/t2 slices; newest col-stats drops them
    removed_f, _ = clean_slices(loc, "20240101000004", keep_last=1)
    assert removed_f == 2
    with open(_col_stats_path(loc, t3)) as fh:
        stats = _json.load(fh)
    names = sorted(stats.get("p=a", {}))
    assert names == [f"fg1_0-0_{t3}.parquet"], names


def test_rollback_crashed_commit_reclaims_files_and_index(
    spark, tiny, tmp_path
):
    """r13: rollback of a writer that crashed AFTER writing data files
    and the files index but BEFORE the .commit landed — the files and
    the index entry must be reclaimed, a .rollback action recorded, and
    a later commit's index chain must be complete and poison-free."""
    import json as _json

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        _index_from_stats,
        _load_files_index,
        _write_base_slices,
        _write_files_index,
        clean_slices,
        rollback,
        snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3, t4, t5 = (f"2024010100000{i}" for i in (1, 2, 3, 4, 5))
    commit(loc, t1, [("p=a", "fg1", tiny([(1, "x")]))])
    # crash-simulate t2: partial rewrite of fg1, index written, no .commit
    hd = os.path.join(loc, ".hoodie")
    open(os.path.join(hd, f"{t2}.inflight"), "w").close()
    stats = _write_base_slices(
        loc, t2, [("p=a", "fg1", tiny([(1, "POISON")]))]
    )
    _write_files_index(loc, t2, *_index_from_stats(stats))
    n_files, n_logs = rollback(loc, t2, t3)
    assert (n_files, n_logs) == (1, 0)
    with open(os.path.join(hd, f"{t3}.rollback")) as fh:
        assert _json.load(fh)["rolledBack"] == t2
    # physical file + index + inflight gone
    assert not any(t2 in f for f in os.listdir(os.path.join(loc, "p=a")))
    assert _load_files_index(loc, t2) is None
    assert not os.path.exists(os.path.join(hd, f"{t2}.inflight"))
    # later commit chains past the hole; index-only read is poison-free
    commit(loc, t4, [("p=b", "fg2", tiny([(2, "y")]))])
    idx = _load_files_index(loc, t4)
    assert sorted(n for s in idx.values() for n in s["bases"]) == [
        f"fg1_0-0_{t1}.parquet",
        f"fg2_0-0_{t4}.parquet",
    ]
    df, n = snapshot(spark, loc, require_index=True)
    assert n == 2 and sorted(r["v"] for r in df.collect()) == ["x", "y"]
    # cleaner after rollback must keep both LIVE files
    assert clean_slices(loc, t5, keep_last=1) == (0, 0)
    df2, _ = snapshot(spark, loc, require_index=True)
    assert sorted(r["v"] for r in df2.collect()) == ["x", "y"]


def test_rollback_completed_latest_restores_previous_state(
    spark, tiny, tmp_path
):
    """Restore semantics: rolling back the LATEST completed commit
    removes its files/timeline/index and the table reads as before it;
    rolling back a completed instant UNDER later commits raises."""
    import pytest as _pytest

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        rollback,
        snapshot,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))
    commit(loc, t1, [("p=a", "fg1", tiny([(1, "x")]))])
    commit(loc, t2, [("p=a", "fg1", tiny([(1, "X")])),
                     ("p=b", "fg2", tiny([(2, "y")]))])
    with _pytest.raises(ValueError, match="later commits exist"):
        rollback(loc, t1, t3)
    n_files, _ = rollback(loc, t2, t3)
    assert n_files == 2
    df, n = snapshot(spark, loc, require_index=True)
    assert n == 1 and [r["v"] for r in df.collect()] == ["x"]


def test_rollback_crashed_deltacommit_removes_log_dir(
    spark, tiny, tmp_path
):
    """MOR: a crashed delta commit's log dir (named .log_<fid>_<t>)
    must be reclaimed by rollback and the merged read must not see its
    rows."""
    import shutil

    from pwc_challenge_dataengineer_spark.sources.hudi_lite import (
        commit_mor,
        mor_snapshot,
        rollback,
    )

    loc = str(tmp_path / "tbl")
    t1, t2, t3 = (f"2024010100000{i}" for i in (1, 2, 3))
    commit_mor(loc, t1, base_writes=[("p=a", "fg1", tiny([(1, "x")]))])
    # a real delta commit, then crash-simulate it: strip the timeline
    # completion so only the log dir + inflight remain
    commit_mor(
        loc, t2, log_writes=[("p=a", "fg1", tiny([(1, "POISON")]))],
        key_col="id",
    )
    hd = os.path.join(loc, ".hoodie")
    os.remove(os.path.join(hd, f"{t2}.deltacommit"))
    open(os.path.join(hd, f"{t2}.inflight"), "w").close()
    n_files, n_logs = rollback(loc, t2, t3)
    assert (n_files, n_logs) == (0, 1)
    assert not any(
        d.startswith(".log_") for d in os.listdir(os.path.join(loc, "p=a"))
    )
    df, n, n_log = mor_snapshot(spark, loc, "id")
    assert (n, n_log) == (1, 0)
    assert [r["v"] for r in df.collect()] == ["x"]
