"""Hudi-lite: jar-free reader/committer for the Apache Hudi
COPY-ON-WRITE table layout — commit timeline, file groups, file-slice
selection, as-of time travel.

Completes the lakehouse trio: Delta (sources/delta_log.py, full log
replay + DVs), Iceberg (sources/iceberg_lite.py, manifest plane), and
now Hudi's layout per the public spec/docs:

- ``.hoodie/<instant>.commit`` timeline files (JSON write stats; only
  COMPLETED instants are readable — ``.inflight`` markers are ignored,
  which is Hudi's crash-consistency story);
- data files named ``<fileId>_<writeToken>_<instant>.parquet`` inside
  partition directories — one FILE GROUP per fileId, where copy-on-write
  updates rewrite the whole base file as a NEW FILE SLICE at the new
  instant;
- snapshot read = for every (partition, fileId) group pick the latest
  slice whose instant is a completed commit <= the as-of instant, then
  hand the surviving parquet paths to Spark's native reader. Reading
  the directory naively would DOUBLE-COUNT updated file groups — slice
  selection is the semantics, and the catalog queries pin it.

Honest gaps (raised, not mangled): MERGE-ON-READ tables (log files +
compaction), cleaning/clustering/rollback timeline actions, and Hudi's
metadata-table indexes.

Reference parity: the reference's storage registry exposes lake-format
ingest/export (see /root/reference/README.md data-lake sections); this
supplies the Hudi leg next to Delta and Iceberg.
"""

from __future__ import annotations

import json
import os


def _timeline(location: str) -> list[str]:
    hd = os.path.join(location, ".hoodie")
    if not os.path.isdir(hd):
        raise FileNotFoundError(f"no .hoodie timeline under {location}")
    return sorted(
        f[: -len(".commit")]
        for f in os.listdir(hd)
        if f.endswith(".commit")
    )


def commit(
    location: str,
    instant: str,
    writes: list[tuple[str, str, object]],
) -> None:
    """Write one COW commit: each (partition, file_id, df) becomes a new
    file slice ``<file_id>_0-0_<instant>.parquet``; the instant completes
    only when the ``.commit`` timeline file lands (written last, after an
    ``.inflight`` marker, mirroring Hudi's two-phase timeline)."""
    hd = os.path.join(location, ".hoodie")
    os.makedirs(hd, exist_ok=True)
    inflight = os.path.join(hd, f"{instant}.inflight")
    open(inflight, "w").close()
    stats: dict[str, list[dict]] = {}
    for partition, file_id, df in writes:
        pdir = os.path.join(location, partition)
        tmp = os.path.join(pdir, f".tmp_{file_id}_{instant}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part_file = next(
            f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
        )
        final = os.path.join(pdir, f"{file_id}_0-0_{instant}.parquet")
        os.replace(os.path.join(tmp, part_file), final)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        from .parquet_meta import read_footer

        stats.setdefault(partition, []).append(
            # write stats from the written file's FOOTER (field 3 =
            # num_rows) — no second count() job over the input
            {"fileId": file_id, "path": final, "numWrites": read_footer(final)[3]}
        )
    with open(os.path.join(hd, f"{instant}.commit"), "w") as fh:
        json.dump({"partitionToWriteStats": stats}, fh)
    os.remove(inflight)


def file_slices(location: str, as_of: str | None = None):
    """(partition, file_id, instant, path) of the LATEST readable slice
    per file group at the as-of instant (default: latest commit)."""
    completed = set(_timeline(location))
    if not completed:
        raise ValueError(f"empty Hudi timeline under {location}")
    horizon = as_of if as_of is not None else max(completed)
    if horizon not in completed:
        raise ValueError(f"unknown instant {horizon}")
    best: dict[tuple[str, str], tuple[str, str]] = {}
    for root, _dirs, files in os.walk(location):
        rel = os.path.relpath(root, location)
        if rel == ".hoodie" or rel.startswith(".hoodie" + os.sep):
            continue
        partition = os.path.relpath(root, location)
        for f in files:
            if not f.endswith(".parquet") or f.startswith("."):
                continue
            stem = f[: -len(".parquet")]
            try:
                file_id, _token, instant = stem.rsplit("_", 2)
            except ValueError:
                raise ValueError(f"non-Hudi data file name {f!r}") from None
            if instant not in completed or instant > horizon:
                continue  # uncommitted or future slice: invisible
            key = (partition, file_id)
            if key not in best or instant > best[key][0]:
                best[key] = (instant, os.path.join(root, f))
    return [
        (part, fid, instant, path)
        for (part, fid), (instant, path) in sorted(best.items())
    ]


def snapshot(spark, location: str, as_of: str | None = None):
    """Snapshot (or as-of time-travel) read: latest file slice per file
    group goes to Spark's native parquet reader. Returns
    (DataFrame, n_file_groups)."""
    slices = file_slices(location, as_of)
    paths = [p for _, _, _, p in slices]
    return spark.read.parquet(*paths), len(slices)
