"""Versioned parquet table: Delta-lake semantics without Delta jars.

The reference leans on Delta for time travel (delta_lake_manager.py:260-310
``versionAsOf``/``timestampAsOf``), MERGE upserts (:354-416), history, and
retention VACUUM (:323-337). No Delta jars ship in this environment, so this
module provides the same table semantics over plain parquet:

- every version is an immutable snapshot directory ``v=N/`` under the table
  root, plus a tiny JSON manifest (driver-side metadata — data never moves
  through the driver).
- ``read(version_as_of | timestamp_as_of)`` resolves the snapshot exactly
  like Delta's reader (timestamp → greatest version committed ≤ ts).
- ``merge`` implements close-and-insert upsert in one distributed pass:
  target left_anti/inner classified against the source on the key columns —
  never a row loop. The known reference bug (SURVEY §7.3.2: its MERGE closes
  changed rows but forgets to re-insert the new version) is fixed here and
  pinned by tests/test_versioned.py.
- ``vacuum(keep_last)`` drops old snapshot dirs (Delta's retention).

Scale notes: a snapshot per write is the same storage model Delta uses
(files are immutable; versions share nothing). For 100 TB tables you'd add
file-level manifests to avoid rewriting unchanged partitions — the API here
is the contract; copy-on-write granularity is an implementation detail the
tests don't pin.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def _load_manifest(self) -> list[dict]:
        try:
            with open(self._manifest_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return []

    def _write_manifest(self, entries: list[dict]) -> None:
        # Atomic commit: write to a temp file then os.replace() so a crash
        # mid-write never leaves a torn manifest. Single-writer assumption:
        # unlike Delta's optimistic concurrency, two concurrent committers
        # can still lose an entry (last replace wins) — this store emulates
        # Delta's table semantics, not its commit protocol.
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entries, fh)
        os.replace(tmp, self._manifest_path())

    def _append_manifest(self, entry: dict) -> None:
        entries = self._load_manifest()
        entries.append(entry)
        self._write_manifest(entries)

    # -- write / read ------------------------------------------------------
    def latest_version(self) -> int | None:
        entries = self._load_manifest()
        return entries[-1]["version"] if entries else None

    def write(self, df: DataFrame, operation: str = "write") -> int:
        version = (self.latest_version() if self.latest_version() is not None else -1) + 1
        target = os.path.join(self.path, f"v={version}")
        df.write.mode("errorifexists").parquet(target)
        self._append_manifest(
            {"version": version, "ts": time.time(), "operation": operation}
        )
        return version

    def write_split(
        self,
        base: DataFrame,
        append: DataFrame | None,
        operation: str = "write_split",
    ) -> int:
        """Split commit: rewrite only the mutable slice (``base``) and
        append an immutable segment (``append``); prior append segments
        carry over BY MANIFEST REFERENCE, never rewritten. This is the
        file-level-manifest upgrade the module docstring promised for
        100 TB tables: for an SCD2 dimension the closed history only ever
        grows, so a per-batch commit writes |current| + |newly closed|
        bytes instead of the whole table (O(batches) total instead of
        O(batches^2)).

        Contract: ``read()`` of the new version = ``base`` ∪ carried
        appends ∪ ``append``. When the PREVIOUS commit was a legacy full
        snapshot (or this is the first commit), the caller must pass the
        ENTIRE immutable slice as ``append`` (a one-time rebase — the
        previous snapshot's dirs cannot be referenced because they mix
        mutable and immutable rows); when the previous commit was itself
        a split, ``append`` holds only the NEW immutable rows. Pass
        ``append=None`` when there are none."""
        prev = self.latest_version()
        prev_entry = self._resolve(prev) if prev is not None else None
        version = (prev if prev is not None else -1) + 1
        vdir = os.path.join(self.path, f"v={version}")
        base.write.mode("errorifexists").parquet(os.path.join(vdir, "base"))
        if prev_entry is not None and "appends" in prev_entry:
            appends = list(prev_entry["appends"])
        else:
            appends = []  # first commit or rebase over a legacy snapshot
        if append is not None:
            append.write.mode("errorifexists").parquet(
                os.path.join(vdir, "append")
            )
            appends.append(version)
        self._append_manifest(
            {
                "version": version,
                "ts": time.time(),
                "operation": operation,
                "appends": appends,
            }
        )
        return version

    def read_base(
        self,
        version_as_of: int | None = None,
        timestamp_as_of: float | None = None,
    ) -> DataFrame:
        """The mutable slice of a split commit (the full snapshot for a
        legacy commit — callers filter)."""
        entry = self._resolve(version_as_of, timestamp_as_of)
        return self.spark.read.parquet(self._entry_paths(entry)[0])

    def read_appends(
        self,
        version_as_of: int | None = None,
        timestamp_as_of: float | None = None,
    ) -> DataFrame | None:
        """Union of a split commit's immutable append segments (None when
        it has none, or for a legacy commit)."""
        entry = self._resolve(version_as_of, timestamp_as_of)
        paths = self._entry_paths(entry)[1:]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def is_split(self, version_as_of: int | None = None) -> bool:
        try:
            return "appends" in self._resolve(version_as_of)
        except FileNotFoundError:
            return False

    def _resolve(
        self,
        version_as_of: int | None = None,
        timestamp_as_of: float | None = None,
    ) -> dict:
        entries = self._load_manifest()
        if not entries:
            raise FileNotFoundError(f"versioned table {self.path} has no commits")
        if version_as_of is not None:
            by_v = {e["version"]: e for e in entries}
            if version_as_of not in by_v:
                raise ValueError(
                    f"version {version_as_of} not in {sorted(by_v)}"
                )
            return by_v[version_as_of]
        if timestamp_as_of is not None:
            eligible = [e for e in entries if e["ts"] <= timestamp_as_of]
            if not eligible:
                raise ValueError(f"no version committed at or before {timestamp_as_of}")
            return max(eligible, key=lambda e: e["version"])
        return entries[-1]

    def _entry_paths(self, entry: dict) -> list[str]:
        """Data directories composing a version: a legacy full snapshot is
        its own ``v=N`` dir; a split commit is its ``v=N/base`` (the
        rewritten slice) plus every referenced append segment — files from
        OLDER versions carried forward by manifest reference instead of
        being rewritten (the Delta-MERGE file-skipping analogue)."""
        v = entry["version"]
        if "appends" not in entry:
            return [os.path.join(self.path, f"v={v}")]
        paths = [os.path.join(self.path, f"v={v}", "base")]
        paths += [
            os.path.join(self.path, f"v={a}", "append")
            for a in entry["appends"]
        ]
        return paths

    def read(
        self,
        version_as_of: int | None = None,
        timestamp_as_of: float | None = None,
    ) -> DataFrame:
        entry = self._resolve(version_as_of, timestamp_as_of)
        return self.spark.read.parquet(*self._entry_paths(entry))

    def diff(
        self, keys: list[str], from_version: int, to_version: int
    ) -> DataFrame:
        """Change-data-feed between two snapshots: one row per changed key
        with ``_change_type`` in {insert, delete, update_postimage} —
        the read side of Delta's CDF (delta_lake_manager.py reads
        ``table_changes``; here the diff is computed from the snapshots,
        which is what CDF degrades to when the feed wasn't enabled at
        write time). Keys join with eqNullSafe; attribute comparison uses
        a null-safe hash over all non-key columns. Both snapshots stream
        through one full-outer join on the key — no driver-side state."""
        old = self.read(version_as_of=from_version)
        new = self.read(version_as_of=to_version)
        attr_cols = [c for c in new.columns if c not in keys]

        def attr_hash(df: DataFrame):
            return F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in attr_cols
                    ],
                )
            )

        o = old.select(
            *[F.col(k).alias(f"_ok_{k}") for k in keys],
            attr_hash(old).alias("_oh"),
        )
        n = new.select(*keys, attr_hash(new).alias("_nh"), *attr_cols)
        cond = None
        for k in keys:
            c = F.col(f"_ok_{k}").eqNullSafe(F.col(k))
            cond = c if cond is None else cond & c
        j = o.join(n, cond, "full_outer")
        change = (
            F.when(F.col("_oh").isNull(), F.lit("insert"))
            .when(F.col("_nh").isNull(), F.lit("delete"))
            .when(F.col("_oh") != F.col("_nh"), F.lit("update_postimage"))
        )
        out_keys = [
            F.coalesce(F.col(k), F.col(f"_ok_{k}")).alias(k) for k in keys
        ]
        return (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(*out_keys, *attr_cols, "_change_type")
        )

    def history(self) -> DataFrame:
        return self.spark.createDataFrame(
            [(e["version"], float(e["ts"]), e["operation"]) for e in self._load_manifest()],
            "version INT, ts DOUBLE, operation STRING",
        )

    # -- merge (upsert) ----------------------------------------------------
    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched_update: bool = True,
        when_not_matched_insert: bool = True,
    ) -> int:
        """Delta ``MERGE`` semantics in one distributed pass.

        new snapshot = (target rows with no source match)        -- kept
                     ∪ (source rows with a target match, if update)
                     ∪ (source rows with no target match, if insert)

        Matched source rows REPLACE the target row (update-all columns),
        and unmatched source rows are inserted — i.e. close-and-insert in
        the same commit, unlike the reference's one-legged MERGE
        (delta_lake_manager.py:387-410).
        """
        target = self.read()
        if when_matched_update:
            # matched target rows are replaced by their source versions
            kept = target.join(source, keys, "left_anti")
            parts = [kept, source.join(target.select(*keys).distinct(), keys, "left_semi")]
        else:
            # no update leg: matched target rows stay as they are
            parts = [target]
        if when_not_matched_insert:
            parts.append(source.join(target.select(*keys).distinct(), keys, "left_anti"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # Materialize BEFORE the snapshot write: `out` lazily reads the
        # current snapshot, and writing a new version must not race the read.
        merged = out.localCheckpoint(eager=True)
        return self.write(merged, operation="merge")

    def delete_where(self, condition) -> int:
        """Delta DELETE: new snapshot without matching rows. Rows where the
        condition evaluates NULL are kept (SQL DELETE removes only
        condition=true rows; a bare ~cond would drop the NULLs too)."""
        kept = self.read().filter(~F.coalesce(condition, F.lit(False)))
        return self.write(kept.localCheckpoint(eager=True), operation="delete")

    # -- optimize (compaction + Z-ORDER) -----------------------------------
    def optimize(
        self,
        zorder_by: list[str] | None = None,
        n_files: int = 4,
        bits_per_col: int = 8,
    ) -> int:
        """Delta ``OPTIMIZE [ZORDER BY]`` analog (delta_lake_manager.py:
        312-321): rewrite the current snapshot into ``n_files`` right-sized
        files; with ``zorder_by``, cluster rows along the Morton (Z-order)
        curve of those columns first, so per-file min/max spans shrink on
        EVERY listed column and parquet rowgroup/file skipping works for
        predicates on any of them (not just the first sort key).

        Layout pass = one stats agg (min/max per column, broadcast back) +
        one range repartition + in-partition sort on the interleaved code —
        the same cost shape Delta's OPTIMIZE pays. Data content is
        unchanged; only layout. Commits a new version ("optimize")."""
        df = self.read()
        spark = df.sparkSession
        if zorder_by:
            code = zorder_code(df, zorder_by, bits_per_col)
            # Range-exchange boundaries come from a per-partition sample whose
            # seed varies with session history; a boundary landing inside a
            # Morton quadrant makes that file span ~the full range on one
            # z-ordered column. A maintenance rewrite can afford a denser
            # sample for near-exact quantile boundaries (still bounded per
            # partition, so this holds at any table size).
            key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
            prev = spark.conf.get(key, None)
            spark.conf.set(key, "2000")
            try:
                clustered = (
                    code.repartitionByRange(n_files, F.col("__z"))
                    .sortWithinPartitions("__z")
                    .drop("__z")
                    .localCheckpoint(eager=True)
                )
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        else:
            clustered = df.coalesce(n_files).localCheckpoint(eager=True)
        return self.write(clustered, operation="optimize")

    # -- retention ---------------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (Delta VACUUM).
        Time travel to a vacuumed version then errors, matching Delta.
        Split commits reference OLDER versions' append segments; a version
        dir still referenced by any kept entry survives on disk even when
        its own manifest entry is dropped (Delta keeps data files alive
        the same way — retention applies to unreferenced files only)."""
        entries = self._load_manifest()
        if len(entries) <= keep_last:
            return []
        drop, keep = entries[:-keep_last], entries[-keep_last:]
        referenced: set[int] = set()
        for e in keep:
            referenced.add(e["version"])
            referenced.update(e.get("appends", []))
        dropped = []
        for e in drop:
            if e["version"] in referenced:
                continue  # data still carried by a kept split commit
            shutil.rmtree(
                os.path.join(self.path, f"v={e['version']}"),
                ignore_errors=True,
            )
            dropped.append(e["version"])
        self._write_manifest(keep)
        return dropped


def zorder_code(
    df: DataFrame, cols: list[str], bits_per_col: int = 8
) -> DataFrame:
    """Append ``__z``: the Morton (bit-interleaved) code of the given
    numeric columns, each linearly bucketed to ``bits_per_col`` bits over
    its observed [min, max].

    Linear min/max bucketing (not quantiles) keeps the code a pure,
    engine-deterministic expression: one stats aggregate broadcast back,
    then integer bit arithmetic — no sampling, no RNG. Skewed columns get
    uneven bucket occupancy; for those, rank-bucket first (operators.
    scalable.quantile_bucket) and z-order the bucket ids. Up to
    floor(63/bits_per_col) columns fit in a BIGINT code."""
    n_cols = len(cols)
    if n_cols * bits_per_col > 63:
        raise ValueError(
            f"{n_cols} cols × {bits_per_col} bits exceeds a 63-bit code"
        )
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    max_bucket = (1 << bits_per_col) - 1
    buckets = []
    for c in cols:
        lo, hi = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        scaled = F.when(
            hi > lo,
            F.floor(
                (F.col(c).cast("double") - lo) / (hi - lo) * F.lit(max_bucket)
            ),
        ).otherwise(F.lit(0))
        buckets.append(F.least(scaled, F.lit(max_bucket)).cast("bigint"))
    z = F.lit(0).cast("bigint")
    for b in range(bits_per_col):
        for i, bucket in enumerate(buckets):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n_cols + i))
    return out.withColumn("__z", z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def scd2_merge(
    table: VersionedTable,
    source: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
    effective_ts: str = "2001-09-01 00:00:00",
) -> int:
    """SCD2 over the versioned store: close changed current rows AND insert
    their new versions in the same commit (the one-pass semantics SURVEY
    §7.3.2 defines; reference's Delta MERGE drops the re-insert leg)."""
    target = table.read()
    cmp_keys = keys + tracked_cols
    cur = target.filter(F.col(current_col))
    # Closed history must survive every merge: only the CURRENT slice is
    # classified/closed; non-current rows pass through unconditionally.
    history = target.filter(~F.col(current_col))
    # Null-safe change detection: a NULL tracked value must match an
    # identical NULL in the current row (plain equality never matches NULL,
    # which would close+reinsert the same version on every run).
    cur_cmp = cur.select(*cmp_keys).distinct().alias("__t")
    src = source.alias("__s")
    anti_cond = [
        F.col(f"__s.{c}").eqNullSafe(F.col(f"__t.{c}")) for c in cmp_keys
    ]
    changed_or_new = src.join(cur_cmp, anti_cond, "left_anti")
    to_close_keys = changed_or_new.select(*keys).distinct()
    to_close = cur.join(to_close_keys, keys, "left_semi")
    eff = F.lit(effective_ts).cast("timestamp")
    closed = to_close.withColumn(end_col, eff).withColumn(current_col, F.lit(False))
    untouched_current = cur.join(to_close_keys, keys, "left_anti")
    inserts = changed_or_new.select(
        *keys,
        *tracked_cols,
        eff.alias(effective_col),
        F.lit(None).cast("timestamp").alias(end_col),
        F.lit(True).alias(current_col),
    )
    out = (
        history.unionByName(untouched_current)
        .unionByName(closed)
        .unionByName(inserts)
    )
    return table.write(out.localCheckpoint(eager=True), operation="scd2_merge")
