"""SCD Type-2 operators.

The reference has three inconsistent SCD2 implementations (pandas merge
src/etl/transformations/scd2.py:24-253; window kit
src/etl/transformations/windowing.py:94-108; Delta MERGE
src/etl/spark/delta_lake_manager.py:373-416 — whose MERGE closes old rows but
forgets to insert the new version, a bug per SURVEY §7.3). We define ONE
semantic — close-and-insert, effective-dated — with two distributed paths:

- ``scd2_rebuild``: full-history rebuild from a change log via window
  functions (lag hash to suppress no-op changes, lead ts for valid_to).
- ``scd2_classify_changes`` + ``scd2_apply``: incremental merge emulation
  (full-outer join on business key → insert/update/unchanged/delete classes
  → close + insert). With Delta jars this is one ``MERGE``; without, it is
  an anti-join + union rewrite, still fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Open rows carry valid_to = NULL (not a far-future sentinel): the classic
# 9999-12-31 overflows pandas' ns-epoch (Timestamp.max is 2262-04-11), which
# breaks any toPandas()/Arrow consumer of the open rows. ``is_current`` is an
# explicit boolean derived from valid_to IS NULL.


def _attr_hash(attr_cols: list[str]):
    return F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in attr_cols]))


def scd2_rebuild(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Rebuild SCD2 history from a change log.

    Consecutive rows with identical tracked attributes collapse into one
    version. Emits key + attrs + valid_from/valid_to/is_current/version.
    One shuffle on the business key; both window passes share it.
    """
    order = [F.col(ts_col)] + [F.col(t) for t in tiebreakers or []]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = (
        df.withColumn("__h", _attr_hash(attr_cols))
        .withColumn("__ph", F.lag("__h").over(w))
        .filter(F.col("__ph").isNull() | (F.col("__h") != F.col("__ph")))
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), *[F.col(t) for t in (tiebreakers or [])])
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "version", "is_current")
    )


def scd2_classify_changes(
    current: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """Classify incoming rows vs current dimension state.

    Full-outer join on the business key (reference scd2.py:78-90 uses a
    pandas outer merge with indicator — here it stays distributed) →
    ``change_type`` ∈ insert / update / unchanged / delete.
    """
    cur = current.select(
        *[F.col(c).alias(f"cur_{c}") for c in key_cols],
        _attr_hash(attr_cols).alias("cur_hash"),
    )
    inc = incoming.select(
        *[F.col(c) for c in key_cols],
        _attr_hash(attr_cols).alias("inc_hash"),
    )
    cond = [inc[k] == cur[f"cur_{k}"] for k in key_cols]
    joined = inc.join(cur, cond, "full_outer")
    key0 = key_cols[0]
    return joined.select(
        *[F.coalesce(inc[k], cur[f"cur_{k}"]).alias(k) for k in key_cols],
        F.when(cur[f"cur_{key0}"].isNull(), "insert")
        .when(inc[key0].isNull(), "delete")
        .when(F.col("inc_hash") != F.col("cur_hash"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
    )


def scd2_apply(
    current: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_ts,
    snapshot: bool = True,
) -> DataFrame:
    """Close-and-insert merge (Delta-MERGE emulation, both halves in one pass).

    - current rows whose key got an update/delete → closed (valid_to set,
      is_current False)
    - updated/new keys → fresh open version appended
    Distributed: one classify join + one broadcast-able semi/anti pattern.

    ``snapshot`` declares what ``incoming`` IS: a full snapshot (default —
    a key absent from it means the entity was deleted, so its current row
    closes) or an incremental change batch (``snapshot=False`` — absent
    keys are simply unchanged; an empty batch is then a no-op instead of
    a mass close-out). Getting this wrong in the incremental direction is
    the dangerous one, hence the explicit flag.
    """
    changes = scd2_classify_changes(
        current.filter(F.col("is_current")), incoming, key_cols, attr_cols
    )
    closing_types = ["update", "delete"] if snapshot else ["update"]
    closing_keys = changes.filter(F.col("change_type").isin(closing_types)).select(key_cols)
    new_keys = changes.filter(F.col("change_type").isin("update", "insert")).select(key_cols)

    closed = (
        current.join(closing_keys, key_cols, "left_semi")
        .filter(F.col("is_current"))
        .withColumn("valid_to", F.lit(effective_ts).cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = current.join(closing_keys, key_cols, "left_anti")
    history = current.filter(~F.col("is_current"))

    valid_to_type = current.schema["valid_to"].dataType
    max_ver = current.groupBy(*key_cols).agg(F.max("version").alias("__mv"))
    inserted = (
        incoming.join(new_keys, key_cols, "left_semi")
        .join(max_ver, key_cols, "left")
        .withColumn("valid_from", F.lit(effective_ts).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast(valid_to_type))
        .withColumn("version", (F.coalesce(F.col("__mv"), F.lit(0)) + 1).cast("int"))
        .withColumn("is_current", F.lit(True))
        .drop("__mv")
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "version", "is_current")
    )
    cols = [*key_cols, *attr_cols, "valid_from", "valid_to", "version", "is_current"]
    return (
        history.select(cols)
        .unionByName(untouched_current.filter(F.col("is_current")).select(cols))
        .unionByName(closed.select(cols))
        .unionByName(inserted)
    )
