"""Property-based SCD2 invariants (SURVEY §7.3.2: "define one semantic —
close + insert, effective-dated — and property-test it").

Hypothesis generates random change logs; for every one, the rebuilt history
must satisfy:

1. exactly one current row per key that appears in the log;
2. validity intervals per key tile the timeline: no overlaps, no gaps
   (each valid_to equals the next valid_from), last one open-ended;
3. the current row carries the attributes of the latest change;
4. consecutive versions differ in tracked attributes (no-op changes
   collapse);
5. version numbers are 1..n_versions in valid_from order.

Spark-session startup dominates, so Hypothesis runs a reduced example count
with a fixed seed (deterministic in CI).
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, seed, settings
from hypothesis import strategies as st

from pwc_challenge_dataengineer_spark.operators.scd2 import scd2_rebuild

KEYS = ["k1", "k2"]
ATTRS = ["a", "b", "c"]
BASE = datetime.datetime(2024, 1, 1)

change_log = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(ATTRS),
        st.integers(min_value=0, max_value=20),  # distinct hour offsets per event
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[2]),  # one change per (key, ts)
)


# Incoming batches for the merge-idempotency property: per-key attr values,
# None included so the null-churn fix stays covered (a NULL attr must compare
# equal to an identical NULL, or every re-apply would close+reinsert).
incoming_batch = st.dictionaries(
    st.sampled_from(["k1", "k2", "k3"]),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    min_size=0,
    max_size=3,
)


def _canon_sort(rows):
    # tuples contain None (open valid_to, NULL attrs): sort on a
    # None-tolerant key, compare the tuples themselves
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


def _hist_rows(df):
    return _canon_sort(
        (r.key, r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in df.collect()
    )


@seed(42)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    base_batch=incoming_batch,
    batch=incoming_batch,
    snapshot=st.booleans(),
)
def test_scd2_apply_idempotent(spark, base_batch, batch, snapshot):
    """Applying the same incoming batch twice must equal applying it once —
    the second apply classifies every key as unchanged, in BOTH snapshot and
    incremental modes (the crash/retry safety a merge pipeline rests on).
    The second apply uses a LATER effective_ts: idempotency must come from
    change detection, not from timestamp collision."""
    from pwc_challenge_dataengineer_spark.operators.scd2 import scd2_apply

    current = spark.createDataFrame(
        [
            (k, v, datetime.datetime(2024, 1, 1), None, 1, True)
            for k, v in base_batch.items()
        ],
        "key STRING, attr STRING, valid_from TIMESTAMP, valid_to TIMESTAMP, "
        "version INT, is_current BOOLEAN",
    )
    inc = spark.createDataFrame(
        [(k, v) for k, v in batch.items()], "key STRING, attr STRING"
    )
    once = scd2_apply(
        current, inc, ["key"], ["attr"], "2024-02-01 00:00:00", snapshot=snapshot
    ).localCheckpoint()
    twice = scd2_apply(
        once, inc, ["key"], ["attr"], "2024-03-01 00:00:00", snapshot=snapshot
    )
    assert _hist_rows(twice) == _hist_rows(once)


@seed(42)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(base_batch=incoming_batch, batch=incoming_batch)
def test_scd2_merge_idempotent(spark, base_batch, batch):
    """VersionedTable.scd2_merge applied twice with the same source must
    leave the table exactly as one application did (later effective_ts on
    the retry, same reasoning as test_scd2_apply_idempotent)."""
    import tempfile

    from pwc_challenge_dataengineer_spark.sources.versioned_store import (
        VersionedTable,
        scd2_merge,
    )

    with tempfile.TemporaryDirectory() as tmp:
        t = VersionedTable(spark, f"{tmp}/scd2prop")
        base = spark.createDataFrame(
            [
                (k, v, datetime.datetime(2024, 1, 1), None, True)
                for k, v in base_batch.items()
            ],
            "key STRING, attr STRING, valid_from TIMESTAMP, valid_to TIMESTAMP, "
            "is_current BOOLEAN",
        )
        t.write(base)
        src = spark.createDataFrame(
            [(k, v) for k, v in batch.items()], "key STRING, attr STRING"
        )
        scd2_merge(
            t, src, keys=["key"], tracked_cols=["attr"],
            effective_ts="2024-02-01 00:00:00",
        )
        once = _canon_sort(map(tuple, t.read().collect()))
        scd2_merge(
            t, src, keys=["key"], tracked_cols=["attr"],
            effective_ts="2024-03-01 00:00:00",
        )
        twice = _canon_sort(map(tuple, t.read().collect()))
        assert twice == once


@seed(42)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=change_log)
def test_scd2_rebuild_invariants(spark, log):
    rows = [(k, a, BASE + datetime.timedelta(hours=h)) for k, a, h in log]
    df = spark.createDataFrame(rows, "key STRING, attr STRING, ts TIMESTAMP")
    hist = scd2_rebuild(df, ["key"], ["attr"], "ts").collect()

    latest = {}
    for k, a, h in log:
        if k not in latest or h > latest[k][1]:
            latest[k] = (a, h)

    by_key: dict[str, list] = {}
    for r in hist:
        by_key.setdefault(r.key, []).append(r)

    assert set(by_key) == {k for k, _, _ in log}
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r.valid_from)
        # 1: exactly one current row (open-ended: valid_to is NULL)
        assert sum(1 for r in versions if r.is_current) == 1
        assert versions[-1].is_current and versions[-1].valid_to is None
        # 2: intervals tile the timeline
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.valid_to == nxt.valid_from
            assert not prev.is_current
        # 3: current row carries the latest attributes
        assert versions[-1].attr == latest[k][0]
        # 4: no-op changes collapsed
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.attr != nxt.attr
        # 5: version numbering
        assert [r.version for r in versions] == list(range(1, len(versions) + 1))
