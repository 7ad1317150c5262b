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
