"""Property-based invariants for the scale-pattern operators: Hypothesis
generates adversarial small inputs (hot keys, ties, empty strata) and the
restructured plan must equal its textbook formulation on every one.

Reduced example counts with fixed seeds — Spark job latency dominates, and
determinism in CI matters more than case volume (same trade as
test_scd2_property.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, seed, settings
from hypothesis import strategies as st

from pwc_challenge_dataengineer_spark.functions.sketches import hll_registers
from pwc_challenge_dataengineer_spark.operators.scalable import salted_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Skewed key distributions: most weight on key 0 (the "viral" key).
skewed_pairs = st.lists(
    st.tuples(
        st.sampled_from([0, 0, 0, 0, 1, 2, 3]),  # hot key 0
        st.integers(min_value=0, max_value=100),
    ),
    min_size=1,
    max_size=30,
)


@seed(20260813)
@settings(**_SETTINGS)
@given(pairs=skewed_pairs)
def test_salted_join_equals_plain_join(spark, pairs):
    large = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(pairs)], ["key", "row_id", "v"]
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(5)], ["key", "attr"]
    )
    salted = salted_join(
        large, small, keys=["key"], salt_source="row_id", n_salts=4
    )
    plain = large.join(small, "key")
    as_set = lambda df: {
        (r["key"], r["row_id"], r["v"], r["attr"]) for r in df.collect()
    }
    assert as_set(salted) == as_set(plain)


@seed(20260813)
@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=60),
    offset=st.integers(min_value=0, max_value=10_000),
)
def test_hll_estimate_within_linear_counting_bound(spark, n, offset):
    """For n distinct keys << m buckets (linear-counting regime), the HLL
    estimate must land within 25% of the truth — the analytic bound for
    m=256 at these loads is far tighter, so a miss means broken math, not
    bad luck."""
    from pwc_challenge_dataengineer_spark.functions.sketches import hll_estimate

    df = spark.createDataFrame(
        [("g", offset + i) for i in range(n)], ["grp", "key"]
    )
    regs = hll_registers(df, "key", ["grp"], p=8)
    est = hll_estimate(regs, ["grp"], p=8).collect()[0]["hll_raw"]
    assert abs(est - n) <= max(2.0, 0.25 * n), (n, est)


@seed(20260813)
@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=12,
    )
)
def test_ewma_fold_matches_closed_form(spark, values):
    """The applyInPandas EWMA recursion must match the closed-form
    exponential weighting sum to float tolerance on arbitrary inputs."""
    import datetime

    from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES  # noqa: F401
    import pandas as pd
    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (7, base + datetime.timedelta(minutes=i), i, float(v))
        for i, v in enumerate(values)
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        y = None
        for x in pdf["value"].astype("float64"):
            y = x if y is None else 0.7 * y + 0.3 * x
        return pd.DataFrame({"user_id": [7], "ewma_last": [y]})

    got = (
        events.groupBy("user_id")
        .applyInPandas(fold, "user_id bigint, ewma_last double")
        .collect()[0]["ewma_last"]
    )
    # closed form: y_n = 0.7^(n-1) x_1 + sum_{i>=2} 0.3 * 0.7^(n-i) x_i
    n = len(values)
    expect = 0.7 ** (n - 1) * values[0] + sum(
        0.3 * 0.7 ** (n - i) * values[i - 1] for i in range(2, n + 1)
    )
    assert abs(got - expect) <= 1e-9 * max(1.0, abs(expect)), (got, expect)
