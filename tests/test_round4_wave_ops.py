"""Invariant tests for the round-4 linkage/spatial/survival/IVM wave.
The DuckDB oracles pin exact values; these pin the semantic properties the
values must obey — nearest-neighbor optimality vs brute force, survival
monotonicity, peel monotonicity, decomposition reconstruction, and
vocabulary-growth consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES, _load_all
from pwc_challenge_dataengineer_spark.schemas import load_table

_load_all()


def test_grid_spatial_knn_matches_brute_force(spark, sf_dir):
    """The 9-cell probe must find exactly the brute-force nearest supplier
    within the radius: cell width == radius guarantees any in-radius
    supplier is in a probed cell, so results agree pair-for-pair."""
    got = {
        r["c_custkey"]: (r["nearest_suppkey"], r["dist2_deci"])
        for r in QUERIES["grid_spatial_knn"](spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271 + 11) % 10000).alias("pxi"),
        ((F.col("c_custkey") * 69621 + 7) % 10000).alias("pyi"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 40503 + 3) % 10000).alias("sxi"),
        ((F.col("s_suppkey") * 16807 + 5) % 10000).alias("syi"),
    )
    d2 = (F.col("pxi") - F.col("sxi")) * (F.col("pxi") - F.col("sxi")) + (
        F.col("pyi") - F.col("syi")
    ) * (F.col("pyi") - F.col("syi"))
    brute = (
        cust.crossJoin(supp)
        .withColumn("d2", d2)
        .filter(F.col("d2") <= 500 * 500)
        .groupBy("c_custkey")
        .agg(F.min(F.struct("d2", "s_suppkey")).alias("best"))
        .select("c_custkey", "best.d2", "best.s_suppkey")
        .collect()
    )
    want = {r["c_custkey"]: (r["s_suppkey"], r["d2"]) for r in brute}
    assert got == want


def test_kaplan_meier_survival_monotone(spark, sf_dir):
    rows = QUERIES["kaplan_meier_churn"](spark, sf_dir).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, series in by_seg.items():
        series.sort(key=lambda r: r["t_days"])
        prev = 1.0 + 1e-9
        n_prev = None
        for r in series:
            assert 0.0 <= r["survival"] <= prev + 1e-6, seg
            prev = r["survival"]
            # at-risk counts strictly decrease as observations leave
            if n_prev is not None:
                assert r["n_risk"] < n_prev, seg
            n_prev = r["n_risk"]
            assert r["d_events"] + r["c_censored"] <= r["n_risk"]


def test_kcore_peel_monotone_and_consistent(spark, sf_dir):
    rows = sorted(
        QUERIES["kcore_bipartite_peel"](spark, sf_dir).collect(),
        key=lambda r: r["peel_round"],
    )
    assert [r["peel_round"] for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["n_edges"] <= a["n_edges"]
        assert b["n_suppliers"] <= a["n_suppliers"]
        assert b["n_parts"] <= a["n_parts"]
    for r in rows:
        # bipartite sanity: edges bounded by the bipartite product and
        # at least max(side) when non-empty
        if r["n_edges"]:
            assert r["n_edges"] <= r["n_suppliers"] * r["n_parts"]
            assert r["n_edges"] >= max(r["n_suppliers"], r["n_parts"])


def test_stl_reconstructs_revenue(spark, sf_dir):
    rows = QUERIES["stl_decompose_daily"](spark, sf_dir).collect()
    assert rows
    n_anom = 0
    for r in rows:
        recon = r["trend"] + r["seasonal"] + r["residual"]
        # components are rounded at 4dp, so reconstruction is exact
        # within the stacked rounding error
        assert abs(recon - r["revenue"]) <= 2e-4, r
        n_anom += bool(r["is_anomaly"])
    # MAD-thresholded anomalies must be rare by construction
    assert n_anom <= len(rows) * 0.2


def test_vocab_growth_consistency(spark, sf_dir):
    rows = sorted(
        QUERIES["vocab_growth_curve"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    total_types = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select("tok")
        .distinct()
        .count()
    )
    prev_tok, prev_typ = 0, 0
    for r in rows:
        assert r["cum_types"] >= prev_typ
        assert r["cum_tokens"] >= prev_tok
        assert r["cum_types"] <= r["cum_tokens"]
        prev_tok, prev_typ = r["cum_tokens"], r["cum_types"]
    assert rows[-1]["cum_types"] == total_types


def test_forecast_backtest_shape(spark, sf_dir):
    rows = QUERIES["forecast_backtest_mape"](spark, sf_dir).collect()
    methods = {r["method"] for r in rows}
    assert methods == {"naive1", "seasonal12", "ma3"}
    n = {r["n_months"] for r in rows}
    assert len(n) == 1  # same eval window for every method
    for r in rows:
        assert 0.0 <= r["mape"] <= r["max_ape"]


def test_linkage_pairs_verified(spark, sf_dir):
    """Both linkage strategies only emit verified pairs, and the blocked
    strategy's pairs all share the blocking key by construction."""
    blocked = QUERIES["levenshtein_linkage"](spark, sf_dir).collect()
    for r in blocked:
        assert 1 <= r["lev"] <= 5  # lev 0 belongs to exact dedup
        assert r["name_a"].rsplit(" ", 1)[-1] == r["name_b"].rsplit(" ", 1)[-1]
        assert r["name_a"] < r["name_b"]
        assert r["n_record_pairs"] >= 1
    nbr = QUERIES["sorted_neighborhood_pairs"](spark, sf_dir).collect()
    for r in nbr:
        assert r["lev"] <= 5
        assert 1 <= r["nbr_offset"] <= 3
