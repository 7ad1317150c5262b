"""Invariant tests for the round-9 curation wave (semdedup_prune,
dsir_importance_weights, token_budget_per_source, shard_assignment_order).

Value parity Spark-vs-DuckDB is the verify_local/driver gate's job;
these pin the SEMANTIC invariants of each operator on the oracle side
(fast, no Spark session), so a future edit that keeps both engines in
agreement but breaks the meaning still fails."""

from __future__ import annotations

import duckdb
import pytest

from pwc_challenge_dataengineer_spark.plans.catalog import ORACLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_semdedup_keep_rule_and_coverage(con):
    rows = con.execute(ORACLES["semdedup_prune"]).fetchall()
    total = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert len(rows) == total  # every vector gets a verdict
    by_cluster: dict[int, list[tuple]] = {}
    for vec_id, cluster_id, sim, pruned in rows:
        by_cluster.setdefault(cluster_id, []).append((vec_id, pruned))
    # at least one prune happens and the minimum id of every cluster is
    # always kept (the deterministic keep rule)
    assert sum(p for _, c in by_cluster.items() for _, p in c) > 0
    for members in by_cluster.values():
        min_id = min(v for v, _ in members)
        assert dict(members)[min_id] == 0
    # the 8 centroids each belong to their own cluster with sim 1.0
    for vec_id, cluster_id, sim, _ in rows:
        if vec_id < 8:
            assert cluster_id == vec_id and sim == 1.0


def test_dsir_weights_separate_target_from_raw(con):
    # english documents must average a higher log-weight than the rest —
    # that is the entire point of importance weighting toward lang='en'
    q = f"""
    WITH w AS ({ORACLES["dsir_importance_weights"]})
    SELECT d.lang = 'en' AS is_target, AVG(w.log_weight / w.n_toks)
    FROM w JOIN documents d USING (doc_id) GROUP BY 1
    """
    got = dict(con.execute(q).fetchall())
    assert got[True] > got[False]


def test_token_budget_cumsum_and_cap(con):
    rows = con.execute(ORACLES["token_budget_per_source"]).fetchall()
    assert rows, "budget keeps at least some docs"
    per_source: dict[str, list[tuple]] = {}
    for source, doc_id, n_tokens, cum in rows:
        assert cum <= 500
        per_source.setdefault(source, []).append((n_tokens, cum))
    for sel in per_source.values():
        # cum_tokens is a consistent running sum of the kept prefix
        run = 0
        for n_tokens, cum in sorted(sel, key=lambda t: t[1]):
            run += n_tokens
            assert cum == run


def test_shard_assignment_is_dense_and_stable(con):
    rows = con.execute(ORACLES["shard_assignment_order"]).fetchall()
    shards: dict[int, list[int]] = {}
    for doc_id, shard, position in rows:
        assert 0 <= shard < 16
        shards.setdefault(shard, []).append(position)
    assert len(shards) == 16
    for positions in shards.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # re-running yields the identical assignment (hash, not RNG)
    again = con.execute(ORACLES["shard_assignment_order"]).fetchall()
    assert sorted(rows) == sorted(again)


def test_sem_assign_never_drops_vectors_on_coarse_ties(spark):
    """r12 review pin: two near-identical coarse vectors tie at 6dp
    (round(cos)=1.0) and the ASC tiebreak would otherwise strip the
    higher-id coarse group of ALL centroids — a vector strictly nearest
    that group then inner-joins to zero candidates and silently drops.
    The coarse self-assignment pin keeps every group non-empty: assign
    must emit exactly one row per input vector."""
    import math

    from pwc_challenge_dataengineer_spark.plans.curation_extras import (
        _sem_assign_prune,
    )

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = []
    # coarse trio (n=64 -> k=8, c=3): 0 and 1 nearly identical (cos
    # rounds to 1.0 at 6dp), 2 orthogonal
    rows.append((0, vec(0.0)))
    rows.append((1, vec(1.0e-4)))
    rows.append((2, vec(math.pi / 2)))
    # centroids 3..7 near coarse 2 so none lands in group 1 by argmax
    for i in range(3, 8):
        rows.append((i, vec(math.pi / 2 + (i - 2) * 1.0e-3)))
    # filler vectors near coarse 2 to reach n=64 (k = floor(sqrt(64)))
    for i in range(8, 63):
        rows.append((i, vec(math.pi / 2 + (i - 7) * 1.0e-3)))
    # the probe vector: strictly nearer coarse 1 than coarse 0 at 6dp
    rows.append((63, vec(0.05)))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    assign, _pruned = _sem_assign_prune(emb, emb)
    got = {r["vec_id"] for r in assign.collect()}
    assert len(got) == 64 and 63 in got, (len(got), 63 in got)
