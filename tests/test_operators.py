"""Golden-row operator tests (the reference's one good test pattern:
tests/test_silver_transform.py:8-53 — tiny fixed inputs, exact expectations)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.operators.dedup import dedup_keep_latest, exact_dedup
from pwc_challenge_dataengineer_spark.operators.incremental import checksum_classify_changes
from pwc_challenge_dataengineer_spark.operators.pagination import paginate_keyset, paginate_offset
from pwc_challenge_dataengineer_spark.operators.scalable import quantile_bucket
from pwc_challenge_dataengineer_spark.operators.scd2 import scd2_apply, scd2_rebuild
from pwc_challenge_dataengineer_spark.operators.sessionize import sessionize

TS = datetime.datetime


def test_dedup_keeps_latest(spark):
    df = spark.createDataFrame(
        [
            ("inv1", "sku1", TS(2024, 1, 1, 10), "old"),
            ("inv1", "sku1", TS(2024, 1, 1, 12), "new"),
            ("inv2", "sku1", TS(2024, 1, 1, 11), "only"),
        ],
        ["invoice_no", "stock_code", "ingestion_ts", "payload"],
    )
    out = dedup_keep_latest(df, ["invoice_no", "stock_code"], "ingestion_ts").collect()
    assert len(out) == 2
    assert {r.payload for r in out} == {"new", "only"}


def test_exact_dedup_min_id_survives(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello   world".replace("   ", " ")), (3, "other")],
        ["id", "text"],
    )
    # normalize=True lowercases+trims: ids 1 and 2 collide → min id survives
    out = exact_dedup(df, ["text"], "id").collect()
    assert sorted(r.id for r in out) == [1, 3]


def test_sessionize_gap(spark):
    base = TS(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 1),
        (1, base + datetime.timedelta(minutes=10), 2),
        (1, base + datetime.timedelta(minutes=50), 3),  # 40-min gap → new session
        (2, base, 4),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = {r.event_id: r.session_id for r in sessionize(df, "user_id", "ts", 30).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_scd2_rebuild_change_suppression(spark):
    rows = [
        (1, TS(2024, 1, 1), "A"),
        (1, TS(2024, 1, 2), "A"),  # unchanged → suppressed
        (1, TS(2024, 1, 3), "B"),  # change → v2
    ]
    df = spark.createDataFrame(rows, ["key", "ts", "attr"])
    out = sorted(
        scd2_rebuild(df, ["key"], ["attr"], "ts").collect(), key=lambda r: r.version
    )
    assert [r.attr for r in out] == ["A", "B"]
    assert out[0].valid_to == out[1].valid_from
    assert out[1].is_current and not out[0].is_current
    assert [r.version for r in out] == [1, 2]


def test_scd2_apply_close_and_insert(spark):
    current = spark.createDataFrame(
        [
            (1, "alice", TS(2020, 1, 1), None, 1, True),
            (2, "bob", TS(2020, 1, 1), None, 1, True),
        ],
        "id BIGINT, name STRING, valid_from TIMESTAMP, valid_to TIMESTAMP,"
        " version INT, is_current BOOLEAN",
    )
    incoming = spark.createDataFrame(
        [(1, "alice2"), (3, "carol")], ["id", "name"]
    )  # 1 updated, 2 deleted, 3 inserted
    out = scd2_apply(current, incoming, ["id"], ["name"], "2024-06-01 00:00:00")
    rows = {(r.id, r.name, r.is_current) for r in out.collect()}
    # update: old closed + new current; delete: closed; insert: current
    assert (1, "alice", False) in rows
    assert (1, "alice2", True) in rows
    assert (2, "bob", False) in rows
    assert (3, "carol", True) in rows
    versions = {(r.id, r.name): r.version for r in out.collect()}
    assert versions[(1, "alice2")] == 2


def test_checksum_classify(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    new = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["id", "v"])
    out = {r.id: r.change_type for r in checksum_classify_changes(old, new, ["id"], ["v"]).collect()}
    assert out == {1: "unchanged", 2: "update", 3: "delete", 4: "insert"}


def test_quantile_bucket_matches_quintiles(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], ["id", "v"])
    out = quantile_bucket(df, "v", 5, relative_error=1e-6).collect()
    buckets = {r.id: r.v_bucket for r in out}
    assert buckets[1] == 1 and buckets[100] == 5
    assert buckets[50] in (2, 3) and buckets[81] in (4, 5)
    assert set(buckets.values()) == {1, 2, 3, 4, 5}


def test_pagination(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 21)], ["id"])
    page2 = paginate_offset(df, [("id", "asc")], page=2, page_size=5).collect()
    assert [r.id for r in page2] == [6, 7, 8, 9, 10]
    ks = paginate_keyset(df, "id", "id", cursor=(10, 10), page_size=3).collect()
    assert [r.id for r in ks] == [11, 12, 13]


def test_ivf_recall_vs_brute(spark, sf_dir):
    """IVF with 2/8 cells probed must recover most exact top-5 neighbors."""
    from pyspark.sql import functions as F

    from pwc_challenge_dataengineer_spark.functions.similarity import (
        ann_ivf_topk,
        cosine_topk_brute,
    )
    from pwc_challenge_dataengineer_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk_brute(q, emb).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(q, emb, n_cells=8, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_salted_join_matches_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from pwc_challenge_dataengineer_spark.operators.scalable import salted_join, salted_sum
    from pwc_challenge_dataengineer_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, ["o_custkey"]).select("o_orderkey", "c_name")
    salted = salted_join(
        orders, customer, keys=["o_custkey"], salt_source="o_orderkey", n_salts=8
    ).select("o_orderkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    plain_agg = orders.groupBy("o_orderstatus").agg(
        F.sum("o_totalprice").alias("rev")
    )
    salted_agg = salted_sum(
        orders, ["o_orderstatus"], {"rev": "o_totalprice"},
        salt_source="o_orderkey", n_salts=8,
    )
    got = {r.o_orderstatus: round(r.rev, 2) for r in salted_agg.collect()}
    want = {r.o_orderstatus: round(r.rev, 2) for r in plain_agg.collect()}
    assert got == want


def test_bucketed_join_eliminates_exchange(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key removes the shuffle: the
    physical plan must contain no Exchange over the bucketed scans."""
    from pwc_challenge_dataengineer_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).option("path", str(tmp_path / "b_lineitem")).saveAsTable("b_lineitem")
    # force the shuffle-join path (at sf0.001 AQE would just broadcast,
    # which bypasses bucketing entirely — at scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cms_never_underestimates(spark):
    """Count-Min property: estimate(key) >= true count, and with few keys
    vs a 4x64 sketch, equality for present keys; absent keys >= 0."""
    from pwc_challenge_dataengineer_spark.functions.sketches import cms_build, cms_estimate

    rows = [(k,) for k in "aabbbbccccccddddddddd"]
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms_build(df, "k")
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)], ["k"])
    est = {r.k: r.estimated_count for r in cms_estimate(sketch, probes, "k").collect()}
    true = {"a": 2, "b": 4, "c": 6, "d": 9}
    for k, t in true.items():
        assert est[k] >= t
    assert est["zz"] >= 0


def test_asof_join_property(spark):
    """asof_join_backward equals the brute-force per-row maximum over
    eligible right rows, across a pinned grid of tricky cases (ties, misses,
    multiple keys, right rows after left)."""
    import datetime

    from pwc_challenge_dataengineer_spark.operators.asof import asof_join_backward

    B = datetime.datetime(2024, 1, 1)
    m = lambda minutes: B + datetime.timedelta(minutes=minutes)
    left = [  # (key, ts)
        (1, m(10)), (1, m(20)), (1, m(5)),
        (2, m(0)),             # before any right row -> NULL
        (3, m(50)),            # key with no right rows at all -> NULL
        (1, m(15)),            # exact tie with right row at 15
    ]
    right = [  # (key, ts, payload)
        (1, m(0), 100.0), (1, m(15), 150.0), (1, m(30), 300.0),
        (2, m(5), 200.0),
    ]
    ldf = spark.createDataFrame(left, ["k", "ts"])
    rdf = spark.createDataFrame(right, ["k", "ts", "p"])
    got = {
        (r.k, r.ts): r.asof_p
        for r in asof_join_backward(ldf, rdf, ["k"], "ts", ["p"]).collect()
    }
    for k, ts in left:
        eligible = [(rts, p) for rk, rts, p in right if rk == k and rts <= ts]
        expected = max(eligible)[1] if eligible else None
        assert got[(k, ts)] == expected, (k, ts, got[(k, ts)], expected)


def test_funnel_ordering_semantics(spark):
    """Funnel stages require at-or-after progression: a purchase BEFORE the
    user's first view must not count, a same-instant next stage must."""
    import datetime

    import pytest as _pytest

    from pwc_challenge_dataengineer_spark.operators.funnel import funnel

    B = datetime.datetime(2024, 1, 1)
    m = lambda minutes: B + datetime.timedelta(minutes=minutes)
    rows = [
        # u1: clean view -> click -> purchase
        (1, m(0), "view"), (1, m(1), "click"), (1, m(2), "purchase"),
        # u2: purchase BEFORE any view; then view+click but no later purchase
        (2, m(0), "purchase"), (2, m(1), "view"), (2, m(2), "click"),
        # u3: view and click at the SAME instant (tie counts), no purchase
        (3, m(5), "view"), (3, m(5), "click"),
        # u4: click only — never enters the funnel
        (4, m(0), "click"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.stage: (r.users, r.conversion_from_prev, r.conversion_from_first)
        for r in funnel(events, ["view", "click", "purchase"]).collect()
    }
    assert got["view"] == (3, None, 1.0)
    assert got["click"] == (3, 1.0, 1.0)          # u1, u2, u3 all click >= view
    assert got["purchase"][0] == 1                # only u1
    assert got["purchase"][1] == _pytest.approx(1 / 3)
    with _pytest.raises(ValueError):
        funnel(events, [])


def test_split_plan_is_shuffle_free(spark, sf_dir):
    """train_val_test_split must compile to a pure projection over the scan —
    any Exchange in the plan means an accidental shuffle at 100 TB; and
    customer_drilldown's dim joins must broadcast, not shuffle-join."""
    from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES

    split_df = QUERIES["train_val_test_split"](spark, sf_dir)
    plan = split_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    drill = QUERIES["customer_drilldown"](spark, sf_dir)
    dplan = drill._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in dplan


def test_deep_funnel_persist_same_result(spark):
    """5-stage funnel (auto-persist path) must equal the unpersisted plan."""
    from pwc_challenge_dataengineer_spark.operators.funnel import funnel

    base = TS(2024, 1, 1)
    rows = []
    for u in range(20):
        depth = u % 6
        for i, st in enumerate(["a", "b", "c", "d", "e"][: depth + 1]):
            rows.append((u, st, base + datetime.timedelta(minutes=i)))
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    stages = ["a", "b", "c", "d", "e"]
    fast = funnel(df, stages).orderBy("stage_index").collect()
    slow = funnel(df, stages, persist_stages=False).orderBy("stage_index").collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    # depths cycle 0..5 over 20 users → reach counts per stage:
    assert [r.users for r in fast] == [20, 16, 12, 9, 6]


def test_new_operator_plans_stay_exchange_lean(spark, sf_dir):
    """Scale-posture audit for the round-2 additions: the hash sample and
    the chunker must compile with NO Exchange (pure scan-side work); the
    Bloom probe must broadcast its bit set (no shuffle before the final
    agg); the salted join must broadcast the replicated small side."""
    from pwc_challenge_dataengineer_spark.plans.catalog import QUERIES

    sample_plan = (
        QUERIES["stratified_sample_docs"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in sample_plan, sample_plan

    chunk_plan = (
        QUERIES["doc_chunks"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in chunk_plan, chunk_plan

    bloom_plan = (
        QUERIES["bloom_filter_prune"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in bloom_plan or "BroadcastHashJoin" in bloom_plan

    salted_plan = (
        QUERIES["salted_skew_join"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in salted_plan, salted_plan
