"""Sketch-algebra tests: the merge properties the 100 TB rollup story
depends on (register-max for HLL, cell-sum for CMS, position-union for
Bloom) hold exactly — merged partial sketches equal the sketch built in
one pass over the whole input."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.functions.sketches import (
    bloom_positions,
    bloom_probe,
    cms_build,
    hll_registers,
)


def _regs_dict(df):
    return {(r["grp"], r["bucket"]): r["max_rank"] for r in df.collect()}


def test_hll_registers_merge_by_max(spark):
    rows = [("a", i % 37) for i in range(200)] + [("b", i % 11) for i in range(50)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    whole = hll_registers(df, "key", ["grp"], p=4)

    # split into two "partitions", sketch each, merge registers by max
    left = hll_registers(df.filter("key % 2 = 0"), "key", ["grp"], p=4)
    right = hll_registers(df.filter("key % 2 = 1"), "key", ["grp"], p=4)
    merged = (
        left.unionByName(right)
        .groupBy("grp", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    assert _regs_dict(merged) == _regs_dict(whole)


def test_cms_cells_merge_by_sum(spark):
    df = spark.createDataFrame([(i % 13,) for i in range(300)], ["key"])
    whole = cms_build(df, "key", depth=3, width=16)
    parts = [df.filter("key < 7"), df.filter("key >= 7")]
    merged = (
        cms_build(parts[0], "key", depth=3, width=16)
        .unionByName(cms_build(parts[1], "key", depth=3, width=16))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_dict = lambda d: {(r["row"], r["col"]): r["cnt"] for r in d.collect()}
    assert as_dict(merged) == as_dict(whole)


def test_bloom_no_false_negatives(spark):
    dim = spark.createDataFrame([(i * 3,) for i in range(40)], ["key"])
    facts = spark.createDataFrame([(i,) for i in range(120)], ["k"])
    bits = bloom_positions(dim, "key", k=3, m=256)
    out = bloom_probe(facts, "k", bits, k=3, m=256).collect()
    members = {i * 3 for i in range(40)}
    for r in out:
        if r["k"] in members:
            assert r["bloom_pass"], f"false negative for {r['k']}"


def test_streaming_hll_rollup_matches_batch(spark, tmp_path):
    """Incremental HLL: fold each micro-batch's register table into a
    running store via foreachBatch (merge = groupBy max), and the final
    registers must equal the one-shot batch sketch — the 100 TB rollup
    contract, exercised through Structured Streaming itself."""
    import datetime

    from pyspark.sql import functions as F

    rows = [
        ("g", i * 7 % 97, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["grp", "key", "ts"])
    src = str(tmp_path / "hll_events")
    df.repartition(4).write.parquet(src)

    store = {}

    def fold_batch(batch_df, _batch_id):
        regs = hll_registers(batch_df, "key", ["grp"], p=4)
        for r in regs.collect():
            k = (r["grp"], r["bucket"])
            store[k] = max(store.get(k, 0), r["max_rank"])

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(fold_batch).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    batch = {
        (r["grp"], r["bucket"]): r["max_rank"]
        for r in hll_registers(df, "key", ["grp"], p=4).collect()
    }
    assert store == batch

def test_cms_estimate_upper_bounds_truth_and_weighted_build_equal(spark):
    """Two invariants behind cms_heavy_hitters: (1) the point estimate NEVER
    underestimates the true count (the no-false-negative guarantee sketch-
    driven shortlisting rests on), for an adversarially small sketch where
    collisions are guaranteed; (2) building the sketch from pre-aggregated
    (key, count) rows via weight_col yields cell-for-cell the sketch built
    from the raw stream."""
    from pwc_challenge_dataengineer_spark.functions.sketches import cms_estimate

    rows = [(f"k{i % 23}",) for i in range(400)]
    df = spark.createDataFrame(rows, ["key"])
    true = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()}

    raw_sketch = cms_build(df, "key", depth=3, width=8)  # 23 keys in 8 cols
    per_key = df.groupBy("key").agg(F.count("*").alias("n"))
    weighted_sketch = cms_build(per_key, "key", depth=3, width=8, weight_col="n")
    as_dict = lambda d: {(r["row"], r["col"]): r["cnt"] for r in d.collect()}
    assert as_dict(weighted_sketch) == as_dict(raw_sketch)

    est = cms_estimate(raw_sketch, per_key.select("key"), "key", depth=3, width=8)
    for r in est.collect():
        assert r["estimated_count"] >= true[r["key"]], (
            r["key"], r["estimated_count"], true[r["key"]]
        )
