"""Oracle-reproducible distributed sketches #2: HyperLogLog and Bloom filter
(joining the Count-Min query in plans/aggregates.py). Spark ships both
natively (approx_count_distinct, the runtime BloomFilter join pruning), but
their internal hashes can't be replayed in ANSI SQL — these md5-based
constructions can, so the driver's DuckDB gate verifies the sketch math
itself, register by register (reference analog: the approx-distinct and
pre-join pruning the serving layer leans on, src/api via warehouse SQL).

- hll_distinct_users  per-event-type HyperLogLog (p=8, 256 registers) with
  linear-counting small-range correction, emitted next to the exact
  distinct count so the estimate error is visible in the result.
- bloom_filter_prune  Bloom filter (m=1024, k=3) built over high-balance
  customers, probed by every order: per-priority counts of bloom passes,
  true members, and false positives — the measurable FP-rate of the
  pre-join pruning pattern.

Scale posture: HLL registers are a fixed 2^p rows per group and merge by
max (per-day sketches roll up without rescans); the Bloom bit set is m bits
regardless of build-side size, broadcast, and applied map-side BEFORE any
shuffle — exactly how Spark's own runtime filters cut shuffle volume on
selective joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import (
    bloom_positions,
    bloom_probe,
    hll_estimate,
    hll_registers,
)
from ..schemas import load_table
from .catalog import register

_P = 8
_M_HLL = 1 << _P
_ALPHA_SQL = f"(0.7213 / (1.0 + 1.079 / {float(_M_HLL)}))"


def _hll_regs_sql(src: str, grp: str) -> str:
    """Shared oracle fragment: CTE chain ``h → obs → grid → regs`` turning
    ``<src>(<grp>, user_id)`` rows into the dense HLL register table
    ``regs(<grp>, bucket, max_rank)``. One definition for every HLL oracle
    in this module, mirroring functions/sketches.hll_registers — the
    estimator SQL cannot drift between queries."""
    return f"""h AS (
        SELECT {grp},
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM {src}
    ),
    obs AS (
        SELECT {grp}, h % {_M_HLL} AS bucket,
               MAX(CASE WHEN (h >> {_P}) = 0 THEN {61 - _P}
                   ELSE {61 - _P} - length(bin(h >> {_P})) END) AS max_rank
        FROM h GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.{grp}, g.range AS bucket
        FROM (SELECT DISTINCT {grp} FROM {src}) s
        CROSS JOIN range({_M_HLL}) g
    ),
    regs AS (
        SELECT g.{grp}, g.bucket, COALESCE(o.max_rank, 0) AS max_rank
        FROM grid g LEFT JOIN obs o
          ON g.{grp} = o.{grp} AND g.bucket = o.bucket
    )"""


def _hll_agg_sql(src: str, grp: str) -> str:
    """Shared oracle fragment: harmonic-sum + empty-register counts per
    group over a register table (mirrors functions/sketches.hll_estimate's
    aggregation)."""
    return f"""SELECT {grp},
               SUM(power(2.0, -max_rank)) AS harm,
               CAST(SUM(CASE WHEN max_rank = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS v_empty
        FROM {src} GROUP BY 1"""


def _hll_est_case(harm: str, v_empty: str) -> str:
    """Shared oracle fragment: the piecewise bias-corrected estimator with
    linear-counting small-range correction."""
    return f"""CASE WHEN {_ALPHA_SQL} * {float(_M_HLL * _M_HLL)} / {harm}
                         <= {2.5 * _M_HLL} AND {v_empty} > 0
               THEN {float(_M_HLL)} * ln({float(_M_HLL)} / {v_empty})
               ELSE {_ALPHA_SQL} * {float(_M_HLL * _M_HLL)} / {harm}
               END"""


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH {_hll_regs_sql("events", "event_type")},
    agg AS ({_hll_agg_sql("regs", "event_type")}),
    ex AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT a.event_type, ex.n_exact, a.v_empty,
           round({_hll_est_case("a.harm", "a.v_empty")}, 6) AS hll_estimate
    FROM agg a JOIN ex ON a.event_type = ex.event_type
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL distinct-user estimate next to the exact count.
    The register table (functions/sketches.py:hll_registers) is the
    mergeable artifact: at 100 TB you keep per-partition register tables
    and roll them up by max — this query certifies the estimator math the
    rollup would feed. Linear counting engages at test scale (many empty
    registers), and both branches are written identically in both engines
    so the driver's hash compare pins the full piecewise estimator."""
    events = load_table(spark, sf_dir, "events")
    regs = hll_registers(events, "user_id", ["event_type"], p=_P)
    est = hll_estimate(regs, ["event_type"], p=_P)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        "v_empty",
        F.round("hll_raw", 6).alias("hll_estimate"),
    )


_K, _M_BLOOM, _BAL = 3, 1024, 7000


def _pos_sql(key: str, r: int) -> str:
    return (
        f"('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' ||"
        f" CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {_M_BLOOM}"
    )


@register(
    "bloom_filter_prune",
    oracle=f"""
    WITH s AS (
        SELECT c_custkey AS key FROM customer WHERE c_acctbal > {_BAL}
    ),
    pos AS (
        SELECT DISTINCT {_pos_sql('key', 0)} AS pos FROM s
        UNION SELECT DISTINCT {_pos_sql('key', 1)} FROM s
        UNION SELECT DISTINCT {_pos_sql('key', 2)} FROM s
    ),
    bits AS (SELECT list(pos ORDER BY pos) AS bits FROM pos),
    probe AS (
        SELECT o.o_orderpriority,
               list_contains(b.bits, {_pos_sql('o.o_custkey', 0)})
               AND list_contains(b.bits, {_pos_sql('o.o_custkey', 1)})
               AND list_contains(b.bits, {_pos_sql('o.o_custkey', 2)})
                   AS bloom_pass,
               s.key IS NOT NULL AS is_member
        FROM orders o
        CROSS JOIN bits b
        LEFT JOIN (SELECT DISTINCT key FROM s) s ON o.o_custkey = s.key
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_pass,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_member,
           CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           round(CAST(SUM(CASE WHEN bloom_pass AND NOT is_member
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / (COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END)),
                 6) AS fp_rate
    FROM probe GROUP BY 1
    """,
)
def bloom_filter_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, measured: build a 1024-bit / 3-hash filter
    over high-balance customers, probe every order map-side, and report per
    priority how many orders pass the filter vs truly join — n_false_pos /
    fp_rate is the wasted-shuffle fraction the filter's m and k trade
    against. The filter is a broadcast array independent of build-side
    cardinality; the probe is a scan-side predicate (zero shuffle), the
    exact shape of Spark's own runtime BloomFilter pushdown — rebuilt on an
    md5 family so the oracle can replay every bit."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = customer.filter(F.col("c_acctbal") > _BAL).select(
        F.col("c_custkey").alias("key")
    )
    bits = bloom_positions(dim, "key", k=_K, m=_M_BLOOM)
    probed = bloom_probe(orders, "o_custkey", bits, k=_K, m=_M_BLOOM)
    member = dim.distinct().withColumn("is_member", F.lit(True))
    probe = probed.join(
        F.broadcast(member), probed.o_custkey == member.key, "left"
    ).select(
        "o_orderpriority",
        "bloom_pass",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    n_fp = F.sum(F.when(F.col("bloom_pass") & ~F.col("is_member"), 1).otherwise(0))
    n_mem = F.sum(F.when(F.col("is_member"), 1).otherwise(0))
    return probe.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        n_mem.alias("n_member"),
        n_fp.alias("n_false_pos"),
        F.round(
            n_fp.cast("double") / (F.count("*") - n_mem), 6
        ).alias("fp_rate"),
    )


def _cms_pos_sql(r: int, key: str, width: int = 64) -> str:
    return (
        f"CAST(('0x' || substr(md5('{r}:' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {width} AS INT)"
    )


def _cms_cells_sql(table: str, key: str) -> str:
    cases = " ".join(
        f"WHEN {r} THEN {_cms_pos_sql(r, key)}" for r in range(4)
    )
    return f"""
        SELECT r.row, CASE r.row {cases} END AS col, COUNT(*) AS cnt
        FROM {table}, (SELECT unnest([0, 1, 2, 3]) AS row) r
        GROUP BY 1, 2
    """


@register(
    "cms_join_cardinality",
    oracle=f"""
    WITH so AS ({_cms_cells_sql('orders', 'o_custkey')}),
    se AS ({_cms_cells_sql('events', 'user_id')}),
    est_rows AS (
        SELECT so.row, SUM(so.cnt * se.cnt) AS ip
        FROM so JOIN se ON so.row = se.row AND so.col = se.col
        GROUP BY 1
    ),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_estimate FROM est_rows),
    ex AS (
        SELECT CAST(SUM(o.c * e.c) AS BIGINT) AS exact_join_size
        FROM (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1) o
        JOIN (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1) e
          ON o.k = e.k
    )
    SELECT ex.exact_join_size, est.cms_estimate,
           round(CAST(est.cms_estimate AS DOUBLE) / ex.exact_join_size, 6)
               AS overestimate_ratio
    FROM ex CROSS JOIN est
    """,
)
def cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation by Count-Min inner product — the sketch trick
    cost-based optimizers use to size a join without running it:
    |A join B| = sum_k cntA(k)*cntB(k), and the CMS inner product
    (per-hash-row dot product of the two cell tables, min across rows)
    upper-bounds it using only 4x64 counters per side. Both the exact
    count and the estimate are integer arithmetic end-to-end, so the
    oracle pins the estimator bit-for-bit. At 100 TB each side's sketch
    builds in one map-side-combined pass (shuffle volume = sketch size)
    and sketches of disjoint partitions merge by cell-sum
    (tests/test_sketches.py)."""
    from ..functions.sketches import cms_build

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key")
    )
    so = cms_build(orders, "key", depth=4, width=64)
    se = cms_build(events, "key", depth=4, width=64)
    est = (
        so.alias("a")
        .join(se.alias("b"), ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
        .agg(F.min("ip").cast("bigint").alias("cms_estimate"))
    )
    exact = (
        orders.groupBy("key")
        .agg(F.count("*").alias("c"))
        .join(events.groupBy("key").agg(F.count("*").alias("ce")), "key")
        .agg(F.sum(F.col("c") * F.col("ce")).cast("bigint").alias("exact_join_size"))
    )
    return exact.crossJoin(est).select(
        "exact_join_size",
        "cms_estimate",
        F.round(
            F.col("cms_estimate").cast("double") / F.col("exact_join_size"), 6
        ).alias("overestimate_ratio"),
    )


_NBINS = 64


@register(
    "histogram_quantile_approx",
    oracle=f"""
    WITH stats AS (
        SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
    ),
    binned AS (
        SELECT LEAST(CAST(FLOOR((o_totalprice - mn) / (mx - mn) * {_NBINS})
                          AS BIGINT), {_NBINS - 1}) AS bin
        FROM orders CROSS JOIN stats
    ),
    hist AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY 1),
    cum AS (
        SELECT bin, c,
               SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM hist
    ),
    med_bin AS (
        SELECT MIN(bin) AS bin FROM cum, stats WHERE cum_c >= 0.5 * n
    ),
    approx AS (
        SELECT s.mn + (m.bin + 0.5) * (s.mx - s.mn) / {_NBINS} AS approx_median
        FROM med_bin m CROSS JOIN stats s
    ),
    ex AS (
        SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
            AS exact_median
        FROM orders
    )
    SELECT round(a.approx_median, 6) AS approx_median,
           e.exact_median,
           round(abs(a.approx_median - e.exact_median)
                 / e.exact_median, 6) AS rel_error
    FROM approx a CROSS JOIN ex e
    """,
)
def histogram_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median estimation from a 64-bin equi-width histogram (bin-midpoint
    rule) next to the exact percentile_disc and the realized relative
    error. The histogram is the quantile sketch that actually rolls up at
    100 TB: per-partition/per-day histograms merge by bin-sum (same
    monoid as the matview refresh), where approxQuantile's GK sketch
    must be rebuilt. Bin assignment, cumulative crossing, and the
    midpoint estimate are identical arithmetic on both engines, so the
    estimator — including its error — is hash-pinned."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count("*").alias("n"),
    )
    binned = orders.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * _NBINS
            ).cast("bigint"),
            F.lit(_NBINS - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    from pyspark.sql.window import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum_c", F.sum("c").over(w))
    med_bin = (
        cum.crossJoin(F.broadcast(stats))
        .filter(F.col("cum_c") >= 0.5 * F.col("n"))
        .agg(F.min("bin").alias("bin"))
    )
    approx = med_bin.crossJoin(F.broadcast(stats)).select(
        (
            F.col("mn")
            + (F.col("bin") + 0.5) * (F.col("mx") - F.col("mn")) / _NBINS
        ).alias("approx_median")
    )
    # percentile_disc equivalent: smallest value with cume_dist >= 0.5
    exact = orders.select(
        F.col("o_totalprice"),
        F.cume_dist()
        .over(Window.orderBy("o_totalprice"))
        .alias("cd"),
    ).filter(F.col("cd") >= 0.5).agg(
        F.min("o_totalprice").alias("exact_median")
    )
    return approx.crossJoin(exact).select(
        F.round("approx_median", 6).alias("approx_median"),
        "exact_median",
        F.round(
            F.abs(F.col("approx_median") - F.col("exact_median"))
            / F.col("exact_median"),
            6,
        ).alias("rel_error"),
    )


_VAL_CUT = 180.0  # segment threshold: high-value purchase vs error users


@register(
    "hll_set_algebra",
    oracle=f"""
    WITH segs AS (
        SELECT DISTINCT 'a' AS seg, user_id FROM events
        WHERE event_type = 'purchase' AND value > {_VAL_CUT}
        UNION
        SELECT DISTINCT 'b' AS seg, user_id FROM events
        WHERE event_type = 'error' AND value > {_VAL_CUT}
    ),
    tagged AS (
        SELECT seg, user_id FROM segs
        UNION
        SELECT 'u' AS seg, user_id FROM segs
    ),
    {_hll_regs_sql("tagged", "seg")},
    agg AS ({_hll_agg_sql("regs", "seg")}),
    est AS (
        SELECT seg, {_hll_est_case("harm", "v_empty")} AS raw
        FROM agg
    ),
    piv AS (
        SELECT MAX(CASE WHEN seg = 'a' THEN raw END) AS ea,
               MAX(CASE WHEN seg = 'b' THEN raw END) AS eb,
               MAX(CASE WHEN seg = 'u' THEN raw END) AS eu
        FROM est
    ),
    flags AS (
        SELECT user_id,
               MAX(CASE WHEN seg = 'a' THEN 1 ELSE 0 END) AS ha,
               MAX(CASE WHEN seg = 'b' THEN 1 ELSE 0 END) AS hb
        FROM segs GROUP BY 1
    ),
    ex AS (
        SELECT CAST(SUM(ha) AS BIGINT) AS n_exact_a,
               CAST(SUM(hb) AS BIGINT) AS n_exact_b,
               CAST(COUNT(*) AS BIGINT) AS n_exact_union,
               CAST(SUM(CASE WHEN ha = 1 AND hb = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_intersect
        FROM flags
    )
    SELECT ex.n_exact_a, ex.n_exact_b, ex.n_exact_union, ex.n_exact_intersect,
           round(piv.ea, 6) AS hll_a,
           round(piv.eb, 6) AS hll_b,
           round(piv.eu, 6) AS hll_union,
           round(piv.ea + piv.eb - piv.eu, 6) AS hll_intersect
    FROM ex CROSS JOIN piv
    """,
)
def hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET algebra over two user segments (high-value purchasers vs
    high-value error reporters): the union estimate comes from MERGING THE
    REGISTER TABLES by max — never rescanning rows — and the intersection
    from inclusion–exclusion (A∩B ≈ est_A + est_B − est_A∪B), next to the
    exact counts for all four. The oracle computes the union sketch from
    the unioned ROW set; equality with Spark's register-merge construction
    is exactly the HLL merge-monoid identity (max of maxes), so the
    driver's hash compare certifies the distributed rollup algebra itself.
    At 100 TB this is how per-day / per-shard audience sketches compose
    into arbitrary segment overlaps without touching raw events again."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > _VAL_CUT)
    ).select(F.lit("a").alias("seg"), "user_id")
    b = events.filter(
        (F.col("event_type") == "error") & (F.col("value") > _VAL_CUT)
    ).select(F.lit("b").alias("seg"), "user_id")
    segs = a.unionByName(b).distinct()

    regs_ab = hll_registers(segs, "user_id", ["seg"], p=_P)
    # union sketch = register-wise max merge of the a/b sketches
    regs_u = (
        regs_ab.groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .select(F.lit("u").alias("seg"), "bucket", "max_rank")
    )
    est = hll_estimate(regs_ab.unionByName(regs_u), ["seg"], p=_P)
    ea = F.max(F.when(F.col("seg") == "a", F.col("hll_raw")))
    eb = F.max(F.when(F.col("seg") == "b", F.col("hll_raw")))
    eu = F.max(F.when(F.col("seg") == "u", F.col("hll_raw")))
    piv = est.agg(
        F.round(ea, 6).alias("hll_a"),
        F.round(eb, 6).alias("hll_b"),
        F.round(eu, 6).alias("hll_union"),
        F.round(ea + eb - eu, 6).alias("hll_intersect"),
    )
    flags = segs.groupBy("user_id").agg(
        F.max(F.when(F.col("seg") == "a", 1).otherwise(0)).alias("ha"),
        F.max(F.when(F.col("seg") == "b", 1).otherwise(0)).alias("hb"),
    )
    exact = flags.agg(
        F.sum("ha").cast("bigint").alias("n_exact_a"),
        F.sum("hb").cast("bigint").alias("n_exact_b"),
        F.count("*").cast("bigint").alias("n_exact_union"),
        F.sum(F.when((F.col("ha") == 1) & (F.col("hb") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact_intersect"),
    )
    return exact.crossJoin(piv)


@register(
    "sliding_distinct_users_hll",
    oracle=f"""
    WITH ev AS (
        SELECT CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT)
                   AS hidx,
               user_id
        FROM events
    ),
    {_hll_regs_sql("ev", "hidx")},
    slid AS (
        SELECT hidx, bucket,
               MAX(max_rank) OVER (
                   PARTITION BY bucket ORDER BY hidx
                   RANGE BETWEEN 23 PRECEDING AND CURRENT ROW
               ) AS max_rank
        FROM regs
    ),
    agg AS ({_hll_agg_sql("slid", "hidx")}),
    est AS (
        SELECT hidx, v_empty, {_hll_est_case("harm", "v_empty")} AS raw
        FROM agg
    ),
    contrib AS (
        SELECT user_id, hidx + s.s AS wend
        FROM ev, (SELECT unnest(generate_series(0, 23)) AS s) s
    ),
    present AS (SELECT DISTINCT hidx AS wend FROM ev),
    ex AS (
        SELECT c.wend, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_exact
        FROM contrib c JOIN present p ON c.wend = p.wend
        GROUP BY 1
    )
    SELECT est.hidx AS window_end_hidx, ex.n_exact, est.v_empty,
           round(est.raw, 6) AS hll_estimate
    FROM est JOIN ex ON est.hidx = ex.wend
    """,
)
def sliding_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 24-hour distinct-user estimates WITHOUT rescanning events:
    build one HLL register table per hour (fixed 2^p rows each), then the
    24h window is a register-wise MAX over the trailing 23 hours — a window
    frame over sketches, the composition streaming dashboards actually run
    at 100 TB (hourly sketches persist; any window length is a frame over
    them, where exact COUNT(DISTINCT) would re-shuffle a day of raw events
    per window). The exact sliding count is computed alongside (each event
    contributes to the 24 windows it falls in — one bounded explode) so the
    realized estimator error is visible row by row; at production scale the
    exact arm is the one you drop. The sliding register table and the
    piecewise estimator are identical arithmetic on both engines, so the
    driver hash-pins the whole sketch-window algebra."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        (F.floor(F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600))
        .cast("bigint")
        .alias("hidx"),
        "user_id",
    )
    regs = hll_registers(ev, "user_id", ["hidx"], p=_P)
    w24 = (
        Window.partitionBy("bucket").orderBy("hidx").rangeBetween(-23, 0)
    )
    slid = regs.select(
        "hidx", "bucket", F.max("max_rank").over(w24).alias("max_rank")
    )
    est = hll_estimate(slid, ["hidx"], p=_P)
    contrib = ev.select(
        "user_id",
        F.explode(F.sequence(F.col("hidx"), F.col("hidx") + 23)).alias("wend"),
    )
    present = ev.select(F.col("hidx").alias("wend")).distinct()
    exact = (
        contrib.join(present, "wend")
        .groupBy("wend")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return est.join(exact, est.hidx == exact.wend).select(
        F.col("hidx").alias("window_end_hidx"),
        "n_exact",
        "v_empty",
        F.round("hll_raw", 6).alias("hll_estimate"),
    )


_KMV_K = 256
_TWO60 = float(1 << 60)  # hash domain: 60-bit md5 prefix


def _kmv_sql(hash_expr: str, events: str) -> str:
    """Shared KMV/theta SQL body; ``hash_expr`` is the dialect's
    md5->60-bit-BIGINT spelling with {x} as the key placeholder."""
    h = hash_expr.format(x="user_id")
    k, dom = _KMV_K, repr(_TWO60)
    return f"""
    WITH ua AS (SELECT DISTINCT {h} AS h FROM {events}
                WHERE event_type = 'purchase'),
    ub AS (SELECT DISTINCT {h} AS h FROM {events}
           WHERE event_type = 'error'),
    sa AS (SELECT h FROM ua ORDER BY h LIMIT {k}),
    sb AS (SELECT h FROM ub ORDER BY h LIMIT {k}),
    su AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) m
           ORDER BY h LIMIT {k}),
    ka AS (SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS sz FROM sa),
    kb AS (SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS sz FROM sb),
    ku AS (SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS sz FROM su),
    th AS (SELECT CASE WHEN ka.kth < kb.kth THEN ka.kth ELSE kb.kth END AS t
           FROM ka CROSS JOIN kb),
    inter AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
              FROM sa JOIN sb ON sa.h = sb.h CROSS JOIN th
              WHERE sa.h < th.t),
    ea AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ua),
    eb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ub),
    eu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT h FROM ua UNION SELECT h FROM ub) m),
    ei AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
           FROM ua JOIN ub ON ua.h = ub.h)
    SELECT ea.n AS n_exact_a, eb.n AS n_exact_b,
           eu.n AS n_exact_union, ei.n AS n_exact_intersection,
           CASE WHEN ea.n >= {k}
                THEN ({k - 1}.0 * {dom}) / CAST(ka.kth AS DOUBLE)
                ELSE CAST(ea.n AS DOUBLE) END AS est_a,
           CASE WHEN eb.n >= {k}
                THEN ({k - 1}.0 * {dom}) / CAST(kb.kth AS DOUBLE)
                ELSE CAST(eb.n AS DOUBLE) END AS est_b,
           CASE WHEN eu.n >= {k}
                THEN ({k - 1}.0 * {dom}) / CAST(ku.kth AS DOUBLE)
                ELSE CAST(eu.n AS DOUBLE) END AS est_union,
           (CAST(inter.c AS DOUBLE) * {dom}) / CAST(th.t AS DOUBLE)
               AS est_intersection
    FROM ea CROSS JOIN eb CROSS JOIN eu CROSS JOIN ei
    CROSS JOIN ka CROSS JOIN kb CROSS JOIN ku
    CROSS JOIN th CROSS JOIN inter
    """


@register(
    "kmv_theta_algebra",
    oracle=_kmv_sql(
        "('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::BIGINT",
        "events",
    ),
)
def kmv_theta_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta-style) distinct sketches with full set
    algebra — union AND intersection estimation, the operation HLL
    fundamentally cannot do (hll_set_algebra only gets intersections via
    inclusion-exclusion, which compounds error). Sets: purchasing users vs
    erroring users. Sketch = the k=256 smallest 60-bit md5 hashes per set;
    estimator (k-1)/theta_k; theta intersection = |SA cap SB restricted
    below min(theta_A, theta_B)| / theta. Estimates sit next to exact
    counts so the driver pins both the sketch math and its accuracy.

    Scale posture: ``ORDER BY h LIMIT k`` plans as TakeOrderedAndProject —
    per-partition top-k then a k-row merge, never a global sort; the
    sketches themselves are the mergeable 256-row artifacts you'd keep
    per shard at 100 TB. Every arithmetic step is a single float op on
    exact integers, identical text in both engines — bit-identical, no
    rounding. Hash = the module's replayable md5 family."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("kmv_events")
    return spark.sql(
        _kmv_sql(
            "CAST(conv(substring(md5(CAST({x} AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)",
            "kmv_events",
        )
    )
