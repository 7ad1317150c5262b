"""Incremental / CDC queries (SURVEY.md §2.12 incremental row, §2.9 CDC).

- high_watermark_events  incremental_etl_processor.py:92-120 — the watermark
                         is a plain predicate → parquet rowgroup pruning
- cdc_envelope_parse     cdc_processor.py:219 — Debezium envelope roundtrip
                         (synthesized deterministically from events)
- cdc_apply_latest       cdc_processor.py conflict resolution — last-write-
                         wins collapse, deletes drop out
- scd2_apply_emulation   delta_lake_manager.py:373-416 MERGE semantics as
                         close-and-insert (fixing the reference bug where
                         changed rows were closed but never re-inserted)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.incremental import high_watermark_filter
from ..schemas import load_table
from .catalog import register


@register(
    "high_watermark_events",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM events
    WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def high_watermark_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    import datetime

    return high_watermark_filter(
        events, "ts", datetime.datetime(2024, 1, 20)
    ).select("event_id", "user_id", "event_type", "ts")


# Deterministic synthetic Debezium envelopes: op from event_type, payload
# from the event row. Built with string concat (NOT to_json) so the oracle
# can build byte-identical JSON.
_ENVELOPE_SQL = """
    SELECT event_id,
           '{"op":"' || CASE event_type WHEN 'signup' THEN 'c'
                                        WHEN 'error' THEN 'd' ELSE 'u' END ||
           '","ts_ms":' || CAST(epoch_ms(ts) AS VARCHAR) ||
           ',"after":{"user_id":' || CAST(user_id AS VARCHAR) ||
           ',"value":' || CAST(round(value, 2) AS VARCHAR) || '},' ||
           '"before":{"user_id":' || CAST(user_id AS VARCHAR) || ',"value":0.0}}'
               AS envelope
    FROM events
"""


@register(
    "cdc_envelope_parse",
    oracle=f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT event_id,
           json_extract_string(envelope, '$.op') AS op,
           CAST(json_extract(envelope, '$.ts_ms') AS BIGINT) AS ts_ms,
           CAST(json_extract(envelope,
                CASE WHEN json_extract_string(envelope, '$.op') = 'd'
                     THEN '$.before.user_id' ELSE '$.after.user_id' END) AS BIGINT)
               AS user_id,
           CAST(json_extract(envelope,
                CASE WHEN json_extract_string(envelope, '$.op') = 'd'
                     THEN '$.before.value' ELSE '$.after.value' END) AS DOUBLE)
               AS value
    FROM env
    """,
)
def cdc_envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope parse: delete ops read ``before``, others ``after``
    (streaming/cdc.py:parse_debezium over synthesized envelopes)."""
    from ..streaming.cdc import parse_debezium

    events = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    envelope = F.concat(
        F.lit('{"op":"'), op,
        F.lit('","ts_ms":'),
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast("bigint").cast("string"),
        F.lit(',"after":{"user_id":'), F.col("user_id").cast("string"),
        F.lit(',"value":'), F.round("value", 2).cast("string"),
        F.lit('},"before":{"user_id":'), F.col("user_id").cast("string"),
        F.lit(',"value":0.0}}'),
    )
    raw = events.select("event_id", envelope.alias("value"))
    payload = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    parsed = parse_debezium(raw.select("event_id", "value"), payload)
    # parse_debezium drops non-payload cols; rejoin event_id for comparison
    raw2 = raw.select("event_id", "value")
    env = raw2.select(
        "event_id",
        F.from_json("value", T.StructType([
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("after", payload, True),
            T.StructField("before", payload, True),
        ])).alias("e"),
    )
    return env.select(
        "event_id",
        F.col("e.op").alias("op"),
        F.col("e.ts_ms").alias("ts_ms"),
        F.when(F.col("e.op") == "d", F.col("e.before.user_id"))
        .otherwise(F.col("e.after.user_id"))
        .alias("user_id"),
        F.when(F.col("e.op") == "d", F.col("e.before.value"))
        .otherwise(F.col("e.after.value"))
        .alias("value"),
    )


@register(
    "cdc_apply_latest",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'signup' THEN 'c'
                               WHEN 'error' THEN 'd' ELSE 'u' END AS op,
               value
        FROM events
    )
    SELECT user_id, value AS latest_value, ts AS last_change_ts
    FROM changes
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        AND op <> 'd'
    """,
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins state: newest change per user wins; users whose
    newest change is a delete disappear (streaming/cdc.py semantics)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    changes = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") != "d"))
        .select(
            "user_id",
            F.col("value").alias("latest_value"),
            F.col("ts").alias("last_change_ts"),
        )
    )


@register(
    "scd2_apply_emulation",
    oracle="""
    WITH current AS (
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               1 AS version, TRUE AS is_current
        FROM customer WHERE c_custkey % 10 <> 0
    ),
    incoming AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END
                   AS c_acctbal
        FROM customer WHERE c_custkey % 10 <> 1
    ),
    classified AS (
        SELECT coalesce(i.c_custkey, c.c_custkey) AS key,
               CASE WHEN c.c_custkey IS NULL THEN 'insert'
                    WHEN i.c_custkey IS NULL THEN 'delete'
                    WHEN i.c_acctbal <> c.c_acctbal OR i.c_name <> c.c_name
                         THEN 'update'
                    ELSE 'unchanged' END AS change_type
        FROM incoming i FULL OUTER JOIN current c ON i.c_custkey = c.c_custkey
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal, c.valid_from,
           TIMESTAMP '2024-06-01 00:00:00' AS valid_to,
           c.version, FALSE AS is_current
    FROM current c JOIN classified x
      ON c.c_custkey = x.key AND x.change_type IN ('update', 'delete')
    UNION ALL
    SELECT c.c_custkey, c.c_name, c.c_acctbal, c.valid_from, c.valid_to,
           c.version, c.is_current
    FROM current c JOIN classified x
      ON c.c_custkey = x.key AND x.change_type = 'unchanged'
    UNION ALL
    SELECT i.c_custkey, i.c_name, i.c_acctbal,
           TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           CASE WHEN x.change_type = 'update' THEN 2 ELSE 1 END AS version,
           TRUE AS is_current
    FROM incoming i JOIN classified x
      ON i.c_custkey = x.key AND x.change_type IN ('insert', 'update')
    """,
)
def scd2_apply_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close-and-insert SCD2 merge on synthetic snapshots (current =
    custkey%10≠0 @v1; incoming = custkey%10≠1 with acctbal bump for %7=0).
    Exercises operators/scd2.py:scd2_apply — the fixed MERGE semantics."""
    from ..operators.scd2 import scd2_apply

    customer = load_table(spark, sf_dir, "customer")
    current = (
        customer.filter(F.col("c_custkey") % 10 != 0)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.lit("2020-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
            F.lit(None).cast("timestamp_ntz").alias("valid_to"),
            F.lit(1).alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    incoming = customer.filter(F.col("c_custkey") % 10 != 1).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    return scd2_apply(
        current,
        incoming,
        key_cols=["c_custkey"],
        attr_cols=["c_name", "c_acctbal"],
        effective_ts="2024-06-01 00:00:00",
    )


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value / 100) AS BIGINT) AS tier
        FROM events WHERE event_type = 'purchase'
    ),
    changed AS (
        SELECT * FROM (
            SELECT user_id, ts, event_id, tier,
                   lag(tier) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS ptier
            FROM purchases
        ) WHERE ptier IS NULL OR tier <> ptier
    ),
    dim AS (
        SELECT user_id, tier, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM changed
    )
    SELECT c.event_id, c.user_id, d.tier,
           d.valid_from IS NOT NULL AS matched
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
    LEFT JOIN dim d
      ON c.user_id = d.user_id
     AND c.ts >= d.valid_from
     AND (d.valid_to IS NULL OR c.ts < d.valid_to)
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (effective-dated) dimension lookup: every click
    event joins the SCD2 version of its user's purchase tier that was
    valid AT the click's timestamp — the query pattern SCD2 history
    exists to serve, composed from the same scd2_rebuild operator the
    rebuild query registers (operators/scd2.py; reference
    dbt/macros/scd2_helpers.sql). The versioned ranges are half-open
    [valid_from, valid_to), so exactly one version matches (left join
    keeps pre-first-purchase clicks with NULL tier). The banded join is
    user-keyed first, so the range predicate only scans that user's few
    versions — same shape as operators/asof.py's range join."""
    from ..operators.scd2 import scd2_rebuild

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 100).cast("bigint").alias("tier"),
    )
    dim = scd2_rebuild(
        purchases,
        key_cols=["user_id"],
        attr_cols=["tier"],
        ts_col="ts",
        tiebreakers=["event_id"],
    ).select(
        F.col("user_id").alias("d_user"), "tier", "valid_from", "valid_to"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return clicks.join(
        dim,
        (clicks.user_id == dim.d_user)
        & (clicks.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (clicks.ts < dim.valid_to)),
        "left",
    ).select(
        "event_id",
        "user_id",
        "tier",
        F.col("valid_from").isNotNull().alias("matched"),
    )


@register(
    "ivm_join_view",
    oracle="""
    WITH wm AS (
        SELECT CAST(MAX(CAST(o_orderdate AS DATE)) - INTERVAL 12 MONTH
                    AS DATE) AS w
        FROM orders
    ),
    b_new AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 20 = 0
                    THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100
                              AS DECIMAL(18,2))
                    ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS acctbal
        FROM customer
    )
    SELECT b.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT b.c_custkey) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(SUM(b.acctbal) AS DOUBLE) AS acctbal_sum
    FROM orders o JOIN b_new b ON o.o_custkey = b.c_custkey
    GROUP BY 1
    """,
)
def ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view, verified against a
    full recompute. The view is orders JOIN customer; the maintained state
    is V_old = A_old JOIN B_old (orders up to a 12-months-back watermark,
    customers as stored). Two delta batches arrive: dA (orders after the
    watermark) and dB (every 20th customer's acctbal updated). The Spark
    side applies the textbook delta rules instead of recomputing:

        V_new = (V_old anti-join dB-keys)     -- retract stale B rows
              UNION  A_old JOIN B_delta        -- re-derive with new B
              UNION  dA JOIN B_new             -- new A against current B

    and the DuckDB oracle computes the full join on the updated inputs —
    so the hash compare IS the proof that the delta algebra equals
    recompute (reference parity: src/etl incremental strategies, which
    only maintain aggregate views; join-view IVM is the harder case).
    Output is the view folded to per-nation exact-decimal checksums.

    Scale: every leg is an equi-join on custkey — at cluster scale V_old
    and B are bucketed on custkey so all three legs co-locate and the
    retraction anti-join is map-side; dB is typically tiny and
    broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    wm = orders.agg(
        F.add_months(F.max(F.col("o_orderdate").cast("date")), -12).alias(
            "w"
        )
    )
    o = orders.crossJoin(F.broadcast(wm)).select(
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        (F.col("o_orderdate").cast("date") >= F.col("w")).alias(
            "is_delta"
        ),
    )
    a_old = o.filter(~F.col("is_delta")).drop("is_delta")
    d_a = o.filter("is_delta").drop("is_delta")

    b_old = cust.select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal"),
    )
    d_b = b_old.filter(F.col("c_custkey") % 20 == 0).withColumn(
        "acctbal",
        (F.col("acctbal") + 100).cast("decimal(18,2)"),
    )
    b_new = b_old.filter(F.col("c_custkey") % 20 != 0).unionByName(d_b)

    view_cols = ["c_custkey", "c_nationkey", "acctbal", "price"]
    v_old = a_old.join(b_old, a_old.o_custkey == b_old.c_custkey).select(
        *view_cols
    )
    # Delta rules: retract every V_old row whose B-side key changed, then
    # re-derive those keys against the new B, then join the A delta.
    retracted = v_old.join(
        d_b.select("c_custkey"), "c_custkey", "left_anti"
    )
    rederived = a_old.join(d_b, a_old.o_custkey == d_b.c_custkey).select(
        *view_cols
    )
    new_a = d_a.join(b_new, d_a.o_custkey == b_new.c_custkey).select(
        *view_cols
    )
    v_new = retracted.unionByName(rederived).unionByName(new_a)
    return v_new.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("c_custkey").cast("bigint").alias("n_custs"),
        F.sum("price").cast("double").alias("revenue"),
        F.sum("acctbal").cast("double").alias("acctbal_sum"),
    )


@register(
    "ivm_agg_view_retract",
    oracle="""
    WITH base AS (
        SELECT o_custkey % 50 AS grp, o_orderkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders
    ),
    kept AS (SELECT * FROM base WHERE o_orderkey % 10 <> 3),
    ins AS (
        SELECT grp, o_orderkey + 1000000000 AS o_orderkey,
               CAST(price + 5 AS DECIMAL(18,2)) AS price
        FROM base WHERE o_orderkey % 10 = 7
    ),
    final AS (
        SELECT * FROM kept UNION ALL SELECT * FROM ins
    )
    SELECT grp AS group_id,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM final GROUP BY 1
    """,
)
def ivm_agg_view_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an AGGREGATE view under DELETES — the
    retraction algebra ivm_join_view leaves out: the maintained view is
    per-group (count, sum(price)); a delta batch DELETES every orderkey
    ending in 3 and INSERTS a modified copy of every orderkey ending
    in 7. The Spark side never recomputes: count and sum are ABELIAN
    monoids with inverses, so

        V_new = V_old  ⊕ agg(dIns)  ⊖ agg(dDel)

    is three tiny per-group aggregates and one merge join — and groups
    whose count reaches zero are DROPPED (the part naive delta code gets
    wrong: a dangling zero-count group changes COUNT(DISTINCT group)
    downstream). The DuckDB oracle computes the full aggregate over the
    post-delta relation; the hash match proves ⊕/⊖ equals recompute.
    Deletions accumulate in exact DECIMAL, so the subtraction is
    integer-exact — no float cancellation risk.

    Scale: the deltas aggregate map-side to |groups| rows before any
    shuffle; the merge is a |groups|-keyed join. MIN/MAX (no inverse)
    need the tombstone-recompute fallback — documented, not emulated
    here."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        (F.col("o_custkey") % 50).alias("grp"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    d_del = base.filter(F.col("o_orderkey") % 10 == 3)
    d_ins = base.filter(F.col("o_orderkey") % 10 == 7).select(
        "grp",
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        (F.col("price") + 5).cast("decimal(18,2)").alias("price"),
    )

    def agg(df, n_name, s_name):
        return df.groupBy("grp").agg(
            F.count("*").cast("bigint").alias(n_name),
            F.sum("price").alias(s_name),
        )

    v_old = agg(base, "n0", "s0")
    a_ins = agg(d_ins, "ni", "si")
    a_del = agg(d_del, "nd", "sd")
    merged = (
        v_old.join(a_ins, "grp", "full_outer")
        .join(a_del, "grp", "full_outer")
        .select(
            "grp",
            (
                F.coalesce("n0", F.lit(0))
                + F.coalesce("ni", F.lit(0))
                - F.coalesce("nd", F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("s0"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("si"), F.lit(0).cast("decimal(18,2)"))
                - F.coalesce(F.col("sd"), F.lit(0).cast("decimal(18,2)"))
            ).alias("s"),
        )
        .filter(F.col("n") > 0)
    )
    return merged.select(
        F.col("grp").alias("group_id"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("s").cast("double").alias("revenue"),
    )


@register(
    "cdc_scd2_state",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id, value,
               CASE event_type WHEN 'signup' THEN 'c'
                               WHEN 'error' THEN 'd' ELSE 'u' END AS op,
               ntile(5) OVER (ORDER BY ts, event_id) AS batch
        FROM events
    ),
    lww AS (
        SELECT user_id, value, op, ts, batch
        FROM changes
        QUALIFY row_number() OVER (PARTITION BY user_id, batch
                                   ORDER BY ts DESC, event_id DESC) = 1
    ),
    seq AS (
        SELECT *, lag(op) OVER w AS p_op, lag(value) OVER w AS p_val
        FROM lww
        WINDOW w AS (PARTITION BY user_id ORDER BY batch)
    ),
    surv AS (
        -- a row changes state iff: a delete while a version is open
        -- (previous surviving state cannot be 'd'), or an upsert that is
        -- new (no predecessor), follows a delete, or changes the tracked
        -- value. Comparing against the IMMEDIATE predecessor is exact:
        -- a dropped predecessor was itself equal to the state it failed
        -- to change, transitively.
        SELECT * FROM seq
        WHERE (op = 'd' AND p_op IS NOT NULL AND p_op <> 'd')
           OR (op <> 'd' AND (p_op IS NULL OR p_op = 'd'
                              OR value IS DISTINCT FROM p_val))
    ),
    vers AS (
        SELECT user_id, value, op, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY batch)
                   AS next_ts
        FROM surv
    )
    SELECT user_id, value, ts AS valid_from, next_ts AS valid_to,
           next_ts IS NULL AS is_current
    FROM vers WHERE op <> 'd'
    """,
)
def cdc_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC -> SCD2 semantics, verified in batch: the events-
    derived change log is replayed in 5 chronological micro-batches
    through streaming/cdc_scd2.py:cdc_scd2_apply (the exact function
    foreachBatch runs), and the oracle computes the final dimension
    DIRECTLY from the full log with window functions — their equality is
    the correctness theorem for the incremental path (reference
    cdc_processor.py:43-300 feeding delta_lake_manager.py:373-416).

    The ntile(5) batch split is harness scaffolding for deterministic
    batch boundaries (a global sort at audit SF); production batching
    comes from the stream's trigger, not a sort."""
    from pyspark.sql.window import Window

    from ..streaming.cdc_scd2 import cdc_scd2_apply, scd2_empty

    events = load_table(spark, sf_dir, "events")
    changes = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.when(F.col("event_type") == "signup", "c")
            .when(F.col("event_type") == "error", "d")
            .otherwise("u")
            .alias("op"),
        )
        .withColumn(
            "batch", F.ntile(5).over(Window.orderBy("ts", "event_id"))
        )
        .localCheckpoint(eager=False)  # five batch filters reuse this
    )
    target = scd2_empty(spark, {"user_id": "BIGINT"}, {"value": "DOUBLE"})
    for b in range(1, 6):
        target = cdc_scd2_apply(
            target,
            changes.filter(F.col("batch") == b),
            key_cols=["user_id"],
            tracked_cols=["value"],
            ts_col="ts",
            tiebreak_col="event_id",
            # coalesce before materializing: the apply unions four legs,
            # so without it partition counts (and per-round task counts)
            # compound across iterations
        ).coalesce(8).localCheckpoint(eager=True)
    return target.select(
        "user_id", "value", "valid_from", "valid_to", "is_current"
    )
