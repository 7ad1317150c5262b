"""Marketing-attribution queries over the events stream (beyond-reference).

The reference's behavioral layer stops at funnels and cohort buckets
(src/etl/gold/spark_gold.py:169-198); revenue attribution is the natural
next ask of the same event stream. Two standard models:

- attribution_last_touch   each purchase's revenue credits the LAST
  non-purchase touchpoint the user hit before buying ('direct' when none).
- attribution_first_touch  all of a user's purchase revenue credits the
  user's very first touchpoint (acquisition-channel view).

Scale posture: both are one user-keyed window (single shuffle on user_id,
~events/user rows per partition) followed by a low-cardinality hash
aggregate on channel (map-side combined). No self-joins, no driver state.
Float parity: purchase values aggregate as DECIMAL(18,2) and convert to
double once (see plans/_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from .catalog import register


@register(
    "attribution_last_touch",
    oracle="""
    WITH touched AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_channel
        FROM events
    )
    SELECT COALESCE(prev_channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS attributed_revenue
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    preceding non-purchase event type of the same user (ts, event_id
    total order), 'direct' when the purchase is the user's first touch.
    One window + one tiny aggregate — a single user_id shuffle."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = events.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("prev_channel"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("prev_channel", F.lit("direct")).alias("channel")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
    )


@register(
    "attribution_first_touch",
    oracle="""
    WITH seq AS (
        SELECT event_type, value,
               first_value(event_type)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS first_channel
        FROM events
    )
    SELECT first_channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS attributed_revenue
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch (acquisition) attribution: every purchase a user makes
    credits the user's first-ever event type. Same single-shuffle shape as
    last-touch; the window is unbounded-preceding first_value, which Spark
    evaluates without buffering the full frame."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        "value",
        F.first("event_type").over(w).alias("first_channel"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("first_channel")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
    )


@register(
    "attribution_path_removal",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touched AS (
        SELECT DISTINCT e.user_id, e.event_type AS channel
        FROM events e JOIN conv c ON e.user_id = c.user_id
        WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
    ),
    per_channel AS (
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_paths_with
        FROM touched GROUP BY 1
    ),
    totals AS (
        SELECT CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_conv,
               CAST(SUM(n_paths_with) AS BIGINT) AS touch_total
        FROM per_channel
    )
    SELECT p.channel, t.n_conv, p.n_paths_with,
           ROUND(CAST(p.n_paths_with AS DOUBLE) / t.n_conv, 6)
               AS removal_share,
           ROUND(CAST(p.n_paths_with AS DOUBLE) / t.touch_total, 6)
               AS weight
    FROM per_channel p, totals t
    """,
)
def attribution_path_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-removal attribution: for each channel, the share of converting
    users whose pre-conversion path contains that channel (the conversions
    'at risk' if the channel were removed — the path-counting
    approximation of a Markov removal effect), plus weights normalized
    across channels. Complements first/last-touch above: position-blind,
    whole-path credit.

    One shuffle to first-purchase times, one distinct over (user, channel)
    — the path never materializes as a string, so arbitrarily long
    histories cost nothing extra. Exact integer counts; two IEEE
    divisions on identical operands."""
    events = load_table(spark, sf_dir, "events")
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touched = (
        events.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
    )
    per_channel = touched.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_paths_with")
    )
    totals = per_channel.agg(
        F.sum("n_paths_with").cast("bigint").alias("touch_total")
    ).crossJoin(conv.agg(F.count("*").cast("bigint").alias("n_conv")))
    return per_channel.crossJoin(F.broadcast(totals)).select(
        "channel",
        "n_conv",
        "n_paths_with",
        F.round(
            F.col("n_paths_with").cast("double") / F.col("n_conv"), 6
        ).alias("removal_share"),
        F.round(
            F.col("n_paths_with").cast("double") / F.col("touch_total"), 6
        ).alias("weight"),
    )


_TD_HALFLIFE_S = 7 * 86400  # 7-day half-life


@register(
    "attribution_position_models",
    oracle=f"""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touches AS (
        SELECT e.user_id, e.event_type AS channel, e.ts, e.event_id,
               c.first_purchase
        FROM events e JOIN conv c ON e.user_id = c.user_id
        WHERE e.event_type <> 'purchase' AND e.ts < c.first_purchase
    ),
    ranked AS (
        SELECT user_id, channel, ts, first_purchase,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM touches
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    credited AS (
        SELECT user_id, channel,
               CASE WHEN n = 1 THEN 1.0
                    WHEN n = 2 THEN 0.5
                    WHEN rn = 1 OR rn = n THEN 0.4
                    ELSE 0.2 / (n - 2) END AS u_credit,
               pow(2.0, 0.0 - CAST(date_diff('microsecond', ts,
                                             first_purchase) AS DOUBLE)
                             / (1000000.0 * {_TD_HALFLIFE_S})) AS w_raw
        FROM ranked
    ),
    norm AS (
        SELECT user_id, CAST(SUM(w_raw) AS DOUBLE) AS z
        FROM credited GROUP BY 1
    )
    SELECT c.channel,
           CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
           round(SUM(c.u_credit), 6) AS u_shaped_credit,
           round(SUM(c.w_raw / n.z), 6) AS time_decay_credit
    FROM credited c JOIN norm n ON c.user_id = n.user_id
    GROUP BY 1
    """,
)
def attribution_position_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two canonical attribution models the family was missing:
    U-shaped / position-based (40% first touch, 40% last, 20% split over
    the middle — degenerate paths of 1-2 touches get 1.0 / 0.5-0.5) and
    time-decay (2^(-age/7d) per touch, normalized per converting user),
    credited per channel over each user's pre-first-purchase touchpoints.
    Together with first/last-touch and the removal-effect model this
    completes the standard attribution suite; model disagreement per
    channel is the usual robustness read.

    One user-keyed window family (position, count) + one normalization
    aggregate + one channel rollup — two shuffles over the touch
    projection. Credits are closed-form per row; the per-channel float
    sums cross engines at ~1e-13 relative, far under the 6-dp pin."""
    events = load_table(spark, sf_dir, "events")
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = (
        events.join(conv, "user_id")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("ts") < F.col("first_purchase"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("channel"),
            "ts",
            "event_id",
            "first_purchase",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    ranked = touches.select(
        "user_id",
        "channel",
        "ts",
        "first_purchase",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(wu).cast("bigint").alias("n"),
    )
    age_us = (
        F.unix_micros(F.col("first_purchase").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ).cast("double")
    credited = ranked.select(
        "user_id",
        "channel",
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
        .alias("u_credit"),
        F.pow(
            F.lit(2.0),
            F.lit(0.0) - age_us / F.lit(1000000.0 * _TD_HALFLIFE_S),
        ).alias("w_raw"),
    )
    norm = credited.groupBy("user_id").agg(
        F.sum("w_raw").cast("double").alias("z")
    )
    return (
        credited.join(norm, "user_id")
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_touchpoints"),
            F.round(F.sum("u_credit"), 6).alias("u_shaped_credit"),
            F.round(F.sum(F.col("w_raw") / F.col("z")), 6).alias(
                "time_decay_credit"
            ),
        )
    )


# Fixed channel→bit map for the Shapley coalition lattice. The events
# stream has exactly these four non-purchase touch types; the map is
# hardcoded (not data-derived) so the lattice is stable across SFs.
_SHAP_BITS = {"click": 1, "error": 2, "signup": 4, "view": 8}
_SHAP_N = 4  # |channels|; Shapley weights are s!(n-1-s)!/n! = k/24


@register(
    "attribution_shapley",
    oracle="""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    touched AS (
        SELECT DISTINCT e.user_id, e.event_type AS channel
        FROM events e JOIN conv c ON e.user_id = c.user_id
        WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
    ),
    user_mask AS (
        SELECT user_id,
               CAST(SUM(CASE channel WHEN 'click' THEN 1 WHEN 'error' THEN 2
                        WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END)
                    AS BIGINT) AS m
        FROM touched GROUP BY 1
    ),
    mask_counts AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt FROM user_mask GROUP BY 1
    ),
    coalitions AS (SELECT CAST(s AS BIGINT) AS s FROM generate_series(0, 15) t(s)),
    v AS (
        SELECT c.s, CAST(COALESCE(SUM(mc.cnt), 0) AS BIGINT) AS v_s
        FROM coalitions c
        LEFT JOIN mask_counts mc ON (mc.m & c.s) = mc.m
        GROUP BY c.s
    ),
    channels AS (
        SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
                              ('error', CAST(2 AS BIGINT)),
                              ('signup', CAST(4 AS BIGINT)),
                              ('view', CAST(8 AS BIGINT))) t(channel, bit)
    ),
    contrib AS (
        SELECT ch.channel,
               CAST(SUM((CASE bit_count(vs.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                         WHEN 2 THEN 2 ELSE 6 END)
                        * (vsb.v_s - vs.v_s)) AS BIGINT) AS phi_x24
        FROM channels ch
        JOIN v vs ON (vs.s & ch.bit) = 0
        JOIN v vsb ON vsb.s = (vs.s | ch.bit)
        GROUP BY 1
    ),
    total AS (SELECT v_s AS v_full FROM v WHERE s = 15)
    SELECT c.channel,
           CAST(c.phi_x24 AS DOUBLE) / 24.0 AS shapley_conversions,
           CAST(c.phi_x24 AS DOUBLE) / (24.0 * t.v_full) AS shapley_share
    FROM contrib c CROSS JOIN total t
    """,
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over the 4-channel coalition
    lattice: phi_i = sum over coalitions S not containing i of
    s!(n-1-s)!/n! * (v(S+i) - v(S)), with the characteristic function
    v(S) = number of converting users whose pre-first-purchase channel
    set is contained in S. Completes the attribution suite past the
    heuristic models (first/last/U/time-decay) and the removal-effect
    approximation with the game-theoretically fair split.

    Exactness: with n=4 the weights are {6,2,2,6}/24, so phi*24 is
    computed entirely in BIGINT (no float accumulation order to
    diverge); the single final division is bit-identical cross-engine.
    Scale posture: two user_id shuffles reduce the event stream to a
    <=15-row mask histogram; the lattice itself (16 coalitions x 4
    channels) is constant-size broadcast work regardless of input SF.
    Reference intent: marketing attribution atop the same event stream
    as src/etl/gold/spark_gold.py's behavioral layer."""
    events = load_table(spark, sf_dir, "events")
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    bit_expr = F.create_map(
        *[x for k, v in _SHAP_BITS.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("channel")]
    user_mask = (
        events.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
        .groupBy("user_id")
        .agg(F.sum(bit_expr).cast("bigint").alias("m"))
    )
    mask_counts = user_mask.groupBy("m").agg(F.count("*").cast("bigint").alias("cnt"))
    coalitions = spark.range(16).select(F.col("id").cast("bigint").alias("s"))
    v = (
        coalitions.join(
            mask_counts, F.expr("(m & s) = m"), "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("v_s"))
    )
    channels = spark.createDataFrame(
        [(k, b) for k, b in _SHAP_BITS.items()], "channel string, bit bigint"
    )
    weight = (
        F.when(F.bit_count(F.col("vs.s")) == 0, 6)
        .when(F.bit_count(F.col("vs.s")) == 1, 2)
        .when(F.bit_count(F.col("vs.s")) == 2, 2)
        .otherwise(6)
    )
    contrib = (
        channels.join(v.alias("vs"), F.expr("(vs.s & bit) = 0"))
        .join(v.alias("vsb"), F.expr("vsb.s = (vs.s | bit)"))
        .groupBy("channel")
        .agg(
            F.sum(weight * (F.col("vsb.v_s") - F.col("vs.v_s")))
            .cast("bigint")
            .alias("phi_x24")
        )
    )
    total = v.filter(F.col("s") == 15).select(F.col("v_s").alias("v_full"))
    return contrib.crossJoin(total).select(
        "channel",
        (F.col("phi_x24").cast("double") / F.lit(24.0)).alias(
            "shapley_conversions"
        ),
        (
            F.col("phi_x24").cast("double")
            / (F.lit(24.0) * F.col("v_full"))
        ).alias("shapley_share"),
    )
