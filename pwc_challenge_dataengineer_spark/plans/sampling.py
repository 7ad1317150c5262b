"""Deterministic sampling + distribution-shape operators — the corpus-curation
half of a training-data pipeline (extending SURVEY §2's quality/profiling
family; reference analog: the profiling/suitability checks of
src/etl/spark/data_profiler.py, plus the sampling every dataset-curation run
needs but the reference leaves to ad-hoc SQL).

- stratified_sample_docs  per-stratum hash sampling with different rates per
  stratum (md5 bucket — shuffle-free, RNG-free, append-stable, the same
  idiom as the train/val/test split in plans/text_dedup.py).
- per_key_event_sample    deterministic "reservoir" of 3 events per user
  (row_number over an md5 ordering — a seeded random sample that is
  reproducible across engines and reruns).
- event_type_entropy      Shannon entropy of each user's event-type
  distribution — the behavioral-diversity feature used for bot filtering
  and stratification.

Scale posture: the hash sample is a pure filter (pushes to the scan, zero
shuffle); the per-key sample is one window over the user-partitioned
ordering (single shuffle on user_id); entropy is a two-level groupBy whose
first level map-side combines to |users|x|types| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table
from .catalog import register

# Per-stratum sampling rates in tenths: src0 keeps 3/10, everything else 1/10.
_RATES_SQL = "CASE WHEN source = 'src0' THEN 3 ELSE 1 END"


def _md5_bucket_sql(key: str, mod: int) -> str:
    return f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {mod}"


def _md5_bucket(col: F.Column, mod: int) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % mod


@register(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, source,
           CAST({_md5_bucket_sql('doc_id', 10)} AS INT) AS bucket
    FROM documents
    WHERE {_md5_bucket_sql('doc_id', 10)} < {_RATES_SQL}
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sample of the documents corpus: 30% of src0, 10% of
    every other source. The md5 bucket is a pure column expression, so the
    sample is a filter over the scan — no shuffle, no RNG state, and the
    same rows survive when the corpus is appended to (hash depends only on
    doc_id). At 100 TB this is the only sampling shape that is both
    reproducible and restart-safe."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _md5_bucket(F.col("doc_id"), 10)
    rate = F.when(F.col("source") == "src0", 3).otherwise(1)
    return (
        docs.select("doc_id", "source", bucket.cast("int").alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


@register(
    "per_key_event_sample",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        FROM events
    )
    SELECT user_id, event_id, event_type, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def per_key_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key sample: 3 events per user, chosen by ordering
    on md5(event_id) — statistically uniform (hash is independent of any
    event attribute) yet fully reproducible, unlike rand()-based reservoir
    sampling. One window over the user_id partitioning; at scale this is a
    single shuffle and the per-partition sort early-outs after rank 3 via
    the rank filter (WindowGroupLimit pushes rn <= 3 into the sort)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "event_type_entropy",
    oracle="""
    WITH cnt AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM cnt GROUP BY 1
    )
    SELECT t.user_id, t.total, t.n_types,
           round(COALESCE(-SUM(
               (CAST(c.c AS DOUBLE) / t.total)
               * ln(CAST(c.c AS DOUBLE) / t.total)), 0.0), 6) AS entropy
    FROM cnt c JOIN tot t USING (user_id)
    GROUP BY 1, 2, 3
    """,
)
def event_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type distribution, plus
    total event count and distinct-type count. Two-level aggregation: the
    (user, type) counts map-side combine, so the entropy pass sees at most
    |users| x |event types| rows. The float sum runs over <=|event types|
    terms (~5), so cross-order error is ~1e-15 — far below the 6dp round.
    Low entropy with high volume is the classic bot / scripted-traffic
    signature used to filter behavioral training data."""
    events = load_table(spark, sf_dir, "events")
    cnt = events.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("user_id").agg(
        F.sum("c").alias("total"), F.count("*").alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("total")
    return (
        cnt.join(tot, "user_id")
        .groupBy("user_id", "total", "n_types")
        .agg(
            F.round(
                F.coalesce(-F.sum(p * F.log(p)), F.lit(0.0)), 6
            ).alias("entropy")
        )
    )


# Target corpus mix by source family: src0 is "high quality" and should be
# 40% of the training mix; the rest split evenly.
_MIX_SQL = "CASE WHEN source = 'src0' THEN 0.40 ELSE 0.15 END"


@register(
    "corpus_mix_rates",
    oracle=f"""
    WITH per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM per_source)
    SELECT p.source, p.n_docs, p.n_chars,
           round(CAST({_MIX_SQL} AS DOUBLE), 6) AS target_share,
           round(CAST(p.n_docs AS DOUBLE) / t.n, 6) AS current_share,
           round(LEAST(1.0, {_MIX_SQL} * t.n / p.n_docs), 6) AS keep_rate,
           ({_MIX_SQL} * t.n / p.n_docs) > 1.0 AS needs_upsampling
    FROM per_source p CROSS JOIN tot t
    """,
)
def corpus_mix_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing planner: given a target share per source family, derive
    the per-source keep rate that turns the observed corpus composition
    into the target mix (the step between quality scoring and sampling in
    every pretraining pipeline — the computed keep_rate feeds the
    stratified hash sampler above). Sources whose target exceeds their
    supply are flagged needs_upsampling instead of silently capping the
    mix. One tiny aggregation; the rate table is a broadcast input to the
    actual sampling pass at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    tot = per_source.agg(F.sum("n_docs").alias("n"))
    target = F.when(F.col("source") == "src0", F.lit(0.40)).otherwise(
        F.lit(0.15)
    )
    raw_rate = target * F.col("n") / F.col("n_docs")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(target, 6).alias("target_share"),
        F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias(
            "current_share"
        ),
        F.round(F.least(F.lit(1.0), raw_rate), 6).alias("keep_rate"),
        (raw_rate > 1.0).alias("needs_upsampling"),
    )


@register(
    "importance_sample_docs",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS weight,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM documents
    )
    SELECT doc_id, round(weight, 6) AS weight,
           h < weight * 4294967296.0 AS kept
    FROM feats
    """,
)
def importance_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted (importance) sampling: each document is kept with
    probability equal to its lexical-diversity score, decided by comparing
    a 32-bit md5 hash of the doc id against weight * 2^32 — deterministic,
    seedless, append-stable (re-running over a grown corpus never flips
    prior decisions, unlike rand()). This is how a pretraining pipeline
    downsamples low-quality text without an RNG coordination problem
    across 1000 executors: the decision is a pure column expression on
    each row. The weight itself is a count/count division, identical in
    both engines, so even the boundary comparisons hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    weight = F.size(F.array_distinct(words)).cast("double") / F.size(words)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return docs.select(
        "doc_id",
        F.round(weight, 6).alias("weight"),
        (h < weight * F.lit(4294967296.0)).alias("kept"),
    )


_U24 = 16777216.0  # 2^24 — md5-derived uniform resolution


@register(
    "weighted_sample_per_source",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                                   1, 6))::BIGINT + 0.5) / {_U24})
                   / CAST(n_chars AS DOUBLE) AS es_key
        FROM documents
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY source ORDER BY es_key DESC, doc_id) AS rnk
        FROM keyed
    )
    SELECT doc_id, source, n_chars, round(es_key, 9) AS es_key,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 2
    """,
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 2 docs per source, weight =
    n_chars — the Efraimidis–Spirakis A-ES scheme: each item draws a key
    u^(1/w) (equivalently ln(u)/w, compared the same way) and the top-k
    keys ARE a weighted sample without replacement. The uniform u comes
    from an md5 of the doc id, so the sample is deterministic, replayable
    in the oracle, and append-stable (new docs can only displace, never
    reshuffle, survivors). This is the distributed-sampling workhorse for
    corpus mixing: one window per stratum, no RNG state, no driver
    coordination; at 100 TB the rank filter is a per-stratum top-k that
    WindowGroupLimit prunes inside each partition sort."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("ws"), F.col("doc_id").cast("string"))),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    es_key = F.log((h + F.lit(0.5)) / F.lit(_U24)) / F.col("n_chars").cast(
        "double"
    )
    w = Window.partitionBy("source").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 2)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("es_key", 9).alias("es_key"),
            "rnk",
        )
    )


_REBAL_GRAN = 10000  # hash-gate granularity for computed sampling rates


@register(
    "corpus_rebalance_rates",
    oracle=f"""
    WITH per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM per_source
    ),
    rates AS (
        SELECT s.source, s.n_docs,
               CAST(LEAST(
                   {_REBAL_GRAN},
                   CAST(floor(CAST(t.n_total AS DOUBLE) / t.n_sources
                              / s.n_docs * {_REBAL_GRAN}) AS BIGINT)
               ) AS BIGINT) AS gate
        FROM per_source s CROSS JOIN tot t
    ),
    kept AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE {_md5_bucket_sql('d.doc_id', _REBAL_GRAN)} < r.gate
        GROUP BY 1
    )
    SELECT r.source, r.n_docs, r.gate,
           COALESCE(k.n_kept, 0) AS n_kept,
           round(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / r.n_docs, 6)
               AS realized_rate
    FROM rates r LEFT JOIN kept k ON k.source = r.source
    """,
)
def corpus_rebalance_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-DEPENDENT downsampling to a target mix: compute each source's
    keep-rate from the observed distribution (target = equal share per
    source; over-represented sources get rate target/n, under-represented
    keep everything), quantize the rate to a 1/10000 hash gate, and apply
    it as the same md5-bucket filter stratified_sample_docs uses. Emits the
    per-source plan AND the realized counts, so the rate computation, the
    gate arithmetic, and the deterministic filter are all value-pinned.
    This is the two-pass shape of every corpus-mix rebalance at 100 TB:
    pass 1 is a map-side-combined count per source (tiny result,
    broadcast), pass 2 a pure scan-side filter — no shuffle of the corpus
    itself, restart-safe, append-stable."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per_source.agg(
        F.sum("n_docs").alias("n_total"), F.count("*").alias("n_sources")
    )
    rates = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(_REBAL_GRAN).cast("bigint"),
            F.floor(
                F.col("n_total").cast("double")
                / F.col("n_sources")
                / F.col("n_docs")
                * _REBAL_GRAN
            ).cast("bigint"),
        ).alias("gate"),
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(_md5_bucket(F.col("doc_id"), _REBAL_GRAN) < F.col("gate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "gate",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.round(
            F.coalesce("n_kept", F.lit(0)).cast("double") / F.col("n_docs"), 6
        ).alias("realized_rate"),
    )


_MIX_ALPHA = 0.3  # multinomial temperature for low-resource upsampling


@register(
    "source_mix_diagnostics",
    oracle=f"""
    WITH toks AS (
        SELECT d.source, unnest(string_split_regex(lower(trim(d.text)),
                                                   '\\s+')) AS tok
        FROM documents d
    ),
    t2 AS (SELECT source, tok FROM toks WHERE tok <> ''),
    st AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM t2 GROUP BY 1, 2
    ),
    s_tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
    g AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cg FROM st GROUP BY 1),
    g_tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS n_g FROM g),
    kl AS (
        SELECT st.source,
               SUM((CAST(st.c AS DOUBLE) / s_tot.n_s)
                   * ln((CAST(st.c AS DOUBLE) / s_tot.n_s)
                        / (CAST(g.cg AS DOUBLE) / g_tot.n_g))) AS kl_bits
        FROM st
        JOIN s_tot ON st.source = s_tot.source
        JOIN g ON st.tok = g.tok
        CROSS JOIN g_tot
        GROUP BY 1
    ),
    w AS (
        SELECT source, n_s,
               power(CAST(n_s AS DOUBLE), {_MIX_ALPHA}) AS raw_w
        FROM s_tot
    ),
    w_tot AS (SELECT SUM(raw_w) AS z FROM w)
    SELECT w.source, w.n_s AS n_tokens,
           round(CAST(w.n_s AS DOUBLE)
                 / (SELECT CAST(SUM(n_s) AS DOUBLE) FROM s_tot), 6)
               AS token_share,
           round(w.raw_w / w_tot.z, 6) AS alpha_weight,
           round(kl.kl_bits, 6) AS kl_to_corpus
    FROM w CROSS JOIN w_tot JOIN kl ON kl.source = w.source
    """,
)
def source_mix_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-mix diagnostics for multilingual/multi-domain
    training: token share, the temperature-scaled sampling weight
    w_s ∝ n_s^0.3 (the multinomial alpha-smoothing used to upsample
    low-resource sources), and the KL divergence of each source's unigram
    distribution from the corpus distribution (domain shift — sources with
    high KL are the ones a mixing change actually affects). KL sums per
    (source, tok) over the |sources|x|vocab| aggregate — map-side combined,
    with the corpus marginals broadcast; at 100 TB nothing here scales with
    corpus size except the one token-count pass."""
    docs = load_table(spark, sf_dir, "documents")
    t2 = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    st = t2.groupBy("source", "tok").agg(F.count("*").alias("c"))
    s_tot = st.groupBy("source").agg(F.sum("c").alias("n_s"))
    g = st.groupBy("tok").agg(F.sum("c").alias("cg"))
    g_tot = g.agg(F.sum("cg").alias("n_g"))
    kl = (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(g), "tok")
        .crossJoin(F.broadcast(g_tot))
        .groupBy("source")
        .agg(
            F.sum(
                (F.col("c").cast("double") / F.col("n_s"))
                * F.log(
                    (F.col("c").cast("double") / F.col("n_s"))
                    / (F.col("cg").cast("double") / F.col("n_g"))
                )
            ).alias("kl_bits")
        )
    )
    w = s_tot.select(
        "source",
        "n_s",
        F.pow(F.col("n_s").cast("double"), F.lit(_MIX_ALPHA)).alias("raw_w"),
    )
    w_tot = w.agg(F.sum("raw_w").alias("z"))
    total = s_tot.agg(F.sum("n_s").cast("double").alias("nt"))
    return (
        w.crossJoin(F.broadcast(w_tot))
        .crossJoin(F.broadcast(total))
        .join(kl, "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.round(F.col("n_s").cast("double") / F.col("nt"), 6).alias(
                "token_share"
            ),
            F.round(F.col("raw_w") / F.col("z"), 6).alias("alpha_weight"),
            F.round("kl_bits", 6).alias("kl_to_corpus"),
        )
    )


_COV_PICKS = 4


def _coverage_oracle() -> str:
    shingles = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
        WHERE len(t) >= 3
    ),
    rem0 AS (SELECT doc_id, shingle FROM sh)"""
    rounds = []
    for r in range(1, _COV_PICKS + 1):
        rounds.append(f"""
    g{r} AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
        FROM rem{r - 1} GROUP BY 1
    ),
    p{r} AS MATERIALIZED (
        SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1
    ),
    rem{r} AS MATERIALIZED (
        SELECT s.doc_id, s.shingle FROM rem{r - 1} s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM p{r})
          AND s.shingle NOT IN (
              SELECT r.shingle FROM rem{r - 1} r
              JOIN p{r} ON r.doc_id = p{r}.doc_id
          )
    )""")
    picks = "\n    UNION ALL\n".join(
        f"    SELECT {r} AS pick_rank, doc_id, gain FROM p{r}"
        for r in range(1, _COV_PICKS + 1)
    )
    return (
        shingles
        + ","
        + ",".join(rounds)
        + f""",
    picks AS (
{picks}
    )
    SELECT CAST(pick_rank AS INT) AS pick_rank, doc_id, gain,
           CAST(SUM(gain) OVER (ORDER BY pick_rank) AS BIGINT)
               AS covered_total
    FROM picks
    """
    )


@register("coverage_greedy_docs", oracle=_coverage_oracle())
def coverage_greedy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage document selection: pick 4 documents, each
    round taking the one whose 3-gram shingles add the most NOT-yet-covered
    shingles (ties to the lowest doc_id) — the submodular data-selection
    primitive behind "choose the K most informative documents" corpus
    curation (facility-location / coreset selection), complementing the
    REMOVAL side of curation in the dedup family.

    Each round is: one hash aggregate over the remaining (doc, shingle)
    pairs, a top-1 (TakeOrderedAndProject — no global sort), and two
    anti-joins that shrink the remaining set (picked doc's rows + its
    newly covered shingles, both against a 1-row broadcast). Rounds are
    lazily checkpointed so round r's three consumers reuse one
    materialization instead of recomputing the chain. At 100 TB the same
    loop runs with per-round stochastic-greedy candidate sampling
    (GreeDi-style partition-then-merge) — the per-round shape is already
    the distributed one: nothing driver-side, gains never materialize the
    covered set per candidate. The pick's gain IS its newly covered count,
    so cumulative coverage is a 4-row running sum at the end;
    integer-exact throughout."""
    from ..functions.dedup_fuzzy import exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    remaining = (
        exploded_shingles(docs, "doc_id", "text", k=3)
        .distinct()
        .localCheckpoint(eager=False)
    )
    picks = None
    for r in range(1, _COV_PICKS + 1):
        g = remaining.groupBy("doc_id").agg(
            F.count("*").cast("bigint").alias("gain")
        )
        p = g.orderBy(F.desc("gain"), F.asc("doc_id")).limit(1)
        p = p.localCheckpoint(eager=False)  # 3 consumers: picks + 2 anti-joins
        pick_r = p.select(
            F.lit(r).cast("int").alias("pick_rank"), "doc_id", "gain"
        )
        picks = pick_r if picks is None else picks.unionByName(pick_r)
        cov_r = remaining.join(
            F.broadcast(p.select("doc_id")), "doc_id"
        ).select("shingle")
        remaining = (
            remaining.join(F.broadcast(p.select("doc_id")), "doc_id", "left_anti")
            .join(F.broadcast(cov_r), "shingle", "left_anti")
            .localCheckpoint(eager=False)
        )
    w = Window.orderBy("pick_rank").rowsBetween(Window.unboundedPreceding, 0)
    return picks.select(
        "pick_rank",
        "doc_id",
        "gain",
        F.sum("gain").over(w).cast("bigint").alias("covered_total"),
    )


_NEG_K = 2          # negatives kept per anchor
_NEG_DRAWS = 4      # deterministic candidates drawn before rejection


@register(
    "contrastive_negatives",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    idx_map AS MATERIALIZED (
        SELECT doc_id, source,
               CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
        FROM documents
    ),
    draws AS (
        SELECT a.doc_id AS anchor, a.source AS anchor_source, d.j,
               ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR) || '#'
                                   || CAST(d.j AS VARCHAR)), 1, 8))::BIGINT
                   % n.n_docs AS neg_idx
        FROM idx_map a
        CROSS JOIN (SELECT unnest(range(0, {_NEG_DRAWS})) AS j) d
        CROSS JOIN n
    ),
    cand AS (
        SELECT dr.anchor, dr.j, m.doc_id AS neg_doc_id, m.source AS neg_source
        FROM draws dr JOIN idx_map m ON dr.neg_idx = m.idx
        WHERE m.doc_id <> dr.anchor AND m.source <> dr.anchor_source
    ),
    ranked AS (
        SELECT anchor, neg_doc_id, neg_source,
               CAST(row_number() OVER (PARTITION BY anchor ORDER BY j)
                    AS INT) AS neg_rank
        FROM cand
    )
    SELECT anchor AS doc_id, neg_rank, neg_doc_id, neg_source
    FROM ranked WHERE neg_rank <= {_NEG_K}
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each anchor document draws 4 hash-derived candidate indices into the
    corpus (md5 of anchor#draw — reproducible across reruns and engines,
    the same RNG-free idiom as the split/sampling family) and keeps the
    first 2 that survive rejection (not the anchor itself, not the
    anchor's own source — the cheap same-domain proxy for 'too easy /
    possibly duplicate'). Bounded deterministic rejection replaces the
    usual draw-until-accept loop, which doesn't distribute.

    One broadcast of the (idx -> doc) map… at corpus scale that map IS
    the corpus, so the real join is shuffle hash on neg_idx = idx — a
    single equi-join; candidate fan-out is a constant x4. Rejection
    under-fill (an anchor with < 2 surviving candidates) is possible by
    construction and identical in both engines — the training loader
    treats it as a short pair list, not an error."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    idx_map = docs.select(
        "doc_id",
        "source",
        (
            F.row_number().over(Window.orderBy("doc_id")).cast("bigint") - 1
        ).alias("idx"),
    ).localCheckpoint(eager=False)  # 2 consumers (anchors + negatives)
    draws_j = spark.range(0, _NEG_DRAWS).select(F.col("id").cast("int").alias("j"))
    draws = (
        idx_map.select(
            F.col("doc_id").alias("anchor"),
            F.col("source").alias("anchor_source"),
        )
        .crossJoin(F.broadcast(draws_j))
        .crossJoin(F.broadcast(n))
        .select(
            "anchor",
            "anchor_source",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "#",
                                F.col("anchor").cast("string"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n_docs")
            ).alias("neg_idx"),
        )
    )
    cand = draws.join(
        idx_map.select(
            F.col("idx").alias("neg_idx"),
            F.col("doc_id").alias("neg_doc_id"),
            F.col("source").alias("neg_source"),
        ),
        "neg_idx",
    ).filter(
        (F.col("neg_doc_id") != F.col("anchor"))
        & (F.col("neg_source") != F.col("anchor_source"))
    )
    ranked = cand.select(
        "anchor",
        "neg_doc_id",
        "neg_source",
        F.row_number()
        .over(Window.partitionBy("anchor").orderBy("j"))
        .cast("int")
        .alias("neg_rank"),
    )
    return ranked.filter(F.col("neg_rank") <= _NEG_K).select(
        F.col("anchor").alias("doc_id"), "neg_rank", "neg_doc_id", "neg_source"
    )


def _raking_sql(orders: str, customer: str, nation: str) -> str:
    """Shared 2-round IPF raking SQL body (identical on both engines)."""
    return f"""
    WITH pop AS (
        SELECT n_name AS nat, c_mktsegment AS seg, c_custkey
        FROM {customer} JOIN {nation} ON c_nationkey = n_nationkey
    ),
    popc AS (
        SELECT nat, seg, CAST(COUNT(*) AS BIGINT) AS n FROM pop GROUP BY 1, 2
    ),
    popn AS (SELECT nat, CAST(SUM(n) AS BIGINT) AS n FROM popc GROUP BY 1),
    pops AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS n FROM popc GROUP BY 1),
    popt AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM popc),
    active AS (
        SELECT DISTINCT o_custkey FROM {orders}
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    ),
    sampc AS (
        SELECT p.nat, p.seg, CAST(COUNT(*) AS BIGINT) AS n
        FROM pop p JOIN active a ON p.c_custkey = a.o_custkey
        GROUP BY 1, 2
    ),
    sampn AS (SELECT nat, CAST(SUM(n) AS BIGINT) AS n FROM sampc GROUP BY 1),
    sampt AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM sampc),
    r1 AS (
        SELECT sc.nat, sc.seg, sc.n,
               (CAST(pn.n AS DOUBLE) / pt.n)
                 / (CAST(sn.n AS DOUBLE) / st.n) AS w1
        FROM sampc sc
        JOIN popn pn ON sc.nat = pn.nat
        JOIN sampn sn ON sc.nat = sn.nat
        CROSS JOIN popt pt CROSS JOIN sampt st
    ),
    segw AS (
        SELECT seg, SUM(w1 * n) AS wn FROM r1 GROUP BY 1
    ),
    segtot AS (SELECT SUM(wn) AS wt FROM segw),
    r2 AS (
        SELECT r1.nat, r1.seg, r1.n,
               r1.w1 * ((CAST(ps.n AS DOUBLE) / pt.n)
                        / (sw.wn / stot.wt)) AS w2
        FROM r1
        JOIN pops ps ON r1.seg = ps.seg
        JOIN segw sw ON r1.seg = sw.seg
        CROSS JOIN popt pt CROSS JOIN segtot stot
    )
    SELECT r2.nat AS nation, r2.seg AS segment,
           r2.n AS n_sample,
           round(r2.w2, 6) AS rake_weight,
           round(r2.w2 * r2.n / st.n
                 - CAST(pc.n AS DOUBLE) / pt.n, 6) AS cell_share_gap
    FROM r2
    JOIN popc pc ON r2.nat = pc.nat AND r2.seg = pc.seg
    CROSS JOIN popt pt CROSS JOIN sampt st
    """


@register(
    "raking_ipf_weights",
    oracle=_raking_sql("orders", "customer", "nation"),
)
def raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-style raking (iterative proportional fitting, two unrolled
    rounds): calibrate weights for a behaviorally biased subsample
    (customers active in 1997H2) so its weighted nation margin, then its
    segment margin, match the full-population margins — the
    post-stratification correction analytics teams apply before reading
    a biased panel as if it were the population. Emits the per-cell
    weight after both adjustments plus the residual cell-share gap
    (raking matches MARGINS; the per-cell gap shows what the margins
    alone cannot fix).

    Shape: three grouped counts + margin joins over the 125-cell
    nation x segment grid — all broadcast-sized after one fact pass and
    one dim pass. Margin ratios are exact divisions; the weighted-margin
    sums cross 25 cells, so outputs carry the 6-dp pin."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rk_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "rk_customer"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("rk_nation")
    return spark.sql(_raking_sql("rk_orders", "rk_customer", "rk_nation"))
