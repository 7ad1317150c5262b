"""Round-9 curation wave 2: SemDeDup, DSIR importance weights,
per-source token budgeting, and training shard assignment.

These extend the LLM-pipeline surface past the r8 set with the
published-technique operators a pretraining data team runs between
"filtered" and "ready to pack":

- ``semdedup_prune`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  cluster embeddings around K centroids, then near-dup prune PAIRWISE
  ONLY WITHIN CLUSTERS — the trick that makes semantic dedup sub-
  quadratic. Deterministic variant: fixed centroids (vec_id < K), keep
  the lowest vec_id of any within-cluster pair above the cosine
  threshold.
- ``dsir_importance_weights`` — DSIR (Xie et al. 2023,
  arXiv:2302.03169): per-document log importance weight under hashed
  unigram bucket LMs of a target slice vs the raw corpus. The weight is
  what importance resampling samples by to shift the corpus toward the
  target domain.
- ``token_budget_per_source`` — per-source token budgeting: keep the
  best documents per source until a token budget is exhausted
  (cumulative window, PARTITIONED by source — deliberately not the
  global-sort shape perplexity_prune was flagged for).
- ``shard_assignment_order`` — deterministic shard + within-shard
  shuffle order by content-free key hash: the step that turns a curated
  corpus into training shards with a stable, rerun-safe sample order.

Reference parity: the reference's curation/ML-prep story routes large
corpora through engine-agnostic batch jobs (see
/root/reference/README.md engine-routing notes); these are the Spark-
first expressions of the published techniques it would host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import as_double_array, l2_norm
from ..schemas import load_table
from .catalog import register

_SEM_K = 8  # minimum centroid count; grows as floor(sqrt(n))
_SEM_TAU = 0.30  # within-cluster near-dup cosine threshold
_SEM_B = 128  # max members per pair-join shard (caps pair work at n*B)


def _cos(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    ) / (l2_norm(a) * l2_norm(b))


_SEM_COS = """
    list_dot_product({a}, {b})
    / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))
"""


def _sem_shard(vec_col, csz_col):
    """Deterministic pair-join shard within a cluster: first 16 bits of
    md5(vec_id) mod ceil(cluster_size / _SEM_B). Content-free and
    engine-portable (same md5-bucket form as shard_assignment_order);
    clusters at or under _SEM_B collapse to a single shard 0."""
    n_shards = F.ceil(
        csz_col.cast("double") / F.lit(float(_SEM_B))
    ).cast("long")
    return (
        F.conv(
            F.substring(F.md5(vec_col.cast("string")), 1, 4), 16, 10
        ).cast("long")
        % n_shards
    )


def _sem_assign_prune(emb_all, sem_in):
    """Shared SemDeDup core (registered query + curation chain): returns
    (assign, pruned) where assign = (vec_id, cluster_id,
    sim_to_centroid) and pruned = vec_ids with a smaller-id same-shard
    cluster neighbor above _SEM_TAU. Three bounded stages:

    1. TWO-LEVEL ASSIGNMENT (r12): nearest-centroid search goes through
       ceil(sqrt(K)) COARSE centroids (the lowest-id centroids, IVF
       coarse-quantizer style) — each vector picks its nearest coarse
       group (n*sqrt(K) work), then its nearest centroid WITHIN that
       group (n*K/sqrt(K) expected) — 2*n*K^0.5 total vs brute-force
       n*K. With K = sqrt(n) that cuts the assignment exponent from
       n^1.5 to n^1.25: the r11 x100 chain stress measured the
       brute-force assignment dominating SemDeDup's 118 s stage wall.
       Approximation is the IVF one (the true nearest centroid may sit
       in a different coarse group); the oracle mirrors the exact same
       closed form, so results stay value-verified.
    2. PRECOMPUTED NORMS: each side carries its l2 norm as a column, so
       per-pair cosine is one fold (dot) instead of three — measured
       2.7x on the assignment crossJoin, BIT-IDENTICAL results (the
       factored norm is the same expression subtree).
    3. SHARD CAP (r12): clusters above _SEM_B members split into
       ceil(size/_SEM_B) md5(vec_id) hash shards and pairs only form
       within a shard — pair work <= n*_SEM_B REGARDLESS of cluster
       skew (inflated near-dup corpora concentrate into giant
       clusters), at the documented cost of missing cross-shard pairs
       inside oversized clusters.

    All row-scaling joins pinned sort-merge (size estimates flip them
    at 30x otherwise — SCALE_STRESS_x30_r9wave3); the assignment output
    is localCheckpointed once (reused by the size aggregate, the pair
    join and the caller's final join)."""
    embn = emb_all.withColumn("nrm", l2_norm(F.col("v")))
    inn = sem_in.withColumn("nrm", l2_norm(F.col("v")))
    k_df = sem_in.agg(
        F.greatest(
            F.lit(_SEM_K).cast("long"),
            F.floor(F.sqrt(F.count("*"))).cast("long"),
        ).alias("k")
    )
    c_df = k_df.select(
        F.ceil(F.sqrt(F.col("k").cast("double"))).cast("long").alias("c")
    )
    cent = (
        embn.crossJoin(F.broadcast(k_df))
        .filter(F.col("vec_id") < F.col("k"))
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cvec"),
            F.col("nrm").alias("cnrm"),
        )
    )
    coarse = (
        embn.crossJoin(F.broadcast(c_df))
        .filter(F.col("vec_id") < F.col("c"))
        .select(
            F.col("vec_id").alias("coarse_id"),
            F.col("v").alias("covec"),
            F.col("nrm").alias("conrm"),
        )
    )

    def cosn(av, bv, an, bn):
        return F.round(
            F.aggregate(
                F.zip_with(av, bv, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (an * bn),
            6,
        )

    # centroid -> coarse group (K x sqrt(K) rows: metadata-scale).
    # SELF-ASSIGNMENT PIN: a centroid that IS a coarse vector belongs to
    # its own group unconditionally (cent_id < c). Without it, two
    # near-identical coarse vectors tie at 6dp (round(cos)=1.0) and the
    # ASC tiebreak empties the higher-id group of ALL centroids — any
    # vector whose nearest coarse is that group then inner-joins to zero
    # candidates and silently DROPS from assign/pruned (a row-loss the
    # mirrored oracle reproduces rather than catches). Every coarse
    # group owning its quantizer point is also the IVF invariant.
    w_c2c = Window.partitionBy("cent_id").orderBy(
        F.desc("cos"), F.asc("coarse_id")
    )
    c2c = (
        cent.crossJoin(F.broadcast(coarse))
        .select(
            "cent_id",
            "coarse_id",
            cosn(
                F.col("cvec"), F.col("covec"), F.col("cnrm"), F.col("conrm")
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w_c2c))
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(c_df))
        .select(
            "cent_id",
            F.when(F.col("cent_id") < F.col("c"), F.col("cent_id"))
            .otherwise(F.col("coarse_id"))
            .alias("coarse_id"),
        )
    )
    cent_g = cent.join(F.broadcast(c2c), "cent_id")  # K rows
    # vector -> coarse group (n x sqrt(K))
    w_v2c = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("coarse_id")
    )
    v2c = (
        inn.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "coarse_id",
            cosn(
                F.col("v"), F.col("covec"), F.col("nrm"), F.col("conrm")
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w_v2c))
        .filter(F.col("rn") == 1)
        .select("vec_id", "coarse_id")
    )
    # vector -> nearest centroid within its coarse group
    w_asg = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("cent_id")
    )
    assign = (
        inn.join(v2c.hint("merge"), "vec_id")
        .join(F.broadcast(cent_g), "coarse_id")
        .select(
            "vec_id",
            "cent_id",
            cosn(
                F.col("v"), F.col("cvec"), F.col("nrm"), F.col("cnrm")
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w_asg))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cent_id").alias("cluster_id"),
            F.col("cos").alias("sim_to_centroid"),
        )
        .localCheckpoint(eager=False)
    )
    sizes = assign.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("csz")
    )
    sharded = assign.join(F.broadcast(sizes), "cluster_id").select(
        "vec_id",
        "cluster_id",
        _sem_shard(F.col("vec_id"), F.col("csz")).alias("shard"),
    )
    withv = sharded.join(inn.hint("merge"), "vec_id")
    a = withv.select(
        F.col("cluster_id"),
        F.col("shard"),
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("a_v"),
        F.col("nrm").alias("a_n"),
    )
    b = withv.select(
        F.col("cluster_id"),
        F.col("shard"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("b_v"),
        F.col("nrm").alias("b_n"),
    )
    pruned = (
        a.join(b.hint("merge"), ["cluster_id", "shard"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            cosn(F.col("a_v"), F.col("b_v"), F.col("a_n"), F.col("b_n"))
            > _SEM_TAU
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return assign, pruned


def _sem_cte_sql(in_rel: str, all_rel: str, p: str) -> str:
    """DuckDB CTE block mirroring ``_sem_assign_prune``'s closed form:
    produces ``{p}assign`` (vec_id, cluster_id, sim_to_centroid) and
    ``{p}pruned`` (vec_id) from ``in_rel``(vec_id, v) with centroids
    drawn from ``all_rel``(vec_id, v). Every multi-referenced CTE is
    MATERIALIZED (DuckDB inlines CTEs by default and the unrolled
    references blow up exponentially otherwise)."""
    cosf = _SEM_COS.format
    return f"""
    {p}kk AS MATERIALIZED (
        SELECT greatest(CAST({_SEM_K} AS BIGINT),
                        CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS k
        FROM {in_rel}
    ),
    {p}cc AS MATERIALIZED (
        SELECT CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT) AS c
        FROM {p}kk
    ),
    {p}cent AS MATERIALIZED (
        SELECT vec_id AS cent_id, v AS cvec FROM {all_rel}, {p}kk
        WHERE vec_id < {p}kk.k
    ),
    {p}coarse AS MATERIALIZED (
        SELECT vec_id AS coarse_id, v AS covec FROM {all_rel}, {p}cc
        WHERE vec_id < {p}cc.c
    ),
    {p}c2c AS MATERIALIZED (
        -- coarse centroids self-assign (cent_id < c): every coarse
        -- group owns its quantizer point, so no group is ever empty of
        -- candidates (mirrors the Spark-side row-loss pin)
        SELECT cent_id,
               CASE WHEN cent_id < cc2.c THEN cent_id
                    ELSE coarse_id END AS coarse_id
        FROM (
            SELECT cent_id, coarse_id FROM (
                SELECT c.cent_id, g.coarse_id,
                       row_number() OVER (
                           PARTITION BY c.cent_id
                           ORDER BY round({cosf(a="c.cvec", b="g.covec")},
                                          6)
                                    DESC, g.coarse_id) AS rn
                FROM {p}cent c, {p}coarse g)
            WHERE rn = 1), {p}cc cc2
    ),
    {p}v2c AS MATERIALIZED (
        SELECT vec_id, coarse_id FROM (
            SELECT e.vec_id, g.coarse_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round({cosf(a="e.v", b="g.covec")}, 6)
                                DESC, g.coarse_id) AS rn
            FROM {in_rel} e, {p}coarse g)
        WHERE rn = 1
    ),
    {p}assign AS MATERIALIZED (
        SELECT vec_id, cent_id AS cluster_id, cos AS sim_to_centroid
        FROM (
            SELECT e.vec_id, cand.cent_id,
                   round({cosf(a="e.v", b="cand.cvec")}, 6) AS cos,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round({cosf(a="e.v", b="cand.cvec")}, 6)
                                DESC, cand.cent_id) AS rn
            FROM {in_rel} e
            JOIN {p}v2c vc ON vc.vec_id = e.vec_id
            JOIN {p}c2c cg ON cg.coarse_id = vc.coarse_id
            JOIN {p}cent cand ON cand.cent_id = cg.cent_id)
        WHERE rn = 1
    ),
    {p}sizes AS MATERIALIZED (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csz
        FROM {p}assign GROUP BY 1
    ),
    {p}sharded AS MATERIALIZED (
        SELECT a.vec_id, a.cluster_id,
               ('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 4))::BIGINT
                 % CAST(ceil(CAST(s.csz AS DOUBLE) / {_SEM_B}) AS BIGINT)
                 AS shard
        FROM {p}assign a JOIN {p}sizes s USING (cluster_id)
    ),
    {p}pruned AS MATERIALIZED (
        SELECT DISTINCT bb.vec_id
        FROM {p}sharded aa
        JOIN {p}sharded bb ON aa.cluster_id = bb.cluster_id
                          AND aa.shard = bb.shard
                          AND aa.vec_id < bb.vec_id
        JOIN {in_rel} ea ON ea.vec_id = aa.vec_id
        JOIN {in_rel} eb ON eb.vec_id = bb.vec_id
        WHERE round({cosf(a="ea.v", b="eb.v")}, 6) > {_SEM_TAU}
    )"""


@register(
    "semdedup_prune",
    oracle=f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    {_sem_cte_sql("e", "e", "")}
    SELECT a.vec_id, a.cluster_id, a.sim_to_centroid,
           CAST(CASE WHEN p.vec_id IS NULL THEN 0 ELSE 1 END AS INT)
               AS is_pruned
    FROM assign a LEFT JOIN pruned p ON p.vec_id = a.vec_id
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a deterministic keep rule: assign every vector to
    its nearest centroid (two-level IVF-style search, cosine 6dp-rounded,
    id tiebreaks), then prune any vector that has a SMALLER-id neighbor
    in the SAME cluster AND the same hash shard above the threshold.
    Scale shape is the paper's point, and all three terms are bounded —
    see ``_sem_assign_prune`` for the mechanics and measurements:

    - assignment: K = max(8, floor(sqrt(n))) centroids searched through
      ceil(sqrt(K)) coarse groups -> 2*n*sqrt(K) ~ n^1.25 work (r12;
      brute-force n*K ~ n^1.5 dominated the r11 x100 chain stress at
      118 s of the 169 s chain wall);
    - per-pair cosine: one fold, norms precomputed (bit-identical,
      measured 2.7x);
    - pair join: clusters above _SEM_B members hash-shard, capping pair
      work at n*_SEM_B regardless of cluster skew (r12; with sqrt-K
      alone, inflated near-dup corpora concentrate into giant clusters
      and the pair join went quadratic in practice).

    Centroids stay the deterministic lowest-K vec_ids; the oracle
    computes the identical closed form (coarse groups, two-level argmax,
    sizes -> ceil(csz/B) -> md5 shard), so the operator remains
    value-verified at every SF. No global sort, no driver-side model."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    assign, pruned = _sem_assign_prune(emb, emb)
    pruned = pruned.withColumn("is_pruned", F.lit(1))
    return assign.join(pruned.hint("merge"), "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        "sim_to_centroid",
        F.coalesce(F.col("is_pruned"), F.lit(0)).cast("int").alias("is_pruned"),
    )


_DSIR_B = 64  # hashed unigram bucket count
_DSIR_TARGET = "en"  # target slice: english documents

_DSIR_BUCKET_SQL = "(('0x' || substr(md5(tok), 1, 4))::BIGINT % 64)"


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    t2 AS (SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS bucket
           FROM toks WHERE tok <> ''),
    raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_r FROM t2 GROUP BY 1),
    tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_t FROM t2
            WHERE lang = '{_DSIR_TARGET}' GROUP BY 1),
    tots AS (
        SELECT (SELECT SUM(cnt_r) FROM raw) AS t_r,
               (SELECT COALESCE(SUM(cnt_t), 0) FROM tgt) AS t_t
    ),
    ratio AS (
        SELECT raw.bucket,
               ln((CAST(COALESCE(tgt.cnt_t, 0) AS DOUBLE) + 1.0)
                  / (CAST(tots.t_t AS DOUBLE) + {_DSIR_B}))
             - ln((CAST(raw.cnt_r AS DOUBLE) + 1.0)
                  / (CAST(tots.t_r AS DOUBLE) + {_DSIR_B})) AS log_ratio
        FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tots
    )
    SELECT t2.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           round(SUM(ratio.log_ratio), 6) AS log_weight
    FROM t2 JOIN ratio ON t2.bucket = ratio.bucket
    GROUP BY 1
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: log w(doc) = sum over tokens of
    ln p_target(bucket) - ln p_raw(bucket), with Laplace-smoothed hashed
    unigram bucket models (B=64, bucket = first 16 bits of md5(token)).
    Importance resampling then samples docs with probability proportional
    to w — the published recipe for shifting a raw crawl toward a target
    domain without training a classifier. Scale shape: BOTH models are
    one map-side-combinable (bucket) aggregation whose result is B rows —
    broadcast back into the token stream; per-doc weight is one shuffle
    on doc_id. Nothing global, nothing driver-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
                % _DSIR_B
            ).alias("bucket"),
        )
    )
    raw = toks.groupBy("bucket").agg(F.count("*").alias("cnt_r"))
    tgt = (
        toks.filter(F.col("lang") == _DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt_t"))
    )
    tots = raw.agg(F.sum("cnt_r").alias("t_r")).crossJoin(
        tgt.agg(F.coalesce(F.sum("cnt_t"), F.lit(0)).alias("t_t"))
    )
    # both sides are <= B rows by CONSTRUCTION (bucket aggregates), but
    # Spark estimates aggregate sizes from their inputs, so at 100x the
    # 64-row tgt side flips broadcast->SMJ without the explicit hint
    # (caught by SCALE_STRESS_x100_r9x100)
    ratio = (
        raw.join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_t"), F.lit(0)).cast("double") + 1.0)
                    / (F.col("t_t").cast("double") + F.lit(float(_DSIR_B)))
                )
                - F.log(
                    (F.col("cnt_r").cast("double") + 1.0)
                    / (F.col("t_r").cast("double") + F.lit(float(_DSIR_B)))
                )
            ).alias("log_ratio"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(F.sum("log_ratio"), 6).alias("log_weight"),
        )
    )


_BUDGET_TOKENS = 500  # per-source token budget


@register(
    "token_budget_per_source",
    oracle=f"""
    WITH scored AS (
        SELECT source, doc_id, n_chars,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                    t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budgeting: rank documents within each source
    (longest-first with doc_id tiebreak — stand-in for any quality
    rank), accumulate token counts, keep while the source's budget
    lasts. The cumulative window is PARTITIONED BY source — the
    scale-safe cousin of the global-cutoff shape perplexity_prune was
    flagged for in r8: every source sorts only its own slice, so at
    10^10 docs the widest task is the largest single source, not the
    world."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
                lambda t: t != "",
            )
        )
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
    )


_N_SHARDS = 16


@register(
    "shard_assignment_order",
    oracle=f"""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                % {_N_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                            % {_N_SHARDS}
               ORDER BY md5('ord:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS position
    FROM documents
    """,
)
def shard_assignment_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training shard assignment + within-shard shuffle order, both by
    content-free key hash: shard = 16 bits of md5(doc_id) mod N, order =
    md5('ord:'||doc_id). Hash order is a rerun-stable global shuffle —
    the property training-data loaders need so a resumed job reads the
    same sample sequence — and appends never reorder existing docs
    within a shard prefix. One window per shard partition; shards are
    the unit of parallelism at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    ordkey = F.md5(F.concat(F.lit("ord:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy(ordkey, F.asc("doc_id"))
    return (
        docs.select("doc_id", shard.alias("shard"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "position")
    )
