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

_SEM_K = 8  # fixed centroid count (vec_id < K); at 100 TB use n/1000
_SEM_TAU = 0.30  # within-cluster near-dup cosine threshold


def _cos(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    ) / (l2_norm(a) * l2_norm(b))


_SEM_COS = """
    list_dot_product({a}, {b})
    / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))
"""


@register(
    "semdedup_prune",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    kk AS (
        SELECT greatest(CAST({_SEM_K} AS BIGINT),
                        CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS k
        FROM e
    ),
    cent AS (
        SELECT vec_id AS cent_id, v AS cvec FROM e, kk
        WHERE vec_id < kk.k
    ),
    sims AS (
        SELECT e.vec_id, cent.cent_id,
               round({_SEM_COS.format(a="e.v", b="cent.cvec")}, 6) AS cos
        FROM e, cent
    ),
    assign AS (
        SELECT vec_id, cent_id AS cluster_id, cos AS sim_to_centroid
        FROM (SELECT sims.*, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
              FROM sims)
        WHERE rn = 1
    ),
    pruned AS (
        SELECT DISTINCT bb.vec_id
        FROM assign aa
        JOIN assign bb ON aa.cluster_id = bb.cluster_id
                      AND aa.vec_id < bb.vec_id
        JOIN e ea ON ea.vec_id = aa.vec_id
        JOIN e eb ON eb.vec_id = bb.vec_id
        WHERE round({_SEM_COS.format(a="ea.v", b="eb.v")}, 6) > {_SEM_TAU}
    )
    SELECT a.vec_id, a.cluster_id, a.sim_to_centroid,
           CAST(CASE WHEN p.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_pruned
    FROM assign a LEFT JOIN pruned p ON p.vec_id = a.vec_id
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a deterministic keep rule: assign every vector to
    its nearest centroid (cosine, 6dp-rounded, centroid-id tiebreak),
    then prune any vector that has a SMALLER-id neighbor in the SAME
    cluster above the threshold. Scale shape is the paper's point — and
    the centroid count must GROW with n for it to hold: K =
    max(8, floor(sqrt(n))) balances the n*K assignment term against the
    n^2/K within-cluster pair term at ~n^1.5. r10 measurement: with the
    r9 FIXED K=8, fully evaluating the pair join at 30x data (60k
    vectors) took 951 s vs 11 s at base — 83x, quadratic in practice;
    the r9 stress runs' count() action had let Spark skip far less of
    the work than assumed, so the cost was latent. sqrt-K measured
    14.5x at 30x on the same data. Centroids stay the deterministic
    lowest-K vec_ids; the oracle computes the identical closed form, so
    the operator remains value-verified at every SF. No global sort, no
    driver-side model."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    k_df = emb.agg(
        F.greatest(
            F.lit(_SEM_K).cast("long"),
            F.floor(F.sqrt(F.count("*"))).cast("long"),
        ).alias("k")
    )
    cent = (
        emb.crossJoin(F.broadcast(k_df))
        .filter(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec"))
    )
    sims = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cent_id",
        F.round(_cos(F.col("v"), F.col("cvec")), 6).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    assign = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cent_id").alias("cluster_id"),
            F.col("cos").alias("sim_to_centroid"),
        )
    )
    # The three row-scaling joins below are PINNED to sort-merge: at 30x
    # data Spark's size estimates flip them broadcast->SMJ anyway (seen in
    # SCALE_STRESS_x30_r9wave3), so fingerprint the scale shape at every
    # SF rather than letting the plan drift with the estimate.
    withv = assign.join(emb.hint("merge"), "vec_id")
    a = withv.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("a_v"),
    )
    b = withv.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("b_v"),
    )
    pruned = (
        a.join(b.hint("merge"), "cluster_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(_cos(F.col("a_v"), F.col("b_v")), 6) > _SEM_TAU)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_pruned", F.lit(1))
    )
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
