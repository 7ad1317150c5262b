"""Text retrieval / corpus-analysis operators over the documents table —
TF-IDF term weighting, BM25 keyword scoring, and benchmark-contamination
detection (LLM training-data hygiene, extending the SURVEY §2 text-analysis
family; reference analog: the text-quality rules of the silver layer,
src/etl/spark/enhanced_silver.py quality scoring, generalized to the
retrieval-style scoring every pretraining corpus pipeline runs).

- tfidf_top_terms        sklearn-style smoothed TF-IDF, top-3 terms per doc.
- bm25_keyword_search    Okapi BM25 (k1=1.2, b=0.75) for a fixed query-term
  set, scored as ordered column additions (no float-sum reordering).
- contamination_overlap  fraction of each candidate doc's distinct 5-gram
  shingles that appear in a held-out "benchmark" subset — the standard
  train/test contamination check.

Scale posture: everything is explode→groupBy with map-side partial
aggregation; document-frequency and corpus-stat tables are tiny (|vocab|,
1 row) and broadcast into the scoring join. The benchmark shingle set in the
contamination check is the held-out corpus — orders of magnitude smaller
than the training corpus — so its join side is broadcast; at 100 TB the
candidate side streams through without a shuffle on the shingle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table
from .catalog import register

# One tokenizer, byte-identical on both engines.
_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


def _toks(df: DataFrame) -> DataFrame:
    """(doc_id, tok) rows, empty tokens dropped."""
    return (
        df.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, df.df,
               (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0) * tf.tf AS score
        FROM tf JOIN df USING (tok) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
        FROM scored
    )
    SELECT doc_id, tok, tf, df, round(score, 6) AS tfidf,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((1+N)/(1+df))+1,
    sklearn convention). tf and df collapse in map-side combined groupBys;
    the |vocab|-sized df table and the 1-row corpus count are broadcast, so
    scoring adds no shuffle beyond the (doc,tok) aggregation. Ranking ties
    (identical tf and df) break on the term itself, deterministically."""
    docs = load_table(spark, sf_dir, "documents")
    tf = _toks(docs).groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = (
        F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
        + F.lit(1.0)
    ) * F.col("tf")
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", "tf", "df", score.alias("score"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round("score", 6).alias("tfidf"),
            "rnk",
        )
    )


# Fixed query-term set for the BM25 demo (ordered — scores sum in this order).
_BM25_TERMS = ("spark", "query", "join", "fast")
_K1, _B = 1.2, 0.75


@register(
    "bm25_keyword_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    qdf AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        WHERE tok IN {_BM25_TERMS!r} GROUP BY 1
    ),
    qtf AS (
        SELECT doc_id,
               {" , ".join(
                   f"COALESCE(MAX(CASE WHEN tok = '{t}' THEN tf END), 0)"
                   f" AS tf_{t}" for t in _BM25_TERMS)}
        FROM tf WHERE tok IN {_BM25_TERMS!r} GROUP BY 1
    ),
    scored AS (
        SELECT q.doc_id, d.dl,
               {" + ".join(
                   f"(ln(1.0 + (c.n_docs - idf_{t}.df + 0.5) / (idf_{t}.df + 0.5))"
                   f" * (q.tf_{t} * ({_K1} + 1.0))"
                   f" / (q.tf_{t} + {_K1} * (1.0 - {_B} + {_B} * d.dl / c.avgdl)))"
                   for t in _BM25_TERMS)} AS score
        FROM qtf q
        JOIN dl d USING (doc_id)
        CROSS JOIN corpus c
        {" ".join(
            f"LEFT JOIN qdf idf_{t} ON idf_{t}.tok = '{t}'"
            for t in _BM25_TERMS)}
    )
    SELECT doc_id, dl, round(score, 6) AS bm25
    FROM scored WHERE score > 0
    """,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 score of every document against the fixed query
    {spark, query, join, fast}. Per-term contributions are materialized as
    separate columns (conditional aggregation) and added in a fixed order,
    so the float sum is order-deterministic across engines and partitions —
    a plain SUM over an exploded term join would not be. Corpus stats
    (n_docs, avgdl) and per-term document frequencies are 1-row / 4-row
    broadcasts; dl comes from the same (doc,tok) aggregate as tf."""
    parts = _bm25_parts(load_table(spark, sf_dir, "documents"))
    return (
        parts["scored"]
        .filter(F.col("score") > 0)
        .select("doc_id", "dl", F.round("score", 6).alias("bm25"))
    )


def _bm25_parts(docs: DataFrame) -> dict:
    """Shared BM25 machinery: returns tf / dl / corpus / scored (scored
    carries the UNROUNDED fixed-order score over _BM25_TERMS plus dl).
    Used by bm25_keyword_search and prf_query_expansion."""
    # tf feeds four downstream aggregations (dl, corpus stats, per-term
    # df, per-doc qtf) — materialize it once instead of re-running the
    # tokenize+count shuffle per consumer (15 exchanges -> 6 measured).
    tf = (
        _toks(docs)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        # eager=False: materialize on the first action, not at plan-build
        # time — keeps the registry's lazy contract while still computing
        # the tokenize+count shuffle once for all four consumers.
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qtf_rows = tf.filter(F.col("tok").isin(*_BM25_TERMS))
    qdf = qtf_rows.groupBy("tok").agg(F.count("*").alias("df"))
    qtf = qtf_rows.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("tok") == t, F.col("tf"))), F.lit(0)
            ).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ]
    )
    # df per query term as 1-row broadcast columns (left joins on constants).
    scored = qtf.join(dl, "doc_id").crossJoin(F.broadcast(corpus))
    for t in _BM25_TERMS:
        scored = scored.join(
            F.broadcast(
                qdf.filter(F.col("tok") == t).select(
                    F.col("df").alias(f"df_{t}")
                )
            ),
            how="left",
        )
    term_score = None
    for t in _BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        contrib = (
            idf
            * (F.col(f"tf_{t}") * F.lit(_K1 + 1.0))
            / (
                F.col(f"tf_{t}")
                + F.lit(_K1)
                * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        term_score = contrib if term_score is None else term_score + contrib
    return {
        "tf": tf,
        "dl": dl,
        "corpus": corpus,
        "scored": scored.select("doc_id", "dl", term_score.alias("score")),
    }


_SHINGLE_K = 5
_SHINGLES_SQL = (
    f"list_transform(range(1, len(toks) - {_SHINGLE_K - 2}),"
    f" i -> array_to_string(toks[i:i+{_SHINGLE_K - 1}], ' '))"
)


@register(
    "contamination_overlap",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_TOKS_SQL} AS toks, doc_id % 50 = 0 AS is_bench
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, is_bench, unnest({_SHINGLES_SQL}) AS shingle
        FROM base
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE is_bench),
    cand AS (
        SELECT s.doc_id, s.shingle, b.shingle IS NOT NULL AS hit
        FROM sh s LEFT JOIN bench b USING (shingle)
        WHERE NOT s.is_bench
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS contamination_ratio,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               > 0.5 AS flagged
    FROM cand GROUP BY 1
    """,
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every candidate document, the
    fraction of its distinct 5-gram word shingles that also occur in the
    held-out benchmark subset (here doc_id % 50 == 0). Candidates with >50%
    overlap are flagged for removal — the standard decontamination pass
    before pretraining. The benchmark shingle set is broadcast (held-out
    sets are tiny relative to the corpus), so candidates stream map-side;
    the only shuffle is the per-doc count aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("toks"),
        (F.col("doc_id") % 50 == 0).alias("is_bench"),
    )
    shingles = F.expr(
        f"transform(sequence(1, size(toks) - {_SHINGLE_K - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {_SHINGLE_K})))"
    )
    sh = (
        base.select("doc_id", "is_bench", F.explode(shingles).alias("shingle"))
        .distinct()
    )
    bench = (
        sh.filter("is_bench").select("shingle").distinct()
        .withColumn("hit", F.lit(True))
    )
    cand = (
        sh.filter(~F.col("is_bench"))
        .join(F.broadcast(bench), "shingle", "left")
        .select("doc_id", F.coalesce("hit", F.lit(False)).alias("hit"))
    )
    n_hit = F.sum(F.when(F.col("hit"), 1).otherwise(0))
    return cand.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        n_hit.alias("n_contaminated"),
        F.round(n_hit.cast("double") / F.count("*"), 6).alias(
            "contamination_ratio"
        ),
        (n_hit.cast("double") / F.count("*") > 0.5).alias("flagged"),
    )


_CHUNK, _STRIDE = 64, 48


@register(
    "doc_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    starts AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {_STRIDE})) AS s
        FROM t
    )
    SELECT doc_id,
           CAST((s - 1) / {_STRIDE} AS INT) AS chunk_idx,
           CAST(least({_CHUNK}, len(toks) - s + 1) AS INT) AS n_tok,
           md5(array_to_string(toks[s:s+{_CHUNK - 1}], ' ')) AS chunk_hash
    FROM starts
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking ({_CHUNK}-token windows, stride
    {_STRIDE}) — the standard pretraining prep step that turns documents
    into training sequences. Chunk starts are a sequence() per doc (one
    narrow explode, no shuffle at all: everything is per-row), and the
    chunk content is emitted as an md5 fingerprint so the result stays
    compact at any scale while still pinning every token of every chunk
    through the hash compare."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("toks")
    )
    starts = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(f"sequence(1, size(toks), {_STRIDE})")
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.size("toks") - F.col("s") + 1)
        .cast("int")
        .alias("n_tok"),
        F.md5(F.concat_ws(" ", F.expr(f"slice(toks, s, {_CHUNK})"))).alias(
            "chunk_hash"
        ),
    )


@register(
    "bigram_lift",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks
    ),
    bg AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM bigrams GROUP BY 1
    ),
    uni AS (
        SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks, unnest(t) AS u(tok) GROUP BY 1
    ),
    totals AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_tok,
               (SELECT CAST(SUM(c_ab) AS BIGINT) FROM bg) AS n_big
        FROM uni
    )
    SELECT bigram, c_ab,
           (CAST(c_ab AS DOUBLE) / n_big)
           / ((CAST(a.c AS DOUBLE) / n_tok) * (CAST(b.c AS DOUBLE) / n_tok))
               AS lift
    FROM bg
    JOIN uni a ON a.tok = string_split(bigram, ' ')[1]
    JOIN uni b ON b.tok = string_split(bigram, ' ')[2]
    CROSS JOIN totals
    WHERE c_ab >= 10
    """,
)
def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: corpus-wide bigram lift
    p(ab) / (p(a)*p(b)) — the ratio form of PMI (no log, so every float
    op is a division/multiply of identical integer-derived doubles and
    the statistic hash-matches; taking log would hit libm's 1-ulp
    nondeterminism across engines). Bigrams come from a higher-order
    array transform over the token array (no UDF, no per-row Python);
    unigram and bigram counts are two hash aggregates, and the final
    lift join touches only the >=10-count survivors. At 100 TB the
    bigram vocabulary is the only state that grows; the threshold prunes
    before the join, and a CMS sketch (cms_event_counts pattern) is the
    fallback when even that vocabulary must be bounded."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), " ").alias("t"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram")
    )
    bg = bigrams.groupBy("bigram").agg(F.count("*").cast("bigint").alias("c_ab"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    totals = uni.agg(F.sum("c").cast("bigint").alias("n_tok")).crossJoin(
        bg.agg(F.sum("c_ab").cast("bigint").alias("n_big"))
    )
    first_tok = F.element_at(F.split(F.col("bigram"), " "), 1)
    second_tok = F.element_at(F.split(F.col("bigram"), " "), 2)
    a = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    b = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    return (
        bg.filter(F.col("c_ab") >= 10)
        .join(F.broadcast(a), first_tok == F.col("tok_a"))
        .join(F.broadcast(b), second_tok == F.col("tok_b"))
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            "c_ab",
            (
                (F.col("c_ab").cast("double") / F.col("n_big"))
                / (
                    (F.col("c_a").cast("double") / F.col("n_tok"))
                    * (F.col("c_b").cast("double") / F.col("n_tok"))
                )
            ).alias("lift"),
        )
    )


@register(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    counts AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks WHERE tok <> '' GROUP BY 1
    ),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
    top AS (
        SELECT tok, n,
               CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
        FROM counts
        QUALIFY row_number() OVER (ORDER BY n DESC, tok) <= 100
    )
    SELECT t.rank, t.tok, t.n,
           round(CAST(t.n AS DOUBLE) / tt.n_total, 6) AS share,
           round(CAST(SUM(t.n) OVER (ORDER BY t.rank
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / tt.n_total, 6) AS cum_share
    FROM top t, total tt
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head of the corpus vocabulary: top-100 tokens with frequency
    share and cumulative coverage — the diagnostic behind vocabulary-size /
    tokenizer decisions (how much of the corpus do the first N types
    cover?). Scale shape: one explode → token groupBy (map-side combined),
    then the GLOBAL window runs only on the top-100 slice (orderBy+limit —
    a parallel TakeOrdered, never a full-vocab single-partition window);
    the 1-row total broadcasts. Deterministic tiebreak (count desc, token)
    keeps the rank-100 cut identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    counts = _toks(docs).groupBy("tok").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    top = counts.orderBy(F.col("n").desc(), "tok").limit(100)
    w_rank = Window.orderBy(F.col("n").desc(), "tok")
    cum = (
        Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        top.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "tok",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_total"), 6).alias(
                "share"
            ),
            F.round(
                F.sum("n").over(cum).cast("double") / F.col("n_total"), 6
            ).alias("cum_share"),
        )
    )


@register(
    "unigram_lm_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t,
               CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        FROM t2
    ),
    nll AS (
        SELECT t2.doc_id,
               -ln((CAST(vc.cnt AS DOUBLE) + 1.0)
                   / (CAST(tot.t AS DOUBLE) + CAST(tot.v AS DOUBLE))) AS nll
        FROM t2 JOIN vc USING (tok) CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
           round(AVG(nll), 6) AS avg_nll,
           round(exp(AVG(nll)), 4) AS unigram_ppl
    FROM nll GROUP BY 1
    """,
)
def unigram_lm_score(
    spark: SparkSession,
    sf_dir: str,
    toked: DataFrame | None = None,
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram language
    model (Laplace-smoothed: p(tok) = (cnt+1)/(T+V)) — the cheap stand-in
    for the KenLM perplexity filter every pretraining pipeline runs: docs
    whose tokens are atypical for the corpus score a high avg_nll /
    perplexity and get routed to review or downweighting. Scale shape: one
    (tok) aggregation with map-side combine builds the |vocab|-row LM,
    which broadcasts into the token stream; the per-doc average is a
    single shuffle on doc_id. Training the LM and scoring against it are
    the SAME two-pass job at 100 TB — no driver-side model object.

    ``toked``: optional (doc_id, t) pre-split token-array frame (the
    curation chain's shared tokenize barrier); explode+filter here is
    row-identical to _toks. Default None keeps the standalone plan."""
    if toked is not None:
        toks = toked.select(
            "doc_id", F.explode("t").alias("tok")
        ).filter(F.col("tok") != "")
    else:
        docs = load_table(spark, sf_dir, "documents")
        toks = _toks(docs)
    vc = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # T and V fall out of the |vocab|-row LM itself — no extra pass over
    # the token stream, and no global count_distinct shuffle
    tot = vc.agg(F.sum("cnt").alias("t"), F.count("*").alias("v"))
    nll = (
        toks.join(F.broadcast(vc), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.col("cnt").cast("double") + F.lit(1.0))
                    / (F.col("t").cast("double") + F.col("v").cast("double"))
                )
            ).alias("nll"),
        )
    )
    return nll.groupBy("doc_id").agg(
        F.count("*").alias("n_toks"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), 4).alias("unigram_ppl"),
    )


_RRF_K = 60  # standard reciprocal-rank-fusion damping constant
_RRF_COS_SQL = """
    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
"""


def _rrf_oracle() -> str:
    from .catalog import ORACLES

    return f"""
    WITH lex_all AS ({ORACLES["bm25_keyword_search"]}),
    lex AS (
        SELECT doc_id, rank_lex FROM (
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                        AS INT) AS rank_lex
            FROM lex_all
        ) WHERE rank_lex <= 20
    ),
    sem AS (
        SELECT doc_id, rank_sem FROM (
            SELECT c.vec_id AS doc_id,
                   CAST(row_number() OVER (
                       ORDER BY round({_RRF_COS_SQL}, 6) DESC, c.vec_id)
                        AS INT) AS rank_sem
            FROM embeddings q, embeddings c
            WHERE q.vec_id = 0 AND c.vec_id <> 0
        ) WHERE rank_sem <= 20
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               CAST(COALESCE(l.rank_lex, 0) AS INT) AS rank_lex,
               CAST(COALESCE(s.rank_sem, 0) AS INT) AS rank_sem,
               COALESCE(1.0 / ({_RRF_K} + l.rank_lex), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + s.rank_sem), 0.0) AS rrf
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, rank_lex, rank_sem, rrf_score, rrf_rank FROM (
        SELECT doc_id, rank_lex, rank_sem, round(rrf, 9) AS rrf_score,
               CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
                   AS rrf_rank
        FROM fused
    ) WHERE rrf_rank <= 10
    """


@register("hybrid_search_rrf", oracle=_rrf_oracle())
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 lexical top-20
    (the registered bm25_keyword_search scoring) and the embedding-cosine
    semantic top-20 (query = vector 0; the synthetic vec_id domain doubles
    as the doc id) merge as score = Σ 1/(60+rank) over the lists a doc
    appears in — the standard fusion for BM25+dense rankers, needing no
    score calibration between the two scales. Docs in only one list keep
    their single term (rank 0 marks absence). Scale shape: each arm ends in
    an orderBy().limit(20) — a distributed TakeOrdered, never a global
    window over the corpus — and the fusion join touches ≤ 40 rows."""
    from pyspark.sql.window import Window

    from ..functions.similarity import cosine_topk_brute
    from ..schemas import load_table as _lt

    lex_top = (
        bm25_keyword_search(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("rank_lex")
    )
    emb = _lt(spark, sf_dir, "embeddings")
    sem = cosine_topk_brute(
        emb.filter(F.col("vec_id") == 0), emb, id_col="vec_id",
        vec_col="embedding", k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_sem"))
    # Fusion as union + groupBy-max rather than a full-outer join: full
    # outer can't broadcast, so Spark planned the only sort-merge join in
    # the repo for two <= 20-row inputs. The union aggregate is join-free
    # (rank 0 marks absence, exactly the oracle's COALESCE semantics).
    fused = (
        lex.select("doc_id", "rank_lex", F.lit(0).alias("rank_sem"))
        .unionByName(
            sem.select("doc_id", F.lit(0).alias("rank_lex"), "rank_sem")
        )
        .groupBy("doc_id")
        .agg(
            F.max("rank_lex").cast("int").alias("rank_lex"),
            F.max("rank_sem").cast("int").alias("rank_sem"),
        )
        .select(
            "doc_id",
            "rank_lex",
            "rank_sem",
            (
                F.when(
                    F.col("rank_lex") > 0,
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lex")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("rank_sem") > 0,
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_sem")),
                ).otherwise(F.lit(0.0))
            ).alias("rrf"),
        )
    )
    w_rrf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w_rrf).cast("int"))
        .filter(F.col("rrf_rank") <= 10)
        .select(
            "doc_id",
            "rank_lex",
            "rank_sem",
            F.round("rrf", 9).alias("rrf_score"),
            "rrf_rank",
        )
    )


_LM_LAMBDA = 0.7  # bigram weight in the interpolated model


@register(
    "bigram_lm_score",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),
    toks AS (
        SELECT doc_id, unnest(t) AS tok FROM d
    ),
    t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM uni
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM d WHERE len(t) >= 2) q
    ),
    bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS bcnt
        FROM bg GROUP BY 1, 2
    ),
    scored AS (
        SELECT g.doc_id,
               -ln({_LM_LAMBDA} * (CAST(b.bcnt AS DOUBLE) - 1.0 + 1.0)
                       / (CAST(u1.cnt AS DOUBLE) + tot.v)
                   + {1.0 - _LM_LAMBDA}
                       * (CAST(u2.cnt AS DOUBLE) + 1.0)
                       / (CAST(tot.t AS DOUBLE) + tot.v)) AS nll
        FROM bg g
        JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
        JOIN uni u1 ON g.w1 = u1.tok
        JOIN uni u2 ON g.w2 = u2.tok
        CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(AVG(nll), 6) AS avg_nll,
           round(exp(AVG(nll)), 4) AS bigram_ppl
    FROM scored GROUP BY 1
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring — the step up from
    unigram_lm_score toward the KenLM quality filter: per-bigram
    probability is lambda * p_bigram + (1-lambda) * p_unigram_laplace,
    where the bigram term uses add-one-ish smoothing against the history
    count ((bcnt-1+1)/(cnt_w1 + V) — written exactly that way so BOTH
    engines fold the identical arithmetic) and the unigram back-off is
    the same Laplace model unigram_lm_score certifies. Scale shape: the
    bigram table is a (w1, w2) aggregate with map-side combine —
    vocab²-bounded, not corpus-bounded — and joins back to the bigram
    stream by hash; per-doc averaging is one shuffle on doc_id. Training
    and scoring remain a single distributed job with no model object."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
    )
    toks = d.select("doc_id", F.explode("t").alias("tok")).filter(
        F.col("tok") != ""
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = uni.agg(F.sum("cnt").alias("t"), F.count("*").alias("v"))
    bg = d.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("bcnt"))
    lam = F.lit(_LM_LAMBDA)
    scored = (
        bg.join(F.broadcast(bi), ["w1", "w2"])
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("cnt").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (
                -F.log(
                    lam
                    * (F.col("bcnt").cast("double") - F.lit(1.0) + F.lit(1.0))
                    / (F.col("c1").cast("double") + F.col("v"))
                    + (F.lit(1.0) - lam)
                    * (F.col("c2").cast("double") + F.lit(1.0))
                    / (F.col("t").cast("double") + F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), 4).alias("bigram_ppl"),
    )


@register(
    "vocab_growth_curve",
    oracle=f"""
    WITH toks0 AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    toks AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''),
    w AS (
        SELECT CAST(CEIL((MAX(doc_id) + 1) / 100.0) AS BIGINT) AS wd
        FROM documents
    ),
    bt AS (
        SELECT CAST(FLOOR(t.doc_id / w.wd) AS BIGINT) AS bucket,
               COUNT(*) AS toks_n
        FROM toks t, w GROUP BY 1
    ),
    ft AS (SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY 1),
    nt AS (
        SELECT CAST(FLOOR(f.fd / w.wd) AS BIGINT) AS bucket,
               COUNT(*) AS types_n
        FROM ft f, w GROUP BY 1
    ),
    db AS (
        SELECT CAST(FLOOR(d.doc_id / w.wd) AS BIGINT) AS bucket,
               COUNT(*) AS docs_n
        FROM documents d, w GROUP BY 1
    ),
    cum AS (
        SELECT db.bucket,
               CAST(SUM(db.docs_n) OVER cw AS BIGINT) AS cum_docs,
               CAST(SUM(COALESCE(bt.toks_n, 0)) OVER cw AS BIGINT)
                   AS cum_tokens,
               CAST(SUM(COALESCE(nt.types_n, 0)) OVER cw AS BIGINT)
                   AS cum_types
        FROM db
        LEFT JOIN bt USING (bucket)
        LEFT JOIN nt USING (bucket)
        WINDOW cw AS (ORDER BY db.bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT bucket, cum_docs, cum_tokens, cum_types,
           ROUND(ln(CAST(cum_types AS DOUBLE))
                 / ln(CAST(cum_tokens AS DOUBLE)), 6) AS heaps_beta
    FROM cum
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct token types vs
    cumulative token count, sampled at ~100 doc-id checkpoints, with the
    empirical Heaps exponent beta = ln(types)/ln(tokens) at each point —
    the diagnostic behind tokenizer vocab sizing (is the corpus's type
    growth saturating, i.e. beta falling, or still open-vocabulary?).

    Cumulative-distinct is computed distributively: each type is charged to
    the bucket of its FIRST occurrence (min doc_id per token — one
    map-side-combined groupBy), so the running distinct count is a plain
    cumulative sum of per-bucket first-occurrence counts. The only window
    runs over <= 100 bucket rows regardless of corpus size; everything else
    is explode -> groupBy. All counts are exact integers; the exponent is
    one IEEE log-division on identical operands."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    wd = docs.agg(
        F.ceil((F.max("doc_id") + 1) / 100.0).cast("bigint").alias("wd")
    )
    toks = _toks(docs).crossJoin(F.broadcast(wd))
    bucket = F.floor(F.col("doc_id") / F.col("wd")).cast("bigint")
    bt = toks.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("toks_n")
    )
    ft = toks.groupBy("tok").agg(
        F.min("doc_id").alias("fd"), F.first("wd").alias("wd")
    )
    nt = ft.groupBy(
        F.floor(F.col("fd") / F.col("wd")).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("types_n"))
    db = (
        docs.crossJoin(F.broadcast(wd))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("docs_n"))
    )
    cw = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        db.join(bt, "bucket", "left")
        .join(nt, "bucket", "left")
        .select(
            "bucket",
            F.sum("docs_n").over(cw).cast("bigint").alias("cum_docs"),
            F.sum(F.coalesce("toks_n", F.lit(0)))
            .over(cw)
            .cast("bigint")
            .alias("cum_tokens"),
            F.sum(F.coalesce("types_n", F.lit(0)))
            .over(cw)
            .cast("bigint")
            .alias("cum_types"),
        )
    )
    return cum.select(
        "bucket",
        "cum_docs",
        "cum_tokens",
        "cum_types",
        F.round(
            F.log(F.col("cum_types").cast("double"))
            / F.log(F.col("cum_tokens").cast("double")),
            6,
        ).alias("heaps_beta"),
    )


@register(
    "inverted_index_build",
    oracle=f"""
    WITH toks0 AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    toks AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''),
    postings AS (
        SELECT tok,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(SUM(1) AS BIGINT) AS cf,
               (array_agg(DISTINCT doc_id ORDER BY doc_id))[1:50]
                   AS plist
        FROM toks GROUP BY tok
    )
    SELECT tok, df, cf,
           array_to_string(plist, ',') AS postings_head_csv
    FROM postings
    """,
)
def inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: per token, document frequency, collection
    frequency, and the head of the sorted postings list (first 50 doc ids,
    serialized CSV per the array-agg determinism convention) — the build
    step behind bm25_keyword_search's scoring statistics.

    Scale posture: one explode -> token groupBy (map-side combined). The
    head cap bounds the per-token payload, which is exactly how a
    distributed index build handles hot tokens: postings beyond the cap
    land in further doc-id-range segments (the same sharding shape
    streaming/dedup_stream.py uses for its signature store) rather than
    one unbounded row. All values are exact integers/strings."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _toks(docs)
        .groupBy("tok")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("df"),
            F.count("*").cast("bigint").alias("cf"),
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 50),
            ).alias("postings_head_csv"),
        )
    )


@register(
    "term_cooccurrence_pmi",
    oracle=f"""
    WITH toks0 AS (
        SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    toks AS (SELECT doc_id, tok FROM toks0 WHERE tok <> ''),
    df AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
    ),
    vocab AS (
        SELECT tok, c FROM df ORDER BY c DESC, tok LIMIT 50
    ),
    vt AS (
        SELECT t.doc_id, t.tok, v.c FROM toks t JOIN vocab v USING (tok)
    ),
    co AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               a.c AS c_a, b.c AS c_b,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM vt a JOIN vt b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT tok_a, tok_b, c_ab,
           ROUND(ln(CAST(c_ab AS DOUBLE) * n.n_docs
                    / (CAST(c_a AS DOUBLE) * c_b)), 6) AS pmi
    FROM co, n
    WHERE c_ab >= 5
    """,
)
def term_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level term co-occurrence PMI over the top-50-df vocabulary:
    pmi(a,b) = ln(P(a,b) / (P(a)P(b))) with probabilities as document
    frequencies — the query-expansion / related-terms signal that
    complements bigram_lift's ADJACENT-pair association (this one is
    position-blind within the document).

    The vocabulary cap is the scale contract: restricting to the top-50
    terms bounds the per-document pair fan-out at C(50,2) regardless of
    document length, and the candidate pair space at 1225 rows regardless
    of corpus size — the same bounded-payload discipline as
    inverted_index_build's postings cap. The cap's cut is deterministic
    ((df DESC, token) ordering). Exact integer counts; one log of a
    ratio of identical operands."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks(docs).distinct()
    df = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    vocab = df.orderBy(F.desc("c"), F.asc("tok")).limit(50)
    vt = toks.join(F.broadcast(vocab), "tok")
    a = vt.select(
        "doc_id", F.col("tok").alias("tok_a"), F.col("c").alias("c_a")
    )
    b = vt.select(
        "doc_id", F.col("tok").alias("tok_b"), F.col("c").alias("c_b")
    )
    co = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "c_a", "c_b")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    return co.crossJoin(F.broadcast(n)).select(
        "tok_a",
        "tok_b",
        "c_ab",
        F.round(
            F.log(
                F.col("c_ab").cast("double")
                * F.col("n_docs")
                / (F.col("c_a").cast("double") * F.col("c_b"))
            ),
            6,
        ).alias("pmi"),
    )


# --- Full production retrieval chain: ANN -> RRF -> MMR (round 5) ----------

_CHAIN_LAM = 0.7
_CHAIN_CAND = 10
_CHAIN_OUT = 5


def _chain_oracle() -> str:
    """ANN (PQ-ADC) semantic arm + BM25 lexical arm -> reciprocal-rank
    fusion -> greedy MMR over the fused top-10, all as one SQL chain:
    the PQ CTEs come verbatim from pq_adc_topk's oracle, the fusion from
    hybrid_search_rrf's, and the MMR unroll from mmr_diverse_topk's, with
    relevance = min-max-normalized RRF score (both retrieval arms emit
    ranks, not calibrated scores, so the normalized fusion score is the
    only scale MMR can mix with cosine redundancy)."""
    from .catalog import ORACLES
    from .similarity import PQ_CTES

    sql = f"""
    WITH {PQ_CTES},
    sem AS (
        SELECT neighbor_id AS doc_id, rank_sem FROM (
            SELECT neighbor_id,
                   CAST(row_number() OVER (ORDER BY approx_d2, neighbor_id)
                        AS INT) AS rank_sem
            FROM scored
        ) WHERE rank_sem <= 20
    ),
    lex_all AS ({ORACLES["bm25_keyword_search"]}),
    lex AS (
        SELECT doc_id, rank_lex FROM (
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                        AS INT) AS rank_lex
            FROM lex_all
        ) WHERE rank_lex <= 20
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(1.0 / ({_RRF_K} + l.rank_lex), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + s.rank_sem), 0.0) AS rrf
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    ),
    cand0 AS (
        SELECT doc_id AS cid, rrf, rrf_rank FROM (
            SELECT doc_id, rrf,
                   CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
                        AS INT) AS rrf_rank
            FROM fused
        ) WHERE rrf_rank <= {_CHAIN_CAND}
    ),
    bounds AS (SELECT MAX(rrf) AS mx, MIN(rrf) AS mn FROM cand0),
    cand AS MATERIALIZED (
        SELECT cid, rrf, rrf_rank,
               round(CASE WHEN b.mx = b.mn THEN 1.0
                          ELSE (rrf - b.mn) / (b.mx - b.mn) END, 9) AS rel
        FROM cand0, bounds b
    ),
    psim AS MATERIALIZED (
        SELECT a.vec_id AS ca, b.vec_id AS cb,
               round({_RRF_COS_SQL
                      .replace("q.embedding", "a.embedding")
                      .replace("c.embedding", "b.embedding")}, 6) AS sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id IN (SELECT cid FROM cand)
          AND b.vec_id IN (SELECT cid FROM cand)
          AND a.vec_id <> b.vec_id
    ),
    s1 AS (
        SELECT cid, rrf, rrf_rank, rel, 1 AS step, rel AS mmr
        FROM cand ORDER BY rel DESC, cid LIMIT 1
    )"""
    for t in range(2, _CHAIN_OUT + 1):
        p = t - 1
        sql += f""",
    sc{t} AS (
        SELECT c.cid, c.rrf, c.rrf_rank, c.rel,
               {_CHAIN_LAM} * c.rel - {round(1 - _CHAIN_LAM, 10)}
                     * MAX(p.sim) AS score
        FROM cand c
        JOIN psim p ON p.ca = c.cid
        JOIN s{p} s ON p.cb = s.cid
        WHERE c.cid NOT IN (SELECT cid FROM s{p})
        GROUP BY c.cid, c.rrf, c.rrf_rank, c.rel
    ),
    pick{t} AS (
        SELECT cid, rrf, rrf_rank, rel, {t} AS step, score AS mmr
        FROM sc{t} ORDER BY score DESC, cid LIMIT 1
    ),
    s{t} AS (SELECT * FROM s{p} UNION ALL SELECT * FROM pick{t})"""
    sql += f"""
    SELECT CAST(step AS INT) AS rank, cid AS doc_id,
           CAST(rrf_rank AS INT) AS rrf_rank,
           round(rrf, 9) AS rrf_score, rel AS relevance, mmr AS mmr_score
    FROM s{_CHAIN_OUT}"""
    return sql


@register("retrieval_chain_pq_rrf_mmr", oracle=_chain_oracle())
def retrieval_chain_pq_rrf_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _retrieval_chain_frames(spark, sf_dir)["final"]


def _retrieval_chain_frames(spark: SparkSession, sf_dir: str, probe=None) -> dict:
    """The full production retrieval chain as ONE verified operator:
    PQ-ADC approximate nearest neighbors (semantic arm, top-20 for query
    vector 0 — the memory-bounded ANN a billion-vector corpus actually
    deploys, replacing the brute-force arm the r4 rerank stages consumed)
    + BM25 (lexical arm, top-20) -> reciprocal-rank fusion -> greedy MMR
    diversification of the fused top-10 down to 5, with relevance =
    min-max-normalized RRF score.

    Scale shape: each arm ends in a distributed TakeOrdered (never a
    global window over the corpus); fusion is a union + groupBy over
    <= 40 rows (full outer would force the repo's only gratuitous SMJ —
    same reasoning as hybrid_search_rrf); the MMR unroll runs over a
    10-row broadcast candidate set so its cost is independent of corpus
    size. Docs without embeddings (lexical-only hits at sf0.1, where the
    embedding table covers 2000 of 5000 docs) can be retrieved but never
    diversified against — the inner psim joins drop them from MMR rounds
    identically in both engines."""
    from pyspark.sql.window import Window

    from ..functions.similarity import as_double_array, cosine
    from ..functions.similarity import pq_adc_topk as _pq
    from ..schemas import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    sem = _pq(emb, k=20).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("rank_sem"),
    )
    if probe:
        probe("s1_pq_ann", sem)
    lex_top = (
        bm25_keyword_search(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("rank_lex")
    )
    if probe:
        probe("s2_bm25", lex)
    fused = (
        lex.select("doc_id", "rank_lex", F.lit(0).alias("rank_sem"))
        .unionByName(
            sem.select("doc_id", F.lit(0).alias("rank_lex"), "rank_sem")
        )
        .groupBy("doc_id")
        .agg(
            F.max("rank_lex").alias("rank_lex"),
            F.max("rank_sem").alias("rank_sem"),
        )
        .select(
            "doc_id",
            (
                F.when(
                    F.col("rank_lex") > 0,
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lex")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("rank_sem") > 0,
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_sem")),
                ).otherwise(F.lit(0.0))
            ).alias("rrf"),
        )
    )
    w_rrf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    cand0 = (
        fused.withColumn("rrf_rank", F.row_number().over(w_rrf).cast("int"))
        .filter(F.col("rrf_rank") <= _CHAIN_CAND)
    )
    bounds = cand0.agg(F.max("rrf").alias("mx"), F.min("rrf").alias("mn"))
    # checkpoint the 10-row candidate set: the MMR unroll references it in
    # every round, and without the barrier each reference re-runs the
    # whole PQ + BM25 retrieval lineage
    cand = (
        cand0.crossJoin(F.broadcast(bounds))
        .select(
            F.col("doc_id").alias("cid"),
            "rrf",
            "rrf_rank",
            F.round(
                F.when(F.col("mx") == F.col("mn"), F.lit(1.0)).otherwise(
                    (F.col("rrf") - F.col("mn")) / (F.col("mx") - F.col("mn"))
                ),
                9,
            ).alias("rel"),
        )
        .localCheckpoint(eager=False)
    )
    if probe:
        probe("s3_rrf_cand", cand)
    e = emb.select("vec_id", as_double_array(F.col("embedding")).alias("e"))
    ce = cand.join(e, cand.cid == e.vec_id).select("cid", "e")
    ps = (
        ce.alias("a")
        .join(F.broadcast(ce.alias("b")), F.col("a.cid") != F.col("b.cid"))
        .select(
            F.col("a.cid").alias("ca"),
            F.col("b.cid").alias("cb"),
            F.round(cosine(F.col("a.e"), F.col("b.e")), 6).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    sel = cand.orderBy(F.col("rel").desc(), "cid").limit(1).select(
        "cid", "rrf", "rrf_rank", "rel",
        F.lit(1).alias("step"), F.col("rel").alias("mmr"),
    )
    for t in range(2, _CHAIN_OUT + 1):
        sel_ids = sel.select(F.col("cid").alias("scid"))
        pen = (
            ps.join(F.broadcast(sel_ids), ps.cb == F.col("scid"))
            .groupBy("ca")
            .agg(F.max("sim").alias("pen"))
        )
        scores = (
            cand.join(F.broadcast(sel_ids), cand.cid == F.col("scid"), "left_anti")
            .join(F.broadcast(pen), cand.cid == pen.ca)
            .select(
                "cid", "rrf", "rrf_rank", "rel",
                # UNROUNDED: both engines compute this IEEE expression on
                # identical (already-rounded) operands, so the doubles are
                # bit-identical — a 6dp round here measurably LANDS on a
                # half-tie at sf0.01 and the engines' tie rules differ
                (
                    F.lit(_CHAIN_LAM) * F.col("rel")
                    - F.lit(round(1 - _CHAIN_LAM, 10)) * F.col("pen")
                ).alias("score"),
            )
        )
        pick = scores.orderBy(F.col("score").desc(), "cid").limit(1).select(
            "cid", "rrf", "rrf_rank", "rel",
            F.lit(t).alias("step"), F.col("score").alias("mmr"),
        )
        # <=5 rows; referenced 3x next step (anti-join, penalty, union) —
        # the barrier keeps the unrolled plan linear instead of 3^steps
        # (the final step stays un-checkpointed so the emitted plan is
        # inspectable end to end)
        sel = sel.unionByName(pick)
        if t < _CHAIN_OUT:
            sel = sel.localCheckpoint(eager=False)
    final = sel.select(
        F.col("step").cast("int").alias("rank"),
        F.col("cid").alias("doc_id"),
        F.col("rrf_rank").cast("int").alias("rrf_rank"),
        F.round("rrf", 9).alias("rrf_score"),
        F.col("rel").alias("relevance"),
        F.col("mmr").alias("mmr_score"),
    )
    return {"final": final}


_PRF_FB_DOCS = 5   # pseudo-relevant feedback set size
_PRF_TERMS = 3     # expansion terms
_PRF_WEIGHT = 0.5  # Rocchio-style expansion weight (binary fraction)


def _prf_oracle() -> str:
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    # pass-1 CTEs identical to bm25_keyword_search's oracle
    head = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    tf AS MATERIALIZED (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    dl AS MATERIALIZED (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ),
    corpus AS MATERIALIZED (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    qdf AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        WHERE tok IN ({terms_sql}) GROUP BY 1
    ),
    qtf AS (
        SELECT doc_id,
               {" , ".join(
                   f"COALESCE(MAX(CASE WHEN tok = '{t}' THEN tf END), 0)"
                   f" AS tf_{t}" for t in _BM25_TERMS)}
        FROM tf WHERE tok IN ({terms_sql}) GROUP BY 1
    ),
    scored AS MATERIALIZED (
        SELECT q.doc_id, d.dl,
               {" + ".join(
                   f"(ln(1.0 + (c.n_docs - idf_{t}.df + 0.5) / (idf_{t}.df + 0.5))"
                   f" * (q.tf_{t} * ({_K1} + 1.0))"
                   f" / (q.tf_{t} + {_K1} * (1.0 - {_B} + {_B} * d.dl / c.avgdl)))"
                   for t in _BM25_TERMS)} AS score
        FROM qtf q
        JOIN dl d USING (doc_id)
        CROSS JOIN corpus c
        {" ".join(
            f"LEFT JOIN qdf idf_{t} ON idf_{t}.tok = '{t}'"
            for t in _BM25_TERMS)}
    ),
    top5 AS MATERIALIZED (
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT {_PRF_FB_DOCS}
    ),
    alldf AS MATERIALIZED (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    exp_cand AS (
        SELECT t.tok,
               SUM(t.tf * ln(CAST(c.n_docs AS DOUBLE) / a.df)) AS w
        FROM tf t
        JOIN top5 f ON t.doc_id = f.doc_id
        JOIN alldf a ON t.tok = a.tok
        CROSS JOIN corpus c
        WHERE t.tok NOT IN ({terms_sql})
        GROUP BY 1
    ),
    exp3 AS MATERIALIZED (
        SELECT e.tok, a.df,
               CAST(row_number() OVER (ORDER BY e.w DESC, e.tok) AS INT) AS r
        FROM exp_cand e JOIN alldf a ON e.tok = a.tok
        ORDER BY e.w DESC, e.tok LIMIT {_PRF_TERMS}
    ),
    expdf AS (
        SELECT {" , ".join(
            f"MAX(CASE WHEN r = {r} THEN df END) AS df_e{r}"
            for r in range(1, _PRF_TERMS + 1))}
        FROM exp3
    ),
    etf AS (
        SELECT t.doc_id,
               {" , ".join(
                   f"COALESCE(MAX(CASE WHEN e.r = {r} THEN t.tf END), 0)"
                   f" AS tf_e{r}" for r in range(1, _PRF_TERMS + 1))}
        FROM tf t JOIN exp3 e ON t.tok = e.tok
        GROUP BY 1
    ),
    universe AS (
        SELECT doc_id FROM scored UNION SELECT doc_id FROM etf
    ),
    final AS (
        SELECT u.doc_id,
               COALESCE(s.score, 0.0) AS base_bm25,
               {" + ".join(
                   f"(CASE WHEN x.df_e{r} IS NULL THEN 0.0 ELSE"
                   f" ln(1.0 + (c.n_docs - x.df_e{r} + 0.5) / (x.df_e{r} + 0.5))"
                   f" * (COALESCE(e.tf_e{r}, 0) * ({_K1} + 1.0))"
                   f" / (COALESCE(e.tf_e{r}, 0) + {_K1}"
                   f"    * (1.0 - {_B} + {_B} * d.dl / c.avgdl)) END)"
                   for r in range(1, _PRF_TERMS + 1))} AS exp_score
        FROM universe u
        LEFT JOIN scored s ON u.doc_id = s.doc_id
        LEFT JOIN etf e ON u.doc_id = e.doc_id
        JOIN dl d ON u.doc_id = d.doc_id
        CROSS JOIN corpus c
        CROSS JOIN expdf x
    )
    SELECT CAST(row_number() OVER (
               ORDER BY base_bm25 + {_PRF_WEIGHT} * exp_score DESC, doc_id)
           AS INT) AS rank,
           doc_id,
           round(base_bm25, 6) AS base_bm25,
           round({_PRF_WEIGHT} * exp_score, 6) AS expansion_bonus,
           round(base_bm25 + {_PRF_WEIGHT} * exp_score, 6) AS prf_score
    FROM final
    ORDER BY base_bm25 + {_PRF_WEIGHT} * exp_score DESC, doc_id
    LIMIT 10
    """
    return head


@register("prf_query_expansion", oracle=_prf_oracle())
def prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio-style query expansion) — the
    classical two-pass retrieval refinement the chain was missing: BM25
    pass 1 over the fixed query, take the top-5 feedback docs, extract
    the 3 highest tf-idf-weighted terms from them (original terms
    excluded, ties to lexicographic), and rescore the union of both
    match sets as base + 0.5 x expansion-BM25. Expansion contributions
    pivot by expansion RANK into fixed columns (tf_e1..3) so the float
    sum stays order-deterministic even though the terms are data-derived
    — the same discipline as bm25_keyword_search's per-term columns.

    Scale posture: the (doc, tok) tf aggregate is computed once and
    lazily checkpointed for its five consumers; feedback set and
    expansion vocabulary are LIMIT-k broadcasts; both scoring passes are
    broadcast joins against corpus-stat scalars — the only data-sized
    shuffles are the tokenize-count and the per-doc conditional
    aggregates."""
    from pyspark.sql.window import Window

    parts = _bm25_parts(load_table(spark, sf_dir, "documents"))
    tf, dl, corpus, scored = (
        parts["tf"],
        parts["dl"],
        parts["corpus"],
        parts["scored"].localCheckpoint(eager=False),  # 3 consumers
    )
    top5 = scored.orderBy(F.desc("score"), "doc_id").limit(_PRF_FB_DOCS)
    alldf = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    alldf = alldf.localCheckpoint(eager=False)  # 2 consumers
    exp_cand = (
        tf.join(F.broadcast(top5.select("doc_id")), "doc_id")
        .join(alldf, "tok")
        .crossJoin(F.broadcast(corpus))
        .filter(~F.col("tok").isin(*_BM25_TERMS))
        .groupBy("tok")
        .agg(
            F.sum(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w")
        )
    )
    exp3 = (
        exp_cand.join(alldf, "tok")
        .orderBy(F.desc("w"), "tok")
        .limit(_PRF_TERMS)
        .select(
            "tok",
            "df",
            F.row_number()
            .over(Window.orderBy(F.desc("w"), "tok"))
            .cast("int")
            .alias("r"),
        )
        .localCheckpoint(eager=False)  # 2 consumers
    )
    expdf = exp3.agg(
        *[
            F.max(F.when(F.col("r") == r, F.col("df"))).alias(f"df_e{r}")
            for r in range(1, _PRF_TERMS + 1)
        ]
    )
    etf = (
        tf.join(F.broadcast(exp3.select("tok", "r")), "tok")
        .groupBy("doc_id")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("r") == r, F.col("tf"))), F.lit(0)
                ).alias(f"tf_e{r}")
                for r in range(1, _PRF_TERMS + 1)
            ]
        )
    )
    universe = (
        scored.select("doc_id").union(etf.select("doc_id")).distinct()
    )
    joined = (
        universe.join(scored.select("doc_id", "score"), "doc_id", "left")
        .join(etf, "doc_id", "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(expdf))
    )
    exp_score = None
    for r in range(1, _PRF_TERMS + 1):
        dfr = F.col(f"df_e{r}")
        tfr = F.coalesce(F.col(f"tf_e{r}"), F.lit(0))
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - dfr + F.lit(0.5)) / (dfr + F.lit(0.5))
        )
        contrib = F.when(dfr.isNull(), F.lit(0.0)).otherwise(
            idf
            * (tfr * F.lit(_K1 + 1.0))
            / (
                tfr
                + F.lit(_K1)
                * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        exp_score = contrib if exp_score is None else exp_score + contrib
    base = F.coalesce(F.col("score"), F.lit(0.0))
    prf = base + F.lit(_PRF_WEIGHT) * exp_score
    ranked = joined.select(
        "doc_id", base.alias("base_bm25"), exp_score.alias("exp_score")
    )
    final = (
        ranked.orderBy(
            F.desc(F.col("base_bm25") + F.lit(_PRF_WEIGHT) * F.col("exp_score")),
            "doc_id",
        )
        .limit(10)
        .select(
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc(
                        F.col("base_bm25")
                        + F.lit(_PRF_WEIGHT) * F.col("exp_score")
                    ),
                    "doc_id",
                )
            )
            .cast("int")
            .alias("rank"),
            "doc_id",
            F.round("base_bm25", 6).alias("base_bm25"),
            F.round(F.lit(_PRF_WEIGHT) * F.col("exp_score"), 6).alias(
                "expansion_bonus"
            ),
            F.round(
                F.col("base_bm25") + F.lit(_PRF_WEIGHT) * F.col("exp_score"), 6
            ).alias("prf_score"),
        )
    )
    return final


_KN_D = 0.75  # fixed Kneser-Ney discount


@register(
    "kn_bigram_lm_score",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM d WHERE len(t) >= 2) q
    ),
    bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS bcnt
        FROM bg GROUP BY 1, 2
    ),
    hist AS (
        SELECT w1, CAST(SUM(bcnt) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS nf
        FROM bi GROUP BY 1
    ),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS np FROM bi GROUP BY 1
    ),
    types AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM bi),
    scored AS (
        SELECT g.doc_id,
               -ln(greatest(CAST(b.bcnt AS DOUBLE) - {_KN_D}, 0.0)
                       / CAST(h.h AS DOUBLE)
                   + ({_KN_D} * CAST(h.nf AS DOUBLE)
                          / CAST(h.h AS DOUBLE))
                     * (CAST(c.np AS DOUBLE) / CAST(t.nt AS DOUBLE)))
                   AS nll
        FROM bg g
        JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
        JOIN hist h ON g.w1 = h.w1
        JOIN cont c ON g.w2 = c.w2
        CROSS JOIN types t
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(AVG(nll), 6) AS avg_nll,
           round(exp(AVG(nll)), 4) AS kn_ppl
    FROM scored GROUP BY 1
    """,
)
def kn_bigram_lm_score(
    spark: SparkSession,
    sf_dir: str,
    toked: DataFrame | None = None,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the published-standard
    smoothing behind KenLM/CCNet-style perplexity filters, upgrading
    bigram_lm_score's Laplace mix (r9 verdict item 6). Absolute
    discount D=0.75 off every seen bigram, with the freed mass routed
    through the CONTINUATION distribution: p(w2|w1) =
    max(c(w1w2)-D,0)/c(w1.) + (D*N1+(w1,.)/c(w1.)) * N1+(.,w2)/N1+(..),
    where N1+ counts distinct bigram TYPES — the "how many contexts has
    this word completed" estimator that makes KN beat frequency
    back-off. Scale shape identical to the Laplace model: the bigram,
    history and continuation tables are vocab(^2)-bounded aggregates
    with map-side combine, broadcast back onto the bigram stream; the
    per-doc average is one shuffle on doc_id. Training and scoring stay
    a single distributed job with no model object.

    ``toked``: optional (doc_id, t) pre-split token-array frame (the
    curation chain's shared tokenize barrier) — the bigram stream below
    reads the identical array either way. Default None keeps the
    standalone plan."""
    if toked is not None:
        d = toked.select("doc_id", "t")
    else:
        docs = load_table(spark, sf_dir, "documents")
        d = docs.select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
        )
    bg = (
        d.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    "             element_at(t, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("bcnt"))
    hist = bi.groupBy("w1").agg(
        F.sum("bcnt").alias("h"), F.count("*").alias("nf")
    )
    cont = bi.groupBy(F.col("w2")).agg(F.count("*").alias("np"))
    types = bi.agg(F.count("*").alias("nt"))
    dd = F.lit(_KN_D)
    scored = (
        bg.join(F.broadcast(bi), ["w1", "w2"])
        .join(F.broadcast(hist), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "doc_id",
            (
                -F.log(
                    F.greatest(
                        F.col("bcnt").cast("double") - dd, F.lit(0.0)
                    )
                    / F.col("h").cast("double")
                    + (dd * F.col("nf").cast("double")
                       / F.col("h").cast("double"))
                    * (F.col("np").cast("double")
                       / F.col("nt").cast("double"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.exp(F.avg("nll")), 4).alias("kn_ppl"),
    )
