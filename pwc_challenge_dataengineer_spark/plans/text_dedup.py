"""Text-analysis + deduplication queries over the documents table.

North-star LLM-pipeline operators (BASELINE.json): each one is a pure
DataFrame composition (no UDFs), with an exact DuckDB oracle — including the
MinHash/LSH pipeline, whose md5-min band signatures are engine-reproducible.

- text_stats            token/char/punct/stopword stats + quality score
- lang_id               stopword-hit language heuristic
- token_count_bpe       BPE-ish regex tokenizer counts
- doc_fingerprint       normalized md5 fingerprint + dup-group size
- exact_dedup_docs      hash-groupBy exact dedup survivors
- minhash_lsh_pairs     shingle → per-band min-hash → LSH buckets → exact
                        Jaccard verification (all candidate pairs emitted)
- simhash_docs          60-bit SimHash signatures
- ngram_jaccard_pairs   shingle-join exact Jaccard for pairs sharing ≥ 8
                        shingles (bounded candidate set)
- dedup_components      near-dup clusters: MinHash pairs → connected
                        components (min-label propagation vs a DuckDB
                        recursive-CTE oracle); representative = min doc_id
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup_fuzzy import (
    exploded_shingles,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_band_signatures,
    simhash60,
)
from ..functions.text import add_text_stats, bpe_ish_tokens, detect_language, normalized_fingerprint
from ..operators.dedup import exact_dedup
from ..schemas import load_table
from .catalog import register

_SW_EN = "('the','and','of','to','a','is','in','that')"
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "text_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text,
               length(text) AS n_chars_calc,
               len({_TOKS}) AS n_tok,
               len(list_filter({_TOKS}, x -> x IN {_SW_EN})) AS sw_hits,
               length(trim(text)) - length(regexp_replace(trim(text), '\\s+', '', 'g'))
                   AS ws_chars,
               length(text) - length(regexp_replace(text, '[.,!?;:()\\[\\]''"-]', '', 'g'))
                   AS punct_chars,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_chars
        FROM documents
    )
    SELECT doc_id,
           n_chars_calc,
           CAST(n_tok AS INT) AS n_tokens,
           round(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                 / greatest(n_tok, 1), 6) AS avg_token_len,
           round(CASE WHEN n_chars_calc > 0
                      THEN CAST(punct_chars AS DOUBLE) / n_chars_calc ELSE 0e0 END, 6)
               AS punct_ratio,
           round(CASE WHEN n_chars_calc > 0
                      THEN CAST(digit_chars AS DOUBLE) / n_chars_calc ELSE 0e0 END, 6)
               AS digit_ratio,
           round(CAST(sw_hits AS DOUBLE) / greatest(n_tok, 1), 6) AS stopword_ratio,
           round(0.4e0 * (CASE WHEN n_tok >= 20 THEN 1.0e0 WHEN n_tok >= 5 THEN 0.5e0 ELSE 0.0e0 END)
               + 0.3e0 * least((CAST(sw_hits AS DOUBLE) / greatest(n_tok, 1)) * 5, 1.0e0)
               + 0.15e0 * (1 - least((CASE WHEN n_chars_calc > 0
                        THEN CAST(punct_chars AS DOUBLE) / n_chars_calc ELSE 0e0 END) * 10, 1.0e0))
               + 0.15e0 * (1 - least((CASE WHEN n_chars_calc > 0
                        THEN CAST(digit_chars AS DOUBLE) / n_chars_calc ELSE 0e0 END) * 10, 1.0e0)),
               6) AS quality_score
    FROM base
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return add_text_stats(docs).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
        "stopword_ratio",
        "quality_score",
    )


def _lang_hits_sql(words: list[str]) -> str:
    inlist = "(" + ",".join(f"'{w}'" for w in words) + ")"
    return f"len(list_filter({_TOKS}, x -> x IN {inlist}))"


@register(
    "lang_id",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, lang AS labeled_lang,
               {_lang_hits_sql(['the','and','of','to','a','is','in','that'])} AS h_en,
               {_lang_hits_sql(['der','die','das','und','ist','nicht','ein'])} AS h_de,
               {_lang_hits_sql(['le','la','les','et','est','un','une','dans'])} AS h_fr,
               {_lang_hits_sql(['el','la','los','y','es','un','una','que'])} AS h_es
        FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN h_en >= 1 THEN 'en'
                WHEN h_de >= 1 AND h_de > h_en THEN 'de'
                WHEN h_fr >= 1 AND h_fr > h_en AND h_fr > h_de THEN 'fr'
                WHEN h_es >= 1 AND h_es > h_en AND h_es > h_de AND h_es > h_fr THEN 'es'
                ELSE 'unknown' END AS predicted_lang
    FROM hits
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detect_language(F.col("text")).alias("predicted_lang"),
    )


@register(
    "token_count_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\\s])', 1)) AS INT)
               AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(bpe_ish_tokens(F.col("text"))).alias("n_bpe_tokens")
    )


@register(
    "doc_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint,
           COUNT(*) OVER (PARTITION BY fingerprint) AS dup_group_size
    FROM fp
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", normalized_fingerprint(F.col("text")).alias("fingerprint")
    ).withColumn(
        "dup_group_size", F.count("*").over(Window.partitionBy("fingerprint"))
    )


@register(
    "exact_dedup_docs",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) = 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, content_cols=["text"], id_col="doc_id").select(
        "doc_id", "lang", "source"
    )


_SHINGLES_SQL = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
        WHERE len(t) >= 3
    )
"""


def _shingle_cand_sql(min_common: int) -> str:
    """Shared oracle fragment: per-doc shingle counts + bounded candidate
    pairs sharing >= min_common shingles (the candidate generation of
    ngram_jaccard_pairs and containment_pairs — one definition, so the
    candidate bound can't drift between the two)."""
    return f"""counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh sa JOIN sh sb
          ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_common}
    )"""


def _shingle_candidates(docs: DataFrame, min_common: int):
    """Spark twin of _shingle_cand_sql: returns (common, counts) where
    ``common`` holds (id_a, id_b, n_common) pairs sharing >= min_common
    3-gram shingles and ``counts`` the per-doc shingle cardinalities."""
    sh = exploded_shingles(docs, "doc_id", "text", k=3)
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    return common, counts


@register(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    bands AS (
        SELECT doc_id, band, shingle
        FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    sig AS (
        -- band b's minwise hash = min over shingles of the b-th disjoint
        -- 8-hex-char slice of ONE md5(shingle) (mirrors
        -- functions/dedup_fuzzy._band_minima_aggs)
        SELECT doc_id, band,
               MIN(substr(md5(shingle), band * 8 + 1, 8)) AS signature
        FROM bands GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    )
    SELECT m.id_a, m.id_b, m.n_common,
           round(CAST(m.n_common AS DOUBLE) / (na.n + nb.n - m.n_common), 6) AS jaccard
    FROM common m
    JOIN counts na ON na.doc_id = m.id_a
    JOIN counts nb ON nb.doc_id = m.id_b
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs with exact Jaccard verification (4 bands,
    r=1). Threshold filtering is the caller's choice; all candidates emitted
    here so the oracle checks the whole pipeline.

    Plan: ONE fused shingle explode + doc-level groupBy computes band
    minima AND verify sets together (functions/dedup_fuzzy.py:
    minhash_doc_profiles) — the naive two-aggregation pipeline pays the
    explode twice, and caching the raw exploded rows instead was measured
    SLOWER than recompute (materializing ~tokens/doc × docs rows costs more
    than a second codegen'd scan). The fused profile table is one row per
    doc, checkpointed, and fanned out to buckets + verify."""
    from ..functions.dedup_fuzzy import jaccard_verify_profiles, minhash_doc_profiles, profiles_to_signatures

    docs = load_table(spark, sf_dir, "documents")
    # lazy checkpoint: materialized once on the first action, reused by the
    # bucket join and both verify joins (no plan-construction side effect).
    # spread=True parallelizes the explode stage when the scan yields fewer
    # splits than cores (no-op at scale — see spread_small_scan).
    prof = minhash_doc_profiles(
        docs, "doc_id", "text", k=3, n_bands=4, spread=True
    ).localCheckpoint(eager=False)
    sig = profiles_to_signatures(prof, "doc_id", n_bands=4)
    # hint_small on the bucket join only: the checkpointed signature table
    # is a few MB but carries no stats, so Catalyst cannot choose the
    # broadcast join on its own; the VERIFY joins stay shuffled — two
    # broadcast builds of the array-heavy profile table measured slower
    # than the shuffle at sf0.1, and shuffle is the corpus-scale shape
    # anyway (see jaccard_verify_profiles).
    cand = lsh_candidate_pairs(sig, "doc_id", hint_small=True)
    return jaccard_verify_profiles(cand, prof, "doc_id")


@register(
    "minhash_lsh_pairs_salted",
    # identical semantics (and oracle) to minhash_lsh_pairs: the skew-salted
    # bucket join is pair-identical to the plain self-join (property-tested
    # in tests/test_near_dup.py) — registering it separately makes the
    # driver's oracle gate prove the salting path end-to-end, not just the
    # Hypothesis corpus.
    oracle=f"""
    WITH {_SHINGLES_SQL},
    bands AS (
        SELECT doc_id, band, shingle
        FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    sig AS (
        SELECT doc_id, band,
               MIN(substr(md5(shingle), band * 8 + 1, 8)) AS signature
        FROM bands GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    )
    SELECT m.id_a, m.id_b, m.n_common,
           round(CAST(m.n_common AS DOUBLE) / (na.n + nb.n - m.n_common), 6) AS jaccard
    FROM common m
    JOIN counts na ON na.doc_id = m.id_a
    JOIN counts nb ON nb.doc_id = m.id_b
    """,
)
def minhash_lsh_pairs_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs through the viral-shingle SALTED bucket join: any
    band bucket over the cap splits into hash groups and the self-join runs
    on bounded group-pair cells — the skew armor for a boilerplate shingle
    shared by half the corpus. The pair set is provably identical to the
    plain join, so the same value oracle applies. bucket_cap=4 sits below
    the max bucket size at every test SF (5 at sf0.01, 21 at sf0.1), so the
    hot (salted) and cold paths BOTH execute under the oracle gate; a
    production corpus would cap in the thousands."""
    from ..functions.dedup_fuzzy import jaccard_verify_profiles, minhash_doc_profiles, profiles_to_signatures

    docs = load_table(spark, sf_dir, "documents")
    prof = minhash_doc_profiles(
        docs, "doc_id", "text", k=3, n_bands=4, spread=True
    ).localCheckpoint(eager=False)
    sig = profiles_to_signatures(prof, "doc_id", n_bands=4)
    cand = lsh_candidate_pairs(sig, "doc_id", bucket_cap=4)
    return jaccard_verify_profiles(cand, prof, "doc_id")


@register(
    "simhash_docs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM toks),
    bits AS (
        SELECT doc_id, p,
               -- NB: p // 4, not CAST(p/4 AS INT): DuckDB's double→int cast
               -- ROUNDS (Spark truncates) — integer division on both sides.
               CASE WHEN ((strpos('0123456789abcdef',
                                  substr(h, CAST(p // 4 AS INT) + 1, 1)) - 1)
                          & (1 << (3 - CAST(p % 4 AS INT)))) > 0
                    THEN 1 ELSE 0 END AS bit
        FROM h, (SELECT unnest(range(0, 60)) AS p)
    ),
    votes AS (SELECT doc_id, p, SUM(bit * 2 - 1) AS vote FROM bits GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
    FROM votes GROUP BY 1
    """,
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash60(docs, "doc_id", "text")


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    {_shingle_cand_sql(8)}
    SELECT m.id_a, m.id_b, m.n_common,
           round(CAST(m.n_common AS DOUBLE) / (na.n + nb.n - m.n_common), 6) AS jaccard
    FROM common m
    JOIN counts na ON na.doc_id = m.id_a
    JOIN counts nb ON nb.doc_id = m.id_b
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs n-gram Jaccard restricted to pairs sharing ≥ 8 shingles
    (the shingle-join naturally bounds candidates; at 100 TB prefer the
    MinHash/LSH pipeline which avoids the quadratic shingle join)."""
    docs = load_table(spark, sf_dir, "documents")
    common, counts = _shingle_candidates(docs, min_common=8)
    return (
        common.join(counts.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(counts.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    bands AS (
        SELECT doc_id, band, shingle
        FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    sig AS (
        -- band b's minwise hash = min over shingles of the b-th disjoint
        -- 8-hex-char slice of ONE md5(shingle) (mirrors
        -- functions/dedup_fuzzy._band_minima_aggs)
        SELECT doc_id, band,
               MIN(substr(md5(shingle), band * 8 + 1, 8)) AS signature
        FROM bands GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT m.id_a, m.id_b
        FROM common m
        JOIN counts na ON na.doc_id = m.id_a
        JOIN counts nb ON nb.doc_id = m.id_b
        WHERE round(CAST(m.n_common AS DOUBLE) / (na.n + nb.n - m.n_common), 6) >= 0.5
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.id
    )
    SELECT id AS node_id,
           MIN(comp) AS component_id,
           MIN(comp) = id AS is_representative
    FROM reach GROUP BY 1
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: MinHash pairs (Jaccard ≥ 0.5) become an
    undirected graph; each doc gets its component's min doc_id as cluster id
    (functions/dedup_fuzzy.connected_components — iterative min-label
    propagation, one shuffle join per iteration, diameter-bounded). The
    LLM-pipeline "keep one per duplicate cluster" step: filter
    is_representative."""
    from ..functions.dedup_fuzzy import connected_components, minhash_lsh_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_near_dups(
        docs, "doc_id", "text", threshold=0.5, hint_small=True
    )
    comp = connected_components(pairs, edges_canonical=True, hint_small=True)
    return comp.select(
        "node_id",
        "component_id",
        (F.col("component_id") == F.col("node_id")).alias("is_representative"),
    )


@register(
    "near_dup_rate_by_source",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    bands AS (
        SELECT doc_id, band, shingle
        FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    sig AS (
        SELECT doc_id, band,
               MIN(substr(md5(shingle), band * 8 + 1, 8)) AS signature
        FROM bands GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT m.id_a, m.id_b
        FROM common m
        JOIN counts na ON na.doc_id = m.id_a
        JOIN counts nb ON nb.doc_id = m.id_b
        WHERE round(CAST(m.n_common AS DOUBLE) / (na.n + nb.n - m.n_common), 6) >= 0.5
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY 1)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE c.comp IS NOT NULL AND c.comp <> d.doc_id)
                AS BIGINT) AS n_redundant,
           round(CAST(COUNT(*) FILTER (WHERE c.comp IS NOT NULL
                                         AND c.comp <> d.doc_id) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    GROUP BY 1
    """,
)
def near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield report per ingestion source: how many documents would be
    DROPPED by keep-one-per-cluster near-dup dedup (cluster member but not
    the representative) — the per-source redundancy diagnostic a corpus
    curation pass reports before committing to a source mix. Reuses the
    MinHash→LSH→verify→components pipeline and joins the cluster map back
    to the documents table (left join: singleton docs count as unique)."""
    from ..functions.dedup_fuzzy import connected_components, minhash_lsh_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_near_dups(
        docs, "doc_id", "text", threshold=0.5, hint_small=True
    )
    comp = connected_components(pairs, edges_canonical=True, hint_small=True)
    redundant = F.col("component_id").isNotNull() & (
        F.col("component_id") != F.col("doc_id")
    )
    return (
        docs.join(
            comp.select(F.col("node_id").alias("doc_id"), "component_id"),
            "doc_id",
            "left",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(redundant.cast("bigint")).alias("n_redundant"),
            F.round(
                F.sum(redundant.cast("bigint")).cast("double") / F.count("*"), 6
            ).alias("dup_rate"),
        )
    )


@register(
    "train_val_test_split",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
                AS BIGINT) AS bucket,
           CASE
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80
                   THEN 'train'
               WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 90
                   THEN 'val'
               ELSE 'test'
           END AS split
    FROM documents
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-free key
    hash (bucket = first 16 bits of md5(doc_id) mod 100) — the training-data
    pipeline's split step. Hash-based assignment is stable under reruns,
    repartitioning, and incremental appends (a new doc never moves an old
    one between splits), unlike rand()-based sampling. Pure row-local
    projection: no shuffle, no RNG state, pushes the doc_id-only read down
    to the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


_SIMHASH_CTE = """
    toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM toks),
    bits AS (
        SELECT doc_id, p,
               CASE WHEN ((strpos('0123456789abcdef',
                                  substr(h, CAST(p // 4 AS INT) + 1, 1)) - 1)
                          & (1 << (3 - CAST(p % 4 AS INT)))) > 0
                    THEN 1 ELSE 0 END AS bit
        FROM h, (SELECT unnest(range(0, 60)) AS p)
    ),
    votes AS (SELECT doc_id, p, SUM(bit * 2 - 1) AS vote FROM bits GROUP BY 1, 2),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN vote > 0
                             THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
        FROM votes GROUP BY 1
    )
"""

_HAM_MAX = 6


@register(
    "simhash_near_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    bands AS (
        SELECT doc_id, simhash, b.i AS i,
               (simhash >> (15 * b.i)) & 32767 AS bv
        FROM sig, (SELECT unnest(range(0, 4)) AS i) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM bands a JOIN bands b
          ON a.i = b.i AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming_dist
    FROM cand WHERE bit_count(xor(sa, sb)) <= {_HAM_MAX}
    """,
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs via banded Hamming search: split each
    60-bit signature into 4 15-bit bands — any pair within Hamming
    distance 3 of each other shares at least one band exactly (pigeonhole),
    and the {_HAM_MAX}-bit acceptance keeps recall high at test scale.
    The band equi-join is the whole trick: candidates are |docs|/2^15 per
    band bucket instead of all pairs, the same sub-quadratic shape as the
    MinHash LSH path but on a 1-word signature — the cheapest near-dup
    pass a corpus pipeline runs. Verification is one bit_count(xor) per
    candidate, no token re-reading."""
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash60(docs, "doc_id", "text")
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.expr("sequence(0, 3)")).alias("i"),
    ).withColumn("bv", F.expr("(simhash >> (15 * i)) & 32767"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming_dist", dist.cast("int"))
        .filter(F.col("hamming_dist") <= _HAM_MAX)
        .select("id_a", "id_b", "hamming_dist")
    )


_SPAN_N = 4  # n-gram length for duplicated-span detection

# Shared oracle fragment for the duplicated-n-gram position pipeline:
# d (token arrays) → base (doc lengths) → pos (gram start positions) →
# g (gram hashes) → dup (grams in >= 2 docs) → hits (duplicated positions).
# One definition serves dup_ngram_spans (the report) and
# dedup_span_excision (the transform).
_DUP_HITS_SQL = f"""d AS (
        SELECT doc_id, {_TOKS} AS arr FROM documents
    ),
    base AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_toks FROM d),
    pos AS (
        SELECT doc_id, unnest(generate_series(1, len(arr) - {_SPAN_N - 1}))
                   AS i, arr
        FROM d WHERE len(arr) >= {_SPAN_N}
    ),
    g AS (
        SELECT doc_id, i,
               md5(array_to_string(arr[i:i+{_SPAN_N - 1}], ' ')) AS gh
        FROM pos
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gh))"""


def _dup_ngram_hits(docs: DataFrame, n: int):
    """Spark twin of _DUP_HITS_SQL: returns (d, hits) where ``d`` holds
    (doc_id, arr) token arrays and ``hits`` the (doc_id, i) start positions
    of n-grams that occur in >= 2 distinct documents."""
    d = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("arr"),
    )
    pos = d.filter(F.size("arr") >= n).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("arr") - (n - 1))).alias("i"),
        "arr",
    )
    g = pos.select(
        "doc_id",
        "i",
        F.md5(F.concat_ws(" ", F.expr(f"slice(arr, i, {n})"))).alias("gh"),
    )
    dup = (
        g.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    hits = g.join(dup, "gh").select("doc_id", "i")
    return d, hits


@register(
    "dup_ngram_spans",
    oracle=f"""
    WITH {_DUP_HITS_SQL},
    isl0 AS (
        SELECT doc_id, i,
               MAX(i + {_SPAN_N - 1}) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_end
        FROM hits
    ),
    isl1 AS (
        SELECT doc_id, i,
               CASE WHEN prev_end IS NULL OR i > prev_end THEN 1 ELSE 0 END
                   AS new_isl
        FROM isl0
    ),
    isl AS (
        SELECT doc_id, i,
               SUM(new_isl) OVER (
                   PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING
               ) AS isl
        FROM isl1
    ),
    spans AS (
        SELECT doc_id, isl, MIN(i) AS s, MAX(i + {_SPAN_N - 1}) AS e,
               COUNT(*) AS npos
        FROM isl GROUP BY 1, 2
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(e - s + 1) AS BIGINT) AS covered,
               CAST(SUM(npos) AS BIGINT) AS n_dup_grams
        FROM spans GROUP BY 1
    )
    SELECT b.doc_id, b.n_toks,
           CAST(COALESCE(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(p.covered, 0) AS BIGINT) AS covered_tokens,
           round(CAST(COALESCE(p.covered, 0) AS DOUBLE) / b.n_toks, 6)
               AS dup_coverage
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication report: for every document, the maximal
    spans of tokens covered by 4-grams that also occur in ANOTHER document
    — the distributed shape of suffix-array training-data dedup ("dedup by
    repeated substring", not whole-doc similarity): find cross-doc repeated
    n-grams, then merge overlapping hits into spans with a gaps-and-islands
    window (an island breaks where a hit starts past the running max span
    end). Emits per-doc dup-gram / span counts, covered-token totals and
    the coverage fraction a span-excision pass would remove.

    Scale shape: positions come from one explode; the repeated-gram set is
    a groupBy on the md5 of the gram (fixed-width key, map-side combined)
    — the only corpus-wide shuffle; span merging shuffles each doc's hit
    list once on doc_id. No step holds more than one document's positions
    in a task, and the gram table is the familiar shingle→bucket layout of
    the MinHash path, so the same salting applies if a gram goes viral."""
    from pyspark.sql.window import Window

    n = _SPAN_N
    docs = load_table(spark, sf_dir, "documents")
    d, hits = _dup_ngram_hits(docs, n)
    base = d.select("doc_id", F.size("arr").cast("bigint").alias("n_toks"))
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = (
        hits.withColumn("prev_end", F.max(F.col("i") + (n - 1)).over(w_prev))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev_end").isNull() | (F.col("i") > F.col("prev_end")), 1
            ).otherwise(0),
        )
        .withColumn("isl", F.sum("new_isl").over(w_run))
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        F.min("i").alias("s"),
        F.max(F.col("i") + (n - 1)).alias("e"),
        F.count("*").alias("npos"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("covered"),
        F.sum("npos").alias("n_dup_grams"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("covered", F.lit(0)).cast("bigint").alias("covered_tokens"),
        F.round(
            F.coalesce("covered", F.lit(0)).cast("double") / F.col("n_toks"), 6
        ).alias("dup_coverage"),
    )


@register(
    "containment_pairs",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    {_shingle_cand_sql(4)},
    scored AS (
        SELECT
            CASE WHEN na.n <= nb.n THEN m.id_a ELSE m.id_b END AS contained_id,
            CASE WHEN na.n <= nb.n THEN m.id_b ELSE m.id_a END AS container_id,
            m.n_common,
            LEAST(na.n, nb.n) AS n_contained,
            round(CAST(m.n_common AS DOUBLE) / LEAST(na.n, nb.n), 6)
                AS containment
        FROM common m
        JOIN counts na ON na.doc_id = m.id_a
        JOIN counts nb ON nb.doc_id = m.id_b
    )
    SELECT contained_id, container_id, n_common, n_contained, containment
    FROM scored WHERE containment >= 0.5
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment of the smaller
    document in the larger — |A∩B| / |smaller| ≥ 0.5. Jaccard misses
    quote-inclusion (a doc embedded inside a much longer one scores a low
    symmetric similarity but a high containment); this is the curation step
    that drops subsumed documents rather than merely-similar ones. Candidate
    pairs come from the same bounded shingle join as ngram_jaccard_pairs
    (≥ 4 shared shingles); direction is decided by profile size with the
    id as tiebreak, so the emitted (contained, container) orientation is
    deterministic on both engines. At 100 TB the candidate generation
    swaps to the MinHash bucket join; containment scoring is the same
    broadcast of the |doc|-row count table either way."""
    docs = load_table(spark, sf_dir, "documents")
    common, counts = _shingle_candidates(docs, min_common=4)
    joined = common.join(
        F.broadcast(counts.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))),
        "id_a",
    ).join(
        F.broadcast(counts.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))),
        "id_b",
    )
    smaller_is_a = F.col("n_a") <= F.col("n_b")
    scored = joined.select(
        F.when(smaller_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias("contained_id"),
        F.when(smaller_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias("container_id"),
        "n_common",
        F.least("n_a", "n_b").alias("n_contained"),
        F.round(
            F.col("n_common").cast("double") / F.least("n_a", "n_b"), 6
        ).alias("containment"),
    )
    return scored.filter(F.col("containment") >= 0.5)


@register(
    "leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    bands AS (
        SELECT doc_id, band, shingle
        FROM sh, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    sig AS (
        SELECT doc_id, band,
               MIN(substr(md5(shingle), band * 8 + 1, 8)) AS signature
        FROM bands GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT m.id_a, m.id_b
        FROM common m
        JOIN counts na ON na.doc_id = m.id_a
        JOIN counts nb ON nb.doc_id = m.id_b
        WHERE round(CAST(m.n_common AS DOUBLE) / (na.n + nb.n - m.n_common), 6)
              >= 0.5
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS component_id FROM reach GROUP BY 1),
    assigned AS (
        SELECT d.doc_id, d.source,
               COALESCE(c.component_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, source, cluster_id,
           CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                         ::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                         ::BIGINT % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across the
    boundary: documents are first clustered by MinHash near-dup connected
    components (Jaccard ≥ 0.5, same pipeline as dedup_components), then the
    80/10/10 hash-split keys on the CLUSTER id, not the doc id — every
    member of a duplicate cluster lands on the same side, closing the
    standard eval-contamination hole in doc-level hash splits. Singleton
    docs are their own cluster, so the split stays append-stable and
    shuffle-light (the component table is tiny relative to the corpus and
    broadcasts into the assignment join)."""
    from ..functions.dedup_fuzzy import connected_components, minhash_lsh_near_dups
    from .sampling import _md5_bucket

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_near_dups(
        docs, "doc_id", "text", threshold=0.5, hint_small=True
    )
    comp = connected_components(pairs, edges_canonical=True, hint_small=True)
    assigned = docs.join(
        F.broadcast(comp.select(F.col("node_id").alias("doc_id"), "component_id")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        "source",
        F.coalesce("component_id", "doc_id").alias("cluster_id"),
    )
    bucket = _md5_bucket(F.col("cluster_id"), 10)
    return assigned.select(
        "doc_id",
        "source",
        "cluster_id",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split"),
    )


@register(
    "dedup_span_excision",
    oracle=f"""
    WITH {_DUP_HITS_SQL},
    covered AS (
        SELECT DISTINCT doc_id, i + s.s AS p
        FROM hits, (SELECT unnest(generate_series(0, {_SPAN_N - 1})) AS s) s
    ),
    toks AS (
        SELECT doc_id, unnest(arr) AS tok,
               unnest(generate_series(1, len(arr))) AS p
        FROM d
    ),
    kept AS (
        SELECT t.doc_id, t.tok, t.p
        FROM toks t LEFT JOIN covered c
          ON t.doc_id = c.doc_id AND t.p = c.p
        WHERE c.p IS NULL
    ),
    cleaned AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS kept_toks,
               md5(string_agg(tok, ' ' ORDER BY p)) AS cleaned_md5
        FROM kept GROUP BY 1
    )
    SELECT b.doc_id, b.n_toks,
           CAST(COALESCE(c.kept_toks, 0) AS BIGINT) AS kept_toks,
           CAST(b.n_toks - COALESCE(c.kept_toks, 0) AS BIGINT)
               AS removed_toks,
           COALESCE(c.cleaned_md5, md5('')) AS cleaned_md5
    FROM base b LEFT JOIN cleaned c USING (doc_id)
    """,
)
def dedup_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM half of substring-level dedup: excise every token
    covered by a cross-document duplicated 4-gram (the positions
    dup_ngram_spans reports) and rebuild each document from its surviving
    tokens in order. Emits kept/removed counts plus the md5 of the cleaned
    text, so the oracle pins the reconstruction itself — including token
    ORDER, which survives the shuffle because the rebuild sorts an
    explicit (position, token) struct array rather than trusting
    collect_list order. Scale shape: covered positions come from one
    bounded explode of the hit list; the keep-filter is a left-anti join
    on (doc, position); reconstruction is one groupBy(doc) over the kept
    tokens — no task ever holds more than one document."""
    docs = load_table(spark, sf_dir, "documents")
    d, hits = _dup_ngram_hits(docs, _SPAN_N)
    base = d.select("doc_id", F.size("arr").cast("bigint").alias("n_toks"))
    covered = hits.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("i"), F.col("i") + (_SPAN_N - 1))
        ).alias("p"),
    ).distinct()
    toks = d.select(
        "doc_id", F.posexplode("arr").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = toks.join(covered, ["doc_id", "p"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count("*").alias("kept_toks"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(p, tok))),"
                    " x -> x.tok)"
                ),
            )
        ).alias("cleaned_md5"),
    )
    empty_md5 = F.md5(F.lit(""))
    return base.join(cleaned, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce("kept_toks", F.lit(0)).cast("bigint").alias("kept_toks"),
        (F.col("n_toks") - F.coalesce("kept_toks", F.lit(0)))
        .cast("bigint")
        .alias("removed_toks"),
        F.coalesce("cleaned_md5", empty_md5).alias("cleaned_md5"),
    )


# --- Exact sub-quadratic set-similarity join: prefix filtering (round 5) ----

_PF_T = 0.5  # Jaccard threshold


@register(
    "setjoin_prefix_filter",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    counts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b, c.n_common,
           round(CAST(c.n_common AS DOUBLE)
                 / (na.n + nb.n - c.n_common), 6) AS jaccard
    FROM common c
    JOIN counts na ON na.doc_id = c.id_a
    JOIN counts nb ON nb.doc_id = c.id_b
    WHERE round(CAST(c.n_common AS DOUBLE)
                / (na.n + nb.n - c.n_common), 6) >= {_PF_T}
    """,
)
def setjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sub-quadratic set-similarity join by prefix filtering
    (PPJoin's core idea): the lossless complement to MinHash LSH. Where
    LSH trades recall for speed probabilistically, prefix filtering is an
    ALGEBRAIC guarantee — sort each doc's shingle set by ascending
    document frequency (rarest first, ties on the shingle), keep only the
    first |d| - ceil(t * |d|) + 1 shingles as the doc's PREFIX, and join
    docs on shared PREFIX shingles: any pair with Jaccard >= t must share
    at least one prefix element (dropping the last ceil(t*|d|) elements
    can only lose pairs whose overlap is below the threshold), so exact
    verification of the candidates returns the complete answer. The
    oracle computes the full shared-shingle join with NO filter — the
    hash match IS the losslessness proof.

    Scale: candidate volume is driven by the RAREST shingles (each doc
    exposes its lowest-df tokens), so the join avoids the viral-shingle
    hot buckets that force salting in the LSH path; df ordering costs one
    extra |vocab|-sized broadcast join. Length filter |b| >= t*|a|
    prunes cross-size pairs before the verify intersect (same bound as
    jaccard_verify_profiles' min_jaccard)."""
    from ..functions.dedup_fuzzy import exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = exploded_shingles(docs, "doc_id", "text").localCheckpoint(
        eager=False
    )
    df_tbl = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # ONE groupBy(doc_id) builds the df-sorted shingle array per doc; the
    # per-doc count (size), the df-rank positions (array index), and the
    # verify profiles (field projection) all derive from it narrowly. The
    # previous shape paid three separate full-shingle shuffles for the
    # same facts: a count aggregate, a row_number window (shuffle + sort),
    # and a collect_set profile aggregate (guide §2.4). Shingles are
    # distinct per doc (word_shingles), so sort_array over (df, shingle)
    # structs reproduces the window's deterministic order exactly.
    arr_tbl = (
        sh.join(F.broadcast(df_tbl), "shingle")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias(
                "arr"
            )
        )
        .withColumn("n", F.size("arr"))
        # prefix legs, profiles and the verify all branch from here —
        # materialize once, everything downstream is narrow. Lazy:
        # materializes on first use.
        .localCheckpoint(eager=False)
    )
    prefix = (
        arr_tbl.select(
            "doc_id",
            "n",
            F.posexplode(
                # keep the first n - ceil(t*n) + 1 df-rarest shingles.
                # 1e-6 slack matches the 6dp rounding of the final jaccard
                # compare: a true J in [t - 5e-7, t) rounds UP to t and
                # must survive the prefix bound, so the effective
                # threshold used for pruning is t - 1e-6 (same convention
                # as jaccard_verify_profiles' min_jaccard).
                F.slice(
                    F.col("arr"),
                    1,
                    (
                        F.col("n")
                        - F.ceil(F.lit(_PF_T - 1e-6) * F.col("n"))
                        + 1
                    ).cast("int"),
                )
            ).alias("pos0", "el"),
        )
        .select(
            "doc_id",
            F.col("el.shingle").alias("shingle"),
            "n",
            (F.col("pos0") + 1).alias("pos"),
        )
    )
    # Positional + length filtering (PPJoin) on top of the prefix match,
    # still lossless: with the same global (df, shingle) order in every
    # doc, a match at positions (pa, pb) bounds the total overlap by
    # 1 + min(n_a - pa, n_b - pb) — for the pair's FIRST shared element
    # no common element precedes it, so the bound is valid, and the
    # first match has the largest bound, so keeping pairs where ANY
    # match passes equals keeping by the best bound. Jaccard >= t needs
    # overlap >= t/(1+t) * (n_a + n_b); pairs whose positional bound
    # can't reach it never get a verify row. Length filter
    # n_b >= t * n_a (both ways) is the standard size bound. Both use
    # the t - 1e-6 slack of the 6dp rounding convention.
    tp = _PF_T - 1e-6
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") >= tp * F.col("a.n"))
            & (F.col("a.n") >= tp * F.col("b.n"))
            & (
                1
                + F.least(
                    F.col("a.n") - F.col("a.pos"),
                    F.col("b.n") - F.col("b.pos"),
                )
                >= (tp / (1.0 + tp)) * (F.col("a.n") + F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    # verify with per-doc EXACT-shingle set profiles + one array_intersect
    # per candidate (jaccard_verify_profiles: its min_jaccard arms the same
    # size-bound prefilter the old inline filter applied). The previous
    # shape re-joined the EXPLODED shingle table per pair — |sh_a| shuffled
    # rows per candidate vs one narrow profile row here; measured 78s ->
    # on the x30 stress corpus (see SCALE_STRESS_x30_dedup.json history).
    from ..functions.dedup_fuzzy import jaccard_verify_profiles

    # profiles fall out of the checkpointed per-doc array — a field
    # projection instead of a second collect aggregate over the shingles
    profiles = arr_tbl.select(
        "doc_id",
        F.transform("arr", lambda x: x.shingle).alias("sh_set"),
        F.col("n").alias("n_sh"),
    )
    return jaccard_verify_profiles(
        cand, profiles, "doc_id", min_jaccard=_PF_T
    ).filter(F.col("jaccard") >= _PF_T)


def _cdc_chunk_sql(hash_expr: str, pos_select: str) -> str:
    """Shared content-defined-chunking SQL body. ``hash_expr`` is the
    dialect's md5->BIGINT spelling with {x} as the payload placeholder;
    ``pos_select`` yields (doc_id, text, i) for i in 8..len(text)."""
    gate = hash_expr.format(x="substring(text, CAST(i - 7 AS INT), 8)")
    chunk_hash = hash_expr.format(
        x="substring(d.text, CAST(sp.s AS INT), CAST(sp.e - sp.s + 1 AS INT))"
    )
    return f"""
    WITH d AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id % 5 = 0
    ),
    pos AS ({pos_select}),
    bnd AS (
        SELECT doc_id, i FROM pos WHERE ({gate}) % 32 = 0
        UNION
        SELECT doc_id, CAST(length(text) AS BIGINT) AS i FROM d
    ),
    spans AS (
        SELECT doc_id,
               COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1
                   AS s,
               i AS e
        FROM bnd
    ),
    chunks AS (
        SELECT sp.doc_id, d.source,
               {chunk_hash} AS ch,
               sp.e - sp.s + 1 AS clen
        FROM spans sp JOIN d ON sp.doc_id = d.doc_id
        WHERE sp.e >= sp.s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_chunks,
           CAST(COUNT(DISTINCT ch) AS BIGINT) AS distinct_chunks,
           1.0 - CAST(COUNT(DISTINCT ch) AS DOUBLE) / COUNT(*)
               AS dup_chunk_ratio,
           CAST(SUM(clen) AS DOUBLE) / COUNT(*) AS avg_chunk_len
    FROM chunks
    GROUP BY 1
    """


@register(
    "cdc_chunk_dedup",
    oracle=_cdc_chunk_sql(
        "('0x' || substr(md5({x}), 1, 15))::BIGINT",
        "SELECT doc_id, text, unnest(range(8, CAST(length(text) AS BIGINT)"
        " + 1)) AS i FROM d WHERE length(text) >= 8",
    ),
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rsync/borg/casync-style): chunk
    boundaries fall where the hash of the trailing 8-gram passes a
    1-in-32 gate, so identical substrings chunk identically REGARDLESS
    of their byte offset — the insertion-robust dedup primitive that
    fixed-size blocks can't provide. Per source: chunk count, distinct
    chunk hashes and the duplicate-chunk ratio (the storage savings a
    content-addressed store would realize), on a deterministic 20% doc
    sample. Complements dup_ngram_spans (which reports overlap spans)
    with the storage-layer view.

    Scale posture: the position explode is one narrow pass (len(text)
    rows per doc, gate applied immediately — ~1/32 survive), spans come
    from one doc-keyed window, and chunks re-slice the doc row by
    offsets; everything shuffles on doc_id once. Exact: integer
    positions, md5 gates, exact divisions — no rounding."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        _cdc_chunk_sql(
            "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)",
            "SELECT doc_id, text, explode(sequence(8, length(text))) AS i"
            " FROM d WHERE length(text) >= 8",
        )
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               CAST(len(regexp_extract_all(lower(text),
                    '([a-z]+|[0-9]+|[^a-z0-9\\s])', 1)) AS BIGINT)
                   AS n_tok,
               CAST(len(regexp_extract_all(trim(text), '\\S+', 0))
                    AS BIGINT) AS n_words,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / SUM(n_words) AS fertility,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tok) AS chars_per_token
    FROM per_doc
    GROUP BY 1
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: tokens-per-word and
    chars-per-token under the family's BPE-ish tokenizer — the
    multilingual-mix diagnostic that decides whether a tokenizer taxes
    some languages more than others (high fertility = more tokens per
    word = higher training/inference cost per byte of that language).
    Complements corpus_mix_rates (which weighs sources by tokens) with
    the per-language efficiency read that should inform those weights.

    One narrow pass (two regexp token counts per doc) into a
    |languages|-row aggregate; integer sums, exact final divisions —
    no rounding."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(bpe_ish_tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        F.size(
            F.regexp_extract_all(F.trim(F.col("text")), F.lit("\\S+"), 0)
        )
        .cast("bigint")
        .alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        (F.sum("n_tok").cast("double") / F.sum("n_words")).alias("fertility"),
        (F.sum("n_chars").cast("double") / F.sum("n_tok")).alias(
            "chars_per_token"
        ),
    )


def _zipf_sql(tok_select: str) -> str:
    """Shared Zipf-fit SQL body; ``tok_select`` yields (tok) one row per
    token occurrence (dialect explode spelling)."""
    return f"""
    WITH toks AS ({tok_select}),
    freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks
        WHERE tok <> '' GROUP BY 1
    ),
    top AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
        FROM freq
    ),
    pts AS (
        SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y, r
        FROM top WHERE r <= 1000
    ),
    folded AS (
        SELECT CAST(row_number() OVER (ORDER BY r) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS k,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x * x) OVER w AS sxx, SUM(x * y) OVER w AS sxy,
               SUM(y * y) OVER w AS syy
        FROM pts
        WINDOW w AS (ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    m AS (
        SELECT CAST(k AS DOUBLE) AS n, sx, sy, sxx, sxy, syy
        FROM folded WHERE rn = k
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS log_intercept,
           (n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r_squared
    FROM m
    """


@register(
    "zipf_law_fit",
    oracle=_zipf_sql(
        "SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok"
        " FROM documents"
    ),
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token distribution: OLS of
    log-frequency on log-rank across the top-1000 token ranks, with the
    slope (Zipf exponent, ~-1 for natural language), intercept and R^2.
    The corpus-law diagnostic that flags machine-generated or templated
    text (too-flat or too-steep slope, low R^2) before it pollutes
    training mixes — complements gopher_repetition_signals (per-doc)
    with the corpus-level read.

    Shape: one token explode + frequency aggregate (the vocab-sized
    shuffle every text query here uses), a top-1000 rank, and an ordered
    cumulative moment fold (sequential adds in rank order, identical
    cross-engine) — emitted unrounded."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "zipf_documents"
    )
    return spark.sql(
        _zipf_sql(
            "SELECT explode(split(lower(trim(text)), '\\\\s+')) AS tok"
            " FROM zipf_documents"
        )
    )
