"""Text-analysis operators for large-scale training-data pipelines.

Not in the reference's surface (it is a retail platform) — added per the
engine's north star (BASELINE.json): language-ID, quality scoring, token
counting, document fingerprinting. Everything is built-in-function
expressions (JVM codegen, no Python UDFs) so a 100 TB documents table
processes at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately tiny + deterministic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "is", "in", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

PUNCT_CLASS = "[.,!?;:()\\[\\]'\"-]"


def tokens(col: Column) -> Column:
    """Whitespace tokens (lowercased)."""
    return F.split(F.lower(F.trim(col)), "\\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single symbols."""
    return F.regexp_extract_all(
        F.lower(col), F.lit("([a-z]+|[0-9]+|[^a-z0-9\\s])"), 1
    )


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    """How many whitespace tokens are in the stopword set."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def char_class_ratio(col: Column, pattern: str) -> Column:
    """Fraction of characters matching a regex char class."""
    n = F.length(col)
    kept = F.length(F.regexp_replace(col, pattern, ""))
    return F.when(n > 0, (n - kept).cast("double") / n).otherwise(0.0)


def text_quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: penalize very short texts, high
    punctuation/digit density, low stopword density (word-salad signal)."""
    n_tok = token_count(col)
    sw_ratio = stopword_hits(col, LANG_STOPWORDS["en"]).cast("double") / F.greatest(
        n_tok, F.lit(1)
    )
    punct = char_class_ratio(col, PUNCT_CLASS)
    digits = char_class_ratio(col, "[0-9]")
    length_ok = F.when(n_tok >= 20, 1.0).when(n_tok >= 5, 0.5).otherwise(0.0)
    score = (
        0.4 * length_ok
        + 0.3 * F.least(sw_ratio * 5, F.lit(1.0))
        + 0.15 * (1 - F.least(punct * 10, F.lit(1.0)))
        + 0.15 * (1 - F.least(digits * 10, F.lit(1.0)))
    )
    return F.round(score, 6)


def language_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(col, sw) for lang, sw in LANG_STOPWORDS.items()}


def detect_language(col: Column, default: str = "unknown") -> Column:
    """Pick the language whose stopword set hits most (ties: en>de>fr>es
    order; zero hits → default)."""
    scores = language_scores(col)
    order = list(LANG_STOPWORDS)
    # First-match priority: a language wins if it has ≥1 hit and strictly
    # beats every earlier language in the preference order (en>de>fr>es).
    expr = F.lit(default)
    for lang in reversed(order):
        cond = scores[lang] >= F.lit(1)
        for better in order[: order.index(lang)]:
            cond = cond & (scores[lang] > scores[better])
        expr = F.when(cond, lang).otherwise(expr)
    return expr


def normalized_fingerprint(col: Column) -> Column:
    """md5 of lowercase, whitespace-collapsed text — exact-dup fingerprint."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), "\\s+", " "))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    return (
        df.withColumn("n_chars_calc", F.length(c))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.round(
                (F.length(F.regexp_replace(F.trim(c), "\\s+", "")).cast("double"))
                / F.greatest(n_tok, F.lit(1)),
                6,
            ),
        )
        .withColumn("punct_ratio", F.round(char_class_ratio(c, PUNCT_CLASS), 6))
        .withColumn("digit_ratio", F.round(char_class_ratio(c, "[0-9]"), 6))
        .withColumn(
            "stopword_ratio",
            F.round(
                stopword_hits(c, LANG_STOPWORDS["en"]).cast("double")
                / F.greatest(n_tok, F.lit(1)),
                6,
            ),
        )
        .withColumn("quality_score", text_quality_score(c))
    )


# --- PII redaction ----------------------------------------------------------
# Patterns restricted to syntax both Java regex (Spark) and RE2 (DuckDB)
# support identically: no lookaround, no backrefs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\+\d{1,3}-\d{3}-\d{4}", "[PHONE]"),
}

_PII_ORDER = ("email", "ipv4", "phone")


def redact_pii(col: Column) -> Column:
    """Replace email / IPv4 / phone matches with typed placeholders, in a
    fixed order (email first: an address contains dots that the IP pattern
    could otherwise half-match). Pure regexp_replace chain — codegen'd,
    no UDF."""
    out = col
    for name in _PII_ORDER:
        pat, repl = PII_PATTERNS[name]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Match counts per PII category (regexp_extract_all sizes)."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[name][0]), 0))
        for name in _PII_ORDER
    }
