"""Text-analysis operators for LLM-data pipelines (beyond-reference;
BASELINE.json north star). All native column expressions — at 100 TB these
run fully JVM-side inside whole-stage codegen, no Python in the hot path.

Tokenization contract (shared with the DuckDB oracles): lowercase, split
on runs of non-alphanumeric, drop empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword lists; the lang-id heuristic scores languages by
# stopword hits and is deterministic (argmax with alphabetical-language
# tie-break, 'und' when nothing matches).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
}


def tokens(col: Column) -> Column:
    """Tokenize per the shared contract."""
    return F.array_remove(F.split(F.lower(col), "[^a-z0-9]+"), "")


def _stopword_hits(toks: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts / distinct counts / length stats.

    ``n_tokens`` is a whitespace+regex token count; ``avg_token_len`` and
    type-token ratio are exact integer ratios cast to double.
    """
    toks = tokens(F.col(text_col))
    t = docs.select("doc_id", toks.alias("_t"), F.length(text_col).alias("n_chars"))
    return t.select(
        "doc_id",
        "n_chars",
        F.size("_t").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("_t")).cast("bigint").alias("n_distinct_tokens"),
        (
            F.aggregate("_t", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
            .cast("double")
            / F.size("_t")
        ).alias("avg_token_len"),
        (F.size(F.array_distinct("_t")).cast("double") / F.size("_t")).alias(
            "type_token_ratio"
        ),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language heuristic: most stopword hits wins;
    alphabetical language order breaks ties; 'und' when no hits."""
    toks = tokens(F.col(text_col))
    t = docs.select("doc_id", toks.alias("_t"))
    hits = {lang: _stopword_hits(F.col("_t"), lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(STOPWORDS):  # alphabetical preference on ties
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return t.select(
        "doc_id",
        *[hits[lang].cast("bigint").alias(f"hits_{lang}") for lang in sorted(STOPWORDS)],
        pred.alias("lang_pred"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: stopword ratio, punctuation ratio, digit
    ratio, length saturation — combined with dyadic weights so the score is
    a deterministic double."""
    c = F.col(text_col)
    toks = tokens(c)
    t = docs.select(
        "doc_id",
        F.length(c).alias("_len"),
        F.size(toks).alias("_nt"),
        _stopword_hits(toks, "en").alias("_stop"),
        F.length(F.regexp_replace(c, r"[a-zA-Z0-9 ]", "")).alias("_punct"),
        (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))).alias("_digit"),
    )
    stop_ratio = F.col("_stop").cast("double") / F.greatest(F.col("_nt"), F.lit(1))
    punct_ratio = F.col("_punct").cast("double") / F.greatest(F.col("_len"), F.lit(1))
    digit_ratio = F.col("_digit").cast("double") / F.greatest(F.col("_len"), F.lit(1))
    len_sat = F.least(F.col("_nt").cast("double") / F.lit(256.0), F.lit(1.0))
    score = (
        stop_ratio * F.lit(0.5)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.25)
        + len_sat * F.lit(0.25)
        - digit_ratio * F.lit(0.125)
    )
    return t.select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        len_sat.alias("length_saturation"),
        score.alias("quality_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of the normalized token stream (hex), plus
    a 32-bit numeric fingerprint (first 8 hex digits) for compact
    join/bucket keys."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint_md5"),
        F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint").alias("fingerprint32"),
    )
