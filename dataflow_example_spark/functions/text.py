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
        # try_divide: zero-token documents get NULL ratios (NULL-and-drop)
        # instead of ANSI DIVIDE_BY_ZERO
        F.try_divide(
            F.aggregate(
                "_t", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
            ).cast("double"),
            F.size("_t"),
        ).alias("avg_token_len"),
        F.try_divide(
            F.size(F.array_distinct("_t")).cast("double"), F.size("_t")
        ).alias("type_token_ratio"),
    )


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """n-gram/stopword language heuristic: most stopword hits wins;
    alphabetical language order breaks ties; 'und' when no hits.

    ``extra_cols`` passes source columns through — the heuristic is a
    row-wise map, so callers needing e.g. the labeled ``lang`` beside
    the prediction must not join back on doc_id (a full-corpus shuffle
    for a column the same scan already held; see ``fingerprint``)."""
    toks = tokens(F.col(text_col))
    t = docs.select("doc_id", *extra_cols, toks.alias("_t"))
    hits = {lang: _stopword_hits(F.col("_t"), lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(STOPWORDS):  # alphabetical preference on ties
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return t.select(
        "doc_id",
        *extra_cols,
        *[hits[lang].cast("bigint").alias(f"hits_{lang}") for lang in sorted(STOPWORDS)],
        pred.alias("lang_pred"),
    )


def quality_score(
    docs: DataFrame,
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, punctuation ratio, digit
    ratio, length saturation — combined with dyadic weights so the score is
    a deterministic double.

    ``extra_cols`` passes source columns through — the score is a
    row-wise map, so callers needing e.g. ``lang``/``n_chars`` beside it
    must not join back on doc_id (see ``fingerprint``)."""
    c = F.col(text_col)
    toks = tokens(c)
    t = docs.select(
        "doc_id",
        *extra_cols,
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
        *extra_cols,
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        len_sat.alias("length_saturation"),
        score.alias("quality_score"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window packing primitive of an LLM ingest pipeline
    (chunk i covers tokens [1 + i*stride, 1 + i*stride + chunk_tokens)).

    Chunk starts step by ``stride`` while they stay <= n_tokens, so every
    token is covered and consecutive chunks overlap by
    ``chunk_tokens - stride``; the final chunks may be short. One explode
    per chunk — no Python, no shuffle (the fan-out is map-side); the token
    array is materialized before the slice lambda (higher-order functions
    run interpreted and would otherwise re-tokenize per chunk).
    """
    toks = tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("_t")).filter(F.size("_t") > 0)
    starts = F.sequence(F.lit(1), F.size("_t"), F.lit(stride))
    chunked = base.select(
        "doc_id", "_t", F.posexplode(starts).alias("chunk_idx", "_s")
    )
    piece = F.slice(F.col("_t"), F.col("_s"), chunk_tokens)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
    )


def salient_terms(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k salient terms per document by document-frequency-normalized
    term frequency: salience = tf * N / df (the log-free TF-IDF variant —
    rankings match TF-IDF's because ln is monotone; kept log-free so both
    engines compute bit-identical doubles). Ties break on the term.

    Plan: one explode -> (doc, term) tf aggregate; df is a second
    aggregate OVER THE TF TABLE (each (doc, term) appears once, so
    count(*) per term == distinct-doc count — no countDistinct shuffle of
    raw tokens); N is a 1-row broadcast.
    """
    from pyspark.sql.window import Window

    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.persist()
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.col("_n").cast("double")
                / F.col("df").cast("double")
            ).alias("salience"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("salience"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "salience", "rank")
    )


def vocab_top_terms(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary heavy hitters: top-k terms by document frequency
    (ties on the term), with total occurrence counts — the vocabulary /
    tokenizer-training statistic. Two-level aggregate: (doc, term) dedup
    first (map-side partial), then per-term counts; at 100 TB this is the
    standard two-shuffle heavy-hitter plan, and the top-k is a
    driver-bounded k rows."""
    from pyspark.sql.window import Window

    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    )
    per_doc = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )
    # orderBy + limit plans as TakeOrderedAndProject (each partition keeps
    # its local top-k, the driver merges k*p rows) — never a global
    # single-partition window sort over the whole vocabulary. The rank
    # window then runs over k rows only.
    topk = stats.orderBy(F.desc("doc_freq"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("doc_freq"), F.asc("term"))
    return topk.select(
        "term", "doc_freq", "total_tf", F.row_number().over(w).alias("rank")
    )


def split_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Sentence segmentation, native path: split on sentence-ending
    punctuation runs, trim, drop empties — one posexplode, fully
    codegen. Returns (doc_id, sent_idx, sentence)."""
    sents = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    return docs.select(
        "doc_id", F.posexplode(sents).alias("sent_idx", "sentence")
    )


def sentence_udtf():
    """Python UDTF twin of ``split_sentences`` (Spark 3.5+/4 @udtf API):
    the extensibility demo for row-to-rows logic that can't be expressed
    in column expressions. Row-at-a-time Python — the SLOW path; tests
    assert it matches the native version, which remains the hot-path
    implementation. Register with
    ``spark.udtf.register("split_sentences", sentence_udtf())``."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for part in re.split(r"[.!?]+", text):
                part = part.strip()
                if part:
                    yield (idx, part)
                    idx += 1

    return SplitSentences


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    prefix_tokens: int | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Content fingerprints: md5 of the normalized token stream (hex), plus
    a 32-bit numeric fingerprint (first 8 hex digits) for compact
    join/bucket keys. ``prefix_tokens`` fingerprints only the first N
    normalized tokens — the standard coarse key for eval-leakage /
    decontamination checks, where near-dups share openings but diverge
    later.

    ``extra_cols`` passes source columns through the projection — the
    fingerprint is a row-wise map, so callers needing e.g. ``source``
    alongside it must NOT compute it narrow and join back on doc_id
    (that join shuffles the full corpus twice for columns the same scan
    already held; r10 removed exactly that shape from four queries)."""
    if prefix_tokens is not None:
        # Bounded tokenization (r15): only the first ``prefix_tokens``
        # tokens are needed, so cap the regex split at
        # ``prefix_tokens + 2`` elements instead of tokenizing the whole
        # document and slicing — at corpus scale the old shape paid a
        # full-text regex split per row for a 12-token key. With a
        # positive limit, Java split semantics apply the pattern at most
        # limit-1 times and park the untouched remainder in the last
        # element; +2 budgets one possible leading empty element (runs
        # of separators collapse, so there is at most one) and the
        # remainder slot, so after array_remove(.., '') the first
        # ``prefix_tokens`` elements are exactly the full-split prefix:
        # documents with <= prefix_tokens+1 tokens never hit the limit
        # (identical split), longer ones park token prefix_tokens+1+rest
        # in the final slot, which slice() drops. Equality with the
        # unbounded form is pinned by
        # tests/test_text_functions.py::test_fingerprint_bounded_split_parity.
        toks = F.slice(
            F.array_remove(
                F.split(
                    F.lower(F.col(text_col)),
                    "[^a-z0-9]+",
                    prefix_tokens + 2,
                ),
                "",
            ),
            1,
            prefix_tokens,
        )
    else:
        toks = tokens(F.col(text_col))
    norm = F.concat_ws(" ", toks)
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        *extra_cols,
        fp.alias("fingerprint_md5"),
        F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint").alias("fingerprint32"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition / boilerplate metrics per document — the Gopher-rules
    family (Rae et al. 2021, "Scaling Language Models", App. A1.1),
    adapted to token granularity (the fixtures are single-line):

    - ``dup_token_frac``: 1 - distinct/total tokens (MassiveWeb's
      duplicate-line fraction, at token level)
    - ``top_bigram_frac``: fraction of all bigrams taken by the most
      frequent bigram (Gopher's top-n-gram character fraction)
    - ``keep``: the composite filter verdict with Gopher-like bounds

    All native expressions; the per-doc bigram mode is an O(d^2) lambda
    over the (bounded-length) document's own bigram array — document
    length bounds it, corpus size never does, so the scan stays linear
    at 100 TB with zero shuffle.
    """
    toks = tokens(F.col(text_col))
    t = docs.select("doc_id", toks.alias("_t"))
    n = F.size("_t")
    # guard: sequence(0, n-2) would count DOWN for n < 2
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat(
                F.element_at("_t", i + 1), F.lit(" "), F.element_at("_t", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select("doc_id", "_t", grams.alias("_g"))
    top = F.array_max(
        F.transform(
            F.array_distinct("_g"),
            lambda d: F.size(F.filter("_g", lambda x: x == d)),
        )
    )
    out = g.select(
        "doc_id",
        F.size("_t").cast("bigint").alias("n_tokens"),
        # try_divide: zero-token documents have no defined duplicate
        # fraction -> NULL (the keep verdict below then also NULLs)
        (
            F.lit(1.0)
            - F.try_divide(
                F.size(F.array_distinct("_t")).cast("double"), F.size("_t")
            )
        ).alias("dup_token_frac"),
        F.coalesce(top, F.lit(0)).cast("bigint").alias("top_bigram_count"),
        F.when(F.size("_g") > 0, top.cast("double") / F.size("_g"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )
    return out.select(
        "*",
        (
            (F.col("n_tokens") >= 5)
            & (F.col("dup_token_frac") < 0.6)
            # a bigram seen once is not repetition, whatever its share of
            # a short document's few bigrams
            & (
                (F.col("top_bigram_count") <= 1)
                | (F.col("top_bigram_frac") < 0.2)
            )
        ).alias("keep"),
    )


# portable across Java regex (Spark) and RE2 (DuckDB): no backrefs, no
# lookaround
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE_RE = "[+][0-9]{8,15}"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction: count and replace email addresses and
    E.164-style phone numbers with typed placeholders. Pure regex column
    expressions (one linear scan, no shuffle); the patterns are written to
    the common subset of Java regex and RE2 so the DuckDB oracle runs the
    byte-identical rule."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        F.regexp_count(c, F.lit(PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(c, F.lit(PII_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


def unigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean unigram surprisal (-ln p(token) under the
    corpus's own unigram distribution) — the zero-model stand-in for the
    LM-perplexity quality signal (CCNet-style filtering plugs a real LM
    into the same per-document-score contract). High scores = rare-token
    documents (noise, boilerplate codes); low = stopword soup.

    Plan: explode to (doc, term) -> corpus vocab aggregate -> hash join
    term->tf (vocab is corpus-wide: not forced broadcast, AQE may choose)
    -> per-doc mean via the pinned sorted fold, so the DuckDB oracle
    reproduces the double bit-for-bit (modulo ln's 1-ulp libm noise,
    which both the local gate and the driver's hash tolerate).
    """
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").cast("double").alias("_total"))
    scored = tok.join(vocab, "term").crossJoin(F.broadcast(total)).select(
        "doc_id",
        (-F.log(F.col("tf").cast("double") / F.col("_total"))).alias("_s"),
    )
    folded = F.aggregate(
        F.sort_array(F.collect_list("_s")), F.lit(0.0), lambda a, x: a + x
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        (folded / F.count(F.lit(1))).alias("avg_surprisal"),
    )


def bigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean bigram surprisal -ln p(w2 | w1) under the
    corpus's own bigram model (MLE, no smoothing — every observed bigram
    has c12 <= c1 so p is always defined). One step up the n-gram ladder
    from ``unigram_surprisal`` toward the KenLM-style perplexity filter;
    catches locally-incoherent text (shuffled words) that unigram
    frequency cannot.

    Plan: explode token bigrams with multiplicity -> corpus bigram and
    context counts (two hash aggregates) -> join back -> per-doc mean via
    the pinned sorted fold (bit-identical doubles modulo libm ln noise).
    """
    toks = tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("_t")).filter(F.size("_t") >= 2)
    bg = F.transform(
        F.sequence(F.lit(1), F.size("_t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("_t"), i).alias("w1"),
            F.concat_ws(
                " ",
                F.element_at(F.col("_t"), i),
                F.element_at(F.col("_t"), i + 1),
            ).alias("bigram"),
        ),
    )
    pairs = base.select("doc_id", F.explode(bg).alias("p")).select(
        "doc_id", "p.w1", "p.bigram"
    )
    cb = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        pairs.join(cb, "bigram")
        .join(c1, "w1")
        .select(
            "doc_id",
            (
                -F.log(F.col("c12").cast("double") / F.col("c1").cast("double"))
            ).alias("_s"),
        )
    )
    folded = F.aggregate(
        F.sort_array(F.collect_list("_s")), F.lit(0.0), lambda a, x: a + x
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (folded / F.count(F.lit(1))).alias("avg_surprisal"),
    )


def char_trigram_counts(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-(group, trigram) counts over the lowercased text via a
    ``mapInArrow`` Python kernel — the bit-parity replacement (r15) for
    the expression form

        transform(sequence(1, greatest(length(_t) - 2, 0)),
                  i -> substring(_t, i, 3))  -> explode -> groupBy count

    whose per-position ``substring`` walks the UTF8String from the
    start each call: O(len^2) work per document (measured at sf0.1:
    the whole query ran as one 9.5 s single-task stage; the kernel is
    O(len) per document and min-of-6 same-JVM 5.87 -> 0.91 s).

    Exact-parity notes (the expression's EDGE semantics are part of the
    declared query results and are replicated deliberately):

    - ``len(text) < 3`` (including empty): ``greatest(len-2, 0) = 0``
      makes ``sequence(1, 0)`` the DESCENDING array [1, 0], so the
      expression emits the whole short text TWICE (``substring`` at
      positions 1 and 0 both return the full string) — the kernel adds
      count 2 for (group, text).
    - NULL text: same [1, 0] sequence over ``substring(NULL, ..)``
      emits two NULL trigrams — the kernel adds count 2 for
      (group, NULL).
    - Python ``str`` slicing and Spark ``substring``/``length`` both
      count CODE POINTS (astral-plane chars are one position on both
      sides), so regular rows match byte-for-byte. (A zero-width-regex
      alternative, ``regexp_extract_all('(?s)(?=(...))')``, was
      measured equally fast but REJECTED: Java advances empty matches
      by UTF-16 code unit, producing extra mid-surrogate trigrams on
      astral text — pinned in the parity test.)
    - Lowercasing stays JVM-side (``F.lower``) so locale/Unicode case
      mapping is identical to the expression path; the kernel never
      transforms the text, only slices it.

    Counts are exact integers (no float anywhere), so downstream
    aggregation order cannot perturb results. The input is conditionally
    widened (``layout.widen_if_narrow``) so the kernel parallelizes on
    single-row-group inputs — a no-op at warehouse scale.
    """
    import pyarrow as pa
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from .layout import widen_if_narrow

    src = widen_if_narrow(docs).select(
        F.col(group_col).alias("_g"), F.lower(F.col(text_col)).alias("_t")
    )

    def _kernel(batches):
        from collections import Counter

        for batch in batches:
            groups = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            cnt: Counter = Counter()
            for g, t in zip(groups, texts):
                if t is None or len(t) < 3:
                    # the expression's sequence(1, 0) == [1, 0] edge:
                    # two copies of the short text (or two NULLs)
                    cnt[(g, t)] += 2
                    continue
                for i in range(len(t) - 2):
                    cnt[(g, t[i : i + 3])] += 1
            if cnt:
                keys = list(cnt.keys())
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([k[0] for k in keys], type=pa.string()),
                        pa.array([k[1] for k in keys], type=pa.string()),
                        pa.array(
                            [cnt[k] for k in keys], type=pa.int64()
                        ),
                    ],
                    names=["_g", "trigram", "_pn"],
                )

    partial = src.mapInArrow(
        _kernel,
        StructType(
            [
                StructField("_g", StringType()),
                StructField("trigram", StringType()),
                StructField("_pn", LongType()),
            ]
        ),
    )
    return partial.groupBy(
        F.col("_g").alias(group_col), "trigram"
    ).agg(F.sum("_pn").alias("n"))
