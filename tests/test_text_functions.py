"""Unit tests for functions/text.py on tiny in-memory documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataflow_example_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
    tokens,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tokenizer_contract(spark):
    df = spark.createDataFrame([("Hello,  World!! 42-x",)], "text string")
    [row] = df.select(tokens(F.col("text")).alias("t")).collect()
    assert row.t == ["hello", "world", "42", "x"]


def test_token_stats_exact(spark):
    out = token_stats(docs(spark, [(1, "a bb a")])).collect()[0]
    assert out.n_tokens == 3
    assert out.n_distinct_tokens == 2
    assert out.n_chars == 6
    assert out.avg_token_len == pytest.approx(4 / 3)
    assert out.type_token_ratio == pytest.approx(2 / 3)


def test_language_id_votes_and_tiebreak(spark):
    out = {
        r.doc_id: r.lang_pred
        for r in language_id(
            docs(
                spark,
                [
                    (1, "the cat is in the hat"),  # en
                    (2, "el que no la de y en un"),  # es
                    (3, "zzz qqq www"),  # no hits -> und
                    (4, "de"),  # es and fr hit once each -> alphabetical: es
                ],
            )
        ).collect()
    }
    assert out == {1: "en", 2: "es", 3: "und", 4: "es"}


def test_quality_score_ratios(spark):
    out = quality_score(docs(spark, [(1, "the dog! 42")])).collect()[0]
    # tokens: the, dog, 42 ; en-stopword hits: the
    assert out.stopword_ratio == pytest.approx(1 / 3)
    # punctuation: '!' only (alnum + space removed)
    assert out.punct_ratio == pytest.approx(1 / 11)
    assert out.digit_ratio == pytest.approx(2 / 11)


def test_fingerprint_matches_normalized_stream(spark):
    # same token stream after normalization -> identical fingerprints
    out = fingerprint(
        docs(spark, [(1, "Hello  World"), (2, "hello world"), (3, "other")])
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].fingerprint_md5 == by_id[2].fingerprint_md5
    assert by_id[1].fingerprint32 == by_id[2].fingerprint32
    assert by_id[1].fingerprint_md5 != by_id[3].fingerprint_md5
    assert 0 <= by_id[1].fingerprint32 < 2**32


def test_fingerprint_bounded_split_parity(spark):
    """The r15 bounded split (limit = prefix_tokens + 2) must equal the
    old full-split-then-slice form on every boundary shape: leading/
    trailing separators, exactly P / P+1 / P+2 tokens, fewer than P
    tokens, empty and separator-only strings."""
    p = 3  # small prefix keeps the boundary cases readable
    cases = [
        (1, "a b c d e f"),            # > P+2 tokens
        (2, "  a b c d e"),            # leading separators, P+2 tokens
        (3, "a b c"),                  # exactly P
        (4, "a b c!!!"),               # exactly P + trailing separators
        (5, "a b c d"),                # P+1
        (6, "a b"),                    # < P
        (7, ""),                       # empty
        (8, "!!! ??? ..."),            # separators only
        (9, "--a--b--c--d--e--"),      # collapsed separator runs
        (10, None),                    # NULL text
    ]
    bounded = fingerprint(docs(spark, cases), prefix_tokens=p).collect()
    # reference: the pre-r15 shape — full tokenize, then slice
    from dataflow_example_spark.functions.text import tokens

    ref = (
        docs(spark, cases)
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, p))
            ).alias("fingerprint_md5"),
        )
        .collect()
    )
    got = {r.doc_id: r.fingerprint_md5 for r in bounded}
    want = {r.doc_id: r.fingerprint_md5 for r in ref}
    assert got == want


def test_chunk_documents_overlap_and_tail(spark):
    """chunk=4, stride=2 over 7 tokens: starts 1,3,5,7 -> overlapping
    chunks with a short tail; every token covered."""
    from dataflow_example_spark.functions.text import chunk_documents

    d = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "")], "doc_id bigint, text string"
    )
    out = chunk_documents(d, chunk_tokens=4, stride=2).collect()
    got = {(r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in out}
    assert got == {
        (0, "a b c d", 4),
        (1, "c d e f", 4),
        (2, "e f g", 3),
        (3, "g", 1),
    }
    assert all(r.doc_id == 1 for r in out)  # empty doc yields no chunks


def test_salient_terms_ranking(spark):
    """A term unique to one doc outranks a corpus-wide term (df in the
    denominator), ties break alphabetically."""
    from dataflow_example_spark.functions.text import salient_terms

    d = spark.createDataFrame(
        [
            (1, "shared shared unique"),
            (2, "shared other"),
            (3, "shared other"),
        ],
        "doc_id bigint, text string",
    )
    out = salient_terms(d, k=2).collect()
    top1 = {r.doc_id: r.term for r in out if r.rank == 1}
    # doc 1: unique (tf 1, df 1 -> 3.0) beats shared (tf 2, df 3 -> 2.0)
    assert top1[1] == "unique"
    # docs 2/3: other (df 2 -> 1.5) beats shared (df 3 -> 1.0)
    assert top1[2] == "other" and top1[3] == "other"


def test_pack_documents_offsets_and_straddle(spark):
    """Offsets are per-group prefix sums; a doc straddling a window
    boundary reports every window it covers."""
    from dataflow_example_spark.functions.packing import pack_documents

    d = spark.createDataFrame(
        [
            (1, "en", "a b c"),            # 3 tokens, offset 0, bin 0
            (2, "en", "d e f g"),          # 4 tokens, offset 3, bins 0-1
            (3, "en", "h i"),              # 2 tokens, offset 7, bin 1
            (4, "de", "x y z w"),          # own group, offset 0
        ],
        "doc_id bigint, lang string, text string",
    )
    out = {
        r.doc_id: (r.group, r.start_offset, r.first_bin, r.last_bin, r.n_bins)
        for r in pack_documents(d, budget=4).collect()
    }
    assert out[1] == ("en", 0, 0, 0, 1)
    assert out[2] == ("en", 3, 0, 1, 2)  # straddles windows 0 and 1
    assert out[3] == ("en", 7, 1, 2, 2)
    assert out[4] == ("de", 0, 0, 0, 1)


def test_sentence_udtf_matches_native(spark):
    """Python UDTF splitter == native transform/filter/posexplode path
    (the UDTF is the extensibility demo; the native form is the hot
    path)."""
    from dataflow_example_spark.functions.text import (
        sentence_udtf,
        split_sentences,
    )

    d = spark.createDataFrame(
        [
            (1, "First one. Second!  Third?No space"),
            (2, "no terminator at all"),
            (3, "..."),
        ],
        "doc_id bigint, text string",
    )
    native = {
        (r.doc_id, r.sent_idx, r.sentence)
        for r in split_sentences(d).collect()
    }
    spark.udtf.register("split_sentences_udtf", sentence_udtf())
    d.createOrReplaceTempView("udtf_docs")
    via_udtf = {
        (r.doc_id, r.sent_idx, r.sentence)
        for r in spark.sql(
            """
            SELECT doc_id, s.sent_idx, s.sentence
            FROM udtf_docs, LATERAL split_sentences_udtf(text) s
            """
        ).collect()
    }
    assert native == via_udtf
    assert (3, 0, "...") not in native  # punctuation-only -> no sentences
    assert (1, 3, "No space") in native


def test_pack_documents_two_pass_equals_single_window(spark):
    """The range-partitioned two-pass prefix sum must equal the
    straightforward one-window-per-group prefix sum, including when a
    group's stream spans many range partitions."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataflow_example_spark.functions.packing import pack_documents

    rows = [
        (i, "en" if i % 3 else "de", "tok " * (1 + i % 7))
        for i in range(500)
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")

    got = {
        (r.group, r.doc_id): (r.n_tokens, r.start_offset, r.first_bin,
                              r.last_bin, r.n_bins)
        for r in pack_documents(d, budget=16).collect()
    }

    from dataflow_example_spark.functions.text import tokens

    base = d.select(
        F.col("lang").alias("group"),
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = base.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    want = {}
    for r in ref.collect():
        first = r.start_offset // 16
        last = (r.start_offset + r.n_tokens - 1) // 16
        want[(r.group, r.doc_id)] = (
            r.n_tokens, r.start_offset, first, last, last - first + 1
        )
    assert got == want


def test_repetition_stats_known_values(spark):
    from dataflow_example_spark.functions.text import repetition_stats

    d = spark.createDataFrame(
        [
            (1, "a a a b"),           # bigrams: "a a" x2, "a b" -> top 2/3
            (2, "one two three four five six"),  # all distinct
            (3, "solo"),              # no bigrams
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(d).collect()}
    r1 = got[1]
    assert r1.n_tokens == 4
    assert abs(r1.dup_token_frac - 0.5) < 1e-15
    assert r1.top_bigram_count == 2
    assert abs(r1.top_bigram_frac - 2 / 3) < 1e-15
    assert not r1.keep  # < 5 tokens
    r2 = got[2]
    assert r2.dup_token_frac == 0.0 and r2.keep
    r3 = got[3]
    assert r3.top_bigram_count == 0 and r3.top_bigram_frac == 0.0


def test_pii_redact_detects_and_passes_through(spark):
    from dataflow_example_spark.functions.text import pii_redact

    d = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@mail.example.org or +43123456789 ok"),
            (2, "no pii here, just text with an at sign @ alone"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in pii_redact(d).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert got[1].redacted == "reach me at <EMAIL> or <PHONE> ok"
    assert got[2].n_emails == 0 and got[2].n_phones == 0
    assert got[2].redacted.endswith("@ alone")


def test_unigram_surprisal_known_distribution(spark):
    import math

    from dataflow_example_spark.functions.text import unigram_surprisal

    # corpus: "a" x3, "b" x1 -> p(a)=3/4, p(b)=1/4
    d = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in unigram_surprisal(d).collect()}
    assert got[1].n_tokens == 3
    assert abs(got[1].avg_surprisal - (-math.log(0.75))) < 1e-12
    assert abs(got[2].avg_surprisal - (-math.log(0.25))) < 1e-12
    # rare-token doc scores strictly higher
    assert got[2].avg_surprisal > got[1].avg_surprisal


def test_bigram_surprisal_known_corpus(spark):
    """Hand-checked bigram model: 'a b' occurs twice out of three
    'a _' contexts in the corpus -> -ln(2/3) for that bigram."""
    import math

    from dataflow_example_spark.functions.text import bigram_surprisal

    d = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a c")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal(d).collect()}
    # corpus bigrams: doc1 [a b, b c], doc2 [a b], doc3 [a c]
    # c(a .) = 3, c(b .) = 1; c(a b)=2, c(b c)=1, c(a c)=1
    s_ab = -math.log(2 / 3)
    s_bc = -math.log(1 / 1)
    s_ac = -math.log(1 / 3)
    assert out[1].n_bigrams == 2
    assert abs(out[1].avg_surprisal - (s_ab + s_bc) / 2) < 1e-12
    assert abs(out[2].avg_surprisal - s_ab) < 1e-12
    assert abs(out[3].avg_surprisal - s_ac) < 1e-12


def _trigram_expr_counts(df):
    """The pre-r15 expression form of docs_char_trigram_profile's
    counting stage — kept here as the parity reference for the
    char_trigram_counts mapInArrow kernel."""
    d2 = df.select("lang", F.lower(F.col("text")).alias("_t")).withColumn(
        "_tris",
        F.expr(
            "transform(sequence(1, greatest(length(_t) - 2, 0)),"
            " i -> substring(_t, i, 3))"
        ),
    )
    return (
        d2.select("lang", F.explode("_tris").alias("trigram"))
        .groupBy("lang", "trigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_char_trigram_counts_parity_adversarial(spark):
    """The kernel must replicate the expression form exactly —
    INCLUDING its edge semantics, which are part of the declared query
    results: short/empty docs emit the whole text twice (sequence(1,0)
    is the descending [1, 0]), NULL docs emit two NULL trigrams, and
    astral-plane chars count one position each (the rejected
    zero-width-regex variant split surrogate pairs; this corpus pins
    that divergence class)."""
    from dataflow_example_spark.functions.text import char_trigram_counts

    rows = [
        (1, "en", "abcdef"),
        (2, "en", "ab\ncd\nef"),                 # newlines
        (3, "em", "a\U0001F600b\U0001F600c"),    # astral chars
        (4, "em", "\U0001F600" * 4),             # all astral
        (5, "de", "héllo wörld"),
        (6, "de", "ééé"),      # combining accents
        (7, "xx", ""),                            # empty -> text twice
        (8, "xx", "ab"),                          # short -> text twice
        (9, "xx", None),                          # NULL -> 2 NULL rows
        (10, "en", "ABCdef"),                     # lowercasing JVM-side
        (11, None, "abc"),                        # NULL group
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    key = lambda t: (t[0] is None, t[0] or "", t[1] is None, t[1] or "", t[2])
    a = sorted(
        ((r.lang, r.trigram, r.n) for r in _trigram_expr_counts(df).collect()),
        key=key,
    )
    b = sorted(
        ((r.lang, r.trigram, r.n) for r in char_trigram_counts(df).collect()),
        key=key,
    )
    assert a == b, f"diverged: {[(x, y) for x, y in zip(a, b) if x != y][:5]}"
    # the edge semantics explicitly
    d = {(lang, tri): n for lang, tri, n in b}
    assert d[("xx", "")] == 2 and d[("xx", "ab")] == 2
    assert d[("xx", None)] == 2


def test_char_trigram_counts_parity_real_corpus(spark):
    from tests.conftest import SF_SMOKE
    from dataflow_example_spark.functions.text import char_trigram_counts

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = sorted(
        (r.lang, r.trigram, r.n) for r in _trigram_expr_counts(docs).collect()
    )
    b = sorted(
        (r.lang, r.trigram, r.n) for r in char_trigram_counts(docs).collect()
    )
    assert a == b
    assert len(b) > 100  # non-vacuous
