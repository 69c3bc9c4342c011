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
