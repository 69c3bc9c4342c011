"""Unit tests for functions/dedup.py on tiny in-memory documents."""

from __future__ import annotations

import pytest

from dataflow_example_spark.functions.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash_pairs,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(spark):
    out = exact_dedup(
        docs(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    ).collect()
    by_rep = {r.doc_id: r.n_dups for r in out}
    assert by_rep == {1: 2, 3: 1}


def test_shingles_k3(spark):
    out = shingles(docs(spark, [(1, "a b c d"), (2, "a b")]), k=3).collect()
    got = {(r.doc_id, r.shingle) for r in out}
    # doc 2 has < 3 tokens -> no shingles at all
    assert got == {(1, "a b c"), (1, "b c d")}


def test_jaccard_exact_value(spark):
    # doc1: {a b c, b c d}; doc2: {a b c, b c e} -> jaccard = 1/3
    out = jaccard_pairs(
        docs(spark, [(1, "a b c d"), (2, "a b c e")]), k=3, threshold=0.0
    ).collect()
    assert len(out) == 1
    assert out[0].doc_a == 1 and out[0].doc_b == 2
    assert out[0].jaccard == pytest.approx(1 / 3)


def test_minhash_lsh_finds_identical_docs(spark):
    out = minhash_lsh_pairs(
        docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "completely different words appear in this line"),
            ],
        )
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in out}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_docs_distance_zero(spark):
    out = simhash_pairs(
        docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma")]),
        max_hamming=0,
    ).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in out] == [(1, 2, 0)]


def test_connected_components_known_graph(spark):
    """Chain 1-2-3-4 (one component), pair 10-11, triangle 20-21-22 with
    redundant edge — min-label propagation must cross the whole chain."""
    from dataflow_example_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a LONG, doc_b LONG",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
