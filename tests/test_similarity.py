"""Unit tests for functions/similarity.py on tiny in-memory vectors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataflow_example_spark.functions.similarity import (
    cosine,
    cosine_near_dup_pairs,
    cosine_topk,
    lsh_topk,
)


def vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_cosine_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    [row] = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert row.c == pytest.approx(1 / math.sqrt(2))


def test_cosine_topk_ranks_and_ties(spark):
    emb = vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),  # identical to query -> cos 1
            (2, [0.0, 1.0]),  # orthogonal -> cos 0
            (3, [1.0, 1.0]),  # cos 1/sqrt(2)
        ],
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, q, k=3).collect()
    assert [(r.neighbor_id, r.rank) for r in out] == [(1, 1), (3, 2), (2, 3)]


def test_lsh_topk_subset_of_exact(spark):
    emb = vecs(
        spark,
        [(i, [float((i * 7 + d) % 5 - 2) for d in range(8)]) for i in range(30)],
    )
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim)
        for r in cosine_topk(emb, q, k=30).collect()
    }
    approx = lsh_topk(emb, q, k=5, n_planes=4, dim=8).collect()
    # every LSH result is a genuine (query, neighbor, cosine) from the
    # exact scoring — LSH only restricts the candidate set
    for r in approx:
        assert (r.query_id, r.neighbor_id, r.cosine_sim) in exact


def test_near_dup_pairs_threshold(spark):
    emb = vecs(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])])
    out = cosine_near_dup_pairs(emb, threshold=0.99)
    assert [(r.id_a, r.id_b) for r in out.collect()] == [(1, 2)]
