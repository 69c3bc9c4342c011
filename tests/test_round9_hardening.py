"""Round-9 hardening regressions.

Pins the invariants the round-9 performance work leans on:

1. Norm hoisting is BIT-exact: the cosine emitted by ``cosine_topk``
   (per-row hoisted norms, ``valid_with_norm``) equals the unfused
   ``cosine()`` expression recomputed per pair — exact ``==``, not
   approx (oracle hashes depend on it).
2. The validity guard evaluates the O(dim) norm fold exactly ONCE per
   row: the physical plan of ``valid_with_norm`` contains a single
   ``aggregate(`` (the projection's fold). The first r9 shape filtered
   on a projected n2 alias; Catalyst substituted it and cloned the fold
   into the interpreted Filter three times.
3. ``lsh_bucket`` string form (one JVM-parsed expression) computes the
   identical bucket as the Column-object form.
4. ``_nearest_centroid_expr`` reads its array_max exactly once (the
   when(best.s.isNotNull()) form evaluated the k-centroid scoring array
   twice per row — conditional branches are not CSE'd).
5. Wrong-dimension vectors assign NULL (never the smallest centroid
   id); degenerate zero-norm centroids stay in the codebook but never
   win (ADVICE r8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_example_spark.functions.similarity import (
    cosine,
    cosine_topk,
    lsh_bucket,
    valid_with_norm,
)


def _emb(spark):
    rows = [
        (i, [((i * 31 + d * 7) % 97 - 48) / 16.0 for d in range(8)])
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def test_hoisted_norm_cosine_is_bit_exact(spark):
    emb = _emb(spark)
    q = emb.filter("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in cosine_topk(emb, q, k=5).collect()
    }
    # recompute with the unfused per-pair expression
    ref = (
        emb.selectExpr("vec_id AS neighbor_id", "embedding AS _cv")
        .crossJoin(
            q.selectExpr("query_id", "embedding AS _qv")
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("c"),
        )
        .collect()
    )
    ref = {(r["query_id"], r["neighbor_id"]): r["c"] for r in ref}
    assert got  # top-k nonempty
    for key, v in got.items():
        assert v == ref[key]  # exact doubles, no tolerance


def test_validity_guard_single_fold_in_plan(spark):
    emb = _emb(spark)
    plan = (
        valid_with_norm(emb, "embedding", "_en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("aggregate(") == 1


def test_lsh_bucket_string_and_column_forms_agree(spark):
    emb = _emb(spark)
    both = emb.select(
        lsh_bucket("embedding", 6, 8, plane_offset=3).alias("s"),
        lsh_bucket(F.col("embedding"), 6, 8, plane_offset=3).alias("c"),
    ).collect()
    assert all(r["s"] == r["c"] for r in both)


def test_nearest_centroid_expr_single_array_max():
    from dataflow_example_spark.functions.similarity import (
        _nearest_centroid_expr,
    )

    expr = str(
        _nearest_centroid_expr([(0, [1.0, 0.0]), (1, [0.0, 1.0])], "v", "_n")
    )
    assert expr.count("array_max") == 1


def test_wrong_dim_assigns_null_and_degenerate_centroid_never_wins(spark):
    from dataflow_example_spark.functions.similarity import (
        assign_ivf_lists,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5, 0.5])],
        "vec_id bigint, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])],  # cid 0 is zero-norm
        "cid bigint, cv array<float>",
    )
    got = {
        r["vec_id"]: r["list_id"]
        for r in assign_ivf_lists(emb, cents).collect()
    }
    assert got[1] == 1  # degenerate cid 0 did not win by tie-break
    assert got[2] is None  # wrong-dim -> NULL, not smallest cid
