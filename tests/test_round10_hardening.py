"""Round-10 hardening regressions.

Pins the invariants the round-10 performance work leans on:

1. ``minhash_lsh_pairs(scores=False)`` returns the IDENTICAL candidate
   pair set as the scored form (minus est_jaccard) — consumers that
   only need edges (connected components) must not see a different
   graph.
2. ``connected_components(dedupe_edges=False)`` labels a graph with
   duplicate and reversed edges identically to the deduped form (MIN is
   idempotent; the distinct is a cost knob, never a semantics knob).
3. ``_nearest_centroid_expr``'s O(1) cid gate is value-equivalent to
   the r9 ``IF(s IS NOT NULL, ...)`` form across the dirty-input
   classes (wrong dim, NULL vector, NULL component, zero norm, NaN
   component — Spark orders NaN > 0 as TRUE), and the expression text
   contains NO second copy of the dot fold (one ``zip_with`` per
   non-degenerate candidate).
4. Degenerate (zero-norm) and non-finite-norm centroids emit literal
   NULL struct fields — no dot fold at all — and a component-square
   overflow (array<double> codebook) still BUILDS (``_dlit`` CAST
   fallback) instead of raising at plan construction.
5. ``fingerprint`` / ``language_id`` / ``quality_score`` extra_cols
   passthrough equals the old join-back-on-doc_id shape value for
   value (the removed full-corpus joins must not have changed results).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataflow_example_spark.functions.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from dataflow_example_spark.functions.similarity import (
    _dlit,
    _nearest_centroid_expr,
)
from dataflow_example_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
)


def test_lsh_pairs_scores_false_same_pair_set(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    bare = minhash_lsh_pairs(docs, scores=False)
    assert bare.columns == ["doc_a", "doc_b"]
    assert {(r["doc_a"], r["doc_b"]) for r in bare.collect()} == scored


def test_cc_dedupe_edges_is_cost_only(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 2), (2, 1), (5, 6), (5, 6), (9, 10)],
        "doc_a bigint, doc_b bigint",
    )
    with_d = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    without = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(edges, dedupe_edges=False).collect()
    }
    assert with_d == without == {
        (1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (9, 9), (10, 9),
    }


_CODE = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])]


_NORM_SQL = (
    "SQRT(aggregate(transform(transform(embedding, x -> CAST(x AS "
    "DOUBLE)), x -> x * x), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
)


def _assign(spark, expr_col):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),          # clean -> cid 0
            (2, [0.5, 0.5, 0.5]),     # wrong dim -> NULL
            (3, None),                # NULL vector -> NULL
            (4, [None, 1.0]),         # NULL component -> NULL
            (5, [0.0, 0.0]),          # zero norm -> NULL
            (6, [float("nan"), 1.0]), # NaN: all sims NaN -> smallest cid
        ],
        "vec_id bigint, embedding array<double>",
    )
    # norm_col is required (r11): project the same norm fold the
    # shipped callers (valid_with_norm) provide
    emb = emb.withColumn("_n", F.expr(_NORM_SQL))
    return {
        r["vec_id"]: r["cid"]
        for r in emb.select("vec_id", expr_col.alias("cid")).collect()
    }


def _r9_gate_expr(code, vec_col):
    """The r9 shape: cid gated on IF({s} IS NOT NULL, ...) — the
    value-reference the O(1) gate must match."""
    v = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    nv = (
        f"SQRT(aggregate(transform({v}, x -> x * x), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    cands = []
    for cid, comps in code:
        cv = "array(" + ",".join(f"{x!r}D" for x in comps) + ")"
        ncv = math.sqrt(sum(x * x for x in comps))
        s = (
            f"try_divide(aggregate(zip_with({v}, {cv}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), {nv} * {ncv!r}D)"
        )
        cands.append(
            f"named_struct('s', {s}, "
            f"'neg_cid', CAST({-cid} AS BIGINT), "
            f"'cid', IF({s} IS NOT NULL, CAST({cid} AS BIGINT), "
            f"CAST(NULL AS BIGINT)))"
        )
    return F.expr(f"array_max(array({','.join(cands)})).cid")


def test_o1_gate_matches_r9_gate_on_dirty_classes(spark):
    got_new = _assign(spark, _nearest_centroid_expr(_CODE, "embedding", "_n"))
    got_old = _assign(spark, _r9_gate_expr(_CODE, "embedding"))
    assert got_new == got_old
    assert got_new == {1: 0, 2: None, 3: None, 4: None, 5: None, 6: 0}


def test_gate_expr_has_single_dot_fold_per_candidate():
    expr = str(_nearest_centroid_expr(_CODE, "v", "_n"))
    # one zip_with per NON-degenerate candidate (cid 2 is zero-norm ->
    # literal NULLs, no fold); the r9 gate form carried two copies each
    assert expr.count("zip_with") == 2
    assert expr.count("array_max") == 1


def test_overflowing_centroid_builds_and_never_wins(spark):
    code = [(0, [1e200, 1e200]), (1, [1.0, 0.0])]
    got = _assign(spark, _nearest_centroid_expr(code, "embedding", "_n"))
    assert got[1] == 1  # the overflowed centroid degraded, never won
    assert _dlit(float("inf")) == "CAST('Infinity' AS DOUBLE)"
    assert _dlit(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"
    assert _dlit(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert _dlit(1.5) == "1.5D"


def test_rowwise_passthrough_matches_join_back(spark):
    dd = spark.createDataFrame(
        [
            (1, "the cat and the dog", "en", 19),
            (2, None, "de", 0),
            (3, "", "es", 0),
            (4, "der die und das", "de", 15),
        ],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    for fn, key in (
        (lambda d, **kw: fingerprint(d, prefix_tokens=12, **kw), "fingerprint_md5"),
        (language_id, "lang_pred"),
        (quality_score, "quality_score"),
    ):
        new = fn(dd, extra_cols=("lang", "n_chars"))
        old = fn(dd).join(dd.select("doc_id", "lang", "n_chars"), "doc_id")
        cols = ["doc_id", "lang", "n_chars", key]
        assert {tuple(r) for r in new.select(*cols).collect()} == {
            tuple(r) for r in old.select(*cols).collect()
        }
