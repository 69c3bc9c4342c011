"""Dirty-input contract regressions (round 8).

tools/dirty_input_sweep.py discovered the crash classes a 100 TB corpus
is guaranteed to contain — zero-norm / NaN / NULL embedding vectors,
empty documents, NULL media payloads, non-finite event values — and the
fixes route every one through the session's documented NULL-and-drop
contract instead of an ANSI runtime error. These tests pin the contract
at the unit level so a regression fails the suite, not just the sweep:

- direction-based kernels (cosine, LSH buckets, centroid assignment)
  DROP vectors with no defined direction (``valid_vectors``);
- magnitude-based kernels (quantization, norm gates) KEEP zero vectors
  but drop NaN/Inf (``finite_vectors``);
- ratio assemblies degrade to NULL on zero denominators (try_divide);
- non-finite doubles get a NULL bucket, never an ANSI CAST overflow;
- media workers skip NULL payloads.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataflow_example_spark.functions.multimodal import (
    as_media_table,
    media_metadata,
    sample_frames,
)
from dataflow_example_spark.functions.similarity import (
    cosine,
    cosine_topk,
    finite_vectors,
    quantize_int8,
    valid_vectors,
)
from dataflow_example_spark.functions.text import token_stats

NAN = float("nan")
INF = float("inf")


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_cosine_zero_norm_degrades_to_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 0.0]), (2, [1.0, 0.0], [0.0, 2.0])],
        "id bigint, a array<double>, b array<double>",
    )
    out = {
        r["id"]: r["c"]
        for r in df.select(
            "id", cosine(F.col("a"), F.col("b")).alias("c")
        ).collect()
    }
    assert out[1] is None  # zero-norm side -> undefined -> NULL, no crash
    assert out[2] == 0.0


def test_valid_vectors_drops_exactly_the_undirected(spark):
    df = _emb(
        spark,
        [
            (1, [1.0, 2.0]),          # clean: kept
            (2, [0.0, 0.0]),          # zero norm: dropped (no direction)
            (3, None),                # NULL vector: dropped
            (4, []),                  # empty vector: dropped
            (5, [NAN, 1.0]),          # NaN component: dropped
            (6, [INF, 1.0]),          # Inf component: dropped
            (7, [-1e-8, 0.0]),        # tiny but nonzero: kept
        ],
    )
    kept = sorted(
        r["vec_id"] for r in valid_vectors(df).select("vec_id").collect()
    )
    assert kept == [1, 7]


def test_finite_vectors_keeps_zero_norm(spark):
    df = _emb(spark, [(1, [0.0, 0.0]), (2, [NAN, 1.0]), (3, [1.0, 1.0])])
    kept = sorted(
        r["vec_id"] for r in finite_vectors(df).select("vec_id").collect()
    )
    assert kept == [1, 3]  # zero vector is representable; NaN is not


def test_cosine_topk_survives_dirty_corpus_and_excludes_it(spark):
    corpus = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 0.0]),   # zero-norm: must not crash nor rank
            (4, None),         # NULL: must not crash
            (5, [NAN, NAN]),   # NaN: must not outrank real neighbors
        ],
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id bigint, embedding array<double>"
    )
    rows = cosine_topk(corpus, queries, k=5).collect()
    neighbors = {r["neighbor_id"] for r in rows}
    assert neighbors == {1, 2}
    assert all(math.isfinite(r["cosine_sim"]) for r in rows)


def test_quantize_int8_drops_nan_keeps_zero_vector(spark):
    df = _emb(spark, [(1, [0.0, 0.0]), (2, [NAN, 1.0]), (3, [2.0, -1.0])])
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert set(out) == {1, 3}  # NaN vector dropped, zero vector kept
    assert out[1]["scale"] == 0.0 and out[1]["qvec"] == [0, 0]
    assert out[1]["max_abs_err"] == 0.0
    # round-half-up grid: floor(-1.0/(2/127) + 0.5) = floor(-63.0) = -63
    assert out[3]["qvec"] == [127, -63]


def test_token_stats_empty_text_null_ratios(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   \t\n  "), (3, "two words")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in token_stats(docs).collect()}
    for d in (1, 2):  # zero tokens -> NULL ratios, not DIVIDE_BY_ZERO
        assert out[d]["n_tokens"] == 0
        assert out[d]["avg_token_len"] is None
        assert out[d]["type_token_ratio"] is None
    assert out[3]["n_tokens"] == 2 and out[3]["type_token_ratio"] == 1.0


def test_media_table_null_text_and_null_payload(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, "world")],
        "doc_id bigint, text string",
    )
    media = as_media_table(docs)
    # NULL text synthesizes no media row at the boundary
    assert sorted(r["doc_id"] for r in media.select("doc_id").collect()) == [1, 3]
    # and the workers drop NULL payloads defensively even when handed one
    dirty = media.unionByName(
        spark.createDataFrame(
            [(9, "image", None, (0,))], media.schema
        )
    )
    assert sorted(
        r["doc_id"] for r in media_metadata(dirty).select("doc_id").collect()
    ) == [1, 3]
    assert 9 not in {
        r["doc_id"] for r in sample_frames(dirty).select("doc_id").collect()
    }


def test_is_finite_guard(spark):
    from dataflow_example_spark.queries import is_finite

    df = spark.createDataFrame(
        [(1, 1.5), (2, NAN), (3, INF), (4, -INF), (5, None), (6, 0.0)],
        "id bigint, v double",
    )
    kept = sorted(
        r["id"] for r in df.filter(is_finite(F.col("v"))).collect()
    )
    assert kept == [1, 6]  # NULL/NaN/±Inf all excluded


def test_psi_drift_nonfinite_value_gets_null_bucket(spark, tmp_path):
    from dataflow_example_spark import queries as q

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    dirty = ev.unionByName(
        ev.limit(3).withColumn(
            "value",
            F.element_at(
                F.array(F.lit(NAN), F.lit(INF), F.lit(-INF)),
                (F.monotonically_increasing_id() % 3 + 1).cast("int"),
            ),
        )
    )
    dirty.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    rows = q.QUERIES["events_psi_drift"](spark, str(tmp_path)).collect()
    assert len(rows) > 0  # executes: floor(Inf) never reaches an int cast
