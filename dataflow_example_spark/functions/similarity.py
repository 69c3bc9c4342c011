"""Embedding similarity search (beyond-reference; BASELINE.json north star).

Two paths over an ``array<float>`` embedding column:

- ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  The dot product is a sequential index-order fold (``F.aggregate`` over
  ``zip_with``) in double precision, so the DuckDB oracle (``list_reduce``)
  reproduces it bit-exactly (float->double casts are exact; the addition
  order is pinned); ties break by candidate id to keep top-k deterministic
  across engines.
- ``lsh_topk`` — sign-random-projection LSH: the scale path. Hyperplanes
  are *derived arithmetically* (deterministic, seedless, identical on any
  cluster); candidates = vectors sharing the query's bucket, then exact
  re-rank within the bucket.

Scale notes (100 TB): brute force is a broadcast of the (small) query set
against a full scan — linear, no shuffle, but O(N·Q). LSH bounds the
candidate set per query; bucket skew is the failure mode (AQE skew-join
handles moderate cases; rotate to multi-table LSH beyond that).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential index-order fold -> deterministic double sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """``try_divide``, not ``/``: cosine of a zero-norm vector is
    undefined and must degrade to NULL (the session's NULL-and-drop
    contract), not an ANSI DIVIDE_BY_ZERO that kills the job — at corpus
    scale zero-padded vectors are a certainty. For nonzero norms the
    quotient is bit-identical to plain division, so oracle hashes are
    unchanged; entry points additionally pre-filter with
    ``valid_vectors`` so NaN/Inf components never reach a ranking."""
    da, db = _to_double(a), _to_double(b)
    return F.try_divide(dot(da, db), norm(da) * norm(db))


def vector_norm2(vec: Column) -> Column:
    """Sum of squared components (double fold). NULL vector -> NULL;
    NaN/Inf components propagate into the result, which is what the
    validity predicates below test."""
    return F.aggregate(
        F.transform(_to_double(vec), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dlit(x: float) -> str:
    """Render a Python float as a SQL DOUBLE literal. ``repr`` round-trips
    finite doubles exactly (same value as ``F.lit(float)``), but renders
    non-finite floats as ``inf``/``nan`` which the SQL parser rejects as
    ``infD``/``nanD`` — those fall back to a CAST-from-string literal the
    parser accepts (r10, ADVICE: a centroid whose Python-side sum of
    squares overflows must degrade at runtime like the old ``F.lit(inf)``
    path did, not raise AnalysisException at plan build)."""
    if math.isfinite(x):
        return f"{x!r}D"
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    return f"CAST('{'Infinity' if x > 0 else '-Infinity'}' AS DOUBLE)"


def _all_finite(vec: Column) -> Column:
    """Element-wise finiteness: no NULL/NaN/±Inf component. Equivalent to
    'the squared-norm fold is finite' for ``array<float>`` inputs (the
    engine's embedding type: 64 float32 squares sum to < 7.4e78, far from
    double overflow) but evaluated as a short-circuiting ``exists`` with
    no multiplies — and, critically, WITHOUT the fold expression, so
    Catalyst's filter pushdown cannot clone an O(dim) fold into the scan
    predicate three times (isnan / >0 / <inf each carried their own copy
    in the old squared-norm-based guard; HOFs are CodegenFallback, so
    interpreted and not CSE'd). Caveat for array<double> callers:
    components >= ~1e154 keep their row (norm overflows to Inf ->
    try_divide degrades that pair to 0/NULL) where the fold-based guard
    dropped it — document at the call site if doubles ever flow in.
    A NULL ELEMENT makes the exists predicate NULL -> NOT NULL is NULL
    -> the row is dropped, matching the old fold's NULL propagation."""
    return ~F.exists(
        vec, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )


def finite_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """NULL-and-drop for vectors no numeric kernel can process: NULL,
    empty, or containing NULL/NaN/±Inf components. Zero vectors are KEPT
    — they are representable and meaningful to e.g. quantization and
    centroid math. Clean corpora pass through unchanged (the predicate
    is a cheap fused scan filter)."""
    v = F.col(vec_col)
    return df.filter(v.isNotNull() & (F.size(v) > 0) & _all_finite(v))


def valid_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """``finite_vectors`` plus zero-norm rejection — the precondition for
    every DIRECTION-based kernel (cosine similarity, sign-projection
    buckets, nearest-centroid assignment), where a zero vector has no
    defined direction. Applied at each similarity entry point so dirty
    corpora degrade by dropping undefined rows instead of crashing the
    job (tools/dirty_input_sweep.py pins this). The nonzero test is an
    ``exists`` (first nonzero component wins — O(1) on real data), not
    a squared-norm fold; -0.0 components count as zero (IEEE -0.0 ==
    0.0). Exact-equivalent to the old ``n2 > 0`` check for the engine's
    ``array<float>`` type (float32 squares can't underflow a double
    accumulator to 0 nor overflow it). For ``array<double>`` callers it
    diverges in BOTH directions: components >= ~1e154 keep their row
    where the fold overflowed to Inf (see ``_all_finite``), and a
    vector of tiny (< ~1.5e-162) components whose squared-norm
    underflows to exactly 0 is now KEPT with ``norm_col = 0.0`` — its
    cosines degrade to NULL via ``try_divide`` and sort last
    (``desc NULLS LAST``) instead of the row being dropped, so NULL
    similarity rows can appear below real ones in top-k output."""
    v = F.col(vec_col)
    return df.filter(
        v.isNotNull()
        & (F.size(v) > 0)
        & _all_finite(v)
        & F.exists(v, lambda x: x != 0)
    )


def valid_with_norm(
    df: DataFrame, vec_col: str = "embedding", norm_col: str = "_vnorm"
) -> DataFrame:
    """``valid_vectors`` with the guard's squared-norm fold REUSED as the
    cosine denominator: emits ``norm_col = sqrt(sum x^2)`` alongside the
    surviving rows, so downstream pair scoring divides by two precomputed
    per-ROW norms instead of folding both norms per PAIR.

    Why (r9 guard A/B, tools/guard_ab.py at sf0.1): the separate-pass
    guard cost +10-19% on the similarity family while the no-guard
    controls moved ±6% — the cost is real, so the validity fold is fused
    into the scan projection here and the norm is hoisted above the
    join, removing 2 of the 3 per-pair folds (dot + 2 norms -> dot).

    Bit-parity: ``sqrt(n2)`` per row is the identical double ``norm``
    computes per pair (same ``_to_double`` + sequential fold), and IEEE
    multiplication is commutative, so every downstream cosine is
    bit-identical to the unfused expression and oracle hashes are
    unchanged.

    The guard itself is the element-wise ``valid_vectors`` predicate
    (exists/short-circuit, no fold) and the norm fold lives ONLY in the
    projection — evaluated exactly once per surviving row. (The first
    r9 shape filtered on a projected n2 column; Catalyst substituted the
    alias and pushed the predicate below the projection, cloning the
    O(dim) fold into the interpreted Filter three times.)
    """
    return valid_vectors(df, vec_col).withColumn(
        norm_col, F.sqrt(vector_norm2(F.col(vec_col)))
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    ``queries``: (query_id, embedding). Plan: broadcast queries x full scan
    -> per-(query, candidate) cosine -> row_number window -> k. Both
    engines compute bit-identical doubles (pinned fold order), so the raw
    cosine is comparable; ties break on candidate id. Norms are computed
    once per ROW (``valid_with_norm``, fused with the validity guard) and
    reused across all pairs — per-pair work is the dot fold only.
    """
    from pyspark.sql.window import Window

    q = valid_with_norm(queries, vec_col, "_qn").select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        "_qn",
    )
    c = valid_with_norm(embeddings, vec_col, "_cn").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_cn"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(
                dot(_to_double(F.col("_qv")), _to_double(F.col("_cv"))),
                F.col("_qn") * F.col("_cn"),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplane(plane_id: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in [-1, 1):
    h[d] = ((plane_id * 73856093 + d * 19349663 + 83492791) % 2000 - 1000)
           / 1024  (dyadic -> exact in every engine)."""
    return [
        ((plane_id * 73856093 + d * 19349663 + 83492791) % 2000 - 1000) / 1024.0
        for d in range(dim)
    ]


def lsh_bucket(
    vec: Column | str, n_planes: int, dim: int, plane_offset: int = 0
) -> Column:
    """Sign-random-projection bucket id: bit p = (vec . plane_{offset+p}) >= 0.
    ``plane_offset`` selects a disjoint plane set per LSH table (multi-table
    LSH uses offsets 0, n_planes, 2*n_planes, ...).

    Pass the column NAME (str) on hot constructors: the whole
    n_planes x dim expression then assembles as one JVM-parsed SQL
    string (same py4j-cost reasoning as ``_nearest_centroid_expr`` —
    the Column-object form makes a py4j round trip per literal). The
    Column path stays for ad-hoc/expression callers; the two forms are
    VALUE-equal (pinned by
    ``test_lsh_bucket_string_and_column_forms_agree``;
    repr(float)+'D' round-trips each plane component exactly) but NOT
    tree-identical: SQL ``IF`` parses to Catalyst ``If`` while
    ``F.when().otherwise()`` builds ``CaseWhen``, so canonicalized-plan
    equality (exchange/cache reuse) does not hold across mixed forms —
    both sides of a bucket join must use the SAME form (both shipped
    join paths use the string form)."""
    if isinstance(vec, str):
        v = f"transform(`{vec}`, x -> CAST(x AS DOUBLE))"
        terms = ["CAST(0 AS BIGINT)"]
        for p in range(n_planes):
            plane = "array(" + ",".join(
                f"{x!r}D" for x in hyperplane(plane_offset + p, dim)
            ) + ")"
            dot_s = (
                f"aggregate(zip_with({v}, {plane}, (x, y) -> x * y), "
                f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            terms.append(
                f"IF({dot_s} >= CAST(0 AS DOUBLE), "
                f"CAST({2 ** p} AS BIGINT), CAST(0 AS BIGINT))"
            )
        return F.expr("(" + " + ".join(terms) + ")")
    v = _to_double(vec)
    acc = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in hyperplane(plane_offset + p, dim)])
        acc = acc + F.when(dot(v, plane) >= 0, F.lit(2**p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return acc


def cosine_fast(a_col: str, b_col: str):
    """Arrow-vectorized cosine: one numpy pass per batch over the two
    vector columns — the re-rank fast path for large candidate sets
    (the expression-level ``cosine`` folds per element, interpreted).

    Same caveat as ``lsh_bucket_fast``: numpy's SIMD/pairwise summation
    vs the pinned sequential fold differ within float noise (~1e-16
    relative); results are equal to ~1e-12 in tests, but for
    bit-guaranteed oracle parity use ``cosine``.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy()).astype(np.float64)
        mb = np.vstack(b.to_numpy()).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.sqrt((ma * ma).sum(axis=1)) * np.sqrt((mb * mb).sum(axis=1))
        return pd.Series(num / den)

    return cos(F.col(a_col), F.col(b_col))


def lsh_bucket_fast(
    vec_col: str, n_planes: int, dim: int, plane_offset: int = 0
):
    """Arrow-vectorized twin of ``lsh_bucket``: one numpy matmul per
    batch ((batch x dim) @ (dim x n_planes) -> sign bits) instead of
    n_planes interpreted higher-order-function folds per row — the
    production fast path (~10-50x on wide corpora; HOF lambdas run
    interpreted, outside codegen).

    Caveat (why the oracle queries use ``lsh_bucket``): numpy sums the
    dot product in SIMD/pairwise order while ``lsh_bucket`` folds
    sequentially; a dot within float-noise of zero could sign-flip
    between the two. Equivalence on real data is asserted in tests; for
    bit-guaranteed engine parity use ``lsh_bucket``.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [hyperplane(plane_offset + p, dim) for p in range(n_planes)]
    ).T  # (dim, n_planes)
    weights = np.array([1 << p for p in range(n_planes)], dtype=np.int64)

    @pandas_udf("bigint")
    def bucket(v: pd.Series) -> pd.Series:
        m = np.vstack(v.to_numpy())  # (batch, dim) float32 -> float64
        bits = m.astype(np.float64) @ planes >= 0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return bucket(F.col(vec_col))


def multi_lsh_buckets_arrow(
    embeddings: DataFrame,
    n_tables: int,
    n_planes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bit-parity ``mapInArrow`` twin of the multi-table bucket branch in
    ``multi_lsh_near_dup_pairs``'s default (oracle-pinned) path:

        embeddings.select(id, explode(array(struct(t,
            lsh_bucket(vec, n_planes, dim, plane_offset=t*n_planes))
            for t in tables))).select(id, "tb.*")

    i.e. it emits ``n_tables`` rows ``(id, table_id, bucket)`` per input
    row, with bucket values byte-equal to the interpreted
    ``aggregate``-over-``zip_with`` fold expression (which is
    CodegenFallback — C_planes x dim interpreted lambda steps per row;
    same motivation and same numpy discipline as
    ``assign_ivf_lists_arrow``). NOT ``lsh_bucket_fast``: that twin uses
    ``matmul`` (pairwise/SIMD summation) and is documented as
    within-float-noise only; this one is exact.

    Bit-parity design:

    - Dots use an explicit DIM-LOOP accumulation over the (rows x
      planes) matrix (``acc = acc + V[:, d:d+1] * P[d]``): per element
      the same ((0 + x0*y0) + x1*y1) + ... left-to-right IEEE sequence
      as the SQL fold, one multiply and one add per step — never
      ``matmul``/``dot``, whose regrouped summation reorders doubles.
      The plane literals come from the same ``hyperplane`` values the
      SQL string embeds (repr round-trips doubles exactly).
    - The sign test replicates Spark's NaN ordering: ``dot >= 0`` is
      TRUE for NaN (NaN sorts greatest), so bits are
      ``(acc >= 0) | isnan(acc)``.
    - Irregular rows — NULL vector, any NULL element, or length != dim
      — produce bucket 0 in EVERY table on the expression path
      (``zip_with`` pads the short side with NULL, a NULL product
      poisons the fold, ``IF(NULL >= 0, ., 0)`` takes the else branch
      for every plane), so the kernel writes 0 for them without a
      scalar fallback. Pinned by the adversarial parity test.
    - Bucket assembly from sign bits is integer arithmetic (exact).

    Row order within the partition is input-order with table_id
    0..n_tables-1 consecutive per input row — identical to the
    ``explode`` construction; downstream (hash self-join + distinct) is
    order-insensitive anyway.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    total = n_tables * n_planes
    # (dim x total) plane matrix: column p is hyperplane(p, dim), the
    # exact dyadic values the SQL literal path embeds
    P = np.array(
        [hyperplane(p, dim) for p in range(total)], dtype=np.float64
    ).T
    weights = np.array([1 << p for p in range(n_planes)], dtype=np.int64)

    def _kernel(batches):
        for batch in batches:
            n = batch.num_rows
            id_arr = batch.column(batch.schema.get_field_index(id_col))
            arr = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
                arr = arr.combine_chunks()
            offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            row_null = np.asarray(arr.is_null())
            lens = offsets[1:] - offsets[:-1]
            values = arr.values
            elem_null_flags = np.asarray(values.is_null()).astype(np.int64)
            # per-row NULL-element count; clip the flags at offsets[-1]
            # (sliced/overhung Arrow child buffers — see
            # assign_ivf_lists_arrow for the full reasoning)
            if n and len(elem_null_flags) and offsets[-1] > 0:
                flags = elem_null_flags[: offsets[-1]]
                starts = offsets[:-1]
                safe_starts = np.minimum(starts, len(flags) - 1)
                row_elem_nulls = np.add.reduceat(flags, safe_starts)
                row_elem_nulls[lens == 0] = 0
            else:
                row_elem_nulls = np.zeros(n, dtype=np.int64)
            vals_np = values.cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )

            buckets = np.zeros((n, n_tables), dtype=np.int64)
            reg_idx = np.flatnonzero(
                (~row_null) & (lens == dim) & (row_elem_nulls == 0)
            )
            if len(reg_idx):
                V = vals_np[offsets[reg_idx, None] + np.arange(dim)]
                acc = np.zeros((len(reg_idx), total), dtype=np.float64)
                with np.errstate(over="ignore", invalid="ignore"):
                    for d in range(dim):
                        acc = acc + V[:, d : d + 1] * P[d]
                bits = ((acc >= 0.0) | np.isnan(acc)).astype(np.int64)
                buckets[reg_idx] = (
                    bits.reshape(len(reg_idx), n_tables, n_planes)
                    @ weights
                )

            take_idx = pa.array(
                np.repeat(np.arange(n, dtype=np.int64), n_tables)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    id_arr.take(take_idx),
                    pa.array(
                        np.tile(np.arange(n_tables, dtype=np.int32), n),
                        type=pa.int32(),
                    ),
                    pa.array(buckets.reshape(-1), type=pa.int64()),
                ],
                schema=pa.schema(
                    [
                        batch.schema.field(
                            batch.schema.get_field_index(id_col)
                        ),
                        pa.field("table_id", pa.int32()),
                        pa.field("bucket", pa.int64()),
                    ]
                ),
            )

    projected = embeddings.select(F.col(id_col), F.col(vec_col))
    out_schema = StructType(
        [
            projected.schema.fields[0],
            StructField("table_id", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )
    return projected.mapInArrow(_kernel, out_schema)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: candidates share the query's sign-projection bucket;
    exact cosine re-rank inside the bucket. Recall < 1 by construction —
    the oracle computes the same buckets, so results still match exactly.
    """
    from pyspark.sql.window import Window

    c = valid_with_norm(embeddings, vec_col, "_cn").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        "_cn",
        lsh_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    q = valid_with_norm(queries, vec_col, "_qn").select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        "_qn",
        lsh_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(
                dot(_to_double(F.col("_qv")), _to_double(F.col("_cv"))),
                F.col("_qn") * F.col("_cn"),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _nearest_centroid_expr(
    code: list[tuple[int, list[float]]],
    vec_col: str,
    norm_col: str,
) -> Column:
    """Nearest-centroid id (by cosine, smallest id on ties) as a single
    column expression over a LITERAL codebook — a pure map, no join, no
    aggregate, no exchange. ``norm_col`` (REQUIRED, r11) names a
    precomputed per-row vector norm (``valid_with_norm``): the
    expression references the norm once per candidate in the cid gate,
    so an inline norm fold here would re-run O(dim) work per (row,
    candidate) — the exact re-fold cost the r10 O(1)-gate change
    removed (ADVICE r10). Callers project the norm first, as
    ``assign_ivf_lists`` / ``_assign_to_centroids`` do.

    NULL gate (r9, ADVICE): if the BEST candidate's similarity is NULL —
    every centroid cosine degraded, e.g. a wrong-dimension vector whose
    ``zip_with`` dot is NULL against the whole codebook, or an all-
    degenerate codebook — the assignment is NULL, not the smallest
    centroid id the struct tie-break used to fall into. Callers treat
    NULL as "unassignable" (join keys drop it; kmeans filters it).

    ``code`` is the collected codebook [(cid, components), ...] —
    bounded by the centroid count (a model artifact, like the Bloom
    filter's bit array in ``bloom.py``), never corpus-sized.

    Bit-parity notes: the vector norm is computed once and reused
    across centroids (same double as recomputing per pair); each
    centroid's norm is precomputed driver-side with the exact fold
    ``norm`` runs (sequential sum of squares then sqrt — Python floats
    are IEEE doubles and the op order is identical, so the literal is
    bit-identical to the in-engine fold, which Catalyst would otherwise
    re-evaluate per row: HOF aggregates are not constant-folded).
    """
    # The whole expression is assembled as ONE SQL string parsed JVM-side
    # (F.expr): the Column-object form made thousands of py4j round
    # trips for the k x dim literal arrays and folds — measured 1.5 s of
    # pure driver-side construction for a 16 x 64 codebook, vs ~0.05 s
    # for the string parse. The parsed tree (and therefore every value)
    # is identical: repr(float) round-trips doubles exactly and the 'D'
    # suffix makes each literal a DOUBLE, matching F.lit(float).
    v = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    nv = f"`{norm_col}`"
    cands = []
    for cid, comps in code:
        cv = "array(" + ",".join(_dlit(x) for x in comps) + ")"
        acc = 0.0
        for x in comps:
            acc = acc + x * x
        ncv = math.sqrt(acc)
        # the NULL gate lives INSIDE each candidate struct: ``cid`` is
        # NULL when that candidate's similarity ``s`` is NULL, so the
        # winner's cid is already gated and the result below reads
        # array_max exactly ONCE. (Gating the final expression instead —
        # when(best.s.isNotNull(), ...) — references the array_max
        # twice, and Spark's subexpression elimination does not hoist
        # conditional branches: the 16-centroid scoring array was
        # evaluated twice per row, measured as a 2x assignment slowdown
        # at sf0.1.) Struct ordering: (s, neg_cid) decide the max —
        # neg_cid is unique per candidate, so the trailing cid field is
        # never consulted by the comparison.
        #
        # The gate itself is an O(1) predicate (r10, ADVICE): the r9
        # shape wrote IF({s} IS NOT NULL, ...), re-running the O(dim)
        # dot fold a second time per (row, candidate) — Spark excludes
        # expressions containing NamedLambdaVariable from subexpression
        # elimination (EquivalentExpressions.supportedExpression,
        # SPARK-35410 era) and HOF aggregates are CodegenFallback, so
        # the "codegen CSE evaluates it once" note was wrong. The
        # replacement is exactly value-equivalent: for a nonzero-norm
        # centroid, s IS NULL <=> the dot is NULL (size mismatch pads a
        # NULL through zip_with; NULL vector/components make nv NULL)
        # or the try_divide denominator nv * ncv is 0. The gate tests
        # that same product (r11, ADVICE): gating on nv > 0 alone
        # diverged in one array<double>-only edge — nv and ncv both
        # ~<1e-154 underflow the product to 0.0, making s NULL while
        # nv > 0 kept a non-NULL cid. Spark SQL orders NaN > 0 as
        # TRUE (NaN sorts greatest than any number), so NaN-component
        # vectors keep a non-NULL cid exactly as their non-NULL NaN s
        # kept it before.
        if ncv == 0.0 or not math.isfinite(ncv):
            # Degenerate (zero-norm) centroid: its denominator term is
            # 0, so s is NULL for every row — emit both fields as
            # literal NULLs and skip the dot fold entirely (value-
            # identical, one less O(dim) fold per row). A non-finite
            # ncv (component-square overflow on an array<double>
            # codebook) degrades down the same never-wins path instead
            # of rendering an unparseable 'infD' literal (r10, ADVICE).
            cands.append(
                f"named_struct('s', CAST(NULL AS DOUBLE), "
                f"'neg_cid', CAST({-int(cid)} AS BIGINT), "
                f"'cid', CAST(NULL AS BIGINT))"
            )
            continue
        # same structure as cosine(): try_divide(dot, norm(v) * norm(c));
        # callers pre-filter zero-norm vectors, the NULL degrade is the
        # backstop (an all-NULL struct array still array_max's cleanly)
        s = (
            f"try_divide(aggregate(zip_with({v}, {cv}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), {nv} * {_dlit(ncv)})"
        )
        cands.append(
            f"named_struct('s', {s}, "
            f"'neg_cid', CAST({-int(cid)} AS BIGINT), "
            f"'cid', IF(size(`{vec_col}`) = {len(comps)} "
            f"AND {nv} * {_dlit(ncv)} > 0, "
            f"CAST({int(cid)} AS BIGINT), CAST(NULL AS BIGINT)))"
        )
    return F.expr(f"array_max(array({','.join(cands)})).cid")


def assign_ivf_lists(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
    norm_col: str | None = None,
) -> DataFrame:
    """Coarse quantization: nearest centroid per vector (by cosine,
    smallest centroid id on ties) -> inverted-list id.

    Plan shape (r8): the codebook is collected to the driver and
    inlined as a literal array of (centroid, id) structs — bounded by
    ``n_centroids`` (a model artifact, like the Bloom filter's bit
    array in ``bloom.py``), never corpus-sized — and the nearest
    centroid is an ``array_max`` over per-centroid cosine structs.
    The assignment is therefore a PURE MAP: at 100 TB the corpus is
    scanned once and never exchanged. (The previous shape broadcast
    the codebook as a table, fanned out C rows per vector, and
    collapsed them with a groupBy keyed on (id, vector) — map-side
    partial max, but still a full-corpus shuffle carrying the vectors
    as grouping keys.)

    Bit-parity with the oracle is preserved: identical fold
    expressions over identical doubles; the vector norm is computed
    once and reused across centroids, which is the same double as
    recomputing it per pair.
    """
    # ``norm_col``: the embeddings already passed ``valid_with_norm`` and
    # carry their norm — skip the second guard pass and reuse the fold.
    # Without one, guard and project the norm HERE (one fold per row in
    # its own projection — CollapseProject keeps a multiply-referenced
    # non-cheap alias in its own Project) so the assignment expression's
    # per-candidate gate and denominator are plain column reads, never
    # per-candidate re-folds. Same double as the inline fold
    # (``valid_with_norm`` bit-parity note), so hashes are unchanged.
    out_cols = [F.col(id_col), F.col(vec_col)] + (
        [F.col(norm_col)] if norm_col is not None else []
    )
    if norm_col is None:
        norm_col = "_acn"
        embeddings = valid_vectors(embeddings, vec_col).withColumn(
            norm_col, F.sqrt(vector_norm2(F.col(vec_col)))
        )
    # Degenerate (zero-norm) centroids STAY in the codebook (r9, ADVICE):
    # their cosine is NULL (denominator 0 -> try_divide) so they can
    # never win the array_max, which preserves the pre-r8 fan-out
    # shape's behavior exactly — the zero-row path below is reserved for
    # a truly empty codebook. Non-finite/NULL/empty centroids must still
    # be dropped (``finite_vectors``): a NaN similarity sorts GREATEST
    # and would hijack every assignment.
    code = _collect_codebook(centroids, centroid_id_col, centroid_vec_col)
    if not code:
        # empty codebook: no vector is assignable — zero rows, same as
        # the pre-r8 fan-out shape (empty crossJoin -> empty groupBy)
        return embeddings.select(
            *out_cols,
            F.lit(None).cast("bigint").alias("list_id"),
        ).where(F.lit(False))
    return embeddings.select(
        *out_cols,
        _nearest_centroid_expr(code, vec_col, norm_col).alias("list_id"),
    )


def _collect_codebook(
    centroids: DataFrame,
    centroid_id_col: str,
    centroid_vec_col: str,
) -> list[tuple[int, list[float]]]:
    """The one codebook collect every literal-codebook assigner shares
    (``assign_ivf_lists``, ``assign_ivf_lists_arrow``,
    ``_assign_to_centroids``): ``finite_vectors`` drop of non-finite/
    NULL/empty centroids (degenerate zero-norm ones STAY — r9, ADVICE),
    deterministic cid order, exact float64 coercion. Bit-parity across
    the assigners depends on this being ONE code path."""
    return [
        (int(r["_cid"]), [float(x) for x in r["_cv0"]])
        for r in finite_vectors(centroids, centroid_vec_col)
        .select(
            F.col(centroid_id_col).alias("_cid"),
            F.col(centroid_vec_col).alias("_cv0"),
        )
        .orderBy("_cid")
        .collect()
    ]


def assign_ivf_lists_arrow(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
    norm_col: str | None = None,
) -> DataFrame:
    """``assign_ivf_lists`` with the per-row assignment loop moved from
    the interpreted ``array_max``-over-HOF-folds expression into a
    ``mapInArrow`` numpy kernel — the assignment path ``ivf_topk`` uses
    since r15 (the expression's 16x64 interpreted folds were
    sim_ivf_topk's dominant stage; the flip was made on an interleaved
    fresh-JVM A/B, numbers at the ``ivf_topk`` call site). The
    expression twin stays as the JVM-only fallback and the parity
    reference.

    Bit-parity design (the whole point — results must hash-match the
    expression path, hence the DuckDB oracle):

    - The codebook is collected and ordered EXACTLY as
      ``assign_ivf_lists`` does (``finite_vectors`` -> orderBy cid);
      each centroid norm is the same sequential Python sum-of-squares.
    - The norm column stays a JVM-side fold: callers pass the
      ``valid_with_norm`` column through (or it is projected here with
      the same ``vector_norm2`` fold), so the Python kernel never
      recomputes a norm.
    - The dot is an explicit DIM-LOOP accumulation
      (``acc = acc + V[:, d] * c[d]``): the same left-to-right
      ((0 + x0*y0) + x1*y1) + ... sequence as the SQL fold, one IEEE
      multiply and one IEEE add per element — never ``matmul``/``dot``,
      whose pairwise/FMA summation reorders doubles.
    - s = dot / (nv * ncv) with NULL exactly when ``try_divide`` yields
      NULL (denominator == 0 or an operand NULL); the candidate gate is
      ``len(v) == len(c) AND nv * ncv > 0`` with Spark's NaN-sorts-
      greatest semantics (NaN > 0 is TRUE); the winner is the
      ``array_max`` struct order: s with NULL smallest and NaN
      greatest, ties to the SMALLEST cid. The winner's cid is gated by
      that same size/denominator test, NOT by ``s IS NOT NULL`` — for
      genuine ``valid_with_norm`` norms the two are equivalent (the r9
      NULL gate), but a caller-supplied norm column can make them
      diverge (e.g. a NULL-element vector with a hand-fed positive
      norm assigns the smallest cid with s NULL on BOTH paths — the
      adversarial parity test pins that non-NULL outcome).
    - Irregular rows (NULL vector, length mismatch vs every candidate,
      NULL elements) take a scalar fallback that replicates the same
      semantics; regular rows take the vectorized path. Both are pinned
      against the expression by tests/test_similarity.py's adversarial
      parity corpus.

    Scale note: the corpus (id, vector, norm) crosses the Arrow
    boundary once in each direction — a streaming, partition-local
    cost with no shuffle, traded against removing C x dim interpreted
    lambda steps per row (HOF folds are CodegenFallback). At 64-dim
    float32 embeddings that is ~0.5 KB/row through Arrow IPC vs ~1k
    interpreted expression-tree evaluations/row.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    out_cols = [F.col(id_col), F.col(vec_col)] + (
        [F.col(norm_col)] if norm_col is not None else []
    )
    if norm_col is None:
        norm_col = "_acn"
        embeddings = valid_vectors(embeddings, vec_col).withColumn(
            norm_col, F.sqrt(vector_norm2(F.col(vec_col)))
        )
    code = _collect_codebook(centroids, centroid_id_col, centroid_vec_col)
    if not code:
        return embeddings.select(
            *out_cols,
            F.lit(None).cast("bigint").alias("list_id"),
        ).where(F.lit(False))

    # Precompute per-centroid norms with the exact expression-path fold
    # (sequential Python float sum of squares, then sqrt).
    cands = []
    for cid, comps in code:
        acc = 0.0
        for x in comps:
            acc = acc + x * x
        ncv = math.sqrt(acc)
        degenerate = ncv == 0.0 or not math.isfinite(ncv)
        cands.append((cid, comps, ncv, degenerate))

    def _assign_row(v, has_null_elem, nv):
        """Scalar twin of one row of ``_nearest_centroid_expr`` —
        the irregular-row fallback."""
        best = None  # (level, value, neg_cid, gated_cid)
        for cid, comps, ncv, degenerate in cands:
            if degenerate:
                s = None
                gcid = None
            else:
                if v is None or len(v) != len(comps) or has_null_elem:
                    dot_v = None  # zip_with pads/poisons the fold
                else:
                    acc = 0.0
                    for i in range(len(comps)):
                        acc = acc + v[i] * comps[i]
                    dot_v = acc
                den = None if nv is None else nv * ncv
                if dot_v is None or den is None or den == 0.0:
                    s = None
                else:
                    s = dot_v / den  # den != 0, so this never raises
                gate = (
                    v is not None
                    and len(v) == len(comps)
                    and den is not None
                    # Spark SQL orders NaN greatest: NaN > 0 is TRUE
                    and (den > 0.0 or math.isnan(den))
                )
                gcid = cid if gate else None
            if s is None:
                level, val = 0, 0.0
            elif math.isnan(s):
                level, val = 2, 0.0
            else:
                level, val = 1, s
            # candidates iterate in cid ASC order == neg_cid DESC, so a
            # later candidate wins only on a STRICTLY greater (level,
            # value) — exactly the (s, neg_cid) struct max
            if best is None or level > best[0] or (
                level == 1 and best[0] == 1 and val > best[1]
            ):
                best = (level, val, -cid, gcid)
        return best[3]

    def _kernel(batches):
        for batch in batches:
            n = batch.num_rows
            arr = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
                arr = arr.combine_chunks()
            nv_col = batch.column(batch.schema.get_field_index(norm_col))
            # cast to float64 BEFORE to_numpy: the expression path
            # promotes the norm to DOUBLE before nv * ncv, so a
            # float32-backed norm column must widen here too (and match
            # the scalar fallback's float()) — review finding r15
            nv_np = nv_col.cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )  # NULL norm -> NaN; masked separately below
            nv_null = np.asarray(nv_col.is_null())
            offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            row_null = np.asarray(arr.is_null())
            lens = offsets[1:] - offsets[:-1]
            values = arr.values
            elem_null_flags = np.asarray(values.is_null()).astype(np.int64)
            # per-row count of NULL elements (reduceat over offsets).
            # Clip the flags at offsets[-1]: reduceat's LAST segment
            # otherwise runs to the end of the child values buffer,
            # which may legally extend past the rows' range (sliced
            # batches / trailing unreferenced values) and would
            # overcount NULLs for the final row.
            if n and len(elem_null_flags) and offsets[-1] > 0:
                flags = elem_null_flags[: offsets[-1]]
                starts = offsets[:-1]
                # reduceat needs starts < len(flags); empty rows at the
                # tail would index past it — clamp, then zero them out
                safe_starts = np.minimum(starts, len(flags) - 1)
                row_elem_nulls = np.add.reduceat(flags, safe_starts)
                row_elem_nulls[lens == 0] = 0
            else:
                row_elem_nulls = np.zeros(n, dtype=np.int64)
            vals_np = values.cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )

            # best-so-far state for the vectorized winner fold
            best_level = np.full(n, -1, dtype=np.int8)
            best_val = np.zeros(n, dtype=np.float64)
            best_cid = np.zeros(n, dtype=np.int64)
            best_cid_null = np.ones(n, dtype=bool)

            regular = (~row_null) & (row_elem_nulls == 0)
            irregular_rows = np.flatnonzero(~regular)
            nv_valid = ~nv_null

            # One gather per DISTINCT dim, not per centroid: candidates
            # normally share one dimension, and re-gathering the
            # (rows x D) matrix 16x was the hot loop's memory traffic
            # (review finding r15). Keyed lazily so a dim no row matches
            # costs nothing.
            gathered: dict[int, tuple] = {}

            def _for_dim(D):
                if D not in gathered:
                    idx = np.flatnonzero(regular & (lens == D))
                    if len(idx):
                        V = vals_np[offsets[idx, None] + np.arange(D)]
                        nv_sub = nv_np[idx]
                        nv_ok = nv_valid[idx]
                    else:
                        V = nv_sub = nv_ok = None
                    gathered[D] = (idx, V, nv_sub, nv_ok)
                return gathered[D]

            # candidates MUST iterate in cid ASC order: the winner fold
            # relies on strict improvement == (s, neg_cid) struct max
            for cid, comps, ncv, degenerate in cands:
                D = len(comps)
                s_level = np.zeros(n, dtype=np.int8)  # 0 = NULL s
                s_val = np.zeros(n, dtype=np.float64)
                gcid_null = np.ones(n, dtype=bool)
                idx = ()
                if not degenerate:
                    idx, V, nv_sub, nv_ok = _for_dim(D)
                if not degenerate and len(idx):
                    c = np.asarray(comps, dtype=np.float64)
                    acc = np.zeros(len(idx), dtype=np.float64)
                    for d in range(D):
                        acc = acc + V[:, d] * c[d]
                    den = nv_sub * ncv
                    with np.errstate(
                        divide="ignore", invalid="ignore", over="ignore"
                    ):
                        s = acc / den
                    s_defined = nv_ok & (den != 0.0)
                    lvl = np.where(
                        s_defined, np.where(np.isnan(s), 2, 1), 0
                    ).astype(np.int8)
                    s_level[idx] = lvl
                    s_val[idx] = np.where(lvl == 1, s, 0.0)
                    # gate: size match (== the dim gather here) AND
                    # den > 0, with NaN > 0 TRUE; NULL nv -> false
                    gate = nv_ok & ((den > 0.0) | np.isnan(den))
                    gcid_null[idx] = ~gate
                # winner update (strictly-greater == (s, neg_cid) max
                # with ASC-cid iteration)
                wins = (s_level > best_level) | (
                    (s_level == 1) & (best_level == 1) & (s_val > best_val)
                )
                best_level = np.where(wins, s_level, best_level)
                best_val = np.where(wins, s_val, best_val)
                best_cid = np.where(wins & ~gcid_null, cid, best_cid)
                best_cid_null = np.where(wins, gcid_null, best_cid_null)

            out = best_cid
            out_null = best_cid_null

            # scalar fallback for irregular rows (NULL vector / NULL
            # elements) — exact expression semantics
            for i in irregular_rows:
                if row_null[i]:
                    v = None
                    has_null_elem = False
                else:
                    v = vals_np[offsets[i]:offsets[i] + lens[i]]
                    has_null_elem = row_elem_nulls[i] > 0
                nv_i = None if nv_null[i] else float(nv_np[i])
                r = _assign_row(v, has_null_elem, nv_i)
                if r is None:
                    out_null[i] = True
                else:
                    out[i] = r
                    out_null[i] = False

            list_arr = pa.array(
                np.ma.masked_array(out, mask=out_null), type=pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(j) for j in range(batch.num_columns)]
                + [list_arr],
                schema=batch.schema.append(
                    pa.field("list_id", pa.int64())
                ),
            )

    projected = embeddings.select(
        F.col(id_col), F.col(vec_col), F.col(norm_col)
    )
    out_schema = StructType(
        projected.schema.fields + [StructField("list_id", LongType())]
    )
    assigned = projected.mapInArrow(_kernel, out_schema)
    return assigned.select(*out_cols, F.col("list_id"))


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k via IVF (inverted file) coarse quantization — the scale
    path beside ``lsh_topk``.

    Centroid "training" here is deterministic seed selection (the
    ``n_centroids`` lowest-id vectors) so the DuckDB oracle can replicate
    it; a production deployment swaps in offline k-means centroids — the
    search plan below is identical either way.

    Search: every vector is assigned to its nearest centroid
    (``assign_ivf_lists_arrow``); each query probes its ``n_probe`` nearest
    lists; candidates = vectors in probed lists; exact cosine re-rank.
    Recall < 1 by construction (like any IVF index); both engines compute
    the same lists, so results match exactly.
    """
    from pyspark.sql.window import Window

    embeddings = valid_with_norm(embeddings, vec_col, "_en")
    centroids = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )

    # embeddings already carry their validity-fused norm — the list
    # assignment reuses it (no second guard pass, no per-row norm fold)
    # and passes it through for the re-rank below. The ARROW twin does
    # the assignment (flipped r15, measured call): interleaved fresh-JVM
    # A/B under the bench methodology (sf0.001 warm-up, then sf0.1)
    # measured steady 0.97-1.28 s vs 1.5-3.0 s expression and
    # cold-after-warmup 1.09-1.65 vs 2.03-3.70 s — the Python-worker
    # start is paid in the untimed warm-up, and the kernel removes the
    # C x dim interpreted HOF steps per row (CodegenFallback), a win
    # that grows with corpus size (200k-row smoke: -44%). Bit-parity
    # with the expression path is test-pinned
    # (test_assign_ivf_arrow_parity_*) and the flipped query re-proved
    # against the DuckDB oracle at sf0.001/0.01/0.1. A widened variant
    # (round-robin before the kernel) measured WORSE at every scale
    # factor tried (exchange + per-worker start exceed the win) and was
    # rejected.
    lists = assign_ivf_lists_arrow(
        embeddings, centroids, id_col, vec_col, norm_col="_en"
    )

    # Each query's n_probe nearest centroids (same fan-out/collapse shape).
    q = valid_with_norm(queries, vec_col, "_qn").select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        "_qn",
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("_cs"), F.asc("_cid")
    )
    probes = (
        q.crossJoin(
            F.broadcast(
                centroids.select(
                    F.col("cid").alias("_cid"), F.col("cv").alias("_cv0")
                )
            )
        )
        .select(
            "query_id",
            "_qv",
            "_qn",
            "_cid",
            F.try_divide(
                dot(_to_double(F.col("_qv")), _to_double(F.col("_cv0"))),
                F.col("_qn") * norm(_to_double(F.col("_cv0"))),
            ).alias("_cs"),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", "_qn", F.col("_cid").alias("list_id"))
    )

    # Candidates: vectors in any probed list. The query side is tiny ->
    # broadcast; the join key is list_id, so only probed lists are read
    # when the list assignment is materialized partitioned by list_id.
    # Per-pair work is the dot fold only: both norms were computed once
    # per row upstream (valid_with_norm / lists passthrough).
    scored = (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.try_divide(
                dot(_to_double(F.col("_qv")), _to_double(F.col(vec_col))),
                F.col("_qn") * F.col("_en"),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, bucketed: only vectors sharing a
    sign-projection bucket are compared — the scale path that replaces
    the O(N^2) cross join with a self-join on the bucket key. Recall < 1
    (cross-bucket near-dups are missed, as in any single-table LSH);
    rotate to multi-table LSH for higher recall."""
    # r15: same conditional widening as multi_lsh_near_dup_pairs — the
    # bucket fold (n_planes x dim interpreted HOF steps/row), the pair
    # re-rank and the Arrow prefilter otherwise fuse into ONE task on
    # single-row-group inputs (measured at sf0.1: whole query 1.215 ->
    # 0.662 s min-of-6 same-JVM alternating, value-parity exact).
    # No-op when the scan already has >= slots splits.
    from .layout import widen_if_narrow

    embeddings = widen_if_narrow(embeddings)
    b = valid_with_norm(embeddings, vec_col, "_n").select(
        F.col(id_col),
        F.col(vec_col),
        "_n",
        lsh_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(c, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
    )
    # Arrow prefilter + pinned-fold emit, same epsilon-band contract as
    # multi_lsh_near_dup_pairs: values come from the sequential fold (so
    # the oracle hash matches), the interpreted HOF only runs on pairs
    # the vectorized pass could not safely exclude — and that fold is
    # the dot only, the norms were computed once per row upstream.
    eps = 1e-9 * max(abs(threshold), 1.0)
    return (
        pairs.withColumn("_fast", cosine_fast("_va", "_vb"))
        .filter(F.col("_fast") >= threshold - eps)
        .select(
            "id_a",
            "id_b",
            F.try_divide(
                dot(_to_double(F.col("_va")), _to_double(F.col("_vb"))),
                F.col("_na") * F.col("_nb"),
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def multi_lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    accelerated: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs via multi-table LSH — the headline scale
    path. ``n_tables`` independent sign-projection tables (disjoint plane
    sets); candidates = pairs sharing a bucket in ANY table; exact cosine
    re-rank on the deduped candidate set. ``accelerated=True`` swaps the
    bucket computation and the re-rank to the matmul-order numpy paths
    (``lsh_bucket_fast`` / ``cosine_fast``) — within-float-noise, not
    bit-pinned. The default path keeps bit-guaranteed oracle parity:
    buckets come from ``multi_lsh_buckets_arrow`` (the sequential-fold
    mapInArrow kernel, byte-equal to the ``lsh_bucket`` expression —
    r15) and emitted cosines from the pinned sequential fold.

    Recall ~ 1 - (1 - p^n_planes)^n_tables for per-plane agreement p —
    more tables raise recall, more planes per table shrink buckets
    (candidate volume ~ n_tables * N^2 / 2^n_planes before dedup). At
    scale, grow ``n_planes`` with N (2^n_planes ~ N / target bucket size)
    and ``n_tables`` to hold recall. Plan shape: explode to (table_id,
    bucket) rows -> hash self-join on the compound key -> distinct pairs
    -> two hash joins to fetch vectors -> cosine filter. No cross join at
    any stage; bucket skew is bounded by the plane count and handled by
    AQE skew-join beyond that.
    """
    def bucket(t: int):
        if accelerated:
            return lsh_bucket_fast(
                vec_col, n_planes, dim, plane_offset=t * n_planes
            )
        return lsh_bucket(
            vec_col, n_planes, dim, plane_offset=t * n_planes
        )

    # r15: the guard is fused with the norm fold so the exact re-rank
    # divides by two hoisted per-ROW norms instead of folding both per
    # PAIR (bit-parity per valid_with_norm's docstring — identical fold,
    # same `_na * _nb` multiply order as cosine()'s `norm(a) * norm(b)`).
    # The bucket side below never selects the norm column, so Catalyst
    # prunes the fold out of that branch entirely. widen_if_narrow: the
    # bucket folds (n_tables * n_planes interpreted HOFs per row) and
    # the broadcast builds otherwise serialize into one task on
    # single-row-group inputs (r15 profile: 4.6 s of serial single-task
    # stages at sf0.1); no-op when the scan already has >= slots splits.
    from .layout import widen_if_narrow

    embeddings = valid_with_norm(
        widen_if_narrow(embeddings), vec_col, "_mln"
    )
    if accelerated:
        b = embeddings.select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_id"),
                            bucket(t).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(id_col, "tb.*")
    else:
        # r15: the default path's buckets come from the bit-parity
        # mapInArrow kernel instead of n_tables x n_planes interpreted
        # HOF folds per row (CodegenFallback). Measured standalone on a
        # 200k x 64 corpus: 1.619 -> 0.450 s (-72%), checksum-parity
        # exact; the adversarial/irregular-row parity contract is
        # test-pinned (test_multi_lsh_buckets_arrow_*). The expression
        # form above remains the JVM-only reference (accelerated=False
        # semantics are unchanged — both paths emit identical buckets).
        b = multi_lsh_buckets_arrow(
            embeddings, n_tables, n_planes, dim, id_col, vec_col
        )
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(c, ["table_id", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ea = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_mln").alias("_na"),
    )
    eb = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_mln").alias("_nb"),
    )
    joined = cand.join(ea, "id_a").join(eb, "id_b")
    if accelerated:
        return joined.select(
            "id_a", "id_b", cosine_fast("_va", "_vb").alias("cosine_sim")
        ).filter(F.col("cosine_sim") >= threshold)
    # Default path: Arrow-vectorized prefilter, pinned-fold values.
    # cosine_fast scores every candidate in one numpy pass; only pairs
    # inside an epsilon band of the threshold survive to the interpreted
    # pinned-fold cosine, whose values are what we emit — so the oracle
    # hash is untouched while the HOF runs over |survivors|, not
    # |candidates|. The band (1e-9 relative) is ~1e3x the observed numpy
    # vs sequential-fold divergence (~1e-12), so no borderline pair can
    # be classified differently by the two summation orders.
    eps = 1e-9 * max(abs(threshold), 1.0)
    return (
        joined.withColumn("_fast", cosine_fast("_va", "_vb"))
        .filter(F.col("_fast") >= threshold - eps)
        .select(
            "id_a",
            "id_b",
            F.try_divide(
                dot(_to_double(F.col("_va")), _to_double(F.col("_vb"))),
                F.col("_na") * F.col("_nb"),
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _assign_to_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest centroid by cosine (smallest cid on ties) — literal
    codebook + ``array_max`` (``_nearest_centroid_expr``), a pure map
    with no exchange, same shape as ``assign_ivf_lists``. The collect
    is bounded by k and makes the k-means loop's existing per-iteration
    driver sync explicit; it also resets plan lineage each round (the
    previous broadcast fan-out + groupBy(id, vector) shape shuffled the
    FULL corpus per iteration with the vectors as grouping keys).
    ``centroids``: (cid, cv array).

    Degenerate (zero-norm) centroids stay in the codebook — their NULL
    cosine never wins — matching the pre-r8 fan-out shape (r9, ADVICE);
    only non-finite/NULL/empty centroids are dropped (a NaN similarity
    would sort greatest and hijack the assignment). A vector whose BEST
    similarity is NULL (wrong dimension, or every centroid degenerate)
    gets cluster NULL; callers drop or isolate those rows."""
    code = _collect_codebook(centroids, "cid", "cv")
    if not code:
        # empty codebook -> zero rows (pre-r8 fan-out degenerate case)
        return embeddings.select(
            F.col(id_col),
            F.col(vec_col),
            F.lit(None).cast("bigint").alias("cluster"),
        ).where(F.lit(False))
    # Project the row norm once (no filter — unassignable rows keep
    # their NULL cluster, per the docstring) so the assignment's gate
    # and denominator read a column instead of re-folding per candidate.
    return embeddings.withColumn(
        "_acn", F.sqrt(vector_norm2(F.col(vec_col)))
    ).select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid_expr(code, vec_col, "_acn").alias("cluster"),
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means (cosine assignment), fixed iterations,
    deterministic init (the ``k`` lowest-id vectors) — the offline
    centroid training that ``ivf_topk``'s docstring defers to. Returns
    the final (id, cluster) assignment.

    Iterative driver-side loop over lazy plans (the same Spark pattern as
    ``connected_components``): each round is one broadcast fan-out for
    assignment plus one (cluster, pos)-keyed aggregate for the centroid
    update. Centroid component means use the pinned sorted fold so the
    DuckDB oracle replicates every round bit-exactly; empty clusters keep
    their previous centroid (deterministic, no reseeding).

    Fixed ``iters`` (not convergence-tested) keeps the driver query's
    work deterministic; library callers can loop until assignments stop
    changing exactly as connected_components checks labels.
    """
    emb = valid_vectors(embeddings, vec_col).select(
        F.col(id_col), F.col(vec_col)
    )
    centroids = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("bigint").alias("cid"), F.col(vec_col).alias("cv")
    )

    def update(assigned: DataFrame) -> DataFrame:
        # component means via numerics.fixed_point_sum: each (cluster,
        # pos) cell holds the cluster's whole membership — the former
        # sorted collect-fold materialized it in one buffer (OOM at
        # 100 TB); the fixed-point sum keeps O(1) aggregation state and
        # both engines produce the identical quantized mean
        from .numerics import fixed_point_sum

        comp = assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "_v")
        )
        means = (
            comp.groupBy("cluster", "pos")
            .agg(
                fixed_point_sum(F.col("_v").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "cluster",
                "pos",
                (F.col("_s") / F.col("_n")).alias("_m"),
            )
        )
        return (
            means.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("_m")))
                    ),
                    lambda s: s["_m"],
                ).alias("cv")
            )
            .select(F.col("cluster").alias("cid"), "cv")
        )

    def assign(cents: DataFrame) -> DataFrame:
        # NULL assignments (wrong-dimension vectors vs the codebook) are
        # dropped here so a dirty row can neither seed a NULL-cid
        # centroid in update() nor appear in the returned clustering —
        # the session's NULL-and-drop degrade, pinned by the dirty sweep.
        return _assign_to_centroids(emb, cents, id_col, vec_col).filter(
            F.col("cluster").isNotNull()
        )

    assigned = assign(centroids)
    for _ in range(iters - 1):
        new_centroids = update(assigned)
        # empty clusters vanish from `means`; keep their previous centroid
        kept = centroids.join(new_centroids, "cid", "left_anti")
        centroids = new_centroids.unionByName(kept).localCheckpoint(
            eager=True
        )
        assigned = assign(centroids)
    return assigned.select(id_col, "cluster")


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid of the embedding column, emitted in LONG form
    (label, pos, centroid) — one row per vector component.

    Plan: posexplode to (label, pos, value) -> hash aggregate per
    (label, pos). Long form deliberately: downstream consumers
    (nearest-centroid assignment, drift monitoring) join on (label, pos)
    anyway. The mean uses numerics.fixed_point_sum: each (label, pos)
    cell holds that label's entire corpus slice, so the former sorted
    collect-fold (kept through round 5 for cross-engine bit-equality)
    was an OOM at 100 TB — the fixed-point sum is a true streaming
    aggregate with map-side combine and is engine-exact by construction
    (floor-quantized integer addition; see numerics.py).
    """
    from .numerics import fixed_point_sum

    comp = finite_vectors(embeddings, vec_col).select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "_v"),
    )
    return (
        comp.groupBy("label", "pos")
        .agg(
            fixed_point_sum(F.col("_v").cast("double")).alias("_s"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            "label",
            "pos",
            (F.col("_s") / F.col("n_vectors")).alias("centroid"),
            "n_vectors",
        )
    )


def center_by_label(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean-centering of embeddings (the grouped feature
    transform: subtract each label's centroid) via grouped-map
    ``applyInPandas`` — one Arrow batch per label group, one numpy
    vectorized pass, no per-row Python.

    This is the canonical applyInPandas shape: a whole-group transform
    whose output is row-aligned with the input. The equivalent
    composition of native ops (centroid aggregate + broadcast join +
    zip_with subtract) is ``center_by_label_native``; equality of the two
    is asserted in tests. Choose applyInPandas when the per-group math is
    matrix-shaped (here: one mean + one subtract over the group matrix);
    choose the native twin when groups are huge (no group materialization).
    """
    import numpy as np

    out_schema = (
        f"{id_col} bigint, {label_col} bigint, centered array<double>"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        centered = m - m.mean(axis=0)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                label_col: pdf[label_col],
                "centered": list(centered),
            }
        )

    return finite_vectors(embeddings, vec_col).select(
        id_col, label_col, vec_col
    ).groupBy(label_col).applyInPandas(center, out_schema)


def center_by_label_native(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Native twin of ``center_by_label``: centroid via plain avg per
    (label, pos), broadcast join back, zip_with subtract. No group
    materialization — the scale path for huge groups."""
    embeddings = finite_vectors(embeddings, vec_col)
    comp = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "_v")
    )
    cent = (
        comp.groupBy(label_col, "pos")
        .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", F.col("_m")))),
                lambda s: s["_m"],
            ).alias("_centroid")
        )
    )
    return (
        embeddings.join(F.broadcast(cent), label_col)
        .select(
            id_col,
            label_col,
            F.zip_with(
                _to_double(F.col(vec_col)),
                F.col("_centroid"),
                lambda a, b: a - b,
            ).alias("centered"),
        )
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — all-pairs O(N^2) cross
    join; TEST-ONLY recall verifier for the bucketed paths
    (``lsh_near_dup_pairs``, ``multi_lsh_near_dup_pairs``). Never ship
    corpus-wide."""
    embeddings = valid_vectors(embeddings, vec_col)
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("_va"), F.col("_vb")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the memory-compression
    step in front of large ANN indexes (4x smaller vectors; IVF/LSH
    bucketing upstream is unchanged, exact re-rank dequantizes).

    scale = max|v| / 127; q_i = floor(v_i/scale + 0.5) (explicit
    half-up rounding — engine-portable, unlike round()'s half-even vs
    half-away divergence); zero vectors quantize to zeros with scale 0.
    Emits the max absolute reconstruction error per vector (bounded by
    scale/2), the quantity capacity planning needs.

    One linear codegen scan, no shuffle, no Python. NaN/Inf components
    make the quantization grid itself undefined (scale = NaN/Inf), so
    such vectors are dropped (``finite_vectors``); zero vectors are kept
    per the scale-0 contract above.
    """
    embeddings = finite_vectors(embeddings, vec_col)
    v = _to_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = max_abs / F.lit(127.0)
    q = F.when(scale == 0, F.transform(v, lambda _: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    out = embeddings.select(
        F.col(id_col), scale.alias("scale"), q.cast("array<int>").alias("qvec"), v.alias("_v")
    )
    err = F.array_max(
        F.zip_with(
            "_v",
            "qvec",
            lambda x, qi: F.abs(x - qi.cast("double") * F.col("scale")),
        )
    )
    return out.select(
        id_col, "scale", "qvec", F.coalesce(err, F.lit(0.0)).alias("max_abs_err")
    )


def pq_subdist(vec_col: Column, cent_col: Column, m: int, sub: int) -> Column:
    """Squared L2 between subspace ``m`` of two vectors (pinned left-fold
    -> bit-identical doubles in both engines)."""
    va = F.slice(vec_col, m * sub + 1, sub)
    ca = F.slice(cent_col, m * sub + 1, sub)
    return F.aggregate(
        F.zip_with(va, ca, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codes(
    emb: DataFrame,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_centroids: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization code assignment (see queries.emb_pq_codes):
    nearest codebook entry per subspace by squared L2, ties to the
    smaller centroid id. Codebook = first ``n_centroids`` vectors by id
    (deterministic stand-in for a trained codebook), always broadcast.
    Returns (vec_id, code_0..code_{M-1})."""
    cents = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("_cid"), _to_double(F.col(vec_col)).alias("_cv")
    )
    v = emb.select(
        F.col(id_col).alias("vec_id"), _to_double(F.col(vec_col)).alias("_vv")
    )
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "_cid",
        *[
            pq_subdist(F.col("_vv"), F.col("_cv"), m, sub_dim).alias(f"_d{m}")
            for m in range(n_subspaces)
        ],
    )
    return scored.groupBy("vec_id").agg(
        *[
            F.min(
                F.struct(F.col(f"_d{m}").alias("d"), F.col("_cid").alias("c"))
            )["c"]
            .cast("int")
            .alias(f"code_{m}")
            for m in range(n_subspaces)
        ]
    )


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 4,
    sub_dim: int = 16,
    n_centroids: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC,
    Jégou et al., "Product quantization for nearest neighbor search",
    TPAMI 2011): each query precomputes a (subspace, centroid) distance
    table against the codebook; a candidate's score is the SUM of table
    lookups selected by its stored codes — no candidate vector is ever
    re-read. The scale path for billion-vector search: the scan touches
    only the M small-int codes per vector, and the lookup table
    (n_queries x M x K rows) is a broadcast. The ADC sum is pivoted to
    fixed columns d0+..+d{M-1} so the double addition order is pinned."""
    from pyspark.sql.window import Window

    codes = pq_codes(emb, n_subspaces, sub_dim, n_centroids, id_col, vec_col)
    cents = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("_cid"), _to_double(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qv"),
    )
    dtab = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "_cid",
        *[
            pq_subdist(F.col("_qv"), F.col("_cv"), m, sub_dim).alias(f"_d{m}")
            for m in range(n_subspaces)
        ],
    )
    # melt codes to (vec_id, m, code), join the broadcast table once, then
    # pivot back so the final sum is the fixed expression d0 + d1 + ... —
    # no aggregation-order nondeterminism on doubles
    melted = codes.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"), F.col(f"code_{m}").alias("code")
                    )
                    for m in range(n_subspaces)
                ]
            )
        ).alias("mc"),
    ).select("vec_id", "mc.m", "mc.code")
    dtab_long = dtab.select(
        "query_id",
        F.col("_cid").alias("code"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("m"), F.col(f"_d{m}").alias("d"))
                    for m in range(n_subspaces)
                ]
            )
        ).alias("md"),
    ).filter(F.col("md.m").isNotNull()).select(
        "query_id", "code", F.col("md.m").alias("m"), F.col("md.d").alias("d")
    )
    pivoted = (
        melted.join(F.broadcast(dtab_long), ["m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            *[
                F.min(F.when(F.col("m") == m, F.col("d"))).alias(f"d{m}")
                for m in range(n_subspaces)
            ]
        )
    )
    adc = pivoted.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        sum(
            (F.col(f"d{m}") for m in range(1, n_subspaces)),
            F.col("d0"),
        ).alias("adc_dist"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a ±1 sign
    matrix (Achlioptas 2003): ``proj[k] = Σ_j emb[j]·sign(k,j) / √in_dim``
    — the cheap distance-preserving shrink applied to embedding columns
    before ANN indexing or clustering at corpus scale.

    The sign matrix is data-independent and derived from md5("rp:k:j")
    parity, so any engine reproduces it without shipping state: the
    (out_dim × in_dim) sign table is built as a tiny DataFrame and
    broadcast-joined onto the posexploded components. Per-(vector, k)
    dot products use the pinned-fold trick (sorted products, sequential
    double fold) so Spark and DuckDB sum in the same order —
    float32·(±1) is exact in double, only the fold order needs pinning.
    √in_dim must be exact in double for the hash-compare; the default 64
    gives /8. Emitted LONG form (id, dim, value), one row per output
    component.

    Scale: explode fan-out is in_dim rows per vector; the broadcast sign
    join fans each to out_dim products; the (id, dim) aggregate holds
    in_dim doubles per cell. All bounded by constants — no all-pairs, no
    driver state.
    """
    import math

    root = math.sqrt(in_dim)
    if root != int(root):
        raise ValueError("in_dim must be a perfect square for exact /sqrt")

    spark = embeddings.sparkSession
    k_grid = spark.range(out_dim).select(F.col("id").cast("int").alias("_k"))
    j_grid = spark.range(in_dim).select(F.col("id").cast("int").alias("pos"))
    signs = (
        k_grid.crossJoin(j_grid)
        .select(
            "_k",
            "pos",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit("rp"), F.col("_k"), F.col("pos")
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("_s"),
        )
    )
    comp = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "_v"),
    )
    prod = comp.join(F.broadcast(signs), "pos").select(
        "vec_id", "_k", (F.col("_v").cast("double") * F.col("_s")).alias("_p")
    )
    folded = F.aggregate(
        F.sort_array(F.collect_list("_p")), F.lit(0.0), lambda a, x: a + x
    )
    return (
        prod.groupBy("vec_id", "_k")
        .agg((folded / F.lit(float(root))).alias("value"))
        .select("vec_id", F.col("_k").alias("dim"), "value")
    )


def label_consistency_1nn(
    emb: DataFrame,
    panel_n: int = 200,
    salt: str = "1nn-panel",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-quality via 1-NN consistency over a FIXED-size probe panel.

    The panel is the ``panel_n`` vectors with the smallest md5 hash
    buckets (``sampling.hash_bucket``, ``id_col`` tie-break) — a pure
    function of the id, so the panel is reproducible across runs,
    partitionings, and engines, and its size is O(1) in corpus scale.
    Spark compiles ``orderBy().limit()`` to TakeOrderedAndProject
    (per-partition top-N, driver merge of N/partition — no global
    sort), so the broadcast side is bounded at any SF; the exact scan
    is panel_n x corpus (VERDICT r11 finding 1: the previous
    ``vec_id % 10`` panel was 10% of the corpus — an unbounded
    broadcast and a 0.1*N^2 intermediate). Ties break by neighbor id;
    shares are exact-int divisions. Output: one row per label with
    (n_probes, n_label_match, consistency).
    """
    from pyspark.sql.window import Window

    from .sampling import hash_bucket

    # 1-NN by cosine is direction-based: drop zero-norm/NaN vectors so a
    # NaN similarity can never outrank every real neighbor. r15: the
    # guard is fused with the norm fold (valid_with_norm) so each pair
    # below costs ONE dot fold instead of cosine()'s dot + two norms —
    # the same r9 hoist cosine_topk/ivf_topk already use; bit-parity per
    # the valid_with_norm docstring (identical fold, IEEE multiply
    # commutes in the denominator).
    embn = valid_with_norm(emb, vec_col, "_1nn_n")
    probes = (
        embn.withColumn("_hb", hash_bucket(F.col(id_col), salt))
        .orderBy("_hb", id_col)
        .limit(panel_n)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col(label_col).alias("q_label"),
            F.col("_1nn_n").alias("_qn"),
        )
    )
    cand = embn.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("n_label"),
        F.col("_1nn_n").alias("_cn"),
    )
    # The scoring stage does panel_n * |corpus| dot folds fused into the
    # candidate scan; when the scan itself has fewer splits than the
    # cluster has slots (single-file/row-group inputs — the sf0.1 bench
    # layout runs it as ONE task), widen it (layout.widen_if_narrow).
    # Conditional, so at warehouse scale no extra exchange is added.
    from .layout import widen_if_narrow

    cand = widen_if_narrow(cand)
    scored = cand.crossJoin(F.broadcast(probes)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    nn = (
        scored.select(
            "query_id",
            "q_label",
            "neighbor_id",
            "n_label",
            F.try_divide(
                dot(_to_double(F.col("qv")), _to_double(F.col("cv"))),
                F.col("_qn") * F.col("_cn"),
            ).alias("cos"),
        )
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
    )
    return nn.groupBy("q_label").agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(
            (F.col("n_label") == F.col("q_label")).cast("bigint")
        ).alias("n_label_match"),
        (
            F.sum((F.col("n_label") == F.col("q_label")).cast("bigint"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("consistency"),
    )
