"""Unit tests for functions/similarity.py on tiny in-memory vectors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

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


def test_multi_lsh_near_dup_subset_and_recall(spark):
    """Multi-table LSH near-dup: every reported pair is a genuine
    above-threshold pair (verified against the all-pairs baseline), and
    8 tables recover a healthy fraction of them."""
    from dataflow_example_spark.functions.similarity import (
        multi_lsh_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in multi_lsh_near_dup_pairs(
            emb, threshold=0.4, n_tables=8, n_planes=4, dim=64
        ).collect()
    }
    assert set(got) <= set(exact)
    for p, c in got.items():
        assert c == exact[p]  # identical cosine (same pinned fold)
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.5, f"recall = {recall}"


def test_ivf_topk_recall_vs_exact(spark):
    """IVF is approximate by construction; at sf0.001 with 16 lists /
    4 probes it should still recover most of the exact top-5."""
    from dataflow_example_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5).collect()
    approx = ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    # every query answered with k rows
    from collections import Counter
    per_q = Counter(r.query_id for r in approx)
    assert set(per_q) == set(range(10)) and all(v == 5 for v in per_q.values())
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall@5 = {recall}"


def test_ivf_assignment_partitions_all_vectors(spark):
    from dataflow_example_spark.functions.similarity import assign_ivf_lists

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    lists = assign_ivf_lists(emb, cents)
    assert lists.count() == emb.count()
    assert lists.select("vec_id").distinct().count() == emb.count()
    used = {r.list_id for r in lists.select("list_id").distinct().collect()}
    assert used <= set(range(16)) and len(used) > 1


def test_label_centroids_exact_mean(spark):
    from dataflow_example_spark.functions.similarity import label_centroids

    emb = vecs(
        spark,
        [(1, [1.0, 0.0]), (2, [3.0, 2.0]), (3, [10.0, 4.0])],
    ).withColumn("label", (F.col("vec_id") <= 2).cast("int"))
    got = {
        (r.label, r.pos): (r.centroid, r.n_vectors)
        for r in label_centroids(emb).collect()
    }
    assert got[(1, 0)] == (2.0, 2) and got[(1, 1)] == (1.0, 2)
    assert got[(0, 0)] == (10.0, 1) and got[(0, 1)] == (4.0, 1)


def test_lsh_bucket_fast_matches_expression(spark):
    """The Arrow-vectorized bucket (numpy matmul) assigns every vector
    the same bucket as the expression-level pinned fold on the test
    corpus, for each of the 8 multi-table plane sets."""
    from dataflow_example_spark.functions.similarity import (
        lsh_bucket,
        lsh_bucket_fast,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    for offset in (0, 4, 28):
        both = emb.select(
            "vec_id",
            lsh_bucket(F.col("embedding"), 4, 64, plane_offset=offset).alias(
                "slow"
            ),
            lsh_bucket_fast("embedding", 4, 64, plane_offset=offset).alias(
                "fast"
            ),
        )
        bad = both.filter(F.col("slow") != F.col("fast")).count()
        assert bad == 0


def test_kmeans_recovers_separated_clusters(spark):
    """Two well-separated direction groups: k-means with k=2 puts each
    group in one cluster after 2 iterations."""
    from dataflow_example_spark.functions.similarity import kmeans_assign

    rows = []
    for i in range(20):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 0.0, 1.0]
        rows.append((i, [v + 0.01 * ((i * 7) % 5) * v for v in base]))
    emb = vecs(spark, rows)
    got = {
        r.vec_id: r.cluster for r in kmeans_assign(emb, k=2, iters=2).collect()
    }
    evens = {got[i] for i in range(0, 20, 2)}
    odds = {got[i] for i in range(1, 20, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_center_by_label_pandas_matches_native(spark):
    """Grouped-map applyInPandas centering == native centroid-join twin
    (tolerance: numpy mean vs avg aggregate differ only in float
    summation order)."""
    from dataflow_example_spark.functions.similarity import (
        center_by_label,
        center_by_label_native,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a = {
        r.vec_id: r.centered for r in center_by_label(emb).collect()
    }
    b = {
        r.vec_id: r.centered
        for r in center_by_label_native(emb).collect()
    }
    assert set(a) == set(b) and len(a) == emb.count()
    for vid in a:
        for x, y in zip(a[vid], b[vid]):
            assert abs(x - y) < 1e-9
    # centered groups have ~zero mean per component
    import numpy as np

    lab = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_label = {}
    for vid, vec in a.items():
        by_label.setdefault(lab[vid], []).append(vec)
    for vecs_ in by_label.values():
        assert np.abs(np.mean(np.array(vecs_), axis=0)).max() < 1e-9


def test_multi_lsh_accelerated_matches_exact_path(spark):
    """accelerated=True (numpy buckets + numpy cosine) finds the same
    pairs with cosines equal to ~1e-12 of the pinned-fold path."""
    from dataflow_example_spark.functions.similarity import (
        multi_lsh_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    slow = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in multi_lsh_near_dup_pairs(emb, threshold=0.4).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in multi_lsh_near_dup_pairs(
            emb, threshold=0.4, accelerated=True
        ).collect()
    }
    assert set(slow) == set(fast)
    for p in slow:
        assert abs(slow[p] - fast[p]) < 1e-12


def test_quantize_int8_bounds_and_zero_vector(spark):
    from dataflow_example_spark.functions.similarity import quantize_int8

    d = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 127.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [-0.003, 0.001, 0.002, -0.001]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r for r in quantize_int8(d).collect()}
    r1 = got[1]
    assert r1.qvec[3] == 127 and abs(r1.scale - 1.0) < 1e-12
    assert r1.max_abs_err <= r1.scale / 2 + 1e-12
    r2 = got[2]
    assert r2.scale == 0.0 and r2.qvec == [0, 0, 0, 0] and r2.max_abs_err == 0.0
    r3 = got[3]
    assert max(abs(q) for q in r3.qvec) == 127
    assert r3.max_abs_err <= r3.scale / 2 + 1e-12


def test_pq_adc_matches_numpy_bruteforce(spark):
    """ADC top-k must equal the numpy re-implementation exactly: same
    codes (argmin per subspace, ties to smaller id), same lookup-table
    sums, same (dist, id) ordering."""
    import numpy as np

    from dataflow_example_spark import queries as Q
    from tests.conftest import SF_SMOKE

    out = Q.QUERIES["sim_pq_adc_topk"](spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    M, SUB, K = 4, 16, 4
    cents = {c: emb[c] for c in range(K)}

    def sq_l2_seq(a, b):
        # sequential left fold, matching the engine's pinned aggregate
        # (numpy .sum() is pairwise and differs at the last ulp)
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (float(x) - float(y)) * (float(x) - float(y))
        return acc

    def codes(v):
        out = []
        for m in range(M):
            s = slice(m * SUB, (m + 1) * SUB)
            d = {c: sq_l2_seq(v[s], cv[s]) for c, cv in cents.items()}
            out.append(min(d.items(), key=lambda kv: (kv[1], kv[0]))[0])
        return out

    all_codes = {vid: codes(v) for vid, v in emb.items()}
    want = {}
    for qid in range(10):
        qv = emb[qid]
        dtab = [
            {
                c: sq_l2_seq(
                    qv[m * SUB:(m + 1) * SUB], cv[m * SUB:(m + 1) * SUB]
                )
                for c, cv in cents.items()
            }
            for m in range(M)
        ]
        scored = []
        for vid, cds in all_codes.items():
            if vid == qid:
                continue
            # fixed-order left fold, mirroring the engine expression
            acc = dtab[0][cds[0]]
            for m in range(1, M):
                acc = acc + dtab[m][cds[m]]
            scored.append((acc, vid))
        scored.sort()
        for rank, (d, vid) in enumerate(scored[:5], start=1):
            want[(qid, rank)] = (vid, d)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.adc_dist) for r in out}
    assert got == want


def test_pq_adc_self_distance_is_table_sum(spark):
    """A vector's ADC distance to a query equals the sum of its code
    cells — spot-check the invariant that ADC never reads the candidate
    vector (here: rank-1 neighbors all have non-negative distance)."""
    from dataflow_example_spark import queries as Q
    from tests.conftest import SF_SMOKE

    rows = Q.QUERIES["sim_pq_adc_topk"](spark, SF_SMOKE).collect()
    assert rows and all(r.adc_dist >= 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        ds = [r.adc_dist for r in sorted(rs, key=lambda r: r.rank)]
        assert ds == sorted(ds)


def test_random_projection_matches_numpy_reference(spark):
    """Basis-vector probe plus a dense vector, checked against a numpy
    reconstruction of the md5-parity sign matrix."""
    import hashlib

    import numpy as np

    from dataflow_example_spark.functions.similarity import random_projection

    d = 64
    rng = np.random.default_rng(7)
    vecs = [
        [1.0 if j == 5 else 0.0 for j in range(d)],  # basis e_5
        [float(np.float32(x)) for x in rng.normal(size=d)],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = random_projection(df, out_dim=8, in_dim=64)
    got = {(r["vec_id"], r["dim"]): r["value"] for r in out.collect()}

    def sign(k, j):
        h = hashlib.md5(f"rp:{k}:{j}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    assert len(got) == 16
    for k in range(8):
        assert got[(0, k)] == sign(k, 5) / 8.0
        want = sum(
            sorted(np.float64(np.float32(vecs[1][j])) * sign(k, j) for j in range(d))
        ) / 8.0
        assert abs(got[(1, k)] - want) < 1e-12


def test_ivf_assignment_tie_break_and_plan_shape(spark):
    """r8 literal-codebook assignment: equidistant centroids resolve to
    the smallest cid, and the plan is a pure map — no exchange, no
    aggregate, no join (the previous broadcast-fan-out + groupBy shape
    shuffled the full corpus with the vectors as grouping keys)."""
    from dataflow_example_spark.functions.similarity import assign_ivf_lists

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.001, -0.002]), (2, [-1.0, 5.0])],
        "vec_id bigint, embedding array<double>",
    )
    # two IDENTICAL centroids: every vector ties -> smallest cid (1)
    cents = spark.createDataFrame(
        [(3, [1.0, 0.0]), (1, [1.0, 0.0])], "cid bigint, cv array<double>"
    )
    out = assign_ivf_lists(emb, cents)
    assert all(r.list_id == 1 for r in out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "HashAggregate", "Join"):
        assert node not in plan, f"{node} in assignment plan:\n{plan}"


def test_kmeans_assign_matches_pre_r8_fanout_shape(spark):
    """The literal-codebook assignment must produce exactly what the
    old broadcast-fan-out + struct-max collapse produced (same cosine
    folds, same tie rule) — pinned by re-deriving the old shape inline
    on the smoke embeddings."""
    from dataflow_example_spark.functions.similarity import (
        _assign_to_centroids,
        cosine,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(200)
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("bigint").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    new = {
        r.vec_id: r.cluster
        for r in _assign_to_centroids(emb, cents, "vec_id", "embedding").collect()
    }
    c = F.broadcast(
        cents.select(F.col("cid").alias("_cid"), F.col("cv").alias("_cv"))
    )
    scored = emb.crossJoin(c).select(
        "vec_id",
        F.struct(
            cosine(F.col("embedding"), F.col("_cv")).alias("s"),
            (-F.col("_cid")).alias("neg_cid"),
        ).alias("_sc"),
    )
    old = {
        r.vec_id: -r["_best"]["neg_cid"]
        for r in scored.groupBy("vec_id").agg(F.max("_sc").alias("_best")).collect()
    }
    assert new == old


def test_ivf_and_kmeans_survive_empty_codebook(spark):
    """Empty centroid table (e.g. empty corpus): assignment must degrade
    to zero rows with the correct schema — the pre-r8 fan-out behavior —
    not crash building array_max over an empty literal array (caught by
    tools/empty_input_sweep.py on the r8 literal-codebook rewrite)."""
    from dataflow_example_spark.functions.similarity import (
        _assign_to_centroids,
        assign_ivf_lists,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    no_cents = spark.createDataFrame([], "cid bigint, cv array<double>")
    lists = assign_ivf_lists(emb, no_cents)
    assert lists.columns == ["vec_id", "embedding", "list_id"]
    assert lists.count() == 0
    clusters = _assign_to_centroids(emb, no_cents, "vec_id", "embedding")
    assert clusters.columns == ["vec_id", "embedding", "cluster"]
    assert clusters.count() == 0


def _assign_parity(spark, emb, cent, **kw):
    from dataflow_example_spark.functions.similarity import (
        assign_ivf_lists,
        assign_ivf_lists_arrow,
    )

    expr = {
        (r[0], r["list_id"])
        for r in assign_ivf_lists(emb, cent, **kw).collect()
    }
    arrow = {
        (r[0], r["list_id"])
        for r in assign_ivf_lists_arrow(emb, cent, **kw).collect()
    }
    assert arrow == expr, (
        f"arrow twin diverged: only_expr={sorted(expr - arrow)[:5]} "
        f"only_arrow={sorted(arrow - expr)[:5]}"
    )
    return expr


def test_assign_ivf_arrow_parity_real_corpus(spark):
    """The staged mapInArrow assignment twin must match the expression
    path EXACTLY (same list_id per vec_id, bit-for-bit winner) on the
    real sf0.001 embeddings against the same seed codebook sim_ivf_topk
    uses — the acceptance gate before any declared query may flip to
    the Arrow path in a later round."""
    from dataflow_example_spark.functions.similarity import valid_with_norm

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb = valid_with_norm(emb, "embedding", "_en")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    got = _assign_parity(spark, emb, cent, norm_col="_en")
    assert len(got) == emb.count()  # every valid vector assigned
    assert all(lid is not None for _, lid in got)


def test_assign_ivf_arrow_parity_adversarial(spark):
    """Adversarial parity corpus: NULL vectors, NULL elements, empty
    arrays, wrong dims, NaN/inf components, zero vectors, denormal
    norms, NULL/NaN/zero hand-supplied norms, degenerate (zero and
    overflowing) centroids — every row must take the exact same
    list_id (or NULL) on both paths, irregular-fallback and vectorized
    alike."""
    rows = [
        (0, [1.0, 0.0, 0.0], 1.0),            # clean
        (1, [0.0, 1.0, 0.0], 1.0),            # clean, other list
        (2, None, 1.0),                        # NULL vector
        (3, [1.0, None, 0.0], 1.0),           # NULL element, fake norm
        (4, [], 1.0),                          # empty array
        (5, [1.0, 0.0], 1.0),                  # too short
        (6, [1.0, 0.0, 0.0, 0.0], 1.0),        # too long
        (7, [float("nan"), 1.0, 0.0], 1.0),    # NaN component
        (8, [float("inf"), 1.0, 0.0], 1.0),    # inf component
        (9, [0.0, 0.0, 0.0], 0.0),             # zero vector, zero norm
        (10, [1.0, 1.0, 0.0], None),           # NULL norm
        (11, [1.0, 1.0, 0.0], float("nan")),   # NaN norm (NaN > 0 TRUE)
        (12, [1.0, 1.0, 0.0], 0.0),            # zero norm, nonzero vec
        (13, [5e-324, 0.0, 0.0], 5e-324),      # denormal: den underflows
        (14, [-1.0, -1.0, -1.0], 1.7320508),   # negative sims everywhere
        (15, [1.0, 2.0, 2.0], 3.0),            # exact-tie candidate bait
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, nv double"
    )
    cents = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 0.0]),     # degenerate zero centroid
        (3, [2.0, 4.0, 4.0]),     # same direction as vec 15 and cid 4
        (4, [1.0, 2.0, 2.0]),     # exact tie with cid 3 -> smaller wins
        (5, [1e308, 1e308, 0.0]), # norm overflows -> degenerate path
    ]
    cent = spark.createDataFrame(cents, "cid bigint, cv array<double>")
    _assign_parity(spark, emb, cent, norm_col="nv")
    # and the compute-norm-internally path (valid rows only, guards on)
    clean = emb.select("vec_id", "embedding")
    _assign_parity(spark, clean, cent)


def test_assign_ivf_arrow_parity_empty_codebook(spark):
    from dataflow_example_spark.functions.similarity import (
        assign_ivf_lists,
        assign_ivf_lists_arrow,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    cent = spark.createDataFrame([], "cid bigint, cv array<float>")
    assert assign_ivf_lists_arrow(emb, cent).count() == 0
    assert assign_ivf_lists(emb, cent).count() == 0


def test_assign_ivf_arrow_parity_float32_norm(spark):
    """A caller-supplied FLOAT norm column must widen to double inside
    the Arrow kernel exactly as the expression path promotes it before
    nv * ncv — float32 denominators round differently and flip winners
    near ties (review finding r15)."""
    import math as m

    rows = []
    # norms deliberately NOT the true norm and not float32-representable
    for i in range(40):
        v = [1.0 + i * 0.1000001, 2.0 - i * 0.0333333, 0.5 * i]
        rows.append((i, v, m.sqrt(sum(x * x for x in v)) * 1.0000001))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, nv float"
    )
    cents = [(0, [1.0, 0.1, 0.2]), (1, [0.3, 1.0, 0.5]), (2, [0.1, 0.2, 1.0])]
    cent = spark.createDataFrame(cents, "cid bigint, cv array<double>")
    _assign_parity(spark, emb, cent, norm_col="nv")


def _bucket_parity(spark, emb, n_tables=8, n_planes=4, dim=64):
    """Compare the multi-table bucket kernel against the expression
    explode construction it replaced in multi_lsh_near_dup_pairs."""
    from dataflow_example_spark.functions.similarity import (
        lsh_bucket,
        multi_lsh_buckets_arrow,
    )

    expr = emb.select(
        F.col("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        lsh_bucket(
                            "embedding", n_planes, dim,
                            plane_offset=t * n_planes,
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.*")
    a = sorted(
        (r.vec_id, r.table_id, r.bucket) for r in expr.collect()
    )
    b = sorted(
        (r.vec_id, r.table_id, r.bucket)
        for r in multi_lsh_buckets_arrow(
            emb, n_tables, n_planes, dim
        ).collect()
    )
    assert a == b, (
        f"bucket kernel diverged: first diffs "
        f"{[(x, y) for x, y in zip(a, b) if x != y][:5]}"
    )
    return b


def test_multi_lsh_buckets_arrow_parity_real_corpus(spark):
    """The mapInArrow bucket kernel must emit byte-equal (vec_id,
    table_id, bucket) rows vs the lsh_bucket expression explode on the
    real sf0.001 embeddings — both pre-guard (irregular rows included)
    and post-guard (the exact input multi_lsh_near_dup_pairs feeds
    it)."""
    from dataflow_example_spark.functions.similarity import valid_with_norm

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    got = _bucket_parity(spark, emb)
    assert len(got) == emb.count() * 8  # n_tables rows per input row
    guarded = valid_with_norm(emb, "embedding", "_mln").select(
        "vec_id", "embedding"
    )
    _bucket_parity(spark, guarded)


def test_multi_lsh_buckets_arrow_parity_adversarial(spark):
    """Adversarial corpus: NULL vector, empty, short/long dims, NULL
    element, NaN (dot NaN -> every bit SET: NaN >= 0 is TRUE in Spark),
    inf and inf+-inf (NaN dot), zero and -0.0 vectors (dot +-0.0 >= 0
    TRUE), fold overflow to inf, denormals, near-zero dots. Irregular
    rows must produce bucket 0 in every table on BOTH paths (zip_with
    NULL-padding poisons the fold; IF(NULL >= 0) takes the else
    branch)."""
    inf, nan = float("inf"), float("nan")
    rows = [
        (0, [1.0] * 64),
        (1, [-1.0] * 64),
        (2, None),
        (3, []),
        (4, [1.0] * 63),
        (5, [1.0] * 65),
        (6, [1.0] * 30 + [None] + [1.0] * 33),
        (7, [nan] * 64),
        (8, [inf] * 64),
        (9, [inf] + [-inf] + [0.0] * 62),
        (10, [0.0] * 64),
        (11, [-0.0] * 64),
        (12, [1e308] * 64),
        (13, [5e-324] * 64),
        (14, [1e-200] * 32 + [-1e-200] * 32),
        (15, [((i * 37) % 19 - 9) / 7.0 for i in range(64)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dict()
    for vid, tid, bucket in _bucket_parity(spark, emb):
        got.setdefault(vid, set()).add(bucket)
    # structural-irregular rows: bucket 0 in every table
    for vid in (2, 3, 4, 5, 6):
        assert got[vid] == {0}
    # NaN dot: all bits set in every table
    assert got[7] == {(1 << 4) - 1}


def test_multi_lsh_buckets_arrow_parity_float32(spark):
    """array<float> input (the engine's embedding type): the kernel
    must cast the Arrow child values to float64 before the fold, like
    the expression's transform(v, CAST AS DOUBLE)."""
    rows = [
        (i, [((i * 31 + d * 7) % 13 - 6) / 5.0 for d in range(64)])
        for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    _bucket_parity(spark, emb)
