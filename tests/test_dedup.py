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


def test_simhash_banded_equals_allpairs(spark):
    """The pigeonhole band join must lose NO pair vs the O(N^2) baseline
    (recall 1 for Hamming <= max_hamming) and add none."""
    from dataflow_example_spark.functions.dedup import simhash_pairs_allpairs

    d = docs(
        spark,
        [
            (i, f"alpha beta gamma delta epsilon {w}")
            for i, w in enumerate(
                ["zeta", "zeta", "eta", "theta iota", "kappa", "zeta eta"]
            )
        ],
    )
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(d, max_hamming=3).collect()
    }
    allpairs = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_allpairs(d, max_hamming=3).collect()
    }
    assert banded == allpairs
    assert banded  # non-vacuous: at least the identical docs pair


def test_jaccard_on_candidates_matches_baseline(spark):
    """Candidate-scoped exact Jaccard == corpus-wide baseline restricted
    to the candidate set (same measure, bounded work)."""
    from dataflow_example_spark.functions.dedup import (
        jaccard_on_candidates,
        minhash_lsh_pairs,
    )

    d = docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "an entirely different sentence with other words"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
    )
    cand = minhash_lsh_pairs(d)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_on_candidates(d, cand, threshold=0.2).collect()
    }
    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(d, threshold=0.2).collect()
    }
    cand_set = {(r.doc_a, r.doc_b) for r in cand.collect()}
    assert got == {p: j for p, j in base.items() if p in cand_set}
    assert (1, 4) in got and got[(1, 4)] == 1.0


def test_connected_components_nonconverged_raises(spark):
    """A 5-node chain has diameter 4 > max_iters=2 worth of propagation:
    the default must refuse to return split labels."""
    import pytest as _pytest

    from dataflow_example_spark.functions.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a LONG, doc_b LONG"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)
    # warn mode returns (possibly wrong) labels instead of raising
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(chain, max_iters=2, on_nonconverged="warn")
        assert out.count() == 6
        assert any("did not converge" in str(x.message) for x in w)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir knob: same answer through reliable checkpoint()
    (cluster fault-tolerance path)."""
    from dataflow_example_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            edges, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    # the reliable checkpoint actually wrote to the dir
    assert any((tmp_path / "ckpt").iterdir())


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


def test_connected_components_log_rounds_on_long_chain(spark):
    """Pointer jumping: a 64-node chain (diameter 63) converges well
    within 12 rounds — plain one-hop propagation would need 63."""
    from dataflow_example_spark.functions.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "doc_a LONG, doc_b LONG"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(chain, max_iters=12).collect()
    }
    assert set(got.values()) == {1} and len(got) == 64


def test_exact_dedup_normalized_collapses_variants(spark):
    """Case/punctuation/whitespace variants share one normalized group;
    genuinely different content does not."""
    from dataflow_example_spark.functions.dedup import exact_dedup_normalized

    out = exact_dedup_normalized(
        docs(
            spark,
            [
                (1, "Hello, World!"),
                (2, "hello   world"),
                (3, "HELLO WORLD."),
                (4, "goodbye world"),
            ],
        )
    ).collect()
    groups = {r.doc_id: r.n_dups for r in out}
    assert groups == {1: 3, 4: 1}


def test_edit_distance_pairs_equals_naive_blocked_join(spark):
    """PassJoin segment blocking must be EXACT: identical pairs to the
    naive within-block self-join, including insert/delete edits that
    shift segment positions (the case aligned-segment blocking misses)."""
    import random

    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.dedup import edit_distance_pairs

    rng = random.Random(7)
    alphabet = "abcde"
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(5, 14)))
            for _ in range(40)]
    rows, rid = [], 0
    for s in base:
        for block in (0, 1):
            rows.append((rid, block, s))
            rid += 1
            # mutated neighbors: substitution / deletion / insertion / two edits
            for _ in range(2):
                t = list(s)
                for _ in range(rng.randint(1, 2)):
                    op = rng.choice("sdi")
                    p = rng.randrange(len(t)) if t else 0
                    if op == "s" and t:
                        t[p] = rng.choice(alphabet)
                    elif op == "d" and len(t) > 1:
                        del t[p]
                    else:
                        t.insert(p, rng.choice(alphabet))
                rows.append((rid, block, "".join(t)))
                rid += 1
    # boundary lengths: empty and near-empty names (two empties in the same
    # block are an edit-distance-0 pair the length-probe must not drop)
    for block in (0, 1):
        for nm in ("", "", "a", "ab"):
            rows.append((rid, block, nm))
            rid += 1
    df = spark.createDataFrame(rows, "id bigint, block int, name string")

    got = {
        (r.block, r.id_a, r.id_b, r.edit_dist)
        for r in edit_distance_pairs(
            df, block_col="block", id_col="id", name_col="name", k=2
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    want = {
        (r.block, r.id_a, r.id_b, r.edit_dist)
        for r in (
            a.join(b, "block")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                "block",
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.levenshtein(F.col("a.name"), F.col("b.name")).alias(
                    "edit_dist"
                ),
            )
            .filter(F.col("edit_dist") <= 2)
        ).collect()
    }
    assert got == want
    assert want, "fixture produced no within-threshold pairs"


def test_star_cc_equals_pointer_jumping_cc(spark):
    """Large-star/small-star contraction must produce identical clusters
    to min-label propagation on every graph shape: adversarial chain,
    clique, star, isolated pairs, random clumps."""
    import random

    from dataflow_example_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(0, 50)]  # 51-node chain
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(200, 200 + i) for i in range(1, 8)]
    edges += [(300, 301), (400, 401)]
    edges += [
        (rng.randrange(500, 560), rng.randrange(500, 560)) for _ in range(80)
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "doc_a bigint, doc_b bigint"
    )
    got_pj = {
        (r.doc_id, r.cluster_id) for r in connected_components(df).collect()
    }
    got_star = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(df).collect()
    }
    assert got_pj == got_star
    # every label is the component minimum: label of a label is itself
    labels = dict(got_star)
    assert all(labels[lbl] == lbl for lbl in set(labels.values()))


def test_star_cc_chain_converges_quickly(spark):
    """A 200-node chain must converge well inside the default round
    budget (the adversarial case star contraction exists for)."""
    from dataflow_example_spark.functions.dedup import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a bigint, doc_b bigint"
    )
    out = connected_components_star(df, max_iters=12).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == 201


def test_lsh_bucket_cap_quarantines_hot_band(spark):
    """Skew guard: a 30-doc boilerplate clique must produce ZERO pairs
    under the cap (the hot bucket is quarantined, not partially joined),
    while unrelated near-dup pairs survive; the overflow report lists
    every over-cap bucket with its size."""
    from dataflow_example_spark.functions.dedup import (
        lsh_bucket_overflow,
        minhash_lsh_pairs,
    )

    rows = [
        (i, "the same boilerplate template text repeated everywhere")
        for i in range(30)
    ]
    rows += [
        (100, "a genuinely unique document about gardens"),
        (101, "a genuinely unique document about gardens and trees"),
    ]
    d = docs(spark, rows)
    capped = minhash_lsh_pairs(d, bucket_cap=8).collect()
    pair_ids = {(r.doc_a, r.doc_b) for r in capped}
    assert all(a >= 100 for a, _ in pair_ids)  # clique fully quarantined
    over = lsh_bucket_overflow(d, bucket_cap=8).collect()
    assert over and all(r.bucket_size == 30 for r in over)
    # no cap -> clique pairs present (the task the guard exists to bound)
    assert minhash_lsh_pairs(d).count() >= 30 * 29 // 2


def test_lsh_cap_noop_on_small_buckets(spark):
    """With every bucket under the cap, capped output == uncapped output
    (the guard is pay-as-you-go)."""
    from dataflow_example_spark.functions.dedup import minhash_lsh_pairs

    d = docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "an entirely different sentence with other words"),
        ],
    )
    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(d, bucket_cap=64).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(d).collect()
    }
    assert got == want


def test_incremental_dedup_verdicts(spark):
    from dataflow_example_spark.functions.dedup import incremental_dedup

    base = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id LONG, text STRING"
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha"),   # dup of base -> not new
            (11, "gamma"),   # fresh, batch winner -> new
            (12, "gamma"),   # fresh but loses within-batch -> not new
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["base_doc_id"], r["is_new"])
        for r in incremental_dedup(base, batch).collect()
    }
    assert got[10] == (1, False)
    assert got[11] == (None, True)
    assert got[12] == (None, False)
    assert len(got) == 3


def test_substring_dup_pairs_alignment_and_dedup(spark):
    from dataflow_example_spark.functions.dedup import substring_dup_pairs

    shared = "X" * 5 + "the quick brown fox jumps over lazy." + "Y" * 20
    docs = spark.createDataFrame(
        [
            # doc 1 and 2 share a 30-char run starting at a stride
            # position in both (positions 1, 11, 21, ...)
            (1, "a" * 10 + "0123456789012345678901234567890123456789"),
            (2, "b" * 20 + "0123456789012345678901234567890123456789"),
            (3, "z" * 60),            # no overlap with anyone
            (4, "short"),             # below min length -> dropped
            (5, "c" * 10 + "0123456789012345678901234567890123456789"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in substring_dup_pairs(docs).collect()
    }
    # the 40-char digit run starts at 11 in doc1/doc5 and 21 in doc2 —
    # all stride positions, so its aligned shingles match pairwise
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got
    assert all(a != 3 and b != 3 for a, b in got)
    assert all(a != 4 and b != 4 for a, b in got)
    # within-doc repetition cannot inflate: doc3 vs itself is excluded
    # by a < b, and counts are over DISTINCT shingle values
    assert got[(1, 5)] == got[(1, 2)]


def test_simhash_wide_bits_high_bits_vary(spark):
    """bits > 32 must use the 60-bit token hash so bits 32+ of the
    signature actually vary across docs (r11: the old 32-bit token hash
    left them constant zero, collapsing wide bands into giant buckets
    — 59.6M -> 1.57B band-join candidates on the 10x smoke corpus)."""
    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.dedup import simhash

    d = docs(
        spark,
        [(i, f"word{i} token{i * 7} item{i * 13} thing{i * 29}") for i in range(40)],
    )
    sig = simhash(d, bits=60)
    distinct_high = (
        sig.select(F.shiftright(F.col("simhash"), 32).alias("hi"))
        .distinct()
        .count()
    )
    assert distinct_high > 1, "signature bits 32-59 are constant"


def test_simhash_wide_banded_equals_allpairs(spark):
    """Recall-1 pigeonhole equality must hold at the widened signature
    too (same contract as the 32-bit test, bits=60)."""
    from dataflow_example_spark.functions.dedup import simhash_pairs_allpairs

    d = docs(
        spark,
        [
            (i, f"alpha beta gamma delta epsilon {w}")
            for i, w in enumerate(
                ["zeta", "zeta", "eta", "theta iota", "kappa", "zeta eta"]
            )
        ],
    )
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(d, max_hamming=3, bits=60).collect()
    }
    allpairs = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_allpairs(d, max_hamming=3, bits=60).collect()
    }
    assert banded == allpairs
    assert banded


def test_simhash_bits_validation(spark):
    import pytest as _pytest

    from dataflow_example_spark.functions.dedup import simhash

    d = docs(spark, [(1, "alpha")])
    for bad in (0, -4, 61, 64, 128):
        with _pytest.raises(ValueError, match="bits"):
            simhash(d, bits=bad)
