"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the curated fixtures — the banded-SimHash recall
guarantee, chunking coverage, and sampling partition laws.

Spark-session-per-example would be prohibitive, so examples are
generated first and run through a shared session (module-scoped via the
conftest fixture); deadlines are disabled because executor scheduling
jitter dwarfs hypothesis's defaults.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

texts = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=12
).map(" ".join)
corpora = st.lists(texts, min_size=1, max_size=8)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=corpora)
@_SETTINGS
def test_simhash_banded_recall_property(spark, corpus):
    """For any corpus: banded pairs == all-pairs (pigeonhole recall 1)."""
    from dataflow_example_spark.functions.dedup import (
        simhash_pairs,
        simhash_pairs_allpairs,
    )

    d = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
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


@given(corpus=corpora, chunk=st.integers(2, 6), stride=st.integers(1, 6))
@_SETTINGS
def test_chunking_covers_every_token(spark, corpus, chunk, stride):
    """For any corpus and any chunk/stride: concatenating each doc's
    chunks at stride offsets reproduces the token stream exactly (no
    token lost or duplicated at window boundaries when stride >= chunk;
    every token present at least once when stride < chunk)."""
    from dataflow_example_spark.functions.text import chunk_documents, tokens
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    toks = {
        r.doc_id: r.t
        for r in d.select(
            "doc_id", tokens(F.col("text")).alias("t")
        ).collect()
    }
    out = chunk_documents(d, chunk_tokens=chunk, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        stream = toks[doc_id]
        # chunk i must equal tokens[i*stride : i*stride + chunk]
        for r in rows:
            start = r.chunk_idx * stride
            want = stream[start : start + chunk]
            assert r.chunk_text.split(" ") == want
            assert r.n_chunk_tokens == len(want)
        # starts step by stride while <= n_tokens -> full coverage
        assert len(rows) == (len(stream) - 1) // stride + 1
    for doc_id, stream in toks.items():
        assert (doc_id in by_doc) == (len(stream) > 0)


@given(
    n=st.integers(1, 60),
    frac=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
@_SETTINGS
def test_split_partitions_exactly(spark, n, frac):
    """train/test split: every row lands in exactly one side, and the
    test side equals hash_sample at the same fraction/salt (threshold
    nesting law)."""
    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.sampling import (
        hash_sample,
        train_test_split,
    )

    d = spark.range(n).select(F.col("id").alias("doc_id"))
    out = train_test_split(d, "doc_id", test_fraction=frac, salt="p")
    rows = out.collect()
    assert len(rows) == n
    test_ids = {r.doc_id for r in rows if r.split == "test"}
    sampled = {
        r.doc_id for r in hash_sample(d, "doc_id", frac, salt="p").collect()
    }
    assert test_ids == sampled


_TOKEN_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t.,;:!?-_/()[]{}'\"@#$%^&*+=|\\~`<>\n"
    "äöüßéñçàø漢字カナ"
)


@given(
    texts=st.lists(
        st.text(alphabet=_TOKEN_ALPHABET, max_size=40),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_tokenizer_contract_matches_duckdb(spark, texts):
    """The tokenizer (lower -> split on non-[a-z0-9] runs -> drop empties)
    is the contract ~30 oracles build on; Spark's expression and the
    DuckDB fragment must agree token-for-token on arbitrary input,
    including unicode that lowercases outside [a-z0-9] (it must all act
    as separator)."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.text import tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: list(r.t)
        for r in df.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    want = {
        i: list(t)
        for i, t in con.execute(
            "SELECT doc_id, list_filter(string_split_regex(lower(text),"
            " '[^a-z0-9]+'), x -> x <> '') FROM documents"
        ).fetchall()
    }
    assert got == want


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=40,
)


@given(edges=edge_lists)
@_SETTINGS
def test_star_cc_equals_pointer_jumping_property(spark, edges):
    """For ANY random multigraph (self-loops and duplicate edges
    included), star contraction and pointer-jumping label propagation
    must produce identical components, and every label must be its
    component's minimum (label of a label is itself)."""
    from dataflow_example_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    df = spark.createDataFrame(clean, "doc_a bigint, doc_b bigint")
    pj = {(r.doc_id, r.cluster_id) for r in connected_components(df).collect()}
    star = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(df).collect()
    }
    assert pj == star
    labels = dict(star)
    assert all(labels[lbl] == lbl for lbl in set(labels.values()))


intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # user
        st.integers(min_value=0, max_value=100),   # start second
        st.integers(min_value=1, max_value=40),    # duration seconds
    ),
    min_size=1,
    max_size=25,
)


@given(iv=intervals)
@_SETTINGS
def test_interval_overlap_matches_bruteforce(spark, iv):
    """Sweep-line max concurrency == brute-force point-in-interval max
    for ANY half-open interval set."""
    import datetime
    import tempfile

    from pyspark.sql import functions as F

    from dataflow_example_spark import queries

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=s), float(d))
        for u, s, d in iv
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    d = tempfile.mkdtemp(prefix="dfx_ivp_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r.user_id: r.max_concurrent
        for r in queries.QUERIES["events_interval_overlap_count"](
            spark, d
        ).collect()
    }
    # brute force: at each interval start, count intervals covering it
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, s, dur in iv:
        by_user.setdefault(u, []).append((s, s + dur))
    want = {
        u: max(
            sum(1 for (s2, e2) in ivs if s2 <= s < e2) for (s, _e) in ivs
        )
        for u, ivs in by_user.items()
    }
    assert got == want


@given(corpus=corpora)
@_SETTINGS
def test_containment_bounds_jaccard_property(spark, corpus):
    """For every candidate pair: max(containment_a, containment_b) >=
    jaccard >= min-containment * (smaller/larger) — and containment of
    the smaller-shingle-set side is always the larger one."""
    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.dedup import (
        jaccard_on_candidates,
        minhash_lsh_pairs,
        shingles,
    )

    rows = [(i, t) for i, t in enumerate(corpus)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    cand = minhash_lsh_pairs(d).select("doc_a", "doc_b")
    if not cand.count():
        return
    sh = shingles(d)
    counts = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_on_candidates(d, cand, threshold=0.0).collect()
    }
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .collect()
    )
    for r in inter:
        ca = r.n_common / counts[r.doc_a]
        cb = r.n_common / counts[r.doc_b]
        j = jac[(r.doc_a, r.doc_b)]
        assert max(ca, cb) >= j - 1e-12
        assert min(ca, cb) <= 1.0 + 1e-12


@given(corpus=corpora)
@_SETTINGS
def test_pack_bins_conserves_tokens(spark, corpus):
    """The shard manifest conserves tokens: per-group bin sums equal the
    group's total token count, and bins start at 0 with no gaps."""
    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.packing import pack_documents
    from dataflow_example_spark.functions.text import tokens

    rows = [(i, "en" if i % 2 else "de", t) for i, t in enumerate(corpus)]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    packed = pack_documents(d, budget=8)
    manifest = (
        packed.groupBy("group", "first_bin")
        .agg(F.sum("n_tokens").alias("bin_tokens"))
        .collect()
    )
    totals = {
        r.lang: r.t
        for r in d.select("lang", F.size(tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
        .groupBy("lang")
        .agg(F.sum("n").alias("t"))
        .collect()
    }
    by_group: dict[str, int] = {}
    bins: dict[str, list[int]] = {}
    for r in manifest:
        by_group[r.group] = by_group.get(r.group, 0) + r.bin_tokens
        bins.setdefault(r.group, []).append(r.first_bin)
    assert by_group == totals
    for g, bs in bins.items():
        bs.sort()
        assert bs[0] == 0  # stream starts at offset 0
