"""Deduplication operators for LLM-data pipelines (beyond-reference;
BASELINE.json north star): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (100 TB):
- exact dedup is one hash-shuffle on a 16-byte key — the cheapest path;
  group on md5(text), never on the raw text (shuffle bytes).
- n-gram Jaccard self-join explodes on shingles; hot shingles skew the
  join. It is the *verifier* — run it only on candidate pairs. The scale
  path to candidates is MinHash+LSH (band buckets bound comparisons) —
  that is why both exist here.
- all hashes are md5-derived and engine-portable (the DuckDB oracles
  compute the identical signatures), deterministic across runs/cluster
  sizes — no seed state on executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

N_MINHASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows

# connected_components(batch_steps="auto") batches two label-propagation
# steps per checkpoint only when the symmetrized edge list has at least
# this many rows (= 2x undirected edge count). Measured bounds on
# local[32] (interleaved min-of-3, r11): batching LOSES ~40% at 200k
# symmetrized rows and WINS 2.6x at 2M; the threshold sits at the
# measured-bounds midpoint. On a real cluster the crossover moves with
# per-materialization overhead (scheduler + reliable-checkpoint write):
# higher barrier cost -> batch earlier (lower this), faster barriers ->
# raise it.
_BATCH_STEPS_MIN_EDGES = 1_000_000


def _hash32(c: Column) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5, as bigint.
    (DuckDB: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT).)"""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def _hash60(c: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5, as bigint
    (15 hex digits = 60 bits, safely inside int64). Exists for simhash
    signatures wider than 32 bits: a signature bit j can only vary if
    the TOKEN hash has a bit j, so the token hash must be at least as
    wide as the signature (r11 — bits=60 over _hash32 made bits 32-59
    constant zero for every doc, collapsing the wide bands into a
    handful of giant buckets: 59.6M -> 1.57B band-join candidates on
    the 10x smoke corpus, measured)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: hash-groupBy on md5(text). Returns one row
    per distinct content with the min doc_id as representative."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("doc_id", "content_md5", "n_dups")
    )


def exact_dedup_normalized(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-insensitive exact dedup: the content key is the md5
    of the normalized token stream (lowercase, punctuation/whitespace
    collapsed — the shared tokenizer contract), so documents differing
    only in case, punctuation, or spacing collapse into one group. The
    "fuzzy-exact" middle ground between byte-exact dedup and MinHash
    (CCNet-style paragraph normalization applies the same idea).
    Same single 16-byte-key shuffle as ``exact_dedup``.
    """
    norm_key = F.md5(F.concat_ws(" ", tokens(F.col(text_col))))
    return (
        docs.select("doc_id", norm_key.alias("norm_md5"))
        .groupBy("norm_md5")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("doc_id", "norm_md5", "n_dups")
    )


def shingles(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct k-word shingles per document: (doc_id, shingle).

    The token array is materialized as a column BEFORE the shingle
    lambda runs: higher-order functions evaluate interpreted (no
    codegen), and a lambda body referencing the raw ``tokens(text)``
    expression re-runs the regex tokenizer per position instead of once
    per row — measured 18x slower at sf0.1."""
    toks = tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("_toks")).filter(
        F.size("_toks") >= k
    )
    sh = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - k + 1),
        lambda i: F.array_join(F.slice("_toks", i, k), " "),
    )
    return base.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity — the
    corpus-wide baseline (quadratic on hot shingles; test-scale only).
    The scale path is ``jaccard_on_candidates`` over ``minhash_lsh_pairs``
    output, which evaluates the same measure on a bounded candidate set.

    Self-join on shingles -> per-pair intersection counts; union from
    per-doc shingle counts. Exact integer arithmetic; the double division
    is the single final op (oracle-identical).
    """
    sh = shingles(docs, k, text_col).cache()
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_on_candidates(
    docs: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard, evaluated ONLY on candidate pairs — the
    verification stage its docstring role assigns to ``jaccard_pairs``,
    composed with an LSH candidate generator for scale.

    ``candidates``: (doc_a, doc_b) pairs (e.g. ``minhash_lsh_pairs``
    output). Plan: candidates join shingles on doc_a, then an equi-join on
    (doc_b, shingle) counts common shingles per pair — work is
    O(|candidates| x shingles-per-doc), not O(corpus^2); the hot-shingle
    skew of the corpus-wide self-join never materializes because the
    shingle join is keyed by (doc_b, shingle), unique per doc.
    Candidate pairs with zero common shingles drop out (inner join), as
    they must at any threshold > 0.
    """
    sh = shingles(docs, k, text_col).cache()
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cand = candidates.select("doc_a", "doc_b")
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = N_MINHASHES,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc via the standard two-word universal
    scheme: ONE md5 per shingle yields words h1 (hex digits 1-8) and h2
    (digits 9-16); hash i = (h1 + i*h2) mod 2^32. 16x fewer digest
    computations than hashing per-i, same independence guarantees in
    practice (Indyk; used by datasketch and Spark MLlib's MinHashLSH).
    One explode + one groupBy with n_hashes min() aggregates (partial
    aggregation map-side)."""
    sh = shingles(docs, k, text_col)
    # The n_hashes column expressions are built as SQL strings parsed
    # JVM-side in one selectExpr call, not as Python Column arithmetic:
    # the operator-overload form makes thousands of py4j round trips
    # (measured 2.8 s of pure driver-side plan construction at n=128 vs
    # 0.6 s for the string form, bit-identical results). The explicit
    # _h1/_h2 pre-projection also evaluates the md5/conv pair once per
    # shingle instead of leaning on codegen CSE across 128 copies.
    pre = sh.selectExpr(
        "doc_id",
        "CAST(CONV(SUBSTRING(md5(shingle), 1, 8), 16, 10) AS BIGINT) AS _h1",
        "CAST(CONV(SUBSTRING(md5(shingle), 9, 8), 16, 10) AS BIGINT) AS _h2",
    )
    hashes = [
        f"(_h1 + {i} * _h2) % CAST(4294967296 AS BIGINT) AS h{i}"
        for i in range(n_hashes)
    ]
    return (
        pre.selectExpr("doc_id", *hashes)
        .groupBy("doc_id")
        .agg(*[F.expr(f"min(h{i}) AS mh{i}") for i in range(n_hashes)])
    )


def _band_rows(
    sig: DataFrame, n_hashes: int, band_size: int
) -> DataFrame:
    """Explode signatures to one row per (doc, band): (doc_id, band_id,
    b0..b{band_size-1})."""
    n_bands = n_hashes // band_size
    # inline() explodes the struct array straight to columns in ONE
    # JVM-parsed expression (same py4j-round-trip reasoning as
    # minhash_signatures; the parsed tree matches the old
    # explode(array(struct(...)))+select("band.*") pair exactly).
    structs = ",".join(
        f"named_struct('band_id', {b}, "
        + ",".join(
            f"'b{r}', mh{b * band_size + r}" for r in range(band_size)
        )
        + ")"
        for b in range(n_bands)
    )
    return sig.selectExpr("doc_id", f"inline(array({structs}))")


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = N_MINHASHES,
    band_size: int = BAND_SIZE,
    k: int = 3,
    text_col: str = "text",
    bucket_cap: int | None = None,
    scores: bool = True,
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one full minhash band,
    with the estimated similarity = fraction of equal minhash components.

    ``scores=False`` returns just the distinct (doc_a, doc_b) candidate
    set — the identical pairs, minus the ``est_jaccard`` column and the
    two signature re-joins that compute it. Consumers that only need
    edges (connected components) use this: Catalyst cannot prune an
    inner join away even when its columns go unused, so the score joins
    would otherwise execute inside the CC loop's eager edge
    materialization (r10 construct-cost work). With a single signature
    reader left, the signatures cache is skipped too.

    Scale path: band buckets bound the comparison set; the band join
    shuffles on (band_id, band values) — high-cardinality keys, AQE
    handles residual skew.

    ``bucket_cap`` is the skew guard for boilerplate-heavy corpora
    (same template -> same band -> one pathologically hot bucket whose
    self-join is O(size²) in a single task): buckets with more than
    ``bucket_cap`` members are excluded from pair generation entirely —
    deterministic, and the right curation semantics too, since a
    template shared by thousands of documents is better handled by the
    exact/normalized dedup family than by per-pair comparison. Quarantined
    buckets are observable via ``lsh_bucket_overflow`` (the
    traffic_quarantine pattern). The cap filter is a count-aggregate +
    inner join on the SAME (band_id, band values) key as the pair join,
    so it co-partitions with the shuffle it protects.
    """
    sig = minhash_signatures(docs, n_hashes, k, text_col)
    if scores or bucket_cap is not None:
        # the signature scan (tokenize -> shingles -> n_hashes mins) has
        # two readers in either of these modes — the score re-joins
        # when ``scores``, or the bucket-count aggregate + pair join
        # both reading ``bands`` when ``bucket_cap`` is set (r11,
        # ADVICE: scores=False + bucket_cap silently ran the scan
        # twice). With neither knob, bands is the only reader and a
        # cache would be pure write overhead.
        sig = sig.cache()
    bands = _band_rows(sig, n_hashes, band_size)
    band_cols = ["band_id"] + [f"b{r}" for r in range(band_size)]
    if bucket_cap is not None:
        ok = (
            bands.groupBy(*band_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= bucket_cap)
            .drop("_n")
        )
        bands = bands.join(ok, band_cols)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, [F.col(f"a.{c}") == F.col(f"b.{c}") for c in band_cols])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    if not scores:
        return cand
    # string-built projections, same py4j-cost reasoning as
    # minhash_signatures (the 2 x n_hashes aliases plus the n_hashes-term
    # equality sum were another ~0.5 s of driver-side plan construction)
    sa = sig.selectExpr(
        "doc_id AS doc_a", *[f"mh{i} AS a{i}" for i in range(n_hashes)]
    )
    sb = sig.selectExpr(
        "doc_id AS doc_b", *[f"mh{i} AS b{i}" for i in range(n_hashes)]
    )
    eq = " + ".join(f"IF(a{i} = b{i}, 1, 0)" for i in range(n_hashes))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"CAST({eq} AS DOUBLE) / {n_hashes} AS est_jaccard",
        )
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """Per-doc SimHash over the token multiset: bit j of the signature is
    the sign of sum over tokens of (+1 if bit j of hash(token) else -1).

    ``bits`` up to 32 uses the 32-bit token hash (the oracle-matched
    default path, byte-stable since r2); 33..60 switches to the 60-bit
    token hash so every signature bit actually varies (see _hash60).
    Wider signatures buy wider bands in ``simhash_pairs`` — band bucket
    space 2^ceil(bits/(h+1)) — the knob that matters when random band
    collisions, not true duplicates, dominate the candidate volume.
    Capped at 60: the signature assembles into a signed BIGINT."""
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in 1..60, got {bits}")
    tok_hash = _hash32 if bits <= 32 else _hash60
    toks = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("tok"))
    hashed = toks.select("doc_id", tok_hash(F.col("tok")).alias("h"))
    # string-built aggregates/assembly, same py4j-cost reasoning as
    # minhash_signatures (bits x (shiftright+and+case) Column objects
    # were hundreds of driver round trips; the parsed trees are
    # identical: IF vs two-branch CASE WHEN is surface syntax only)
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(IF((shiftright(h, {j}) & 1) = 1, 1, -1)) AS s{j}"
            )
            for j in range(bits)
        ]
    )
    sig = " + ".join(
        f"IF(s{j} > 0, CAST({2 ** j} AS BIGINT), CAST(0 AS BIGINT))"
        for j in range(bits)
    )
    return bit_sums.selectExpr("doc_id", f"({sig}) AS simhash")


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — banded bucketing
    (the scale path), with recall 1 by the pigeonhole principle.

    Split the ``bits``-bit signature into ``max_hamming + 1`` bands: any
    pair within Hamming distance ``max_hamming`` differs in at most
    ``max_hamming`` bit positions, so at least one band is *exactly* equal.
    Candidates = pairs sharing any exact band (hash self-join on
    (band_id, band_bits) — never an all-pairs cross join), then one
    ``bit_count`` residual filter over the full signatures. Result set is
    identical to the all-pairs baseline (``simhash_pairs_allpairs``,
    asserted equal in tests); the plan is a shuffle-bounded hash join.
    """
    n_bands = max_hamming + 1
    band_bits = -(-bits // n_bands)  # ceil
    mask = (1 << band_bits) - 1
    sig = simhash(docs, bits, text_col).cache()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.*")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_allpairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """All-pairs SimHash baseline (test-only verifier for the banded
    ``simhash_pairs``): O(N^2) cross join — never ship this against a
    full corpus; it exists to assert the banded path loses no pairs."""
    sig = simhash(docs, bits, text_col)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 64,
    checkpoint_dir: str | None = None,
    on_nonconverged: str = "raise",
    stats: dict | None = None,
    dedupe_edges: bool = True,
    batch_steps: int | str = "auto",
) -> DataFrame:
    """Connected components over near-dup pair edges -> (doc_id,
    cluster_id = min doc_id in component). The step that turns pairwise
    near-dup evidence into dedup groups.

    ``dedupe_edges=False`` skips the symmetrized edge list's distinct —
    duplicate edges never change any min-label (MIN is idempotent), only
    the per-round join fan-out, so a caller whose edges are distinct
    (a, b) pairs with a < b (every pair generator in this module) saves
    the distinct's shuffle from the eager edge materialization; leave it
    True for edge lists of unknown multiplicity, where one upfront
    dedup amortizes over every round.

    Iterative min-label propagation with pointer jumping: each round
    every node adopts the smallest label among itself and its neighbors
    (one hop), then shortcuts through its label's label
    (label'(u) = label(label(u))) — the jump halves remaining
    pointer-chain depth, so rounds ~ O(log component diameter), the same
    asymptotics as large-star/small-star contraction with simpler
    invariants. Each round is two shuffles; the loop is driver-side
    control flow over lazy plans with a convergence check, the standard
    Spark pattern for iterative algorithms (same shape as GraphFrames'
    CC). Checkpoints truncate the growing lineage so round N doesn't
    recompute rounds 1..N-1.

    ``batch_steps`` controls how many hop+jump steps run per
    checkpoint from the second materialization on (the first stays
    single-step so shallow graphs — the common dedup corpus, clusters
    of 2-5 docs — exit without paying a no-op step). Batching trades
    compute for barriers: chaining a second step in one lineage
    re-evaluates the first step's subtree through the self-joins
    (~1.5x one step's join work) but halves the eager-checkpoint
    count. The r11 interleaved A/B on pathological chains found the
    trade only pays when per-materialization overhead dominates the
    step compute: a 1M-edge chain runs 2.6x faster batched (SCALE.md
    r10) while a 100k-edge chain runs ~40 % SLOWER (12.5 s single vs
    17.8 s batched, min-of-3 interleaved; a lazy persist of the
    intermediate step was worse still — cache fill cost more than the
    recompute it saved). The default "auto" therefore batches only
    when the symmetrized edge list is large (>= _BATCH_STEPS_MIN_EDGES,
    a one-job count of the already-checkpointed edges); pass 1 or 2 to
    force a mode. ``max_iters`` and ``stats["rounds"]`` count steps,
    not materializations.

    Fault tolerance: when ``checkpoint_dir`` is set, rounds use reliable
    ``checkpoint()`` against it (survives executor loss — required for
    hour-long jobs on a real cluster); otherwise ``localCheckpoint()``
    (fast, lineage-only — fine for short local runs, lost on executor
    failure).

    If ``max_iters`` is exhausted before convergence the labels are WRONG
    (components split). ``on_nonconverged`` controls the response:
    "raise" (default) / "warn" / "ignore". Rounds needed ~ log2(component
    diameter) + 1 (each round is one hop then one pointer jump); the
    default 64 therefore covers any diameter a real corpus can produce
    (2^60+) while converged graphs still exit after their log-diameter
    rounds — measured on synthetic path graphs in
    tools/scale_smoke_cc_chain.py (the r9 pathological-chain smoke: a
    1M-edge single chain converges in 20 rounds, which the old default
    of 20 could NOT accommodate with its +1 confirm round). Callers
    setting a tight ``max_iters`` with batching in play should budget
    one extra STEP of headroom: convergence is observed at batch
    boundaries (``_chg`` compares batch-start to batch-end), so a graph
    reaching its fixed point on the first step of a two-step batch
    spends that batch's second (no-op) step plus one confirming batch
    before the zero-change exit — correct labels throughout, but up to
    one more counted step than the single-step loop would use.

    ``stats``, when a dict is passed, receives {"rounds": int,
    "converged": bool} for smoke/observability tooling.
    """
    if on_nonconverged not in ("raise", "warn", "ignore"):
        raise ValueError(f"bad on_nonconverged: {on_nonconverged!r}")
    if batch_steps != "auto" and (
        not isinstance(batch_steps, int)
        or isinstance(batch_steps, bool)
        or batch_steps < 1
    ):
        raise ValueError(f"bad batch_steps: {batch_steps!r}")
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # Evaluate the edge lineage ONCE: materialize the directed edge
    # list (tiny — two id columns) before symmetrizing, so the
    # union-of-swapped below reads the checkpoint twice instead of
    # running the caller's edge pipeline twice — for callers whose edges
    # are an expensive pipeline (the LSH near-dup generators) the former
    # shape re-ran the whole re-rank stage in the second union branch
    # inside the eager persist (r15 profile: sim_semantic_dedup_clusters
    # construct ~13 s, ~5 s of it the duplicated post-shuffle work; the
    # shuffles themselves were ReuseExchange-shared). One extra tiny
    # driver-blocking job for cheap-edge callers, measured in the noise.
    e0 = _persist(
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    )
    sym = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if dedupe_edges:
        sym = sym.distinct()
    sym = _persist(sym)
    # init folds the FIRST one-hop step in: label(u) = min(u, neighbors)
    # — the same single shuffle the old id->id init paid for its
    # distinct, but it starts one propagation round ahead, which on
    # shallow graphs (the common dedup case: near-dup clusters of 2-5
    # docs) removes an entire loop iteration (r9 construction-cost work:
    # each round is 2-3 jobs of driver-visible latency).
    #
    # NOT persisted (r10): init labels are consumed only by round 1,
    # whose own persist materializes everything downstream of them — a
    # separate eager checkpoint here was a whole extra driver-blocking
    # job per construct. Round 1's plan references the init agg twice
    # (neighbor_min join + hop base), so it recomputes one extra
    # map-side agg over the checkpointed ``sym`` inside that single job
    # — bounded, round-1-only work traded for a job barrier; rounds 2+
    # build on the persisted round output as before.
    labels = (
        sym.groupBy("src").agg(
            F.least(F.col("src"), F.min("dst")).alias("label")
        ).select(F.col("src").alias("id"), "label")
    )
    def _hop_jump(cur: DataFrame, h: int) -> DataFrame:
        """One (hop, pointer-jump) step as a lazy plan: every node adopts
        the min label over {self} ∪ neighbors, then shortcuts through its
        label's label. ``_prev`` (the materialization-start label) rides
        the plan untouched so the convergence flag below needs no extra
        join. ``h`` uniquifies self-join aliases when steps are chained
        inside one plan."""
        neighbor_min = (
            sym.join(cur, sym.dst == cur.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        hop = cur.join(
            neighbor_min, cur.id == neighbor_min.src, "left"
        ).select(
            "id",
            "_prev",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: label'(u) = label(label(u)). Every label value
        # is itself a node id, so one self-join halves the remaining
        # pointer-chain depth — with the one-hop init, total rounds are
        # O(log diameter) instead of O(diameter).
        l1, l2 = hop.alias(f"l1_{h}"), hop.alias(f"l2_{h}")
        jumped = F.least(
            F.col(f"l1_{h}.label"),
            F.coalesce(F.col(f"l2_{h}.label"), F.col(f"l1_{h}.label")),
        )
        return l1.join(
            l2, F.col(f"l1_{h}.label") == F.col(f"l2_{h}.id"), "left"
        ).select(
            F.col(f"l1_{h}.id").alias("id"),
            F.col(f"l1_{h}._prev").alias("_prev"),
            jumped.alias("label"),
        )

    converged = False
    rounds = 0
    while rounds < max_iters:
        # Two hop+jump steps per materialization from the SECOND
        # materialization on (VERDICT r9): each eager checkpoint + its
        # convergence count is a fixed ~1 s of driver-visible latency,
        # so on deep graphs (the CC-chain smoke's pathological case)
        # batching halves the job count while each job does the two
        # steps' work in one lineage. The FIRST materialization stays
        # single-step: shallow near-dup graphs (the common corpus —
        # clusters of 2-5 docs) converge there, and a batched first
        # round would make them pay a whole no-op step. Convergence
        # detection is unaffected: ``_chg`` compares to the
        # materialization-start label, so a batch is "no change" only
        # if BOTH steps changed nothing — and a converged graph is a
        # fixed point of the step, so batching cannot mask convergence.
        if rounds > 0 and batch_steps == "auto":
            # resolved lazily: shallow graphs (the common corpus) have
            # converged before this point and never pay the count job;
            # sym is checkpointed so the count is a fast cache scan
            batch_steps = (
                2 if sym.count() >= _BATCH_STEPS_MIN_EDGES else 1
            )
        n_steps = (
            1
            if rounds == 0 or batch_steps == "auto"
            else min(batch_steps, max_iters - rounds)
        )
        cur = labels.select("id", F.col("label").alias("_prev"), "label")
        for h in range(n_steps):
            cur = _hop_jump(cur, h)
        rounds += n_steps
        # _chg rides the persisted frame (materialization-start label
        # threaded through the steps as _prev), so the convergence check
        # below is a limit-1 scan of already-checkpointed data — the old
        # shape re-joined new labels against old labels, a full extra
        # join+shuffle job per round that dominated dedup_clusters'
        # driver-side construction time.
        new_labels = _persist(
            cur.select(
                "id",
                "label",
                (F.col("label") != F.col("_prev")).alias("_chg"),
            )
        )
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        msg = (
            f"connected_components did not converge in {max_iters} rounds; "
            "labels are unreliable (components may be split). Raise "
            "max_iters — rounds needed ~ log2(component diameter) + 2."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def edit_distance_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str,
    name_col: str,
    k: int = 2,
) -> DataFrame:
    """All pairs within ``block_col`` whose ``name_col`` values are within
    edit distance ``k`` — PassJoin-style segment blocking (Li/Deng/Feng,
    "PassJoin: a partition-based method for similarity joins", PVLDB 2012),
    EXACT: identical output to the naive within-block self-join.

    Pigeonhole: split every string into ``k+1`` segments; any string
    within edit distance k must contain at least one segment verbatim,
    shifted by at most k positions. So each string is indexed under its
    k+1 (length, slot, segment) keys and probed under every substring
    that could match another string's segment: lengths L' in [L-k, L+k],
    each slot's position window of +/-k. Candidates = key-equal (index,
    probe) pairs; the levenshtein verifier runs only on the deduped
    candidate set.

    Scale: candidate generation is LINEAR fan-out (<= (2k+1)^2 * (k+1)
    probe keys per row) followed by a hash join on (block, length, slot,
    segment) — the quadratic term is bounded by per-segment-key block
    size, not per-``block_col`` size. A coarse block (e.g. nation, 25
    values over a crawl-scale corpus) stays safe because hot segment keys
    are rare by construction (segments get longer as strings get longer).
    The naive within-block join this replaces is quadratic in block size
    and was the repo's one ER scale hazard.
    """
    n_seg = k + 1
    s = df.select(
        F.col(block_col).alias("_bk"),
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_nm"),
        F.length(name_col).alias("_L"),
    )
    slots = F.array(*[F.lit(i) for i in range(n_seg)])
    # even partition: base = L div n_seg, first (L % n_seg) slots get +1;
    # slot i starts at i*base + min(i, rem) (0-based)
    seg_len = f"(_L div {n_seg}) + if(_i < _L % {n_seg}, 1, 0)"
    seg_start = f"_i * (_L div {n_seg}) + least(_i, _L % {n_seg})"

    idx = (
        s.select("*", F.explode(slots).alias("_i"))
        .withColumn("_len", F.expr(seg_len))
        .withColumn("_start", F.expr(seg_start))
        .select(
            "_bk",
            F.col("_L").alias("_kL"),
            "_i",
            F.expr("substring(_nm, _start + 1, _len)").alias("_kseg"),
            F.col("_id").alias("_id_a"),
        )
    )
    probe = (
        s.select(
            "*",
            F.explode(
                F.expr(f"sequence(greatest(_L - {k}, 0), _L + {k})")
            ).alias("_Lp"),
        )
        .select("*", F.explode(slots).alias("_i"))
        .withColumn("_len", F.expr(seg_len.replace("_L", "_Lp")))
        .withColumn("_start", F.expr(seg_start.replace("_L", "_Lp")))
        .select(
            "*",
            F.explode(
                F.expr(f"sequence(_start - {k}, _start + {k})")
            ).alias("_s"),
        )
        .filter((F.col("_s") >= 0) & (F.col("_s") + F.col("_len") <= F.col("_L")))
        .select(
            "_bk",
            F.col("_Lp").alias("_kL"),
            "_i",
            F.expr("substring(_nm, _s + 1, _len)").alias("_kseg"),
            F.col("_id").alias("_id_b"),
        )
    )
    cand = (
        idx.join(probe, ["_bk", "_kL", "_i", "_kseg"])
        .filter(F.col("_id_a") != F.col("_id_b"))
        .select(
            "_bk",
            F.least("_id_a", "_id_b").alias("_ida"),
            F.greatest("_id_a", "_id_b").alias("_idb"),
        )
        .distinct()
    )
    na = s.select(F.col("_id").alias("_ida"), F.col("_nm").alias("_nma"))
    nb = s.select(F.col("_id").alias("_idb"), F.col("_nm").alias("_nmb"))
    return (
        cand.join(na, "_ida")
        .join(nb, "_idb")
        .select(
            F.col("_bk").alias(block_col),
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.levenshtein("_nma", "_nmb").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= k)
    )


def connected_components_star(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 30,
    checkpoint_dir: str | None = None,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) -> (doc_id, cluster_id = min doc_id in
    component). Same contract as ``connected_components``; different
    iteration scheme.

    Each round rewrites the edge set instead of propagating labels:

    - large-star(u): attach every strictly-larger neighbor of u to
      m = min(N(u) ∪ {u}) — long chains collapse toward small ids;
    - small-star(u): attach u and its smaller neighbors to the minimum
      smaller neighbor — stars flatten to height 1.

    The fixed point is a forest of stars whose centers are the component
    minima, in O(log n) rounds even on adversarial chain graphs (crawl
    dup-chains), vs pointer jumping's O(log diameter) rounds of 2
    shuffles each: the star steps move every edge toward the minimum at
    once, so the constant is smaller on high-diameter graphs. Edges are
    kept canonical (hi > lo), deduplicated per round, and checkpointed
    (reliable when ``checkpoint_dir`` is set, lineage-local otherwise)
    so round N never recomputes rounds 1..N-1.
    """
    if on_nonconverged not in ("raise", "warn", "ignore"):
        raise ValueError(f"bad on_nonconverged: {on_nonconverged!r}")
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # canonical undirected edge set: (hi, lo), hi > lo
    e = _persist(
        edges.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )
    nodes = _persist(
        e.select(F.col("hi").alias("id"))
        .union(e.select(F.col("lo").alias("id")))
        .distinct()
    )

    converged = False
    for _ in range(max_iters):
        # large-star: per node u over BOTH orientations, m = min(N(u) ∪ u);
        # every neighbor v > u re-attaches to m
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m_all = sym.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        large = (
            sym.join(m_all, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star: per node u over its SMALLER neighbors only,
        # m = min(N⁻(u)); u and each smaller neighbor attach to m
        m_small = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(m_small, "hi")
            .select(F.col("lo").alias("v"), F.col("m"), F.col("hi"))
        )
        new_e = _persist(
            small.select(F.col("hi"), F.col("m").alias("lo"))
            .union(
                small.filter(F.col("v") != F.col("m")).select(
                    F.col("v").alias("hi"), F.col("m").alias("lo")
                )
            )
            .distinct()
        )
        changed = (
            new_e.subtract(e).union(e.subtract(new_e)).limit(1).count()
        )
        e = new_e
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components_star did not converge in {max_iters} "
            "rounds; labels are unreliable (components may be split)."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # fixed point is a star forest: every non-root appears once as hi
    # with lo = component min; roots keep their own id
    parent = e.groupBy("hi").agg(F.min("lo").alias("_p"))
    return nodes.join(parent, nodes.id == parent.hi, "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce(F.col("_p"), F.col("id")).alias("cluster_id"),
    )


def lsh_bucket_overflow(
    docs: DataFrame,
    n_hashes: int = N_MINHASHES,
    band_size: int = BAND_SIZE,
    k: int = 3,
    text_col: str = "text",
    bucket_cap: int = 64,
) -> DataFrame:
    """Quarantine report for ``minhash_lsh_pairs(bucket_cap=...)``: one
    row per over-cap band bucket with its size — the dead-letter fork of
    the LSH join (same pattern as operators.traffic.traffic_quarantine).
    Feed these buckets to exact/normalized dedup instead of pairwise
    comparison."""
    sig = minhash_signatures(docs, n_hashes, k, text_col)
    bands = _band_rows(sig, n_hashes, band_size)
    band_cols = ["band_id"] + [f"b{r}" for r in range(band_size)]
    return (
        bands.groupBy(*band_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > bucket_cap)
        .select("band_id", *[f"b{r}" for r in range(band_size)], "bucket_size")
    )


def incremental_dedup(
    base: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingestion dedup: admit only batch documents whose
    content fingerprint is absent from the already-ingested base corpus
    AND that win their fingerprint within the batch itself (min id).

    The daily-crawl-increment primitive: the base never rescans — it is
    represented by its (fingerprint -> min id) state table, which at
    100 TB is the persisted output of the previous run, re-joined here
    by one hash exchange on the fingerprint. No window sort: both the
    base state and the batch winner are min-aggregates (map-side
    combinable).

    Emits every batch row with its verdict: ``base_doc_id`` (the base
    owner of the fingerprint, null if unseen) and ``is_new`` (admitted).
    """
    key = F.md5(F.col(text_col)).alias("content_md5")
    b_state = (
        base.select(key, F.col(id_col))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias("base_doc_id"))
    )
    tagged = batch.select(F.col(id_col), key)
    batch_win = tagged.groupBy("content_md5").agg(
        F.min(id_col).alias("_batch_min")
    )
    return (
        tagged.join(batch_win, "content_md5")
        .join(b_state, "content_md5", "left")
        .select(
            id_col,
            "content_md5",
            "base_doc_id",
            (
                F.col("base_doc_id").isNull()
                & (F.col(id_col) == F.col("_batch_min"))
            ).alias("is_new"),
        )
    )


def substring_dup_pairs(
    docs: DataFrame,
    length: int = 30,
    stride: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication candidates: document pairs sharing at
    least one aligned ``length``-char shingle sampled every ``stride``
    chars. The cheap detector for copied passages that whole-document
    fingerprints miss (a doc quoting another shares shingles but not its
    md5) — the hash-join relaxation of suffix-array substring dedup:
    stride-sampling bounds fan-out at length/stride shingles per char
    window, trading recall for a fixed cost per document.

    One explode (n_chars/stride rows per doc), one hash self-join on the
    shingle value, one count aggregate per pair. Output: (doc_a < doc_b,
    n_shared) — n_shared counts distinct shared (a_pos-aligned) shingle
    values, not occurrences, so repeated boilerplate inside one doc
    cannot inflate the pair.
    """
    sh = (
        docs.filter(F.length(F.col(text_col)) >= length)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {length - 1},"
                    f" {stride}), p -> substring({text_col}, p, {length}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
