"""Bloom-filter join pruning (beyond-reference; scale technique).

The 100 TB decontamination problem: an anti/semi-join of a petabyte-scale
corpus against a small benchmark set shuffles the ENTIRE corpus on the
join key, even though almost no corpus row matches. A Bloom filter built
from the small side and broadcast into the scan prunes the big side
BEFORE the shuffle: only ~fpr x N false positives plus the true matches
ever reach the exchange. Spark's own runtime row-level filtering does
exactly this for qualifying joins; this module makes the pattern an
explicit, engine-portable operator (the `might_contain` expression is not
registered for SQL use, so we build the same machinery from public
primitives).

Design (all JVM-side, no Python in the row path):

- *positions*: k independent probe positions per key via seeded
  ``xxhash64(key, i) mod m`` — no multiply-add over a single hash pair,
  so no ANSI overflow concerns and build/probe share one code path.
- *build*: a distributed aggregate. Each key row expands to k
  (word_idx, bit_mask) pairs; ``bit_or`` groupBy packs them into at most
  m/64 words. The driver collects <= m/64 rows (m = 2^17 bits -> 2048
  longs, ~16 KB) REGARDLESS of build-side cardinality — this is the same
  merge shape Spark uses to assemble its runtime bloom filters.
- *probe*: the packed words ship as one array<bigint> literal inside the
  plan (broadcast with the task binary); the membership test is k
  element_at + shift + mask expressions, fully whole-stage-codegen.

False positives are expected and harmless: callers ALWAYS verify
candidates with the exact join (see ``queries.docs_bloom_decontaminate``),
so the final result is exact — the bloom only shrinks the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^17 bits = 2048 words; at k=5 this holds ~10k keys under 1% fpr and
# degrades gracefully (more false positives -> more exact-verify work,
# never wrong answers). Scale m with the expected build-side cardinality.
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 5


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k probe positions in [0, m_bits): pmod(xxhash64(key, i), m)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Pack the Bloom filter for ``df[col]`` into m_bits/64 long words.

    Distributed: per-key masks are OR-combined by a groupBy(word_idx)
    ``bit_or`` aggregate, so the driver receives at most m_bits/64 rows
    no matter how many keys the build side has.
    """
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias(
        "_pos"
    )
    packed = (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_mask"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in packed:
        words[row["_w"]] = row["_mask"]
    return words


def bloom_filter_candidates(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    flag_col: str = "_bloom_hit",
) -> DataFrame:
    """Add ``flag_col``: true iff ``df[col]`` might be in the filter.

    The words array is a plan literal (one copy per task binary, not per
    row); each of the k bit tests is element_at + shiftrightunsigned +
    mask — native expressions inside one codegen stage. No false
    negatives by construction: a key inserted by ``bloom_build`` probes
    the identical seeded-hash positions.
    """
    probed = df.withColumn("_bf_words", F.lit(words))
    tests = []
    for i, p in enumerate(_positions(F.col(col), m_bits, k)):
        probed = probed.withColumn(f"_bf_p{i}", p)
        tests.append(
            f"(shiftrightunsigned(element_at(_bf_words, "
            f"CAST(_bf_p{i} / 64 AS INT) + 1), "
            f"CAST(pmod(_bf_p{i}, 64) AS INT)) & 1) = 1"
        )
    out = probed.withColumn(flag_col, F.expr(" AND ".join(tests)))
    return out.drop("_bf_words", *[f"_bf_p{i}" for i in range(k)])


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """EXACT left-semi join of ``big`` on ``small`` with bloom pre-prune.

    Rows failing the bloom test are definitely-absent and never reach
    the shuffle; survivors are verified by the exact semi join, so the
    result equals ``big.join(small, on, "left_semi")`` row-for-row.
    """
    words = bloom_build(small, on, m_bits, k)
    pruned = bloom_filter_candidates(big, on, words, m_bits, k).filter(
        F.col("_bloom_hit")
    )
    return pruned.drop("_bloom_hit").join(
        small.select(on).distinct(), on, "left_semi"
    )
