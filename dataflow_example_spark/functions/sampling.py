"""Deterministic sampling / splitting for training-data pipelines
(beyond-reference; BASELINE.json north star).

All decisions are pure functions of (salt, key) through a portable
md5-derived bucket — no RNG state, so results are identical across runs,
cluster sizes, AND engines (the DuckDB oracles compute the same buckets).
That determinism is what makes samples reproducible and train/test splits
leak-proof: a document's split assignment never changes when the corpus is
re-partitioned or re-processed.

Scale notes (100 TB): every operator here is a stateless map-side filter /
projection over one scan — no shuffle, no driver involvement; sampling
composes with any downstream operator at zero plan cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # decision resolution: fractions quantize to 0.01%


def hash_bucket(key: Column, salt: str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex digits of
    (salt || key) as an integer, mod buckets. (DuckDB mirror:
    CAST(('0x' || substr(md5(salt || key), 1, 8)) AS BIGINT) % buckets.)"""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose bucket falls below
    fraction * BUCKETS. Unlike ``DataFrame.sample`` (partition-RNG based,
    changes with partitioning), membership depends only on the key."""
    return df.filter(
        hash_bucket(F.col(key_col), salt) < int(fraction * BUCKETS)
    )


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.2,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Add a 'train'/'test' assignment column keyed on ``key_col`` — the
    leak-proof split: the same key lands in the same split forever,
    regardless of partitioning, ordering, or reprocessing."""
    test = hash_bucket(F.col(key_col), salt) < int(test_fraction * BUCKETS)
    return df.withColumn(
        split_col, F.when(test, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing in a
    corpus: keep 10% of English, 50% of low-resource languages). The
    per-stratum threshold is a CASE chain — still a single stateless
    map-side filter."""
    thr: Column = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        thr = (
            F.when(F.col(strata_col) == value, F.lit(int(frac * BUCKETS)))
            .otherwise(thr)
        )
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


def source_mix_weights(
    docs: DataFrame,
    source_col: str = "source",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-source sampling weights to move the corpus toward a target
    mixture (the static domain-reweighting step of pretraining pipelines;
    DoReMi-style learned weights plug into the same contract).

    ``target`` maps source -> desired share; ``None`` means uniform over
    the observed sources. Returns (source, n_docs, actual_frac,
    target_frac, weight) with weight = target_frac / actual_frac — the
    per-document sampling multiplier downstream samplers feed into
    ``hash_sample``-style gates.

    Plan shape: one partial-aggregated groupBy on source plus two 1-row
    global aggregates broadcast back — no full-data second pass, safe at
    any corpus size.
    """
    from pyspark.sql import functions as F

    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = per.agg(
        F.sum("n_docs").alias("_total"),
        F.count(F.lit(1)).alias("_n_sources"),
    )
    per = per.crossJoin(F.broadcast(totals))
    if target is None:
        target_frac = F.lit(1.0) / F.col("_n_sources")
    else:
        m = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        target_frac = F.coalesce(m[F.col("source")], F.lit(0.0))
    actual_frac = F.col("n_docs").cast("double") / F.col("_total")
    return per.select(
        "source",
        "n_docs",
        actual_frac.alias("actual_frac"),
        target_frac.cast("double").alias("target_frac"),
        (target_frac.cast("double") / actual_frac).alias("weight"),
    )


def cap_per_group(
    docs: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    cap: int = 100,
    salt: str = "cap",
) -> DataFrame:
    """Cap any one group's contribution at ``cap`` rows, chosen
    deterministically (md5-hash order, key tiebreak) — the per-domain
    contribution cap of crawl pipelines (no domain may dominate the
    corpus), engine-portable and stable across runs/cluster sizes.

    A hot group (one domain dominating the crawl) would make a plain
    per-group window one sort task over that whole group, so the cap
    runs through ranking.grouped_top_k's salted two-level row_number:
    local cap per (group, salt) slice, exact cap over the bounded
    survivors — identical output at any skew.
    """
    from .ranking import grouped_top_k

    order_key = F.md5(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    )
    return grouped_top_k(
        docs,
        [group_col],
        [order_key.asc(), F.col(key_col).asc()],
        cap,
        salt_expr=F.xxhash64(F.col(key_col)),
        rank_col="_rn",
    ).drop("_rn")


def importance_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    salt: str = "resample",
) -> DataFrame:
    """Deterministic importance resampling toward a UNIFORM group
    mixture: each group keeps at most its fair share (total/n_groups) in
    expectation, via keep-rate r_g = min(1, fair_share / group_size)
    applied through the portable md5 bucket. The sampling step that
    APPLIES mixture weights (docs_mix_weights only reports them):
    over-represented sources are thinned, under-represented ones pass
    through whole. Group sizes are a tiny broadcast aggregate; the
    filter itself stays a stateless map-side decision, so membership
    survives repartitioning and reprocessing.

    Scale contract: ``group_col`` must be a bounded-cardinality
    grouping (source / lang / event_type — the mixture-control shape),
    NOT an entity key that scales with the corpus; the per-group rates
    frame is force-broadcast because its row count equals the group
    count. An SF-scaling group_col here would be the same hazard class
    tools/broadcast_audit.py bans in the registry (registry callers all
    pass constant-cardinality groups: lang / source)."""
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
    totals = sizes.agg(
        F.sum("_gn").alias("_tot"), F.count(F.lit(1)).alias("_k")
    )
    rates = sizes.join(F.broadcast(totals)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (F.col("_tot").cast("double") / F.col("_k"))
            / F.col("_gn").cast("double"),
        ).alias("keep_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(
            hash_bucket(F.col(key_col), salt)
            < F.floor(F.col("keep_rate") * BUCKETS)
        )
    )
