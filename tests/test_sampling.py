"""Determinism/disjointness tests for functions/sampling.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from dataflow_example_spark.functions.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_hash_sample_deterministic_and_sized(spark):
    d = _docs(spark)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).collect()}
    b = {
        r.doc_id
        for r in hash_sample(d.repartition(7), "doc_id", 0.2).collect()
    }
    assert a == b  # partitioning-independent membership
    n = d.count()
    assert 0.05 * n <= len(a) <= 0.4 * n  # loose Bernoulli bound


def test_hash_sample_nested_fractions(spark):
    """A 10% sample is a subset of the 20% sample (same salt): thresholds
    nest, so growing a sample never resamples existing members."""
    d = _docs(spark)
    s10 = {r.doc_id for r in hash_sample(d, "doc_id", 0.1).collect()}
    s20 = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).collect()}
    assert s10 <= s20


def test_train_test_split_partition_and_leakproof(spark):
    d = _docs(spark)
    out = train_test_split(d, "doc_id", test_fraction=0.25)
    rows = out.select("doc_id", "split").collect()
    assert {r.split for r in rows} == {"train", "test"}
    assert len(rows) == d.count()  # every row assigned exactly once
    again = {
        (r.doc_id, r.split)
        for r in train_test_split(d.orderBy(F.desc("doc_id")), "doc_id",
                                  test_fraction=0.25)
        .select("doc_id", "split")
        .collect()
    }
    assert again == {(r.doc_id, r.split) for r in rows}


def test_stratified_sample_per_stratum_rates(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, strata_col="lang", fractions={"en": 1.0}, key_col="doc_id",
        default_fraction=0.0,
    )
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert got == {"en"}  # zero default keeps nothing else
    n_en = d.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # fraction 1.0 keeps every English doc


def test_split_decontamination_flags_cross_split_near_dups(spark):
    """Every flagged test doc shares its 12-token prefix with >= 1 train
    doc, and no flagged doc is its own match (splits are disjoint)."""
    from dataflow_example_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    out = QUERIES["docs_split_decontamination"](spark, SF_SMOKE).collect()
    assert all(r.n_train_matches >= 1 for r in out)
    assert all(r.test_doc_id != r.first_train_doc for r in out)


def test_source_mix_weights_uniform_and_explicit(spark):
    from dataflow_example_spark.functions.sampling import source_mix_weights

    d = spark.createDataFrame(
        [(i, "a" if i < 6 else "b") for i in range(8)],
        "doc_id bigint, source string",
    )
    got = {r.source: r for r in source_mix_weights(d).collect()}
    assert got["a"].n_docs == 6 and got["b"].n_docs == 2
    assert abs(got["a"].weight - 0.5 / 0.75) < 1e-15
    assert abs(got["b"].weight - 0.5 / 0.25) < 1e-15

    got2 = {
        r.source: r
        for r in source_mix_weights(
            d, target={"a": 0.9, "b": 0.1}
        ).collect()
    }
    assert abs(got2["a"].target_frac - 0.9) < 1e-15
    assert abs(got2["b"].weight - 0.1 / 0.25) < 1e-15


def test_cap_per_group_deterministic_and_bounded(spark):
    from dataflow_example_spark.functions.sampling import cap_per_group

    d = spark.createDataFrame(
        [(i, "a" if i < 30 else "b") for i in range(40)],
        "doc_id bigint, source string",
    )
    out1 = cap_per_group(d, cap=5)
    rows1 = sorted((r.source, r.doc_id) for r in out1.collect())
    counts = {}
    for s, _ in rows1:
        counts[s] = counts.get(s, 0) + 1
    assert counts == {"a": 5, "b": 5}
    # deterministic across invocations
    rows2 = sorted((r.source, r.doc_id) for r in cap_per_group(d, cap=5).collect())
    assert rows1 == rows2
    # groups under the cap pass through whole
    out3 = cap_per_group(d, cap=50)
    assert out3.count() == 40


def test_importance_resample_thins_only_overrepresented(spark):
    """Uniform-target resampling: groups at/under fair share keep every
    row (rate 1.0); over-represented groups thin toward total/n_groups;
    membership is deterministic (same result on rerun)."""
    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.sampling import importance_resample

    rows = [(i, "big") for i in range(300)] + [
        (1000 + i, "small") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = importance_resample(df, group_col="grp", key_col="doc_id")
    kept = out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    by = {r.grp: r.n for r in kept}
    assert by["small"] == 50  # under fair share (175): untouched
    # big thins toward 175 in expectation; md5 variance stays in a band
    assert 120 <= by["big"] <= 230
    again = {
        r.grp: r.n
        for r in importance_resample(df, group_col="grp", key_col="doc_id")
        .groupBy("grp")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == by  # deterministic
