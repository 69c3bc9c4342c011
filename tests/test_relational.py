"""Relational-breadth operator tests (SURVEY.md §2.1 — capabilities the
reference lacks entirely; all Spark built-ins, each with a DuckDB oracle
checked by tools/check_oracles.py and the driver's t2 gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_example_spark import oracles, queries
from tests.conftest import SF_SMOKE


def test_every_query_has_an_oracle():
    """Driver contract: each queries() entry needs an oracle_sql() entry
    (genuinely non-SQL-expressible ops may be registered as oracle-free,
    but must do so explicitly)."""
    missing = set(queries.QUERIES) - set(oracles.ORACLES) - set(
        getattr(oracles, "ORACLE_FREE", ())
    )
    assert not missing, f"queries without oracles: {sorted(missing)}"


def test_left_outer_keeps_zero_order_customers(spark):
    out = queries.QUERIES["q13_customer_order_distribution"](spark, SF_SMOKE)
    rows = {r.c_count: r.custdist for r in out.collect()}
    n_customers = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet").count()
    )
    assert sum(rows.values()) == n_customers  # outer join drops nobody


def test_semi_join_no_fanout(spark):
    """EXISTS semantics: order_count sums to at most #orders even though
    matching lineitems are many-per-order."""
    out = queries.QUERIES["q4_late_shipment_priority"](spark, SF_SMOKE)
    total = sum(r.order_count for r in out.collect())
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert 0 < total <= n_orders


def test_set_ops_identity(spark):
    """|A ∪ B| = |A ∩ B| + |A \\ B| + |B \\ A| on distinct key sets."""
    out = queries.QUERIES["set_ops_customer_cohorts"](spark, SF_SMOKE)
    counts = {
        r.op: r.n
        for r in out.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    b_minus_a = b.exceptAll(a).distinct().count()
    assert counts["union"] == counts["intersect"] + counts["except"] + b_minus_a


def test_rollup_grand_total(spark):
    out = queries.QUERIES["rollup_revenue"](spark, SF_SMOKE).collect()
    levels = {r.grouping_level for r in out}
    assert levels == {0, 1, 3}
    grand = [r for r in out if r.grouping_level == 3]
    assert len(grand) == 1
    detail_sum = sum(r.n_items for r in out if r.grouping_level == 0)
    assert grand[0].n_items == detail_sum


def test_anti_join_complements_semi(spark):
    """semi(A, B) + anti(A, B) partitions A."""
    p = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    keys = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .filter(F.col("l_quantity") > 40)
        .select("l_partkey")
        .distinct()
    )
    semi = p.join(keys, p.p_partkey == keys.l_partkey, "leftsemi").count()
    anti = p.join(keys, p.p_partkey == keys.l_partkey, "left_anti").count()
    assert semi + anti == p.count()


def test_approx_distinct_close_to_exact(spark):
    """The query self-asserts: HLL++ estimate within 5% (or 2 absolute)
    of the exact countDistinct, emitted as a boolean the oracle pins to
    TRUE. Also cross-check n_exact against events_user_stats."""
    out = {
        r.event_type: (r.n_exact, r.approx_within_5pct)
        for r in queries.QUERIES["events_approx_distinct"](
            spark, SF_SMOKE
        ).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in queries.QUERIES["events_user_stats"](spark, SF_SMOKE).collect()
    }
    assert set(out) == set(exact)
    for t, (n, ok) in out.items():
        assert n == exact[t], (t, n, exact[t])
        assert ok, f"HLL estimate out of bound for {t}"


def test_bpe_tokens_nonzero_and_bounded(spark):
    out = queries.QUERIES["text_bpe_tokens"](spark, SF_SMOKE).collect()
    assert all(r.n_bpe_tokens > 0 for r in out)
    assert all(r.chars_per_token >= 1.0 for r in out)


def test_salted_agg_generic_table(spark):
    """salted_agg on an arbitrary table/column set (no event_id column):
    hash-derived salt, explicit value column — matches the direct groupBy."""
    from dataflow_example_spark.operators.windows import salted_agg

    df = spark.createDataFrame(
        [("x", 1.5), ("x", 2.5), ("y", 4.0)], "grp STRING, amount DOUBLE"
    )
    got = {
        r.grp: (r.n_events, r.sum_value)
        for r in salted_agg(df, keys=("grp",), value_col="amount").collect()
    }
    assert got == {"x": (2, 4.0), "y": (1, 4.0)}


def test_approx_percentiles_bracket_exact(spark):
    """Sketch percentiles land within tolerance of the exact ones — the
    query computes both sides in one aggregate and emits booleans."""
    from dataflow_example_spark.queries import QUERIES

    rows = QUERIES["events_approx_percentiles"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_events > 0
        assert r.p50_within_bound, r.event_type
        assert r.p90_within_bound, r.event_type


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling: a join with one hot key gets its skewed
    shuffle partition split at runtime (skew=true in the final adaptive
    plan) — the engine-level complement to the manual salted_agg path."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = (
            spark.range(50_000)
            .select(F.lit(0).alias("k"), F.col("id").alias("payload"))
            .union(
                spark.range(700).select(
                    (F.col("id") % 7 + 1).alias("k"),
                    F.col("id").alias("payload"),
                )
            )
        )
        right = spark.createDataFrame(
            [(i,) for i in range(8)], "k long"
        ).withColumn("r", F.col("k") * 10)
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 50_700  # every row matched exactly once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot partition was split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_column_profile_single_scan(spark):
    """Profiler reads the table ONCE (multi-column distincts plan as one
    Expand over one scan), and its null/distinct counts are exact."""
    out = queries.QUERIES["events_column_profile"](spark, SF_SMOKE)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    rows = {r.column_name: r for r in out.collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert rows["event_type"].n_distinct == ev.select("event_type").distinct().count()
    assert rows["event_id"].n_nulls == ev.filter(F.col("event_id").isNull()).count()
    assert all(r.n_rows == ev.count() for r in rows.values())


def test_month_gapfill_dense_calendar(spark):
    """Gap-fill emits every month between min and max order date exactly
    once, with zero revenue for empty months."""
    out = queries.QUERIES["orders_month_gapfill"](spark, SF_SMOKE).collect()
    months = sorted(r.month for r in out)
    assert len(set(months)) == len(months)
    # dense: consecutive entries differ by exactly one calendar month
    for a, b in zip(months, months[1:]):
        assert (b.year * 12 + b.month) - (a.year * 12 + a.month) == 1
    assert all(r.revenue == 0.0 and r.n_orders == 0
               for r in out if r.n_orders == 0)


def test_corr_stats_match_builtin(spark):
    """The decimal co-moment formulation agrees with Spark's built-in
    single-pass corr/stddev to float tolerance (they differ only in
    summation order)."""
    out = {
        r.l_returnflag: r
        for r in queries.QUERIES["lineitem_corr_stats"](spark, SF_SMOKE).collect()
    }
    ref = {
        r.l_returnflag: r
        for r in spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.stddev("l_quantity").alias("s"),
        )
        .collect()
    }
    assert set(out) == set(ref)
    for k in out:
        assert abs(out[k].corr_qty_price - ref[k].c) < 1e-9
        assert abs(out[k].stddev_qty - ref[k].s) < 1e-9


def test_q2_min_cost_is_regional_minimum(spark):
    """Every returned (part, supplier) offers exactly the minimum cost
    among EUROPE suppliers of that part — the correlated-min contract."""
    out = queries.QUERIES["q2_min_cost_supplier"](spark, SF_SMOKE).collect()
    assert out, "q2 returned no rows"
    per_part = {}
    for r in out:
        per_part.setdefault(r.p_partkey, set()).add(r.supply_cost)
    for part, costs in per_part.items():
        assert len(costs) == 1, f"part {part} has non-minimal rows: {costs}"


def test_q12_priority_counts_partition_lineitems(spark):
    """high + low counts must equal the filtered join cardinality (the
    CASE split loses no rows)."""
    out = queries.QUERIES["q12_shipmode_priority"](spark, SF_SMOKE).collect()
    total = sum(r.high_line_count + r.low_line_count for r in out)
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert total == l.join(o, l.l_orderkey == o.o_orderkey).count()


def test_q21_no_other_late_supplier(spark):
    """Anti-join contract: for every (supplier, order) counted, no OTHER
    supplier on the same F-status order shipped >60 days late."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    late_by_order = {}
    for r in late:
        late_by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    sole_late = {
        (ok, next(iter(sks)))
        for ok, sks in late_by_order.items()
        if len(sks) == 1
    }
    out = queries.QUERIES["q21_late_suppliers"](spark, SF_SMOKE).collect()
    # numwait totals can't exceed the sole-late pair count
    assert sum(r.numwait for r in out) <= len(sole_late)


def test_interval_overlap_known_fixture(spark):
    """Sweep-line max concurrency on a hand-checked fixture, including
    the half-open boundary (an interval ending exactly when another
    starts does NOT overlap it)."""
    rows = [
        # user 1: [0,10) [5,15) [20,30) -> max 2; [10,?) starts as [0,10) ends
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 00:00:05", 10.0),
        (1, "2024-01-01 00:00:10", 10.0),
        (1, "2024-01-01 00:00:30", 5.0),
        # user 2: three nested -> max 3
        (2, "2024-01-01 00:00:00", 30.0),
        (2, "2024-01-01 00:00:05", 10.0),
        (2, "2024-01-01 00:00:06", 2.0),
    ]
    import pyspark.sql.functions as F2

    ev = spark.createDataFrame(
        rows, "user_id bigint, ts_s string, value double"
    ).select("user_id", F2.col("ts_s").cast("timestamp").alias("ts"), "value")

    import tempfile

    d = tempfile.mkdtemp(prefix="dfx_iv_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r.user_id: r.max_concurrent
        for r in queries.QUERIES["events_interval_overlap_count"](
            spark, d
        ).collect()
    }
    assert out == {1: 2, 2: 3}


def test_pq_codes_pick_nearest_centroid(spark):
    """Every assigned code must be the argmin of the subspace distance
    (verified directly in python on the smoke data)."""
    import numpy as np

    out = queries.QUERIES["emb_pq_codes"](spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    cents = {cid: emb[cid] for cid in range(4)}
    for r in out[:50]:
        v = emb[r.vec_id]
        for m, code in enumerate([r.code_0, r.code_1, r.code_2, r.code_3]):
            sub = slice(m * 16, (m + 1) * 16)
            dists = {
                cid: float(((v[sub] - c[sub]) ** 2).sum())
                for cid, c in cents.items()
            }
            best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
            assert code == best, (r.vec_id, m, code, best, dists)


def test_session_funnel_is_monotone(spark):
    """Funnel stages can only shrink: viewed >= clicked >= purchased."""
    r = queries.QUERIES["events_session_funnel_windowed"](
        spark, SF_SMOKE
    ).collect()[0]
    assert (
        r.n_sessions_viewed
        >= r.n_sessions_clicked
        >= r.n_sessions_purchased
        >= 0
    )
    assert r.n_sessions_viewed > 0


def test_shingle_novelty_first_doc_fully_novel(spark):
    """The smallest doc_id owning shingles is 100% novel; ratios stay in
    [0, 1] (0 = fully redundant doc, every shingle seen earlier); novel
    counts never exceed shingle counts."""
    rows = queries.QUERIES["docs_shingle_novelty"](spark, SF_SMOKE).collect()
    by_id = {r.doc_id: r for r in rows}
    first = by_id[min(by_id)]
    assert first.novelty == 1.0
    assert all(
        0 <= r.novelty <= 1 and r.n_novel <= r.n_shingles for r in rows
    )


def test_rfm_quartiles_are_balanced(spark):
    """ntile(4) must split customers into near-equal quartiles on each
    dimension (sizes differ by at most 1)."""
    out = queries.QUERIES["orders_rfm_segments"](spark, SF_SMOKE).collect()
    n = len(out)
    for dim in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = {}
        for r in out:
            sizes[getattr(r, dim)] = sizes.get(getattr(r, dim), 0) + 1
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)


def test_survivorship_keeps_exactly_cluster_minima(spark):
    """Every cluster keeps exactly one doc (its min id); kept + dropped
    partitions the corpus."""
    out = queries.QUERIES["docs_dedup_survivorship"](spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(out) == n_docs
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m.status == "kept"]
        assert len(kept) == 1 and kept[0].doc_id == cid == min(
            m.doc_id for m in members
        )


def test_resample_ffill_grid_is_dense_and_filled(spark):
    """Every user's grid is contiguous hours from first to last; empty
    hours have n_events=0 but a non-null carried value; observed hours
    match the direct per-hour aggregate."""
    out = queries.QUERIES["events_resample_ffill"](spark, SF_SMOKE).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    direct = {
        (r.user_id, r.h): r.n
        for r in ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for u, rows in by_user.items():
        rows.sort(key=lambda r: r.hour_ts)
        hours = [r.hour_ts for r in rows]
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600  # dense grid
        assert rows[0].n_events > 0  # grid starts at first observation
        for r in rows:
            assert r.n_events == direct.get((u, r.hour_ts), 0)
            assert r.value_ffill is not None  # ffill never leaves a hole


def test_cohort_retention_week0_is_cohort_size(spark):
    """Every cohort's weeks_since=0 cell equals the cohort's size (the
    first-seen week is by definition active), and actives never exceed
    the cohort size in later weeks."""
    rows = queries.QUERIES["events_cohort_retention"](spark, SF_SMOKE).collect()
    sizes = {}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w")
    )
    for r in first.groupBy("w").agg(F.count("*").alias("n")).collect():
        sizes[r.w] = r.n
    for r in rows:
        if r.weeks_since == 0:
            assert r.n_active == sizes[r.cohort_week]
        assert r.n_active <= sizes[r.cohort_week]
        assert r.weeks_since >= 0


def test_markov_rows_are_probability_distributions(spark):
    """Per from_type, probabilities sum to 1 (within float ulp) and
    transition counts sum to total steps (n_events - n_users)."""
    rows = queries.QUERIES["events_markov_transitions"](spark, SF_SMOKE).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for ft, rs in by_from.items():
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-9, ft
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_steps = ev.count() - ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_steps


def test_abc_pareto_classes_are_monotone(spark):
    """cum_share is nondecreasing in rank order; classes partition as
    A-prefix, B-middle, C-tail; every customer appears once."""
    rows = queries.QUERIES["orders_abc_pareto"](spark, SF_SMOKE).collect()
    shares = [r.cum_share for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(shares, shares[1:]))
    classes = "".join(r.abc_class for r in rows)
    assert "BA" not in classes and "CA" not in classes and "CB" not in classes
    assert abs(shares[-1] - 1.0) < 1e-9
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert len(rows) == o.select("o_custkey").distinct().count()


def test_cluster_stats_counts_match_survivorship(spark):
    """sum(cluster_size * n_clusters) over size>=2 equals the number of
    docs in multi-member clusters = corpus - kept singletons + kept
    multi reps... cross-checked directly against survivorship output."""
    stats = queries.QUERIES["dedup_cluster_stats"](spark, SF_SMOKE).collect()
    surv = queries.QUERIES["docs_dedup_survivorship"](spark, SF_SMOKE).collect()
    clustered_docs = sum(r.cluster_size * r.n_clusters for r in stats)
    by_cluster = {}
    for r in surv:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    multi = sum(len(m) for m in by_cluster.values() if len(m) >= 2)
    assert all(r.cluster_size >= 2 for r in stats)
    assert clustered_docs == multi


def test_rolling_active_users_fanout_and_clamp(spark):
    """A user active in one hour supports the next 23 report hours, but
    report hours never pass the data's max event hour."""
    import datetime as dt

    from dataflow_example_spark import queries as Q
    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=5), 8, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="dfx_rolling_")
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["report_hour"]: r["active_users_24h"]
        for r in Q.QUERIES["events_rolling_active_users"](spark, d).collect()
    }
    h0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # only hours 0..5 exist (clamped at max event hour 05:00)
    assert min(out) == h0 and max(out) == h0 + dt.timedelta(hours=5)
    assert out[h0] == 1                       # only user 7 so far
    assert out[h0 + dt.timedelta(hours=5)] == 2   # both within 24h
    assert len(out) == 6
