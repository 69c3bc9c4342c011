"""Bloom join pruning, Z-order layout, and prefix-scan diagnostics.

These operators exist for 100 TB behavior; the tests pin the properties
that make them safe to rely on at that scale: the bloom filter has ZERO
false negatives (pruning never changes results), the Morton interleave
is a bijection on its bit domain (zone maps stay meaningful), and the
range-partitioned running max equals the naive single-task window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_example_spark.functions.bloom import (
    bloom_build,
    bloom_filter_candidates,
    bloom_semi_join,
)
from dataflow_example_spark.functions.diagnostics import running_prefix_max
from dataflow_example_spark.functions.layout import (
    zorder_value,
    zorder_value_sql,
)
from dataflow_example_spark.tables import load

from tests.conftest import SF_SMOKE
from dataflow_example_spark.streaming import drain


def test_bloom_no_false_negatives(spark):
    """Every key inserted at build time must probe positive."""
    small = spark.range(0, 500).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    words = bloom_build(small, "k")
    probed = bloom_filter_candidates(small, "k", words)
    assert probed.filter(~F.col("_bloom_hit")).count() == 0


def test_bloom_prunes_most_non_members(spark):
    """Disjoint keys should overwhelmingly fail the probe (fpr << 1);
    with m=2^17 / k=5 / 500 keys the expected fpr is ~1e-8, so even one
    hundred false positives among 20k would flag a broken hash path."""
    small = spark.range(0, 500).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    big = spark.range(10_000, 30_000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    words = bloom_build(small, "k")
    hits = (
        bloom_filter_candidates(big, "k", words)
        .filter(F.col("_bloom_hit"))
        .count()
    )
    assert hits < 100


def test_bloom_semi_join_exact(spark):
    """bloom_semi_join == plain left-semi join, row for row."""
    docs = load(spark, SF_SMOKE, "documents")
    big = docs.select(F.col("doc_id"), F.col("lang"))
    small = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    got = sorted(
        r["doc_id"] for r in bloom_semi_join(big, small, "doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in big.join(small, "doc_id", "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_zorder_bijective_and_bounded(spark):
    """The interleave of 10+10 bits is a bijection into [0, 2^20)."""
    df = spark.range(0, 1 << 10).select(
        (F.col("id") % 32).alias("d1"), (F.col("id") / 32).cast("int").alias("d2")
    )
    z = df.select(
        "d1", "d2", zorder_value(F.col("d1"), F.col("d2"), 10).alias("z")
    )
    rows = z.collect()
    zs = {r["z"] for r in rows}
    assert len(zs) == len(rows)  # injective on distinct (d1, d2)
    assert all(0 <= r["z"] < (1 << 20) for r in rows)
    # locality sanity: interleave of (d1, d2) decodes back bit-by-bit
    for r in rows[:64]:
        d1 = sum(((r["z"] >> (2 * b + 1)) & 1) << b for b in range(10))
        d2 = sum(((r["z"] >> (2 * b)) & 1) << b for b in range(10))
        assert (d1, d2) == (r["d1"], r["d2"])


def test_zorder_sql_matches_spark(spark):
    """The oracle-side SQL formula is the same function."""
    import duckdb

    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("d1"),
        (F.col("id") / 16).cast("bigint").alias("d2"),
    )
    got = {
        (r["d1"], r["d2"]): r["z"]
        for r in df.select(
            "d1", "d2", zorder_value(F.col("d1"), F.col("d2"), 10).alias("z")
        ).collect()
    }
    sql = zorder_value_sql("d1", "d2", 10)
    want = {
        (d1, d2): z
        for d1, d2, z in duckdb.sql(
            "SELECT (i % 16) AS d1, (i // 16) AS d2, "
            f"({sql.replace('d1', '(i % 16)').replace('d2', '(i // 16)')})"
            " AS z FROM range(256) t(i)"
        ).fetchall()
    }
    assert got == want


def test_running_prefix_max_matches_naive_window(spark):
    """Two-pass range-partitioned prefix max == single-task window max,
    including the null-vs-value boundary at each partition edge."""
    from pyspark.sql.window import Window

    ev = load(spark, SF_SMOKE, "events").select("event_id", "value")
    got = {
        r["event_id"]: r["prev_max"]
        for r in running_prefix_max(ev, "event_id", "value").collect()
    }
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        r["event_id"]: r["prev_max"]
        for r in ev.withColumn("prev_max", F.max("value").over(w)).collect()
    }
    assert got == want


def test_salted_distinct_equals_plain(spark):
    """Salted two-phase COUNT(DISTINCT) == plain count_distinct."""
    from dataflow_example_spark.functions.diagnostics import (
        salted_distinct_count,
    )

    ev = load(spark, SF_SMOKE, "events")
    got = {
        r["event_type"]: r["n_distinct"]
        for r in salted_distinct_count(ev, "event_type", "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_session_window_matches_batch_islands(spark):
    """session_window merge semantics == batch lag-gap islands on the
    closed-session subset (end <= max event time)."""
    import os
    import tempfile

    from pyspark.sql.window import Window

    from dataflow_example_spark.streaming.events import run_session_stream

    base = tempfile.mkdtemp(prefix="t_sess_")
    ev = load(spark, SF_SMOKE, "events")
    ev.repartition(2).write.mode("overwrite").parquet(f"{base}/topic")
    q = run_session_stream(
        spark,
        f"{base}/topic",
        output_dir=f"{base}/out",
        checkpoint_dir=f"{base}/ckpt",
        schema=ev.schema,
    )
    drain(q, 300)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(f"{base}/out").collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.expr("INTERVAL 30 MINUTES")
    flagged = ev.withColumn(
        "new_sess",
        (
            F.lag("ts").over(w).isNull()
            | (F.col("ts") >= F.lag("ts").over(w) + gap)
        ).cast("int"),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    want = {
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in flagged.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("s"),
            (F.max("ts") + gap).alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
        if r["e"] <= max_ts
    }
    assert got == want and len(got) > 0


def test_dq_checks_detects_violations(spark):
    """The one-pass DQ report both passes clean constraints and counts
    violations for failing ones (value_le_100 is violated by design)."""
    from dataflow_example_spark.queries import QUERIES

    rows = {
        r["constraint"]: r
        for r in QUERIES["events_dq_checks"](spark, SF_SMOKE).collect()
    }
    assert rows["event_id_unique"]["passed"]
    assert rows["user_id_not_null"]["violations"] == 0
    assert not rows["value_le_100"]["passed"]
    assert rows["value_le_100"]["violations"] > 0
    assert all(r["observed"] == rows["ts_in_2024"]["observed"]
               for r in rows.values())


def test_running_prefix_max_property(spark):
    """Property: for random value sequences and any order permutation,
    the range-partitioned prefix max equals the naive window — catches
    range-boundary and tie-handling bugs the fixture can't."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql.window import Window

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=1,
            max_size=60,
        )
    )
    def check(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "k INT, v DOUBLE"
        ).repartition(7)
        got = {
            r["k"]: r["prev_max"]
            for r in running_prefix_max(df, "k", "v").collect()
        }
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
        want = {
            r["k"]: r["prev_max"]
            for r in df.withColumn(
                "prev_max", F.max("v").over(w)
            ).collect()
        }
        assert got == want

    check()


def test_jsonl_quarantine_roundtrip(spark, tmp_path):
    """Malformed JSON lines land whole in the quarantine side; clean
    rows parse losslessly (including a unicode value and a null)."""
    from dataflow_example_spark.sources.jsonl import (
        read_jsonl,
        split_quarantine,
    )

    lines = [
        '{"id": 1, "name": "ok"}',
        '{"id": 2, "name": "unicod\\u00e9"}',
        '{"id": 3, "name": null}',
        '{"id": 4, "name": "trunca',      # cut mid-string
        "not json at all",
        "",
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines))
    parsed = read_jsonl(spark, str(p), "id BIGINT, name STRING").cache()
    clean, quarantined = split_quarantine(parsed)
    got = {r["id"]: r["name"] for r in clean.collect()}
    assert got == {1: "ok", 2: "unicodé", 3: None}
    bad = {r["raw_line"] for r in quarantined.collect()}
    assert bad == {'{"id": 4, "name": "trunca', "not json at all"}


def test_bot_detector_fires_on_metronomic_user(spark):
    """A metronomic high-rate user is flagged; a jittery low-rate user
    is not (the 0-row result on organic data is meaningful only if the
    detector provably fires on actual automation)."""
    import datetime as dt

    from dataflow_example_spark.queries import QUERIES
    from dataflow_example_spark.tables import load

    base = dt.datetime(2024, 1, 1)
    rows = []
    # bot: every 10s exactly, 30 events -> 6/min, cv = 0
    for i in range(30):
        rows.append((i, base + dt.timedelta(seconds=10 * i), 1, "click", 1.0, "{}"))
    # human: irregular gaps (60-600s), low rate
    t = base
    for i in range(30):
        t += dt.timedelta(seconds=60 + (i * 97) % 540)
        rows.append((100 + i, t, 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="bot_t_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QUERIES["events_bot_users"](spark, d).collect()
    flagged = {r["user_id"] for r in out}
    assert flagged == {1}


def test_churn_risk_fires_on_lapsed_user(spark):
    """A user silent for 10 days is listed with the right silent_days;
    a recently-active user is not (0 rows on the dense corpus is
    meaningful only because this proves the gate fires)."""
    import datetime as dt
    import tempfile

    from dataflow_example_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(5):  # lapsed: active days 1-5, then silent
        rows.append((i, base + dt.timedelta(days=i), 1, "click", 1.0, "{}"))
    for i in range(15):  # active through day 15 (the horizon)
        rows.append((100 + i, base + dt.timedelta(days=i), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = tempfile.mkdtemp(prefix="churn_t_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["user_id"]: r for r in QUERIES["events_churn_risk"](spark, d).collect()}
    assert set(out) == {1}
    assert out[1]["silent_days"] == 10
    assert out[1]["active_days"] == 5


def test_bloom_property_random_membership(spark):
    """Property: for random key sets and filter geometries, bloom_build
    + bloom_filter_candidates never yields a false negative, and the
    exact bloom_semi_join equals the plain semi join."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1,
            max_size=40,
            unique=True,
        ),
        m_exp=st.integers(min_value=10, max_value=14),
        k=st.integers(min_value=1, max_value=6),
    )
    def check(keys, m_exp, k):
        m = 1 << m_exp
        small = spark.createDataFrame(
            [(str(x),) for x in keys], "kk STRING"
        )
        words = bloom_build(small, "kk", m_bits=m, k=k)
        probed = bloom_filter_candidates(
            small, "kk", words, m_bits=m, k=k
        )
        assert probed.filter(~F.col("_bloom_hit")).count() == 0
        big = spark.createDataFrame(
            [(str(x),) for x in range(0, 200)], "kk STRING"
        )
        got = sorted(
            r["kk"]
            for r in bloom_semi_join(
                big, small, "kk", m_bits=m, k=k
            ).collect()
        )
        want = sorted(
            r["kk"]
            for r in big.join(small, "kk", "left_semi").collect()
        )
        assert got == want

    check()


def test_zorder_property_random_widths(spark):
    """Property: for random bit widths the interleave stays within
    2^(2*bits) and decodes back to the inputs bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        bits=st.integers(min_value=1, max_value=16),
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=(1 << 16) - 1),
                st.integers(min_value=0, max_value=(1 << 16) - 1),
            ),
            min_size=1,
            max_size=30,
        ),
    )
    def check(bits, vals):
        mask = (1 << bits) - 1
        df = spark.createDataFrame(vals, "d1 BIGINT, d2 BIGINT")
        rows = df.select(
            "d1", "d2", zorder_value(F.col("d1"), F.col("d2"), bits).alias("z")
        ).collect()
        for r in rows:
            assert 0 <= r["z"] < (1 << (2 * bits))
            d1 = sum(((r["z"] >> (2 * b + 1)) & 1) << b for b in range(bits))
            d2 = sum(((r["z"] >> (2 * b)) & 1) << b for b in range(bits))
            assert d1 == (r["d1"] & mask) and d2 == (r["d2"] & mask)

    check()


def test_salted_distinct_property_skewed(spark):
    """Property: salted COUNT(DISTINCT) stays exact under pathological
    skew (one group holding almost all rows) and any salt count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflow_example_spark.functions.diagnostics import (
        salted_distinct_count,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        n_hot=st.integers(min_value=1, max_value=300),
        n_salts=st.integers(min_value=1, max_value=32),
    )
    def check(n_hot, n_salts):
        rows = [("hot", i % 97) for i in range(n_hot)] + [
            ("cold", i) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "g STRING, v BIGINT")
        got = {
            r["g"]: r["n_distinct"]
            for r in salted_distinct_count(
                df, "g", "v", n_salts=n_salts
            ).collect()
        }
        assert got == {"hot": min(n_hot, 97), "cold": 5}

    check()


def test_global_ranking_matches_naive_window(spark):
    """Property: the two-pass range-partitioned rank / running sum /
    ntile (functions/ranking.py) are bit-identical to the naive
    unpartitioned-window versions they replace, across random data with
    duplicates and any tile count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataflow_example_spark.functions import ranking as RK

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=1,
            max_size=120,
        ),
        k=st.integers(min_value=1, max_value=7),
    )
    def check(vals, k):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "id BIGINT, v BIGINT").repartition(5)
        order = [F.asc("v"), F.asc("id")]
        w = Window.orderBy(*order)
        naive = {
            r["id"]: (r["rn"], r["rs"], r["nt"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .withColumn(
                "rs",
                F.sum("v").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn("nt", F.ntile(k).over(w))
            .collect()
        }
        got_rn = {
            r["id"]: r["rn"]
            for r in RK.global_row_number(df, order, "rn").collect()
        }
        got_rs = {
            r["id"]: r["rs"]
            for r in RK.global_running_sum(df, order, "v", "rs").collect()
        }
        got_nt = {
            r["id"]: r["nt"]
            for r in RK.global_ntile(df, order, k, "nt").collect()
        }
        for i, (rn, rs, nt) in naive.items():
            assert got_rn[i] == rn, (i, got_rn[i], rn)
            assert got_rs[i] == rs, (i, got_rs[i], rs)
            assert got_nt[i] == nt, (i, got_nt[i], nt)
        RK.cleanup()

    check()


def test_grouped_top_k_matches_naive_window(spark):
    """Property: salted two-level top-k equals the per-group window
    row_number filter, across random group skew and any k."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataflow_example_spark.functions import ranking as RK

    @settings(max_examples=6, deadline=None)
    @given(
        groups=st.lists(
            st.integers(min_value=0, max_value=3),
            min_size=1,
            max_size=100,
        ),
        k=st.integers(min_value=1, max_value=5),
        n_salts=st.integers(min_value=1, max_value=8),
    )
    def check(groups, k, n_salts):
        rows = [(g, i, (i * 37) % 19) for i, g in enumerate(groups)]
        df = spark.createDataFrame(
            rows, "g INT, id BIGINT, v BIGINT"
        ).repartition(5)
        order = [F.desc("v"), F.asc("id")]
        w = Window.partitionBy("g").orderBy(*order)
        naive = {
            (r["g"], r["id"]): r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .collect()
        }
        got = {
            (r["g"], r["id"]): r["rk"]
            for r in RK.grouped_top_k(
                df,
                ["g"],
                order,
                k,
                salt_expr=F.xxhash64("id"),
                rank_col="rk",
                n_salts=n_salts,
            ).collect()
        }
        assert got == naive

    check()


def test_grouped_running_sum_matches_naive_window(spark):
    """Property: the range-partitioned grouped prefix sum equals the
    per-group window running sum (negatives included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataflow_example_spark.functions import ranking as RK

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=-20, max_value=20),
            ),
            min_size=1,
            max_size=100,
        )
    )
    def check(vals):
        rows = [(g, i, v) for i, (g, v) in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "g INT, id BIGINT, v BIGINT"
        ).repartition(5)
        order = [F.asc("id")]
        w = (
            Window.partitionBy("g")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        naive = {
            (r["g"], r["id"]): r["rs"]
            for r in df.withColumn("rs", F.sum("v").over(w)).collect()
        }
        got = {
            (r["g"], r["id"]): r["rs"]
            for r in RK.grouped_running_sum(
                df, ["g"], order, "v", "rs"
            ).collect()
        }
        assert got == naive
        RK.cleanup()

    check()


def test_fixed_point_sum_deterministic_and_close(spark):
    """Property: fixed_point_sum is partition-order independent (exact
    integer addition), within n*1e-12 of the true sum, and matches the
    DuckDB fpsum mirror on the same values."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from dataflow_example_spark.functions.numerics import fixed_point_sum

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e4,
                max_value=1e4,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=300,
        )
    )
    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
        s1 = (
            df.repartition(7)
            .agg(fixed_point_sum(F.col("v")).alias("s"))
            .collect()[0]["s"]
        )
        s2 = (
            df.repartition(2)
            .agg(fixed_point_sum(F.col("v")).alias("s"))
            .collect()[0]["s"]
        )
        assert s1 == s2  # bit-identical across partitionings
        # error model (numerics.py docstring): 1e-12 grid error per term,
        # plus — for |term| past ~9e3, where term*1e12 exceeds 2^53 —
        # up to 1 ulp of representation error per term and on the sum
        n = len(vals)
        ulp_slack = (n + 1) * max(abs(v) for v in vals) * 2.0**-52
        assert abs(s1 - sum(vals)) <= n * 1e-12 + ulp_slack + 1e-9
        con = duckdb.connect()
        con.execute("CREATE TABLE t(v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        # the LIVE oracles.fpsum mirror (compensated nearest-double —
        # imported, not copied, so this test pins the shipped SQL)
        from dataflow_example_spark.oracles import fpsum as fpsum_sql

        d = con.execute(
            "SELECT " + fpsum_sql("v") + " FROM t"
        ).fetchone()[0]
        assert s1 == d  # engine-exact

    check()

    # widened group-sum domain: the old BIGINT-narrowed mirror errored
    # past |group sum| ~9.2e6 (scaled sum > 2^63); the compensated
    # mirror must stay engine-exact far beyond that cliff
    from dataflow_example_spark.oracles import fpsum as fpsum_sql

    big = [5_000_000.0] * 12 + [1234.567890123] * 3  # sum 6e7 >> 9.2e6
    df = spark.createDataFrame([(v,) for v in big], "v DOUBLE")
    s = df.agg(fixed_point_sum(F.col("v")).alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in big])
    d = con.execute("SELECT " + fpsum_sql("v") + " FROM t").fetchone()[0]
    assert s == d


def test_dec_int_to_double_cross_engine_nearest(spark):
    """Property: dec_int_to_double (Spark plain cast) and its DuckDB
    mirror _dec_int_to_double_sql (compensated cast) both land on
    Python's correctly-rounded float() for integer magnitudes from
    2^53 to 2^120, including exact ulp midpoints, both signs, and the
    regression value whose residual Spark's Double.toString-based
    double->decimal cast mangled (5044931019679511357550: a naive
    Spark-side compensation returned 1 ulp below nearest)."""
    import random

    import duckdb

    from dataflow_example_spark.functions.numerics import dec_int_to_double
    from dataflow_example_spark.oracles import _dec_int_to_double_sql

    rng = random.Random(20260814)
    vals = [5044931019679511357550, -5044931019679511357550]
    for bits in range(54, 121, 6):
        for _ in range(6):
            v = rng.getrandbits(bits) | (1 << (bits - 1))
            vals += [v, -v]
        ulp = 1 << (bits - 52)
        vals += [(1 << bits) + ulp // 2, -((1 << bits) + 3 * ulp + ulp // 2)]
    want = [float(v) for v in vals]

    df = spark.createDataFrame([(str(v),) for v in vals], "s STRING")
    got_spark = [
        r["d"]
        for r in df.select(
            dec_int_to_double(F.col("s").cast("decimal(38,0)")).alias("d")
        ).collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT "
            + _dec_int_to_double_sql(f"CAST('{v}' AS DECIMAL(38,0))")
        ).fetchone()[0]
        for v in vals
    ]
    assert got_duck == want


def test_dec_wide_to_double_cross_engine_identical(spark):
    """Property: dec_wide_to_double and its DuckDB mirror
    _dec_wide_to_double_sql produce the bit-identical double for wide
    decimal sums (internal integer far past 2^53) at both content
    scales used in the registry (6: value sums; 12: squared-value
    sums). The contract is ENGINE EQUALITY (each step is either exact
    or the same IEEE op), which is what makes the cancellation-prone
    t-test/ANOVA/R^2/ICC assemblies gate-stable at any scale factor."""
    import random
    from decimal import Decimal

    import duckdb

    from dataflow_example_spark.functions.numerics import dec_wide_to_double
    from dataflow_example_spark.oracles import _dec_wide_to_double_sql

    rng = random.Random(20260814)
    cases = []
    for frac in (6, 12):
        for mag in (10**4, 10**8, 10**12, 10**16, 10**18):
            for _ in range(8):
                unscaled = rng.randrange(mag * 10**frac, 10 * mag * 10**frac)
                cases.append((frac, Decimal(unscaled) / 10**frac))

    con = duckdb.connect()
    for frac, v in cases:
        df = spark.createDataFrame([(str(v),)], "s STRING")
        got_spark = df.select(
            dec_wide_to_double(
                F.col("s").cast(f"decimal(38,{frac})"), frac
            ).alias("d")
        ).collect()[0]["d"]
        got_duck = con.execute(
            "SELECT "
            + _dec_wide_to_double_sql(
                f"CAST('{v}' AS DECIMAL(38,{frac}))", frac
            )
        ).fetchone()[0]
        assert got_spark == got_duck, (frac, v, got_spark, got_duck)
        # sanity: within 2 ulp of the true value
        assert abs(got_spark - float(v)) <= 4 * abs(float(v)) * 2**-52


def test_pearson_exact_parts_integer_exact(spark):
    """Property: pearson_exact_parts emits EXACTLY the integers
    10^2*(n*Sxy - Sx*Sy), n*Sxx - Sx^2, 10^4*(n*Syy - Sy^2) — including
    at the documented domain ceiling (n = 1e9, x <= 50 integral,
    y <= ~1.05e5 with 2 decimals), where the intermediate decimal types
    brush the precision-38 adjustment rules on both engines. Random
    small datasets check end-to-end from raw rows; the boundary case
    feeds worst-case sums directly."""
    import random
    from decimal import Decimal

    import duckdb

    from dataflow_example_spark.functions.numerics import (
        pearson_exact_parts,
    )

    rng = random.Random(7)

    def exact_parts(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)  # y in cents (int)
        sxy = sum(x * y for x, y in rows)
        sxx = sum(x * x for x, _ in rows)
        syy = sum(y * y for _, y in rows)
        # y carried in cents: num scales by 10^2 via y, den_y by 10^4
        return (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)

    for _ in range(4):
        rows = [
            (rng.randint(1, 50), rng.randint(90068, 10499991))
            for _ in range(rng.randint(2, 120))
        ]
        df = spark.createDataFrame(
            [(x, Decimal(y) / 100) for x, y in rows], "x LONG, y DECIMAL(18,2)"
        )
        g = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(18,6)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(18,6)")).alias("sy"),
            F.sum(
                F.col("x").cast("decimal(18,6)")
                * F.col("y").cast("decimal(18,6)")
            ).alias("sxy"),
            F.sum(
                F.col("x").cast("decimal(18,6)")
                * F.col("x").cast("decimal(18,6)")
            ).alias("sxx"),
            F.sum(
                F.col("y").cast("decimal(18,6)")
                * F.col("y").cast("decimal(18,6)")
            ).alias("syy"),
        )
        num, den_x, den_y = pearson_exact_parts()
        r = g.select(
            num.alias("ni"), den_x.alias("xi"), den_y.alias("yi")
        ).collect()[0]
        wn, wx, wy = exact_parts(rows)
        assert int(r["ni"]) == wn
        assert int(r["xi"]) == wx
        assert int(r["yi"]) == wy

    # boundary: worst-case sums at the documented ceiling, as literals
    n = 10**9
    sx, sy = 50 * n, Decimal("104999.91") * n
    sxy = Decimal("5249995.50") * n
    sxx, syy = 2500 * n, Decimal("11024981100.0081") * n
    one = spark.createDataFrame(
        [(n, str(sx), str(sy), str(sxy), str(sxx), str(syy))],
        "n LONG, sx_s STRING, sy_s STRING, sxy_s STRING, "
        "sxx_s STRING, syy_s STRING",
    ).select(
        "n",
        F.col("sx_s").cast("decimal(38,6)").alias("sx"),
        F.col("sy_s").cast("decimal(38,6)").alias("sy"),
        F.col("sxy_s").cast("decimal(38,12)").alias("sxy"),
        F.col("sxx_s").cast("decimal(38,12)").alias("sxx"),
        F.col("syy_s").cast("decimal(38,12)").alias("syy"),
    )
    num, den_x, den_y = pearson_exact_parts()
    r = one.select(
        num.alias("ni"), den_x.alias("xi"), den_y.alias("yi")
    ).collect()[0]
    cx, cy = 50 * n, int(Decimal("104999.91") * 100) * n  # cents
    cxy, cxx, cyy = (
        int(Decimal("5249995.50") * 100) * n,
        2500 * n,
        int(Decimal("11024981100.0081") * 10**4) * n,
    )
    assert int(r["ni"]) == n * cxy - cx * cy
    assert int(r["xi"]) == n * cxx - cx * cx
    assert int(r["yi"]) == n * cyy - cy * cy

    # the DuckDB mirror at the same boundary (inline the oracle casts)
    con = duckdb.connect()
    dr = con.execute(f"""
    WITH s AS (SELECT CAST({n} AS BIGINT) AS n,
        CAST('{sx}' AS DECIMAL(38,6)) AS sx,
        CAST('{sy}' AS DECIMAL(38,6)) AS sy,
        CAST('{sxy}' AS DECIMAL(38,12)) AS sxy,
        CAST('{sxx}' AS DECIMAL(38,12)) AS sxx,
        CAST('{syy}' AS DECIMAL(38,12)) AS syy)
    SELECT CAST(CAST(
               CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,2))
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,2))
             AS DECIMAL(33,2)) * CAST(100 AS DECIMAL(3,0))
             AS DECIMAL(38,0)),
           CAST(
               CAST(n AS DECIMAL(12,0)) * CAST(sxx AS DECIMAL(19,0))
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
             AS DECIMAL(38,0)),
           CAST(CAST(
               CAST(n AS DECIMAL(12,0)) * CAST(syy AS DECIMAL(26,4))
                 - CAST(sy AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2))
             AS DECIMAL(33,4)) * CAST(10000 AS DECIMAL(5,0))
             AS DECIMAL(38,0))
    FROM s""").fetchone()
    assert int(dr[0]) == n * cxy - cx * cy
    assert int(dr[1]) == n * cxx - cx * cx
    assert int(dr[2]) == n * cyy - cy * cy
