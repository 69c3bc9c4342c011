"""Injected-perturbation tests for the low-row registry entries whose
sf-fixture output is DEGENERATE in some dimension (VERDICT r13 item 5 —
the value-vacuity audit of <=5-row entries).

The driver's hash gate proves Spark and DuckDB compute the same values,
but when the fixture never exercises a branch the hash binds nothing
about it. The r14 audit of all 56 <=5-row entries (COVERAGE.md table)
found exactly six with a dormant dimension at sf0.01:

- ``q17_small_quantity_revenue``   -> 0 matching rows (NULL/0 output)
- ``q19_disjunctive_predicates``   -> 0 matching rows (NULL/0 output)
- ``events_funnel``                -> saturated 150/150/150 (temporal
  ordering conditions never discriminate)
- ``events_session_funnel_windowed`` -> stage 3 is zero on the fixture
- ``docs_dedup_threshold_sweep``   -> identical n_pairs at all five
  thresholds (every fixture near-dup pair has jaccard >= 0.9)
- ``docs_fingerprint_collision_rate`` -> zero 32-bit collisions
- plus ``events_salted_distinct_users`` (saturated at n_users for every
  type: a global-distinct mutant would also pass)

Each test plants a fixture where the dormant branch MUST move (plus
decoys where it must not), asserts the planted truth, and re-runs the
driver-replica compare against the registered DuckDB oracle on the same
parquet — so the spark/oracle pair is proven hash-equivalent on
non-degenerate output too.

The LSH pair texts and the md5-prefix-collision pair were found by
deterministic search against the engine's own hashing (3-token
shingles, md5-derived 16-permutation minhash, 4x4 banding; md5 prefix
for fingerprint32) and are hardcoded.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from dataflow_example_spark import oracles as _oracles
from dataflow_example_spark import queries as _queries
from tools.check_oracles import compare

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _ts(seconds: float) -> datetime.datetime:
    return T0 + datetime.timedelta(microseconds=round(seconds * 1_000_000))


def _write(tmp_path, table, cols):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table(cols), str(tmp_path / f"{table}.parquet"))


def _run_pair(spark, sf_dir, name, tables):
    """Run registered Spark query + DuckDB oracle on the same fixture
    dir (views for every table the query touches)."""
    spark_tbl = _queries.QUERIES[name](spark, str(sf_dir)).toArrow()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    duck_tbl = con.execute(_oracles.ORACLES[name]).arrow()
    return spark_tbl, duck_tbl


# ------------------------------------------------------------ lineitem/part


def _write_lineitem(tmp_path, rows):
    """rows: (l_orderkey, l_partkey, l_quantity, l_extendedprice,
    l_discount)."""
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
            "l_suppkey": [1] * len(rows),
            "l_linenumber": list(range(1, len(rows) + 1)),
            "l_quantity": [float(r[2]) for r in rows],
            "l_extendedprice": [float(r[3]) for r in rows],
            "l_discount": [float(r[4]) for r in rows],
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": [_ts(0)] * len(rows),
        },
    )


def _write_part(tmp_path, rows):
    """rows: (p_partkey, p_brand, p_size)."""
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": [r[0] for r in rows],
            "p_name": [f"part {r[0]}" for r in rows],
            "p_brand": [r[1] for r in rows],
            "p_type": ["T"] * len(rows),
            "p_size": [r[2] for r in rows],
            "p_retailprice": [100.0] * len(rows),
        },
    )


def test_q17_small_quantity_branch_fires(spark, tmp_path):
    """At sf fixtures NO lineitem is below 20% of its part's average
    quantity for BRAND_1 (output NaN/0) — plant one that is, a same-part
    decoy that is not, and a qualifying-quantity decoy on the WRONG
    brand."""
    _write_part(tmp_path, [(1, "BRAND_1", 5), (2, "BRAND_2", 5)])
    _write_lineitem(
        tmp_path,
        [
            # part 1 (BRAND_1): avg qty = (1+100*4)/5 = 80.2; 0.2*avg =
            # 16.04. qty 1 qualifies; qty 100 rows must not.
            (1, 1, 1, 700.0, 0.0),
            (2, 1, 100, 10.0, 0.0),
            (3, 1, 100, 10.0, 0.0),
            (4, 1, 100, 10.0, 0.0),
            (5, 1, 100, 10.0, 0.0),
            # part 2 (BRAND_2): qty 1 < 0.2*50.5 would qualify, but the
            # brand filter must exclude it.
            (6, 2, 1, 9999.0, 0.0),
            (7, 2, 100, 10.0, 0.0),
        ],
    )
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "q17_small_quantity_revenue", ["lineitem", "part"]
    )
    row = spark_tbl.to_pylist()[0]
    assert row["n_items"] == 1
    assert row["avg_yearly"] == pytest.approx(700.0 / 7)
    assert not compare(spark_tbl, duck_tbl)


def test_q19_each_disjunct_fires(spark, tmp_path):
    """At sf fixtures NO row satisfies any of the three predicate blocks
    (output NaN/0) — plant one hit per block plus quantity-, size- and
    brand-decoys that must stay excluded."""
    _write_part(
        tmp_path,
        [
            (1, "BRAND_1", 5),
            (2, "BRAND_2", 10),
            (3, "BRAND_3", 15),
            (4, "BRAND_1", 6),  # size decoy for block 1
            (5, "BRAND_4", 1),  # brand decoy
        ],
    )
    _write_lineitem(
        tmp_path,
        [
            (1, 1, 5, 100.0, 0.0),  # block 1: revenue 100
            (2, 1, 12, 777.0, 0.0),  # qty decoy for block 1 (12 > 11)
            (3, 2, 15, 200.0, 0.5),  # block 2: revenue 100
            (4, 3, 25, 300.0, 0.0),  # block 3: revenue 300
            (5, 4, 5, 777.0, 0.0),  # size decoy (p_size 6 > 5)
            (6, 5, 5, 777.0, 0.0),  # brand decoy
        ],
    )
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "q19_disjunctive_predicates", ["lineitem", "part"]
    )
    row = spark_tbl.to_pylist()[0]
    assert row["n_items"] == 3
    assert row["revenue"] == pytest.approx(500.0)
    assert not compare(spark_tbl, duck_tbl)


# ----------------------------------------------------------------- events


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    _write(
        tmp_path,
        "events",
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        },
    )


def test_funnel_temporal_order_discriminates(spark, tmp_path):
    """The sf fixture saturates all three funnel stages at every user, so
    the >= ordering conditions never discriminate — plant users whose
    ordering must exclude them from later stages."""
    _write_events(
        tmp_path,
        [
            # u1: full ordered funnel -> all three stages
            (1, _ts(0), 1, "view"),
            (2, _ts(10), 1, "click"),
            (3, _ts(20), 1, "purchase"),
            # u2: purchase BEFORE the first qualifying click -> stage 3 no
            (4, _ts(0), 2, "view"),
            (5, _ts(10), 2, "click"),
            (6, _ts(5), 2, "purchase"),
            # u3: only click is BEFORE the first view -> stage 2 no, and
            # its later purchase cannot reach stage 3 without stage 2
            (7, _ts(10), 3, "view"),
            (8, _ts(0), 3, "click"),
            (9, _ts(20), 3, "purchase"),
            # u4: never viewed -> not in the funnel at all
            (10, _ts(0), 4, "purchase"),
        ],
    )
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "events_funnel", ["events"]
    )
    row = spark_tbl.to_pylist()[0]
    assert row == {
        "n_viewed": 3,
        "n_clicked_after_view": 2,
        "n_purchased_after_click": 1,
    }
    assert not compare(spark_tbl, duck_tbl)


def test_session_funnel_stage3_fires_within_session(spark, tmp_path):
    """n_sessions_purchased is ZERO on every sf fixture — plant a session
    that completes the funnel, one whose purchase falls in the NEXT
    session (gap >= 30 min), one with the wrong order, and a view/click
    pair split exactly AT the 1800 s boundary."""
    _write_events(
        tmp_path,
        [
            # u1 session A: complete in-session funnel -> stage 3 fires
            (1, _ts(0), 1, "view"),
            (2, _ts(60), 1, "click"),
            (3, _ts(120), 1, "purchase"),
            # u1 session B: view+click; purchase lands 3700 s later ->
            # NEW session (no view there) -> stage 3 must not count it
            (4, _ts(10000), 1, "view"),
            (5, _ts(10060), 1, "click"),
            (6, _ts(13760), 1, "purchase"),
            # u2: purchase,click BEFORE the session's first view -> only
            # stage 1
            (7, _ts(0), 2, "purchase"),
            (8, _ts(10), 2, "click"),
            (9, _ts(20), 2, "view"),
            # u3: click exactly 1800 s after the view -> the >= 1800 gap
            # starts a NEW session, so the click cannot join the view's
            # session funnel
            (10, _ts(100000), 3, "view"),
            (11, _ts(101800), 3, "click"),
        ],
    )
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "events_session_funnel_windowed", ["events"]
    )
    row = spark_tbl.to_pylist()[0]
    assert row == {
        "n_sessions_viewed": 4,
        "n_sessions_clicked": 2,
        "n_sessions_purchased": 1,
    }
    assert not compare(spark_tbl, duck_tbl)


def test_salted_distinct_users_counts_per_type(spark, tmp_path):
    """Every type saturates at all 150 users on the sf fixture, so a
    global-distinct (or rows-not-users) mutant would also pass — plant
    types with DIFFERENT distinct-user sets and repeated events."""
    _write_events(
        tmp_path,
        [
            (1, _ts(0), 1, "click"),
            (2, _ts(1), 1, "click"),  # repeat: rows != users
            (3, _ts(2), 2, "click"),
            (4, _ts(3), 3, "click"),
            (5, _ts(4), 1, "view"),
            (6, _ts(5), 2, "view"),
        ],
    )
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "events_salted_distinct_users", ["events"]
    )
    got = {r["event_type"]: r["n_distinct"] for r in spark_tbl.to_pylist()}
    assert got == {"click": 3, "view": 2}
    assert not compare(spark_tbl, duck_tbl)


# -------------------------------------------------------------- documents


def _write_docs(tmp_path, texts):
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        },
    )


# Five doc pairs found by deterministic search against the engine's own
# minhash/banding: each pair IS an LSH candidate (some 4-row band
# matches) with exact 3-shingle jaccard in a distinct threshold tier.
_LSH_PAIRS = [
    # jaccard 0.5814 -> counted at threshold 0.5 only
    ("w73 w162 w38 w63 w68 w111 w130 w80 w48 w95 w109 w7 w161 w102 w141 "
     "w140 w52 w20 w12 w105 w115 w157 w35 w164 w199 w124 w181 w184 w32 "
     "w43 w120 w106 w87 w72 w76 w65",
     "w73 w162 w38 w63 w68 w111 w130 w80 w48 w95 w109 w7 w161 w102 w141 "
     "w140 w52 w20 w12 w105 w115 w157 w35 w164 w199 w124 w181 w129 w75 "
     "w94 w152 w175 w126 w34 w50 w49"),
    # jaccard 0.6429 -> thresholds 0.5, 0.6
    ("w93 w188 w121 w7 w161 w105 w63 w160 w103 w10 w96 w8 w118 w16 w15 "
     "w65 w49 w186 w155 w86 w92 w69 w85 w157 w11",
     "w93 w188 w121 w7 w161 w105 w63 w160 w103 w10 w96 w8 w118 w16 w15 "
     "w65 w49 w186 w155 w86 w95 w80 w88 w0 w175"),
    # jaccard 0.7419 -> thresholds 0.5-0.7
    ("w158 w172 w60 w191 w137 w170 w31 w75 w192 w71 w145 w68 w95 w65 w66 "
     "w50 w112 w63 w47 w62 w197 w39 w72 w148 w48 w83 w16 w101 w64",
     "w158 w172 w60 w191 w137 w170 w31 w75 w192 w71 w145 w68 w95 w65 w66 "
     "w50 w112 w63 w47 w62 w197 w39 w72 w148 w48 w152 w157 w74 w194"),
    # jaccard 0.8571 -> thresholds 0.5-0.8
    ("w106 w4 w196 w93 w164 w50 w100 w186 w103 w52 w1 w111 w40 w108 w29 "
     "w23 w191 w147 w197 w117 w41 w33 w3 w13 w141 w36 w195 w101",
     "w106 w4 w196 w93 w164 w50 w100 w186 w103 w52 w1 w111 w40 w108 w29 "
     "w23 w191 w147 w197 w117 w41 w33 w3 w13 w141 w36 w169 w182"),
    # jaccard 0.9231 -> all five thresholds
    ("w84 w153 w61 w97 w161 w177 w170 w137 w120 w191 w135 w178 w1 w6 "
     "w111 w59 w146 w78 w54 w100 w159 w149 w19 w144 w43 w37 w8",
     "w84 w153 w61 w97 w161 w177 w170 w137 w120 w191 w135 w178 w1 w6 "
     "w111 w59 w146 w78 w54 w100 w159 w149 w19 w144 w43 w37 w32"),
]


def test_dedup_threshold_sweep_thresholds_discriminate(spark, tmp_path):
    """On the sf fixture every candidate pair has jaccard >= 0.9, so all
    five thresholds report the SAME count and a threshold-ignoring
    mutant would pass — plant one LSH-candidate pair per jaccard tier so
    the sweep must be strictly decreasing."""
    _write_docs(tmp_path, [t for pair in _LSH_PAIRS for t in pair])
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "docs_dedup_threshold_sweep", ["documents"]
    )
    got = {
        round(r["threshold"], 1): r["n_pairs"] for r in spark_tbl.to_pylist()
    }
    assert got == {0.5: 5, 0.6: 4, 0.7: 3, 0.8: 2, 0.9: 1}
    assert not compare(spark_tbl, duck_tbl)


def test_fingerprint_collision_branch_fires(spark, tmp_path):
    """colliding_fp32 is ZERO on every sf fixture — plant two documents
    whose md5 fingerprints DIFFER but share the same 32-bit prefix
    (md5('tok94533') and md5('tok129055') both start 6532fd1b; found by
    birthday search), plus two non-colliding decoys."""
    _write_docs(tmp_path, ["tok94533", "tok129055", "plain one", "plain two"])
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "docs_fingerprint_collision_rate", ["documents"]
    )
    row = spark_tbl.to_pylist()[0]
    assert row == {
        "distinct_md5": 4,
        "distinct_fp32": 3,
        "colliding_fp32": 1,
    }
    assert not compare(spark_tbl, duck_tbl)
