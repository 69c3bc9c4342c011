"""Exact-gap TIE parity for the session oracles — regression tests for
a dormant boundary bug found by the r14 window-semantics probe corpus
(tests/test_window_model.py).

``F.session_window`` merges on INCLUSIVE interval touch: two events of
one key exactly ``gap`` apart are ONE session (probe S2; batch and
streaming agree). The DuckDB oracles for ``events_sessionize``,
``events_sessionize_dynamic`` and ``streaming_session_parity`` used the
gaps-and-islands rule with ``>=`` — splitting at the tie — and passed
every gate only because the sf fixtures never produce an exact 1800 s
inter-event gap. These tests plant the tie (plus one-second-off decoys
on both sides), assert the planted truth on the ENGINE output, run the
driver-replica compare against the FIXED oracle on the same parquet,
and prove the old ``>=`` predicate has teeth (it must mismatch on this
fixture).

The self-review of that fix caught a sibling boundary in
``events_session_funnel_windowed`` (a lag-based islands query defining
its own rule on both sides): the engine compared truncated-second
casts while the oracle compared exact intervals, diverging for true
gaps in (1799 s, 1800 s) that floor to 1800. The engine now uses exact
interval arithmetic; ``test_session_funnel_subsecond_gap_boundary``
plants the divergence zone, the exact tie, and clear decoys.
"""

from __future__ import annotations

import datetime

import duckdb

from dataflow_example_spark import oracles as _oracles
from dataflow_example_spark import queries as _queries
from tools.check_oracles import compare

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
GAP_S = 1800  # the 30-minute gap both session queries use


def _ts(seconds: float) -> datetime.datetime:
    return T0 + datetime.timedelta(microseconds=round(seconds * 1_000_000))


def _naive(dt: datetime.datetime) -> datetime.datetime:
    """Arrow returns tz-aware UTC timestamps; the fixture writes naive."""
    return dt.replace(tzinfo=None)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [r[4] for r in rows],
                "props": ["{}"] * len(rows),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def _run_duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con.execute(sql).arrow()


def _run_pair(spark, sf_dir, name):
    spark_tbl = _queries.QUERIES[name](spark, str(sf_dir)).toArrow()
    return spark_tbl, _run_duck(sf_dir, _oracles.ORACLES[name])


def _break_tie(sql: str) -> str:
    """Reintroduce the old >= split-at-tie predicate into the fixed SQL
    (teeth: the buggy oracle must mismatch on the planted fixture)."""
    for fixed, buggy in [
        ("OVER w > INTERVAL 30 MINUTE", "OVER w >= INTERVAL 30 MINUTE"),
        ("ts > prev_max_end", "ts >= prev_max_end"),
    ]:
        if fixed in sql:
            return sql.replace(fixed, buggy)
    raise AssertionError("fixed predicate not found — teeth test is stale")


TIE_FIXTURE = [
    # u1: exact 30-min tie -> ONE merged session [0, t1+gap)
    (1, _ts(0), 1, "view", 0.5),
    (2, _ts(GAP_S), 1, "view", 0.25),
    # u2: one second beyond the gap -> TWO sessions
    (3, _ts(0), 2, "view", 1.0),
    (4, _ts(GAP_S + 1), 2, "view", 2.0),
    # u3: one second inside the gap -> ONE session (plain merge decoy)
    (5, _ts(0), 3, "view", 4.0),
    (6, _ts(GAP_S - 1), 3, "view", 8.0),
    # u4: far-future flusher so every session above is past the final
    # watermark in the streaming drain
    (7, _ts(10 * GAP_S), 4, "view", 16.0),
]


def test_sessionize_tie_merges_and_matches_oracle(spark, tmp_path):
    _write_events(tmp_path, TIE_FIXTURE)
    spark_tbl, duck_tbl = _run_pair(spark, tmp_path, "events_sessionize")
    # planted truth on the ENGINE: u1 merged (tie), u2 split, u3 merged
    per_user = {}
    for row in spark_tbl.to_pylist():
        per_user.setdefault(row["user_id"], []).append(row)
    assert len(per_user[1]) == 1 and per_user[1][0]["n_events"] == 2
    assert _naive(per_user[1][0]["session_end"]) == _ts(2 * GAP_S)
    assert len(per_user[2]) == 2
    assert len(per_user[3]) == 1 and per_user[3][0]["n_events"] == 2
    # driver-replica compare against the fixed oracle: exact match
    assert not compare(spark_tbl, duck_tbl)
    # teeth: the old >= oracle splits u1 and must mismatch (DuckDB-only
    # re-run; the Spark result is reused)
    buggy_tbl = _run_duck(
        tmp_path, _break_tie(_oracles.ORACLES["events_sessionize"])
    )
    assert compare(spark_tbl, buggy_tbl)


def test_sessionize_dynamic_tie_merges_and_matches_oracle(spark, tmp_path):
    """Same boundary for the per-event-gap variant: a view landing
    exactly on the running max end (here set by a purchase's 60-minute
    gap) merges."""
    rows = [
        # u1: purchase@0 holds the session until 3600; view exactly at
        # 3600 -> tie -> ONE session ending 3600+1800
        (1, _ts(0), 1, "purchase", 0.5),
        (2, _ts(2 * GAP_S), 1, "view", 0.25),
        # u2: view one second past the purchase horizon -> TWO sessions
        (3, _ts(0), 2, "purchase", 1.0),
        (4, _ts(2 * GAP_S + 1), 2, "view", 2.0),
        # u3: plain 30-min tie between two views -> ONE session
        (5, _ts(0), 3, "view", 4.0),
        (6, _ts(GAP_S), 3, "view", 8.0),
    ]
    _write_events(tmp_path, rows)
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "events_sessionize_dynamic"
    )
    per_user = {}
    for row in spark_tbl.to_pylist():
        per_user.setdefault(row["user_id"], []).append(row)
    assert len(per_user[1]) == 1 and per_user[1][0]["n_events"] == 2
    assert _naive(per_user[1][0]["session_end"]) == _ts(3 * GAP_S)
    assert len(per_user[2]) == 2
    assert len(per_user[3]) == 1
    assert not compare(spark_tbl, duck_tbl)
    buggy_tbl = _run_duck(
        tmp_path, _break_tie(_oracles.ORACLES["events_sessionize_dynamic"])
    )
    assert compare(spark_tbl, buggy_tbl)


def test_session_funnel_subsecond_gap_boundary(spark, tmp_path):
    """events_session_funnel_windowed defines its own lag-based session
    rule (split iff ts >= prev + 30 min, EXACT) on both engine and
    oracle sides. The engine used to compare truncated-second casts
    (ts.cast(long) - prev.cast(long) >= 1800), so a true gap inside
    (1799 s, 1800 s) whose timestamp fractions straddle a second
    boundary floored to 1800 and SPLIT where the microsecond-exact
    oracle merges (r14 self-review finding). Plant that exact zone plus
    an exact tie and clear-split/merge decoys; the expected counts are
    computed from the exact rule, so the old truncating engine (viewed
    = 7, not 6) fails this test."""
    rows = [
        # u1: true gap 1799.2 s, floor-diff 1800 -> EXACT rule merges
        (1, _ts(0.900), 1, "view", 1.0),
        (2, _ts(1800.100), 1, "view", 1.0),
        # u2: clear split (gap 2000 s) -> two viewed sessions
        (3, _ts(0.5), 2, "view", 1.0),
        (4, _ts(2000.5), 2, "view", 1.0),
        # u3: clear merge + full ordered funnel in one session
        (5, _ts(0.5), 3, "view", 1.0),
        (6, _ts(110.5), 3, "click", 1.0),
        (7, _ts(120.5), 3, "purchase", 1.0),
        # u4: EXACT 1800.000000 s tie -> >= splits (both sides agree)
        (8, _ts(0.250), 4, "view", 1.0),
        (9, _ts(1800.250), 4, "view", 1.0),
    ]
    _write_events(tmp_path, rows)
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "events_session_funnel_windowed"
    )
    (row,) = spark_tbl.to_pylist()
    # u1 merged (1) + u2 split (2) + u3 (1) + u4 tie-split (2)
    assert row["n_sessions_viewed"] == 6
    assert row["n_sessions_clicked"] == 1
    assert row["n_sessions_purchased"] == 1
    assert not compare(spark_tbl, duck_tbl)


def test_streaming_session_parity_tie(spark, tmp_path):
    """The streaming drain sees the same tie-merge: the planted sessions
    all finalize (u4's far-future event drives the closing watermark),
    and the drained sink matches the fixed oracle exactly."""
    _write_events(tmp_path, TIE_FIXTURE)
    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "streaming_session_parity"
    )
    per_user = {}
    for row in spark_tbl.to_pylist():
        per_user.setdefault(row["user_id"], []).append(row)
    assert len(per_user[1]) == 1 and per_user[1][0]["n_events"] == 2
    assert len(per_user[2]) == 2
    assert 4 not in per_user  # the flusher's own session is still open
    assert not compare(spark_tbl, duck_tbl)
    buggy_tbl = _run_duck(
        tmp_path, _break_tie(_oracles.ORACLES["streaming_session_parity"])
    )
    assert compare(spark_tbl, buggy_tbl)
