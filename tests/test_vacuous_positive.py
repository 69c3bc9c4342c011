"""Positive-detection tests for the registry entries that return 0 rows
at every fixture scale factor (VERDICT r12 "What's wrong" #1).

The driver's hash gate proves such entries compute the SAME empty set as
the oracle, but never exercises the detection predicate's positive
branch: a broken threshold, an inverted variance test, or a wrong gap
computation would all still "pass" on empty output. The r12 local gate
logs show exactly three such entries (0 rows at sf0.001 AND sf0.01 AND
sf0.1): ``events_bot_users``, ``events_churn_risk``,
``emb_norm_outliers``.

Each test here injects synthetic literal data where the predicate MUST
fire (plus decoys where it must not), runs the registered Spark query on
a parquet fixture, asserts exactly the planted positives surface, and
runs the registered DuckDB oracle on the SAME parquet — compared with
the driver-replica gate (tools.check_oracles.compare), so the
spark/oracle pair is proven hash-equivalent on non-empty output too.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataflow_example_spark import oracles as _oracles
from dataflow_example_spark import queries as _queries
from tools.check_oracles import compare

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _us(seconds: float) -> datetime.datetime:
    return T0 + datetime.timedelta(microseconds=round(seconds * 1_000_000))


def _write_events(path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value, props)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(path))


def _run_pair(spark, sf_dir, name, table):
    """Run registered Spark query + DuckDB oracle on the same fixture dir."""
    spark_tbl = _queries.QUERIES[name](spark, str(sf_dir)).toArrow()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
    )
    duck_tbl = con.execute(_oracles.ORACLES[name]).arrow()
    return spark_tbl, duck_tbl


# ---------------------------------------------------------------- bots


def _bot_fixture(tmp_path):
    rows = []
    eid = 0

    def emit(uid, ts, etype="click"):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, uid, etype, 1.0, "{}"))

    # user 1: metronomic bot — 61 events at an exact 0.5 s cadence.
    # span = 30 s -> rate = 61 / max(0.5, 1.0 min) = 61 ev/min > 2;
    # every gap exactly 0.5 s -> variance 0 -> cv = 0 < 0.3.  MUST fire.
    for i in range(61):
        emit(1, _us(i * 0.5))
    # user 2: faster metronome — 41 events at exact 0.25 s.  MUST fire.
    for i in range(41):
        emit(2, _us(100 + i * 0.25))
    # user 3: organic — bursty gaps alternating 0.2 s and 30 s.  Rate is
    # high enough (41 events / ~10 min > 2) but cv >> 0.3.  Must NOT fire.
    t = 200.0
    for i in range(41):
        emit(3, _us(t))
        t += 0.2 if i % 2 == 0 else 30.0
    # user 4: metronomic but slow — 1 event/min for 15 min.  cv = 0 but
    # rate ~= 1.07 < 2.  Must NOT fire.
    for i in range(15):
        emit(4, _us(1000 + i * 60.0))
    # user 5: metronomic and fast but only 5 events (4 gaps < 10 minimum).
    # Must NOT fire.
    for i in range(5):
        emit(5, _us(2000 + i * 0.5))
    _write_events(tmp_path / "events.parquet", rows)


def test_bot_users_detects_planted_metronomes(spark, tmp_path):
    _bot_fixture(tmp_path)
    spark_tbl, duck_tbl = _run_pair(spark, tmp_path, "events_bot_users", "events")
    got = sorted(spark_tbl.column("user_id").to_pylist())
    assert got == [1, 2], f"expected exactly the planted bots, got {got}"
    assert not compare(spark_tbl, duck_tbl)


def test_bot_users_cv_threshold_has_teeth(spark, tmp_path):
    """A jittered-but-fast user sits just ABOVE the cv gate: proves the
    variance test is the discriminating term, not rate alone."""
    rows = []
    eid = 0
    # 41 events alternating 0.2 s / 1.0 s gaps: rate >> 2 ev/min, and
    # cv = std/mean = 0.4/0.6 = 0.667 > 0.3 -> must NOT fire.
    t = 0.0
    for i in range(41):
        eid += 1
        rows.append((eid, _us(t), 7, "click", 1.0, "{}"))
        t += 0.2 if i % 2 == 0 else 1.0
    _write_events(tmp_path / "events.parquet", rows)
    spark_tbl, duck_tbl = _run_pair(spark, tmp_path, "events_bot_users", "events")
    assert spark_tbl.num_rows == 0
    assert not compare(spark_tbl, duck_tbl)


# --------------------------------------------------------------- churn


def test_churn_risk_detects_planted_silence(spark, tmp_path):
    day = 86_400.0
    rows = []
    eid = 0

    def emit(uid, ts):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, uid, "click", 1.0, "{}"))

    # corpus horizon: user 2 is active at the very end (silent 0 days).
    emit(2, _us(20 * day))
    emit(2, _us(19 * day))
    # user 1: last seen exactly 10 days before horizon.  MUST fire.
    emit(1, _us(10 * day))
    emit(1, _us(9 * day))
    # user 3: silent exactly 7.0 days — boundary, floor(7.0) = 7 >= 7.
    # MUST fire.
    emit(3, _us(13 * day))
    # user 4: silent 6.99 days -> floor = 6.  Must NOT fire.
    emit(4, _us(20 * day - 6.99 * day))
    _write_events(tmp_path / "events.parquet", rows)
    spark_tbl, duck_tbl = _run_pair(spark, tmp_path, "events_churn_risk", "events")
    by_uid = {
        r["user_id"]: r for r in spark_tbl.to_pylist()
    }
    assert sorted(by_uid) == [1, 3], f"expected users 1,3: {sorted(by_uid)}"
    assert by_uid[1]["silent_days"] == 10
    assert by_uid[3]["silent_days"] == 7
    # user 1 had 2 events on 2 distinct days-of-month -> cadence 1.0
    assert by_uid[1]["events_per_active_day"] == pytest.approx(1.0)
    assert not compare(spark_tbl, duck_tbl)


# ------------------------------------------------------------ emb norms


def test_emb_norm_outliers_detects_planted_pads_and_spikes(spark, tmp_path):
    dim = 8

    def vec(c):
        # single-nonzero-component vector -> L2 norm == |c| exactly
        return [float(c)] + [0.0] * (dim - 1)

    vec_ids, embs, labels = [], [], []

    def emit(vid, c, label):
        vec_ids.append(vid)
        embs.append(vec(c))
        labels.append(label)

    # label 0: 19 healthy vectors at norm 10 +- 0.1, one ZERO-PAD
    # (vec_id 999, norm 0).  mean ~9.5, std ~2.18 -> pad z ~ -4.4.
    # MUST fire, and only it.
    for i in range(19):
        emit(i, 10.0 + (0.1 if i % 2 == 0 else -0.1), 0)
    emit(999, 0.0, 0)
    # label 1: all-identical norms -> zero variance -> z is NULL via
    # try_divide -> no outlier (exercises the degenerate-label branch).
    for i in range(5):
        emit(100 + i, 3.0, 1)
    # label 2: 19 vectors at norm 1, one SPIKE at 50 (vec_id 888).
    # mean 3.45, std ~10.7 -> spike z ~ +4.4.  MUST fire.
    for i in range(19):
        emit(200 + i, 1.0, 2)
    emit(888, 50.0, 2)

    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    spark_tbl, duck_tbl = _run_pair(
        spark, tmp_path, "emb_norm_outliers", "embeddings"
    )
    got = sorted(spark_tbl.column("vec_id").to_pylist())
    assert got == [888, 999], f"expected exactly the planted outliers: {got}"
    assert not compare(spark_tbl, duck_tbl)
