"""Edge-semantics tests for the temporal join operators
(operators/joins.py): at-or-before inclusivity, tie-breaks, null
extension, bucket-spanning intervals, keyed range joins."""

from __future__ import annotations

import datetime as dt

from dataflow_example_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _left(spark, rows):
    return spark.createDataFrame(rows, "lid INT, k STRING, ts TIMESTAMP")


def _right(spark, rows):
    return spark.createDataFrame(rows, "rid INT, k STRING, ts TIMESTAMP, v DOUBLE")


def _asof(spark, left_rows, right_rows):
    out = asof_join(
        _left(spark, left_rows),
        _right(spark, right_rows),
        keys=["k"],
        ts_col="ts",
        right_cols=["rid", "v"],
        tiebreak_col="rid",
    )
    return {r.lid: (r.rid_asof, r.ts_asof, r.v_asof) for r in out.collect()}


def test_asof_basic_and_null_extension(spark):
    got = _asof(
        spark,
        [(1, "a", ts(10)), (2, "a", ts(0)), (3, "b", ts(10))],
        [(100, "a", ts(5), 1.0), (101, "a", ts(9), 2.0)],
    )
    assert got[1] == (101, ts(9), 2.0)  # latest at-or-before
    assert got[2] == (None, None, None)  # no prior right row
    assert got[3] == (None, None, None)  # key isolation


def test_asof_equal_ts_is_inclusive(spark):
    got = _asof(spark, [(1, "a", ts(5))], [(100, "a", ts(5), 7.0)])
    assert got[1] == (100, ts(5), 7.0)


def test_asof_tiebreak_greatest_wins(spark):
    got = _asof(
        spark,
        [(1, "a", ts(6))],
        [(100, "a", ts(5), 1.0), (102, "a", ts(5), 3.0), (101, "a", ts(5), 2.0)],
    )
    assert got[1] == (102, ts(5), 3.0)


def test_asof_left_row_count_preserved(spark):
    left = [(i, "a", ts(i)) for i in range(20)]
    right = [(100 + i, "a", ts(i + 0.5), float(i)) for i in range(0, 20, 3)]
    out = asof_join(
        _left(spark, left),
        _right(spark, right),
        keys=["k"],
        ts_col="ts",
        right_cols=["rid", "v"],
        tiebreak_col="rid",
    )
    assert out.count() == 20


def _intervals(spark, rows):
    return spark.createDataFrame(
        rows, "iid INT, k STRING, start TIMESTAMP, end TIMESTAMP"
    )


def test_range_join_bounds_and_span(spark):
    probe = _left(spark, [(1, "a", ts(0)), (2, "a", ts(59)), (3, "a", ts(60))])
    iv = _intervals(spark, [(10, "a", ts(0), ts(60))])
    out = range_join(probe, "ts", iv, "start", "end", grain_seconds=60)
    got = sorted(r.lid for r in out.collect())
    assert got == [1, 2]  # start inclusive, end exclusive


def test_range_join_interval_spanning_many_buckets(spark):
    # 3-hour interval, 5-minute grain: 37 bucket rows, each probe matches once
    probe = _left(spark, [(i, "a", ts(10 * i)) for i in range(24)])
    iv = _intervals(spark, [(10, "a", ts(30), ts(210))])
    out = range_join(probe, "ts", iv, "start", "end", grain_seconds=300)
    got = sorted(r.lid for r in out.collect())
    assert got == [i for i in range(24) if 30 <= 10 * i < 210]


def test_range_join_keyed(spark):
    probe = _left(spark, [(1, "a", ts(5)), (2, "b", ts(5))])
    iv = _intervals(spark, [(10, "a", ts(0), ts(10))])
    out = range_join(
        probe, "ts", iv, "start", "end", grain_seconds=60, keys=["k"]
    )
    assert [r.lid for r in out.collect()] == [1]


def test_range_join_overlapping_intervals_emit_all_pairs(spark):
    probe = _left(spark, [(1, "a", ts(5))])
    iv = _intervals(
        spark, [(10, "a", ts(0), ts(10)), (11, "a", ts(4), ts(6))]
    )
    out = range_join(probe, "ts", iv, "start", "end", grain_seconds=60)
    assert sorted(r.iid for r in out.collect()) == [10, 11]


def test_range_join_pre_epoch_timestamps(spark):
    """Bucket ids must use floor division: pre-1970 timestamps have
    negative epochs, and truncate-toward-zero would put a probe and its
    containing interval in different buckets, silently dropping matches."""
    t = dt.datetime(1969, 12, 31, 23, 59, 30)  # epoch -30s
    probe = _left(spark, [(1, "a", t)])
    iv = _intervals(
        spark,
        [(10, "a", dt.datetime(1969, 12, 31, 23, 59, 0), dt.datetime(1970, 1, 1, 0, 1, 0))],
    )
    out = range_join(probe, "ts", iv, "start", "end", grain_seconds=60)
    assert [r.lid for r in out.collect()] == [1]


# ------------------------------------------------------------- nearest_join


def _nearest(spark, left_rows, right_rows, tol_us=60_000_000):
    from dataflow_example_spark.operators.joins import nearest_join

    out = nearest_join(
        _left(spark, left_rows),
        _right(spark, right_rows),
        keys=["k"],
        ts_col="ts",
        right_cols=["rid", "v"],
        tolerance_us=tol_us,
        tiebreak_col="rid",
    )
    return {r["lid"]: r for r in out.collect()}


def test_nearest_picks_smaller_abs_distance_either_direction(spark):
    # right rows 2min before and 1min after -> the later-but-closer wins
    got = _nearest(
        spark,
        [(1, "a", ts(10))],
        [(100, "a", ts(8), 1.0), (200, "a", ts(11), 2.0)],
        tol_us=5 * 60_000_000,
    )
    assert got[1]["rid_near"] == 200 and got[1]["dt_us_near"] == 60_000_000


def test_nearest_tolerance_is_inclusive_and_outside_dropped(spark):
    got = _nearest(
        spark,
        [(1, "a", ts(10)), (2, "a", ts(50))],
        [(100, "a", ts(11), 1.0)],
        tol_us=60_000_000,
    )
    # lid=1 matches at exactly the tolerance bound; lid=2 has no match
    assert got[1]["rid_near"] == 100
    assert 2 not in got


def test_nearest_equidistant_tie_breaks_to_earlier_right(spark):
    got = _nearest(
        spark,
        [(1, "a", ts(10))],
        [(200, "a", ts(9), 1.0), (100, "a", ts(11), 2.0)],
        tol_us=5 * 60_000_000,
    )
    assert got[1]["rid_near"] == 200 and got[1]["dt_us_near"] == -60_000_000


def test_nearest_respects_keys(spark):
    got = _nearest(
        spark,
        [(1, "a", ts(10))],
        [(100, "b", ts(10), 1.0)],
        tol_us=5 * 60_000_000,
    )
    assert got == {}


def test_nearest_matches_naive_all_pairs(spark):
    # bucket-edge sweep: lefts every 37s, rights every 53s; the bucketed
    # join must agree with the O(n^2) reference on every pick
    import datetime

    tol = 90_000_000
    lefts = [(i, "a", T0 + datetime.timedelta(seconds=37 * i)) for i in range(40)]
    rights = [
        (1000 + i, "a", T0 + datetime.timedelta(seconds=53 * i), float(i))
        for i in range(40)
    ]
    got = _nearest(spark, lefts, rights, tol_us=tol)
    for lid, _, lts in lefts:
        cands = [
            (abs(int((rts - lts).total_seconds() * 1e6)), rts, rid)
            for rid, _, rts, _ in rights
            if abs(int((rts - lts).total_seconds() * 1e6)) <= tol
        ]
        if not cands:
            assert lid not in got
        else:
            want = min(cands)[2]
            assert got[lid]["rid_near"] == want, lid
