"""MaxFlow / sliding-window semantics (SURVEY.md §2.4, ops 9-11)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataflow_example_spark.config import TrafficConfig
from dataflow_example_spark.operators.traffic import (
    format_maxes,
    max_lane_flow,
    traffic_pipeline,
)
from dataflow_example_spark.schemas import LANE_INFO_SCHEMA, MAX_LANE_FLOW_SCHEMA
from dataflow_example_spark.sources.memory import create_strings


def lane_row(
    station="S1",
    lane_idx=1,
    flow=10,
    ts="2010-01-01 00:05:00",
    occ=0.5,
    speed=60.0,
    total=100,
    rec_ts=None,
):
    return (
        station,
        f"lane{lane_idx}",
        lane_idx,
        "N",
        "101",
        rec_ts or ts,
        flow,
        occ,
        speed,
        total,
        dt.datetime.fromisoformat(ts),
    )


def run_max(spark, rows, duration=60, slide=60):
    df = spark.createDataFrame(rows, LANE_INFO_SCHEMA)
    cfg = TrafficConfig(window_duration_minutes=duration, window_slide_minutes=slide)
    return format_maxes(max_lane_flow(df, cfg)).collect()


def test_max_record_selected_whole(spark):
    # the *entire* record with max flow is kept (TMLF:230-235: custom
    # combiner instead of Max to retain associated fields)
    rows = [
        lane_row(lane_idx=1, flow=10, occ=0.1, speed=50.0),
        lane_row(lane_idx=2, flow=99, occ=0.9, speed=70.0),
        lane_row(lane_idx=3, flow=45, occ=0.4, speed=60.0),
    ]
    out = run_max(spark, rows)
    assert len(out) == 1
    r = out[0]
    assert (r.lane_max_flow, r.lane, r.avg_occ, r.avg_speed) == (99, "lane2", 0.9, 70.0)


def test_deterministic_tie_break_max_lane_idx(spark):
    # equal flows -> greatest lane_idx wins (documented rule, SURVEY §2.4)
    rows = [lane_row(lane_idx=i, flow=50, occ=i / 10.0) for i in (1, 5, 3)]
    out = run_max(spark, rows)
    assert out[0].lane == "lane5"


def test_tie_break_recorded_timestamp(spark):
    # equal (flow, lane_idx) -> greatest recorded_timestamp string wins
    rows = [
        lane_row(lane_idx=2, flow=50, ts="2010-01-01 00:05:00", occ=0.1),
        lane_row(lane_idx=2, flow=50, ts="2010-01-01 00:20:00", occ=0.2),
    ]
    out = run_max(spark, rows)
    assert out[0].avg_occ == 0.2


def test_window_timestamp_is_window_end(spark):
    out = run_max(spark, [lane_row(ts="2010-01-01 00:05:00")], duration=60, slide=60)
    assert out[0].window_timestamp == dt.datetime(2010, 1, 1, 1, 0, 0)


def test_sliding_window_fanout(spark):
    # 60-min window / 15-min slide -> each element in 4 windows
    out = run_max(spark, [lane_row(ts="2010-01-01 01:00:00")], duration=60, slide=15)
    assert len(out) == 4
    ends = sorted(r.window_timestamp for r in out)
    assert ends[0] == dt.datetime(2010, 1, 1, 1, 15)
    assert ends[-1] == dt.datetime(2010, 1, 1, 2, 0)


def test_groups_are_per_station(spark):
    rows = [
        lane_row(station="A", flow=10),
        lane_row(station="A", flow=20, lane_idx=2),
        lane_row(station="B", flow=5),
    ]
    out = {r.station_id: r for r in run_max(spark, rows)}
    assert out["A"].lane_max_flow == 20
    assert out["B"].lane_max_flow == 5


def test_end_to_end_pipeline_schema(spark):
    line = ",".join(
        ["01/01/2010 00:00:00", "S1", "101", "N", "x", "x", "x", "50", "x", "x", "x"]
        + sum([[str(10 * i), "0.5", "60.0", "x", "x"] for i in range(1, 9)], [])
    )
    out = traffic_pipeline(create_strings(spark, [line, "", "Timestamp,hdr"]))
    assert out.schema == MAX_LANE_FLOW_SCHEMA
    rows = out.collect()
    # 60 sliding windows x 1 station, max lane = lane8 (flow 80)
    assert len(rows) == 60
    assert all(r.lane == "lane8" and r.lane_max_flow == 80 for r in rows)


def test_max_is_partial_aggregated(spark):
    # the plan must show a partial max before the exchange
    # (combiner lifting, SURVEY §4.3)
    df = spark.createDataFrame([lane_row()], LANE_INFO_SCHEMA)
    plan = max_lane_flow(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
