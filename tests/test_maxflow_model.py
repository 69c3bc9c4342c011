"""Model-based property test for the flagship's windowed max-by
(MaxFlow + FormatMaxes, TrafficMaxLaneFlow.java:236-296; SURVEY.md §2
ops 9-11).

The two-phase plan in ``max_lane_flow`` (pre-aggregate per slide bucket,
then fan out bucket winners — the 100 TB optimization bounding the 60x
Expand) is a HAND-PROVED rewrite of the naive per-window max. The fixed
oracle data exercises it at three SFs, but ties and alignment edges are
whatever the generator happened to produce. This test pits BOTH physical
paths (two-phase for divisible duration/slide, single-phase otherwise)
against an imperative pure-Python model on hypothesis-generated
lane_info with deliberately dense collisions: few stations, a narrow
flow range (forcing the §2.4 ordered-struct tie-break through its later
fields), random second-offset event times (bucket-boundary edges), and
NULL lane_flow/total_flow rows (the filter and null-ordering edges).
"""

from __future__ import annotations

import datetime
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataflow_example_spark.config import TrafficConfig
from dataflow_example_spark.operators.traffic import format_maxes, max_lane_flow

EPOCH = datetime.datetime(2010, 1, 3, 0, 0, 0)
SCHEMA = (
    "station_id string, lane string, lane_idx int, direction string, "
    "freeway string, recorded_timestamp string, lane_flow int, "
    "lane_avg_occ double, lane_avg_speed double, total_flow int, "
    "event_ts timestamp"
)
# the documented §2.4 tie-break order (operators/traffic._ORDERED_FIELDS)
_KEY_FIELDS = (
    "lane_flow", "lane_idx", "recorded_timestamp", "lane", "direction",
    "freeway", "lane_avg_occ", "lane_avg_speed", "total_flow",
)


def _windows(t: datetime.datetime, dur_min: int, slide_min: int):
    """Spark F.window membership: t in [start, start+dur), starts
    epoch-aligned on slide multiples."""
    dur = dur_min * 60
    slide = slide_min * 60
    ts = int(t.timestamp())
    last = (ts // slide) * slide
    for k in range(math.ceil(dur / slide)):
        start = last - k * slide
        if start + dur > ts:
            yield datetime.datetime.utcfromtimestamp(start + dur)


def _key(row: dict):
    # None sorts below everything (Spark struct comparison, NULLS FIRST)
    return tuple(
        (v is not None, v) for v in (row[f] for f in _KEY_FIELDS)
    )


def model_max_flow(rows: list[dict], dur_min: int, slide_min: int) -> Counter:
    best: dict[tuple, dict] = {}
    for r in rows:
        if r["lane_flow"] is None:
            continue
        for wend in _windows(r["event_ts"], dur_min, slide_min):
            k = (r["station_id"], wend)
            if k not in best or _key(r) > _key(best[k]):
                best[k] = r
    return Counter(
        (
            st_id,
            r["direction"],
            r["freeway"],
            r["lane_flow"],
            r["lane"],
            r["lane_avg_occ"],
            r["lane_avg_speed"],
            r["total_flow"],
            r["recorded_timestamp"],
            wend,
        )
        for (st_id, wend), r in best.items()
    )


_row = st.fixed_dictionaries(
    {
        "station_id": st.sampled_from(["S1", "S2"]),
        "lane_idx": st.integers(1, 4),
        "direction": st.sampled_from(["N", "S"]),
        "freeway": st.sampled_from(["5", "99"]),
        # narrow flow range: ties are the norm, not the exception
        "lane_flow": st.one_of(st.none(), st.integers(10, 13)),
        "lane_avg_occ": st.sampled_from([0.1, 0.2]),
        "lane_avg_speed": st.sampled_from([60.0, 61.5]),
        "total_flow": st.one_of(st.none(), st.integers(100, 102)),
        # random second offsets within 3 hours: bucket-boundary edges
        "offset_s": st.integers(0, 3 * 3600 - 1),
    }
)


def _materialize(d: dict) -> dict:
    ts = EPOCH + datetime.timedelta(seconds=d.pop("offset_s"))
    d = dict(d)
    d["event_ts"] = ts
    d["recorded_timestamp"] = ts.strftime("%m/%d/%Y %H:%M:%S")
    d["lane"] = f"lane{d['lane_idx']}"
    return d


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(_row, min_size=1, max_size=40),
    cfg=st.sampled_from(
        [(60, 20), (10, 5), (60, 60), (7, 3), (9, 4)]
        # (60,20)/(10,5): two-phase; (60,60) tumbling, (7,3)/(9,4)
        # non-divisible: single-phase — both physical paths vs one model
    ),
)
def test_max_lane_flow_equals_model_on_both_paths(spark, rows, cfg):
    dur, slide = cfg
    rows = [_materialize(d) for d in rows]
    df = spark.createDataFrame(
        [tuple(r[f] for f in (
            "station_id", "lane", "lane_idx", "direction", "freeway",
            "recorded_timestamp", "lane_flow", "lane_avg_occ",
            "lane_avg_speed", "total_flow", "event_ts",
        )) for r in rows],
        SCHEMA,
    )
    config = TrafficConfig(
        window_duration_minutes=dur, window_slide_minutes=slide
    )
    got = Counter(
        tuple(r) for r in format_maxes(max_lane_flow(df, config)).collect()
    )
    assert got == model_max_flow(rows, dur, slide)
