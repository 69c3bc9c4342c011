"""Edge-case parity tests for ExtractFlowInfoFn semantics (SURVEY.md §2.3).

Each case cites the reference behavior it pins.
"""

from __future__ import annotations

from dataflow_example_spark.operators.traffic import (
    extract_flow_info,
    filter_header_and_empties,
)
from dataflow_example_spark.sources.memory import create_strings


def make_line(
    ts="01/01/2010 00:00:00",
    station="400000",
    freeway="101",
    direction="N",
    total_flow="50",
    lanes=None,  # list of (flow, occ, speed) strings, 8 entries
    extra_fields=2,
):
    lanes = lanes or [(str(10 * i), "0.5", "60.0") for i in range(1, 9)]
    fields = [ts, station, freeway, direction, "x", "x", "x", total_flow, "x", "x", "x"]
    for flow, occ, speed in lanes:
        fields.extend([flow, occ, speed, "x", "x"])
    return ",".join(fields[: len(fields) - (2 - extra_fields)])


def parse(spark, lines, **kw):
    df = extract_flow_info(create_strings(spark, lines), **kw)
    return df.collect()


def test_valid_line_emits_8_lanes(spark):
    rows = parse(spark, [make_line()])
    assert len(rows) == 8
    assert [r.lane for r in rows] == [f"lane{i}" for i in range(1, 9)]
    assert rows[2].lane_flow == 30  # lane 3 flow (TMLF:198: items[6+5i])
    assert rows[0].station_id == "400000"
    assert rows[0].direction == "N"
    assert rows[0].freeway == "101"
    assert rows[0].total_flow == 50


def test_short_line_dropped(spark):
    # < 48 fields -> dropped whole (TMLF:187-190)
    assert parse(spark, ["a,b,c", make_line()[:100]]) == []


def test_exactly_48_fields_dropped(spark):
    # reference would crash (off-by-one, SURVEY §2.3.2); we drop
    line = ",".join(["f"] * 48)
    assert parse(spark, [line]) == []


def test_prefix_emission_on_bad_lane(spark):
    # lane 3 has unparseable flow -> lanes 1-2 emitted, 3-8 dropped
    # (TMLF:197-203)
    lanes = [(str(10 * i), "0.5", "60.0") for i in range(1, 9)]
    lanes[2] = ("notanint", "0.5", "60.0")
    rows = parse(spark, [make_line(lanes=lanes)])
    assert [r.lane for r in rows] == ["lane1", "lane2"]

    # same for bad occupancy / bad speed
    lanes[2] = ("30", "junk", "60.0")
    assert len(parse(spark, [make_line(lanes=lanes)])) == 2
    lanes[2] = ("30", "0.5", "junk")
    assert len(parse(spark, [make_line(lanes=lanes)])) == 2


def test_bad_first_lane_emits_nothing(spark):
    lanes = [("bad", "0.5", "60.0")] + [("10", "0.5", "60.0")] * 7
    assert parse(spark, [make_line(lanes=lanes)]) == []


def test_bad_timestamp_drops_record_in_batch(spark):
    rows = parse(spark, [make_line(ts="not a timestamp")])
    assert rows == []
    # but in streaming mode (no payload-ts assignment) the record survives
    rows = parse(spark, [make_line(ts="not a timestamp")], assign_event_ts=False)
    assert len(rows) == 8
    assert all(r.event_ts is None for r in rows)


def test_null_total_flow_carried(spark):
    # total_flow parse failure nulls the column, drops nothing (TMLF:196)
    rows = parse(spark, [make_line(total_flow="N/A")])
    assert len(rows) == 8
    assert all(r.total_flow is None for r in rows)


def test_trailing_commas_java_split_semantics(spark):
    # Java String.split(",") drops trailing empty fields; a valid 51-field
    # line plus trailing commas still parses...
    rows = parse(spark, [make_line() + ",,,,"])
    assert len(rows) == 8
    # ...but a line whose *significant* fields end early is dropped even if
    # commas pad it past 49 (all-empty tail = fewer effective fields).
    assert parse(spark, ["a,b,c" + "," * 60]) == []


def test_float_flow_rejected_like_parseInt(spark):
    # Java Integer.parseInt("30.0") throws -> lane invalid; guards against
    # Spark's laxer string->int cast
    lanes = [("30.0", "0.5", "60.0")] + [("10", "0.5", "60.0")] * 7
    assert parse(spark, [make_line(lanes=lanes)]) == []


def test_event_ts_parsing(spark):
    rows = parse(spark, [make_line(ts="03/15/2010 14:30:05")])
    assert rows[0].event_ts.strftime("%Y-%m-%d %H:%M:%S") == "2010-03-15 14:30:05"


def test_filter_header_and_empties(spark):
    df = create_strings(
        spark, ["Timestamp,Station", "", "data,line", "Timestamped header", "x"]
    )
    vals = [r.value for r in filter_header_and_empties(df).collect()]
    assert vals == ["data,line", "x"]


def test_quarantine_routes_rejected_lines_with_reasons(spark):
    """Dead-letter fork: every whole-row drop lands in quarantine with
    the right reason; parseable lines (including lane-prefix truncation,
    which is not a row rejection) do not."""
    from dataflow_example_spark.operators.traffic import (
        extract_flow_info,
        filter_header_and_empties,
        traffic_quarantine,
    )

    def row(ts, flows, pad_to=49):
        f = [""] * pad_to
        f[0] = ts
        f[1] = "S1"
        f[48] = "0"
        for i, fl in enumerate(flows, start=1):
            f[6 + 5 * i] = str(fl)
            f[7 + 5 * i] = "0.5"
            f[8 + 5 * i] = "55.0"
        return ",".join(f)

    lines = [
        "Timestamp,header",                       # header_or_empty
        "",                                       # header_or_empty
        ",".join(["x"] * 40),                     # too_few_fields
        row("not a date", [1]),                   # bad_timestamp
        row("01/01/2010 10:00:00", [7, 8]),       # good: 2 lanes
        row("01/01/2010 10:01:00", []),           # good row, 0 valid lanes
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    q = {
        (r.line.split(",")[0] or "<empty>"): r.reason
        for r in traffic_quarantine(df).collect()
    }
    assert q == {
        "Timestamp": "header_or_empty",
        "<empty>": "header_or_empty",
        "x": "too_few_fields",
        "not a date": "bad_timestamp",
    }
    parsed = extract_flow_info(filter_header_and_empties(df)).collect()
    assert {r.recorded_timestamp for r in parsed} == {"01/01/2010 10:00:00"}
    assert len(parsed) == 2  # the 2-lane row; 0-lane row emits nothing


def test_parser_never_throws_property(spark):
    """ANSI-mode safety fuzz: arbitrary comma-separated garbage must
    never crash the parse plan — malformed rows DROP (whole-row or
    lane-prefix), they do not raise. Random numeric-ish fields also
    exercise the try_cast boundaries (floats, overflow-length digits,
    signs) that would throw under a plain ANSI cast."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflow_example_spark.operators.traffic import extract_flow_info

    field = st.one_of(
        st.text(
            alphabet=st.characters(
                blacklist_characters=",\n\r", max_codepoint=0x2FF
            ),
            max_size=8,
        ),
        st.integers(-(10**19), 10**19).map(str),
        st.floats(allow_nan=False, allow_infinity=False).map(str),
        st.just(""),
    )
    lines = st.lists(
        st.lists(field, min_size=0, max_size=55).map(",".join),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=15, deadline=None)
    @given(lines=lines)
    def check(lines):
        df = spark.createDataFrame([(l,) for l in lines], "value STRING")
        out = extract_flow_info(df).collect()  # must not raise
        for r in out:
            # anything emitted parsed cleanly: lane fields are typed
            assert r["lane"].startswith("lane")

    check()
