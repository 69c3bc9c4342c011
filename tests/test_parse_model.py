"""Model-based property test for the parse's reference-parity semantics
(SURVEY.md §2.3; ExtractFlowInfoFn, TrafficMaxLaneFlow.java:172-227).

tests/test_traffic_parse.py pins the known edge cases and a never-throws
fuzz; this adds the stronger artifact: a PURE-PYTHON twin of the
reference semantics (Java String.split trailing-empty drop, 49-field
guard — our documented drop-on-48 deviation, Integer.parseInt /
Double.parseDouble validity, lane prefix emission, timestamp
parse-or-drop) executed row-for-row against the Spark plan on
hypothesis-generated lines. Any divergence between the declarative
Spark expressions and the reference's imperative semantics — on inputs
nobody thought to enumerate — fails here with the exact line.

The generator is deliberately rich where the engines agree by
construction (signed ints, overflow-length digits, decimal/scientific
doubles, empty fields, alpha junk, whitespace-padded numbers — the
parseInt-vs-cast trim divergence the regex guard exists for) and avoids
only the exotic numeric spellings the docstrings already DOCUMENT as
deviations (hex-float forms, "Infinity"/"NaN" words, 1-2-digit
timestamp fields).
"""

from __future__ import annotations

import datetime
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataflow_example_spark.operators.traffic import (
    extract_flow_info,
    filter_header_and_empties,
)

MIN_FIELDS = 49
N_LANES = 8
INT_RE = re.compile(r"^[+-]?\d+$")
TS_FMT = "%m/%d/%Y %H:%M:%S"


def _java_split(line: str) -> list[str]:
    """Java String.split(",") — trailing empty strings dropped."""
    parts = line.split(",")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _parse_int(s: str) -> int | None:
    """Integer.parseInt via the engine's regex + int32-range gate."""
    if not INT_RE.match(s):
        return None
    v = int(s)
    return v if -(2**31) <= v <= 2**31 - 1 else None


def _parse_double(s: str) -> float | None:
    """Double.parseDouble for the generator's decimal/scientific forms
    (Spark's cast trims whitespace; so does parseDouble)."""
    t = s.strip()
    if not t or not re.match(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$", t):
        return None
    try:
        return float(t)
    except ValueError:
        return None


def _parse_ts(s: str) -> datetime.datetime | None:
    try:
        ts = datetime.datetime.strptime(s, TS_FMT)
    except ValueError:
        return None
    return ts if 1 <= ts.year <= 9999 else None


def model_extract(lines: list[str]) -> Counter:
    """The reference semantics, imperatively. Returns a MULTISET —
    two identical emitted rows must stay two (a set compare would hide
    duplicate-emission bugs and collide identical rows from different
    input lines)."""
    out = Counter()
    for line in lines:
        if not line or line.startswith("Timestamp"):
            continue  # FilterHeaderAndEmpties
        items = _java_split(line)
        if len(items) < MIN_FIELDS:
            continue  # §2.3 item 2 (documented drop-on-48 deviation)
        ts = _parse_ts(items[0])
        if ts is None:
            continue  # TMLF:215-221 parse-failure drop
        total_flow = _parse_int(items[7])
        for i in range(1, N_LANES + 1):
            f, o, s = items[6 + 5 * i], items[7 + 5 * i], items[8 + 5 * i]
            flow, occ, speed = _parse_int(f), _parse_double(o), _parse_double(s)
            if flow is None or occ is None or speed is None:
                break  # prefix emission: first invalid lane stops (TMLF:197-203)
            out[
                (
                    items[1],  # station_id
                    f"lane{i}",
                    i,
                    items[3],  # direction
                    items[2],  # freeway
                    items[0],  # recorded_timestamp
                    flow,
                    occ,
                    speed,
                    total_flow,
                    ts,
                )
            ] += 1
    return out


# field content: plain ints (incl. overflow-length), decimals/scientific,
# whitespace-padded numbers (the parseInt/cast divergence), empties, junk
_field = st.one_of(
    st.integers(-(10**12), 10**12).map(str),
    st.integers(-(2**31) - 5, -(2**31) + 5).map(str),  # int32 boundary
    st.integers(2**31 - 5, 2**31 + 5).map(str),
    st.floats(
        allow_nan=False, allow_infinity=False, width=32
    ).map(lambda x: f"{x!r}"),
    st.from_regex(r"[+-]?[0-9]{1,6}\.[0-9]{1,6}", fullmatch=True),
    st.from_regex(r" ?[0-9]{1,4} ?", fullmatch=True),  # padded: int invalid, double valid
    st.sampled_from(["", "x", "abc", "1.2.3", "+", "-", "12a", "a12", "0.5"]),
)

_ts_field = st.one_of(
    st.datetimes(
        min_value=datetime.datetime(1990, 1, 1),
        max_value=datetime.datetime(2030, 12, 31),
    ).map(lambda d: d.strftime(TS_FMT)),
    st.sampled_from(["not a date", "", "13/45/2010 99:99:99", "01/02/2010"]),
)

_line = st.builds(
    lambda ts, fields, pad: ",".join([ts] + fields + [""] * pad),
    ts=_ts_field,
    fields=st.lists(_field, min_size=40, max_size=60),
    pad=st.integers(0, 3),  # trailing commas: the Java-split edge
)

_lines = st.lists(
    st.one_of(
        _line,
        st.just("Timestamp,Station,header"),
        st.just(""),
        st.just("short,line"),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_lines)
def test_spark_parse_equals_reference_model(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value STRING")
    got = Counter(
        (
            r["station_id"],
            r["lane"],
            r["lane_idx"],
            r["direction"],
            r["freeway"],
            r["recorded_timestamp"],
            r["lane_flow"],
            r["lane_avg_occ"],
            r["lane_avg_speed"],
            r["total_flow"],
            r["event_ts"],
        )
        for r in extract_flow_info(filter_header_and_empties(df)).collect()
    )
    assert got == model_extract(lines)
