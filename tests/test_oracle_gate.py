"""Self-tests for the strict oracle gate (tools/check_oracles.py):
the gate must actually FAIL on each drift class it claims to catch —
a gate that silently passes bad comparisons guards nothing."""

from __future__ import annotations

import datetime

import pyarrow as pa

from tools.check_oracles import canon, compare


def _tbl(**cols):
    return pa.table(cols)


def test_gate_rejects_null_vs_nan():
    a = _tbl(x=pa.array([1.0, None], type=pa.float64()))
    b = _tbl(x=pa.array([1.0, float("nan")], type=pa.float64()))
    assert compare(a, b)  # non-empty problem list
    assert not compare(a, a)


def test_gate_rejects_int_vs_float():
    a = _tbl(x=pa.array([7], type=pa.int64()))
    b = _tbl(x=pa.array([7.0], type=pa.float64()))
    assert compare(a, b)


def test_gate_rejects_value_drift_but_tolerates_last_ulp():
    base = 0.1 + 0.2  # 0.30000000000000004
    a = _tbl(x=pa.array([base]))
    b = _tbl(x=pa.array([0.3]))  # differs at the 17th digit only
    assert not compare(a, b)  # 12-sig-digit canon: last-ulp noise passes
    c = _tbl(x=pa.array([base * 1.000001]))  # real drift
    assert compare(a, c)


def test_gate_normalizes_tz_aware_to_naive_utc():
    naive = datetime.datetime(2024, 1, 1, 12, 0, 0)
    aware = naive.replace(tzinfo=datetime.timezone.utc)
    assert canon(naive) == canon(aware)
    a = _tbl(t=pa.array([naive], type=pa.timestamp("us")))
    b = _tbl(t=pa.array([aware], type=pa.timestamp("us", tz="UTC")))
    assert not compare(a, b)
    # a genuinely different instant still fails
    other = naive + datetime.timedelta(seconds=1)
    c = _tbl(t=pa.array([other], type=pa.timestamp("us")))
    assert compare(a, c)


def test_gate_rejects_row_count_and_schema_drift():
    a = _tbl(x=pa.array([1, 2]))
    assert compare(a, _tbl(x=pa.array([1])))
    assert compare(a, _tbl(y=pa.array([1, 2])))
