"""Pins for tables.dim_bcast — the size-gated broadcast hint on
SF-scaling dimension tables (r11).

The contract: at or under DIM_BCAST_MAX_BYTES the hint is applied (the
test-scale plan is byte-identical to the historical always-hint plan —
verified against captured sf0.01 plans when the change landed); over
the threshold, or when size can't be determined, the input frame is
returned UNTOUCHED so cost-based planning + AQE decide. Gating the
hint must never change values — pinned end-to-end on q5, the deepest
star join.
"""

from __future__ import annotations

from dataflow_example_spark import tables
from dataflow_example_spark.queries import QUERIES
from dataflow_example_spark.tables import dim_bcast, load, table_bytes

SF = "/root/testdata/sf0.001"


def test_table_bytes_known_and_unknown():
    assert table_bytes(SF, "customer") > 0
    assert table_bytes("/nonexistent/dir", "customer") == -1


def test_hint_applied_under_threshold(spark):
    c = load(spark, SF, "customer")
    hinted = dim_bcast(c, SF, "customer")
    assert hinted is not c
    # the hint is visible in the analyzed plan
    assert "broadcast" in hinted._jdf.queryExecution().analyzed().toString().lower()


def test_hint_skipped_over_threshold_and_on_unknown_size(spark, monkeypatch):
    c = load(spark, SF, "customer")
    monkeypatch.setattr(tables, "DIM_BCAST_MAX_BYTES", 0)
    assert dim_bcast(c, SF, "customer") is c
    monkeypatch.undo()
    # unknown size (remote/object-store path): conservative, no hint
    assert dim_bcast(c, "/nonexistent/dir", "customer") is c


def test_gating_never_changes_values(spark, monkeypatch):
    """q5 (six-table star join through three gated dims) returns the
    same rows whether the dims are hinted or left to the planner."""
    hinted = sorted(map(tuple, QUERIES["q5_local_supplier_volume"](spark, SF).collect()))
    monkeypatch.setattr(tables, "DIM_BCAST_MAX_BYTES", -1)
    unhinted = sorted(map(tuple, QUERIES["q5_local_supplier_volume"](spark, SF).collect()))
    assert hinted == unhinted
    assert len(hinted) > 0

def test_size_hint_restores_broadcast_for_filtered_subset(spark, monkeypatch):
    """A caller-supplied subset estimate re-enables the hint when the
    whole-table proxy is over the threshold (ADVICE r11), but can only
    LOWER the gated size — a huge hint never forces a broadcast."""
    c = load(spark, SF, "customer")
    sub = c.filter(c.c_mktsegment == "BUILDING").select("c_custkey")
    monkeypatch.setattr(tables, "DIM_BCAST_MAX_BYTES", 0)
    # whole-table proxy over threshold -> no hint...
    assert dim_bcast(sub, SF, "customer") is sub
    # ...unless the caller certifies the filtered subset is tiny
    hinted = dim_bcast(sub, SF, "customer", size_hint_bytes=0)
    assert hinted is not sub
    # a hint ABOVE the threshold doesn't force anything
    assert dim_bcast(sub, SF, "customer", size_hint_bytes=10**12) is sub
    monkeypatch.undo()
    # unknown table size + trusted small hint -> hint applies
    assert (
        dim_bcast(sub, "/nonexistent/dir", "customer", size_hint_bytes=1024)
        is not sub
    )
