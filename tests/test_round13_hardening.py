"""Round-13 hardening pins (VERDICT r12 asklist + ADVICE r12 lows)."""

from __future__ import annotations

import pytest

from dataflow_example_spark.synth import pems_line


def test_pems_line_rejects_sub_49_fields():
    """ADVICE r12: silently clamping n_fields to 49 would turn a
    negative-test fixture asking for a short (invalid) line into a valid
    one — the builder must fail loudly instead."""
    with pytest.raises(ValueError, match="49"):
        pems_line("01/01/2010 00:00:00", "S1", flow=1, n_fields=48)
    # the valid path is unchanged
    line = pems_line("01/01/2010 00:00:00", "S1", flow=7, n_fields=52)
    assert line.count(",") == 51
