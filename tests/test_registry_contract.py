"""Registry invariants the driver contract depends on."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry

# queries that deliberately ship without an oracle (sketch outputs differ
# across engines); everything else must be oracle-backed
ORACLE_EXEMPT = {"events_approx_distinct", "events_approx_percentiles"}


def test_every_query_has_oracle_or_documented_exemption():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = set(qs) - set(osql) - ORACLE_EXEMPT
    assert not missing, f"queries without oracle or exemption: {sorted(missing)}"


def test_oracles_reference_existing_queries():
    # Compare the raw ORACLES dict, not entry.oracle_sql(): the entry
    # adapter filters to registry names, which would make this test
    # tautological (a typo'd oracle key could never surface through it).
    from dataflow_example_spark import oracles as _oracles
    from dataflow_example_spark import queries as _queries

    orphans = set(_oracles.ORACLES) - set(_queries.QUERIES)
    assert not orphans, f"oracles without a query: {sorted(orphans)}"


def test_driver_sample_window_is_fully_oracle_backed():
    """The driver verifies the first 50 registry entries; every one must
    have an oracle except the two deliberately oracle-free sketch queries
    (approx_distinct / approx_percentiles — sketch internals differ across
    engines; round 5 rotates them into the window for their rows-only
    driver check)."""
    ORACLE_FREE = {"events_approx_distinct", "events_approx_percentiles"}
    qs, osql = entry.queries(), entry.oracle_sql()
    first50 = list(qs)[:50]
    unbacked = [n for n in first50 if n not in osql and n not in ORACLE_FREE]
    assert not unbacked, f"first-50 entries without oracle: {unbacked}"


def test_registry_names_unique_and_stable():
    qs = entry.queries()
    assert len(qs) == len(set(qs))
    # the SURVEY §2 reference core must stay inside the sampled window
    core = {
        "starter_pipeline",
        "traffic_lane_info",
        "traffic_max_lane_flow",
        "traffic_max_lane_flow_tumbling",
    }
    assert core <= set(list(qs)[:50])
