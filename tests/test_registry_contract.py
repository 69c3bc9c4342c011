"""Registry invariants the driver contract depends on."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry

# Round 6: the sketch queries gained bound-assertion oracles (Spark
# emits within-tolerance booleans, the oracle asserts literal TRUE), so
# every registry query is now oracle-backed.
ORACLE_EXEMPT: set[str] = set()


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
    have an oracle (round 6: the former oracle-free sketch queries now
    carry bound-assertion oracles)."""
    qs, osql = entry.queries(), entry.oracle_sql()
    first50 = list(qs)[:50]
    unbacked = [n for n in first50 if n not in osql]
    assert not unbacked, f"first-50 entries without oracle: {unbacked}"


# Streaming-parity / ingest queries execute on construction (they drain
# a stream into a sink and return the sink read); their outputs are
# parquet reads of atomic columns, asserted by their own tests. Excluded
# here so the schema sweep stays lazy (analysis only, no jobs).
_EXECUTES_ON_BUILD = {
    "streaming_traffic_parity",
    "streaming_dedup_parity",
    "streaming_sliding_parity",
    "streaming_join_parity",
    "streaming_session_parity",
    "streaming_enrich_parity",
    "docs_jsonl_ingest",
}


def test_no_query_returns_non_atomic_columns(spark):
    """Driver contract (round-5 lesson): the driver canonicalizer sorts
    result rows through pandas, which cannot hash ndarray/dict cells —
    an array- or map-typed output column is a guaranteed driver err even
    when the local pyarrow gate passes. Every registry query must emit
    only atomic columns (serialize vectors with to_json/concat_ws)."""
    from dataflow_example_spark import queries as _queries
    from dataflow_example_spark.functions import cachereg
    from tests.conftest import SF_SMOKE

    offenders = []
    try:
        for name, fn in _queries.QUERIES.items():
            if name in _EXECUTES_ON_BUILD:
                continue
            df = fn(spark, SF_SMOKE)
            for f in df.schema.fields:
                t = f.dataType.simpleString()
                if t.startswith(("array", "map", "struct")):
                    offenders.append((name, f.name, t))
    finally:
        # constructing ~231 queries registers hundreds of persisted
        # frames / scratch dirs via cachereg; release them so the shared
        # spark fixture doesn't carry them into the rest of the session
        cachereg.cleanup()
        spark.catalog.clearCache()
    assert not offenders, f"non-atomic output columns: {offenders}"


def test_plan_audit_covers_whole_registry():
    """Every registry query carries plan-audit rules (at least codegen,
    plus no_bnl unless its plan's BNL is a documented constant-width
    broadcast) — except the streaming-parity/E2E queries whose physical
    plan is just a sink read (PLAN_AUDIT_EXEMPT). This is the rule set
    that would have flagged the round-5 unpartitioned-window family."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from tools.plan_audit import AUDITS, BATCH_EQUIVALENTS, PLAN_AUDIT_EXEMPT

    from dataflow_example_spark import queries as _queries

    uncovered = [
        n
        for n in _queries.QUERIES
        if n not in AUDITS
        and n not in BATCH_EQUIVALENTS
        and n not in PLAN_AUDIT_EXEMPT
    ]
    assert not uncovered, f"queries without plan-audit rules: {uncovered}"
    # round 7: every former exemption now audits its batch-leg transform
    assert not PLAN_AUDIT_EXEMPT
    for name, rules in AUDITS.items():
        assert "codegen" in rules or "no_bnl" in rules or "partial" in rules, name
    for name, (_, rules) in BATCH_EQUIVALENTS.items():
        assert "codegen" in rules, name


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


def test_sample_first_names_all_exist():
    """A typo in the rotation list would KeyError inside the driver's
    queries() call — the worst possible failure mode (zero rows for the
    whole round). Pin every pinned name to a real registry entry."""
    from dataflow_example_spark import queries as _queries

    missing = [n for n in entry._SAMPLE_FIRST if n not in _queries.QUERIES]
    assert not missing, f"_SAMPLE_FIRST names not in registry: {missing}"
    assert len(entry._SAMPLE_FIRST) == len(set(entry._SAMPLE_FIRST))
    assert len(entry._SAMPLE_FIRST) == 50


def test_cachereg_cleanup_releases_scratch(tmp_path):
    """cleanup() deletes registered scratch dirs and tolerates repeats."""
    import os

    from dataflow_example_spark.functions import cachereg

    d = cachereg.scratch_dir("dfx_test_")
    assert os.path.isdir(d)
    cachereg.cleanup()
    assert not os.path.exists(d)
    cachereg.cleanup()  # idempotent
