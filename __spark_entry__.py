"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``dataflow_example_spark.queries`` (Spark) and
``dataflow_example_spark.oracles`` (DuckDB SQL); this module is a thin
adapter so the registry grows without touching the contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataflow_example_spark import oracles as _oracles  # noqa: E402
from dataflow_example_spark import queries as _queries  # noqa: E402
from dataflow_example_spark.session import configure_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's full analytics graph (TrafficMaxLaneFlow.java:371-396):
    synthesized PeMS CSV -> parse/flatten -> 60min/1min sliding windows ->
    per-(window, station) max lane flow -> 10-column projection.
    """
    configure_session(spark)
    return _queries.QUERIES["traffic_max_lane_flow"](spark, SMOKE_SF_DIR)


# The driver's correctness gate samples the FIRST 50 registry entries per
# round. Round-13 ordering (registry FROZEN at 238; cumulatively
# driver-green since r8): the SURVEY §2 reference core stays pinned first
# (a fresh driver row for every reference operator each round), then 42
# backfill slots re-sampling the longest-unsampled entries — the
# freshness rotation VERDICT r8..r12 prescribe. The r12 window refreshed
# the 20 r6-stale entries plus the 22 alphabetically-first r7-era
# entries; this window takes the remaining 20 r7-era entries plus the 22
# oldest r8-era entries (registry order within each age class —
# recomputed from CORRECTNESS_r01..r12 keys). After this window the
# oldest remaining driver evidence is round 8 (20 entries), the r14
# handoff.
_SAMPLE_FIRST = [
    # reference core (SURVEY §2 ops 1, 5-13 + window variants; streaming
    # ops 2-4 proved by streaming_traffic_parity: injector -> file-drop
    # source -> watermarked tumbling agg -> parquet sink, availableNow
    # drain vs batch oracle)
    "starter_pipeline",
    "traffic_lane_info",
    "traffic_max_lane_flow",
    "traffic_max_lane_flow_tumbling",
    "events_tumbling_agg",
    "events_sliding_agg",
    "events_sessionize",
    "streaming_traffic_parity",
    # r13 rotation, part 1: the 20 r7-era entries whose only driver row
    # is round 7 (COVERAGE.md "r13 rotation handoff" / VERDICT r12 item 1).
    "events_multi_distinct_profile",
    "events_peak_concurrent_sessions",
    "events_sequence_violations",
    "events_session_duration_histogram",
    "events_top_minutes_with_ties",
    "events_trailing_hour_sum",
    "events_transition_entropy",
    "events_type_entropy",
    "events_user_lifecycle",
    "events_user_powerlaw_alpha",
    "events_value_benford",
    "events_weekend_ttest",
    "lineitem_brand_price_qty_corr",
    "lineitem_supplier_hhi",
    "orders_customer_lifetime",
    "orders_reorder_consistency",
    "orders_size_distribution",
    "sim_lsh_recall_eval",
    "supplier_acctbal_boxstats",
    "tables_row_counts",
    # r13 rotation, part 2: the 22 oldest r8-era entries (registry order
    # within the age class, recomputed from CORRECTNESS_r01..r12 keys).
    # The remaining 20 r8-era entries are the r14 handoff (COVERAGE.md).
    "events_salted_agg",
    "cube_order_stats",
    "events_running_sum",
    "events_value_percentiles",
    "events_json_props",
    "q14_promo_effect",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "text_token_stats",
    "text_language_id",
    "text_quality_score",
    "text_fingerprint",
    "text_chunks",
    "sql_interface",
    "part_type_hierarchy_stats",
    "docs_neardup_degree_distribution",
    "events_time_to_first_purchase",
    "orders_segment_priority_mix",
    "events_daily_drawdown",
    "docs_quality_length_matrix",
    "lineitem_returns_by_brand",
]


def _ordered_names() -> list[str]:
    return _SAMPLE_FIRST + [
        n for n in _queries.QUERIES if n not in _SAMPLE_FIRST
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    beyond-reference operators)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(_queries.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    return {
        n: _oracles.ORACLES[n]
        for n in _ordered_names()
        if n in _oracles.ORACLES
    }
