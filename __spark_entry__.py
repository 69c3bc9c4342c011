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
# round. Round-10 ordering (registry FROZEN at 238; cumulatively
# driver-green since r8): the SURVEY §2 reference core stays pinned first
# (a fresh driver row for every reference operator each round), then 42
# backfill slots re-sampling the longest-unsampled entries — the
# freshness rotation VERDICT r8 item 3 / r9 item 3 prescribe (oldest
# rows were r4-era; after this window nothing is older than round 6).
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
    # r10 rotation: the 42 longest-unsampled entries (23 last seen r4,
    # 19 last seen r5; registry order within each age class — computed
    # from CORRECTNESS_r01..r09 keys). After this window no registry
    # entry's latest driver row is older than round 6.
    "q7_volume_shipping",
    "q13_customer_order_distribution",
    "q16_parts_never_ordered",
    "q22_idle_rich_customers",
    "q18_large_volume_customers",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q8_market_share",
    "distinct_order_priorities",
    "set_ops_customer_cohorts",
    "events_sessionize_dynamic",
    "events_top_types_sketch",
    "events_funnel",
    "grouping_sets_revenue",
    "events_lead_lag_ntile",
    "rollup_revenue",
    "top_customers_per_nation",
    "events_column_profile",
    "orders_month_gapfill",
    "lineitem_corr_stats",
    "docs_split_decontamination",
    "text_repetition_filter",
    "text_pii_redact",
    "docs_mix_weights",
    "text_unigram_logprob",
    "docs_token_budget_plan",
    "events_winsorize",
    "docs_source_vocab_overlap",
    "docs_cap_per_source",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q20_promo_part_suppliers",
    "q21_late_suppliers",
    "streaming_dedup_parity",
    "dedup_clusters_star",
    "dedup_minhash_lsh_capped",
    "docs_pack_bins",
    "events_session_funnel_windowed",
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
