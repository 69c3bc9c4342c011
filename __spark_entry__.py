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
# round. Round-14 ordering (registry FROZEN at 238; cumulatively
# driver-green since r8): the SURVEY §2 reference core stays pinned first
# (a fresh driver row for every reference operator each round), then 42
# backfill slots re-sampling the longest-unsampled entries — the
# freshness rotation VERDICT r8..r13 prescribe. The r13 window refreshed
# the remaining 20 r7-era entries (carried over in the r12 window's
# alphabetical tie-break order) plus the 22 oldest r8-era entries
# (registry order); this window takes the 20 r8-era entries whose only
# driver row is round 8, then the 22 oldest r9-era entries (both lists
# verbatim from COVERAGE.md "r14 rotation handoff", registry order
# within each age class). After this window the oldest remaining driver
# evidence is round 9.
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
    # r14 rotation, part 1: the 20 r8-era entries whose only driver row
    # is round 8 (COVERAGE.md "r14 rotation handoff" / VERDICT r13 item 1).
    "events_hourly_profile_similarity",
    "emb_centroid_drift",
    "ri_check_report",
    "lineitem_linenumber_integrity",
    "events_error_pchart",
    "docs_dup_shardability",
    "events_lorenz_concentration",
    "docs_fingerprint_collision_rate",
    "supplier_portfolio_breadth",
    "events_session_type_lift",
    "events_churn_risk",
    "orders_cohort_repeat",
    "events_user_icc",
    "orders_month_seasonal_index",
    "lineitem_ship_lag_profile",
    "events_first_session_conversion",
    "orders_status_year_matrix",
    "emb_1nn_label_consistency",
    "orders_basket_size_trend",
    "supplier_quartile_mobility",
    # r14 rotation, part 2: the 22 oldest r9-era entries (registry
    # order). The remaining r9-era entries are the r15 handoff
    # (COVERAGE.md).
    "text_salient_terms",
    "text_vocab_top_terms",
    "docs_hash_sample",
    "docs_train_test_split",
    "docs_stratified_sample",
    "events_pivot_by_type",
    "lineitem_unpivot_measures",
    "part_price_histogram",
    "docs_source_domains",
    "supplier_name_near_dups",
    "nation_segments_agg",
    "docs_curation_pipeline",
    "orders_monthly_growth",
    "docs_pack_budget",
    "emb_label_centroids",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "mm_media_metadata",
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
