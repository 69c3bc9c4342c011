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
# round. Round-9 ordering (registry FROZEN at 238; cumulative driver-green
# coverage reached 238/238 when round 8 drained the tail): the SURVEY §2
# reference core stays pinned first (a fresh driver row for every
# reference operator each round), then 42 backfill slots re-sampling the
# longest-unsampled entries — the freshness rotation VERDICT r8 item 3
# prescribes (oldest rows were r3-era; after this window nothing is older
# than ~5 rounds).
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
    # r9 backfill: the 42 longest-unsampled entries (23 last seen r3,
    # 19 last seen r4; registry order within each age class — computed
    # from CORRECTNESS_r01..r08 keys). After this window no registry
    # entry's latest driver row is older than round 5.
    "text_salient_terms",
    "docs_hash_sample",
    "docs_train_test_split",
    "docs_stratified_sample",
    "events_pivot_by_type",
    "lineitem_unpivot_measures",
    "part_price_histogram",
    "supplier_name_near_dups",
    "nation_segments_agg",
    "orders_monthly_growth",
    "emb_label_centroids",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "mm_media_metadata",
    "mm_frame_sample",
    "mm_decode_fake",
    "mm_extract_features",
    "events_user_stats",
    "events_user_zscore",
    "text_vocab_top_terms",
    "docs_source_domains",
    "docs_curation_pipeline",
    "docs_pack_budget",
    "events_variant_props",
    "text_bpe_tokens",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_lsh_near_dup",
    "emb_center_by_label",
    "sim_semantic_dedup_clusters",
    "sim_kmeans_assign",
    "sim_embedding_near_dup",
    "events_throttle",
    "events_asof_join",
    "events_range_join",
    "q6_forecast_revenue",
    "q4_late_shipment_priority",
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
