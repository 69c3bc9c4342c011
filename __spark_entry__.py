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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    beyond-reference operators)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in _queries.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    return dict(_oracles.ORACLES)
