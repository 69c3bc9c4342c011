"""Falsifiable accuracy checks for the two sketch-backed aggregates
(VERDICT r11 item 6).

The registry queries (events_approx_distinct / events_approx_percentiles)
already hash-match DuckDB oracles by emitting exact values plus an
in-plan bound assertion — but that assertion compares Spark's sketch to
Spark's OWN exact aggregate. This test closes the remaining gap: the raw
sketch outputs are compared against exact values computed INDEPENDENTLY
by DuckDB, with tolerances taken from each sketch family's published
guarantee rather than the registry's ad-hoc 5%:

- HyperLogLog++ (approx_count_distinct, rsd=0.02): rsd is the target
  relative standard deviation; the test allows 3*rsd = 6% (a >3-sigma
  miss would indicate a broken sketch, not noise), with a 2-count
  absolute floor for tiny groups (sparse mode is near-exact there).
- approx_percentile (Greenwald-Khanna style, accuracy=1000): the
  published contract is a RANK guarantee — the returned value's rank is
  within eps*N of ceil(p*N), eps = 1/accuracy. The test converts that to
  value bounds by reading the exact values at ranks (p +- eps)*N from
  DuckDB's sorted column, which is the guarantee itself, not a derived
  value-space heuristic.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
EVENTS = f"{SF}/events.parquet"

RSD = 0.02
ACCURACY = 1000
PCTS = (0.5, 0.9)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{EVENTS}')"
    )
    yield con
    con.close()


def test_hll_estimate_within_published_rsd(spark, duck):
    from dataflow_example_spark.tables import load

    got = {
        r["event_type"]: r["n_approx"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=RSD).alias("n_approx"))
        .collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact) and len(got) > 0
    for et, n_exact in exact.items():
        tol = max(2.0, 3 * RSD * n_exact)
        assert abs(got[et] - n_exact) <= tol, (
            et, got[et], n_exact, tol,
        )


def test_percentile_approx_within_published_rank_bound(spark, duck):
    from dataflow_example_spark.tables import load

    aggs = [
        F.percentile_approx(
            F.col("value").cast("double"), F.lit(p), F.lit(ACCURACY)
        ).alias(f"p{int(p * 100)}")
        for p in PCTS
    ]
    got = {
        r["event_type"]: r
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(*aggs)
        .collect()
    }
    eps = 1.0 / ACCURACY
    for p in PCTS:
        # exact values at the rank window (p +- eps): the GK contract says
        # the estimate's rank lies inside it, so its VALUE must lie between
        # the sorted column's values at the window edges (value is
        # monotone in rank). +-1 row of slack absorbs the ceil/floor
        # convention difference between engines.
        rows = duck.execute(
            f"""
            WITH s AS (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value) AS rk,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events WHERE value IS NOT NULL
            )
            SELECT event_type,
                   max(CASE WHEN rk = greatest(1, least(n,
                       CAST(floor(({p} - {eps}) * n) AS BIGINT) - 1))
                       THEN value END) AS lo,
                   max(CASE WHEN rk = greatest(1, least(n,
                       CAST(ceil(({p} + {eps}) * n) AS BIGINT) + 1))
                       THEN value END) AS hi
            FROM s GROUP BY 1
            """
        ).fetchall()
        assert rows
        for et, lo, hi in rows:
            v = got[et][f"p{int(p * 100)}"]
            assert v is not None and math.isfinite(v)
            assert float(lo) <= v <= float(hi), (et, p, v, lo, hi)
