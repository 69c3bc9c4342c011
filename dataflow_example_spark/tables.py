"""Loaders for the driver-generated parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
        # generations and TIMESTAMP(MICROS) in others, so branch on the
        # loaded dtype rather than assuming either:
        #   - long (nanosAsLong in effect): truncate nanos -> micros, the
        #     same coercion DuckDB applies for TIMESTAMP_NS, so oracle
        #     comparisons stay exact.
        #   - timestamp_ntz (micros, isAdjustedToUTC=false): cast to the
        #     session-zone TIMESTAMP. The session zone is pinned to UTC
        #     (session.py), so the wall-clock values are unchanged and match
        #     DuckDB's naive reading.
        #   - timestamp: pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


# Explicit F.broadcast on an SF-SCALING table (customer/supplier/part —
# TPC-H sizes them proportional to scale factor, unlike the constant
# region/nation) is a 100 TB hazard: the hint overrides every planner
# size check, so a table that is 300 KB at sf0.1 but ~1.5 TB at
# warehouse scale (customer at SF~100k) would be built as an
# executor-resident hash relation and OOM the build. `dim_bcast` gates
# the hint on the table's actual on-disk size: at or under the
# threshold the emitted plan is byte-identical to the always-hint plan
# (verified against captured plans at sf0.01 when this landed); over
# it — or when the size cannot be determined (non-local storage) — the
# join is left to cost-based planning plus AQE's runtime join-strategy
# conversion, which still broadcasts when post-filter stats turn out
# small and otherwise shuffles. The default mirrors the SCALE.md
# cluster recipe's bumped autoBroadcastJoinThreshold (128 MB of
# parquet; the in-memory relation is larger after decompression, which
# is why the recipe pairs it with big executors).
DIM_BCAST_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_DIM_BCAST_MAX", str(128 * 1024 * 1024))
)


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a table's parquet (file or directory), -1 when
    it cannot be determined locally (remote/object-store paths)."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        return os.path.getsize(path)
    except OSError:
        return -1


def dim_bcast(
    df: DataFrame,
    sf_dir: str,
    name: str,
    size_hint_bytes: int | None = None,
) -> DataFrame:
    """Size-gated broadcast hint for joins against an SF-scaling
    dimension table (or a projection/filter of one — the whole table's
    size is the conservative proxy for any subset of it).

    ``size_hint_bytes``: callers passing a heavily FILTERED projection
    (e.g. one brand's partkeys) may supply their own estimate of the
    subset's bytes; the gate then uses min(table size, hint), so a tiny
    filtered dim keeps its guaranteed-broadcast plan even when the whole
    table sits over the threshold (ADVICE r11: near the threshold the
    conservative whole-table proxy otherwise hands the join to AQE's
    runtime conversion). When the table's size is KNOWN, the hint only
    ever LOWERS the gated size — it cannot force a broadcast past the
    threshold. When the table size is UNKNOWN (``table_bytes`` returns
    -1: missing/unreadable path), the hint is trusted alone — there is
    no conservative proxy backing it, so callers must only pass hints
    derived from a real bound (a construction-bounded frame or a
    measured subset), never a guess; with no hint an unknown-size table
    is NOT broadcast (fail-safe)."""
    size = table_bytes(sf_dir, name)
    if size_hint_bytes is not None and size_hint_bytes >= 0:
        size = size_hint_bytes if size < 0 else min(size, size_hint_bytes)
    if 0 <= size <= DIM_BCAST_MAX_BYTES:
        return F.broadcast(df)
    return df
