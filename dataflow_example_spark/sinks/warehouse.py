"""Warehouse sink with idempotent setup (BigQuery-sink parity).

The reference prepares its BigQuery output before running: create the
dataset/table if absent, and *fail fast* if a table already exists with a
different schema (DataflowExampleUtils.java:187-228; the schema-must-match
check is DataflowExampleUtils.java:221-227). The Spark-native equivalent
is a parquet (or any Spark-writable) table path with the same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SchemaMismatchError(RuntimeError):
    """Existing sink table schema differs from the declared schema
    (DataflowExampleUtils.java:221-227 raises in the same situation)."""


def _comparable(schema: StructType) -> list[tuple[str, str]]:
    # nullability is not load-bearing for sink compatibility (parquet
    # round-trips relax it); names + types are.
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def setup_sink_table(
    spark: SparkSession, path: str, schema: StructType
) -> None:
    """Idempotently prepare ``path`` as a sink with ``schema``.

    - absent -> create an empty parquet table with the schema
      (DataflowExampleUtils.java:213-219 "create table if needed").
    - present with matching schema -> no-op (DEU:220 "already exists").
    - present with different schema -> :class:`SchemaMismatchError`.
    """
    try:
        existing = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — path absent / not yet a table
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)
        return
    if _comparable(existing.schema) != _comparable(schema):
        raise SchemaMismatchError(
            f"sink {path!r} exists with schema "
            f"{existing.schema.simpleString()}, expected {schema.simpleString()}"
        )


def write_table(df: DataFrame, path: str, mode: str = "append") -> None:
    """Batch write after a :func:`setup_sink_table`-style check against
    the DataFrame's own schema (BigQueryIO.write parity,
    TrafficMaxLaneFlow.java:396)."""
    setup_sink_table(df.sparkSession, path, df.schema)
    df.write.mode(mode).parquet(path)
