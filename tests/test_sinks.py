"""Sink setup semantics (DataflowExampleUtils.java:187-228 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dataflow_example_spark.sinks import (
    SchemaMismatchError,
    setup_sink_table,
    write_table,
)

SCHEMA = StructType(
    [
        StructField("station_id", StringType()),
        StructField("flow", IntegerType()),
    ]
)
OTHER = StructType([StructField("station_id", StringType())])


def test_setup_creates_then_noops(spark, tmp_path):
    path = str(tmp_path / "sink")
    setup_sink_table(spark, path, SCHEMA)
    assert spark.read.parquet(path).count() == 0
    setup_sink_table(spark, path, SCHEMA)  # idempotent


def test_setup_rejects_schema_mismatch(spark, tmp_path):
    path = str(tmp_path / "sink")
    setup_sink_table(spark, path, SCHEMA)
    with pytest.raises(SchemaMismatchError):
        setup_sink_table(spark, path, OTHER)


def test_write_table_appends(spark, tmp_path):
    path = str(tmp_path / "sink")
    df = spark.createDataFrame([("S001", 1)], SCHEMA)
    write_table(df, path)
    write_table(df, path)
    assert spark.read.parquet(path).count() == 2
