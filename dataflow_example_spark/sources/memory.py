"""In-memory source (SURVEY.md §2 op 5): ``Create.of(...)``
(StarterPipeline.java:53) -> ``spark.createDataFrame``."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def create_strings(spark: SparkSession, elements: Iterable[str]) -> DataFrame:
    """Materialize literal strings as a single-column DataFrame."""
    return spark.createDataFrame([(e,) for e in elements], "value string")
