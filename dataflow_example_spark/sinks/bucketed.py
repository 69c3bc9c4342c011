"""Bucketed-table sink: the co-located join path (SURVEY.md §4.3 —
"minimize shuffles" at the storage layer).

Writing a fact table bucketed (and sorted) by its join key materializes
the hash partitioning: a later join between two tables bucketed the same
way needs NO Exchange on either side — at 100 TB that deletes the
dominant cost of every recurring fact-fact join (the repeated shuffle of
the big table) in exchange for one-time write cost. The round-trip is
asserted shuffle-free in tests/test_sinks.py.

Spark specifics: bucketing requires ``saveAsTable`` (the bucket metadata
lives in the session catalog); plain ``parquet(path)`` writes would lose
it. Reads must come from ``spark.table(name)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table in
    the session catalog. ``num_buckets`` should match the downstream
    join's parallelism needs — both sides of a co-located join must use
    the same bucket count and columns. ``path`` makes it an external
    table (data at the given location, bucket spec still in the
    catalog) — use when the warehouse dir is not writable."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)
