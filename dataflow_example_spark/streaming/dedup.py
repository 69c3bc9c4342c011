"""Streaming deduplication (the dedup north-star family's unbounded
variant): emit the first occurrence of each content fingerprint.

Idiomatic-Spark answer: ``dropDuplicatesWithinWatermark`` — state holds
one entry per distinct key seen within the watermark horizon and the
engine evicts expired keys itself. The fingerprint reuses the batch
family's contract (functions/dedup.py: md5 over the content), so batch
dedup and stream dedup agree on identity.

Scale notes: state is O(distinct keys per watermark window). For true
lifetime dedup (no horizon), dedupe downstream in batch (exact_dedup) —
unbounded streaming state is the anti-pattern, not the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per content fingerprint within the watermark
    horizon. Adds the ``content_md5`` fingerprint column."""
    return (
        df.withColumn("content_md5", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
