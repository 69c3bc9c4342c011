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


def run_dedup_stream(
    spark,
    topic_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 day",
    select_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Drain a parquet file-drop topic through ``dedup_stream`` into a
    parquet sink (append mode, checkpointed = exactly-once). Mirrors
    ``streaming.traffic.run_traffic_stream`` for the dedup family;
    ``select_cols`` projects the emitted row to columns functionally
    dependent on the dedup key so replays and batch order cannot change
    the result."""
    stream = spark.readStream.schema(schema).parquet(topic_dir)
    out = dedup_stream(
        stream, text_col=text_col, ts_col=ts_col, watermark=watermark
    )
    if select_cols:
        out = out.select(*select_cols)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
