"""Text sources (SURVEY.md §2 ops 1-2).

Batch: ``TextIO.read().from(path)`` (TrafficMaxLaneFlow.java:381,
PubsubFileInjector.java:82) -> ``spark.read.text``.

Streaming: the reference's unbounded source is Pub/Sub
(TrafficMaxLaneFlow.java:375-379). OSS Spark has no Pub/Sub connector; the
engine's streaming source is a file-drop directory (each dropped file ~ a
batch of messages), which together with ``sources.injector`` reproduces the
injector -> topic -> subscriber loop with checkpointed exactly-once reads —
a strict upgrade over the reference's at-least-once injection
(PubsubFileInjector.java:37-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Batch text scan -> one ``value: string`` column per line."""
    return spark.read.text(path)


def stream_text(
    spark: SparkSession,
    directory: str,
    include_ingest_ts: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded text source over a drop directory.

    ``ingest_ts`` stands in for the Pub/Sub publish time the reference uses
    as streaming event time (SURVEY.md §2.5): the reader configures no
    timestamp attribute (TrafficMaxLaneFlow.java:378-379), so arrival time
    is the event time.
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.text(directory)
    if include_ingest_ts:
        df = df.withColumn("ingest_ts", F.current_timestamp())
    return df
