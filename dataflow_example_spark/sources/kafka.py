"""Kafka message-bus source (SURVEY.md §2 op 2 — the real-bus variant).

The reference's unbounded source is Pub/Sub (TrafficMaxLaneFlow.java:
375-379). The engine's test stand-in is the file-drop directory
(``sources.text.stream_text``); this module is the thin adapter a user
with an actual message bus swaps in: ``readStream.format("kafka")``
normalized to the SAME (value, ingest_ts) contract, so
``traffic_pipeline`` and every downstream operator run unchanged.

The Kafka connector jar (spark-sql-kafka) is not bundled with this
container's Spark; construction is lazy (nothing fails at import), and
callers/tests should skip when the DataSource is unavailable. At scale
the source parallelism is the topic's partition count — set
``minPartitions`` to fan a hot topic wider than its partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_available(spark: SparkSession) -> bool:
    """True iff the Kafka DataSource can be instantiated (connector jar on
    the classpath)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: E501
            "kafka", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    include_ingest_ts: bool = True,
    min_partitions: int | None = None,
) -> DataFrame:
    """Unbounded Kafka source -> the engine's text-line contract:
    ``value: string`` (UTF-8-decoded payload) plus ``ingest_ts`` (the
    broker append time — the Pub/Sub-publish-time analog the reference
    uses as streaming event time, TrafficMaxLaneFlow.java:378-379).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions is not None:
        reader = reader.option("minPartitions", min_partitions)
    df = reader.load()
    cols = [F.col("value").cast("string").alias("value")]
    if include_ingest_ts:
        # Kafka records carry the broker-assigned timestamp
        cols.append(F.col("timestamp").alias("ingest_ts"))
    return df.select(*cols)


def traffic_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    config=None,
):
    """The full streaming TrafficMaxLaneFlow graph over a Kafka topic —
    byte-for-byte the same transform as the file-drop variant
    (streaming.traffic_stream); only the source line differs.
    """
    from ..config import TrafficConfig
    from ..operators.traffic import traffic_pipeline

    if config is None:
        config = TrafficConfig(streaming=True)
    lines = stream_kafka(spark, bootstrap_servers, topic)
    return traffic_pipeline(lines, config, ingest_ts_col="ingest_ts")
