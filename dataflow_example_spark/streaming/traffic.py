"""Streaming TrafficMaxLaneFlow (SURVEY.md §3.2).

The reference's streaming entry is the same dataflow graph as batch with a
Pub/Sub source substituted for the file source (TrafficMaxLaneFlow.java:
374-382) and event time taken from the Pub/Sub publish timestamp because
the reader configures no timestamp attribute (TrafficMaxLaneFlow.java:
378-379; SURVEY.md §2.5). Here the unbounded source is the file-drop
directory fed by ``sources.injector`` and event time is the source ingest
timestamp — same asymmetry, same opt-in fix
(``TrafficConfig.streaming_honor_payload_timestamp``).

Spark-specific choices (the reference left these to the Dataflow runner):

- ``withWatermark`` is mandatory for append-mode window aggregation; the
  bound is ``TrafficConfig.watermark_delay`` (default 10 minutes,
  documented deviation — Beam default allowed-lateness is 0 with a
  runner-managed watermark).
- The aggregation runs as ONE stateful groupBy over the windowed fan-out
  (``max_lane_flow`` disables the batch two-phase plan in streaming:
  chained stateful aggregations are not generally supported). State is
  bounded by watermark: ~(duration/slide) live windows per station.
- Checkpointing gives exactly-once file-source processing — a strict
  upgrade over the reference's at-least-once injection
  (PubsubFileInjector.java:37-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import TrafficConfig
from ..operators.traffic import traffic_pipeline
from ..sources.text import stream_text


def traffic_stream(
    spark: SparkSession,
    topic_dir: str,
    config: TrafficConfig | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded file-drop source -> the shared traffic transform.

    Returns the streaming result DataFrame (10-column output schema,
    identical to batch — the §1.4 unified-model contract).
    """
    if config is None:
        config = TrafficConfig(streaming=True)
    lines = stream_text(
        spark,
        topic_dir,
        include_ingest_ts=True,
        max_files_per_trigger=max_files_per_trigger,
    )
    # observability: per-micro-batch input line count + header/short-line
    # reject count, surfaced in every StreamingQueryProgress event
    # ("observedMetrics" -> "traffic_input") without a second pass —
    # the accumulator-style job metrics the reference gets from the
    # Dataflow monitoring UI (SURVEY.md §4.1).
    from pyspark.sql import functions as F

    lines = lines.observe(
        "traffic_input",
        F.count(F.lit(1)).alias("n_lines"),
        F.coalesce(
            F.sum(
                (
                    (F.length("value") == 0)
                    | F.col("value").startswith("Timestamp")
                ).cast("long")
            ),
            F.lit(0),  # zero-row micro-batches report 0, not NULL
        ).alias("n_header_or_empty"),
    )
    return traffic_pipeline(lines, config, ingest_ts_col="ingest_ts")


def run_traffic_stream_with_quarantine(
    spark: SparkSession,
    topic_dir: str,
    output_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    config: TrafficConfig | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Dual-output ingestion: each micro-batch forks once — parseable
    lines run the full traffic pipeline into ``output_dir``, rejected
    lines land in ``quarantine_dir`` with their reason
    (operators.traffic.traffic_quarantine). One foreachBatch query, one
    source read, both writes idempotent per batch_id — replays replace
    their own output, so the fork keeps exactly-once on both sides.
    """
    from ..operators.traffic import traffic_pipeline as _pipe
    from ..operators.traffic import traffic_quarantine

    if config is None:
        config = TrafficConfig(streaming=True)
    # batch-mode transforms inside foreachBatch: disable streaming-only
    # paths (each micro-batch is a bounded DataFrame)
    batch_cfg = TrafficConfig(
        window_duration_minutes=config.window_duration_minutes,
        window_slide_minutes=config.window_slide_minutes,
        streaming=False,
    )
    lines = stream_text(spark, topic_dir, include_ingest_ts=False)

    def fork(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            _pipe(batch_df, batch_cfg).write.mode("overwrite").parquet(
                f"{output_dir}/batch_id={batch_id}"
            )
            traffic_quarantine(batch_df).write.mode("overwrite").parquet(
                f"{quarantine_dir}/batch_id={batch_id}"
            )
        finally:
            batch_df.unpersist()

    writer = lines.writeStream.foreachBatch(fork).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_traffic_stream(
    spark: SparkSession,
    topic_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config: TrafficConfig | None = None,
    available_now: bool = False,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Start the streaming query with a parquet sink (the BigQuery-sink
    stand-in, SURVEY.md §2 op 4) in append mode.

    ``available_now=True`` drains everything currently in the drop
    directory and finishes — the replay/backfill mode; otherwise the query
    runs until cancelled like the reference job (SURVEY.md §3.2).
    """
    out = traffic_stream(spark, topic_dir, config)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
