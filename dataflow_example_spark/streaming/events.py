"""Streaming legs of the events analytics family (beyond-reference;
the reference's only streaming op is the traffic source/sink pair,
TrafficMaxLaneFlow.java:375-379 — these extend the same unified
batch/streaming contract to sliding windows and stream-stream joins).

Both runners follow the file-drop-topic parity shape proven by
``streaming.traffic.run_traffic_stream``: a parquet topic directory is
drained under ``availableNow`` into a checkpointed parquet sink, and the
sink contents are compared against the batch definition by the driver's
DuckDB oracle — streaming correctness enters the correctness gate rather
than living only in pytest.

Scale notes:

- The sliding aggregate's state is one row per (open window, group key);
  the watermark evicts windows as event time passes them. Append mode
  emits a window exactly once, when the watermark crosses its end.
- The interval join's state is O(rate x interval) per side (the bucketed
  formulation of ``streaming.joins.stream_interval_join``); matches emit
  as soon as both rows have arrived (inner-join semantics do not wait on
  the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def sliding_agg_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked sliding-window count/sum per key — the unbounded twin
    of ``operators.windows.sliding_agg``. The sum goes through exact
    DECIMAL so emission order cannot perturb the float result."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def run_sliding_stream(
    spark,
    topic_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    available_now: bool = True,
):
    """Drain a parquet file-drop topic through ``sliding_agg_stream``
    into a parquet sink. With a zero watermark delay and payload event
    time, append mode emits exactly the windows whose end <= the final
    watermark (= max event time) — the subset the batch oracle computes.
    """
    stream = spark.readStream.schema(schema).parquet(topic_dir)
    out = sliding_agg_stream(stream)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def split_clicks_purchases(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the raw events relation into the (purchases, clicks) legs
    of the attribution join — shared by the stream runner and the
    plan-audit batch twin so the two can never drift."""
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return purchases, clicks


def click_purchase_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    interval_seconds: int = 1800,
    watermark: str = "1 day",
) -> DataFrame:
    """Every purchase pairs with the same user's clicks in the preceding
    ``interval_seconds`` — the ONE bucketed interval join
    (streaming.joins.stream_interval_join) with the user key named
    differently per side, so stream runner, batch leg, and plan audit
    all execute the same operator. Pure transform: streaming inputs get
    a bounded-state stream-stream join, batch inputs the same plan with
    the watermarks elided."""
    from .joins import stream_interval_join

    return stream_interval_join(
        purchases,
        "purchase_ts",
        clicks,
        "click_ts",
        interval_seconds=interval_seconds,
        keys=[("user_id", "c_user_id")],
        watermark=watermark,
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        "purchase_ts",
        "click_ts",
        "amount",
    )


def run_click_purchase_join_stream(
    spark,
    topic_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    interval_seconds: int = 1800,
    watermark: str = "1 day",
    available_now: bool = True,
):
    """Stream-stream attribution join: two reads of the same topic
    (Spark plans them as independent sources) through
    ``click_purchase_interval_join``. Inner matches emit without
    waiting on the watermark, so the drained sink equals the batch
    inequality join; the generous watermark only bounds state and is
    irrelevant to a pre-written topic drained in one availableNow batch.
    """
    purchases, _ = split_clicks_purchases(
        spark.readStream.schema(schema).parquet(topic_dir)
    )
    _, clicks = split_clicks_purchases(
        spark.readStream.schema(schema).parquet(topic_dir)
    )
    out = click_purchase_interval_join(
        purchases, clicks, interval_seconds, watermark
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_agg_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked session-window aggregation — the unbounded twin of
    ``operators.windows.sessionize``. ``F.session_window`` keeps one
    growing window per (key, open session) in the state store and merges
    events whose [ts, ts+gap) windows touch (INCLUSIVE — two events
    exactly ``gap`` apart merge, r14 tie probe), which is the batch
    lag-gap island rule with a STRICT split (new session iff
    ts - prev > gap). A session finalizes when the watermark passes its
    end (= last event + gap; end <= wm, inclusive), so append mode
    emits each session exactly once — though a late row landing after
    its session was finalized can open a fresh OVERLAPPING session for
    the same key (tests/test_window_model.py rule 7)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_session_stream(
    spark,
    topic_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    available_now: bool = True,
):
    """Drain a parquet file-drop topic through ``session_agg_stream``
    into a parquet sink. With a zero watermark delay the final watermark
    is the max event time, so the sink holds exactly the sessions whose
    end (last event + gap) <= max event time — the subset the batch
    oracle computes with the same islands rule."""
    stream = spark.readStream.schema(schema).parquet(topic_dir)
    out = session_agg_stream(stream)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def user_tier_dim(df: DataFrame) -> DataFrame:
    """Deterministic per-user tier dimension (derived from user_id) —
    the static side of the enrichment parity query; shared by the
    registry query and the plan-audit batch twin."""
    return (
        df.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(F.col("user_id") % 3 == 0, F.lit("gold"))
            .when(F.col("user_id") % 3 == 1, F.lit("silver"))
            .otherwise(F.lit("bronze"))
            .alias("tier"),
        )
    )


def enrich_events(stream: DataFrame, dim_df: DataFrame) -> DataFrame:
    """Fact relation broadcast-joins the bounded dimension — pure
    transform shared by the stream runner and the batch twin."""
    return stream.join(F.broadcast(dim_df), "user_id")


def enrich_rollup(enriched: DataFrame) -> DataFrame:
    """Per-(type, tier) count/sum rollup of the enriched relation
    (compact, order-insensitive; exact DECIMAL sum)."""
    return enriched.groupBy("event_type", "tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


def run_enrich_stream(
    spark,
    topic_dir: str,
    dim_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    available_now: bool = True,
):
    """Stream-static enrichment join — the canonical dimension-lookup
    topology: the unbounded fact stream broadcast-joins a bounded
    dimension DataFrame per micro-batch (no state store involved; the
    static side is re-resolved each batch, which is also how dimension
    refreshes propagate). Inner join, append mode, no watermark needed
    — stream-static joins are stateless."""
    stream = spark.readStream.schema(schema).parquet(topic_dir)
    out = enrich_events(stream, dim_df)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
