"""Pipeline configuration, mirroring the reference's options interfaces.

The reference builds options with PipelineOptionsFactory over a stack of
interfaces (TrafficMaxLaneFlow.java:322-345 extending
DataflowExampleOptions/ExamplePubsubTopicOptions/ExampleBigQueryTableOptions)
with these defaults: windowDuration=60 min (TrafficMaxLaneFlow.java:86,332-334),
windowSlideEvery=1 min (TrafficMaxLaneFlow.java:87,339-341), --streaming flag
(TrafficMaxLaneFlow.java:355).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TrafficConfig:
    """Options for the TrafficMaxLaneFlow-equivalent pipeline."""

    # --windowDuration, minutes (TrafficMaxLaneFlow.java:86, default 60)
    window_duration_minutes: int = 60
    # --windowSlideEvery, minutes (TrafficMaxLaneFlow.java:87, default 1)
    window_slide_minutes: int = 1
    # --streaming (TrafficMaxLaneFlow.java:355). Batch assigns event time
    # from the parsed CSV timestamp; streaming uses source ingest time
    # (the reference's Pub/Sub-publish-time behavior, SURVEY.md §2.5).
    streaming: bool = False
    # Watermark delay for streaming window aggregation. The reference
    # leaves lateness to Beam defaults (allowed lateness 0, runner-managed
    # watermark); Spark requires an explicit bound — this is the one
    # documented choice the engine adds (SURVEY.md §2.5).
    watermark_delay: str = "10 minutes"
    # Opt-in fix for the reference's batch/streaming event-time asymmetry:
    # when True, streaming mode parses the payload timestamp instead of
    # using ingest time (SURVEY.md §2.5 "honor payload timestamp" flag).
    streaming_honor_payload_timestamp: bool = False
    # Batch-only: persist the parsed lane_info so several window
    # configurations over the same input (the 60/1 sliding flagship and
    # the 60/60 tumbling variant) parse the CSV once. Spark's CacheManager
    # dedups by logical plan, so every pipeline built from the same lines
    # shares one materialization. The entry is deliberately never
    # unpersisted: eager unpersist after one query would defeat the
    # cross-query sharing this flag exists for, and the storage cost is
    # bounded by Spark's LRU block eviction (MEMORY_AND_DISK default), so
    # repeated invocations pressure but never leak unboundedly. Callers
    # needing a hard release can spark.catalog.clearCache(). Ignored in
    # streaming mode (persist is undefined on unbounded DataFrames).
    cache_lane_info: bool = False

    @property
    def window_duration(self) -> str:
        return f"{self.window_duration_minutes} minutes"

    @property
    def window_slide(self) -> str:
        return f"{self.window_slide_minutes} minutes"
