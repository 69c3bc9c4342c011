"""Streaming mode (SURVEY.md §3.2): the reference's unbounded pipeline on
Spark Structured Streaming."""

from .traffic import (
    run_traffic_stream,
    run_traffic_stream_with_quarantine,
    traffic_stream,
)

__all__ = ["traffic_stream", "run_traffic_stream"]
