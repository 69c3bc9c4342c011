"""Streaming mode (SURVEY.md §3.2): the reference's unbounded pipeline on
Spark Structured Streaming."""

from .traffic import (
    run_traffic_stream,
    run_traffic_stream_with_quarantine,
    traffic_stream,
)


def drain(query, timeout_sec: float):
    """awaitTermination that FAILS LOUDLY on timeout.

    ``awaitTermination(t)`` returns False when the query is still
    running at the deadline; a caller that ignores that and reads the
    sink gets a silently partial result — the confusing gate-mismatch
    failure mode the round-5 checkpoint-recovery test fixed. Every
    parity query and streaming test drains through this instead.
    """
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name or query.id} did not finish "
            f"within {timeout_sec}s; sink contents would be partial"
        )
    return True


__all__ = ["traffic_stream", "run_traffic_stream", "drain"]
