"""Graceful shutdown / cancellation for streaming jobs.

Parity: DataflowExampleUtils.waitToFinish (DataflowExampleUtils.java:
286-356) — the reference blocks on the job and installs a JVM shutdown
hook that cancels it so Ctrl-C doesn't strand a running Dataflow job.
Here the analog is stopping active Structured Streaming queries: ``stop()``
halts the source and ends the query; checkpointed state makes a later
restart resume exactly-once, so a signal-triggered stop loses nothing.
"""

from __future__ import annotations

import signal
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


def stop_all(spark: SparkSession, timeout_ms: int = 30_000) -> int:
    """Stop every active streaming query on the session. Returns the
    number of queries stopped. Safe to call twice (stopped queries drop
    out of ``streams.active``)."""
    queries = list(spark.streams.active)
    for q in queries:
        try:
            q.stop()
        except Exception:
            pass
    for q in queries:
        try:
            q.awaitTermination(timeout_ms / 1000)
        except Exception:
            pass
    return len(queries)


def wait_to_finish(
    queries: Sequence[StreamingQuery] | StreamingQuery,
    spark: SparkSession | None = None,
    install_signal_handlers: bool = True,
) -> None:
    """Block until the given queries terminate; on SIGINT/SIGTERM stop
    them gracefully first (the reference's shutdown-hook cancel,
    DataflowExampleUtils.java:317-333).

    Previous handlers are restored on exit so nested callers keep their
    own semantics.
    """
    qs = [queries] if isinstance(queries, StreamingQuery) else list(queries)
    sess = spark

    def _handler(signum, frame):  # noqa: ARG001
        for q in qs:
            try:
                q.stop()
            except Exception:
                pass
        if sess is not None:
            stop_all(sess)

    previous: dict[int, object] = {}
    if install_signal_handlers:
        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                previous[sig] = signal.signal(sig, _handler)
            except ValueError:
                pass  # non-main thread: signals unavailable, still block
    try:
        for q in qs:
            q.awaitTermination()
    finally:
        for sig, h in previous.items():
            signal.signal(sig, h)
