"""Custom stateful streaming operator: per-key event throttling
(gap-session dedup) via ``applyInPandasWithState`` — the extensibility
path for stateful semantics Spark's built-in streaming aggregations don't
express (SURVEY.md §2.5: the reference has no state API at all; this is
beyond-reference, north-star surface).

Semantics (shared by both implementations below): within each key, an
event is EMITTED iff it is the first ever seen or arrived more than
``gap`` after the previously seen event — i.e. the first event of each
gap-session; every event refreshes the clock. This is notification
throttling / within-session dedup for an LLM-data ingest pipeline.

Two implementations with identical results on in-order data:

- ``throttle_batch`` — lag() over (key, ts) — used by the driver-facing
  ``events_throttle`` query and its DuckDB oracle.
- ``throttle_stream`` — Arrow-batched ``applyInPandasWithState`` with
  per-key state = last-seen event time. The event-time timeout fires at
  last_seen + gap and REMOVES the state; correctness is unaffected (a
  later event would have started a new session anyway), so the timeout is
  purely state-size hygiene — per-key state is one long, bounded count of
  live keys, the 100 TB knob.

Late data (measured r13, pinned by tests/test_throttle_model.py): Spark
DOES filter late rows before the stateful function, using the
one-batch-LAGGED watermark — a row in micro-batch N is kept iff its
event time is strictly greater than max(event ts over batches 1..N-2)
minus the watermark delay (ties drop). So a row later than its batch's
own predecessors always reaches the function (and is suppressed by live
state if in-gap), while a row behind the lagged global watermark never
does. Consequence: the event-time timeout's state removal is PROVABLY
unobservable in output — any row arriving after a key timed out must be
above the lagged watermark, which is at or above the eviction watermark
that fired the timeout, which is above last_seen + gap, so it would
have started a new session anyway. In-order replay (the injector) is
exact.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    pass

_STATE_SCHEMA = StructType([StructField("last_seen_us", LongType())])


def throttle_batch(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str,
    order_col: str,
) -> DataFrame:
    """Batch twin: first event of each gap-session per key, via lag().
    ``order_col`` breaks equal-timestamp ties deterministically."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    return (
        df.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col(ts_col) > F.col("_prev") + gap_expr))
        .drop("_prev")
    )


def throttle_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_col: str,
) -> DataFrame:
    """Streaming implementation over a watermarked input DataFrame.

    Requires ``df.withWatermark(ts_col, ...)`` upstream (event-time
    timeout needs a watermark). Output schema == input schema.
    """
    keys = list(keys)
    out_schema = df.schema
    gap_us = gap_seconds * 1_000_000
    ts_pos = df.columns.index(ts_col)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # gap elapsed with no new events: next event starts a fresh
            # session regardless — dropping state changes nothing.
            state.remove()
            return
        pdf = pd.concat(list(pdfs))
        if pdf.empty:
            return
        pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
        (last,) = state.get if state.exists else (None,)
        # Vectorized gap test (guide §4.2): the clock refreshes on EVERY
        # event, so emit[i] depends only on the previous row's timestamp
        # (or the state seed for row 0) — a shifted integer diff, no
        # per-row Python loop. Integer arithmetic, so bit-identical to
        # the scalar fold it replaces.
        t_us = (
            np.asarray(pdf.iloc[:, ts_pos], dtype="datetime64[ns]").astype(
                "int64"
            )
            // 1_000  # pandas ns -> event-time micros
        )
        emit = np.empty(len(t_us), dtype=bool)
        emit[0] = last is None or t_us[0] - last > gap_us
        emit[1:] = (t_us[1:] - t_us[:-1]) > gap_us
        last = int(t_us[-1])
        state.update((last,))
        # state-cleanup alarm; must stay ahead of the current watermark
        timeout_ms = max(
            last // 1_000 + gap_seconds * 1_000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        out = pdf[pd.Series(emit, index=pdf.index)]
        if not out.empty:
            yield out

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
