"""Per-key running aggregates on Spark 4's ``transformWithStateInPandas``
(beyond-reference, north-star surface — the successor API to
``applyInPandasWithState`` used by streaming/stateful.py; this module
exercises the new typed-state API: named ValueState handles with explicit
TTL instead of a single state tuple + manual timeout juggling).

Operator: for every incoming event, emit the event's key, id, timestamp,
and the key's RUNNING count and sum *including this event* — the
online-feature shape (per-user lifetime counters feeding a model) that
built-in streaming aggregations can't express, because they emit one row
per window/group, not one row per event.

Batch twin (``running_batch``): cumulative window frame over (ts, id) —
used for parity testing; identical results on in-order replay.

Environment note: the transformWithState Python worker imports protobuf;
containers without a working ``google.protobuf`` cannot start it (the
parity test skips there). ``streaming/stateful.py`` remains the
applyInPandasWithState fallback with no such dependency.

Scale notes: state per key is two longs + a double (ValueState in the
state store); TTL evicts idle keys. Output is append-mode-safe (every
input row produces exactly one output row, never retracted).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _running_fold(vals: "np.ndarray", n: int, s: float):
    """Vectorized running (count, sum) fold seeded with carried state.

    np.add.accumulate applies the add STRICTLY left-to-right
    (r[i] = r[i-1] + a[i], no pairwise regrouping), so seeding the array
    with ``s`` reproduces the scalar fold ((s+v0)+v1)+... bit-for-bit —
    the float-identity contract with running_batch's ascending window
    sum (pinned by tests/test_stateful_streaming.py's fold-parity test,
    which runs without the transformWithState worker).

    Returns (ns, sums, n_out, s_out).
    """
    sums = np.add.accumulate(np.concatenate(([s], vals)))[1:]
    ns = n + np.arange(1, len(vals) + 1, dtype="int64")
    return ns, sums, n + len(vals), float(sums[-1])


def running_batch(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Batch twin: running count/sum per key including the current row,
    ordered by (ts, id). The double sum runs in the same ascending
    (ts, id) order as the streaming fold, so both produce identical
    floats on in-order replay."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        *keys,
        id_col,
        ts_col,
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.sum(F.col(value_col).cast("double")).over(w).alias("running_sum"),
    )


class _RunningProcessor(StatefulProcessor):
    """Typed-state processor: one ValueState row (count, sum) per key."""

    def __init__(
        self,
        keys: list[str],
        ts_col: str,
        id_col: str,
        value_col: str,
        ttl_ms: int,
    ):
        self._keys = keys
        self._ts, self._id, self._val = ts_col, id_col, value_col
        self._ttl = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("agg", _STATE_SCHEMA, self._ttl)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows))
        if pdf.empty:
            return
        pdf = pdf.sort_values([self._ts, self._id], kind="mergesort")
        n, s = self._state.get() if self._state.exists() else (0, 0.0)
        # Vectorized running fold (guide §4.2); see _running_fold for
        # the bit-parity argument.
        vals = pdf[self._val].astype("float64").to_numpy()
        ns, sums, n, s = _running_fold(vals, n, s)
        self._state.update((n, s))
        out = pdf[[self._id, self._ts]].copy()
        for i, (name, k) in enumerate(zip(self._keys, key)):
            out.insert(i, name, k)
        out["running_n"] = pd.Series(ns, index=pdf.index)
        out["running_sum"] = pd.Series(sums, index=pdf.index)
        yield out

    def close(self) -> None:
        pass


def running_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    state_ttl_hours: int = 24,
) -> DataFrame:
    """Streaming per-event running count/sum via transformWithStateInPandas.

    ``df`` must be watermarked upstream. State TTL bounds idle-key state
    (processing-time TTL — the new API's built-in eviction, no manual
    timeout bookkeeping)."""
    keys = list(keys)
    id_field = df.schema[id_col]
    ts_field = df.schema[ts_col]
    out_schema = StructType(
        [
            *[
                StructField(k, df.schema[k].dataType, True)
                for k in keys
            ],
            StructField(id_col, id_field.dataType, True),
            StructField(ts_col, ts_field.dataType, True),
            StructField("running_n", LongType(), True),
            StructField("running_sum", DoubleType(), True),
        ]
    )
    proc = _RunningProcessor(
        keys, ts_col, id_col, value_col, state_ttl_hours * 3_600_000
    )
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
