"""Stream-stream interval join (beyond-reference; SURVEY.md §2.1 — the
reference has no joins at all, streaming or otherwise).

Spark's stream-stream join requires an equality predicate (state is a
keyed store) and bounded state needs watermarks plus an event-time bound
in the condition. Both fall out of the same bucketing used by the batch
``operators.joins.range_join``: the right side explodes to the fixed-
grain time buckets its interval covers, the left side equi-joins on its
single bucket, and the raw time-range predicate remains as the residual
filter AND the state-TTL bound. State is O(rate x interval) per side,
independent of stream lifetime; each (left row, right row) match meets in
exactly one bucket (the left row's), so no dedup is needed.

Parity with the batch range_join is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    left_ts: str,
    right: DataFrame,
    right_ts: str,
    interval_seconds: int = 3600,
    grain_seconds: int | None = None,
    keys: list[str | tuple[str, str]] | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Join left rows to right rows with
    ``right_ts <= left_ts < right_ts + interval_seconds`` (and equal
    ``keys``). Watermarks are applied here so the state bound is part of
    the operator contract (on a batch input they are no-ops, so the same
    transform serves the batch legs and the plan audit).

    A ``keys`` entry is either one column name present on both sides, or
    a ``(left_col, right_col)`` pair when the sides name the key
    differently (the attribution join's user_id/c_user_id) — every
    equality must live IN the join condition: Spark keys the
    stream-stream state store on the extracted equi-predicates, so
    filtering on a key after the join would leave state keyed on the
    time bucket alone, all key values colliding in one entry.
    """
    keys = list(keys or [])
    g = grain_seconds or interval_seconds
    gl = F.lit(g).cast("long")

    l = left.withWatermark(left_ts, watermark).withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(left_ts)) / gl).cast("long")
    )
    b_start = F.floor(F.unix_timestamp(F.col(right_ts)) / gl).cast("long")
    b_end = F.floor(
        (F.unix_timestamp(F.col(right_ts)) + interval_seconds) / gl
    ).cast("long")
    r = right.withWatermark(right_ts, watermark).withColumn(
        "_bucket", F.explode(F.sequence(b_start, b_end))
    )

    cond = (
        (l["_bucket"] == r["_bucket"])
        & (F.col(left_ts) >= F.col(right_ts))
        & (
            F.col(left_ts)
            < F.col(right_ts) + F.expr(f"INTERVAL {interval_seconds} SECONDS")
        )
    )
    for k in keys:
        lk, rk = (k, k) if isinstance(k, str) else k
        cond = cond & (l[lk] == r[rk])
    return l.join(r, cond).drop("_bucket")
