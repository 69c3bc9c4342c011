"""Event-time window aggregations over generic event streams.

The reference's only windowing is the sliding window feeding MaxFlow
(TrafficMaxLaneFlow.java:390-394). These operators generalize that surface
to the standard window family — tumbling (the degenerate slide == duration
case, SURVEY.md §2.5), sliding, and session windows — over the driver's
``events`` table shape (event_id, ts, user_id, event_type, value, props).

All are pure DataFrame -> DataFrame and run unchanged as streaming
aggregations (add ``withWatermark`` upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STD_AGGS = lambda: [  # noqa: E731
    F.count(F.lit(1)).alias("n_events"),
    F.sum("value").alias("sum_value"),
    F.avg("value").alias("avg_value"),
    F.min("value").alias("min_value"),
    F.max("value").alias("max_value"),
]


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Fixed (tumbling) windows: count/sum/avg/min/max of ``value`` per
    (window, keys). One shuffle on (window, keys); partial aggregation
    happens map-side automatically.
    """
    win = F.window(ts_col, duration)
    return (
        events.groupBy(win.alias("window"), *keys)
        .agg(*_STD_AGGS())
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows (each event lands in duration/slide windows —
    the reference's 60x fan-out shape, TrafficMaxLaneFlow.java:86-87)."""
    win = F.window(ts_col, duration, slide)
    return (
        events.groupBy(win.alias("window"), *keys)
        .agg(*_STD_AGGS())
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows: events of one ``key`` within ``gap`` of each
    other (INCLUSIVE — two events exactly ``gap`` apart merge, pinned by
    the r14 tie probe in tests/test_session_tie_parity.py) merge into
    one session. Beyond-reference capability (the reference has
    no session windows, SURVEY.md §2.5); native ``F.session_window`` so it
    runs as a streaming stateful aggregation too.

    ``session_end`` follows Spark's definition: max event ts + gap.
    """
    win = F.session_window(ts_col, gap)
    return (
        events.groupBy(win.alias("session"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min(ts_col).alias("first_event_ts"),
            F.max(ts_col).alias("last_event_ts"),
        )
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "sum_value",
            "first_event_ts",
            "last_event_ts",
        )
    )


def sessionize_dynamic(
    events: DataFrame,
    gaps: dict[str, str],
    default_gap: str = "30 minutes",
    gap_key: str = "event_type",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows with a PER-EVENT gap (``F.session_window`` with a
    gap expression): each event extends its session by its own type's
    timeout — e.g. purchases hold a session open longer than views. The
    reference has nothing comparable; Spark's dynamic-gap sessions make
    it one declarative aggregation (streaming-capable unchanged).

    Session end = max(event ts + its gap) over the merged events, per
    Spark's interval-merge semantics.
    """
    gap = F.lit(default_gap)
    for value, g in sorted(gaps.items()):
        gap = F.when(F.col(gap_key) == value, F.lit(g)).otherwise(gap)
    win = F.session_window(ts_col, gap)
    return (
        events.groupBy(win.alias("session"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_event_ts"),
            F.max(ts_col).alias("last_event_ts"),
        )
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "first_event_ts",
            "last_event_ts",
        )
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    n_salt: int = 16,
    salt_col: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Skew-resistant aggregation: count/sum of ``value_col`` per key
    computed in two phases through a salt column — phase 1 aggregates
    (key, salt) spreading each hot key over ``n_salt`` reducers, phase 2
    merges the partials per key. Results are identical to the direct
    groupBy (count and sum are decomposable); use when a handful of keys
    dominate the input (the `events.event_type` shape: 5 values over
    millions of rows) and AQE skew handling isn't enough.

    The salt is deterministic, never random: ``salt_col`` (any
    roughly-uniform numeric column, e.g. a row id) when given, else
    ``F.hash`` over all input columns.
    """
    keys = list(keys)
    if salt_col is not None:
        salt = F.pmod(F.col(salt_col).cast("bigint"), F.lit(n_salt))
    else:
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    salted = df.withColumn("_salt", salt.cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_events"),
        F.sum("_s").cast("double").alias("sum_value"),
    )
