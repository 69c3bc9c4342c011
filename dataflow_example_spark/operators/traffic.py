"""TrafficMaxLaneFlow pipeline operators, Spark-first.

Every function here is a pure ``DataFrame -> DataFrame`` transformation,
usable unchanged on a batch DataFrame or a streaming DataFrame — the
reference's unified batch/streaming contract (TrafficMaxLaneFlow.java:374-382,
SURVEY.md §1.4). Everything is native column expressions (whole-stage
codegen; zero Python cost on the hot path).

Operator parity map (SURVEY.md §2):

- op 8  ``filter_header_and_empties``  <- PubsubFileInjector.java:45-55
- op 6  ``extract_flow_info``          <- ExtractFlowInfoFn, TrafficMaxLaneFlow.java:172-227
- op 7  event-timestamp assignment     <- TrafficMaxLaneFlow.java:174-175,215-221
- op 9  sliding windows                <- TrafficMaxLaneFlow.java:390-394
- op 10 ``max_lane_flow`` (max-by)     <- MaxFlow combiner, TrafficMaxLaneFlow.java:236-252
- op 11 ``format_maxes``               <- FormatMaxesFn, TrafficMaxLaneFlow.java:258-296
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import TrafficConfig
from ..schemas import MIN_FIELDS, N_LANES, TS_FORMAT_SPARK


def filter_header_and_empties(df: DataFrame, col: str = "value") -> DataFrame:
    """Drop empty lines and header lines starting with "Timestamp".

    Parity: FilterHeaderAndEmpties (PubsubFileInjector.java:45-55).
    """
    c = F.col(col)
    return df.filter((F.length(c) > 0) & (~c.startswith("Timestamp")))


def _int_or_null(c: Column) -> Column:
    """Java Integer.parseInt semantics: null unless the whole string is a
    (signed) decimal integer in int range (tryIntParse,
    TrafficMaxLaneFlow.java:403-409 returns null on NumberFormatException).
    Spark's bare string->int cast is laxer (trims whitespace), so gate on a
    strict regex first; try_cast nulls out int-range overflow (and stays
    null-safe under ANSI mode, Spark 4's default).
    """
    return F.when(c.rlike(r"^[+-]?\d+$"), c.try_cast("int"))


def _double_or_null(c: Column) -> Column:
    """Java Double.parseDouble semantics via cast-to-double (null on
    failure). Deviation (documented): Java accepts surrounding whitespace
    and hex-float forms; Spark's cast accepts trimmed decimal/scientific
    forms — identical on all PeMS-shaped data.
    (tryDoubleParse, TrafficMaxLaneFlow.java:411-417)
    """
    return c.try_cast("double")


def extract_flow_info(
    df: DataFrame,
    col: str = "value",
    assign_event_ts: bool = True,
    ingest_ts_col: str | None = None,
) -> DataFrame:
    """CSV line -> up to 8 lane_info rows (one per lane), with the
    reference's exact edge semantics (ExtractFlowInfoFn,
    TrafficMaxLaneFlow.java:172-227; SURVEY.md §2.3):

    1. Java ``String.split(",")`` drops trailing empty fields — mirrored by
       stripping trailing commas before splitting.
    2. Lines with fewer than :data:`MIN_FIELDS` (49) fields are dropped.
       (The reference guards ``< 48`` and would crash on exactly 48;
       we drop — documented deviation, SURVEY.md §2.3 item 2.)
    3. **Prefix emission**: lanes are parsed in order 1..8; the first lane
       whose flow/occ/speed fails to parse stops emission — earlier lanes
       are kept, that lane and later ones are dropped
       (TrafficMaxLaneFlow.java:197-203).
    4. Batch mode (``assign_event_ts=True``): event time is the parsed
       field-0 timestamp; unparseable timestamp drops the record
       (TrafficMaxLaneFlow.java:215-221). Streaming mode: event time is
       the source ingest timestamp (``ingest_ts_col``), mirroring the
       reference's Pub/Sub-publish-time behavior (SURVEY.md §2.5).
    5. ``total_flow`` is parse-or-null, carried without dropping
       (TrafficMaxLaneFlow.java:196).
    """
    # (1) Java split drops trailing empties; strip trailing commas first.
    items = F.split(F.regexp_replace(F.col(col), ",+$", ""), ",")

    passthrough = [ingest_ts_col] if ingest_ts_col else []
    base = df.select(items.alias("_items"), *passthrough).filter(
        F.size("_items") >= MIN_FIELDS  # (2)
    )

    def item(i: int) -> Column:
        return F.col("_items").getItem(i)

    # Raw (unparsed) per-lane triples. Kept as strings here and cast
    # *after* the explode so the parse expressions appear once in the plan
    # instead of once per lane — 8x smaller generated code (janino blows
    # the heap on the expanded form under small driver heaps).
    lanes_raw = F.array(
        *[
            F.struct(
                F.lit(i).alias("lane_idx"),
                item(6 + 5 * i).alias("f"),
                item(7 + 5 * i).alias("o"),
                item(8 + 5 * i).alias("s"),
            )
            for i in range(1, N_LANES + 1)
        ]
    )

    # (3) validity per lane via ONE lambda body; first invalid lane index
    # (array_position returns 0 when every lane is valid).
    def lane_valid(x: Column) -> Column:
        flow_ok = x.f.rlike(r"^[+-]?\d+$") & x.f.try_cast("int").isNotNull()
        return flow_ok & x.o.try_cast("double").isNotNull() & x.s.try_cast(
            "double"
        ).isNotNull()

    first_invalid = F.array_position(
        F.transform(lanes_raw, lane_valid), F.lit(False)
    )

    parsed = base.select(
        item(1).alias("station_id"),
        item(3).alias("direction"),
        item(2).alias("freeway"),
        item(0).alias("recorded_timestamp"),
        _int_or_null(item(7)).alias("total_flow"),  # (5)
        lanes_raw.alias("_lanes"),
        F.when(first_invalid == 0, F.lit(N_LANES + 1))
        .otherwise(first_invalid)
        .cast("int")
        .alias("_first_invalid"),
        *passthrough,
    )

    exploded = parsed.select(
        "*", F.explode("_lanes").alias("_raw")
    ).filter(F.col("_raw.lane_idx") < F.col("_first_invalid"))
    exploded = exploded.select(
        "*",
        F.struct(
            F.col("_raw.lane_idx").alias("lane_idx"),
            F.concat(F.lit("lane"), F.col("_raw.lane_idx").cast("string")).alias(
                "lane"
            ),
            _int_or_null(F.col("_raw.f")).alias("lane_flow"),
            _double_or_null(F.col("_raw.o")).alias("lane_avg_occ"),
            _double_or_null(F.col("_raw.s")).alias("lane_avg_speed"),
        ).alias("_lane"),
    )

    # (4) event-time assignment
    if assign_event_ts:
        event_ts = F.try_to_timestamp(
            F.col("recorded_timestamp"), F.lit(TS_FORMAT_SPARK)
        )
    elif ingest_ts_col:
        event_ts = F.col(ingest_ts_col)
    else:
        event_ts = F.lit(None).cast("timestamp")

    out = exploded.select(
        "station_id",
        F.col("_lane.lane").alias("lane"),
        F.col("_lane.lane_idx").alias("lane_idx"),
        "direction",
        "freeway",
        "recorded_timestamp",
        F.col("_lane.lane_flow").alias("lane_flow"),
        F.col("_lane.lane_avg_occ").alias("lane_avg_occ"),
        F.col("_lane.lane_avg_speed").alias("lane_avg_speed"),
        "total_flow",
        event_ts.alias("event_ts"),
    )
    if assign_event_ts:
        out = out.filter(F.col("event_ts").isNotNull())
    return out


def traffic_quarantine(df: DataFrame, col: str = "value") -> DataFrame:
    """Dead-letter routing: the lines ``extract_flow_info`` would drop
    whole, each with a reason — the quarantine side of the ingest fork
    (route to a badRecords table for inspection/replay instead of
    silently vanishing). Reasons, checked in pipeline order:

    - ``header_or_empty``  (filter_header_and_empties)
    - ``too_few_fields``   (< MIN_FIELDS after Java trailing-split)
    - ``bad_timestamp``    (field 0 unparseable -> record dropped,
      TrafficMaxLaneFlow.java:215-221)

    Lane-level prefix truncation (SURVEY.md §2.3 item 3) is NOT a row
    rejection — those rows emit their valid lane prefix — so it is not
    quarantined here.
    """
    c = F.col(col)
    items = F.split(F.regexp_replace(c, ",+$", ""), ",")
    ts_ok = F.try_to_timestamp(
        items.getItem(0), F.lit(TS_FORMAT_SPARK)
    ).isNotNull()
    reason = (
        F.when(
            (F.length(c) == 0) | c.startswith("Timestamp"),
            F.lit("header_or_empty"),
        )
        .when(F.size(items) < MIN_FIELDS, F.lit("too_few_fields"))
        .when(~ts_ok, F.lit("bad_timestamp"))
    )
    return df.select(c.alias("line"), reason.alias("reason")).filter(
        F.col("reason").isNotNull()
    )


# Deterministic max-by tie-break (SURVEY.md §2.4): the reference's MaxFlow
# uses `flow >= max` over a nondeterministic iteration order
# (TrafficMaxLaneFlow.java:240-251), so ties are unspecified there. We pin a
# total order: greatest lane_flow, then greatest lane_idx, then greatest
# recorded_timestamp string (remaining fields extend the comparison only on
# full-key ties). Implemented as ``max`` over a struct whose leading fields
# are the key — a plain declarative Max, measurably faster than
# ``max_by(struct, struct)`` and identical under the documented order.
# The DuckDB oracle uses the same rule (arg_max over a composite varchar key).
_ORDERED_FIELDS = (
    "lane_flow",
    "lane_idx",
    "recorded_timestamp",
    "lane",
    "direction",
    "freeway",
    "lane_avg_occ",
    "lane_avg_speed",
    "total_flow",
)


def max_lane_flow(
    lane_info: DataFrame,
    config: TrafficConfig = TrafficConfig(),
) -> DataFrame:
    """Per (sliding window, station), keep the whole lane record with the
    maximal lane_flow (MaxFlow via Combine.perKey,
    TrafficMaxLaneFlow.java:236-252,302-315).

    Physical strategy (the 100 TB concern — each element lands in
    duration/slide windows, 60x at the defaults, TrafficMaxLaneFlow.java:86-87):

    - **Batch, duration a multiple of slide** (the common case): two-phase.
      Phase 1 pre-aggregates the max record per (station, slide bucket) —
      valid because slide-aligned window starts can never split a bucket,
      so bucket membership determines window membership, and max-by is
      decomposable. The 60x Expand then fans out only the per-bucket
      winners. This bounds the blow-up at the number of *populated
      buckets*, not raw readings, and the phase-1 exchange keeps the
      parse stage and the Expand+aggregate stage in separate (compilable)
      codegen units — one fused stage exceeds janino's 64 KB method limit
      and silently falls back to the interpreter at ~10x cost.
    - **Streaming or non-divisible slide**: single groupBy over the
      windowed fan-out (one stateful aggregation; chained stateful aggs
      are not generally supported in streaming).

    Both phases are hash aggregates with map-side partial max — the
    combiner-lifting the reference relies on Beam for (SURVEY.md §4.3).

    Deviation (documented): the reference initializes its running max to 0
    and emits an all-null record if every flow is negative
    (TrafficMaxLaneFlow.java:241-242) — unobservable on PeMS data (flows
    >= 0); we return the true max record.
    """
    d, s = config.window_duration_minutes, config.window_slide_minutes
    ordered = F.struct(*_ORDERED_FIELDS)
    df = lane_info.filter(F.col("lane_flow").isNotNull())
    two_phase = (not config.streaming) and d > s and d % s == 0
    if two_phase:
        bucket = F.window("event_ts", config.window_slide)
        per_bucket = df.groupBy(bucket.alias("_b"), "station_id").agg(
            F.max(ordered).alias("m")
        )
        fanned = per_bucket.select(
            "station_id", "m", F.col("_b.start").alias("_bs")
        )
        # Phase-1 output is bytes-cheap but the next stage expands it
        # duration/slide-fold (60x): AQE's byte-based coalescing would run
        # the fan-out + aggregate on 1-2 cores. An explicit repartition is
        # exempt from coalescing and keeps the fan-out wide. Keyed on
        # station_id (not round-robin, r15): HashPartitioning(station_id)
        # satisfies the phase-2 aggregate's ClusteredDistribution
        # ({window_start, station_id} ⊇ {station_id}), so phase 2 needs NO
        # exchange of the expanded rows — at the 60x defaults that second
        # exchange carried duration/slide times phase-1's bytes (202 MB at
        # sf0.1 against 6 MB entering phase 1; the largest shuffle in the
        # whole bench). Round-robin also paid a sort of its input
        # (spark.sql.execution.sortBeforeRepartition); hash does not.
        #
        # The fan-out itself is explode(sequence(...)) — a Generate, which
        # PRESERVES the exchange's partitioning — instead of F.window's
        # Expand, which reports UnknownPartitioning and forced the second
        # exchange. For slide-aligned bucket starts the two enumerate the
        # identical window set: F.window emits every window [s, s+dur)
        # with s an epoch-aligned slide multiple containing the event, and
        # a bucket start _bs (itself epoch-aligned, from phase 1's
        # F.window) lies in exactly the windows starting at
        # _bs-dur+slide, ..., _bs-slide, _bs. Window-struct arithmetic
        # (_ws + dur == F.window's end) is exact integer-microsecond math;
        # equality over the full output is pinned by
        # tests/test_traffic_maxflow.py and the driver's oracle hash.
        fanned = fanned.repartition(
            fanned.sparkSession.sparkContext.defaultParallelism,
            "station_id",
        )
        slide_iv = F.expr(
            f"INTERVAL {config.window_slide_minutes} MINUTES"
        )
        dur_iv = F.expr(
            f"INTERVAL {config.window_duration_minutes} MINUTES"
        )
        expanded = fanned.select(
            "station_id",
            "m",
            F.explode(
                F.sequence(
                    F.col("_bs") - dur_iv + slide_iv,
                    F.col("_bs"),
                    slide_iv,
                )
            ).alias("_ws"),
        )
        return (
            expanded.groupBy("_ws", "station_id")
            .agg(F.max("m").alias("max"))
            .select(
                # F.window's struct fields are nullable; `when` without
                # `otherwise` reproduces that nullability (the predicate
                # is always true — _ws is a group key) so downstream
                # schemas are byte-identical to the F.window shape.
                F.struct(
                    F.when(F.col("_ws").isNotNull(), F.col("_ws")).alias(
                        "start"
                    ),
                    F.when(
                        F.col("_ws").isNotNull(), F.col("_ws") + dur_iv
                    ).alias("end"),
                ).alias("window"),
                "station_id",
                "max",
            )
        )
    win = F.window("event_ts", config.window_duration, config.window_slide)
    return df.groupBy(win.alias("window"), "station_id").agg(
        F.max(ordered).alias("max")
    )


def format_maxes(maxes: DataFrame) -> DataFrame:
    """Project the 10-column output row (FormatMaxesFn,
    TrafficMaxLaneFlow.java:258-296). ``window_timestamp`` is the window
    end — Beam's default END_OF_WINDOW timestamp combiner
    (TrafficMaxLaneFlow.java:276-277; SURVEY.md §2 op 11).
    """
    return maxes.select(
        "station_id",
        F.col("max.direction").alias("direction"),
        F.col("max.freeway").alias("freeway"),
        F.col("max.lane_flow").alias("lane_max_flow"),
        F.col("max.lane").alias("lane"),
        F.col("max.lane_avg_occ").alias("avg_occ"),
        F.col("max.lane_avg_speed").alias("avg_speed"),
        F.col("max.total_flow").alias("total_flow"),
        F.col("max.recorded_timestamp").alias("recorded_timestamp"),
        F.col("window.end").alias("window_timestamp"),
    )


def traffic_pipeline(
    lines: DataFrame,
    config: TrafficConfig = TrafficConfig(),
    value_col: str = "value",
    ingest_ts_col: str | None = None,
) -> DataFrame:
    """Full TrafficMaxLaneFlow graph (TrafficMaxLaneFlow.java:371-396):
    filter header/empties -> parse/flatten -> sliding windows ->
    per-(window, station) max-by -> 10-column projection.

    Works on batch and streaming inputs alike; streaming callers add the
    watermark before aggregation (see ``streaming.traffic_stream``).
    """
    assign = (not config.streaming) or config.streaming_honor_payload_timestamp
    lane_info = extract_flow_info(
        filter_header_and_empties(lines, value_col),
        col=value_col,
        assign_event_ts=assign,
        ingest_ts_col=ingest_ts_col,
    )
    if config.streaming and config.watermark_delay:
        lane_info = lane_info.withWatermark("event_ts", config.watermark_delay)
    elif config.cache_lane_info:
        from ..functions.cachereg import register_persisted

        lane_info = register_persisted(lane_info.persist())
    return format_maxes(max_lane_flow(lane_info, config))
