"""Deterministic PeMS-style traffic CSV synthesis from the ``events`` table.

The reference's input is a PeMS 5-minute sensor CSV
(TrafficMaxLaneFlow.java:324-327); the driver's testdata has no traffic CSV,
so the correctness queries synthesize one — *inside the DataFrame plan* —
from ``events.parquet``, with arithmetic a DuckDB oracle reproduces exactly
(integer modulus + dyadic-rational doubles, so every value round-trips
bit-identically through the CSV string form).

Contract shared with the oracle SQL (see ``oracles.py``):

- one synthetic reading per (station, second): station = user_id % 50,
  second = date_trunc(ts); collisions resolved by eid = min(event_id) —
  this makes (station, recorded_timestamp, lane) unique, so the
  deterministic max-by tie-break is a total order.
- station_id = 'S' || lpad(station, 3, '0')
- freeway    = eid % 5 (as string)
- direction  = ['N','S','E','W'][eid % 4]
- total_flow = eid % 300
- lane i in 1..8:
    lane_flow      = (eid * i) % 100
    lane_avg_occ   = ((eid*7 + i) % 128) / 128.0    (dyadic -> exact)
    lane_avg_speed = 40.0 + ((eid*13 + i*5) % 512) / 8.0
- CSV layout per FIXTURES.md §1: ts, station, freeway, direction, 3 filler,
  total_flow, 3 filler, then per lane [flow, occ, speed, filler, filler]
  -> 51 fields, flow_i at index 6+5i, occ at 7+5i, speed at 8+5i.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TS_FORMAT_SPARK
from .tables import load

DIRECTIONS = ("N", "S", "E", "W")


def synth_traffic_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> one row per (station, second) with eid."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.col("user_id") % 50).cast("int").alias("station"),
            F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        )
        .agg(F.min("event_id").alias("eid"))
    )


def _lane_cols(i: int) -> list[Column]:
    eid = F.col("eid")
    flow = (eid * i) % 100
    occ = ((eid * 7 + i) % 128).cast("double") / F.lit(128.0)
    speed = F.lit(40.0) + ((eid * 13 + i * 5) % 512).cast("double") / F.lit(8.0)
    # constant fillers pre-joined: concat_ws(',', ..., 'x,x') emits the
    # same bytes as two separate 'x' args with 1 expression instead of 2 —
    # 18 fewer codegen expressions per line, faster first-run compile
    return [
        flow.cast("string"),
        occ.cast("string"),
        speed.cast("string"),
        F.lit("x,x"),
    ]


def synth_traffic_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame with a single ``value`` column of PeMS-style CSV lines."""
    readings = synth_traffic_readings(spark, sf_dir)
    eid = F.col("eid")
    fields: list[Column] = [
        F.date_format("ts_sec", TS_FORMAT_SPARK),                   # 0 ts
        F.concat(F.lit("S"), F.lpad(F.col("station").cast("string"), 3, "0")),  # 1
        (eid % 5).cast("string"),                                   # 2 freeway
        F.element_at(F.array(*[F.lit(d) for d in DIRECTIONS]), (eid % 4).cast("int") + 1),  # 3
        F.lit("x,x,x"),                                             # 4-6 filler
        (eid % 300).cast("string"),                                 # 7 total_flow
        F.lit("x,x,x"),                                             # 8-10 filler
    ]
    for i in range(1, 9):
        fields.extend(_lane_cols(i))
    lines = readings.select(F.concat_ws(",", *fields).alias("value"))
    # Two plan hazards, both fixed here rather than in the consumer:
    # - AQE would coalesce the readings-groupBy shuffle to 1-2 partitions
    #   on byte size and serialize the ~480x downstream fan-out (8 lanes x
    #   60 sliding windows). An explicit numPartitions is exempt.
    # - Catalyst pushes the parse-stage filters (header/size(split)/
    #   timestamp guards) down through the exchange into this projection,
    #   re-inlining the 49-field concat_ws once per reference — the fused
    #   expression blows janino's 64 KB method limit and the whole stage
    #   falls back to interpreted execution. persist() materializes the
    #   lines once (InMemoryRelation is a pushdown/collapse barrier), which
    #   is also what the real pipeline does: read CSV bytes from storage.
    return lines.repartition(spark.sparkContext.defaultParallelism).persist()


def pems_line(
    ts_str: str,
    station: str,
    flow: int,
    occ: float = 0.01,
    speed: float = 65.0,
    total_flow: int | None = None,
    n_fields: int = 49,
) -> str:
    """One driver-side valid PeMS line at the parser's exact layout
    (FIXTURES.md §1: ts at 0, station at 1, freeway at 2, direction at
    3, total_flow at 7, lane-i triples at 6+5i / 7+5i / 8+5i). The ONE
    shared fixture builder for tools/tests that need hand-crafted valid
    lines (tools/dirty_stream_sweep.py, tests/test_pybus.py) — a single
    encoding of the field contract, so a layout change breaks loudly in
    one place instead of silently turning a hand-rolled copy into lines
    the parser drops.

    ``n_fields`` < 49 raises: this builder emits VALID lines only
    (lane 8's speed sits at index 48), and silently widening would turn
    a negative-test fixture asking for a short line into a valid one —
    craft invalid lines by hand where the invalidity is the point."""
    if n_fields < 49:
        raise ValueError(
            f"pems_line emits valid lines only (>= 49 fields; got "
            f"{n_fields}) — build short/invalid lines explicitly"
        )
    fields = ["x"] * n_fields
    fields[0] = ts_str
    fields[1] = station
    fields[2] = "1"
    fields[3] = "N"
    fields[7] = str(total_flow if total_flow is not None else flow)
    for i in range(1, 9):
        fields[6 + 5 * i] = str(flow)
        fields[7 + 5 * i] = repr(float(occ))
        fields[8 + 5 * i] = repr(float(speed))
    return ",".join(fields)
