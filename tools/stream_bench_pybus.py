"""Amplified pybus drain bench (VERDICT r12 item 4): measure the Python
DataSource bus source at scale, with exact stream/batch parity, against
the file-drop source on the SAME lines through the SAME traffic graph.

    python tools/stream_bench_pybus.py [n_lines] [segments]

Defaults: 1,048,576 PeMS lines across 64 segments — the segment-per-task
parallelism claim (sources/pybus.py module notes) measured rather than
asserted. Lines are built and PUBLISHED from executors (one ``publish``
call per partition, exercising the concurrent os.link index claim at
64-way fan-in), never collected to the driver.

Knob-sweep env vars (VERDICT r13 item 3 — pin or narrow the Python
source tax):
- ``PYBUS_BATCH_LINES``: override _PyBusStreamReader._BATCH_LINES
  (Arrow chunk size) for the pybus leg.
- ``PYBUS_TRIGGER_MS``: processingTime trigger interval for the pybus
  leg (default 1000).
- ``PYBUS_PASSTHROUGH=1``: skip the traffic graph — drain source ->
  parquet sink directly on BOTH legs (row-count parity instead of the
  windowed exceptAll), isolating the source cost from the shared
  downstream graph the r13 numbers conflated.

Both drains run the full reference graph (parse -> 60min/1min sliding
windows -> per-station max-by -> projection) with payload event time and
a zero watermark delay; each asserts exceptAll-exact parity against the
batch run of the same lines restricted to watermark-closed windows, so
the throughput numbers can never come from a silently wrong drain. The
pybus leg uses a processingTime trigger (the documented availableNow
single-batch caveat for Python DataSources); the file-drop leg uses
availableNow (its no-data batch does flush). Prints one JSON line.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataflow_example_spark.config import TrafficConfig
from dataflow_example_spark.operators.traffic import (
    extract_flow_info,
    traffic_pipeline,
)
from dataflow_example_spark.session import get_spark
from dataflow_example_spark.sources import pybus
from dataflow_example_spark.sources.text import read_text, stream_text
from dataflow_example_spark.streaming import drain

UTC = datetime.timezone.utc
BASE_TS = datetime.datetime(2010, 1, 2, 0, 0, 0)
N_STATIONS = 600
# Event times must span WELL past the 60-min window duration or no
# window ever closes (watermark = max event ts; append emits only
# window_end <= watermark) and both drains legitimately emit 0 rows.
SPAN_S = 3 * 3600
PUBLISH_TS = datetime.datetime(2020, 1, 1, tzinfo=UTC)


def _ts_step(n_lines: int) -> int:
    """Per-station reading cadence so n_lines cover ~SPAN_S of event
    time at any scale (each (station, ts) unique -> deterministic)."""
    return max(1, SPAN_S * N_STATIONS // n_lines)


def _partition_lines(ids, step: int) -> list[str]:
    """Deterministic PeMS lines for a block of ids (runs on executors)."""
    from dataflow_example_spark.synth import pems_line

    out = []
    for i in ids:
        t = BASE_TS + datetime.timedelta(seconds=(i // N_STATIONS) * step)
        out.append(
            pems_line(
                t.strftime("%m/%d/%Y %H:%M:%S"),
                f"S{i % N_STATIONS:03d}",
                flow=(i * 7) % 100,
                occ=((i * 3) % 128) / 128.0,
                speed=40.0 + ((i * 13) % 512) / 8.0,
                total_flow=i % 300,
            )
        )
    return out


def _cfg() -> TrafficConfig:
    return TrafficConfig(
        streaming=True,
        streaming_honor_payload_timestamp=True,
        watermark_delay="0 seconds",
        window_duration_minutes=60,
        window_slide_minutes=1,
    )


def _batch_closed(spark, lines_path: str):
    """Batch twin restricted to the windows append mode emits."""
    batch_cfg = TrafficConfig(window_duration_minutes=60, window_slide_minutes=1)
    lines = read_text(spark, lines_path)
    out = traffic_pipeline(lines, batch_cfg)
    max_ts = extract_flow_info(lines).agg(F.max("event_ts")).collect()[0][0]
    return out.filter(F.col("window_timestamp") <= F.lit(max_ts))


def _assert_parity(spark, sink_path: str, twin) -> int:
    sink = spark.read.parquet(sink_path)
    missing = twin.exceptAll(sink).count()
    extra = sink.exceptAll(twin).count()
    assert missing == 0 and extra == 0, (
        f"stream/batch parity broken: {missing} missing, {extra} extra"
    )
    return sink.count()


def main() -> None:
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    segments = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch_lines = int(os.environ.get("PYBUS_BATCH_LINES", "0")) or None
    trigger_ms = int(os.environ.get("PYBUS_TRIGGER_MS", "1000"))
    passthrough = os.environ.get("PYBUS_PASSTHROUGH", "") == "1"
    spark = get_spark(app_name="stream-bench-pybus")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="pybus_bench_")
    broker = os.path.join(base, "broker")

    # --- executor-side publish: one segment per partition -------------
    t0 = time.time()
    rdd = spark.sparkContext.range(0, n_lines, numSlices=segments)
    bdir = broker  # close over the path; executors import pybus themselves
    step = _ts_step(n_lines)
    rdd.foreachPartition(
        lambda ids: __import__(
            "dataflow_example_spark.sources.pybus", fromlist=["publish"]
        ).publish(_partition_lines(list(ids), step), bdir, publish_ts=PUBLISH_TS)
    )
    publish_sec = time.time() - t0
    _log(f"published in {publish_sec:.1f}s")
    n_segs = len(pybus._segment_indices(broker))
    assert n_segs == segments, f"expected {segments} segments, got {n_segs}"

    # plain-text mirror of the payloads for the batch twin + file-drop leg
    payloads = os.path.join(base, "payloads")
    (
        spark.read.text(os.path.join(broker, "seg-*.txt"))
        .select(F.split("value", "\t", 2)[1].alias("value"))
        .repartition(segments)
        .write.text(payloads)
    )
    _log("payload mirror written")
    if passthrough:
        twin = None
        twin_rows = n_lines  # parity = exact input row count at the sink
    else:
        twin = _batch_closed(spark, payloads)
        twin.persist()
        twin_rows = twin.count()
        _log(f"batch twin rows={twin_rows}")
        assert twin_rows > 0, (
            "no closed windows in the batch twin — event-time span too "
            "short for the window duration; both drains would vacuously "
            "emit 0 rows"
        )

    def leg(df):
        """Apply the measured graph: full traffic pipeline, or bare
        source passthrough when isolating the source cost."""
        if passthrough:
            return df.select("value")
        return traffic_pipeline(df, _cfg(), ingest_ts_col="ingest_ts")

    def check(sink_path):
        if twin is not None:
            return _assert_parity(spark, sink_path, twin)
        n = spark.read.parquet(sink_path).count()
        assert n == n_lines, f"passthrough lost rows: {n} != {n_lines}"
        return n

    # --- pybus leg: processingTime trigger, poll-until-stable ---------
    out1, ck1 = os.path.join(base, "out_pybus"), os.path.join(base, "ck_pybus")
    t0 = time.time()
    q = (
        leg(pybus.stream_pybus(spark, broker, batch_lines=batch_lines))
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", ck1)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
    deadline = time.time() + 900
    n = prev = -1
    while time.time() < deadline:
        try:
            n = spark.read.parquet(out1).count()
        except Exception:  # noqa: BLE001 — sink dir not yet created
            n = 0
        if n > 0 and n == prev:
            break
        _log(f"pybus sink rows={n}")
        prev = n
        time.sleep(2)
    q.stop()
    pybus_sec = time.time() - t0
    pybus_out = check(out1)

    # --- file-drop leg: same lines, availableNow ----------------------
    out2, ck2 = os.path.join(base, "out_drop"), os.path.join(base, "ck_drop")
    t0 = time.time()
    q = (
        leg(stream_text(spark, payloads))
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ck2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 900)
    _log("file-drop drained")
    drop_sec = time.time() - t0
    drop_out = check(out2)

    print(
        json.dumps(
            {
                "metric": "pybus_drain_rows_per_sec",
                "value": round(n_lines / pybus_sec, 1),
                "unit": "rows/sec",
                "input_lines": n_lines,
                "segments": segments,
                "publish_sec": round(publish_sec, 2),
                "knobs": {
                    "batch_lines": batch_lines,
                    "trigger_ms": trigger_ms,
                    "passthrough": passthrough,
                },
                "pybus": {
                    "wall_sec": round(pybus_sec, 2),
                    "rows_per_sec": round(n_lines / pybus_sec, 1),
                    "output_rows": pybus_out,
                    "note": (
                        f"processingTime {trigger_ms}ms + 2s stability "
                        "poll included"
                    ),
                },
                "file_drop": {
                    "wall_sec": round(drop_sec, 2),
                    "rows_per_sec": round(n_lines / drop_sec, 1),
                    "output_rows": drop_out,
                },
                # In passthrough mode no windows are computed — reporting
                # the raw input line count under closed_window_rows made
                # cross-mode comparisons misleading (ADVICE r14); the
                # expectation is keyed by mode instead.
                (
                    "expected_sink_rows"
                    if passthrough
                    else "closed_window_rows"
                ): twin_rows,
                "parity": "rowcount" if passthrough else "exact",
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
