"""Dirty-input sweep for the STREAMING ingest path (VERDICT r11 item 8).

tools/dirty_input_sweep.py pins no-crash over dirty TABLE rows for all
238 registry queries — including the six streaming_*_parity drains. What
it cannot exercise is adversarial data at the INGEST layer: raw lines
arriving through the file-drop source DURING an availableNow drain. This
sweep covers that, in two sections:

Section 1 — the six streaming parity queries against the dirty-tables
dir (same builder as dirty_input_sweep), listed explicitly so the
streaming drains have their own named evidence.

Section 2 — a two-drain traffic ingest scenario against one checkpoint:

  drain 1: clean synthesized PeMS lines + a malformed-garbage file
           (header, empty/whitespace lines, 48-field line — the
           reference's crash case, trailing commas, binary junk,
           unicode junk, a truncated record). Must not crash; the sink
           must equal the batch twin over the CLEAN lines restricted to
           windows whose end <= the drain's final watermark (malformed
           lines contribute nothing).
  drain 2: a LATE file (lines whose windows closed in drain 1 — one
           brand-new late record and one exact duplicate of a clean
           drain-1 line) plus one genuinely NEW line 2 hours past the
           previous maximum. The checkpointed watermark must drop both
           late lines (their windows are closed state), the new line
           must advance the watermark and flush the previously-open
           window, and the final sink must equal the batch twin over
           clean + new line ONLY — i.e. late/duplicate/malformed lines
           injected mid-stream change nothing.

Exit 0 iff every section passes.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.001"

STREAMING_PARITIES = [
    "streaming_traffic_parity",
    "streaming_dedup_parity",
    "streaming_sliding_parity",
    "streaming_session_parity",
    "streaming_join_parity",
    "streaming_enrich_parity",
]

MALFORMED = [
    "Timestamp,Station,Freeway,Direction",  # header
    "",  # empty
    "   \t  ",  # whitespace
    ",".join(["bad"] * 48),  # 48 fields: the reference's crash case
    "01/01/2010 00:00:00,S001," + "x," * 60,  # trailing commas
    "\x00\xfe binary junk \x07",
    "naïve café 你好 🚀",
    "01/01/2010 00:00:00,S001,1",  # truncated record
]


def _write_lines(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8", errors="replace") as f:
        f.write("\n".join(lines) + "\n")


def _batch_twin(spark, lines_df, cfg_batch, max_event_ts):
    """The unified-model oracle: the SAME transform over a bounded input,
    restricted to windows the watermark has closed — window END <= max
    EVENT time, the append-mode emission rule the registry parity oracle
    pins (oracles.py streaming_traffic_parity)."""
    from dataflow_example_spark.operators.traffic import traffic_pipeline

    out = traffic_pipeline(lines_df, cfg_batch)
    return out.filter(F.col("window_timestamp") <= F.lit(max_event_ts))


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def section_streaming_parities(spark) -> list[str]:
    from dataflow_example_spark import queries as Q
    from dataflow_example_spark.functions.cachereg import cleanup
    from dirty_input_sweep import build_dirty_tables

    dest = tempfile.mkdtemp(prefix="dfx_dirty_stream_tbl_")
    build_dirty_tables(dest)
    fails = []
    for name in STREAMING_PARITIES:
        t0 = time.time()
        try:
            Q.QUERIES[name](spark, dest).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"ok    {name} [dirty tables] ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 - sweep reports, not raises
            fails.append(name)
            msg = str(e).strip().splitlines()
            print(f"FAIL  {name}: {msg[0][:200] if msg else type(e).__name__}")
        finally:
            cleanup()
    shutil.rmtree(dest, ignore_errors=True)
    return fails


def section_ingest_adversarial(spark) -> list[str]:
    import datetime

    from dataflow_example_spark.config import TrafficConfig
    from dataflow_example_spark.streaming import drain
    from dataflow_example_spark.streaming.traffic import run_traffic_stream
    from dataflow_example_spark.synth import synth_traffic_lines

    # Python strptime twin of schemas.TS_FORMAT_SPARK ("MM/dd/yyyy HH:mm:ss")
    TS_FMT_PY = "%m/%d/%Y %H:%M:%S"

    fails: list[str] = []
    base = tempfile.mkdtemp(prefix="dfx_dirty_stream_ing_")
    topic = os.path.join(base, "topic")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(topic)

    clean = [
        r["value"]
        for r in synth_traffic_lines(spark, SRC).collect()
    ]

    # one clean line to duplicate late, and the corpus max event time
    def ts_of(line: str) -> "datetime.datetime":
        return datetime.datetime.strptime(line.split(",")[0], TS_FMT_PY)

    max_ts = max(ts_of(ln) for ln in clean)
    oldest = min(clean, key=ts_of)

    # the ONE shared valid-line builder (synth.pems_line) — no local copy
    from dataflow_example_spark.synth import pems_line

    _write_lines(os.path.join(topic, "00_clean.txt"), clean)
    _write_lines(os.path.join(topic, "01_malformed.txt"), MALFORMED)

    cfg_stream = TrafficConfig(
        window_duration_minutes=60,
        window_slide_minutes=60,
        streaming=True,
        streaming_honor_payload_timestamp=True,
        watermark_delay="0 seconds",
    )
    cfg_batch = TrafficConfig(
        window_duration_minutes=60, window_slide_minutes=60
    )

    t0 = time.time()
    got1: set[tuple] = set()
    try:
        drain(
            run_traffic_stream(
                spark, topic, out_dir, ckpt, cfg_stream, available_now=True
            ),
            600,
        )
        got1 = _rows(spark.read.parquet(out_dir))
        clean_df = spark.createDataFrame(
            [(ln,) for ln in clean], "value string"
        )
        want1 = _rows(_batch_twin(spark, clean_df, cfg_batch, max_ts))
        assert got1 == want1, (
            f"drain1: {len(got1)} sink rows != {len(want1)} batch-twin rows"
        )
        print(f"ok    drain1 malformed-drop parity "
              f"({len(got1)} rows, {time.time() - t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        fails.append("drain1_malformed")
        print(f"FAIL  drain1_malformed: {str(e).strip().splitlines()[0][:200]}")

    # drain 2: two late lines (one new late record in the oldest closed
    # window + one exact duplicate of a drain-1 line) and one new line
    # 2 hours past the previous max to advance the watermark.
    late_new = pems_line(oldest.split(",")[0], "S999", 42)
    new_dt = max_ts + datetime.timedelta(hours=2)
    fresh = pems_line(new_dt.strftime(TS_FMT_PY), "S998", 77)
    _write_lines(
        os.path.join(topic, "02_late_and_new.txt"),
        [late_new, oldest, fresh],
    )
    t0 = time.time()
    try:
        drain(
            run_traffic_stream(
                spark, topic, out_dir, ckpt, cfg_stream, available_now=True
            ),
            600,
        )
        got2 = _rows(spark.read.parquet(out_dir))
        with_new = spark.createDataFrame(
            [(ln,) for ln in clean + [fresh]], "value string"
        )
        want2 = _rows(_batch_twin(spark, with_new, cfg_batch, new_dt))
        assert got2 == want2, (
            f"drain2: {len(got2)} sink rows != {len(want2)} "
            "(late/duplicate lines must contribute nothing; the fresh "
            "line must flush the open window)"
        )
        # the watermark advance must have flushed NEW windows (the
        # previously-open max-ts window), not just replayed drain 1
        assert len(got2) > len(got1), (len(got1), len(got2))
        print(f"ok    drain2 late/duplicate-drop + watermark-advance parity "
              f"({len(got2)} rows, {time.time() - t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        fails.append("drain2_late_duplicate")
        print(
            f"FAIL  drain2_late_duplicate: "
            f"{str(e).strip().splitlines()[0][:200]}"
        )

    shutil.rmtree(base, ignore_errors=True)
    return fails


def main() -> int:
    from dataflow_example_spark.session import get_spark

    spark = get_spark(app_name="dirty-stream-sweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    fails = section_streaming_parities(spark)
    fails += section_ingest_adversarial(spark)
    total = len(STREAMING_PARITIES) + 2
    print(f"{total - len(fails)}/{total} streaming dirty-input checks pass")
    if fails:
        print("failures:", ", ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
