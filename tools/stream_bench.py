"""Streaming throughput bench: replay the sf0.1 events table through the
watermarked sliding-window aggregation (file-drop topic, availableNow)
and report end-to-end drain throughput — the streaming twin of bench.py.

    python tools/stream_bench.py [sf_dir] [factor]

`factor` > 1 amplifies the replay (r11 scale smoke): copy i re-keys
event_type with a copy suffix, so BOTH input rows and the stateful
aggregation's key cardinality (windows x event types — the state the
store actually holds) grow by factor. Every run, at every factor,
asserts exact parity against the batch twin on the same input (same
window/count/DECIMAL-sum expression, filtered to window_end <= max
event ts — the append-mode emission rule), so throughput numbers can
never come from a silently wrong drain.

Prints one JSON line: {"metric": "stream_drain_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataflow_example_spark.session import get_spark
from dataflow_example_spark.streaming.events import run_sliding_stream
from dataflow_example_spark.tables import load


def amplified_events(spark, sf_dir: str, factor: int):
    """factor-x replay corpus: copy i re-keys event_type (state keys
    scale with factor) and offsets event_id (globally unique, unused by
    the aggregation); ts/value stay as-is so the window profile and the
    per-copy aggregates are identical to the base table's."""
    ev = load(spark, sf_dir, "events")
    if factor == 1:
        return ev
    copies = [
        ev.withColumn(
            "event_type", F.concat(F.col("event_type"), F.lit(f"_c{i}"))
        ).withColumn("event_id", F.col("event_id") + i * 10**9)
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def batch_twin(spark, topic: str, schema):
    """The drain's batch equivalent: same window/count/DECIMAL-sum
    expression over the topic read statically, filtered to the windows
    append mode emits (window_end <= max event ts at zero watermark
    delay)."""
    from dataflow_example_spark.streaming.events import DEC

    ev = spark.read.schema(schema).parquet(topic)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .filter(F.col("window_end") <= F.lit(max_ts))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="stream_bench_")
    topic = os.path.join(base, "topic")
    ev = amplified_events(spark, sf_dir, factor)
    n_rows = ev.count()
    # 16 topic files ~ 16 source partitions per micro-batch
    ev.repartition(16).write.mode("overwrite").parquet(topic)

    t0 = time.time()
    q = run_sliding_stream(
        spark,
        topic,
        output_dir=os.path.join(base, "out"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        schema=ev.schema,
    )
    from dataflow_example_spark.streaming import drain; drain(q, 600)
    wall = time.time() - t0
    sink = spark.read.parquet(os.path.join(base, "out"))
    out_rows = sink.count()

    twin = batch_twin(spark, topic, ev.schema)
    missing = twin.exceptAll(sink).count()
    extra = sink.exceptAll(twin).count()
    assert missing == 0 and extra == 0, (
        f"stream/batch parity broken at factor {factor}: "
        f"{missing} missing, {extra} extra window rows"
    )
    print(
        json.dumps(
            {
                "metric": "stream_drain_rows_per_sec",
                "value": round(n_rows / wall, 1),
                "unit": "rows/sec",
                "input_rows": n_rows,
                "output_windows": out_rows,
                "wall_sec": round(wall, 2),
                "sf_dir": sf_dir,
                "factor": factor,
                "parity": "exact",
            }
        )
    )


if __name__ == "__main__":
    main()
