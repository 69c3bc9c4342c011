"""Streaming throughput bench: replay the sf0.1 events table through the
watermarked sliding-window aggregation (file-drop topic, availableNow)
and report end-to-end drain throughput — the streaming twin of bench.py.

    python tools/stream_bench.py [sf_dir]

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

from dataflow_example_spark.session import get_spark
from dataflow_example_spark.streaming.events import run_sliding_stream
from dataflow_example_spark.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="stream_bench_")
    topic = os.path.join(base, "topic")
    ev = load(spark, sf_dir, "events")
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
    out_rows = spark.read.parquet(os.path.join(base, "out")).count()
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
            }
        )
    )


if __name__ == "__main__":
    main()
