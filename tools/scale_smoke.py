"""Scale smoke: run the flagship traffic pipeline on an amplified input
(~10x sf0.1 => ~1M readings => ~8M lane rows => ~60M window-instances
pre-two-phase) to verify the plan's scaling behavior — wall time should
grow roughly linearly with input, not quadratically, and nothing OOMs.

    python tools/scale_smoke.py [amplification]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataflow_example_spark.config import TrafficConfig
from dataflow_example_spark.operators.traffic import traffic_pipeline
from dataflow_example_spark.session import get_spark
from dataflow_example_spark.synth import synth_traffic_lines
from dataflow_example_spark.tables import load


def amplified_lines(spark, sf_dir: str, factor: int):
    """Union `factor` shifted copies of events (distinct event_ids and
    user_ids per copy => distinct stations/readings) and synthesize CSV
    lines from the union — a deterministic ~factor-times-larger corpus."""
    ev = load(spark, sf_dir, "events")
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} HOURS")).alias("ts"),
            (F.col("user_id") + F.lit(i * 1000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.createOrReplaceTempView("events_amplified")

    # reuse the synthesis path against the amplified view
    import dataflow_example_spark.synth as synth
    import dataflow_example_spark.tables as tables

    orig_load = tables.load

    def patched(spark_, sf_dir_, name):
        if name == "events":
            return spark_.table("events_amplified")
        return orig_load(spark_, sf_dir_, name)

    synth.load = patched
    try:
        return synth_traffic_lines(spark, sf_dir)
    finally:
        synth.load = orig_load


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"

    t0 = time.time()
    lines = amplified_lines(spark, sf_dir, factor)
    n_lines = lines.count()
    t_synth = time.time() - t0

    t0 = time.time()
    out = traffic_pipeline(lines, TrafficConfig())
    out.write.format("noop").mode("overwrite").save()
    t_pipe = time.time() - t0

    n_out = out.count()
    print(
        f"amplification={factor}x lines={n_lines} out_rows={n_out} "
        f"synth={t_synth:.1f}s pipeline={t_pipe:.1f}s"
    )


if __name__ == "__main__":
    main()
