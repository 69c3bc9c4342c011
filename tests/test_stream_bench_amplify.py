"""Pin the streaming scale smoke's amplification contract (r11).

`tools/stream_bench.py [sf_dir] [factor]` is judged evidence for the
streaming 100 TB story; its corpus builder must keep the properties the
parity assertion and the throughput reading depend on: factor x N rows,
globally distinct event_ids, event_type key cardinality scaled by
factor (that is what grows the aggregation STATE), and copy 0
byte-identical to the source so the base window profile survives.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_amplified_events_invariants(spark):
    from stream_bench import amplified_events

    from dataflow_example_spark.tables import load

    base = load(spark, SF_DIR, "events")
    n = base.count()
    k = base.select("event_type").distinct().count()

    big = amplified_events(spark, SF_DIR, 3)
    assert big.count() == 3 * n
    assert big.select("event_id").distinct().count() == 3 * n
    assert big.select("event_type").distinct().count() == 3 * k

    # copy 0 (suffix _c0) carries the base rows unchanged up to the
    # suffix; ts/value/user_id identical so the window profile is the
    # base table's
    c0 = big.filter(F.col("event_type").endswith("_c0")).select(
        "event_id",
        "ts",
        "user_id",
        F.regexp_replace("event_type", "_c0$", "").alias("event_type"),
        "value",
        "props",
    )
    cols = base.columns
    assert c0.select(cols).exceptAll(base.select(cols)).count() == 0
    assert base.select(cols).exceptAll(c0.select(cols)).count() == 0

    # factor 1 is the identity (the 1x bench path is untouched)
    same = amplified_events(spark, SF_DIR, 1)
    assert same.select(cols).exceptAll(base.select(cols)).count() == 0
