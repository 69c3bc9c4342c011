"""Custom stateful streaming operator tests (streaming/stateful.py):
batch/stream parity for gap-session throttling, cross-batch state
persistence, and state-timeout hygiene."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataflow_example_spark.streaming.stateful import (
    throttle_batch,
    throttle_stream,
)

SCHEMA = "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE"
from dataflow_example_spark.streaming import drain


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, src_dir, ckpt, gap_seconds=1800, files_per_trigger=1):
    lines = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .json(src_dir)
        .withWatermark("ts", "0 seconds")
    )
    out = throttle_stream(
        lines,
        keys=["user_id", "event_type"],
        ts_col="ts",
        gap_seconds=gap_seconds,
        order_col="event_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("throttled")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 120)
    return spark.sql("SELECT * FROM throttled")


def _ev(eid, uid, typ, ts, v=1.0):
    return {
        "event_id": eid,
        "user_id": uid,
        "event_type": typ,
        "ts": ts,
        "value": v,
    }


def test_stream_throttle_single_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(
        src / "a.json",
        [
            _ev(1, 1, "click", "2024-01-01T10:00:00"),
            _ev(2, 1, "click", "2024-01-01T10:10:00"),  # within gap: dropped
            _ev(3, 1, "click", "2024-01-01T11:00:00"),  # new session
            _ev(4, 1, "view", "2024-01-01T10:05:00"),   # other key
            _ev(5, 2, "click", "2024-01-01T10:05:00"),  # other user
        ],
    )
    out = _run_stream(spark, str(src), str(tmp_path / "ck"))
    assert sorted(r.event_id for r in out.collect()) == [1, 3, 4, 5]


def test_stream_throttle_state_spans_batches(spark, tmp_path):
    """Key seen in batch 1 suppresses its in-gap repeat in batch 2."""
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.json", [_ev(1, 1, "click", "2024-01-01T10:00:00")])
    import time

    time.sleep(0.05)  # distinct mtimes => deterministic file order
    _write_jsonl(
        src / "b.json",
        [
            _ev(2, 1, "click", "2024-01-01T10:10:00"),  # in gap: dropped
            _ev(3, 1, "click", "2024-01-01T12:00:00"),  # new session
        ],
    )
    out = _run_stream(spark, str(src), str(tmp_path / "ck"))
    assert sorted(r.event_id for r in out.collect()) == [1, 3]


def test_stream_matches_batch_on_events_replay(spark, tmp_path):
    """Parity: streaming replay of real events == throttle_batch."""
    from dataflow_example_spark.tables import load

    ev = (
        load(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .filter(F.col("user_id") < 10)
    )
    rows = [
        {
            "event_id": r.event_id,
            "user_id": r.user_id,
            "event_type": r.event_type,
            "ts": r.ts.isoformat(),
            "value": r.value,
        }
        for r in ev.orderBy("ts", "event_id").collect()
    ]
    src = tmp_path / "src"
    src.mkdir()
    # split in-order into 3 replay files == 3 micro-batches
    third = (len(rows) + 2) // 3
    import time

    for i in range(3):
        _write_jsonl(src / f"part{i}.json", rows[i * third : (i + 1) * third])
        time.sleep(0.05)
    streamed = _run_stream(spark, str(src), str(tmp_path / "ck"))
    expected = throttle_batch(
        ev, ["user_id", "event_type"], "ts", "30 MINUTES", "event_id"
    )
    got = sorted(r.event_id for r in streamed.collect())
    want = sorted(r.event_id for r in expected.collect())
    assert got == want and len(want) > 0


def test_transform_with_state_running_agg_matches_batch(spark, tmp_path):
    """Spark 4 transformWithStateInPandas running count/sum per user ==
    the batch cumulative-window twin on in-order replay.

    The transformWithState Python worker needs a working protobuf
    install; skip when the container lacks one (the operator itself is
    plain PySpark and runs on any normally-provisioned cluster)."""
    import pytest as _pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip("google.protobuf unavailable: transformWithState "
                     "worker cannot start in this container")
    import json

    import pyspark.sql.functions as F

    from dataflow_example_spark.streaming.running import (
        running_batch,
        running_stream,
    )
    from dataflow_example_spark.tables import load

    ev = (
        load(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "ts", "value")
        .filter(F.col("user_id") < 10)
    )
    src = tmp_path / "run_src"
    src.mkdir()
    with open(src / "events.json", "w") as f:
        for r in ev.orderBy("ts", "event_id").collect():
            f.write(
                json.dumps(
                    {
                        "event_id": r.event_id,
                        "user_id": r.user_id,
                        "ts": r.ts.isoformat(),
                        "value": r.value,
                    }
                )
                + "\n"
            )
    schema = "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withWatermark("ts", "0 seconds")
    )
    out = running_stream(
        stream, keys=["user_id"], ts_col="ts", id_col="event_id",
        value_col="value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_run"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 120)
    got = {
        (r.user_id, r.event_id): (r.running_n, r.running_sum)
        for r in spark.sql("SELECT * FROM running").collect()
    }
    want = {
        (r.user_id, r.event_id): (r.running_n, r.running_sum)
        for r in running_batch(
            ev, keys=["user_id"], ts_col="ts", id_col="event_id",
            value_col="value",
        ).collect()
    }
    assert got and got == want


def test_running_fold_bit_parity_with_scalar_loop():
    """The vectorized _running_fold (np.add.accumulate seeded with the
    carried state) must reproduce the scalar fold ((s+v0)+v1)+...
    BIT-for-bit — the float-identity contract with running_batch's
    ascending window sum. Runs without the transformWithState worker,
    so it covers the fold even where the engine-level parity test
    skips. Adversarial values included: denormals, huge/tiny mixes
    whose rounding exposes any regrouping, NaN/inf propagation."""
    import math
    import random

    import numpy as np

    from dataflow_example_spark.streaming.running import _running_fold

    rng = random.Random(42)
    cases = [
        [0.1] * 10,
        [1e308, 1e-308, -1e308, 5e-324, 1.0],
        [math.inf, 1.0, -math.inf],
        [float("nan"), 1.0],
        [rng.uniform(-1e6, 1e6) for _ in range(997)],
        [rng.choice([1e-12, 1e12, -1e12, 0.3]) for _ in range(256)],
    ]
    seeds = [(0, 0.0), (7, 123.456), (3, -1e15), (1, 1e-300)]
    for vals in cases:
        for n0, s0 in seeds:
            # scalar reference: the loop the vectorized fold replaced
            n, s = n0, s0
            ref_ns, ref_sums = [], []
            for v in vals:
                n += 1
                s += v
                ref_ns.append(n)
                ref_sums.append(s)
            ns, sums, n_out, s_out = _running_fold(
                np.asarray(vals, dtype="float64"), n0, s0
            )
            assert list(ns) == ref_ns
            assert n_out == n
            # bit-level compare (NaN != NaN under ==)
            ref_bits = np.asarray(ref_sums, dtype="float64").view("int64")
            got_bits = np.asarray(sums, dtype="float64").view("int64")
            assert got_bits.tolist() == ref_bits.tolist()
            assert np.asarray([s_out], dtype="float64").view("int64")[
                0
            ] == np.asarray([s], dtype="float64").view("int64")[0]
