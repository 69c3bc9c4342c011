"""sources/pybus.py — the Python DataSource message-bus stand-in for the
reference's Pub/Sub source (SURVEY.md §2 op 2; TrafficMaxLaneFlow.java:
375-379). Unlike the Kafka adapter (jar not fetchable in this
container), this source runs here, so the full Structured Streaming
source lifecycle — initialOffset/latestOffset/partitions/read/commit,
checkpointed exactly-once restart — gets real coverage, plus end-to-end
parity of the traffic pipeline drained through it."""

from __future__ import annotations

import datetime
import os

import pyspark.sql.functions as F

from dataflow_example_spark.config import TrafficConfig
from dataflow_example_spark.operators.traffic import (
    extract_flow_info,
    traffic_pipeline,
)
from dataflow_example_spark.sources import pybus
from dataflow_example_spark.sources.text import read_text
from dataflow_example_spark.streaming import drain

UTC = datetime.timezone.utc


def _drain_to_parquet(
    spark, broker, out, ck, transform=None, fail_on_data_loss=True
):
    df = pybus.stream_pybus(
        spark, broker, fail_on_data_loss=fail_on_data_loss
    )
    if transform is not None:
        df = transform(df)
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 180)


def test_contract_and_publish_time(spark, tmp_path):
    broker = str(tmp_path / "broker")
    pybus.publish(
        ["a,1", "b,2"], broker,
        publish_ts=datetime.datetime(2020, 1, 1, tzinfo=UTC),
    )
    df = pybus.stream_pybus(spark, broker)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["value", "ingest_ts"]

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_to_parquet(spark, broker, out, ck)
    rows = {r["value"]: r["ingest_ts"] for r in spark.read.parquet(out).collect()}
    # publish time surfaces as ingest_ts (session TZ pinned UTC)
    assert rows == {
        "a,1": datetime.datetime(2020, 1, 1),
        "b,2": datetime.datetime(2020, 1, 1),
    }


def test_exactly_once_checkpoint_restart(spark, tmp_path):
    """A second availableNow drain over the same checkpoint consumes ONLY
    segments published after the first — offsets resume, nothing is
    reprocessed (the exactly-once upgrade over the reference's
    at-least-once injector, PubsubFileInjector.java:37-40)."""
    broker = str(tmp_path / "broker")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    pybus.publish(["one"], broker, publish_ts=datetime.datetime(2020, 1, 1, tzinfo=UTC))
    pybus.publish(["two"], broker, publish_ts=datetime.datetime(2020, 1, 2, tzinfo=UTC))
    _drain_to_parquet(spark, broker, out, ck)
    assert sorted(r["value"] for r in spark.read.parquet(out).collect()) == ["one", "two"]

    pybus.publish(["three"], broker, publish_ts=datetime.datetime(2020, 1, 3, tzinfo=UTC))
    _drain_to_parquet(spark, broker, out, ck)
    got = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert got == ["one", "three", "two"]  # exactly once each


def test_injector_filters_headers_and_empties(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("Timestamp,Station\n\nreal,line,1\n\nreal,line,2\n")
    broker = str(tmp_path / "broker")
    n = pybus.inject_file(spark, str(src), broker, chunks=2)
    assert n == 2
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_to_parquet(spark, broker, out, ck)
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["real,line,1", "real,line,2"]


def test_traffic_parity_through_pybus(spark, tmp_path):
    """The reference graph drained through the Python-DataSource bus
    equals the batch run of the same lines restricted to watermark-closed
    windows — the same unified-model contract the file-drop parity test
    pins, now through a source with real offset management.

    Uses a processingTime trigger: availableNow over a Python DataSource
    is single-batch (no no-data batch), so a watermarked append agg
    would never flush — the documented pybus trigger caveat."""
    import time

    from dataflow_example_spark.synth import pems_line

    lines = ["Timestamp,header,row"]
    for minute in range(3):
        for st in ("S001", "S002"):
            lines.append(
                pems_line(
                    f"01/02/2010 10:0{minute}:00", st,
                    flow=10 + minute, occ=0.25, speed=60.5, total_flow=120,
                )
            )
    src = tmp_path / "traffic.csv"
    src.write_text("\n".join(lines) + "\n")

    broker = str(tmp_path / "broker")
    assert pybus.inject_file(spark, str(src), broker, chunks=2) == 6

    cfg = TrafficConfig(
        streaming=True,
        streaming_honor_payload_timestamp=True,
        watermark_delay="0 seconds",
        window_duration_minutes=2,
        window_slide_minutes=1,
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    df = traffic_pipeline(
        pybus.stream_pybus(spark, broker), cfg, ingest_ts_col="ingest_ts"
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    # poll until the no-data batch has flushed the closed windows, then
    # require one stable re-read so we compare a settled sink
    deadline = time.time() + 120
    n = prev = 0
    while time.time() < deadline:
        try:
            n = spark.read.parquet(out).count()
        except Exception:
            n = 0
        if n > 0 and n == prev:
            break
        prev = n
        time.sleep(2)
    q.stop()
    stream_rows = {tuple(r) for r in spark.read.parquet(out).collect()}

    batch_cfg = TrafficConfig(window_duration_minutes=2, window_slide_minutes=1)
    batch = traffic_pipeline(read_text(spark, str(src)), batch_cfg)
    lane_info = extract_flow_info(read_text(spark, str(src)))
    max_event_ts = lane_info.agg(F.max("event_ts")).collect()[0][0]
    closed = batch.filter(F.col("window_timestamp") <= F.lit(max_event_ts))
    batch_rows = {tuple(r) for r in closed.collect()}

    assert stream_rows
    assert stream_rows == batch_rows


def test_publish_rejects_newline_payloads(tmp_path):
    """Line-framing contract: an embedded newline would re-frame the
    immutable segment and poison every checkpoint replay of it — reject
    at the producer, where the error is actionable."""
    import pytest

    with pytest.raises(ValueError, match="line-framed"):
        pybus.publish(["a\nb"], str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="line-framed"):
        pybus.publish(["a\rb"], str(tmp_path / "broker"))


def test_concurrent_publishers_never_lose_a_segment(tmp_path):
    """The index claim is os.link (atomic; FileExistsError on a taken
    index -> retry next), not os.rename (silent replace): racing
    producers interleave losslessly."""
    import threading

    broker = str(tmp_path / "broker")
    errors = []

    def worker(k):
        try:
            for j in range(10):
                pybus.publish([f"w{k}-m{j}"], broker)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # every one of the 40 segments survived with its message intact
    idxs = pybus._segment_indices(broker)
    assert len(idxs) == 40 and idxs == list(range(40))
    msgs = set()
    for i in idxs:
        with open(pybus._segment_path(broker, i), encoding="utf-8") as f:
            for line in f:
                msgs.add(line.rstrip("\n").split("\t", 1)[1])
    assert msgs == {f"w{k}-m{j}" for k in range(4) for j in range(10)}
    # the persisted frontier saw every racing claim (monotonic max)
    assert pybus._read_frontier(broker) == 40


def test_missing_segment_fails_loud_by_default(spark, tmp_path):
    """A segment missing from a committed range FAILS the batch under the
    default failOnDataLoss=true (the Kafka source convention, ADVICE r13):
    a bad path / unmounted broker dir / contract-violating cleanup must
    surface, not read as zero data. Restarting the SAME checkpoint with
    failOnDataLoss=false is the documented escape — the stream degrades
    past the loss and progresses."""
    import pyspark.errors

    broker = str(tmp_path / "broker")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    ts = datetime.datetime(2020, 1, 1, tzinfo=UTC)
    pybus.publish(["a"], broker, publish_ts=ts)
    _drain_to_parquet(spark, broker, out, ck)
    i1 = pybus.publish(["lost"], broker, publish_ts=ts)
    pybus.publish(["kept"], broker, publish_ts=ts)
    os.unlink(pybus._segment_path(broker, i1))
    try:
        _drain_to_parquet(spark, broker, out, ck)
        raise AssertionError("drain over a lost segment did not fail")
    except pyspark.errors.exceptions.base.PySparkException as e:
        assert "failOnDataLoss" in str(e)  # the message names the escape
    # the poison-pill escape: the same checkpoint, opt-in degrade
    _drain_to_parquet(spark, broker, out, ck, fail_on_data_loss=False)
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["a", "kept"]


def test_missing_segment_reads_empty_when_opted_in(spark, tmp_path):
    """With failOnDataLoss=false a deleted segment reads as EMPTY instead
    of failing the batch forever — the checkpoint replays the same range
    on every restart, so the degrade is what lets the stream progress
    (VERDICT r12 item 3; the retention contract in the module docstring).
    Since r14 this is opt-in rather than the default."""
    broker = str(tmp_path / "broker")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    ts = datetime.datetime(2020, 1, 1, tzinfo=UTC)
    for m in ("a", "b", "c"):
        pybus.publish([m], broker, publish_ts=ts)
    _drain_to_parquet(spark, broker, out, ck, fail_on_data_loss=False)
    assert sorted(r["value"] for r in spark.read.parquet(out).collect()) == [
        "a", "b", "c",
    ]
    # two more segments land; the FIRST of them is lost before the drain
    i3 = pybus.publish(["lost"], broker, publish_ts=ts)
    pybus.publish(["kept"], broker, publish_ts=ts)
    os.unlink(pybus._segment_path(broker, i3))
    _drain_to_parquet(spark, broker, out, ck, fail_on_data_loss=False)
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["a", "b", "c", "kept"]  # degraded, not crashed
    # and the stream still progresses afterwards
    pybus.publish(["later"], broker, publish_ts=ts)
    _drain_to_parquet(spark, broker, out, ck, fail_on_data_loss=False)
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["a", "b", "c", "kept", "later"]


def test_fail_on_data_loss_option_validation():
    """A typo'd failOnDataLoss value must fail at reader construction,
    not silently coerce to a default."""
    import pytest

    with pytest.raises(ValueError, match="failOnDataLoss"):
        pybus._PyBusStreamReader(
            {"path": "/tmp/x", "failondataloss": "yolo"}
        )


def test_batch_lines_option_validation():
    """A typo'd batchLines value ('64k', '0', 'x') must fail at reader
    construction with the crafted message, not a raw int() traceback."""
    import pytest

    for bad in ("64k", "0", "-5", "x"):
        with pytest.raises(ValueError, match="batchLines"):
            pybus._PyBusStreamReader({"path": "/tmp/x", "batchlines": bad})


def test_fresh_consumer_starts_at_earliest_available(spark, tmp_path):
    """A FRESH checkpoint on a legally retention-aged broker (old
    segments deleted once consumed by OTHER consumers) must start at the
    earliest AVAILABLE segment — Kafka 'earliest' semantics — not at
    index 0, which under failOnDataLoss=true would otherwise fail the
    first batch forever for data this consumer never committed."""
    broker = str(tmp_path / "broker")
    ts = datetime.datetime(2020, 1, 1, tzinfo=UTC)
    for m in ("old0", "old1", "kept2"):
        pybus.publish([m], broker, publish_ts=ts)
    os.unlink(pybus._segment_path(broker, 0))
    os.unlink(pybus._segment_path(broker, 1))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_to_parquet(spark, broker, out, ck)  # default fail-loud
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["kept2"]


def test_fresh_consumer_on_fully_retired_broker_uses_frontier(spark, tmp_path):
    """A fresh checkpoint on a retention-EMPTIED broker idles at the
    frontier (0 rows, no error) and picks up exactly the next publish —
    never replaying indices below the frontier."""
    broker = str(tmp_path / "broker")
    ts = datetime.datetime(2020, 1, 1, tzinfo=UTC)
    for m in ("a", "b", "c"):
        pybus.publish([m], broker, publish_ts=ts)
    for j in range(3):
        os.unlink(pybus._segment_path(broker, j))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_to_parquet(spark, broker, out, ck)  # idles: 0 rows, no error
    idx = pybus.publish(["fresh"], broker, publish_ts=ts)
    assert idx == 3
    _drain_to_parquet(spark, broker, out, ck)
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["fresh"]


def test_missing_broker_dir_fails_loud_by_default(spark, tmp_path):
    """A mistyped/unmounted broker DIR must surface under the default —
    silently planning zero partitions forever is exactly the zero-data
    outcome failOnDataLoss exists to prevent. It surfaces under the
    opt-out too when NOTHING has been observed this run (ADVICE r14: a
    reader cannot tell never-published from unmounted-after-commit, and
    guessing 0 would regress the offset log below the committed offset —
    duplicates after remount). The consumer that legitimately starts
    before its producer pre-creates the directory, and then idles at 0
    rows until the first publish."""
    import pyspark.errors

    broker = str(tmp_path / "nonexistent")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    try:
        _drain_to_parquet(spark, broker, out, ck)
        raise AssertionError("drain over a missing broker dir did not fail")
    except pyspark.errors.exceptions.base.PySparkException as e:
        assert "broker dir" in str(e)
    # the opt-out does NOT bless a missing dir: nothing observed, fail
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    try:
        _drain_to_parquet(spark, broker, out2, ck2, fail_on_data_loss=False)
        raise AssertionError(
            "opted-out drain over a missing broker dir did not fail"
        )
    except pyspark.errors.exceptions.base.PySparkException as e:
        assert "broker dir" in str(e)
    # pre-created empty dir: idle quietly until the producer appears
    os.makedirs(broker)
    out3, ck3 = str(tmp_path / "out3"), str(tmp_path / "ck3")
    _drain_to_parquet(spark, broker, out3, ck3, fail_on_data_loss=False)
    pybus.publish(["late"], broker,
                  publish_ts=datetime.datetime(2020, 1, 1, tzinfo=UTC))
    _drain_to_parquet(spark, broker, out3, ck3, fail_on_data_loss=False)
    vals = sorted(r["value"] for r in spark.read.parquet(out3).collect())
    assert vals == ["late"]


def test_publish_survives_frontier_advance_failure(tmp_path, monkeypatch):
    """publish() must NOT raise after the segment is durably linked: an
    at-least-once caller would retry and deliver the same messages
    twice. A failed frontier advance degrades to the pre-frontier lower
    bound, repaired by the next successful publish."""
    broker = str(tmp_path / "broker")
    pybus.publish(["first"], broker)
    assert pybus._read_frontier(broker) == 1

    def boom(broker_dir, nxt):
        raise OSError("disk full")

    monkeypatch.setattr(pybus, "_advance_frontier", boom)
    idx = pybus.publish(["second"], broker)  # must not raise
    assert idx == 1
    assert pybus._segment_indices(broker) == [0, 1]
    assert pybus._read_frontier(broker) == 1  # stale lower bound
    monkeypatch.undo()
    idx = pybus.publish(["third"], broker)
    assert idx == 2
    assert pybus._read_frontier(broker) == 3  # repaired


def test_publish_frontier_survives_full_retention(tmp_path):
    """Retention that deletes ALL segments (legal once consumed) must not
    reset publishing below the consumer's committed offset: the persisted
    frontier file keeps the next index monotonic even for a fresh process
    over an emptied directory (ADVICE r13)."""
    broker = str(tmp_path / "broker")
    for j in range(3):
        pybus.publish([f"m{j}"], broker)
    # full retention: every segment deleted; frontier file survives
    for j in range(3):
        os.unlink(pybus._segment_path(broker, j))
    # fresh process: no in-memory cache for this broker
    pybus._NEXT_INDEX.pop(os.path.realpath(broker), None)
    idx = pybus.publish(["fresh"], broker)
    assert idx == 3, f"restarted below the committed offset at {idx}"
    assert pybus._read_frontier(broker) == 4
    # the frontier files are not segments: readers ignore them
    assert pybus._segment_indices(broker) == [3]


def test_publish_index_cache_survives_staleness(tmp_path):
    """The per-process next-index cache is an optimization only: a cache
    pointing at already-claimed indices (another producer ran ahead) must
    still land the publish on a fresh index, including across the
    re-list jump taken after a burst of losses."""
    broker = str(tmp_path / "broker")
    for j in range(20):
        pybus.publish([f"m{j}"], broker)
    # simulate a stale process: rewind the cache far below the frontier
    pybus._NEXT_INDEX[os.path.realpath(broker)] = 0
    idx = pybus.publish(["fresh"], broker)
    assert idx == 20  # probed/jumped past all 20 claimed indices
    idxs = pybus._segment_indices(broker)
    assert idxs == list(range(21))  # nothing lost, nothing overwritten


def test_read_chunks_segments_larger_than_batch_lines(spark, tmp_path):
    """A segment longer than the Arrow chunk size (_BATCH_LINES) must
    split into multiple RecordBatches losslessly — the chunk boundary is
    the only seam in the batched read path."""
    n = pybus._PyBusStreamReader._BATCH_LINES + 1_000
    broker = str(tmp_path / "broker")
    pybus.publish(
        [f"m{i}" for i in range(n)], broker,
        publish_ts=datetime.datetime(2020, 1, 1, tzinfo=UTC),
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_to_parquet(spark, broker, out, ck)
    back = spark.read.parquet(out)
    assert back.count() == n
    # spot the two chunk-edge rows and the uniform publish stamp
    got = {r["value"] for r in back.where(
        F.col("value").isin(f"m{pybus._PyBusStreamReader._BATCH_LINES - 1}",
                            f"m{pybus._PyBusStreamReader._BATCH_LINES}")
    ).collect()}
    assert len(got) == 2
    assert back.select("ingest_ts").distinct().count() == 1


def test_publish_cache_never_fills_retention_hole(tmp_path):
    """A cached next-index pointing into a retention hole (its previous
    claim was deleted by prefix retention) must NOT be trusted: a fresh
    publish landing below the consumer's committed offset would be lost
    silently. The cache is only honored while our previously-claimed
    segment still exists; otherwise publish re-lists and lands at the
    frontier."""
    broker = str(tmp_path / "broker")
    for j in range(10):
        pybus.publish([f"m{j}"], broker)
    # prefix retention: oldest segments 0..7 deleted; frontier stays 10
    for j in range(8):
        os.unlink(pybus._segment_path(broker, j))
    # a stale long-lived producer whose cache points into the hole
    pybus._NEXT_INDEX[os.path.realpath(broker)] = 5
    idx = pybus.publish(["fresh"], broker)
    assert idx == 10, f"published into a retention hole at {idx}"
    assert pybus._segment_indices(broker) == [8, 9, 10]


def test_read_skips_hand_corrupted_segment_lines(spark, tmp_path):
    """A corrupted segment line degrades NULL-and-drop instead of
    becoming a poison pill that crashes every replay."""
    import os

    broker = str(tmp_path / "broker")
    pybus.publish(["good,1"], broker,
                  publish_ts=datetime.datetime(2020, 1, 1, tzinfo=UTC))
    # hand-corrupt: append a line with a non-numeric timestamp field
    with open(os.path.join(broker, "seg-000000000000.txt"), "a") as f:
        f.write("not-a-ts\tjunk\n")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain_to_parquet(spark, broker, out, ck)
    vals = [r["value"] for r in spark.read.parquet(out).collect()]
    assert vals == ["good,1"]


def test_unseeded_reader_missing_dir_fails_even_opted_out(tmp_path):
    """A reader that has observed NOTHING this run (floor 0 — e.g. a
    restart while the broker volume is unmounted) must fail loud on a
    missing dir even under failOnDataLoss=false: it cannot tell
    never-published from unmounted-after-commit, and returning 0 would
    be written to the offset log (opaque Python-source offsets get no
    ordering check), regressing below the committed offset so a remount
    replays every committed segment as duplicates (ADVICE r14). An
    initialOffset call is NOT a usable fresh-query signal — trigger
    availableNow calls latestOffset first — so the pre-create-the-dir
    contract applies to fresh consumers too."""
    import pytest

    missing = str(tmp_path / "nonexistent")
    r = pybus._PyBusStreamReader(
        {"path": missing, "failondataloss": "false"}
    )
    with pytest.raises(RuntimeError, match="cannot tell"):
        r.latestOffset()
    # initialOffset does not bless a missing dir either
    assert r.initialOffset() == {"segment": 0}
    with pytest.raises(RuntimeError, match="cannot tell"):
        r.latestOffset()


def test_fresh_reader_precreated_dir_idles_when_opted_out(tmp_path):
    """The documented starts-before-its-producer escape: with the broker
    dir PRE-CREATED (empty, no frontier), the offset idles at 0 under
    failOnDataLoss=false — and under the default too (an existing empty
    dir is not data loss)."""
    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    for opted in ("false", "true"):
        r = pybus._PyBusStreamReader(
            {"path": broker, "failondataloss": opted}
        )
        assert r.initialOffset() == {"segment": 0}
        assert r.latestOffset() == {"segment": 0}


def test_observed_zero_floor_holds_through_unmount(tmp_path):
    """A floor legitimately OBSERVED at 0 is a safe hold, not a blind
    guess: a pre-created empty broker that unmounts mid-run keeps idling
    at 0 under failOnDataLoss=false (nothing above 0 can be committed),
    and a restart that re-plans a no-data (0, 0) checkpoint range holds
    at the checkpoint-derived 0 the same way — only a reader that has
    observed NOTHING raises."""
    import shutil

    broker = str(tmp_path / "broker")
    os.makedirs(broker)
    r = pybus._PyBusStreamReader(
        {"path": broker, "failondataloss": "false"}
    )
    assert r.latestOffset() == {"segment": 0}  # successful empty listing
    shutil.rmtree(broker)
    assert r.latestOffset() == {"segment": 0}  # observed-at-0 hold
    # restart twin: a (0, 0) recovered range seeds observation at 0
    r2 = pybus._PyBusStreamReader(
        {"path": broker, "failondataloss": "false"}
    )
    assert r2.partitions({"segment": 0}, {"segment": 0}) == []
    assert r2.latestOffset() == {"segment": 0}


def test_partitions_seed_floor_against_restart_unmount(tmp_path):
    """After a restart Spark re-plans the last uncommitted batch via
    partitions(start, end) with checkpoint-recovered offsets; that range
    must seed the monotonic floor so a missing dir afterwards holds the
    offset at the recovered end instead of raising (nothing regresses,
    nothing replays)."""
    missing = str(tmp_path / "nonexistent")
    r = pybus._PyBusStreamReader(
        {"path": missing, "failondataloss": "false"}
    )
    parts = r.partitions({"segment": 3}, {"segment": 7})
    assert len(parts) == 4
    assert r.latestOffset() == {"segment": 7}


def test_latest_floor_survives_unmount_within_run(tmp_path):
    """An observed broker that later unmounts must hold latestOffset at
    the observed floor (never regress within the run), under
    failOnDataLoss=false."""
    import shutil

    broker = str(tmp_path / "broker")
    ts = datetime.datetime(2020, 1, 1, tzinfo=UTC)
    for m in ("a", "b", "c"):
        pybus.publish([m], broker, publish_ts=ts)
    r = pybus._PyBusStreamReader(
        {"path": broker, "failondataloss": "false"}
    )
    assert r.initialOffset() == {"segment": 0}
    assert r.latestOffset() == {"segment": 3}
    shutil.rmtree(broker)
    assert r.latestOffset() == {"segment": 3}


def test_frontier_advance_uses_fixed_temp_name(tmp_path, monkeypatch):
    """_advance_frontier writes through one fixed temp name (writers are
    flock-serialized): repeated publishes leave no _frontier_* mkstemp
    litter, and a crash between write and replace leaves at most ONE
    stale tmp that the next successful advance overwrites (ADVICE r14)."""
    broker = str(tmp_path / "broker")
    for j in range(5):
        pybus.publish([f"m{j}"], broker)
    names = sorted(os.listdir(broker))
    assert [n for n in names if n.startswith("_")] == [
        "_frontier", "_frontier.lock",
    ]
    # crash between write and replace: the fixed tmp survives once...
    real_replace = os.replace

    def boom(src, dst):
        raise OSError("crash before replace")

    monkeypatch.setattr(pybus.os, "replace", boom)
    try:
        pybus._advance_frontier(broker, 99)
    except OSError:
        pass
    # the failure path unlinks on a clean raise; simulate the hard-crash
    # leftover explicitly to prove the next advance overwrites it
    monkeypatch.setattr(pybus.os, "replace", real_replace)
    tmp = os.path.join(broker, pybus.FRONTIER_NAME + ".tmp")
    with open(tmp, "w") as f:
        f.write("stale")
    pybus._advance_frontier(broker, 123)
    assert pybus._read_frontier(broker) == 123
    # the planted stale tmp was truncated, rewritten and os.replace'd
    # onto the value file — nothing underscore-prefixed accumulates
    # beyond the two permanent frontier files
    assert sorted(
        n for n in os.listdir(broker) if n.startswith("_")
    ) == ["_frontier", "_frontier.lock"]


def test_restart_over_unmounted_broker_never_regresses_offset(spark, tmp_path):
    """The ADVICE r14 end-to-end scenario: a query RESTART while the
    broker volume is unmounted (failOnDataLoss=false) must not regress
    the offset log below the committed offset — pre-fix, latestOffset
    guessed 0, Spark wrote it to the offset log, and the remounted
    broker replayed every committed segment as duplicates. Spark calls
    partitions() with the checkpoint-recovered range on every restart,
    which seeds the monotonic floor, so the restarted query HOLDS at the
    committed offset (0 rows, no new offset entry) and the remount
    resumes exactly-once."""
    import shutil

    broker = str(tmp_path / "broker")
    parked = str(tmp_path / "parked")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    ts = datetime.datetime(2021, 5, 1, tzinfo=UTC)
    pybus.publish(["first"], broker, publish_ts=ts)
    _drain_to_parquet(spark, broker, out, ck)
    assert [r["value"] for r in spark.read.parquet(out).collect()] == [
        "first"
    ]
    offsets_before = sorted(
        n for n in os.listdir(os.path.join(ck, "offsets"))
        if not n.startswith(".")
    )
    # unmount: the directory (segments + frontier) disappears wholesale
    shutil.move(broker, parked)
    _drain_to_parquet(spark, broker, out, ck, fail_on_data_loss=False)
    offsets_after = sorted(
        n for n in os.listdir(os.path.join(ck, "offsets"))
        if not n.startswith(".")
    )
    assert offsets_after == offsets_before, (
        f"restart over unmounted broker wrote {offsets_after} vs "
        f"{offsets_before}: the offset log moved while blind"
    )
    # remount, publish one more, restart: exactly-once resume — the new
    # row arrives, the committed segment is NOT replayed
    shutil.move(parked, broker)
    pybus.publish(["second"], broker, publish_ts=ts)
    _drain_to_parquet(spark, broker, out, ck)
    vals = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert vals == ["first", "second"], f"duplicates or loss: {vals}"
