"""In-process message-bus source via the Spark 4 Python DataSource API
(SURVEY.md §2 op 2 — the message-bus variant that IS verifiable in this
container, unlike the Kafka adapter whose connector jar cannot be
fetched here).

The reference's unbounded source is Pub/Sub (TrafficMaxLaneFlow.java:
375-379) fed by an injector (PubsubFileInjector.java:37-55). The
engine's primary stand-in is the file-drop directory; this module adds
a second, semantically closer stand-in: a tiny append-only segment
broker with REAL source-managed offsets, so the Structured Streaming
offset/commit lifecycle (initialOffset -> latestOffset -> partitions ->
read -> commit, checkpointed exactly-once restart) is exercised by an
actual custom source rather than Spark's built-in file source.

Broker layout: ``<broker_dir>/seg-<12-digit-n>.txt``, one UTF-8 line
per message, each line ``<publish_epoch_us>\\t<payload>``. Segments are
immutable once visible — the publisher writes to a temp name and claims
the index with ``os.link`` (atomic on POSIX), so a reader never sees a
partial segment. Offsets are ``{"segment": k}`` = "segments with index
< k are consumed"; a (start, end) range maps to one InputPartition per
segment, and ``read`` is deterministic for a fixed range — which is
what makes checkpoint replays idempotent (the exactly-once upgrade over
the reference's at-least-once injector, same claim as the file-drop
path).

Retention contract: segments must outlive every checkpoint that may
replay them. A segment missing from a committed range (manual cleanup,
retention, or a crashed producer's index gap) FAILS THE BATCH by
default — ``failOnDataLoss=true``, the Kafka source's convention — so a
bad path, an unmounted broker dir, or contract-violating cleanup
surfaces instead of silently reading as zero data. Because the
checkpoint replays the same range forever and a deleted immutable
segment can never reappear, the operator's recovery path is explicit:
restart the reader with ``.option("failOnDataLoss", "false")`` (or
``stream_pybus(..., fail_on_data_loss=False)``) and the missing segment
degrades to EMPTY with an executor-log warning — deterministic on every
replay, so the stream progresses past the loss (pinned by
tests/test_pybus.py's deleted-segment tests).

Publish frontier: ``<broker_dir>/_frontier`` persists the next publish
index (monotonic, advanced under an ``_frontier.lock`` flock after every
claim). Without it, a retention pass that deletes ALL segments — legal
once they are consumed — would reset a fresh publisher to index 0,
BELOW the consumer's committed offset, and every message republished in
that range would be silently skipped. With it, publishing resumes at
the frontier no matter how empty the directory is. Residual window: a
producer crashing between the ``os.link`` claim and the frontier
advance leaves the frontier one low; the gap only matters if retention
then deletes every segment including the just-claimed one, so retention
SHOULD always keep the newest segment (and must never delete the
frontier files) as defense in depth.

Publish time is recorded by the PUBLISHER (the Pub/Sub publish-time
analog, TrafficMaxLaneFlow.java:378-379) and surfaced as ``ingest_ts``,
so streaming event-time semantics match the reference's
no-timestamp-attribute configuration; ``TrafficConfig.
streaming_honor_payload_timestamp`` opts into payload time exactly as
with the other sources.

Scale notes (100 TB): one task per segment — source parallelism is the
segment count per micro-batch, the same knob as Kafka topic partitions;
rows cross into the JVM through the Python DataSource's Arrow batch
channel. This adapter is for correctness-bearing replay and modest
topics; a production deployment swaps in the Kafka adapter
(sources/kafka.py) with the connector jar on the classpath.

Trigger caveat (measured, r12): ``Trigger.AvailableNow`` over a Python
DataSource falls back to single-batch semantics — the whole offset
range lands in ONE micro-batch and no no-data batch follows, so a
WATERMARKED APPEND aggregation downstream never sees its watermark
advance and emits nothing (neither within the run nor across a
checkpoint restart, where per-batch event-time stats are gone). Use a
``processingTime`` trigger for stateful append consumers of this
source (the engine then runs the no-data batch that advances the
watermark and flushes closed windows — tests/test_pybus.py pins this),
or availableNow for stateless passthrough drains. The file-drop source
(sources/text.py) does not have this limitation and remains the
replay/backfill path for watermarked drains.
"""

from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SEG_PREFIX = "seg-"
SEG_DIGITS = 12
SCHEMA = "value string, ingest_ts timestamp"
FRONTIER_NAME = "_frontier"

# per-process publisher cache: broker dir (realpath) -> next index to try.
# Purely an optimization — correctness still rests on the os.link claim.
_NEXT_INDEX: dict[str, int] = {}


def _read_frontier(broker_dir: str) -> int:
    """Next-publish-index lower bound persisted by ``_advance_frontier``.

    Lock-free read is safe because the value file is only ever replaced
    atomically (``os.replace`` of a complete temp file); a missing or
    unparseable file degrades to 0 — the pre-frontier behavior, never a
    wrong-direction (too-high) bound."""
    try:
        with open(
            os.path.join(broker_dir, FRONTIER_NAME), encoding="ascii"
        ) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def _advance_frontier(broker_dir: str, nxt: int) -> None:
    """Raise the persisted frontier to at least ``nxt`` (monotonic max).

    The read-modify-write races between producers, so it runs under an
    flock on a dedicated lock file; the value file itself is swapped in
    with ``os.replace`` so readers never observe a torn write. The lock
    file is separate from the value file because replacing a locked file
    would silently migrate waiters onto a dead inode."""
    import fcntl

    lock_path = os.path.join(broker_dir, FRONTIER_NAME + ".lock")
    with open(lock_path, "a") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if nxt > _read_frontier(broker_dir):
            # Fixed temp name, not mkstemp: writers are already serialized
            # by the flock above, so there is never a concurrent writer to
            # collide with, and a crash between write and replace leaves at
            # most ONE stale file that the next advance simply overwrites —
            # mkstemp's unique names accumulated forever on repeated
            # crashes (ADVICE r14).
            tmp = os.path.join(broker_dir, FRONTIER_NAME + ".tmp")
            try:
                with open(tmp, "w", encoding="ascii") as f:
                    f.write(str(nxt))
                os.replace(tmp, os.path.join(broker_dir, FRONTIER_NAME))
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise


def _segment_indices(broker_dir: str) -> list[int]:
    try:
        names = os.listdir(broker_dir)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith(SEG_PREFIX) and n.endswith(".txt"):
            try:
                out.append(int(n[len(SEG_PREFIX):-4]))
            except ValueError:
                continue
    return sorted(out)


def _segment_path(broker_dir: str, idx: int) -> str:
    return os.path.join(broker_dir, f"{SEG_PREFIX}{idx:0{SEG_DIGITS}d}.txt")


def publish(
    lines: list[str],
    broker_dir: str,
    publish_ts: datetime.datetime | None = None,
) -> int:
    """Atomically publish one segment of messages; returns its index.

    ``publish_ts`` defaults to now (UTC) — pass a fixed value in tests
    for deterministic event time. Stamped per segment, mirroring the
    injector's publish call (PubsubFileInjector.java:37-40).

    Message contract: payloads are LINES — embedded newlines would
    re-frame the segment and poison every replay of it (segments are
    immutable and re-read from the checkpoint), so they are rejected
    HERE, at the producer, where the error is actionable.

    Concurrency: the segment index is claimed with ``os.link`` (atomic,
    fails with FileExistsError if the index is taken) rather than
    ``os.rename`` (which silently REPLACES — two producers racing on
    the same index would lose a whole segment of messages). Losers
    retry on the next index, so concurrent producers interleave
    losslessly. This requires a filesystem with hard-link support
    (any POSIX local fs / tmpfs; NOT some network/FUSE mounts) — on
    such a mount every publish raises OSError, loudly, never silently.

    Cost: the first publish from a process lists the broker directory
    once; after that the last claimed index is cached per process, so a
    publisher's steady state is O(1) directory operations per segment
    (re-listing only after a burst of FileExistsError losses to a
    faster producer) rather than a full listdir per call."""
    for ln in lines:
        if "\n" in ln or "\r" in ln:
            raise ValueError(
                "pybus payloads are line-framed; embedded newlines would "
                "corrupt the segment (escape or split the message first)"
            )
    os.makedirs(broker_dir, exist_ok=True)
    ts = publish_ts or datetime.datetime.now(datetime.timezone.utc)
    epoch_us = int(ts.timestamp() * 1_000_000)
    fd, tmp = tempfile.mkstemp(dir=broker_dir, prefix="_inflight_")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            for ln in lines:
                f.write(f"{epoch_us}\t{ln}\n")
        key = os.path.realpath(broker_dir)
        idx = _NEXT_INDEX.get(key)
        # Trust the cache only while OUR previously-claimed segment still
        # exists. Retention is prefix-ordered (oldest segments first — the
        # module's retention contract), so if segment idx-1 survives, every
        # free index >= idx is free because it was never claimed, never
        # because it was deleted — probing upward cannot land a fresh
        # publish inside a retention hole the consumer's committed offset
        # has already passed (which would silently lose the message).
        if idx is not None and not os.path.exists(
            _segment_path(broker_dir, idx - 1)
        ):
            idx = None
        if idx is None:
            # The persisted frontier covers the case listdir cannot: a
            # retention pass that emptied the directory entirely. Without
            # it a fresh publisher would restart at 0 — below the
            # consumer's committed offset — and those messages would be
            # permanently skipped (ADVICE r13).
            existing = _segment_indices(broker_dir)
            idx = max(
                (existing[-1] + 1) if existing else 0,
                _read_frontier(broker_dir),
            )
        misses = 0
        while True:
            try:
                os.link(tmp, _segment_path(broker_dir, idx))
                _NEXT_INDEX[key] = idx + 1
                # Best-effort AFTER the durable claim: the segment is
                # already visible to readers, so raising here would make
                # an at-least-once caller retry and publish the same
                # messages twice. A failed advance merely degrades the
                # frontier to a lower bound (the pre-frontier behavior),
                # which the next successful publish repairs.
                try:
                    _advance_frontier(broker_dir, idx + 1)
                except OSError:
                    import logging

                    logging.getLogger(__name__).warning(
                        "pybus: frontier advance to %d failed in %s; "
                        "publish succeeded (segment %d), frontier is "
                        "stale until the next publish",
                        idx + 1, broker_dir, idx,
                    )
                return idx
            except FileExistsError:
                idx += 1  # another producer claimed it; take the next
                misses += 1
                if misses % 8 == 0:
                    # a faster producer is far ahead: one re-list jumps
                    # past the contested range instead of probing linearly
                    existing = _segment_indices(broker_dir)
                    if existing:
                        idx = max(idx, existing[-1] + 1)
    finally:
        os.unlink(tmp)


def inject_file(
    spark: SparkSession,
    input_path: str,
    broker_dir: str,
    chunks: int = 4,
    publish_ts: datetime.datetime | None = None,
) -> int:
    """Replay a text file into the broker as ``chunks`` segments,
    filtering headers/empties exactly like the reference injector
    (PubsubFileInjector.java:45-55 — the same predicate the file-drop
    injector uses). Returns the number of lines published.

    Scale contract: this is the TEST/replay harness twin of the
    reference's injector — it collects the file to the driver to stamp
    and segment it, so it is for fixture-sized replays only (the same
    scope as PubsubFileInjector, which also streams one file through
    one process). Production publishing happens from producers writing
    segments directly via ``publish``; bulk backfills at scale use the
    file-drop source, which never leaves the executors."""
    from .injector import filter_header_and_empties

    rows = filter_header_and_empties(spark.read.text(input_path)).collect()
    lines = [r["value"] for r in rows]
    if not lines:
        return 0
    per = max(1, (len(lines) + chunks - 1) // chunks)
    for i in range(0, len(lines), per):
        publish(lines[i : i + per], broker_dir, publish_ts=publish_ts)
    return len(lines)


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _PyBusStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("pybus requires .option('path', <broker_dir>)")
        # Kafka-convention option: a segment missing from a committed
        # range fails the batch unless the user explicitly opts into the
        # degrade-to-empty escape with failOnDataLoss=false. Spark passes
        # Python DataSource option keys lower-cased; accept both spellings.
        raw = options.get(
            "failondataloss", options.get("failOnDataLoss", "true")
        )
        if str(raw).lower() not in ("true", "false"):
            raise ValueError(
                f"pybus: failOnDataLoss must be true or false, got {raw!r}"
            )
        self._fail_on_data_loss = str(raw).lower() == "true"
        # Arrow chunk size knob (lines per RecordBatch). An instance
        # attribute so it pickles to executors with the reader; the class
        # default is the measured sweet spot (SCALE.md round 14 sweep).
        raw_bl = options.get("batchlines", options.get("batchLines"))
        if raw_bl is None:
            self._batch_lines = self._BATCH_LINES
        else:
            try:
                self._batch_lines = int(raw_bl)
            except (TypeError, ValueError):
                self._batch_lines = 0
            if self._batch_lines <= 0:
                raise ValueError(
                    "pybus: batchLines must be a positive integer, "
                    f"got {raw_bl!r}"
                )
        # monotonic floor for latestOffset under failOnDataLoss=false:
        # a transiently unmounted dir must not regress the offset (an
        # offset regression would re-read committed segments after
        # remount — duplicates). The floor is in-memory, so on a RESTART
        # it starts at 0 and is re-seeded from the checkpoint-recovered
        # range when Spark re-plans a batch (partitions()); if the dir
        # is missing before anything has seeded it, latestOffset fails
        # loud even under failOnDataLoss=false — a reader instance
        # cannot distinguish never-published from unmounted-after-commit
        # (initialOffset-was-called is NOT a usable fresh-query signal:
        # trigger availableNow calls latestOffset first), and guessing 0
        # would write a regressed offset to the log (ADVICE r14).
        # _observed tracks seeding separately from the floor VALUE: a
        # floor legitimately observed at 0 (pre-created empty broker, or
        # a restart re-planning a no-data (0, 0) checkpoint range) is a
        # safe hold, not a guess — only a truly blind reader must raise.
        self._latest_floor = 0
        self._observed = False

    def initialOffset(self) -> dict:
        # Kafka "earliest" semantics: a FRESH consumer starts at the
        # earliest AVAILABLE segment, not index 0 — on a legally
        # retention-aged broker (old segments deleted once consumed by
        # other consumers) index 0 no longer exists, and starting there
        # under failOnDataLoss=true would fail the first batch forever
        # for data this consumer never committed. An emptied-but-
        # frontier'd broker starts at the frontier (where the next
        # publish will land).
        segs = _segment_indices(self._dir)
        if segs:
            # The earliest segment index is also a valid lower bound for
            # the latest offset — seed the floor so a dir unmount later in
            # this run cannot regress latestOffset below it.
            self._latest_floor = max(self._latest_floor, segs[0])
            return {"segment": segs[0]}
        frontier = _read_frontier(self._dir)
        self._latest_floor = max(self._latest_floor, frontier)
        return {"segment": frontier}

    def latestOffset(self) -> dict:
        try:
            names = os.listdir(self._dir)
        except FileNotFoundError:
            # A missing broker DIR (vs a missing segment) is a mistyped
            # path or an unmounted volume. Under the failOnDataLoss
            # default this must surface — silently planning zero
            # partitions forever is exactly the zero-data outcome the
            # option exists to prevent. Under failOnDataLoss=false the
            # offset holds at the monotonic floor (never regresses) IF
            # anything this run has seeded it — a prior successful
            # listing, or partitions() re-planning an uncommitted batch
            # from the checkpoint after a restart. With NOTHING observed
            # (floor 0) the reader cannot tell never-published apart
            # from unmounted-after-commit: returning 0 would be written
            # to the offset log (Python-source offsets are opaque —
            # Spark does no ordering check) and a later remount would
            # replay every committed segment as duplicates (ADVICE r14).
            # Fail loud in that case under BOTH settings; the legitimate
            # starts-before-its-producer consumer pre-creates the
            # directory (os.makedirs), which is cheap and unambiguous.
            # (initialOffset-was-called is NOT a usable fresh-query
            # signal here: trigger availableNow calls latestOffset
            # before initialOffset.)
            if self._fail_on_data_loss:
                raise RuntimeError(
                    f"pybus: broker dir {self._dir} does not exist "
                    "(mistyped path or unmounted volume). Pre-create the "
                    "directory (os.makedirs) if the producer has not "
                    "published yet."
                ) from None
            if not self._observed:
                raise RuntimeError(
                    f"pybus: broker dir {self._dir} does not exist and "
                    "nothing has been observed this run — the reader "
                    "cannot tell a never-published broker from an "
                    "unmounted volume, and assuming the former would "
                    "regress the offset log below the committed offset "
                    "(duplicates after remount), even under "
                    "failOnDataLoss=false. Re-mount or pre-create the "
                    "broker directory (os.makedirs), then restart the "
                    "query."
                ) from None
            return {"segment": self._latest_floor}
        segs = []
        for n in names:
            if n.startswith(SEG_PREFIX) and n.endswith(".txt"):
                try:
                    segs.append(int(n[len(SEG_PREFIX):-4]))
                except ValueError:
                    continue
        # The frontier keeps a fully-retention-emptied (but existing)
        # dir from regressing the offset below already-consumed indices,
        # exactly as it keeps publishers from reusing them.
        self._observed = True
        self._latest_floor = max(
            self._latest_floor,
            (max(segs) + 1) if segs else 0,
            _read_frontier(self._dir),
        )
        return {"segment": self._latest_floor}

    def partitions(self, start: dict, end: dict):
        # Seed the monotonic floor from the planned range: after a restart
        # Spark re-plans the checkpoint-recovered range (on EVERY restart,
        # committed or not — traced against the real engine), so
        # end["segment"] is a committed-or-planned lower bound for
        # latestOffset — without this, a fresh reader instance whose
        # broker dir is unmounted would fall back to floor 0 and regress
        # the offset log (ADVICE r14). A (0, 0) range still counts as
        # observed: holding at a checkpoint-derived 0 is safe.
        self._observed = True
        self._latest_floor = max(self._latest_floor, end["segment"])
        return [
            _SegmentPartition(_segment_path(self._dir, i))
            for i in range(start["segment"], end["segment"])
        ]

    # one RecordBatch per this many lines: bounds reader memory on huge
    # segments while keeping the Arrow channel amortized (a segment is
    # normally far smaller than this)
    _BATCH_LINES = 1 << 16

    # datetime-representable micros (year 1..9999, to the last micro of
    # 9999-12-31) — anything outside is a corrupted stamp and
    # NULL-and-drops like a non-numeric one
    _MIN_US = -62135596800 * 1_000_000
    _MAX_US = 253402300799 * 1_000_000 + 999_999

    def read(self, partition: _SegmentPartition):
        try:
            f = open(partition.path, encoding="utf-8", errors="replace")
        except FileNotFoundError:
            # A committed offset range names a segment that no longer
            # exists (manual cleanup / retention ran inside the range, or
            # a crashed producer left an index gap). Default: fail loud —
            # the Kafka source's failOnDataLoss=true convention — so a
            # mistyped path, an unmounted broker dir, or cleanup that
            # violates the retention contract cannot silently read as
            # zero data. Because the checkpoint replays the SAME range on
            # every restart and a deleted immutable segment can never
            # reappear, the error message names the explicit escape:
            # restart with failOnDataLoss=false, under which the segment
            # degrades to empty — deterministically on every replay, like
            # the NULL-and-drop contract for corrupted lines — and the
            # loss stays observable in executor logs. Producers who need
            # lossless replay must retain segments for the checkpoint
            # lifetime (module docstring).
            if self._fail_on_data_loss:
                raise RuntimeError(
                    f"pybus: segment {partition.path} is missing from a "
                    "committed offset range — data loss (retention or "
                    "cleanup deleted it, or the broker dir is wrong or "
                    "unmounted). The checkpoint will replay this range on "
                    "every restart; to skip the lost segment and let the "
                    "stream progress, restart the reader with "
                    ".option('failOnDataLoss', 'false')."
                ) from None
            import logging

            logging.getLogger(__name__).warning(
                "pybus: segment %s missing from committed range; "
                "reading as empty (failOnDataLoss=false; retention/"
                "cleanup inside an active checkpoint range loses those "
                "messages)",
                partition.path,
            )
            return
        # Yield Arrow RecordBatches, not per-row tuples: the per-row path
        # pickles every (payload, ts) through the Python<->JVM boundary and
        # dominated the measured 1M-line drain (SCALE.md round 13); batching
        # keeps the channel at Arrow columnar speed.
        import pyarrow as pa

        payloads: list[str] = []
        stamps: list[int] = []
        with f:
            for raw in f:
                raw = raw.rstrip("\n")
                if not raw:
                    continue
                epoch_us, _, payload = raw.partition("\t")
                try:
                    us = int(epoch_us)
                except ValueError:
                    # A hand-corrupted segment line must degrade like every
                    # other unparseable input (the engine's NULL-and-drop
                    # contract), NOT become a poison pill that crashes every
                    # replay of this immutable segment from the checkpoint.
                    # publish() rejects newline payloads, so this is
                    # unreachable for producer-written data.
                    continue
                if not (self._MIN_US <= us <= self._MAX_US):
                    continue  # same drop the datetime round-trip applied
                payloads.append(payload)
                stamps.append(us)
                if len(payloads) >= self._batch_lines:
                    yield self._to_batch(pa, payloads, stamps)
                    payloads, stamps = [], []
        if payloads:
            yield self._to_batch(pa, payloads, stamps)

    @staticmethod
    def _to_batch(pa, payloads: list[str], stamps: list[int]):
        return pa.RecordBatch.from_arrays(
            [
                pa.array(payloads, pa.string()),
                # naive micros == the session's UTC wall clock (session tz
                # is pinned UTC) — integer micros, no float round-trip
                pa.array(stamps, pa.timestamp("us")),
            ],
            names=["value", "ingest_ts"],
        )

    def commit(self, end: dict) -> None:
        # segments are immutable and replayable; nothing to ack/delete
        pass


class PyBusDataSource(DataSource):
    """spark.readStream.format("pybus").option("path", broker_dir)."""

    @classmethod
    def name(cls) -> str:
        return "pybus"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> _PyBusStreamReader:
        return _PyBusStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration of the pybus format on this session."""
    spark.dataSource.register(PyBusDataSource)


def stream_pybus(
    spark: SparkSession,
    broker_dir: str,
    include_ingest_ts: bool = True,
    fail_on_data_loss: bool = True,
    batch_lines: int | None = None,
) -> DataFrame:
    """Unbounded broker source -> the engine's text-line contract
    (value [, ingest_ts]) — drop-in for ``sources.text.stream_text`` /
    ``sources.kafka.stream_kafka`` upstream of ``traffic_pipeline``.

    ``fail_on_data_loss`` mirrors the Kafka source option: by default a
    segment missing from a committed range fails the batch; pass False
    to degrade it to empty and let the stream progress past the loss.
    ``batch_lines`` overrides the Arrow chunk size (lines per
    RecordBatch) for huge segments."""
    register(spark)
    reader = (
        spark.readStream.format("pybus")
        .option("path", broker_dir)
        .option("failOnDataLoss", "true" if fail_on_data_loss else "false")
    )
    if batch_lines is not None:
        reader = reader.option("batchLines", str(batch_lines))
    df = reader.load()
    return df if include_ingest_ts else df.select("value")
