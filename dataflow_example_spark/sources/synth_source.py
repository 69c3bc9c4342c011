"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
PeMS-style traffic-line generator, batch AND streaming, registered as
``traffic_synth`` — the modern in-process answer to the reference's
external injector loop (PubsubFileInjector.java:75-90): instead of
replaying a file through a bus, the source *is* the bus, generating the
same line shape the parser consumes at a controlled rate.

Batch:      spark.read.format("traffic_synth")
                 .option("n_stations", 50).option("n_minutes", 60).load()
Streaming:  spark.readStream.format("traffic_synth")
                 .option("rows_per_batch", 500).load()

Options: n_stations, n_minutes (batch size), rows_per_batch (stream
rate), start_epoch (event-time origin, default 2010-01-01 00:00 UTC).
Lines are a pure function of (station, minute) — deterministic across
runs, partitions, and engines; every line parses (49 fields, valid
timestamp, 8 valid lanes).

Scale notes: batch generation partitions by station chunk (one
InputPartition per chunk => parallel, no driver materialization); the
stream reader is a SimpleDataSourceStreamReader whose offset is the
global line index — exactly-once replay via readBetweenOffsets.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEFAULT_START = int(
    dt.datetime(2010, 1, 1, tzinfo=dt.timezone.utc).timestamp()
)
N_FIELDS = 49


def synth_line(station: int, minute: int, start_epoch: int = DEFAULT_START) -> str:
    """One deterministic PeMS-style CSV line for (station, minute)."""
    ts = dt.datetime.fromtimestamp(
        start_epoch + minute * 60, tz=dt.timezone.utc
    )
    f = [""] * N_FIELDS
    f[0] = ts.strftime("%m/%d/%Y %H:%M:%S")
    f[1] = f"{400000 + station}"
    f[2] = str(station % 5)
    f[3] = "NSEW"[station % 4]
    f[7] = str((station * 7 + minute) % 300)
    for lane in range(1, 9):
        f[6 + 5 * lane] = str((station * 8 + lane * 3 + minute) % 100)
        f[7 + 5 * lane] = str(((station + lane + minute) % 128) / 128.0)
        f[8 + 5 * lane] = str(40.0 + ((station * 13 + lane * 5 + minute) % 512) / 8.0)
    f[N_FIELDS - 1] = "0"  # last field non-empty: survives trailing-split
    return ",".join(f)


class _StationChunk(InputPartition):
    def __init__(self, start: int, end: int, n_minutes: int, epoch: int):
        self.start, self.end = start, end
        self.n_minutes, self.epoch = n_minutes, epoch


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_stations = int(options.get("n_stations", 50))
        self.n_minutes = int(options.get("n_minutes", 60))
        self.epoch = int(options.get("start_epoch", DEFAULT_START))
        self.chunk = max(1, self.n_stations // 16)

    def partitions(self) -> list[InputPartition]:
        return [
            _StationChunk(
                s, min(s + self.chunk, self.n_stations),
                self.n_minutes, self.epoch,
            )
            for s in range(0, self.n_stations, self.chunk)
        ]

    def read(self, partition: _StationChunk) -> Iterator[tuple]:
        for st in range(partition.start, partition.end):
            for m in range(partition.n_minutes):
                yield (synth_line(st, m, partition.epoch),)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = global line index; line i = (station i % n_stations,
    minute i // n_stations) — a deterministic unbounded feed."""

    def __init__(self, options: dict):
        self.n_stations = int(options.get("n_stations", 50))
        self.rows = int(options.get("rows_per_batch", 500))
        self.epoch = int(options.get("start_epoch", DEFAULT_START))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _lines(self, start: int, end: int) -> list[tuple]:
        return [
            (synth_line(i % self.n_stations, i // self.n_stations, self.epoch),)
            for i in range(start, end)
        ]

    def read(self, start: dict):
        begin = start["index"]
        end = begin + self.rows
        return iter(self._lines(begin, end)), {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._lines(start["index"], end["index"]))

    def commit(self, end: dict) -> None:
        pass


class TrafficSynthDataSource(DataSource):
    """`traffic_synth` — register with
    ``spark.dataSource.register(TrafficSynthDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "traffic_synth"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)
