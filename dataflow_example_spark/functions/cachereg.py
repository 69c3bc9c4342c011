"""Session-lifetime resource registry (persisted frames, scratch dirs).

Operators that must pin a non-deterministic intermediate (the range
frames in ranking.py / packing.py / diagnostics.py — see
packing.py:61-80 for why persist is load-bearing there) cannot
unpersist inside a lazily-composed query: the cache must outlive the
caller's materialization. Left alone, cached partitions and mkdtemp
scratch directories accumulate for the lifetime of long sessions
(strict gate: 238 queries; bench: 24), which is the round-5 ADVICE leak.

This registry makes the cleanup explicit and centralized:

- ``register_persisted(df)`` — called by any operator that persists;
- ``register_scratch(path)`` — called for any mkdtemp the query's
  returned DataFrame still depends on (streaming-parity sinks);
- ``cleanup()`` — unpersists + deletes everything registered; harnesses
  (bench.py between query groups, tools/check_oracles.py between
  queries) call it after each result is fully materialized;
- an ``atexit`` hook runs ``cleanup`` on interpreter exit, so even a
  harness that never calls it does not leak scratch dirs across runs.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_SCRATCH: list[str] = []
_ON_CLEANUP: list = []


def on_cleanup(fn) -> None:
    """Register a callback invoked at the END of every ``cleanup()``
    (after persisted frames are released). For memo invalidation:
    a module that caches a DataFrame OBJECT keyed to a persist (the
    flagship pair's shared lane-info plan in queries.py) must drop the
    memo when the persist is released, or later callers would silently
    run on an unpersisted frame. Callbacks are permanent — register
    once at module import, make the callback idempotent."""
    _ON_CLEANUP.append(fn)


def register_persisted(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df


def register_scratch(path: str) -> str:
    _SCRATCH.append(path)
    return path


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is deleted by the next ``cleanup()`` (or at exit)."""
    return register_scratch(tempfile.mkdtemp(prefix=prefix))


def cleanup() -> None:
    """Release every registered resource (best effort, idempotent)."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
    while _SCRATCH:
        path = _SCRATCH.pop()
        shutil.rmtree(path, ignore_errors=True)
    for fn in _ON_CLEANUP:
        try:
            fn()
        except Exception:
            pass


atexit.register(cleanup)
