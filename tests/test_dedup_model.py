"""Model-based property test for streaming dedup
(streaming/dedup.py dedup_stream = dropDuplicatesWithinWatermark;
VERDICT r13 item 2 — extend the test_throttle_model.py pattern to the
stateful paths that only had enumerated cases + batch-twin parity).

The pure-Python model replays the within-watermark dedup semantics under
micro-batched arrival (maxFilesPerTrigger=1 file-drop replay). Engine
rules pinned empirically this round (probe corpus P1-P13, mirroring the
r13 throttle measurement):

1. LATE FILTER, one batch lagged: a row in micro-batch N reaches the
   operator iff ``ts > max(event ts over batches 1..N-2) - delay``
   (tie at the boundary DROPS; no watermark until two prior batches
   carry data) — the same lagged-watermark rule measured for
   applyInPandasWithState in r13.
2. EVICTION IS ALSO LAGGED: state cleanup runs at the END of batch N
   with the watermark computed from batches 1..N-1, so the state a
   batch OBSERVES reflects evictions by ``max(ts over 1..N-2) - delay``
   — the same lagged value as the late filter. A key is evicted when
   ``expiry <= watermark`` (boundary INCLUSIVE, probe P12).
3. EXPIRY = first-seen (emitted) event time + delay. A dropped
   duplicate does NOT extend its key's expiry (probe P11 — matches the
   documented contract: records within [first ts, first ts + delay]
   deduplicate). After eviction a re-arrival emits again and starts a
   fresh expiry from its own ts (probe P13).

Teeth (each verified by a deliberately wrong model failing on the same
engine output): no late filter, unlagged eviction, strict-< eviction
boundary, extend-expiry-on-duplicate, and fresh state per batch.
"""

from __future__ import annotations

import itertools
import json
import os
import random
import shutil
import tempfile
import time

import pytest

from dataflow_example_spark.streaming import drain
from dataflow_example_spark.streaming.dedup import dedup_stream

SCHEMA = "doc_id LONG, text STRING, ts TIMESTAMP"
BASE = "2024-01-01T10:"
_qn = itertools.count()


def _doc(did, key, t):
    """t: integer second offset within [0, 3600); ``key`` is the content
    (dedup identity = md5 over it)."""
    return {
        "doc_id": did,
        "text": key,
        "ts": f"{BASE}{t // 60:02d}:{t % 60:02d}",
        "t": t,
    }


def run_engine(spark, batches, delay_s):
    """Replay batches (one file == one micro-batch) through dedup_stream;
    returns the sorted emitted doc_ids."""
    src = tempfile.mkdtemp(prefix="ddm_src_")
    ck = tempfile.mkdtemp(prefix="ddm_ck_")
    try:
        for i, b in enumerate(batches):
            with open(os.path.join(src, f"b{i:03d}.json"), "w") as f:
                for r in b:
                    f.write(
                        json.dumps({k: v for k, v in r.items() if k != "t"})
                        + "\n"
                    )
            time.sleep(0.05)  # distinct mtimes => deterministic file order
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = dedup_stream(
            stream, text_col="text", ts_col="ts",
            watermark=f"{delay_s} seconds",
        )
        name = f"dedup_model_{next(_qn)}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        drain(q, 180)
        return sorted(
            r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def model_dedup(
    batches,
    delay_s,
    *,
    late_filter=True,
    lagged_evict=True,
    evict_inclusive=True,
    extend_on_dup=False,
    thread_state=True,
):
    """Imperative twin. The keyword mutants exist ONLY for the teeth
    tests — defaults are the pinned engine semantics."""
    state: dict[str, int] = {}  # key -> expiry (first-seen t + delay)
    out: list[int] = []
    batch_maxes: list[int | None] = []
    for i, batch in enumerate(batches):
        lagged = [m for m in batch_maxes[: i - 1] if m is not None]
        lagged_wm = (max(lagged) - delay_s) if lagged else None
        unlagged = [m for m in batch_maxes[:i] if m is not None]
        unlagged_wm = (max(unlagged) - delay_s) if unlagged else None
        evict_wm = lagged_wm if lagged_evict else unlagged_wm
        if evict_wm is not None:
            keep = (
                (lambda exp: exp > evict_wm)
                if evict_inclusive
                else (lambda exp: exp >= evict_wm)
            )
            state = {k: exp for k, exp in state.items() if keep(exp)}
        if not thread_state:
            state = {}
        for r in batch:  # file order == arrival order (one file, one task)
            if late_filter and lagged_wm is not None and r["t"] <= lagged_wm:
                continue
            if r["text"] in state:
                if extend_on_dup:
                    state[r["text"]] = r["t"] + delay_s
                continue
            state[r["text"]] = r["t"] + delay_s
            out.append(r["doc_id"])
        batch_maxes.append(max((r["t"] for r in batch), default=None))
    return sorted(out)


# ------------------------------------------------------- pinned scenarios

DELAY = 50


def scenario_same_batch_dup():
    """Two same-key rows in one micro-batch: exactly one emission (the
    first in file order — single-file batches read as one map task)."""
    return [[_doc(1, "k1", 10), _doc(2, "k1", 10), _doc(3, "k2", 10)]]


def scenario_late_lag_and_tie():
    """The late filter uses the one-batch-LAGGED watermark, tie drops:
    c@550 is behind batch 2's 600 but above the lagged 500-50=450 ->
    kept; d@450 ties the lagged watermark -> dropped."""
    return [
        [_doc(1, "a", 500)],
        [_doc(2, "b", 600)],
        [_doc(3, "c", 550), _doc(4, "d", 450)],
    ]


def scenario_no_extend():
    """A dropped duplicate must NOT extend its key's expiry: k1's expiry
    stays 100+50=150 despite the dup at 140, so the lagged eviction
    watermark 230-50=180 at batch 5 has evicted it and doc5 re-emits.
    An extend-on-dup mutant keeps expiry 190 > 180 and wrongly drops."""
    return [
        [_doc(1, "k1", 100)],
        [_doc(2, "k1", 140)],
        [_doc(3, "k3", 230)],
        [_doc(4, "k4", 231)],
        [_doc(5, "k1", 185)],
    ]


def scenario_evict_boundary():
    """Expiry exactly AT the eviction watermark evicts (inclusive): k1
    expiry 150 == lagged wm 200-50 at batch 4 -> doc4 re-emits. A
    strict-< mutant keeps the state and wrongly drops."""
    return [
        [_doc(1, "k1", 100)],
        [_doc(2, "k3", 200)],
        [_doc(3, "k4", 201)],
        [_doc(4, "k1", 160)],
    ]


def scenario_evict_lagged():
    """Eviction uses the LAGGED watermark: at batch 3 the unlagged
    watermark 230-50=180 >= expiry 150 would evict k1 and re-emit doc3,
    but the engine's lagged 100-50=50 keeps the state -> dup-drop."""
    return [
        [_doc(1, "k1", 100)],
        [_doc(2, "k3", 230)],
        [_doc(3, "k1", 160)],
    ]


def scenario_fresh_after_evict():
    """After eviction a key re-emits and starts a FRESH expiry from its
    re-emit ts: k1 re-emits at 320 (expiry 370), suppresses the dup at
    330, is evicted again by the lagged wm 430-50=380 >= 370, and
    re-emits once more at 381 (just above the late cutoff 380)."""
    return [
        [_doc(1, "k1", 100)],
        [_doc(2, "k3", 300)],
        [_doc(3, "k4", 301)],
        [_doc(4, "k1", 320)],
        [_doc(5, "k1", 330)],
        [_doc(6, "k5", 430)],
        [_doc(7, "k6", 431)],
        [_doc(8, "k1", 381)],
    ]


def scenario_cross_batch_dup():
    """In-horizon repeat in the NEXT batch: only threaded state can
    suppress it."""
    return [
        [_doc(1, "k1", 0)],
        [_doc(2, "k1", 10), _doc(3, "k2", 10)],
    ]


@pytest.mark.parametrize(
    "scenario",
    [
        scenario_same_batch_dup,
        scenario_late_lag_and_tie,
        scenario_no_extend,
        scenario_evict_boundary,
        scenario_evict_lagged,
        scenario_fresh_after_evict,
        scenario_cross_batch_dup,
    ],
)
def test_engine_matches_model_on_pinned_scenarios(spark, scenario):
    batches = scenario()
    assert run_engine(spark, batches, DELAY) == model_dedup(batches, DELAY)


def test_model_mutants_fail_on_engine_output(spark):
    """Teeth: each wrong model disagrees with the REAL engine on an input
    crafted to expose it — so the suite cannot pass with a model that has
    the wrong late rule, wrong eviction watermark/boundary, expiry
    extension on duplicates, or unthreaded state."""
    b = scenario_no_extend()
    engine = run_engine(spark, b, DELAY)
    assert engine == model_dedup(b, DELAY)
    # doc5 wrongly suppressed by an extend-expiry-on-duplicate mutant
    assert model_dedup(b, DELAY, extend_on_dup=True) != engine

    b = scenario_evict_lagged()
    engine = run_engine(spark, b, DELAY)
    assert engine == model_dedup(b, DELAY)
    # doc3 wrongly re-emitted by an unlagged-eviction mutant
    assert model_dedup(b, DELAY, lagged_evict=False) != engine

    b = scenario_evict_boundary()
    engine = run_engine(spark, b, DELAY)
    assert engine == model_dedup(b, DELAY)
    # doc4 wrongly suppressed by a strict-< eviction-boundary mutant
    assert model_dedup(b, DELAY, evict_inclusive=False) != engine

    b = scenario_late_lag_and_tie()
    engine = run_engine(spark, b, DELAY)
    assert engine == model_dedup(b, DELAY)
    # doc4 (at the lagged watermark) wrongly emitted without the filter
    assert model_dedup(b, DELAY, late_filter=False) != engine

    b = scenario_cross_batch_dup()
    engine = run_engine(spark, b, DELAY)
    assert engine == model_dedup(b, DELAY)
    # doc2 wrongly re-emitted by a fresh-state-per-batch mutant
    assert model_dedup(b, DELAY, thread_state=False) != engine


def test_engine_matches_model_on_shuffled_random_replays(spark):
    """Randomized property: shuffled arrival orders, cross-batch dups,
    late rows, evictions and re-emissions, 1-5 micro-batches. Seeded for
    reproducibility. Constraint: at most one row per key per batch — a
    same-batch dup's emitted doc_id depends on partition arrival order,
    which single-file batches only pin for the deterministic scenarios
    above. The generator is checked to actually produce late-dropped
    rows AND post-eviction re-emissions across the corpus (otherwise
    those model terms would be dead weight)."""
    rng = random.Random(1404)
    total_late_dropped = 0
    total_reemits = 0
    for case in range(6):
        n_batches = rng.randint(2, 5)
        batches = []
        did = itertools.count(1)
        for _ in range(n_batches):
            keys = rng.sample(["k1", "k2", "k3", "k4", "k5"], rng.randint(0, 4))
            batch = [_doc(next(did), k, rng.randint(0, 600)) for k in keys]
            rng.shuffle(batch)  # arrival order decoupled from event time
            batches.append(batch)
        got = run_engine(spark, batches, DELAY)
        want = model_dedup(batches, DELAY)
        assert got == want, f"case {case}: engine={got} model={want}"
        # corpus coverage counters
        key_of = {r["doc_id"]: r["text"] for b in batches for r in b}
        per_key: dict[str, int] = {}
        for d in want:
            per_key[key_of[d]] = per_key.get(key_of[d], 0) + 1
        total_reemits += sum(c - 1 for c in per_key.values())
        maxes: list[int | None] = []
        for i, b in enumerate(batches):
            lagged = [m for m in maxes[: i - 1] if m is not None]
            wm = (max(lagged) - DELAY) if lagged else None
            total_late_dropped += sum(
                1 for r in b if wm is not None and r["t"] <= wm
            )
            maxes.append(max((r["t"] for r in b), default=None))
    assert total_late_dropped > 0, "generator never exercised the late filter"
    assert total_reemits > 0, "generator never exercised eviction re-emission"
