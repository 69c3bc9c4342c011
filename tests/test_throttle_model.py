"""Model-based property test for the stateful streaming throttle
(streaming/stateful.py throttle_stream; VERDICT r12 item 5 — the last
mirrored-semantics family without an imperative twin).

The pure-Python model replays the gap-session semantics under
micro-batched arrival (maxFilesPerTrigger=1 file-drop replay), including
the two empirically-pinned engine rules this round's probes measured:

1. LATE FILTER, one batch lagged: a row in micro-batch N reaches the
   stateful function iff ``ts > max(event ts over batches 1..N-2)``
   (zero watermark delay; tie at the boundary DROPS). Spark maintains a
   late-events watermark one batch behind the eviction watermark, so a
   row can be behind its batch's predecessor batch and still arrive.
2. TIMEOUT REMOVAL IS UNOBSERVABLE: a row arriving after its key's
   event-time timeout fired must be above the lagged watermark >= the
   eviction watermark that fired the timeout > last_seen + gap, so it
   starts a new session whether or not the state was removed. The model
   therefore carries NO timeout logic — engine parity on inputs that DO
   fire the timeout (scenario_timeout below) proves the removal is pure
   state-size hygiene, exactly the module docstring's claim.

Teeth (each verified by a deliberately wrong model failing on the same
engine output): >= instead of > in the gap comparison, fresh state per
batch instead of cross-batch threading, and no late filter.
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
from dataflow_example_spark.streaming.stateful import throttle_stream

SCHEMA = "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE"
BASE = "2024-01-01T10:"
_qn = itertools.count()


def _ev(eid, uid, typ, t):
    """t: integer second offset within [0, 3600)."""
    return {
        "event_id": eid,
        "user_id": uid,
        "event_type": typ,
        "ts": f"{BASE}{t // 60:02d}:{t % 60:02d}",
        "t": t,
        "value": 1.0,
    }


def run_engine(spark, batches, gap_s):
    """Replay batches (one file == one micro-batch) through
    throttle_stream; returns the sorted emitted event_ids."""
    src = tempfile.mkdtemp(prefix="thr_src_")
    ck = tempfile.mkdtemp(prefix="thr_ck_")
    try:
        return _run_engine(spark, batches, gap_s, src, ck)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def _run_engine(spark, batches, gap_s, src, ck):
    for i, b in enumerate(batches):
        with open(os.path.join(src, f"b{i:03d}.json"), "w") as f:
            for r in b:
                f.write(json.dumps({k: v for k, v in r.items() if k != "t"}) + "\n")
        time.sleep(0.05)  # distinct mtimes => deterministic file order

    lines = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withWatermark("ts", "0 seconds")
    )
    out = throttle_stream(
        lines, keys=["user_id", "event_type"], ts_col="ts",
        gap_seconds=gap_s, order_col="event_id",
    )
    name = f"thr_model_{next(_qn)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 180)
    return sorted(r.event_id for r in spark.sql(f"SELECT * FROM {name}").collect())


def model_throttle(batches, gap_s, *, late_filter=True, thread_state=True,
                   strict_gap=True):
    """Imperative twin. The keyword mutants exist ONLY for the teeth
    tests — defaults are the pinned engine semantics."""
    state: dict[tuple, int] = {}
    out: list[int] = []
    batch_maxes: list[int] = []
    for i, batch in enumerate(batches):
        # late-events watermark lags one batch: max ts through batch i-2;
        # an all-empty prefix means NO watermark yet (the engine's stays at
        # the 1970 epoch until data arrives), not t=0
        seen = [m for m in batch_maxes[: i - 1] if m is not None]
        late_wm = max(seen) if (i >= 2 and seen) else None
        rows = [
            r for r in batch
            if not late_filter or late_wm is None or r["t"] > late_wm
        ]
        if not thread_state:
            state = {}
        by_key: dict[tuple, list] = {}
        for r in rows:
            by_key.setdefault((r["user_id"], r["event_type"]), []).append(r)
        for k, krows in by_key.items():
            krows.sort(key=lambda r: (r["t"], r["event_id"]))
            last = state.get(k)
            for r in krows:
                gap_open = (
                    (r["t"] - last > gap_s) if strict_gap
                    else (r["t"] - last >= gap_s)
                ) if last is not None else True
                if gap_open:
                    out.append(r["event_id"])
                last = r["t"]
            state[k] = last
        batch_maxes.append(max((r["t"] for r in batch), default=None))
    return sorted(out)


# ------------------------------------------------------- pinned scenarios

GAP = 97


def scenario_timeout():
    """Key 1 times out between batches (wm 500 > last 0 + gap 97 with no
    key-1 data in batch 2 -> hasTimedOut branch runs and removes state);
    its late in-gap row in batch 3 is dropped by the lagged late filter
    (50 <= 500), so output is identical with or without timeout logic."""
    return [
        [_ev(1, 1, "c", 0), _ev(2, 2, "c", 500)],
        [_ev(3, 2, "c", 600)],
        [_ev(4, 1, "c", 50)],
    ]


def scenario_late_boundary():
    """Row at exactly the lagged watermark (500) drops; a row late
    relative to its OWN batch's max but above the lagged wm is kept."""
    return [
        [_ev(1, 1, "c", 0), _ev(2, 2, "c", 500)],
        [_ev(3, 2, "c", 600), _ev(4, 3, "c", 100)],  # 100 > lagged wm 0: kept
        [_ev(5, 1, "c", 500)],                        # 500 <= lagged wm 500: drop
    ]


def scenario_late_out_of_gap():
    """A late row (t=200 <= lagged wm 500) that is OUT of its key's gap:
    the engine drops it at the late filter; without that filter it would
    be emitted (gap 200-0 > 97 regardless of whether the timeout removed
    the state) — the input that gives the late-filter mutant teeth."""
    return [
        [_ev(1, 1, "c", 0), _ev(2, 2, "c", 500)],
        [_ev(3, 2, "c", 600)],
        [_ev(4, 1, "c", 200)],
    ]


def scenario_cross_batch_gap():
    """In-gap repeat lands in the NEXT batch: only threaded state can
    suppress it; and an exact-gap repeat must stay suppressed (strict >).
    NOTE the clock refreshes on SUPPRESSED events too: e4's gap is
    measured from e3 (t=50), so t=50+GAP is the exact boundary."""
    return [
        [_ev(1, 1, "c", 0), _ev(2, 2, "c", 10)],
        [_ev(3, 1, "c", 50), _ev(4, 1, "c", 50 + GAP)],  # 50: in-gap; 50+GAP: exact
        [_ev(5, 1, "c", 50 + GAP + 98)],                  # new session
    ]


@pytest.mark.parametrize(
    "scenario",
    [
        scenario_timeout,
        scenario_late_boundary,
        scenario_late_out_of_gap,
        scenario_cross_batch_gap,
    ],
)
def test_engine_matches_model_on_pinned_scenarios(spark, scenario):
    batches = scenario()
    assert run_engine(spark, batches, GAP) == model_throttle(batches, GAP)


def test_model_mutants_fail_on_engine_output(spark):
    """Teeth: each wrong model disagrees with the REAL engine on an input
    crafted to expose it — so the suite cannot pass with a model that has
    the wrong gap comparison, no state threading, or no late filter."""
    b_gap = scenario_cross_batch_gap()
    engine_gap = run_engine(spark, b_gap, GAP)
    assert engine_gap == model_throttle(b_gap, GAP)
    # exact-gap row 4 emitted by a >= mutant, suppressed by the engine
    assert model_throttle(b_gap, GAP, strict_gap=False) != engine_gap
    # row 3 (in-gap, next batch) emitted by a fresh-state-per-batch mutant
    assert model_throttle(b_gap, GAP, thread_state=False) != engine_gap

    b_late = scenario_late_out_of_gap()
    engine_late = run_engine(spark, b_late, GAP)
    assert engine_late == model_throttle(b_late, GAP)
    # row 4 (behind the lagged watermark, out of gap) emitted by a
    # no-late-filter mutant — the engine's filter drops it
    assert model_throttle(b_late, GAP, late_filter=False) != engine_late


def test_engine_matches_model_on_shuffled_random_replays(spark):
    """Randomized property: shuffled arrival orders, ts ties, late rows,
    multiple keys, 1-4 micro-batches. Seeded for reproducibility; the
    generator is checked to actually produce late-dropped rows across the
    corpus (otherwise the late-filter term would be dead weight)."""
    rng = random.Random(1304)
    total_dropped = 0
    for case in range(6):
        n = rng.randint(4, 28)
        rows = [
            _ev(
                eid,
                rng.randint(1, 2),
                rng.choice(["c", "v"]),
                rng.randint(0, 600),
            )
            for eid in range(1, n + 1)
        ]
        rng.shuffle(rows)  # arrival order decoupled from event time
        n_batches = rng.randint(1, 4)
        cuts = sorted(rng.randint(0, n) for _ in range(n_batches - 1))
        batches = [
            rows[a:b] for a, b in zip([0, *cuts], [*cuts, n])
        ]
        got = run_engine(spark, batches, GAP)
        want = model_throttle(batches, GAP)
        assert got == want, f"case {case}: engine={got} model={want}"
        # count late-dropped rows so the corpus provably hits the filter
        kept = sum(
            1 for i, b in enumerate(batches) for r in b
            if i < 2 or r["t"] > max(
                (x["t"] for bb in batches[: i - 1] for x in bb), default=-1
            )
        )
        total_dropped += sum(len(b) for b in batches) - kept
    assert total_dropped > 0, "generator never exercised the late filter"
