"""Model-based property test for streaming dimension enrichment
(streaming/events.py enrich_events / run_enrich_stream; VERDICT r13
item 2 — extend the test_throttle_model.py pattern to the streaming
paths that only had enumerated cases + batch-twin parity).

The claim worth pinning here is the INVERSE of the stateful operators':
a stream-static broadcast join is STATELESS and UNWATERMARKED, so

1. NO LATE FILTER: a row arbitrarily far behind every previously seen
   event time still joins and emits — there is no watermark to drop it
   (unlike throttle/dedup, where the one-batch-lagged filter is pinned
   by their model suites).
2. NO STATE: every occurrence of a user joins, however many batches or
   duplicates; batch boundaries are invisible (same rows, different
   micro-batch cuts => identical output).
3. INNER JOIN: stream rows whose user_id is missing from the dimension
   are dropped, not null-padded.

The pure-Python twin is the per-row lookup; mutants with a late filter,
first-occurrence-only state, or outer-join semantics must disagree with
the real engine output (teeth), so the suite cannot pass while the
engine secretly drops late rows or carries state.
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
from dataflow_example_spark.streaming.events import (
    enrich_events,
    user_tier_dim,
)

SCHEMA = (
    "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, "
    "value DOUBLE"
)
BASE = "2024-01-01T10:"
_qn = itertools.count()


def _ev(eid, uid, t):
    return {
        "event_id": eid,
        "user_id": uid,
        "event_type": "click",
        "ts": f"{BASE}{t // 60:02d}:{t % 60:02d}",
        "t": t,
        "value": 1.0,
    }


def _tier(uid):
    return {0: "gold", 1: "silver", 2: "bronze"}[uid % 3]


def run_engine(spark, batches, dim_users):
    """Replay batches (one file == one micro-batch) through the
    stream-static enrichment join; returns sorted (event_id, tier)."""
    src = tempfile.mkdtemp(prefix="enm_src_")
    ck = tempfile.mkdtemp(prefix="enm_ck_")
    try:
        for i, b in enumerate(batches):
            with open(os.path.join(src, f"b{i:03d}.json"), "w") as f:
                for r in b:
                    f.write(
                        json.dumps({k: v for k, v in r.items() if k != "t"})
                        + "\n"
                    )
            time.sleep(0.05)  # distinct mtimes => deterministic file order
        dim = user_tier_dim(
            spark.createDataFrame([(u,) for u in dim_users], "user_id long")
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        out = enrich_events(stream, dim)
        name = f"enrich_model_{next(_qn)}"
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
            (r.event_id, r.tier)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def model_enrich(
    batches,
    dim_users,
    *,
    late_filter=False,
    first_touch_state=False,
    outer_join=False,
):
    """Imperative twin. Defaults are the pinned stateless semantics; the
    keyword mutants exist ONLY for the teeth tests."""
    dim = {u: _tier(u) for u in dim_users}
    out: list[tuple[int, str | None]] = []
    seen_users: set[int] = set()
    batch_maxes: list[int | None] = []
    for i, batch in enumerate(batches):
        lagged = [m for m in batch_maxes[: i - 1] if m is not None]
        lagged_wm = max(lagged) if lagged else None
        for r in batch:
            if late_filter and lagged_wm is not None and r["t"] <= lagged_wm:
                continue
            if first_touch_state and r["user_id"] in seen_users:
                continue
            seen_users.add(r["user_id"])
            if r["user_id"] in dim:
                out.append((r["event_id"], dim[r["user_id"]]))
            elif outer_join:
                out.append((r["event_id"], None))
        batch_maxes.append(max((r["t"] for r in batch), default=None))
    return sorted(out)


# ------------------------------------------------------- pinned scenarios

DIM_USERS = [3, 4, 5, 6]  # gold, silver, bronze, gold; user 7 unmatched


def scenario_late_rows_still_join():
    """Row far behind every prior event time (t=5 after 500/600) still
    emits — no watermark, no late filter. A late-filter mutant drops it."""
    return [
        [_ev(1, 3, 500)],
        [_ev(2, 4, 600)],
        [_ev(3, 5, 5)],
    ]


def scenario_repeats_all_join():
    """Same user across batches and within a batch: every occurrence
    joins (stateless) — a first-touch-state mutant suppresses repeats."""
    return [
        [_ev(1, 3, 10), _ev(2, 3, 20)],
        [_ev(3, 3, 30)],
    ]


def scenario_unmatched_drops():
    """user 7 is not in the dimension: inner join drops it — an
    outer-join mutant null-pads it instead."""
    return [
        [_ev(1, 3, 10), _ev(2, 7, 20)],
        [_ev(3, 7, 30), _ev(4, 6, 40)],
    ]


@pytest.mark.parametrize(
    "scenario",
    [
        scenario_late_rows_still_join,
        scenario_repeats_all_join,
        scenario_unmatched_drops,
    ],
)
def test_engine_matches_model_on_pinned_scenarios(spark, scenario):
    batches = scenario()
    assert run_engine(spark, batches, DIM_USERS) == model_enrich(
        batches, DIM_USERS
    )


def test_model_mutants_fail_on_engine_output(spark):
    """Teeth: each wrong model disagrees with the REAL engine on an
    input crafted to expose it."""
    b = scenario_late_rows_still_join()
    engine = run_engine(spark, b, DIM_USERS)
    assert engine == model_enrich(b, DIM_USERS)
    # event 3 (behind the lagged max) wrongly dropped by a late-filter mutant
    assert model_enrich(b, DIM_USERS, late_filter=True) != engine

    b = scenario_repeats_all_join()
    engine = run_engine(spark, b, DIM_USERS)
    assert engine == model_enrich(b, DIM_USERS)
    # events 2 and 3 wrongly suppressed by a first-touch-state mutant
    assert model_enrich(b, DIM_USERS, first_touch_state=True) != engine

    b = scenario_unmatched_drops()
    engine = run_engine(spark, b, DIM_USERS)
    assert engine == model_enrich(b, DIM_USERS)
    # user 7's rows wrongly null-padded by an outer-join mutant
    assert model_enrich(b, DIM_USERS, outer_join=True) != engine


def test_batch_split_invariance_and_random_replays(spark):
    """Randomized property: the SAME multiset of rows under different
    micro-batch cuts produces the SAME output (statelessness made
    visible), and each replay matches the model. Seeded; the generator
    is checked to produce late rows and unmatched users so those claims
    are exercised, not vacuous."""
    rng = random.Random(1405)
    total_late = 0
    total_unmatched = 0
    for case in range(4):
        n = rng.randint(5, 14)
        rows = [
            _ev(eid, rng.choice([3, 4, 5, 6, 7, 8]), rng.randint(0, 600))
            for eid in range(1, n + 1)
        ]
        rng.shuffle(rows)
        outputs = []
        for n_batches in (1, rng.randint(2, 4)):
            cuts = sorted(rng.randint(0, n) for _ in range(n_batches - 1))
            batches = [rows[a:b] for a, b in zip([0, *cuts], [*cuts, n])]
            got = run_engine(spark, batches, DIM_USERS)
            want = model_enrich(batches, DIM_USERS)
            assert got == want, f"case {case}: engine={got} model={want}"
            outputs.append(got)
            # coverage: rows behind the running max of earlier batches
            hi = -1
            for b in batches:
                total_late += sum(1 for r in b if r["t"] < hi)
                hi = max([hi, *(r["t"] for r in b)])
        assert outputs[0] == outputs[1], f"case {case}: batch cut changed output"
        total_unmatched += sum(1 for r in rows if r["user_id"] not in DIM_USERS)
    assert total_late > 0, "generator never produced out-of-order rows"
    assert total_unmatched > 0, "generator never produced unmatched users"
