"""Model-based property tests for watermarked APPEND-mode window
aggregation — tumbling/sliding ``F.window`` (streaming/events.py
``sliding_agg_stream``) and ``F.session_window`` (``session_agg_stream``).

Completes the model-twin program (throttle r13; dedup + enrich r14):
these paths previously had end-to-end parity + enumerated dirty cases
only. The engine rules below were pinned empirically this round with a
24-probe corpus (W1-W7b incl. boundary variants, S1-S8; the two
confounded round-1 S4 probes are superseded by S4r and counted;
maxFilesPerTrigger=1 file-drop replay, one file == one micro-batch),
the same method that caught the wrong pre-filter docstring in r13.

TUMBLING / SLIDING WINDOWS (probes W1-W7b):

1. WINDOW ASSIGNMENT: a row at ``t`` joins every window
   ``[k*slide, k*slide + window)`` containing it — k may be NEGATIVE
   (no clipping; probe W6b emitted ``[-45, 15)``).
2. LATE FILTER is per-(row, window-copy) on the COPY'S WINDOW END, not
   the row's event time: a copy is dropped iff
   ``window_end <= lagged_wm`` (tie drops, probe W7); a row whose ts is
   behind the watermark still counts into its still-open windows
   (probe W2: ts 65 <= wm 70 kept because end 120 > 70). The watermark
   is the one-batch-LAGGED value measured for every other stateful op:
   ``max(event ts over batches 1..N-2) - delay`` (probe W3).
3. EMISSION: a window is emitted exactly once, when
   ``window_end <= watermark`` (INCLUSIVE, probes W1/W5 — end == wm
   emits; availableNow's final no-data batch flushes with the global
   ``max ts - delay``). No re-emission is possible (probe W4): the
   filter at batch N+1 uses the same watermark that emission at the end
   of batch N used, so a copy for an emitted window is always dropped.
   THIS is why the model needs no per-batch eviction bookkeeping for
   windows — mid-stream emission is provably sink-unobservable — while
   sessions (rule 7) do need it.

SESSION WINDOWS (probes S1-S8):

4. Each row spans ``[t, t + gap)``; sessions merge on INCLUSIVE
   interval touch in BOTH directions — a row starting exactly at a
   session's end merges (probe S2), a row ENDING exactly at a session's
   start merges backward (probe S6), and one row can bridge two open
   sessions into one (probe S7).
5. LATE FILTER: per-row on the row's OWN session end: drop iff
   ``t + gap <= lagged_wm`` (tie drops, probe S5; t + gap == unlagged
   wm survives, probe S5b — the lag matters). A kept row merges into
   open state even if its ts is behind the watermark (probe S3's
   backward-extension to n=3).
6. EMISSION: session end (= max merged ts + gap) ``<= watermark``,
   inclusive (probe S4r via a different-key flusher; the round-1 probe
   S4 was confounded — a same-key flusher merges into the session it
   was meant to flush).
7. EVICTION IS OBSERVABLE: state eviction at the start of batch N uses
   the same lagged watermark as the late filter, and an evicted
   (emitted) session CAN be shadowed by a later kept row, producing
   OVERLAPPING rows for one key in the sink (probe S8: [100,160) then
   [150,210) for the same user). A merge with a not-yet-evicted session
   and a fresh session after eviction differ exactly by this timing
   (scenario s9).

Teeth: each wrong model variant disagrees with the live engine on a
scenario crafted to expose it — row-ts filtering, unlagged watermark,
strict(<) filter/emission boundaries, clipped negative windows,
split-at-touch sessions, and missing mid-stream eviction all fail.
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
    session_agg_stream,
    sliding_agg_stream,
)

SCHEMA = "event_id LONG, event_type STRING, user_id LONG, value DOUBLE, ts TIMESTAMP"
BASE_EPOCH = 1704103200  # 2024-01-01T10:00:00Z
_qn = itertools.count()


def _ev(eid, key, t, uid=1):
    """Event at integer second offset ``t`` in [0, 3600); value eid/2 is
    binary-exact so the DECIMAL sum binds contributions, not just counts."""
    return {
        "event_id": eid,
        "event_type": key,
        "user_id": uid,
        "value": eid * 0.5,
        "ts": f"2024-01-01T10:{t // 60:02d}:{t % 60:02d}",
        "t": t,
    }


def _run_stream(spark, batches, build):
    src = tempfile.mkdtemp(prefix="wmm_src_")
    ck = tempfile.mkdtemp(prefix="wmm_ck_")
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
        name = f"wmm_{next(_qn)}"
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        drain(q, 180)
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def run_engine_windows(spark, batches, delay=0, window=60, slide=60):
    rows = _run_stream(
        spark,
        batches,
        lambda s: sliding_agg_stream(
            s,
            window=f"{window} seconds",
            slide=f"{slide} seconds",
            watermark=f"{delay} seconds",
        ),
    )
    return sorted(
        (
            int(r.window_start.timestamp() - BASE_EPOCH),
            int(r.window_end.timestamp() - BASE_EPOCH),
            r.event_type,
            r.n_events,
            r.sum_value,
        )
        for r in rows
    )


def run_engine_sessions(spark, batches, delay=0, gap=60):
    rows = _run_stream(
        spark,
        batches,
        lambda s: session_agg_stream(
            s, gap=f"{gap} seconds", watermark=f"{delay} seconds"
        ),
    )
    return sorted(
        (
            r.user_id,
            int(r.session_start.timestamp() - BASE_EPOCH),
            int(r.session_end.timestamp() - BASE_EPOCH),
            r.n_events,
            r.sum_value,
        )
        for r in rows
    )


# ------------------------------------------------------------------ models


def _lagged_wms(batches, delay):
    """lagged_wm[i] = watermark the engine applies DURING batch i (late
    filter AND start-of-batch eviction): max event ts over batches
    0..i-2, minus delay; None until two prior batches carry data."""
    maxes = [max((r["t"] for r in b), default=None) for b in batches]
    out = []
    for i in range(len(batches)):
        seen = [m for m in maxes[: i - 1] if m is not None] if i >= 1 else []
        out.append(max(seen) - delay if seen else None)
    return out


def model_windows(
    batches,
    delay=0,
    window=60,
    slide=60,
    *,
    row_ts_filter=False,
    unlagged=False,
    strict_filter=False,
    strict_emit=False,
    clip_negative=False,
):
    """Pure-Python twin of the append-mode sliding/tumbling aggregate.
    Keyword mutants exist ONLY for the teeth tests; defaults are the
    pinned engine semantics. Per rule 3 the final sink is independent of
    WHEN windows were emitted, so the model filters per batch and emits
    once at the end against the global watermark."""
    maxes = [max((r["t"] for r in b), default=None) for b in batches]
    if unlagged:
        wms = []
        for i in range(len(batches)):
            seen = [m for m in maxes[:i] if m is not None]
            wms.append(max(seen) - delay if seen else None)
    else:
        wms = _lagged_wms(batches, delay)
    state: dict[tuple[int, str], list] = {}  # (start, key) -> [n, sum]
    for i, batch in enumerate(batches):
        wm = wms[i]
        for r in batch:
            if row_ts_filter and wm is not None and r["t"] <= wm:
                continue
            k0 = r["t"] // slide * slide
            starts = [
                s
                for s in range(k0 - window + slide, k0 + slide, slide)
                if s <= r["t"] < s + window
            ]
            for s in starts:
                if clip_negative and s < 0:
                    continue
                end = s + window
                if not row_ts_filter and wm is not None:
                    if end < wm or (not strict_filter and end == wm):
                        continue
                acc = state.setdefault((s, r["event_type"]), [0, 0.0])
                acc[0] += 1
                acc[1] += r["event_id"] * 0.5
    seen = [m for m in maxes if m is not None]
    final_wm = (max(seen) - delay) if seen else None
    out = []
    for (s, key), (n, sm) in state.items():
        end = s + window
        if final_wm is not None and (
            end < final_wm or (not strict_emit and end == final_wm)
        ):
            out.append((s, end, key, n, sm))
    return sorted(out)


def model_sessions(
    batches,
    delay=0,
    gap=60,
    *,
    row_ts_filter=False,
    unlagged=False,
    strict_filter=False,
    strict_emit=False,
    split_at_touch=False,
    no_midstream_evict=False,
):
    """Pure-Python twin of the append-mode session aggregate. Unlike
    windows, eviction timing is sink-observable (rule 7), so state is
    evicted at the start of every batch with the lagged watermark."""
    maxes = [max((r["t"] for r in b), default=None) for b in batches]
    if unlagged:
        wms = []
        for i in range(len(batches)):
            seen = [m for m in maxes[:i] if m is not None]
            wms.append(max(seen) - delay if seen else None)
    else:
        wms = _lagged_wms(batches, delay)
    state: dict[int, list[list]] = {}  # uid -> [[start, end, n, sum], ...]
    emitted: list[tuple] = []

    def _evict(wm, emit_strict):
        for uid, sessions in state.items():
            keep = []
            for s in sessions:
                closed = s[1] < wm or (not emit_strict and s[1] == wm)
                if closed:
                    emitted.append((uid, s[0], s[1], s[2], s[3]))
                else:
                    keep.append(s)
            state[uid] = keep

    def _touches(a_start, a_end, b_start, b_end):
        if split_at_touch:
            return a_start < b_end and a_end > b_start
        return a_start <= b_end and a_end >= b_start

    for i, batch in enumerate(batches):
        wm = wms[i]
        if wm is not None and not no_midstream_evict:
            _evict(wm, strict_emit)
        for r in batch:
            end = r["t"] + gap
            if wm is not None:
                if row_ts_filter:
                    if r["t"] <= wm:
                        continue
                elif end < wm or (not strict_filter and end == wm):
                    continue
            iv = [r["t"], end, 1, r["event_id"] * 0.5]
            sessions = state.setdefault(r["user_id"], [])
            changed = True
            while changed:  # transitive merge (a row can bridge sessions)
                changed = False
                for s in sessions:
                    if _touches(iv[0], iv[1], s[0], s[1]):
                        iv = [
                            min(iv[0], s[0]),
                            max(iv[1], s[1]),
                            iv[2] + s[2],
                            iv[3] + s[3],
                        ]
                        sessions.remove(s)
                        changed = True
                        break
            sessions.append(iv)
    seen = [m for m in maxes if m is not None]
    if seen:
        _evict(max(seen) - delay, strict_emit)
    return sorted(emitted)


# ------------------------------------------------------- pinned scenarios
# Engine runs are the slow part (one streaming query each); scenarios are
# shared between the match tests and the teeth via a per-session memo.

WIN_SCENARIOS = {
    # probe W1/W1b: inclusive emission boundary (end == final wm emits)
    "w_emit_tie": ([[_ev(1, "a", 10)], [_ev(2, "a", 60)]], dict()),
    "w_emit_below": ([[_ev(1, "a", 10)], [_ev(2, "a", 59)]], dict()),
    # probe W2: copy-end filter keeps a behind-the-watermark row
    "w_copy_end_filter": (
        [[_ev(1, "a", 70)], [_ev(2, "a", 100)], [_ev(3, "a", 65)],
         [_ev(4, "a", 130)]],
        dict(),
    ),
    # probe W3: the filter watermark is one batch lagged
    "w_lagged_filter": (
        [[_ev(1, "a", 70)], [_ev(2, "a", 200)], [_ev(3, "a", 65)],
         [_ev(4, "a", 300)]],
        dict(),
    ),
    # probe W4: no re-emission once a window has closed
    "w_no_reemit": (
        [[_ev(1, "a", 70)], [_ev(2, "a", 200)], [_ev(3, "a", 65)],
         [_ev(4, "a", 300)], [_ev(5, "a", 75)]],
        dict(),
    ),
    # probe W5/W5b: nonzero delay shifts the inclusive boundary
    "w_delay_tie": ([[_ev(1, "a", 10)], [_ev(2, "a", 110)]], dict(delay=50)),
    "w_delay_below": ([[_ev(1, "a", 10)], [_ev(2, "a", 109)]], dict(delay=50)),
    # probe W7/W7b: filter tie drops (copy end == lagged wm)
    "w_filter_tie": (
        [[_ev(1, "a", 10), _ev(2, "a", 120)], [_ev(3, "a", 250)],
         [_ev(4, "a", 65)], [_ev(5, "a", 400)]],
        dict(),
    ),
    "w_filter_above": (
        [[_ev(1, "a", 10), _ev(2, "a", 120)], [_ev(3, "a", 250)],
         [_ev(4, "a", 125)], [_ev(5, "a", 400)]],
        dict(),
    ),
    # probe W6: sliding — a late row's copies land only in open windows
    "w_slide_partial": (
        [[_ev(1, "a", 50)], [_ev(2, "a", 100)], [_ev(3, "a", 40)],
         [_ev(4, "a", 200)]],
        dict(slide=15),
    ),
    # probe W6b: negative window starts are not clipped; one copy of the
    # late row drops (end 15 <= wm 20), three survive
    "w_slide_negative": (
        [[_ev(1, "a", 8), _ev(2, "a", 20)], [_ev(3, "a", 70)],
         [_ev(4, "a", 8)], [_ev(5, "a", 200)]],
        dict(slide=15),
    ),
    # two keys share windows; state is per (window, key)
    "w_two_keys": (
        [[_ev(1, "a", 10), _ev(2, "b", 30)], [_ev(3, "a", 40)],
         [_ev(4, "b", 200)]],
        dict(),
    ),
}

SESS_SCENARIOS = {
    # probe S1: merge across batches
    "s_merge": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 150)], [_ev(3, "a", 400)]],
        dict(),
    ),
    # probe S2: forward adjacency tie (ts == session end) merges
    "s_touch_forward": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 160)], [_ev(3, "a", 500)]],
        dict(),
    ),
    # probe S6/S6b: backward touch merges; a 1s gap does not
    "s_touch_backward": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 40)], [_ev(3, "a", 500, uid=2)]],
        dict(),
    ),
    "s_gap_one": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 39)], [_ev(3, "a", 500, uid=2)]],
        dict(),
    ),
    # probe S7: one row bridges two open sessions
    "s_bridge": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 210)], [_ev(3, "a", 155)],
         [_ev(4, "a", 600, uid=2)]],
        dict(),
    ),
    # probe S3: late row extends an open session backward (n=3) after an
    # older session of the same key was already emitted
    "s_late_backward_extend": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 300)], [_ev(3, "a", 301)],
         [_ev(4, "a", 260)], [_ev(5, "a", 500)]],
        dict(),
    ),
    # probe S4r/S4r2: inclusive emission via a different-key flusher
    "s_emit_tie": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 160, uid=2)]],
        dict(),
    ),
    "s_emit_below": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 159, uid=2)]],
        dict(),
    ),
    # probe S5/S5b: filter tie (t+gap == lagged wm) drops; t+gap ==
    # UNLAGGED wm survives (discriminates the lag)
    "s_filter_tie": (
        [[_ev(1, "a", 300, uid=2)], [_ev(2, "a", 301, uid=2)],
         [_ev(3, "a", 240)], [_ev(4, "a", 500, uid=3)]],
        dict(),
    ),
    "s_filter_above_lagged": (
        [[_ev(1, "a", 300, uid=2)], [_ev(2, "a", 301, uid=2)],
         [_ev(3, "a", 241)], [_ev(4, "a", 500, uid=3)]],
        dict(),
    ),
    # probe S8: overlapping same-key rows in the sink — the session was
    # evicted (lagged wm 160 >= end 160) before the late row arrived
    "s_overlap_reemit": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 160, uid=2)],
         [_ev(3, "a", 161, uid=2)], [_ev(4, "a", 150)],
         [_ev(5, "a", 600, uid=3)]],
        dict(),
    ),
    # s9: same shape but the session is NOT yet evicted when the late
    # row lands (lagged wm 100 < end 160) -> one merged session. Only a
    # model with correctly-timed eviction gets BOTH this and s8 right.
    "s_merge_before_evict": (
        [[_ev(1, "a", 100)], [_ev(2, "a", 165, uid=2)], [_ev(3, "a", 150)],
         [_ev(4, "a", 600, uid=3)]],
        dict(),
    ),
}

_memo: dict[tuple, list] = {}


def _engine_win(spark, name):
    if ("w", name) not in _memo:
        batches, kw = WIN_SCENARIOS[name]
        _memo[("w", name)] = run_engine_windows(spark, batches, **kw)
    return _memo[("w", name)]


def _engine_sess(spark, name):
    if ("s", name) not in _memo:
        batches, kw = SESS_SCENARIOS[name]
        _memo[("s", name)] = run_engine_sessions(spark, batches, **kw)
    return _memo[("s", name)]


@pytest.mark.parametrize("name", sorted(WIN_SCENARIOS))
def test_windows_engine_matches_model(spark, name):
    batches, kw = WIN_SCENARIOS[name]
    assert _engine_win(spark, name) == model_windows(batches, **kw), name


@pytest.mark.parametrize("name", sorted(SESS_SCENARIOS))
def test_sessions_engine_matches_model(spark, name):
    batches, kw = SESS_SCENARIOS[name]
    assert _engine_sess(spark, name) == model_sessions(batches, **kw), name


def test_window_model_mutants_fail_on_engine_output(spark):
    """Teeth: every mutant knob disagrees with the LIVE engine on the
    scenario built to expose it."""
    cases = [
        # filtering on row ts would drop W2's behind-the-watermark row
        ("w_copy_end_filter", dict(row_ts_filter=True)),
        # an unlagged watermark would close W3's window one batch early
        ("w_lagged_filter", dict(unlagged=True)),
        # keeping the copy at end == wm would resurrect W7's window
        ("w_filter_tie", dict(strict_filter=True)),
        # strict emission would hold W1's end == wm window back
        ("w_emit_tie", dict(strict_emit=True)),
        # clipping negative starts would drop W6b's [-45, 15) window
        ("w_slide_negative", dict(clip_negative=True)),
    ]
    for name, mutant in cases:
        batches, kw = WIN_SCENARIOS[name]
        engine = _engine_win(spark, name)
        assert engine == model_windows(batches, **kw), name
        assert model_windows(batches, **kw, **mutant) != engine, (
            f"mutant {mutant} has no teeth on {name}"
        )


def test_session_model_mutants_fail_on_engine_output(spark):
    cases = [
        # splitting at touch breaks the S2 adjacency merge
        ("s_touch_forward", dict(split_at_touch=True)),
        # row-ts filtering drops S3's backward-extending late row
        ("s_late_backward_extend", dict(row_ts_filter=True)),
        # keeping t+gap == wm resurrects S5's filtered row
        ("s_filter_tie", dict(strict_filter=True)),
        # an unlagged watermark wrongly drops S5b's t+gap == unlagged row
        ("s_filter_above_lagged", dict(unlagged=True)),
        # strict emission holds S4r's end == wm session back
        ("s_emit_tie", dict(strict_emit=True)),
        # skipping mid-stream eviction merges S8's overlapping sessions
        ("s_overlap_reemit", dict(no_midstream_evict=True)),
    ]
    for name, mutant in cases:
        batches, kw = SESS_SCENARIOS[name]
        engine = _engine_sess(spark, name)
        assert engine == model_sessions(batches, **kw), name
        assert model_sessions(batches, **kw, **mutant) != engine, (
            f"mutant {mutant} has no teeth on {name}"
        )
    # the eviction-timing pair: s8 shows eviction happened, s9 shows it
    # had not happened one watermark notch earlier — a model evicting
    # eagerly (unlagged) gets s9 wrong instead
    b9, kw9 = SESS_SCENARIOS["s_merge_before_evict"]
    engine9 = _engine_sess(spark, "s_merge_before_evict")
    assert engine9 == model_sessions(b9, **kw9)
    assert model_sessions(b9, **kw9, unlagged=True) != engine9


def test_engine_matches_model_on_random_replays(spark):
    """Randomized property over both operators: shuffled arrival, late
    rows, ties, cross-batch merges, 1-2 keys, 2-5 micro-batches. Seeded.
    Timestamps are drawn from a LATTICE (multiples of 20 in [0, 420])
    to make boundary collisions — exact-tie filters, adjacency merges —
    likely rather than measure-zero. Coverage counters verify the corpus
    actually exercised a late-dropped row, a merged multi-event session,
    and a case where mid-stream eviction timing changed the output (else
    the model terms they pin would be dead weight)."""
    rng = random.Random(1409)
    n_late = n_merges = n_evict_observable = 0
    for case in range(5):
        n_batches = rng.randint(3, 6)
        did = itertools.count(1)
        batches = []
        for bi in range(n_batches):
            # forward drift (80 s/batch) advances the watermark and
            # evicts old sessions; ~1/3 of rows are deep-late, landing
            # near evicted state to probe recreation vs merge
            rows = []
            for _ in range(rng.randint(0, 4)):
                if rng.random() < 0.35 and bi >= 2:
                    t = max(0, bi * 80 - rng.choice([40, 60, 80, 100, 160]))
                    t = t // 20 * 20
                else:
                    t = bi * 80 + rng.randrange(0, 121, 20)
                rows.append(
                    _ev(next(did), rng.choice(["a", "b"]), t,
                        uid=rng.randint(1, 2))
                )
            rng.shuffle(rows)
            batches.append(rows)
        got_w = run_engine_windows(spark, batches, slide=30)
        want_w = model_windows(batches, slide=30)
        assert got_w == want_w, f"windows case {case}: {got_w} != {want_w}"
        got_s = run_engine_sessions(spark, batches)
        want_s = model_sessions(batches)
        assert got_s == want_s, f"sessions case {case}: {got_s} != {want_s}"
        # coverage accounting (from the pinned-semantics model's view)
        wms = _lagged_wms(batches, 0)
        for i, b in enumerate(batches):
            if wms[i] is not None:
                n_late += sum(1 for r in b if r["t"] + 60 <= wms[i])
        n_merges += sum(1 for _u, _s, _e, n, _v in want_s if n > 1)
        if want_s != model_sessions(batches, no_midstream_evict=True):
            n_evict_observable += 1
    assert n_late > 0, "corpus never exercised the late filter"
    assert n_merges > 0, "corpus never exercised a session merge"
    assert n_evict_observable > 0, (
        "corpus never made mid-stream eviction timing observable"
    )
