"""A/B-attribute the round-8 dirty-input guards (VERDICT r8 item 1).

BENCH_DETAIL_r8 showed sim_cosine_topk +28% and dedup_minhash_lsh +23.5%
steady vs r7, coinciding with the round-8 ``valid_vectors`` guards.
SCALE.md blamed box contention but nobody measured. This tool times the
affected queries with the guards ON (production code) and OFF
(``valid_vectors``/``finite_vectors`` monkeypatched to identity), same
pass structure as bench.py (N runs x N passes, min-agg, modes
interleaved within a pass so a contention window cannot poison one mode
only). dedup_minhash_lsh and events_sliding_agg carry NO vector guard
(grep: no valid_vectors/finite_vectors in their plan) — they run here as
no-guard CONTROLS: any on/off delta on them is pure measurement noise,
which bounds the noise floor for interpreting the guarded queries.

Usage: python tools/guard_ab.py [--sf DIR]  -> prints a markdown table
(paste into SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GUARDED = ["sim_cosine_topk", "sim_ivf_topk", "sim_lsh_topk"]
CONTROLS = ["dedup_minhash_lsh", "events_sliding_agg"]
N_RUNS = 2
N_PASSES = 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from dataflow_example_spark.functions import similarity as sim
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    spark = get_spark(app_name="guard-ab")
    qs = entrymod.queries()
    names = [n for n in GUARDED + CONTROLS if n in qs]

    orig = (sim.valid_vectors, sim.finite_vectors)

    def set_mode(mode: str) -> None:
        if mode == "off":
            sim.valid_vectors = lambda df, vec_col="embedding": df
            sim.finite_vectors = lambda df, vec_col="embedding": df
        else:
            sim.valid_vectors, sim.finite_vectors = orig

    # warm-up both modes at sf0.001 (codegen/JIT; plans differ by mode)
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for mode in ("on", "off"):
            set_mode(mode)
            for n in names:
                qs[n](spark, warm).write.format("noop").mode("overwrite").save()
        cleanup()
        spark.catalog.clearCache()

    best: dict[tuple[str, str], float] = {}
    for pass_idx in range(N_PASSES):
        # alternate which mode runs first: the second mode of a (query,
        # pass) cell inherits warm OS page cache / shuffle-file state from
        # the first, which the pass-0-only ordering measured as a fake
        # +30% "guard cost" on the no-guard controls. With the order
        # flipped on odd passes, min-agg gives each mode one warm-position
        # sample and the ordering bias cancels.
        order = ("on", "off") if pass_idx % 2 == 0 else ("off", "on")
        for n in names:
            for mode in order:
                set_mode(mode)
                df = qs[n](spark, args.sf)
                for _r in range(N_RUNS):
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    k = (n, mode)
                    best[k] = min(best.get(k, float("inf")), dt)
                cleanup()
                spark.catalog.clearCache()
    set_mode("on")

    rows = []
    print("| query | role | guard on (s) | guard off (s) | guard cost |")
    print("|---|---|---|---|---|")
    for n in names:
        on, off = best[(n, "on")], best[(n, "off")]
        cost = (on - off) / off * 100 if off else float("nan")
        role = "guarded" if n in GUARDED else "control (no guard)"
        print(f"| {n} | {role} | {on:.3f} | {off:.3f} | {cost:+.1f}% |")
        rows.append({"query": n, "role": role, "on": round(on, 3),
                     "off": round(off, 3), "cost_pct": round(cost, 1)})
    print(json.dumps({"guard_ab": rows, "sf": args.sf,
                      "runs": N_RUNS, "passes": N_PASSES, "agg": "min"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
