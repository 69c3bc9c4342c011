"""Stage-level profile of one or more registry queries (guide §1).

Runs each named query against $SPARK_GRAFT_SF_DIR with Spark event
logging enabled, executes it N times with the noop sink (first execution
labelled cold, rest steady), then parses the event log into a per-stage
table: wall time, summed executor run time, task count, shuffle
read/write bytes, input bytes. This substitutes for the (disabled) UI:
it answers "which stage is the time, and is it compute or shuffle".

Usage: python tools/profile_query.py <query> [query...] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _eventlog_lines(path: Path):
    """Yield JSON lines from a v1 file or a v2 rolling-log directory."""
    files = (
        [
            f
            for f in sorted(path.iterdir())
            if f.name.startswith("events_") or f.name.startswith("eventLog")
        ]
        if path.is_dir()
        else [path]
    )
    for f in files:
        if f.name.endswith(".zstd"):
            import subprocess

            data = subprocess.run(
                ["zstd", "-dc", str(f)], capture_output=True, check=True
            ).stdout
        else:
            data = f.read_bytes()
        yield from data.decode("utf-8", errors="replace").splitlines()


def parse_eventlog(path: Path) -> None:
    """Aggregate and print per-stage metrics from one event-log file."""
    stages = {}
    task_agg = defaultdict(lambda: defaultdict(float))
    job_of_stage = {}
    desc_of_job = {}
    for line in _eventlog_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc_of_job[jid] = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            for sinfo in ev.get("Stage Infos", []):
                job_of_stage[sinfo["Stage ID"]] = jid
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "name": si.get("Stage Name", "")[:80],
                "tasks": si.get("Number of Tasks"),
                "wall_ms": (comp - sub) if sub and comp else None,
            }
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            a = task_agg[sid]
            a["run_ms"] += tm.get("Executor Run Time", 0)
            a["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
            a["gc_ms"] += tm.get("JVM GC Time", 0)
            a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            sr = tm.get("Shuffle Read Metrics") or {}
            a["sh_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )
            a["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            sw = tm.get("Shuffle Write Metrics") or {}
            a["sh_write_b"] += sw.get("Shuffle Bytes Written", 0)
            a["sh_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
            im = tm.get("Input Metrics") or {}
            a["input_b"] += im.get("Bytes Read", 0)
            a["rows"] += im.get("Records Read", 0) or 0

    print(
        f"{'stage':>5} {'job-desc':<28} {'tasks':>5} {'wall':>7} "
        f"{'runSum':>7} {'cpuSum':>7} {'gc':>5} {'shRd':>8} {'shWr':>8} "
        f"{'input':>9}  name"
    )
    for sid in sorted(stages):
        s = stages[sid]
        a = task_agg[sid]
        jid = job_of_stage.get(sid)
        desc = (desc_of_job.get(jid, "") or "")[:28]
        print(
            f"{sid:>5} {desc:<28} {s['tasks']:>5} "
            f"{(s['wall_ms'] or 0)/1000:>6.2f}s {a['run_ms']/1000:>6.2f}s "
            f"{a['cpu_ms']/1000:>6.2f}s {a['gc_ms']:>4.0f} "
            f"{a['sh_read_b']/1e6:>7.2f}M {a['sh_write_b']/1e6:>7.2f}M "
            f"{a['input_b']/1e6:>8.2f}M  {s['name']}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=SF_DIR)
    args = ap.parse_args()

    log_dir = Path(tempfile.mkdtemp(prefix="spark-events-"))
    import __spark_entry__ as entrymod
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(log_dir),
        },
    )
    qs = entrymod.queries()
    for name in args.names:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, args.sf)
        print(f"\n=== {name}: construct {time.time()-t0:.3f}s")
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(
                f"{name} run{i} {'cold' if i == 0 else 'steady'}"
            )
            r0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(f"  run{i}: {time.time()-r0:.3f}s")
        spark.sparkContext.setJobDescription(None)
        cleanup()
        spark.catalog.clearCache()
    spark.stop()
    time.sleep(1)
    for f in sorted(log_dir.iterdir()):
        if f.suffix != ".inprogress":
            parse_eventlog(f)


if __name__ == "__main__":
    main()
