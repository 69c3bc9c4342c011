"""CLI entry points mirroring the reference's launchers.

Reference launch surface -> subcommand map:

- ``traffic``  <- TrafficMaxLaneFlow main + runTrafficMaxLaneFlow.sh
  (TrafficMaxLaneFlow.java:352-401; options TrafficMaxLaneFlow.java:322-345)
- ``inject``   <- PubsubFileInjector main + runInjector.sh
  (PubsubFileInjector.java:58-90)
- ``starter``  <- StarterPipeline main (StarterPipeline.java:49-69)

Option names keep the reference's spelling (windowDuration,
windowSlideEvery, streaming, input) so a reference user can port a launch
script mechanically.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from .config import TrafficConfig
from .operators.traffic import traffic_pipeline
from .session import get_spark
from .sinks import write_table
from .sources.injector import inject_file
from .sources.memory import create_strings
from .sources.text import read_text
from .streaming import run_traffic_stream


def _traffic(args: argparse.Namespace) -> None:
    spark = get_spark(app_name="traffic-max-lane-flow")
    cfg = TrafficConfig(
        window_duration_minutes=args.windowDuration,
        window_slide_minutes=args.windowSlideEvery,
        streaming=args.streaming,
        watermark_delay=args.watermarkDelay,
        streaming_honor_payload_timestamp=args.honorPayloadTimestamp,
    )
    if args.streaming:
        # unbounded source = the injector-fed drop directory (SURVEY §3.2)
        if args.quarantine:
            from .streaming import run_traffic_stream_with_quarantine

            query = run_traffic_stream_with_quarantine(
                spark,
                topic_dir=args.input,
                output_dir=args.output,
                quarantine_dir=args.quarantine,
                checkpoint_dir=args.checkpoint or args.output + "_checkpoint",
                config=cfg,
                available_now=args.availableNow,
            )
        else:
            query = run_traffic_stream(
                spark,
                topic_dir=args.input,
                output_dir=args.output,
                checkpoint_dir=args.checkpoint or args.output + "_checkpoint",
                config=cfg,
                available_now=args.availableNow,
            )
        # block with the reference's cancel-on-shutdown semantics
        # (DataflowExampleUtils.java:286-356): Ctrl-C / SIGTERM stops the
        # query gracefully instead of stranding it
        from .streaming.shutdown import wait_to_finish

        wait_to_finish(query, spark)
    else:
        out = traffic_pipeline(read_text(spark, args.input), cfg)
        write_table(out, args.output)


def _inject(args: argparse.Namespace) -> None:
    spark = get_spark(app_name="pubsub-file-injector")
    n = inject_file(spark, args.input, args.outputTopic, chunks=args.chunks)
    print(f"published {n} lines to {args.outputTopic}")


def _starter(args: argparse.Namespace) -> None:  # noqa: ARG001
    spark = get_spark(app_name="starter-pipeline")
    for row in (
        create_strings(spark, ["Hello", "World"])
        .select(F.upper("value").alias("value"))
        .collect()
    ):
        print(row.value)


def _query(args: argparse.Namespace) -> None:
    from .queries import QUERIES

    spark = get_spark(app_name=f"query-{args.name}")
    if args.list or args.name == "list":
        for name in sorted(QUERIES):
            print(name)
        return
    df = QUERIES[args.name](spark, args.sfDir)
    if args.output:
        write_table(df, args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.rows, truncate=False)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="dataflow-example-spark")
    sub = p.add_subparsers(required=True)

    t = sub.add_parser("traffic", help="TrafficMaxLaneFlow pipeline")
    t.add_argument("--input", required=True, help="CSV path (batch) or drop dir (streaming)")
    t.add_argument("--output", required=True, help="sink table path")
    t.add_argument("--windowDuration", type=int, default=60)
    t.add_argument("--windowSlideEvery", type=int, default=1)
    t.add_argument("--streaming", action="store_true")
    t.add_argument("--watermarkDelay", default="10 minutes")
    t.add_argument("--honorPayloadTimestamp", action="store_true")
    t.add_argument("--availableNow", action="store_true")
    t.add_argument("--checkpoint")
    t.add_argument(
        "--quarantine",
        help="streaming only: also write rejected lines + reasons here",
    )
    t.set_defaults(fn=_traffic)

    i = sub.add_parser("inject", help="replay a CSV into a drop directory")
    i.add_argument("--input", required=True)
    i.add_argument("--outputTopic", required=True, help="drop directory")
    i.add_argument("--chunks", type=int, default=4)
    i.set_defaults(fn=_inject)

    s = sub.add_parser("starter", help="StarterPipeline smoke test")
    s.set_defaults(fn=_starter)

    q = sub.add_parser(
        "query", help="run any registry query ('query list' to enumerate)"
    )
    q.add_argument("name", help="query name, or 'list'")
    q.add_argument("--sfDir", default="/root/testdata/sf0.01")
    q.add_argument("--output", help="write parquet here instead of show()")
    q.add_argument("--rows", type=int, default=20)
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=_query)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
