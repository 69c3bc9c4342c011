"""Dump ``explain('formatted')`` for bench queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir> [suffix] [names...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
Plans are captured at sf0.1 (the bench SF) with the same session factory
the bench uses, so Exchange counts / join strategies / PushedFilters match
what the bench times. AQE leaves `isFinalPlan=false` markers; the initial
plan is what code review needs (runtime coalescing is noted separately).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    import bench
    import __spark_entry__ as entrymod
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    names = sys.argv[3:] or bench.BENCH_QUERIES
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="plan-dump")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")
        cleanup()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
