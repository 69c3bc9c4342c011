"""Zero-row robustness sweep: run every registry query against empty
copies of all ten tables.

ANSI mode (Spark 4 default) turns edge arithmetic into runtime crashes
— DIVIDE_BY_ZERO surfaced in events_burst_detection only when a small
input produced a zero-variance group (caught by driver_probe at
sf0.001, invisible at sf0.01). The degenerate limit of that family is
the empty input: every aggregate is NULL/zero, every denominator is
zero, every window empty. A query that survives empty input with 0 rows
(or its documented constant-row output) has no input-shape-dependent
crash path.

    python tools/empty_input_sweep.py [names...]

Builds the empty tables (schema-identical to /root/testdata/sf0.001)
under a temp dir on each run.
"""

from __future__ import annotations

import glob
import sys
import tempfile
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCHEMA_SRC = "/root/testdata/sf0.001"


def build_empty_tables(dest: str) -> None:
    for f in sorted(glob.glob(f"{SCHEMA_SRC}/*.parquet")):
        schema = pq.read_schema(f)
        tbl = pa.table(
            {n: pa.array([], type=schema.field(n).type) for n in schema.names},
            schema=schema,
        )
        pq.write_table(tbl, f"{dest}/{Path(f).name}")


def main() -> int:
    from dataflow_example_spark import queries as Q
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    dest = tempfile.mkdtemp(prefix="dfx_empty_")
    build_empty_tables(dest)
    spark = get_spark(app_name="empty-sweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(Q.QUERIES)
    fails = []
    for name in names:
        t0 = time.time()
        try:
            n = Q.QUERIES[name](spark, dest).count()
            print(f"ok    {name} ({n} rows, {time.time() - t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: {str(ex)[:200]}")
            fails.append(name)
        finally:
            cleanup()
    print(f"\n{len(names) - len(fails)}/{len(names)} queries survive empty input")
    if fails:
        print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
