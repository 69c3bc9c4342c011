"""Cross-partitioning determinism check.

The driver's verify session chooses its own ``spark.sql.shuffle.
partitions``; any query whose output depends on partition count or
partition order — a raw double SUM, an un-tie-broken row_number, a
first()/any_value() over an unordered group — would be hash-green
locally and hash-red (or flaky) at the driver. The repo's defenses are
exact DECIMAL sums, pinned folds, fixed-point sums, and total-order
tie-breaks; this tool verifies the defense holds for EVERY registry
query by executing each twice, under shuffle.partitions=16 and =7 (and
default parallelism differences), and comparing the full canonicalized
result sets.

    python tools/determinism_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from check_oracles import canon_frame  # noqa: E402  (same tools dir)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    spark = get_spark(app_name="determinism-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = args.names or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "16")
            a = canon_frame(qs[name](spark, args.sf).toArrow())
            cleanup()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = canon_frame(qs[name](spark, args.sf).toArrow())
            cleanup()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: error: {str(ex)[:160]}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if a != b:
            diff = sum(1 for x, y in zip(a, b) if x != y) + abs(
                len(a) - len(b)
            )
            print(
                f"FAIL  {name} ({dt:.1f}s): {diff} rows differ across "
                "partitionings"
            )
            failed.append(name)
        else:
            print(f"ok    {name} ({dt:.1f}s, {len(a)} rows)")
    print(f"\n{len(names) - len(failed)}/{len(names)} partition-deterministic")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
