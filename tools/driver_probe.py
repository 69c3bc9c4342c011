"""Driver-canonicalizer emulation probe.

Round-5 lesson: the driver's correctness gate canonicalizes results by
sorting the pandas frame over all columns (``df.sort_values`` →
``Categorical(k, ordered=True)``), which CRASHES on unhashable cells
(ndarray/dict) and on mixed-type object columns — failure modes the
repo's pyarrow-based strict gate (tools/check_oracles.py) does not see.
``emb_quantize_int8`` passed locally and erred at the driver exactly
this way.

This probe replays the driver's risky step verbatim on BOTH sides of
every registry query: Spark result via ``toPandas().sort_values(by=all
columns)`` and the DuckDB oracle the same way. Any exception = a
driver-contract divergence caught before the driver sees it.

Usage: python tools/driver_probe.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataflow_example_spark.tables import TABLES  # noqa: E402


def pandas_sort_ok(df) -> str | None:
    """The driver's canonicalization step: sort by every column.
    Returns an error string, or None if the frame sorts cleanly."""
    try:
        df.sort_values(by=sorted(df.columns), inplace=False)
        return None
    except Exception as ex:  # noqa: BLE001
        return f"{type(ex).__name__}: {ex}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from dataflow_example_spark.functions.cachereg import cleanup
    from dataflow_example_spark.session import get_spark

    spark = get_spark(app_name="driver-probe", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs, osql = e.queries(), e.oracle_sql()
    names = args.names or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sp = qs[name](spark, args.sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(ex)[:160]}")
            failed.append(name)
            continue
        finally:
            cleanup()
        errs = []
        err = pandas_sort_ok(sp)
        if err:
            errs.append(f"spark-side sort: {err}")
        if name in osql:
            try:
                du = con.execute(osql[name]).df()
                err = pandas_sort_ok(du)
                if err:
                    errs.append(f"oracle-side sort: {err}")
            except Exception as ex:  # noqa: BLE001
                errs.append(f"duckdb error: {str(ex)[:160]}")
        dt = time.time() - t0
        if errs:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"ok    {name} ({dt:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} sort cleanly")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
