"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB (views registered over the same sf dir), then
compares row count, sorted column names, and values (rows sorted by their
string form, columns compared in name order — floats must match to 1e-12
relative, everything else exactly; a stricter bar than a value hash).

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataflow_example_spark.tables import TABLES  # noqa: E402


def canon(v):
    if isinstance(v, float):
        return f"{v!r}"
    return repr(v)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-12 * max(abs(fa), abs(fb))
    return a == b


def compare(name: str, spark_rows, duck_rows, spark_cols, duck_cols) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_norm = sorted(
        (tuple(r[i] for i in order) for r in spark_rows),
        key=lambda t: tuple(canon(v) for v in t),
    )
    d_norm = sorted(
        (tuple(r[i] for i in dorder) for r in duck_rows),
        key=lambda t: tuple(canon(v) for v in t),
    )
    bad = 0
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if not values_equal(sv, dv):
                if bad < 3:
                    problems.append(
                        f"row {i} col {sorted(spark_cols)[c]}: spark={sv!r} duck={dv!r}"
                    )
                bad += 1
    if bad:
        problems.append(f"{bad} mismatched cells / {len(s_norm)} rows")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from dataflow_example_spark.session import get_spark

    spark = get_spark(app_name="check-oracles", shuffle_partitions=16)
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
            df = qs[name](spark, args.sf)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in osql:
            print(f"warn  {name}: no oracle (rows-only check) rows={len(spark_rows)}")
            continue
        try:
            res = con.execute(osql[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = compare(name, spark_rows, duck_rows, spark_cols, duck_cols)
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s)")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
        else:
            print(f"ok    {name} ({dt:.1f}s, {len(spark_rows)} rows)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
