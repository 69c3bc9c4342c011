"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB (views registered over the same sf dir), then
compares row count, sorted column names, and a dtype-exact value
canonicalization: both sides are materialized through **pyarrow** (which,
unlike pandas, keeps SQL NULL distinct from a genuine float NaN), columns
are compared in name order, rows are sorted by their canonical form, and
every cell must canonicalize identically — ints and floats are DISTINCT
tokens (``7`` != ``7.0``), NULL ("∅") is distinct from NaN ("f:nan"). This
mirrors the driver's value-hash gate: a DuckDB HUGEINT that drifts to
float64 fails here exactly as it fails there.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataflow_example_spark.tables import TABLES  # noqa: E402


def canon(v) -> str:
    """Dtype-exact canonical token for one cell.

    Int and float are deliberately distinct ("i:7" vs "f:7.0") so the
    HUGEINT->float64 drift the driver's hash rejects is rejected here too.
    """
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            # Arrow materialization keeps NULL (None -> "∅") apart from a
            # genuine NaN, so NaN gets its own token: a query emitting NaN
            # where the oracle emits NULL now fails the gate.
            return "f:nan"
        # 12 significant digits: tolerates the last-ulp summation-order
        # noise the driver's hash demonstrably passes (q5/q14 were
        # hash-green with ~1e-16 relative diffs) while still failing the
        # int-vs-float dtype drift it demonstrably rejects (the "f:"
        # prefix keeps 7.0 distinct from the int token "i:7").
        return f"f:{f:.12g}"
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, pd.Timestamp):
        # Arrow keeps Spark's session-tz annotation (UTC) while DuckDB
        # timestamps come back naive; both denote the same UTC instant
        # (box TZ is UTC), so compare in naive UTC.
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(x)}" for k, x in sorted(v.items())) + "}"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v!r}"


def canon_frame(tbl) -> list[tuple[str, ...]]:
    """Name-sorted columns, canonical cells, rows sorted canonically.

    ``tbl`` is a pyarrow Table: ``to_pylist`` yields None for SQL NULL and
    float('nan') for a stored NaN, so the two canonicalize differently.
    """
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(canon(v) for v in vals) for vals in zip(*data)]
    rows.sort()
    return rows


def compare(spark_tbl, duck_tbl) -> list[str]:
    problems: list[str] = []
    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck_tbl.column_names)
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duck={d_cols}")
        return problems
    if spark_tbl.num_rows != duck_tbl.num_rows:
        problems.append(
            f"row count: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}"
        )
        return problems
    s_rows, d_rows = canon_frame(spark_tbl), canon_frame(duck_tbl)
    bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if sr == dr:
            continue
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if sv != dv:
                if bad < 3:
                    problems.append(f"row {i} col {s_cols[c]}: spark={sv} duck={dv}")
                bad += 1
    if bad:
        problems.append(f"{bad} mismatched cells / {len(s_rows)} rows")
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
            spark_tbl = df.toArrow()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        finally:
            # release per-query persisted range frames / scratch dirs
            # (238-query sessions otherwise accumulate them — the
            # round-5 ADVICE leak)
            from dataflow_example_spark.functions.cachereg import cleanup

            cleanup()
        if name not in osql:
            print(
                f"warn  {name}: no oracle (rows-only check) "
                f"rows={spark_tbl.num_rows}"
            )
            continue
        try:
            duck_tbl = con.execute(osql[name]).arrow()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = compare(spark_tbl, duck_tbl)
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s)")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
        else:
            # 0-row results hash-match vacuously (the predicate's positive
            # branch is never exercised at this SF); flag them so rotations
            # surface weak evidence automatically (VERDICT r12 item 6).
            # Entries flagged at EVERY sf need a positive-detection unit
            # test on injected data — see tests/test_vacuous_positive.py
            # and the exempt list in COVERAGE.md.
            vac = "  [VACUOUS: 0 rows]" if spark_tbl.num_rows == 0 else ""
            print(f"ok    {name} ({dt:.1f}s, {spark_tbl.num_rows} rows){vac}")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
