"""Scale smoke for the relational (TPC-H-shape) family: amplify the
sf0.1 facts ~`factor`x into a scratch sf_dir and run the REGISTRY
queries themselves (not re-implementations) across the four join
shapes — scan-agg (q1), star join (q5), semi join (q4), outer join +
two-level agg (q13) — checking wall time grows roughly linearly and
the results obey EXACT amplification invariants.

Amplification model: copy i of customer/orders/lineitem offsets
c_custkey/o_orderkey by copy-specific constants (o_custkey/l_orderkey
follow their parents), so each copy is an independent, referentially
intact replica of the base schema; dims (region/nation/supplier/part)
stay fixed, so per-supplier/part fan-out grows with factor — the same
shape real TPC-H scaling has for the probe side of broadcast joins.
Because copies are value-identical up to key offsets and none of the
four queries projects a fact key, every result is exactly the base
result with additive aggregates scaled by `factor`:

    q1  sum_qty/sum_base_price/sum_disc_price/sum_charge x F (decimal-
        exact before the final double cast), avg_* unchanged,
        count_order x F exact;
    q5  revenue x F (each copy's orders join only that copy's
        customers; nationkeys are copy-invariant);
    q4  order_count x F exact (the semi join dedups within a copy and
        copies share no orderkeys);
    q13 custdist x F exact per c_count bucket (each copy replicates
        every customer's order multiset).

Both scales (1x and Fx) are materialized through the same writer so
file layout provenance is identical; timings are min-of-2 noop-writer
executions (the bench noise defense).

    python tools/scale_smoke_relational.py [factor]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataflow_example_spark.functions.cachereg import cleanup
from dataflow_example_spark.session import get_spark
from dataflow_example_spark.tables import TABLES, load

SRC = "/root/testdata/sf0.1"
QUERIES = (
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q4_late_shipment_priority",
    "q13_customer_order_distribution",
)
# key-offset strides per copy; far above any base key (sf0.1 max
# o_orderkey ~600k, c_custkey ~15k) so copies can never collide
C_OFF = 10**8
O_OFF = 10**9
# (group-key columns, exact x-F count columns, x-F value columns with
# relative tolerance — double casts of decimal-exact sums, so the
# tolerance only absorbs the final binary64 rounding)
INVARIANTS = {
    "q1_pricing_summary": (
        ["l_returnflag", "l_linestatus"],
        ["count_order"],
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"],
        ["avg_qty", "avg_price"],  # scale-free
    ),
    "q5_local_supplier_volume": (["n_name"], [], ["revenue"], []),
    "q4_late_shipment_priority": (["o_orderpriority"], ["order_count"], [], []),
    "q13_customer_order_distribution": (["c_count"], ["custdist"], [], []),
}


def amplify(spark, dest: str, factor: int, src: str = SRC) -> float:
    """Write a referentially intact ~factor-x replica of src into dest."""
    t0 = time.time()
    for name in TABLES:
        if name not in ("customer", "orders", "lineitem"):
            # fixed tables ride along unchanged so dest is a complete
            # sf_dir any registry query can run against
            src_path = Path(src) / f"{name}.parquet"
            # a table may ship as one parquet file OR a directory of part
            # files (mirror table_bytes' isdir branch — ADVICE r11:
            # shutil.copy raises IsADirectoryError on the latter)
            if src_path.is_dir():
                shutil.copytree(src_path, Path(dest) / f"{name}.parquet")
            else:
                shutil.copy(src_path, Path(dest) / f"{name}.parquet")
            continue
        base = load(spark, src, name)
        copies = []
        for i in range(factor):
            c = base
            if name == "customer":
                c = c.withColumn("c_custkey", F.col("c_custkey") + i * C_OFF)
            elif name == "orders":
                c = c.withColumn(
                    "o_orderkey", F.col("o_orderkey") + i * O_OFF
                ).withColumn("o_custkey", F.col("o_custkey") + i * C_OFF)
            else:
                c = c.withColumn("l_orderkey", F.col("l_orderkey") + i * O_OFF)
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    return round(time.time() - t0, 1)


def run_queries(spark, sf_dir: str) -> tuple[dict, dict]:
    """(wall seconds min-of-2, collected rows) per query."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    walls, results = {}, {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        walls[name] = round(best, 2)
        results[name] = {
            tuple(r[k] for k in INVARIANTS[name][0]): r.asDict()
            for r in qs[name](spark, sf_dir).collect()
        }
        cleanup()
        spark.catalog.clearCache()
    return walls, results


def check_invariants(base: dict, amp: dict, factor: int) -> None:
    for name, (keys, exact_cols, rel_cols, free_cols) in INVARIANTS.items():
        b, a = base[name], amp[name]
        assert set(b) == set(a), f"{name}: group keys diverged"
        for k, brow in b.items():
            arow = a[k]
            for col in exact_cols:
                assert arow[col] == brow[col] * factor, (
                    f"{name}[{k}].{col}: {arow[col]} != {brow[col]}x{factor}"
                )
            for col in rel_cols:
                want = brow[col] * factor
                assert abs(arow[col] - want) <= 1e-9 * abs(want), (
                    f"{name}[{k}].{col}: {arow[col]} vs {want}"
                )
            for col in free_cols:
                assert abs(arow[col] - brow[col]) <= 1e-9 * abs(brow[col]), (
                    f"{name}[{k}].{col}: {arow[col]} vs {brow[col]}"
                )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke-relational")
    spark.sparkContext.setLogLevel("ERROR")

    # bench-style warm-up: one untimed execution of each query against
    # the ORIGINAL source dir pays the session's one-time codegen/JIT
    # cost (SCALE.md "Known costs accepted": ~5-10 s on the first heavy
    # query of a session), so the 1x and Fx timed walls are comparable
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in QUERIES:
        qs[name](spark, SRC).write.format("noop").mode("overwrite").save()
    cleanup()
    spark.catalog.clearCache()

    runs = {}
    dests = []
    for f in (1, factor):
        # NOT cachereg.scratch_dir: run_queries calls cleanup() between
        # queries (releasing any persists a query registers), which
        # would delete a registered scratch dir out from under the
        # remaining queries
        dest = tempfile.mkdtemp(prefix=f"relsmoke_{f}x_")
        dests.append(dest)
        synth_s = amplify(spark, dest, f)
        walls, results = run_queries(spark, dest)
        runs[f] = (walls, results)
        print(f"factor {f}x: synth {synth_s}s, walls {walls}", flush=True)

    check_invariants(runs[1][1], runs[factor][1], factor)
    print(f"invariants exact at {factor}x for {', '.join(QUERIES)}")
    for name in QUERIES:
        r = runs[factor][0][name] / max(runs[1][0][name], 1e-9)
        print(f"  {name}: {runs[1][0][name]}s -> {runs[factor][0][name]}s "
              f"({r:.1f}x wall for {factor}x rows)")
    cleanup()
    for dest in dests:
        shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    main()
