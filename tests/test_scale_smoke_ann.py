"""Pin the ANN scale smoke's amplification contract (r11).

`tools/scale_smoke_ann.py` is judged evidence for the 100 TB ANN story,
so its corpus builder must not bit-rot: amplification must produce
exactly factor x N rows with globally distinct vec_ids, keep copy 0
byte-identical to the source table (the seed-selection init and the
query set both assume the original ids/vectors survive), and perturb
every other copy within the documented +-0.05 bound so copies are
near-but-not-equal.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_amplified_emb_invariants(spark):
    from scale_smoke_ann import amplified_emb

    from dataflow_example_spark.tables import load

    # r12: amplified_emb also carries label (the 1-NN consistency case)
    base = load(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n = base.count()
    big = amplified_emb(spark, SF_DIR, 3)
    try:
        assert big.count() == 3 * n
        assert big.select("vec_id").distinct().count() == 3 * n

        # copy 0 survives byte-identical (seed ids < k come from it)
        orig = big.filter(F.col("vec_id") < 10_000_000)
        assert orig.exceptAll(base).count() == 0
        assert base.exceptAll(orig).count() == 0

        # non-zero copies: same dim, every component within 0.05+ulp of
        # its source component, and not all equal to it
        c1 = big.filter(
            (F.col("vec_id") >= 10_000_000) & (F.col("vec_id") < 20_000_000)
        ).select(
            (F.col("vec_id") - 10_000_000).alias("vec_id"),
            F.col("embedding").alias("pert"),
        )
        joined = base.join(c1, "vec_id").select(
            F.size("embedding").alias("d0"),
            F.size("pert").alias("d1"),
            F.aggregate(
                F.zip_with(
                    "embedding", "pert", lambda a, b: F.abs(a - b)
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x.cast("double")),
            ).alias("max_delta"),
        )
        row = joined.agg(
            F.max(F.col("d0") != F.col("d1")).alias("dim_mismatch"),
            F.max("max_delta").alias("worst"),
            F.min("max_delta").alias("best"),
        ).collect()[0]
        assert not row["dim_mismatch"]
        assert row["worst"] <= 0.0501
        assert row["best"] > 0.0  # actually perturbed
    finally:
        big.unpersist()
