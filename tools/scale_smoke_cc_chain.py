"""Pathological-diameter scale smoke for connected components (VERDICT
r8 item 4).

The 10x scale smoke showed <=2x wall for cc_star, but CC is the one
algorithm whose ROUND COUNT depends on graph diameter, not size — and a
near-dup corpus poisoned by chained templates (doc i ~ doc i+1 without
i ~ i+2) is exactly the worst case: one path-graph component whose
diameter equals its edge count. This tool synthesizes single-chain
components at 10k / 100k / 1M edges (1x / 10x / 100x) plus a mixed
workload (the chain embedded in 100k small clusters), runs the
production ``connected_components`` (min-label + pointer jumping), and
records rounds-to-convergence, wall time, and correctness (every node
must label to the chain's minimum id).

Expected rounds ~ log2(diameter) + 1 — the measurement that justified
raising the default ``max_iters`` 20 -> 64: a 1M-edge chain needs 20
rounds + the convergence-confirm round, which the old default could not
accommodate (the +1 confirm pushes it to 21).

Usage: python tools/scale_smoke_cc_chain.py  -> markdown table + JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataflow_example_spark.functions.dedup import (  # noqa: E402
    connected_components,
)
from dataflow_example_spark.session import get_spark  # noqa: E402


def chain_edges(spark, n_edges: int, offset: int = 0):
    """Path graph: (offset+i) -- (offset+i+1) for i in [0, n_edges)."""
    return spark.range(n_edges).select(
        (F.col("id") + offset).alias("doc_a"),
        (F.col("id") + offset + 1).alias("doc_b"),
    )


def main() -> int:
    spark = get_spark(app_name="cc-chain-smoke")
    results = []

    cases = [
        ("chain_10k", lambda: chain_edges(spark, 10_000)),
        ("chain_100k", lambda: chain_edges(spark, 100_000)),
        ("chain_1m", lambda: chain_edges(spark, 1_000_000)),
        # the realistic poisoned corpus: one long chain hiding among
        # many small near-dup clusters (100k pair-clusters)
        (
            "mixed_100k_clusters_plus_10k_chain",
            lambda: chain_edges(spark, 10_000, offset=10_000_000).unionAll(
                spark.range(100_000).select(
                    (F.col("id") * 2).alias("doc_a"),
                    (F.col("id") * 2 + 1).alias("doc_b"),
                )
            ),
        ),
    ]
    print("| case | edges | rounds | converged | wall (s) | labels ok |")
    print("|---|---|---|---|---|---|")
    for name, mk in cases:
        edges = mk()
        n_edges = edges.count()
        stats: dict = {}
        t0 = time.time()
        labels = connected_components(edges, stats=stats)
        # correctness: every chain node must carry the chain's min id
        if name.startswith("chain"):
            bad = labels.filter(F.col("cluster_id") != 0).limit(1).count()
        else:
            chain_bad = labels.filter(
                (F.col("doc_id") >= 10_000_000)
                & (F.col("cluster_id") != 10_000_000)
            ).limit(1).count()
            pair_bad = labels.filter(
                (F.col("doc_id") < 10_000_000)
                & (F.col("cluster_id") != (F.col("doc_id") - F.col("doc_id") % 2))
            ).limit(1).count()
            bad = chain_bad + pair_bad
        wall = time.time() - t0
        ok = "yes" if bad == 0 else "NO"
        print(
            f"| {name} | {n_edges:,} | {stats['rounds']} | "
            f"{stats['converged']} | {wall:.1f} | {ok} |"
        )
        results.append(
            {
                "case": name,
                "edges": n_edges,
                "rounds": stats["rounds"],
                "converged": stats["converged"],
                "wall_sec": round(wall, 1),
                "labels_ok": bad == 0,
            }
        )
    print(json.dumps({"cc_chain_smoke": results}))
    return 0 if all(r["labels_ok"] and r["converged"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
