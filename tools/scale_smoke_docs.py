"""Scale smoke for the document/dedup/similarity operator families: run
the bucketed near-dup paths and the text-pipeline operators on an
amplified corpus (~factor x sf0.1 documents) and check wall time grows
roughly linearly — the plans under test are exactly the ones graded
`weak` when quadratic (banded SimHash, candidate-scoped Jaccard,
multi-table LSH).

Amplification perturbs each copy's text with a copy-specific consonant
rotation (translate), so copies are NOT near-duplicates of each other and
the pair-output size stays data-realistic instead of exploding
quadratically by construction.

    python tools/scale_smoke_docs.py [amplification]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataflow_example_spark.functions import dedup as D
from dataflow_example_spark.functions import similarity as S
from dataflow_example_spark.functions import text as T
from dataflow_example_spark.session import get_spark
from dataflow_example_spark.tables import load

CONS = "bcdfghjklm"


def amplified_docs(spark, sf_dir: str, factor: int):
    docs = load(spark, sf_dir, "documents")
    copies = []
    for i in range(factor):
        rot = CONS[i % len(CONS) :] + CONS[: i % len(CONS)]
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), CONS, rot).alias("text"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    return big.repartition(spark.sparkContext.defaultParallelism).persist()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke-docs")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"

    docs = amplified_docs(spark, sf_dir, factor)
    n = docs.count()
    print(f"amplification={factor}x docs={n}")

    ops = {
        "simhash_banded": lambda: D.simhash_pairs(docs, max_hamming=3),
        "minhash_lsh": lambda: D.minhash_lsh_pairs(docs),
        "minhash_lsh_capped": lambda: D.minhash_lsh_pairs(
            docs, bucket_cap=16
        ),
        "jaccard_on_cand": lambda: D.jaccard_on_candidates(
            docs, D.minhash_lsh_pairs(docs)
        ),
        "cc_star": lambda: D.connected_components_star(
            D.minhash_lsh_pairs(docs)
        ),
        "chunking": lambda: T.chunk_documents(docs),
        "vocab_top": lambda: T.vocab_top_terms(docs),
        "salient_terms": lambda: T.salient_terms(docs),
        "bigram_surprisal": lambda: T.bigram_surprisal(docs),
    }
    for name, build in ops.items():
        t0 = time.time()
        out = build()
        out.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.time() - t0:.1f}s")

    emb = load(spark, sf_dir, "embeddings")
    t0 = time.time()
    S.multi_lsh_near_dup_pairs(emb, threshold=0.4).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"multi_lsh_near_dup(sf0.1): {time.time() - t0:.1f}s")

    # scale-technique ops (round-5 batch): bloom prune over the amplified
    # corpus, and the prefix-scan / salted / argmax shapes over amplified
    # events — all must stay ~linear in the amplification factor
    from dataflow_example_spark.functions.bloom import bloom_semi_join
    from dataflow_example_spark.functions.diagnostics import (
        running_prefix_max,
        salted_distinct_count,
    )

    fp = T.fingerprint(docs, prefix_tokens=12).select(
        "doc_id", "fingerprint_md5"
    )
    small = fp.filter(F.col("doc_id") % 1000 == 0).select(
        F.col("fingerprint_md5").alias("k")
    )
    t0 = time.time()
    bloom_semi_join(
        fp.select(F.col("fingerprint_md5").alias("k"), "doc_id"), small, "k"
    ).write.format("noop").mode("overwrite").save()
    print(f"bloom_semi_join: {time.time() - t0:.1f}s")

    ev = load(spark, sf_dir, "events")
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(i * 1000)).alias("user_id"),
            "ts",
            "event_type",
            "value",
        )
        for i in range(factor)
    ]
    big_ev = copies[0]
    for c in copies[1:]:
        big_ev = big_ev.unionByName(c)
    big_ev = big_ev.repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    print(f"amplified events={big_ev.count()}")

    t0 = time.time()
    running_prefix_max(big_ev, "event_id", "value").write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"running_prefix_max: {time.time() - t0:.1f}s")

    t0 = time.time()
    salted_distinct_count(big_ev, "event_type", "user_id").write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"salted_distinct: {time.time() - t0:.1f}s")

    t0 = time.time()
    big_ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("_m")
    ).write.format("noop").mode("overwrite").save()
    print(f"latest_compaction: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
