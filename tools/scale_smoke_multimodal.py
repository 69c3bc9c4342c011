"""Scale smoke for the multimodal family (functions/multimodal.py): run
the Arrow-batched mapInPandas/mapInArrow pipelines over an amplified
binary-payload corpus and check wall time grows ~linearly with payload
volume — the property the module's 100 TB claim rests on (payloads
never leave the executor; per-batch vectorized work amortizes
interpreter cost; no shuffle anywhere in the map-only graphs).

Amplification: copy i re-keys doc_id and prefixes the text with a
copy tag before as_media_table synthesizes the opaque payload, so
payload bytes are copy-distinct and their md5s can't collapse.
Per-scale invariants, asserted every run:

  - media_metadata (mapInPandas) and media_metadata_arrow (mapInArrow)
    agree row-for-row (the two batching backends can never drift);
  - metadata rows == media rows; n_bytes sums to the exact payload
    volume;
  - decode_media(allow_fake=True) emits one row per media row inside
    the fake decoder's digest-derived bounds (1..64 w/h, channels
    1..4);
  - sample_frames emits exactly sum(n_bytes % modulo + 1) rows — the
    deterministic per-payload frame count.

    python tools/scale_smoke_multimodal.py [factor]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataflow_example_spark.functions import multimodal as M
from dataflow_example_spark.session import get_spark
from dataflow_example_spark.tables import load

SRC = "/root/testdata/sf0.1"


def amplified_media(spark, sf_dir: str, factor: int):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = [
        docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.lit(f"copy{i} "), F.col("text")).alias("text"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return M.as_media_table(out)


def timed(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    print(f"{label}: {w:.1f}s", flush=True)
    return w


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-smoke-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    media = amplified_media(spark, SRC, factor).persist()
    n = media.count()
    total_bytes = media.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"]
    print(f"amplification={factor}x media_rows={n} payload_bytes={total_bytes}")

    timed("media_metadata(mapInPandas)", M.media_metadata(media))
    timed("media_metadata_arrow(mapInArrow)", M.media_metadata_arrow(media))
    timed("decode_media(fake)", M.decode_media(media, allow_fake=True))
    timed("sample_frames", M.sample_frames(media))
    timed("extract_features", M.extract_features(media))

    # invariants (cheap aggregates; run after timing so walls are pure)
    pd_rows = M.media_metadata(media)
    ar_rows = M.media_metadata_arrow(media)
    assert pd_rows.count() == n
    diff = pd_rows.exceptAll(ar_rows).count() + ar_rows.exceptAll(pd_rows).count()
    assert diff == 0, f"pandas/arrow metadata backends diverged: {diff} rows"
    meta_bytes = pd_rows.agg(F.sum("n_bytes").alias("b")).collect()[0]["b"]
    assert meta_bytes == total_bytes, (meta_bytes, total_bytes)

    dec = M.decode_media(media, allow_fake=True)
    assert dec.count() == n
    bad = dec.filter(
        ~F.col("width").between(1, 64)
        | ~F.col("height").between(1, 64)
        | ~F.col("channels").between(1, 4)
    ).count()
    assert bad == 0, f"{bad} rows outside fake-decoder bounds"

    want_frames = media.agg(
        F.sum(F.octet_length("payload") % 5 + 1).alias("f")
    ).collect()[0]["f"]
    got_frames = M.sample_frames(media).count()
    assert got_frames == want_frames, (got_frames, want_frames)

    print(f"invariants exact at {factor}x ({n} rows, {total_bytes} payload bytes)")
    media.unpersist()


if __name__ == "__main__":
    main()
