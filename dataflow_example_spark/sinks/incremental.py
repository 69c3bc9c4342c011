"""Incremental streaming materialized view: maintain a keyed aggregate
table across micro-batches (the foreachBatch merge pattern) — the
streaming answer to "keep a running totals table fresh" without
reprocessing history.

Each micro-batch is itself pre-aggregated (tiny: one row per key), then
merged into the stored table: new totals = stored + batch partials for
decomposable aggregates (count/sum). The store is a parquet directory
swapped atomically via a temp-write-then-replace; a real warehouse uses
MERGE INTO keyed on the group key — identical logic, different writer.

Exactly-once: the merge is NOT idempotent per batch by itself (replaying
a batch would double-count), so the checkpointed batch_id is persisted
with the table and replays of an already-merged batch are skipped — the
standard transactional-sink recipe.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def running_totals_view(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    value_col: str = "value",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain (key, n_events, sum_value) in ``store_dir`` across
    micro-batches."""
    spark = stream_df.sparkSession
    meta_path = f"{store_dir}/_last_batch.json"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                if json.load(fh)["batch_id"] >= batch_id:
                    return  # replay of an already-merged batch: skip
        partial = batch_df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"),
        )
        data_dir = f"{store_dir}/data"
        if os.path.exists(data_dir):
            stored = spark.read.parquet(data_dir)
            merged = (
                stored.unionByName(
                    partial.select(
                        key_col,
                        "n_events",
                        F.col("_s").cast("double").alias("sum_value"),
                    )
                )
                .groupBy(key_col)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum(F.col("sum_value").cast("decimal(18,6)"))
                    .cast("double")
                    .alias("sum_value"),
                )
            )
        else:
            merged = partial.select(
                key_col,
                "n_events",
                F.col("_s").cast("double").alias("sum_value"),
            )
        tmp = f"{store_dir}/_staging"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)
        os.rename(tmp, data_dir)
        os.makedirs(store_dir, exist_ok=True)
        with open(meta_path, "w") as fh:
            json.dump({"batch_id": batch_id}, fh)

    writer = stream_df.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
