"""foreachBatch sink: idempotent micro-batch writes to destinations the
built-in streaming sinks can't target (multi-table fan-out, JDBC
warehouses, dedup-on-write).

Exactly-once contract: Structured Streaming may RE-RUN a micro-batch
after a failure (same ``batch_id``, same data). The writer here is
idempotent by construction — each batch lands in a ``batch_id``-keyed
subdirectory with ``overwrite`` mode, so a replayed batch replaces its
own previous (possibly partial) output instead of appending duplicates.
Readers see the union of batch directories (one ``spark.read.parquet``
over the root). This is the standard foreachBatch idempotency recipe;
a warehouse MERGE keyed on (batch_id, row key) is the JDBC analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_batches(
    stream_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a foreachBatch query writing each micro-batch idempotently
    to ``output_dir/batch_id=N/``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
