"""Token-budget packing for pretraining pipelines (beyond-reference;
BASELINE.json north star).

Pretraining data loaders concatenate the token stream of a corpus and
slice it into fixed-size context windows ("packing"): document boundaries
do not align with window boundaries, so a document may straddle windows.
``pack_documents`` computes that assignment declaratively: a prefix sum
of token counts gives each document its global token offset; integer
division by the budget gives the first/last context window it lands in.

Scale notes (100 TB): a single global prefix sum is a one-partition
window sort — never viable. But even a per-group window is one sort TASK
per group, and real corpora are dominated by a handful of languages (a
30 TB English shard would be a single task). ``pack_documents`` therefore
computes the prefix sum in two passes over range partitions:

1. range-partition by (group, order) — every partition holds a
   contiguous slice of some group's stream, partition id order = stream
   order;
2. local running sum within each (partition, group) slice, in parallel;
3. per-(partition, group) totals (tiny: n_partitions x n_groups rows)
   -> cumulative offset of each slice within its group -> broadcast;
4. start_offset = slice offset + local running sum - own count.

No task ever sorts more than one range partition (~maxPartitionBytes),
regardless of group skew. Groups are independent context-window streams,
which is also how production loaders shard (per-language/per-source
mixing happens at batch assembly, not in the token stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    group_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its token-offset span in the per-group
    concatenated stream and the context windows it covers.

    Returns (group, doc, n_tokens, start_offset, first_bin, last_bin,
    n_bins): ``start_offset`` is the prefix sum of earlier documents'
    token counts (group order by ``order_col``); window ``b`` holds
    tokens [b * budget, (b+1) * budget).
    """
    base = docs.select(
        F.col(group_col).alias("group"),
        F.col(order_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    # Pass 1: range-partition so partition-id order equals (group, doc_id)
    # stream order; pin the id before any further exchange
    # (spark_partition_id is non-deterministic, so Catalyst cannot move it
    # across the range exchange).
    ranged = base.repartitionByRange("group", "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    # Pin the id once: both downstream branches (offsets, join) must
    # observe the SAME partition ids, and exchange reuse is an optimizer
    # behavior, not a guarantee — RangePartitioner's sample seed depends
    # on RDD id, so an un-reused second exchange could pick different
    # boundaries and silently corrupt start_offset. persist() makes the
    # sharing structural instead of optional: CacheManager rewrites BOTH
    # branch references to the one InMemoryRelation, whose range exchange
    # is evaluated exactly once (and re-reads the same shuffle output on
    # block eviction, so recomputed partitions keep their ids). Cheap at
    # any scale: one 3-column row per document, not the corpus text.
    from pyspark import StorageLevel

    from .cachereg import register_persisted

    ranged = register_persisted(ranged.persist(StorageLevel.MEMORY_AND_DISK))
    # Local running sums: one window task per (range partition, group)
    # slice — bounded by the range partition size, never by group size.
    local_w = (
        Window.partitionBy("_pid", "group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum("n_tokens").over(local_w))
    # Pass 2: per-slice totals (n_partitions x n_groups rows — tiny),
    # cumulative offset of each slice within its group, broadcast back.
    # Totals come from `local` (max of the running sum = slice total), not
    # from `ranged`: both consumers then depend on the same materialized
    # (_pid, group) exchange, so the non-deterministic spark_partition_id
    # is evaluated exactly once — a second branch off the range exchange
    # could in principle re-plan it with different partition ids.
    slice_w = (
        Window.partitionBy("group")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_pid", "group")
        .agg(F.max("_local").alias("_tot"))
        .withColumn(
            "_off", F.coalesce(F.sum("_tot").over(slice_w), F.lit(0))
        )
        .select("_pid", "group", "_off")
    )
    out = local.join(F.broadcast(offsets), ["_pid", "group"]).select(
        "group",
        "doc_id",
        "n_tokens",
        (F.col("_off") + F.col("_local") - F.col("n_tokens")).alias(
            "start_offset"
        ),
    )
    first_bin = F.floor(F.col("start_offset") / budget).cast("bigint")
    last_bin = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / budget
    ).cast("bigint")
    return out.select(
        "group",
        "doc_id",
        "n_tokens",
        "start_offset",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + 1).alias("n_bins"),
    )
