"""Pipeline-operations diagnostics (beyond-reference).

Running a streaming or batch pipeline at scale needs observability
operators, not just transforms: how disordered is the input stream
(drives the watermark delay choice), how skewed is a join key (drives
salting). Both are implemented as ordinary declarative plans so they run
on the same engine as the pipeline they diagnose.

``running_prefix_max`` is the scalable building block for the lateness
audit: a running maximum in arrival order is inherently sequential, but
— exactly like ``packing.pack_documents``'s prefix sum — it decomposes
into (1) a range partition by the order column, (2) a per-partition
local running max in parallel, (3) a tiny per-partition-total prefix
broadcast back. No task ever sorts more than one range partition, so the
global order costs one range exchange regardless of data volume.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_prefix_max(
    df: DataFrame,
    order_cols: str | list[str],
    value_col: str,
    out_col: str = "prev_max",
) -> DataFrame:
    """Add ``out_col`` = max of ``value_col`` over all STRICTLY-earlier
    rows in ``order_cols`` order (null for the global first row).

    Range-partitioned two-pass max (see module docstring); the pinned
    partition id is persisted before branching so both consumers observe
    the same range boundaries (same rationale as packing.py:61-80).
    """
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    ranged = df.repartitionByRange(*order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # registered so harnesses can release it between queries (the
    # round-5 ADVICE cache-accumulation leak); see cachereg.cleanup
    from .cachereg import register_persisted

    ranged = register_persisted(ranged.persist(StorageLevel.MEMORY_AND_DISK))
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_local_prev", F.max(value_col).over(local_w))
    slice_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # per-slice totals: one row per range partition — the only
    # single-task window runs over this tiny relation
    offsets = (
        local.groupBy("_pid")
        .agg(F.max(value_col).alias("_tot"))
        .withColumn("_prefix", F.max("_tot").over(slice_w))
        .select("_pid", "_prefix")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.greatest("_local_prev", "_prefix"))
        .drop("_pid", "_local_prev", "_prefix")
    )


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT) with salted two-phase aggregation.

    A plain count_distinct shuffles every row of a hot group to one
    reducer that must hold the group's whole distinct set. Salting on a
    hash of the DISTINCT column splits that state n_salts ways while
    staying exact: each distinct value lands in exactly one salt bucket,
    so phase 1's per-(group, salt) distinct counts are disjoint and
    phase 2 just sums them. This is the manual form of what
    spark.sql.optimizer.distinctBeforeIntersect / AQE cannot do for you
    when one group dominates the table.
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    phase1 = (
        df.select(F.col(group_col), F.col(distinct_col), salt.alias("_salt"))
        .groupBy(group_col, "_salt")
        .agg(F.count_distinct(distinct_col).alias("_partial"))
    )
    return phase1.groupBy(group_col).agg(
        F.sum("_partial").alias(out_col)
    )
