"""Scale-safe global ordering primitives (beyond-reference).

A handful of analytics shapes need a TOTAL order over an entity-level
aggregate: ntile quartiles (RFM, equi-depth histograms), global rank
(Gini), cumulative shares (Pareto/Lorenz). The naive plan —
``Window.orderBy(...)`` with no ``partitionBy`` — is correct but plans
an ``Exchange SinglePartition`` + one sort TASK over the whole relation:
fine on 150k customers, fatal on the billions of entities a 100 TB
deployment carries.

Exactly like ``packing.pack_documents``'s prefix sum, every one of these
shapes decomposes into the two-pass range-partitioned recipe:

1. ``repartitionByRange`` on the sort key — partition-id order equals
   global sort order, each task sorts only its own range partition;
2. a partition-local window (``partitionBy(_pid)``) computes local
   rank / running sum in parallel;
3. per-partition totals (one row per range partition — tiny) get a
   prefix pass and broadcast back; global value = slice offset + local.

The only single-partition exchange left in the plan carries the per-
``_pid`` totals relation, whose row count equals the shuffle-partition
count — bounded by cluster configuration, never by data volume. The
plan-audit rule ``bounded_single_partition`` pins exactly this: any
``Exchange SinglePartition`` must sit directly on a per-``_pid``
aggregate.

The pinned-partition-id subtlety is inherited from packing.py:61-80:
``spark_partition_id`` is non-deterministic, and both downstream
branches (locals, offsets) must observe the SAME range boundaries, so
the ranged frame is persisted before branching. The cached projection is
a few columns per entity — cheap at any scale. ``cleanup()`` unpersists
everything a session accumulated (bench/gate harnesses call it between
query groups).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cachereg import cleanup, register_persisted  # noqa: F401 (cleanup re-exported)


def _ranged(df: DataFrame, order_exprs: list[Column | str]) -> DataFrame:
    """Range-partition by the total-order key and pin the partition id."""
    ranged = df.repartitionByRange(*order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    return register_persisted(ranged.persist(StorageLevel.MEMORY_AND_DISK))


def global_row_number(
    df: DataFrame,
    order_exprs: list[Column | str],
    out_col: str = "rn",
) -> DataFrame:
    """row_number() over a global order, without a global sort task.

    ``order_exprs`` must define a TOTAL order (break ties with a unique
    key) — with ties the assignment would depend on partitioning.
    """
    ranged = _ranged(df, order_exprs)
    local_w = Window.partitionBy("_pid").orderBy(*order_exprs)
    local = ranged.withColumn("_lrn", F.row_number().over(local_w))
    # per-partition row counts: one row per range partition
    slice_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_lrn").alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(slice_w), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def global_running_sum(
    df: DataFrame,
    order_exprs: list[Column | str],
    value_cols: str | list[str],
    out_cols: str | list[str] = "running_sum",
) -> DataFrame:
    """Inclusive prefix sum(s) over a global total order. Multiple value
    columns share ONE range exchange and one offsets broadcast (Lorenz
    needs both the running count and the running value sum)."""
    values = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    outs = [out_cols] if isinstance(out_cols, str) else list(out_cols)
    assert len(values) == len(outs)
    ranged = _ranged(df, order_exprs)
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for i, v in enumerate(values):
        local = local.withColumn(f"_lsum{i}", F.sum(v).over(local_w))
    slice_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per-partition totals via SUM of the raw values — NOT max of the
    # running sum, which is only the slice total when values are all
    # non-negative (prefix sums aren't monotone with negatives)
    offsets = (
        local.groupBy("_pid")
        .agg(*[F.sum(v).alias(f"_tot{i}") for i, v in enumerate(values)])
        .select(
            "_pid",
            *[
                F.sum(f"_tot{i}").over(slice_w).alias(f"_off{i}")
                for i in range(len(values))
            ],
        )
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for i, (v, o) in enumerate(zip(values, outs)):
        zero = F.lit(0).cast(df.schema[v].dataType)
        out = out.withColumn(
            o, F.coalesce(F.col(f"_off{i}"), zero) + F.col(f"_lsum{i}")
        )
    drop = ["_pid"] + [f"_lsum{i}" for i in range(len(values))] + [
        f"_off{i}" for i in range(len(values))
    ]
    return out.drop(*drop)


def ntile_from_rank(rank: Column, n_rows: Column, n_tiles: int) -> Column:
    """SQL ntile(k) bucket for a 1-based global ``rank`` out of
    ``n_rows`` total: the first ``n_rows % k`` buckets hold
    ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — exactly the standard
    ntile split, reproduced arithmetically so no sort is needed once the
    rank is known."""
    q = F.floor(n_rows / n_tiles)  # small-bucket size
    r = n_rows % n_tiles  # number of big buckets
    big = q + 1
    cutover = r * big  # rows covered by big buckets
    return (
        F.when(rank <= cutover, F.ceil(rank / big))
        .otherwise(r + F.ceil((rank - cutover) / F.greatest(q, F.lit(1))))
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_exprs: list[Column | str],
    n_tiles: int,
    out_col: str = "tile",
    rank_col: str | None = None,
) -> DataFrame:
    """ntile(n) over a global total order — bit-identical to
    ``F.ntile(n).over(Window.orderBy(...))`` (both implement the
    standard SQL split) but with no single-partition sort of the data.

    The grand total the tile formula needs is the sum of the per-
    partition counts the offsets relation already carries, so the tiny
    broadcast delivers rank offset AND total in one hash join — no
    1-row crossJoin (no BroadcastNestedLoopJoin in the plan)."""
    ranged = _ranged(df, order_exprs)
    local_w = Window.partitionBy("_pid").orderBy(*order_exprs)
    local = ranged.withColumn("_lrn", F.row_number().over(local_w))
    prefix_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    all_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_lrn").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(prefix_w), F.lit(0)).alias("_off"),
            F.sum("_cnt").over(all_w).alias("_n"),
        )
    )
    rank = F.col("_off") + F.col("_lrn")
    out = local.join(F.broadcast(offsets), "_pid").withColumn(
        out_col, ntile_from_rank(rank, F.col("_n"), n_tiles)
    )
    if rank_col is not None:
        out = out.withColumn(rank_col, rank.cast("bigint"))
    return out.drop("_pid", "_lrn", "_off", "_n")


def grouped_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[Column | str],
    k: int,
    salt_expr: Column,
    rank_col: str = "rank",
    n_salts: int = 64,
) -> DataFrame:
    """Exact top-k per group when groups are HOT (few groups, each a
    large fraction of the data — nations, event types, clusters).

    ``Window.partitionBy(hot_key)`` plans one sort task per group over
    that group's entire data — a 1/|groups| scale-killer. Two-level
    instead: (1) rank within (group, salt) — ~|group|/n_salts rows per
    sort task — and keep local rank <= k (any row in the group's true
    top-k has local rank <= its global rank <= k, because the local
    order is a suborder of the same total order); (2) exact rank over
    the <= n_salts*k survivors per group, a constant-bounded sort.

    ``order_exprs`` must be a TOTAL order (unique tie-break) so that
    row_number is deterministic. ``salt_expr`` must be a deterministic
    expression over the row's UNIQUE key (e.g. ``F.xxhash64("custkey")``)
    — it only spreads rows across sort tasks, so it cannot change the
    result, but a low-cardinality salt would defeat the splitting.
    """
    salted = df.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_exprs)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[Column | str],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Inclusive per-group prefix sum where groups may be HOT (the
    packing.pack_documents recipe, generalized): range-partition on
    (group, order) so each task holds a contiguous slice of some
    group's stream, local running sum per (partition, group) slice,
    then per-slice totals (n_partitions x n_groups rows) prefix-scanned
    and broadcast back. No task ever sorts more than one range
    partition, regardless of group skew."""
    ranged = _ranged(df, [*[F.col(g) for g in group_cols], *order_exprs])
    local_w = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lsum", F.sum(value_col).over(local_w))
    slice_w = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_pid", *group_cols)
        .agg(F.sum(value_col).alias("_tot"))
        .select(
            "_pid",
            *group_cols,
            F.sum("_tot").over(slice_w).alias("_off"),
        )
    )
    zero = F.lit(0).cast(df.schema[value_col].dataType)
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(
            out_col, F.coalesce(F.col("_off"), zero) + F.col("_lsum")
        )
        .drop("_pid", "_lsum", "_off")
    )
