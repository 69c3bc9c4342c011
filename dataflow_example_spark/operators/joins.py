"""Temporal join operators Spark lacks as primitives: as-of join and
range (interval-containment) join, composed from shuffle-friendly
DataFrame ops (SURVEY.md §2.1 — beyond-reference; the reference has no
joins at all).

Both are written for the 100 TB case:

- ``asof_join`` is the union-then-window formulation: ONE hash exchange on
  the key plus a per-partition sort, instead of the O(|L|·|R|) broadcast
  nested loop Spark would plan for the naive ``l.ts >= r.ts`` inequality
  join. State per key is a single running "last right row" — the same
  trick Flink's event-time temporal join uses.
- ``range_join`` buckets time: intervals are exploded to the fixed-grain
  buckets they cover and the probe side equi-joins on its single bucket,
  turning an inequality join into a hash join + residual filter. Each
  (row, interval) match meets in exactly one bucket (the row's), so no
  dedup is needed. Grain trades explode fan-out against bucket
  selectivity; choose grain ≈ median interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    tiebreak_col: str,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts_col`` <= the left row's ``ts_col`` (at-or-before, per key);
    null-extended when no prior right row exists.

    Deterministic: right rows sharing (keys, ts) are first reduced to the
    one with the greatest ``tiebreak_col``.

    Returns all left columns plus ``{c}{suffix}`` for c in
    ``[ts_col, *right_cols]``.
    """
    keys = list(keys)
    right_cols = list(right_cols)

    # Dedup right to one row per (keys, ts): greatest tiebreak wins.
    # Struct fields are aliased positionally — tiebreak_col may also be a
    # carried column, and duplicate struct field names are ambiguous.
    ordered = F.struct(
        F.col(tiebreak_col).alias("_tb"),
        *[F.col(c).alias(f"_c{i}") for i, c in enumerate(right_cols)],
    )
    r = (
        right.groupBy(*keys, ts_col)
        .agg(F.max(ordered).alias("_m"))
        .select(
            *keys,
            ts_col,
            *[F.col(f"_m._c{i}").alias(c) for i, c in enumerate(right_cols)],
        )
    )

    carried = [ts_col, *right_cols]
    l_tagged = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.lit(None).cast(left.schema[ts_col].dataType).alias(f"_r_{ts_col}"),
    )
    r_tagged = r.select(
        *keys,
        ts_col,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts_col).alias(f"_r_{ts_col}"),
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged)

    # At equal ts the right row sorts first (_side 0 < 1) => inclusive
    # at-or-before. rowsBetween keeps the running last right row only.
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carried
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *left.columns, *[f"{c}{suffix}" for c in carried]
    )


def range_join(
    probe: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    grain_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Pairs (probe row, interval) with ``start <= ts < end`` (and equal
    ``keys``, if given), as a bucketed hash join.

    Intervals explode to ``(end-start)/grain + 1`` bucket rows; the probe
    side maps to its single bucket — the join is an equi-join on
    (bucket, *keys) with the range predicate as a residual filter.
    """
    keys = list(keys)
    # floor division (not double-division + truncation): cast('long') on a
    # double truncates toward zero, which mis-buckets negative epochs
    # (pre-1970 timestamps) and silently drops their matches.
    g = F.lit(grain_seconds).cast("long")
    b_probe = F.floor(F.unix_timestamp(F.col(ts_col)) / g).cast("long")
    b_start = F.floor(F.unix_timestamp(F.col(start_col)) / g).cast("long")
    b_end = F.floor(F.unix_timestamp(F.col(end_col)) / g).cast("long")

    iv = intervals.select(
        "*", F.explode(F.sequence(b_start, b_end)).alias("_bucket")
    )
    pr = probe.select("*", b_probe.alias("_bucket"))
    cond = [pr["_bucket"] == iv["_bucket"]] + [
        pr[k] == iv[k] for k in keys
    ]
    joined = pr.join(iv, cond).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.select(
        *[pr[c] for c in probe.columns],
        *[iv[c] for c in intervals.columns if c not in keys],
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    tolerance_us: int,
    tiebreak_col: str,
    suffix: str = "_near",
) -> DataFrame:
    """For every left row, attach the right row with the smallest
    ``|right.ts - left.ts|`` within ``tolerance_us`` microseconds (per
    key); rows with no right row in range are dropped (inner semantics).

    The bidirectional complement of ``asof_join`` (which only looks
    backward): pandas ``merge_asof(direction='nearest')``. Same bucketed
    formulation as ``range_join`` — the right side explodes to its
    bucket and both neighbors at grain = tolerance, the left side
    equi-joins on its single bucket, so every candidate pair (which must
    lie within one tolerance, hence one bucket of each other) meets
    exactly once and the inequality never reaches the join condition.
    Per-left argmin is a struct-min aggregate (map-side combinable), not
    a window sort.

    Ties (two right rows equidistant) break toward the earlier right
    timestamp, then the smaller ``tiebreak_col``.
    """
    keys = list(keys)
    right_cols = list(right_cols)
    g = F.lit(tolerance_us).cast("long")

    lb = F.floor(F.unix_micros(F.col(ts_col)) / g).cast("long")
    l_tag = left.select("*", lb.alias("_bucket"))
    r_tag = right.select(
        *keys,
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(ts_col)) / g).cast("long") - 1,
                F.floor(F.unix_micros(F.col(ts_col)) / g).cast("long") + 1,
            )
        ).alias("_bucket"),
    )
    dt = F.unix_micros(F.col("_r_ts")) - F.unix_micros(F.col(ts_col))
    cand = l_tag.join(r_tag, ["_bucket", *keys]).filter(
        F.abs(dt) <= tolerance_us
    )
    pick = F.min(
        F.struct(
            F.abs(dt).alias("_adt"),
            F.col("_r_ts").alias("_ts"),
            F.col(f"_r_{tiebreak_col}").alias("_tb"),
            dt.alias("_dt"),
            *[F.col(f"_r_{c}").alias(f"_c{i}")
              for i, c in enumerate(right_cols)],
        )
    ).alias("_m")
    grouped = cand.groupBy(*[F.col(c) for c in left.columns]).agg(pick)
    return grouped.select(
        *left.columns,
        F.col("_m._ts").alias(f"{ts_col}{suffix}"),
        F.col("_m._dt").alias(f"dt_us{suffix}"),
        *[F.col(f"_m._c{i}").alias(f"{c}{suffix}")
          for i, c in enumerate(right_cols)],
    )
