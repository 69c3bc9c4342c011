"""Space-filling-curve file layout (beyond-reference; scale technique).

At 100 TB the dominant cost of most queries is the scan, and the scan
cost is governed by file-level zone maps (parquet min/max): a file whose
key range is tight gets skipped by predicate pushdown, one whose range
spans the domain is always read. Sorting by a single column gives
perfect pruning on that column and none on any other; interleaving the
bits of two columns (Morton / Z-order, the technique behind Delta Lake's
OPTIMIZE ZORDER) gives useful pruning on BOTH dimensions at once.

``zorder_value`` is pure bit arithmetic — shiftright / AND / shiftleft /
OR over integer columns, whole-stage-codegen end to end, and expressible
identically in any engine (the DuckDB oracle runs the same formula).
Writing the layout is then ``df.repartitionByRange(n_files, zcol)
.sortWithinPartitions(zcol).write...`` — the query here reports the
per-file zone maps instead of writing, so the clustering quality is
directly assertable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(d1: Column, d2: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns.

    Result has 2*bits significant bits: d1's bit b lands at position
    2b+1, d2's at 2b (d1 is the "major" dimension). Callers clamp/bucket
    the dimensions into [0, 2^bits) first — out-of-range high bits are
    simply ignored, matching the usual zone-map coarsening.
    """
    parts = []
    for b in range(bits):
        parts.append(
            F.shiftleft(
                F.shiftright(d1.cast("bigint"), b).bitwiseAND(F.lit(1)),
                2 * b + 1,
            )
        )
        parts.append(
            F.shiftleft(
                F.shiftright(d2.cast("bigint"), b).bitwiseAND(F.lit(1)),
                2 * b,
            )
        )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_value_sql(d1: str, d2: str, bits: int = 10) -> str:
    """The identical interleave as engine-portable SQL (oracle side)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({d1} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({d2} >> {b}) & 1) << {2 * b})")
    return " | ".join(terms)


def widen_if_narrow(df: "DataFrame") -> "DataFrame":
    """Round-robin repartition ``df`` to ``defaultParallelism`` ONLY when
    its current plan yields fewer partitions than the cluster has slots.

    The compute-heavy map stages in this package (pair scoring, LSH
    bucket folds, tokenization) are fused into their input scan; when
    that scan cannot split (a single parquet row group — the sf bench
    layout) the whole stage runs as ONE task no matter what
    ``spark.sql.files.*`` says, serializing minutes of per-row work. At
    warehouse scale the scan has >= slots splits and this is a no-op —
    no exchange is ever added to a well-partitioned plan, keeping the
    conditional scale-adaptive rather than local-tuned (guide §2).

    Row order changes (round robin); callers must only feed plans whose
    downstream is order-independent (joins / aggregates / explicitly
    ordered windows — everything in this package's query surface).
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
