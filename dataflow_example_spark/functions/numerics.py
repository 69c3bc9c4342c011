"""Engine-portable deterministic summation without group
materialization.

Double addition is not associative, so a plain ``SUM(double)`` depends
on partition order — unacceptable for a hash-exact oracle gate. The
repo's original workaround ("pinned sorted fold": sort_array over a
collect_list, then a sequential fold) is deterministic and portable but
materializes the WHOLE group in one aggregation buffer — fine for
constant-bounded groups (24 hours, 8 labels' worth of s^2/n terms),
an OOM at 100 TB for corpus-bounded groups (all values of an embedding
dimension, one ln term per user).

``fixed_point_sum`` replaces the fold for those corpus-bounded groups:

1. quantize each term onto a 10^-frac grid with ``floor`` — floor has
   no round-half ties (the cross-engine hazard ``round`` has) and IEEE
   multiplication/floor are bit-identical in both engines;
2. sum the quantized integers as DECIMAL(38,0) — integer addition is
   exact and order-independent, so the aggregate is a true streaming
   (map-side-combinable) SUM with O(1) state;
3. divide back to double.

The result differs from the true double sum by at most n * 10^-frac
(absolute) for |term| < ~9e3 (= 2^53 / 1e12), where term * 1e12 stays
inside the exact-integer double range and floor loses nothing beyond
the grid. Between ~9e3 and ~9.2e6 (= 2^63 / 1e12, the LONG range Spark's
``floor`` returns into) results remain deterministic and engine-
identical — the double product rounds the same way in both engines —
but the n * 10^-frac error bound no longer holds term-exactly. Past
~9.2e6, Spark's floor->LONG silently wraps in non-ANSI mode while
DuckDB's HUGEINT does not: a hard domain violation. All call sites sum
ln-counts, unit-scale embedding components, or their squares — well
inside the ~9e3 exact regime.

DuckDB mirror (oracles.py ``fpsum``):
    CAST(sum(CAST(floor(v * 1e12) AS HUGEINT)) AS DOUBLE) / 1e12
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FRAC_DIGITS = 12
_SCALE = 10.0**FRAC_DIGITS


def fixed_point_quantize(col: Column) -> Column:
    """floor-quantized DECIMAL(38,0) term on the 10^-12 grid."""
    return F.floor(col * F.lit(_SCALE)).cast("decimal(38,0)")


def fixed_point_sum(col: Column) -> Column:
    """Order-independent, bounded-state, engine-exact sum of doubles
    (aggregate expression; see module docstring)."""
    return F.sum(fixed_point_quantize(col)).cast("double") / F.lit(_SCALE)
