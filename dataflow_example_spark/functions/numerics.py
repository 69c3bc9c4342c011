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
~9.2e6 PER TERM, Spark's floor->LONG overflows — loudly under the
pinned ANSI mode. All call sites sum ln-counts, unit-scale embedding
components, or their squares — well inside the ~9e3 exact regime.
GROUP sums are unbounded in practice: the sum accumulates exactly in
DECIMAL(38,0)/HUGEINT and reaches double through the portable
nearest conversion on both engines (plain cast here — correctly
rounded for scale-0 decimals — and the compensated cast in the DuckDB
mirror), engine-identical for |scaled group sum| < ~2e31, i.e.
|group sum| < ~2e19.

DuckDB mirror (oracles.py ``fpsum``): the same quantized HUGEINT sum
through ``_dec_int_to_double_sql`` (compensated nearest-double), / 1e12
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


def dec_int_to_double(i: Column) -> Column:
    """Nearest-double of an integer-valued (scale-0) decimal column,
    bit-identical to the DuckDB oracle's ``_dec_int_to_double_sql``.

    The two engines need DIFFERENT implementations to land on the same
    (correctly-rounded) double — both verified by a 2,928-value property
    sweep over 54..126-bit integers including exact ulp midpoints:

    - Spark: a plain scale-0 decimal->double cast IS correctly rounded
      (Decimal.toDouble goes through the exact BigDecimal digit string
      and a correctly-rounded parse), so that is the whole
      implementation here. Spark's nonzero-scale casts are also
      correctly rounded, but the INTEGER contract keeps the DuckDB
      mirror implementable (see below) — callers pre-shift scales with
      exact decimal multiplies and cancel the 10^k factors
      algebraically (``pearson_exact_parts``).
    - DuckDB: its int128->double conversion is NOT correctly rounded
      (two-limb assembly, ~2% of sweep values 1 ulp off), so the mirror
      compensates: ``hi = CAST(i AS DOUBLE)``, exact decimal residual
      ``err = i - CAST(hi AS DECIMAL(38,0))`` (DuckDB's double->decimal
      is binary-exact), and one correctly-rounded IEEE addition
      ``hi + CAST(err AS DOUBLE)`` lands on nearest(i) regardless of
      how ``hi`` rounded.

    The same compensation would NOT work on Spark: its double->decimal
    cast goes through ``Double.toString`` (17 significant digits, not
    the exact binary value), which corrupts the residual — observed as a
    1-ulp error on ``5044931019679511357550`` before this split design.
    """
    return i.cast("double")


def dec_wide_to_double(col: Column, frac_digits: int) -> Column:
    """Engine-portable double of a wide decimal sum with ``frac_digits``
    true decimal content: exact scale-shift to a scale-0 integer, the
    portable nearest-double conversion (``dec_int_to_double`` /
    ``oracles._dec_wide_to_double_sql``), then one correctly-rounded
    division by the exact power-of-ten double. Both engines land on the
    bit-identical double at any magnitude.

    Use this instead of ``.cast("double")`` wherever a sum's internal
    integer can exceed 2^53 (for scale-6 value sums that is sum > ~9e9;
    for scale-12 squared-value sums essentially always) AND downstream
    arithmetic subtracts near-equal quantities. Measured on sf0.1
    (tools/kappa_probe.py): the day-of-week ANOVA F carries condition
    number 2.0e4 — over the gate's ~4.5e3 failure threshold, passing
    with plain casts only because the realized (non-worst-case) cast
    errors partially cancel; the hour-seasonality R^2 sits at 3.6e3
    (79% of threshold), the user ICC at 2.1e3, and the Welch t
    mean_diff at 4.3e2 but growing ~sqrt(n) (threshold-level by ~100x
    this data volume). The grouped Pearson corr measures 2.5e5 — the
    sf0.1 gate failure observed in practice. Ratio-only assemblies
    (HHI shares, cosine similarity, Benford, promo shares) have
    condition ~1 and are safe with plain casts.
    """
    remaining = frac_digits
    cur = col
    # Shift in <=6-digit chunks, re-narrowing between steps. The
    # chunking is what DuckDB needs: its product rule requires
    # p1+p2<=38, which a single-step shift would overflow. On Spark,
    # decimal(31,f) * decimal(7,0) is nominally precision 39, so its
    # precision-loss adjustment still triggers — but the adjustment is
    # value-exact in-domain because every product here fits
    # decimal(38,s) exactly; domain: |value| < ~1e19.
    while remaining > 0:
        step = min(6, remaining)
        m = 10**step
        sd = len(str(m))
        cur = (
            cur.cast(f"decimal({38 - sd},{remaining})")
            * F.lit(m).cast(f"decimal({sd},0)")
        ).cast(f"decimal(38,{remaining - step})")
        remaining -= step
    return dec_int_to_double(cur.cast("decimal(38,0)")) / F.lit(
        float(10**frac_digits)
    )


def pearson_exact_parts(
    n: str = "n",
    sx: str = "sx",
    sy: str = "sy",
    sxy: str = "sxy",
    sxx: str = "sxx",
    syy: str = "syy",
    x_scale: int = 0,
    y_scale: int = 2,
) -> tuple[Column, Column, Column]:
    """Cancellation-free Pearson building blocks from exact decimal sums,
    as INTEGER-valued scale-0 decimals::

        num_i   = (n*Σxy  - Σx*Σy ) * 10^(x_scale+y_scale)
        den_x_i = (n*Σx²  - (Σx)² ) * 10^(2*x_scale)
        den_y_i = (n*Σy²  - (Σy)² ) * 10^(2*y_scale)

    computed entirely in decimal arithmetic, so each part is EXACT. The
    scale powers cancel algebraically in r — ``num*10^(xs+ys)`` over
    ``sqrt(den_x*10^2xs * den_y*10^2ys)`` — so the caller assembles
    ``dec_int_to_double(num_i) / sqrt(dec_int_to_double(den_x_i) *
    dec_int_to_double(den_y_i))`` with no division by a scale factor, and
    every double op after the casts is the same IEEE op on both engines:
    the result is bit-identical cross-engine at ANY data scale.

    Why not cast the six sums to double and assemble there (the obvious
    way): DuckDB's nonzero-scale decimal->double cast double-rounds (see
    ``dec_int_to_double``), so once a scaled sum exceeds 2^53 the engines
    disagree by 1 ulp — and ``n*Σxy - Σx*Σy`` cancels ~4 orders of
    magnitude on weakly-correlated data, amplifying that ulp to ~1e-11
    relative in r. Observed: the sf0.1 oracle gate failed
    ``lineitem_brand_price_qty_corr`` on exactly this while sf0.01 sat
    below the 12-significant-digit canonicalization threshold.

    Domain (enforced loudly by ANSI decimal-overflow errors): per-group
    ``n <= 1e9`` rows with x in [0, 50] at scale ``x_scale`` and y in
    [0, ~1.05e5] at scale ``y_scale``; every intermediate then fits its
    declared precision. The sums passed in must be exactly representable
    at the cast scales, i.e. x has at most ``x_scale`` and y at most
    ``y_scale`` true decimal digits (TPC-H quantity is integral,
    extendedprice has 2).

    DuckDB mirror (oracles.py): same expressions, with casts widened to
    precision >= 19 where a product of two <=18-precision operands would
    otherwise be evaluated in int64 (DuckDB picks the multiply width from
    the OPERAND storage class, not the declared result precision), and
    narrowed back under 38 before the scale-shift multiply (DuckDB errors
    when p1+p2 exceeds 38).
    """
    xs, ys = x_scale, y_scale
    nn = F.col(n).cast("decimal(10,0)")
    sx_ = F.col(sx).cast(f"decimal(14,{xs})")
    sy_ = F.col(sy).cast(f"decimal(17,{ys})")
    sxy_ = F.col(sxy).cast(f"decimal(18,{xs + ys})")
    sxx_ = F.col(sxx).cast(f"decimal(16,{2 * xs})")
    syy_ = F.col(syy).cast(f"decimal(26,{2 * ys})")

    def _to_int(part: Column, k: int) -> Column:
        if k:  # exact: scale-shift multiply, then drop the zero fraction
            shift = 10**k
            part = part * F.lit(shift).cast(f"decimal({len(str(shift))},0)")
        return part.cast("decimal(38,0)")

    num = _to_int(nn * sxy_ - sx_ * sy_, xs + ys)
    den_x = _to_int(nn * sxx_ - sx_ * sx_, 2 * xs)
    den_y = _to_int(nn * syy_ - sy_ * sy_, 2 * ys)
    return num, den_x, den_y
