"""Cross-engine exact numerics.

Hash-matching a DuckDB oracle requires bit-identical doubles.  Plain
``SUM(double)`` is order-dependent (Spark sums per-partition then merges;
DuckDB sums in scan order), so the last ulps differ.  Fix: cast each
addend to DECIMAL first — decimal addition is exact and associative, so
any summation order yields the same value — then cast the final sum back
to DOUBLE.  Both engines round double->decimal to nearest (doubles are
never exactly on a .5 decimal boundary), so the per-row casts agree too.

The same helpers exist as SQL-string builders for the oracle side; keep
the (precision, scale) in sync between the pair.

At scale this costs one decimal widening per row — negligible next to the
shuffle — and only certification queries need it; production aggregates
can use plain double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# One more cross-engine trap: DECIMAL -> DOUBLE is only correctly rounded
# in DuckDB while the unscaled integer fits in 2^53 (Java BigDecimal is
# always correctly rounded).  So the final sum is rounded down to
# ``out_scale`` decimals before the double cast, keeping the unscaled
# value exact; out_scale defaults to min(scale, 2) which holds up to
# ~10^13 sums.  Callers with huge moments (sum of squares) pass 0.

# ---------------------------------------------------------------- Spark side


def dsum(
    col: Column | str, scale: int = 2, precision: int = 18,
    out_scale: int | None = None, wide: bool = False,
) -> Column:
    """Order-independent SUM(double) -> double via exact scaled-integer
    addition.

    The per-row ``double -> DECIMAL(p,s)`` cast stays (it is the rounding
    rule both engines share); the accumulation does NOT: Spark's
    SUM(DECIMAL(18,s)) widens to DECIMAL(28,s), which leaves the
    compact-long representation and runs on BigDecimal (~3x slower than a
    long sum in the agg hash map).  Instead the cast decimal is converted
    back to its exact unscaled integer (`round(dec_as_double * 10^s)` —
    exact while |unscaled| < ~2^45, since the double round-trip error is
    then << 0.5) and summed as a plain LONG: exact, associative,
    overflow-safe while the scaled total stays under 2^63 (certification
    scales are orders of magnitude below; production aggregates use plain
    doubles and skip all of this).

    Final rounding to ``out_scale`` is done in the long domain with
    explicit half-away-from-zero integer arithmetic (one value per group,
    matching ROUND on a decimal in both engines), and the closing
    ``/ 10^out_scale`` double division is correctly rounded because the
    rounded unscaled value stays < 2^53 (same bound as before).

    The long fast path is gated by *magnitude*, not scale alone: the
    caller must guarantee |SUM| * 10^scale < 2^62.  For high-magnitude
    expressions (sums of squares, large moments) pass ``wide=True`` to
    keep the widened-decimal accumulator — e.g. SUM(price^2) at sf0.1
    is 2.2e15, whose 10^4-scaled total 2.2e19 already exceeds 2^63 and
    would silently wrap on the long path."""
    c = F.col(col) if isinstance(col, str) else col
    if out_scale is None:
        out_scale = min(scale, 2)
    # mirror SUMD: out_scale > scale means "no rounding", never a
    # finer-than-stored scale (the long path below divides by
    # 10^out_scale, so an unclamped out_scale would shift the result)
    out_scale = min(out_scale, scale)
    dec = c.cast(f"decimal({precision},{scale})")
    if wide or scale > 4:
        # high scales exhaust the 2^63 scaled-long headroom too early
        # (scale 8 overflows near ~2e7 rows of 1e5-magnitude values —
        # observed at a 30x fixture replication), so they keep the
        # widened-decimal accumulator; the hot certification sums are
        # all scale <= 4 and stay on the long fast path below
        s = F.sum(dec)
        if out_scale < scale:
            s = F.round(s, out_scale)
        return s.cast("double")
    s = F.sum(scaled_long(c, scale, precision))
    if out_scale < scale:
        d = 10 ** (scale - out_scale)
        h = d // 2
        s = F.when(
            s >= 0, F.call_function("div", s + F.lit(h), F.lit(d))
        ).otherwise(-F.call_function("div", -s + F.lit(h), F.lit(d)))
    return s.cast("double") / F.lit(float(10**out_scale))


def scaled_long(
    col: Column | str, scale: int = 2, precision: int = 18
) -> Column:
    """Per-row double -> its exact unscaled LONG under the shared
    double->DECIMAL(p,s) rounding rule.  This is the single source of
    the scaled-integer carrier: dsum's fast path sums it directly, and
    two-stage folds (incremental_agg_merge) store it as partial state so
    any later merge is an associative integer add."""
    c = F.col(col) if isinstance(col, str) else col
    dec = c.cast(f"decimal({precision},{scale})")
    return F.round(dec.cast("double") * F.lit(float(10**scale))).cast("long")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


# ------------------------------------------------------------- oracle (SQL)


def SUMD(
    expr: str, scale: int = 2, precision: int = 18, out_scale: int | None = None
) -> str:
    if out_scale is None:
        out_scale = min(scale, 2)
    s = f"SUM(CAST({expr} AS DECIMAL({precision},{scale})))"
    if out_scale < scale:
        s = f"ROUND({s}, {out_scale})"
    return f"CAST({s} AS DOUBLE)"


def AVGD(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"({SUMD(expr, scale, precision)} / COUNT({expr}))"
