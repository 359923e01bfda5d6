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
    out_scale: int | None = None,
) -> Column:
    """Order-independent SUM(double) -> double via exact decimal addition."""
    c = F.col(col) if isinstance(col, str) else col
    if out_scale is None:
        out_scale = min(scale, 2)
    s = F.sum(c.cast(f"decimal({precision},{scale})"))
    if out_scale < scale:
        s = F.round(s, out_scale)
    return s.cast("double")


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
