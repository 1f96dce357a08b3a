"""Shared helpers for oracle-parity-safe expressions.

Float aggregation is order-dependent; Spark and DuckDB will not hash-match
on a naive SUM(double) over 60k rows.  The fix: cast inputs to DECIMAL
(exact, no ties possible when converting binary doubles to decimal scales —
a tie point k+0.5 at scale s has a factor 5^(s+1) in its reduced denominator
so no double equals it), do exact decimal arithmetic, cast the final result
to DOUBLE.  Both engines then produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(12,4) fits all money-ish columns in the TPC-H-ish testdata
# (|x| < 1e8) and three-way products stay within both engines' 38-digit cap.
MONEY = "decimal(12,4)"
# Final results are re-quantized to scale 4 (via ROUND, which is HALF_UP in
# both engines — decimal→decimal CAST downscaling is NOT consistent in
# DuckDB) before the double cast: DuckDB converts decimal→double as
# (double)unscaled / (double)10^scale (two roundings), which diverges from
# Spark's correctly-rounded BigDecimal cast when the unscaled value exceeds
# 2^53.  At scale 4 the unscaled magnitude stays < 2^53 for sums up to
# ~9e11, so both engines round identically.


def dec(col: Column | str) -> Column:
    """Exact decimal view of a double column (scale 4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def to_double(col: Column) -> Column:
    """Parity-safe decimal→double: HALF_UP-round to scale 4 first."""
    return F.round(col, 4).cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles: decimal-sum, cast back to double."""
    return to_double(F.sum(dec(col)))


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return to_double(F.sum(dec(c))) / F.count(c)


def sql_to_double(expr: str) -> str:
    return f"CAST(ROUND({expr}, 4) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    return sql_to_double(f"SUM(CAST({expr} AS DECIMAL(12,4)))")


def sql_davg(expr: str) -> str:
    return f"{sql_dsum(expr)} / COUNT({expr})"
