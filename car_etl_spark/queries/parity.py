"""Cross-engine numeric parity helpers.

The driver's correctness gate hashes result values, so Spark and the
DuckDB oracle must produce *bit-identical* doubles.  Two failure modes
and their cures, learned empirically:

1. **Sum order.**  Double addition is not associative; Spark's partial
   aggregation and DuckDB's scan order accumulate differently, so large
   SUM/AVG values differ in the last ulps and can flip a ROUND digit.
   Cure: sum in ``DECIMAL(30,6)`` — exact, order-independent, identical
   in both engines.  Our money columns carry <= 6 true decimals, so the
   cast itself is exact.

2. **Round-at-tie.**  ``ROUND(x, 2)`` on a double lying at/near the
   ``.xx5`` tie disagrees between engines (Java BigDecimal HALF_UP on
   the exact binary expansion vs DuckDB's scaling).  Finite-decimal
   money values hit exact ties ~1% of the time.  Cure: round while the
   value is still an exact DECIMAL (both engines round exact decimal
   ties away from zero), casting to double only at the very end.

Rounding a *generic* real (ratios, averages after exact-sum division)
is safe natively: both engines hold the identical double and ties are
measure-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,6)"
SQL_DEC = "DECIMAL(30,6)"


def dsum(c: Column, scale: int = 2) -> Column:
    """Exact decimal sum rounded at ``scale``, returned as double."""
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def dsum_raw(c: Column) -> Column:
    """Exact decimal sum as double (for downstream ratios/sorts)."""
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column, scale: int = 4) -> Column:
    """Average via exact sum / count (deterministic double division)."""
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1)), scale)


def drow(c: Column, scale: int = 2) -> Column:
    """Row-wise money rounding through exact decimal (tie-stable)."""
    return F.round(c.cast(DEC), scale).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS {SQL_DEC})), {scale}) AS DOUBLE)"


def sql_dsum_raw(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT(*), {scale})"


def sql_drow(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(CAST({expr} AS {SQL_DEC}), {scale}) AS DOUBLE)"


def rnd(c: Column, scale: int = 6) -> Column:
    """Engine-portable rounding for doubles that are bit-identical across
    engines but may sit ON a rounding tie (e.g. ratios of small
    integers): floor(x * 10^s + 0.5) / 10^s is pure IEEE double
    arithmetic, so both engines compute the identical result where their
    native ROUNDs tie-break differently."""
    factor = float(10**scale)
    return F.floor(c * factor + 0.5) / factor


def sql_rnd(expr: str, scale: int = 6) -> str:
    factor = float(10**scale)
    return f"(FLOOR(({expr}) * {factor} + 0.5) / {factor})"
