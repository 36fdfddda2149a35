"""Cross-engine-deterministic numeric aggregates.

Floating-point sums are order-dependent; Spark's partial+final
aggregation tree and DuckDB's sequential scan sum in different
orders, so ``SUM(double)`` can differ in the last ulps — enough to
flip a rounded digit and break a value-hash comparison. Casting each
input to DECIMAL first makes the arithmetic exact and identical in
both engines (IEEE754 → decimal rounding of a single value is
deterministic and engine-agnostic), and casting the exact result
back to DOUBLE yields a bitwise-stable float.

At cluster scale this costs one widening cast per row inside the
partial aggregate — still whole-stage-codegen'd, still partial+final.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_sum(col: Column | str, scale: int = 4) -> Column:
    """Exact SUM: cast to decimal(18,scale), sum, back to double.

    Precision 18 keeps the per-row value long-backed (Decimal128 ops
    above 18 digits cost ~3x in the aggregate hot loop); Spark widens
    the sum accumulator to decimal(28,scale) automatically, so no
    overflow until |sum| > 10^(28-scale). The DuckDB twin may declare
    any precision ≥ the values' magnitude — only the SCALE must match
    (both engines round the double→decimal cast at the same scale):
    ``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def narrow_checked(col: Column | str, dec: str = "decimal(18,6)", label: str = "narrow") -> Column:
    """Narrow a wide (possibly int128-backed) decimal aggregate to an
    int64-backed one ahead of a double cast — int64→double is correctly
    rounded in BOTH engines while DuckDB's int128→double is not — and
    FAIL LOUDLY if the value is NULL, instead of emitting silent NULL
    result rows (the no-partial-truth policy).

    Callers must only pass aggregates that are non-NULL by
    construction (sums over ≥1 non-null inputs, guaranteed by an
    upstream filter): a NULL here therefore proves an overflow —
    either the non-ANSI sum accumulator overflowed upstream, or the
    narrowing cast itself exceeded its documented bound.  The DuckDB
    oracle twin needs no guard: DuckDB raises on both overflows by
    default.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = c.cast(dec)
    return F.when(
        n.isNull(),
        F.raise_error(F.lit(f"{label}: exceeded its documented {dec} bound (overflow->NULL)")),
    ).otherwise(n)


def decimal_avg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum AVG: decimal sum divided by non-null count, in
    double (one division on identical operands → identical result).

    DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return decimal_sum(c, scale) / F.count(c)
