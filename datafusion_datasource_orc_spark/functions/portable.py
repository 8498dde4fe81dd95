"""Oracle-portable aggregation helpers.

Floating-point sums are order-dependent; Spark's partition-parallel
aggregation and DuckDB's sequential scan will not produce bit-identical
doubles. SURVEY.md §7 flags this as the top oracle-mismatch trap. Fix: route
every double aggregate through an exact decimal representation —

    SUM(double)  →  CAST(SUM(CAST(x AS DECIMAL(18, s))) AS DOUBLE)

The decimal sum is exact (associative), so any execution order yields the
same decimal, and the final double cast is a single deterministic rounding.
Both the Spark expression and the oracle SQL use the identical formula.

At 100 TB this costs nothing: Spark's decimal sum is still a map-side partial
aggregate (whole-stage codegen, no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column, scale: int = 4) -> Column:
    """Exact, order-independent SUM over a double column (as double)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def money_avg(col: Column, scale: int = 4) -> Column:
    """Exact-sum / exact-count AVG over a double column (as double).

    double/long division of identical operands is deterministic IEEE-754.
    """
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(col).cast("double")
    )


def money_sum_sql(expr: str, scale: int = 4) -> str:
    """The oracle-SQL twin of :func:`money_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def money_avg_sql(expr: str, scale: int = 4) -> str:
    """The oracle-SQL twin of :func:`money_avg`."""
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE))"
    )
