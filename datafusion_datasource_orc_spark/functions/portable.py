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

Driver-comparator conventions (the gate converts BOTH result sets to pandas
frames before hashing — tools/check_oracles.py replicates this; the schema
rules are enforced by tests/test_entry_contract.py):

- integer SUM / integer-division outputs: wrap the ORACLE side in
  ``CAST(... AS BIGINT)`` — DuckDB returns HUGEINT, which pandas renders as
  float64 ("3.0") against Spark's int64 ("3").
- array/map/struct outputs: never — pandas' canonicalizer cannot hash list
  cells. Serialize at the output boundary (``array_join``/``to_json`` on
  Spark, ``array_to_string``/``list_string_agg`` on DuckDB).
- DATE outputs: never — Spark dates become datetime.date objects, DuckDB
  dates become midnight datetime64 Timestamps. Emit TIMESTAMP_NTZ (Spark) /
  TIMESTAMP (DuckDB): naive datetime64 on both engines.
- decimal outputs: cast to DOUBLE on both sides — DuckDB decimals reach
  pandas as float64, Spark decimals as object Decimal.
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
