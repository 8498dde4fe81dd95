"""Vector math over array<float> embedding columns — pure Column expressions.

Everything here compiles to Catalyst higher-order functions
(``aggregate``/``zip_with``), i.e. runs JVM-side inside whole-stage codegen —
no Python UDF in the hot path. At 100 TB these expressions vectorize across
the scan with zero serialization overhead; a Pandas-UDF fallback would move
every embedding through Arrow for no semantic gain.

Accumulation is in DOUBLE, sequential over the array (deterministic for a
given row), matching DuckDB's list_* kernels for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """sum_i a[i]*b[i], double accumulator."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
