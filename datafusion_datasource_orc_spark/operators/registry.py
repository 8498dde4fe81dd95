"""Query registry.

Every operator module registers its queries here; ``__spark_entry__``
aggregates the registry into the driver contract (``queries()`` +
``oracle_sql()``). Keeping the Spark callable and its DuckDB oracle SQL
side-by-side in one decorator call is what keeps output column names in sync
— the driver's comparator hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with its
    DuckDB oracle SQL. Queries without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:  # not assert: python -O strips asserts and the
            # later registration would silently shadow the earlier query
            raise ValueError(f"duplicate query name {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
