"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The inventory lives in ``datafusion_datasource_orc_spark.operators``; every
operator registers its Spark callable and DuckDB oracle side-by-side
(operators/registry.py), which keeps output column names aligned between the
two — the comparator hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Mirrors the reference's flagship group-by golden
    (tests/basic_reading.rs:919-948) over the ORC scan path: parquet →
    ORC materialization → spark.read.orc → filter → groupBy → count.
    """
    from datafusion_datasource_orc_spark.operators.scan import orc_groupby_count

    return orc_groupby_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from datafusion_datasource_orc_spark.operators import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query.
    Approximate/stubbed ops (minhash LSH, simhash, vector LSH, stub decode)
    are intentionally absent → driver records the weaker rows-only check."""
    from datafusion_datasource_orc_spark.operators import ORACLES

    return dict(ORACLES)
