"""SparkSession factory.

Maps the reference's engine-level tunables (src/bin/tpcds_bench.rs:400-437:
partitions, batch size, memory pool, join preference, statistics) onto Spark
session configuration, and bakes in the settings a 100 TB deployment needs.

Scale design notes (local[32] here, 1000-executor cluster in production):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast conversion replace the reference harness's static
  ``--partitions`` / ``--prefer-hash-join`` flags.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; we size it
  ~= cores locally. On a cluster, set it to 2-3x total cores and let AQE
  coalesce down — never leave the 200 default for 100 TB inputs.
- Filter/limit/projection pushdown are Catalyst built-ins; the ORC-specific
  knobs (filterPushdown, vectorized reader, batch size) are set explicitly so
  the connector contract of the reference (src/options.rs) is visible in one
  place.
- Timezone pinned to UTC: ORC/Parquet timestamp semantics and the DuckDB
  oracle agree only under a fixed zone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_BATCH_SIZE = 8192  # reference default: src/source.rs:52 (DataFusion 8192)


def get_spark(
    app_name: str = "datafusion-datasource-orc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``. On a real cluster this function only applies SQL-level
    tuning — it must NOT override the cluster master with local[*], or the
    job silently executes single-node on the driver. Cluster launches are
    detected by any of: a live SparkContext (spark-submit's entry point, or
    anything that built a session first), an externally launched gateway JVM
    (PYSPARK_GATEWAY_PORT — real ``spark-submit app.py`` does NOT set
    PYSPARK_SUBMIT_ARGS, it hands the configured JVM straight to the worker),
    or an explicit --master in PYSPARK_SUBMIT_ARGS (bin/pyspark shells).
    """
    from pyspark import SparkContext

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    external_master = (
        "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
        or "PYSPARK_GATEWAY_PORT" in os.environ
        or SparkContext._active_spark_context is not None
    )
    if master is None and not external_master:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        # --- determinism / oracle agreement ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: replaces the reference's static knobs ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- scan-side: the reference's connector surface (SURVEY §2A) ---
        .config("spark.sql.orc.filterPushdown", "true")  # A8/A10: orc.pushdown_predicate
        .config("spark.sql.orc.enableVectorizedReader", "true")  # A12 columnar batches
        .config("spark.sql.orc.columnarReaderBatchSize", str(DEFAULT_BATCH_SIZE))
        .config("spark.sql.orc.mergeSchema", "false")  # A3 opt-in, like the reference
        .config("spark.sql.parquet.filterPushdown", "true")
        # split planning: A6 partitioned scan (tune down for many small files)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- python interchange: Arrow everywhere (pandas UDF fast path) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # quieter local runs; harmless on cluster
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
