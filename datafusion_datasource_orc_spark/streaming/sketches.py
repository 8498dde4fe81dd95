"""Streaming twin of the Count-Min sketch (operators/countmin.py).

The CMS is the rare sketch whose streaming form is NOT an approximation of
the batch form — counters are plain integer sums, so a watermark-free
streaming aggregation over the same corpus produces BIT-IDENTICAL counters
to the batch build (pinned in tests/test_streaming.py). State is bounded
by construction: at most CMS_DEPTH x CMS_WIDTH = 4,096 rows regardless of
stream volume, which is why a CMS (not an exact token table, whose state
is |vocab| and unbounded) is what a 100 TB/day feed keeps per window.

Per-batch partial counters merge by addition — the mergeability contract
tests/test_round8_ops.py pins for the batch path is exactly what Spark's
incremental aggregation exploits here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.operators.countmin import explode_cms_buckets

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def documents_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source documents stream (streaming reads need a declared schema)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(source_dir)


def stream_countmin_counters(stream: DataFrame) -> DataFrame:
    """(d, bucket, c) CMS counters as a streaming aggregation — the
    incremental build of approx_countmin_tokens' counter table. Complete
    output mode; state = the 4,096 counters themselves."""
    toks = stream.filter(F.col("text").isNotNull()).select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    bk = toks.select(explode_cms_buckets().alias("db")).select(
        F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket")
    )
    return bk.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
