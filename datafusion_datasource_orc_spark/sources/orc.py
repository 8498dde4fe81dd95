"""ORC connector surface.

Re-expresses the reference's format layer on Spark's native ORC datasource:

- ``OrcFormatOptions``  — the read-options dict of src/options.rs:30-114
  (``orc.batch_size``, ``orc.pushdown_predicate``, ``orc.metadata_size_hint``)
  with the same parse/validation/unknown-key semantics, mapped to
  ``spark.sql.orc.*`` session confs.
- ``OrcTableCatalog``   — the ListingTable registration flow of
  src/bin/tpcds_bench.rs:521-614 (``register_orc_table`` → temp view; schema
  inference happens in Spark's reader, multi-file merge via mergeSchema like
  src/file_format.rs:137-162).
- ``write_orc``         — the writer the reference stubs out
  (src/writer.rs:18-23); Spark-native, with compression + partitioning,
  so this exceeds the reference.

Scale notes: registration is metadata-only (no data read besides footers);
``write_orc`` controls output file sizing via ``maxRecordsPerFile`` /
repartition so a 100 TB write yields reader-friendly (~128-512 MB) files
rather than task-count-many shards.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Reference defaults: src/options.rs:30-47
DEFAULT_BATCH_SIZE = 8192
DEFAULT_PUSHDOWN_PREDICATE = True

_TRUE = {"true", "1", "yes", "on"}
_FALSE = {"false", "0", "no", "off"}


class OrcOptionError(ValueError):
    """Typed parse error, mirroring the reference's config errors
    (src/options.rs:84-97: 'Invalid value for orc.batch_size: ...')."""


def _parse_bool(key: str, value: str) -> bool:
    v = value.strip().lower()
    if v in _TRUE:
        return True
    if v in _FALSE:
        return False
    raise OrcOptionError(f"Invalid value for {key}: {value!r} (expected boolean)")


def _parse_positive_int(key: str, value: str) -> int:
    try:
        n = int(value.strip())
    except ValueError as exc:
        raise OrcOptionError(f"Invalid value for {key}: {value!r} (expected integer)") from exc
    if n <= 0:
        raise OrcOptionError(f"Invalid value for {key}: {value!r} (must be positive)")
    return n


@dataclass
class OrcFormatOptions:
    """Mirror of the reference's OrcFormatOptions (src/options.rs:24-47).

    ``metadata_size_hint`` has no Spark equivalent (Spark's ORC reader manages
    its own footer prefetch); it is accepted, validated, and recorded but is a
    documented no-op — SURVEY.md §7 'un-mappables'.
    """

    batch_size: int = DEFAULT_BATCH_SIZE
    pushdown_predicate: bool = DEFAULT_PUSHDOWN_PREDICATE
    metadata_size_hint: int | None = None
    merge_schema: bool = False
    ignored_keys: list[str] = field(default_factory=list)

    # src/options.rs:79-98 — parse a string map; unknown keys are ignored.
    def apply_format_options(self, options: dict[str, str]) -> "OrcFormatOptions":
        for key, value in options.items():
            if key == "orc.batch_size":
                self.batch_size = _parse_positive_int(key, value)
            elif key == "orc.pushdown_predicate":
                self.pushdown_predicate = _parse_bool(key, value)
            elif key == "orc.metadata_size_hint":
                self.metadata_size_hint = _parse_positive_int(key, value)
            elif key == "orc.merge_schema":
                self.merge_schema = _parse_bool(key, value)
            else:
                self.ignored_keys.append(key)
        return self

    def spark_confs(self) -> dict[str, str]:
        """The spark.sql.orc.* conf mapping (SURVEY.md §2A-A15)."""
        return {
            "spark.sql.orc.columnarReaderBatchSize": str(self.batch_size),
            "spark.sql.orc.filterPushdown": str(self.pushdown_predicate).lower(),
            "spark.sql.orc.mergeSchema": str(self.merge_schema).lower(),
        }

    def apply_to_session(self, spark: SparkSession) -> None:
        for k, v in self.spark_confs().items():
            spark.conf.set(k, v)


class OrcTableCatalog:
    """ListingTable-style registration (src/bin/tpcds_bench.rs:521-614).

    ``register(name, path)`` = parse url → infer schema → register table, in
    Spark terms: ``spark.read.orc(path)`` (footer-only) →
    ``createOrReplaceTempView``. ``mem_table=True`` mirrors the harness's
    ``--mem-table`` flag (MemTable::load, tpcds_bench.rs:525-536) via
    ``.cache()``.
    """

    def __init__(self, spark: SparkSession, options: OrcFormatOptions | None = None):
        self.spark = spark
        self.options = options or OrcFormatOptions()
        self.options.apply_to_session(spark)
        self.tables: dict[str, str] = {}

    def register(
        self,
        name: str,
        path: str,
        mem_table: bool = False,
        path_glob_filter: str | None = None,
        recursive: bool = False,
    ) -> DataFrame:
        """Register an ORC directory as a queryable table.

        ``path_glob_filter`` / ``recursive`` mirror the reference's
        ListingTableUrl semantics (src/bin/tpcds_bench.rs:592-614 parses
        URLs whose listing layer accepts globs and walks subdirectories):
        Spark's ``pathGlobFilter`` restricts which files the listing
        matches; ``recursiveFileLookup`` descends past partition dirs."""
        reader = self.spark.read
        if self.options.merge_schema:
            reader = reader.option("mergeSchema", "true")
        if path_glob_filter:
            reader = reader.option("pathGlobFilter", path_glob_filter)
        if recursive:
            reader = reader.option("recursiveFileLookup", "true")
        df = reader.orc(path)
        if mem_table:
            df = df.cache()
        df.createOrReplaceTempView(name)
        self.tables[name] = path
        return df

    def schema(self, name: str):
        return self.spark.table(name).schema

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def register_external(self, name: str, path: str) -> None:
        """Catalog-table registration (CREATE TABLE ... USING ORC LOCATION) —
        needed for ANALYZE/CBO, which temp views don't support."""
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        self.spark.sql(f"CREATE TABLE {name} USING ORC LOCATION '{path}'")
        self.tables[name] = path

    def analyze(self, name: str, columns: list[str] | None = None) -> None:
        """Statistics collection for cost-based planning — the Spark
        equivalent of the reference's collect_statistics toggle
        (src/bin/tpcds_bench.rs:450-451; stats from footers
        src/metadata.rs:64-86). Column-level stats feed join reordering and
        broadcast decisions under spark.sql.cbo.enabled."""
        self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        if columns:
            cols = ", ".join(columns)
            self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")

    def table_stats(self, name: str) -> dict:
        """rowCount/sizeInBytes as the planner sees them."""
        rows = self.spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        stats_line = next((r.data_type for r in rows if r.col_name == "Statistics"), "")
        return {"raw": stats_line}


def write_orc_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Bucketed + sorted ORC table — closes the reference's file-sort-order
    gap (with_file_sort_order, src/bin/tpcds_bench.rs:603-607, which SURVEY §4
    flags as un-mappable for plain directories): Spark's equivalent contract
    is a bucketed table, which additionally makes equi-joins on the bucket
    key shuffle-free. At 100 TB, bucketing both fact tables on the join key
    turns the nightly join from a full shuffle into a local zip per bucket."""
    writer = (
        df.write.mode("overwrite")
        .format("orc")
        .option("compression", compression)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_orc_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    compression: str = "snappy",
) -> None:
    """Range-clustered ORC layout: repartitionByRange + sortWithinPartitions
    on the cluster key, one file per range.

    This is the layout half of predicate pushdown (the reference pushes
    predicates to stripe stats, src/predicate.rs:53-245 — but stats only
    prune if the data is clustered so min/max ranges are narrow). After this
    write, a range filter on the cluster key touches one file's stripes
    instead of every file; at 100 TB that is the difference between a
    full-corpus scan and reading one executor's worth of splits. Sorting
    within partitions additionally narrows every stripe's min/max, so
    stripe-level pruning composes with file-level.
    """
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .option("compression", compression)
        .orc(path)
    )


def _hadoop_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(data_file_count, total_bytes) for a directory via the Hadoop
    FileSystem API — storage-agnostic (file://, s3a://, gs://, abfs://),
    exactly the layer the reference's object_store reads sit on
    (src/reader.rs:119-148). Hidden/_SUCCESS files excluded."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n = total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += f.getLen()
    return n, total


def compact_orc(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
    compression: str = "snappy",
    shuffle: bool = False,
) -> dict:
    """Small-file compaction: rewrite an ORC directory into
    ceil(total_bytes / target_file_bytes) files.

    The standing operational problem of a streaming or highly-parallel
    ingest at 100 TB is millions of KB-sized files: every scan pays one
    ranged-read setup per file (the reference counts these as io_requests,
    src/metrics.rs:57-118) and the driver pays listing + split planning.
    Compaction restores ~128 MB files, the split size scans want.

    ``shuffle=False`` (default) uses coalesce — a narrow, shuffle-free merge
    of co-located small files (file counts may be slightly uneven);
    ``shuffle=True`` uses repartition for exactly even output at the cost of
    a full exchange. Returns before/after stats.
    """
    src_files, src_bytes = _hadoop_dir_stats(spark, src_dir)
    n_out = max(1, -(-src_bytes // target_file_bytes))
    df = spark.read.orc(src_dir)
    out = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    out.write.mode("overwrite").option("compression", compression).orc(dst_dir)
    dst_files, dst_bytes = _hadoop_dir_stats(spark, dst_dir)
    return {
        "src_files": src_files,
        "src_bytes": src_bytes,
        "dst_files": dst_files,
        "dst_bytes": dst_bytes,
        "target_file_bytes": target_file_bytes,
    }


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_file_rows: int | None = None,
    coalesce: int | None = None,
) -> None:
    """ORC writer (reference stub src/writer.rs:18-23 — implemented here).

    ``target_file_rows`` caps rows per output file (maxRecordsPerFile) so
    cluster-scale writes produce bounded file sizes; ``coalesce`` merges tiny
    local outputs (small dims → 1 file, like the reference's one-file-per-table
    TPC-DS layout, scripts/convert_tpcds_to_orc.py:61-83).
    """
    if coalesce:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode).option("compression", compression)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", str(target_file_rows))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
