"""datafusion_datasource_orc_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of `suxiaogang223/datafusion-datasource-orc`.

The reference (Rust, ~5.4k LoC) plugs the ORC file format into Apache DataFusion:
schema inference, multi-file schema merge, projection/predicate/limit pushdown,
async object-store I/O, per-file scan metrics, and a TPC-DS harness
(reference: src/lib.rs:1-175, SURVEY.md §0).

This package is NOT a port of that trait stack — Spark's native ORC datasource
already *is* the FileFormat/FileSource/FileOpener pipeline. Instead it provides:

- ``session``        — a SparkSession factory tuned for large-scale scans
                       (AQE, pushdown, vectorized ORC reader).
- ``sources``        — the connector surface: the reference's read-options dict
                       (src/options.rs:30-114) mapped onto ``spark.sql.orc.*``
                       confs, catalog registration (ListingTable equivalent,
                       src/bin/tpcds_bench.rs:590-614), per-file metadata/stats
                       (src/metadata.rs:35-86), and the ORC writer the reference
                       leaves as a stub (src/writer.rs:18-23).
- ``operators``      — the full relational query surface the reference
                       demonstrates through DataFusion (SURVEY.md §2B), plus
                       beyond-reference LLM-data-pipeline operators: dedup,
                       similarity search, text analysis, multimodal columns.
- ``functions``      — reusable Column-expression helpers (vector math,
                       shingling/minhash, text heuristics). Everything stays
                       JVM-side (pyspark.sql.functions) unless semantics force
                       a Pandas UDF.
- ``plans``          — explain-plan introspection: assert that pushdown
                       actually reached the scan (PushedFilters / ReadSchema),
                       mirroring the reference's EXPLAIN surface
                       (src/source.rs:240-255).
- ``streaming``      — Structured Streaming variants of the event-table
                       operators (beyond reference scope, which is batch-only).
- ``metrics``        — scan/query metrics à la OrcFileMetrics
                       (src/metrics.rs:57-217) via df.observe + listener.
"""

__version__ = "0.1.0"

from datafusion_datasource_orc_spark.session import get_spark  # noqa: F401
