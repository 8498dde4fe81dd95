"""Full benchmark harness — tpcds_bench.rs parity (SURVEY.md §2A-A21).

Where bench.py prints the driver's one-line summary, this harness produces
the reference's full JSON result schema (docs/tpcds_benchmark_plan.md:214-236
and src/bin/tpcds_bench.rs:160-175): per-query iterations with elapsed ms +
row counts, run context (cpu count, versions, args), and failure collection
(failures recorded and printed at the end, not fatal —
src/bin/tpcds_bench.rs:459-476).

Usage:
    python bench/run_bench.py [--sf-dir DIR] [--iterations N] [--queries a,b]
                              [--partitions N] [--mem-table] [--no-pushdown]
                              [-o results.json]

The knobs mirror the reference CLI (src/bin/tpcds_bench.rs:275-300):
--partitions → shuffle partitions, --mem-table → cache+view inputs,
--no-pushdown → spark.sql.orc.filterPushdown=false (statistics/memory-pool
flags are Spark-internal: unified memory manager always spills).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--queries", default="", help="comma-separated subset; default all registered")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--mem-table", action="store_true")
    ap.add_argument("--no-pushdown", action="store_true")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()

    import pyspark

    from datafusion_datasource_orc_spark.operators import QUERIES
    from datafusion_datasource_orc_spark.session import get_spark
    from datafusion_datasource_orc_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="run_bench", shuffle_partitions=args.partitions)
    if args.no_pushdown:
        spark.conf.set("spark.sql.orc.filterPushdown", "false")
        spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    if args.mem_table:
        # MemTable::load parity (src/bin/tpcds_bench.rs:525-536). BOTH scan
        # paths: parquet (the operator default) AND the materialized-ORC
        # directories the connector-surface queries read — Spark's cache
        # manager matches by analyzed plan, so a later spark.read.orc of
        # the same path hits the InMemoryRelation even from a fresh
        # DataFrame. (Derived TPC-DS star tables stay uncached: they build
        # once per process from these cached bases.)
        from datafusion_datasource_orc_spark.sources.tables import load_orc_table

        for t in TABLES:
            load_table(spark, args.sf_dir, t).cache().count()
            load_orc_table(spark, args.sf_dir, t).cache().count()

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    results, failures = [], []
    for name in names:
        iters = []
        for i in range(args.iterations):
            t0 = time.perf_counter()
            try:
                row_count = len(QUERIES[name](spark, args.sf_dir).collect())
            except Exception as exc:  # collect failures, keep going (A21)
                failures.append({"query": name, "iteration": i, "error": f"{type(exc).__name__}: {exc}"})
                break
            iters.append(
                {"elapsed_ms": round((time.perf_counter() - t0) * 1000, 1), "row_count": row_count}
            )
        if iters:
            avg = sum(it["elapsed_ms"] for it in iters) / len(iters)
            results.append(
                {
                    "query": name,
                    "iterations": iters,
                    "avg_ms": round(avg, 1),
                    "best_ms": min(it["elapsed_ms"] for it in iters),
                }
            )

    out = {
        "context": {
            "num_cpus": os.cpu_count(),
            "pyspark_version": pyspark.__version__,
            "python_version": sys.version.split()[0],
            "sf_dir": args.sf_dir,
            "args": vars(args),
        },
        "queries": results,
        "failures": failures,
        "total_avg_ms": round(sum(r["avg_ms"] for r in results), 1),
    }
    text = json.dumps(out, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"wrote {args.output}: {len(results)} queries, {len(failures)} failures, "
              f"total avg {out['total_avg_ms']} ms")
    else:
        print(text)
    if failures:
        print(f"FAILURES: {[f['query'] for f in failures]}", file=sys.stderr)


if __name__ == "__main__":
    main()
