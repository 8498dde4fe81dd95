"""Isolated per-query timing with the noop sink (optimization guide §1.4).

Usage: python tools/time_query.py QUERY [QUERY ...] [--sf SF_DIR] [-n ITERS]
           [--collect]

Times each named registry query in its own labelled job
(`setJobDescription`), default action = noop sink (computes every column of
every row, discards the result — no driver materialization cost), or
`--collect` for the bench harness's collect() methodology. Prints
best / median per query. Pre-materializes the ORC tables and TPC-DS views
outside the timed region, exactly like bench.py.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", "--iters", type=int, default=4)
    ap.add_argument("--collect", action="store_true")
    args = ap.parse_args()

    from datafusion_datasource_orc_spark.operators import QUERIES
    from datafusion_datasource_orc_spark.session import get_spark
    from datafusion_datasource_orc_spark.sources.tables import orc_dir_for

    spark = get_spark(app_name="time_query")
    for t in ("region", "part", "lineitem", "documents"):
        orc_dir_for(spark, args.sf, t)
    if any(q.startswith("tpcds") for q in args.queries):
        from datafusion_datasource_orc_spark.operators.tpcds import (
            _register_tpcds_views,
        )

        _register_tpcds_views(spark, args.sf)

    for name in args.queries:
        fn = QUERIES[name]
        times = []
        for i in range(args.iters):
            spark.sparkContext.setJobDescription(f"{name} iter {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.collect:
                rows = len(df.collect())
            else:
                df.write.format("noop").mode("overwrite").save()
                rows = -1
            times.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: best={min(times):.3f}s median={statistics.median(times):.3f}s"
            f" rows={rows} iters={times}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
