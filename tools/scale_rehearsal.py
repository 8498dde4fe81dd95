"""Scale rehearsal: run the most expensive headline queries at two scales
and report the time ratio against the row-count ratio (judge r06 task 3 —
convert SCALE.md's design claims into measurements).

Timing matches bench/run_bench.py (len(df.collect()), best of N); each sf
runs in the SAME session back-to-back, headliners warmed once per dir so
codegen-compile noise lands outside the timed iterations.

Usage: python tools/scale_rehearsal.py [--base /root/testdata/sf0.1]
       [--big /root/repo/.scale/sf0.5] [--iterations 3] [-o out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = [
    "dedup_minhash_lsh",
    "simsearch_pq",
    "tpcds_q14",
    "tpcds_q64",
    "text_char_entropy",
    "basket_part_pairs",
    "tpch_q1",
    "tpch_q18",
    "text_ngram_novelty",
    "ingest_incremental_bloom",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.scale/sf0.5")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()

    from datafusion_datasource_orc_spark.operators import QUERIES
    from datafusion_datasource_orc_spark.session import get_spark

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or HEADLINERS
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        # fail BEFORE running anything: a typo after minutes of timed
        # iterations would discard all the work with a KeyError
        ap.error(f"unknown queries: {unknown}")
    spark = get_spark(app_name="scale_rehearsal")

    out: dict[str, dict] = {}
    for sf_dir in (args.base, args.big):
        for name in names:
            fn = QUERIES[name]
            fn(spark, sf_dir).collect()  # warm: codegen + ORC/star caches
            best, rows = float("inf"), 0
            for _ in range(args.iterations):
                t0 = time.perf_counter()
                rows = len(fn(spark, sf_dir).collect())
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[sf_dir] = {
                "best_s": round(best, 3),
                "rows": rows,
            }
            print(f"{os.path.basename(sf_dir):8s} {name:28s} "
                  f"{best:6.2f}s rows={rows}", flush=True)

    print(f"\n{'query':28s} {'base_s':>7s} {'big_s':>7s} {'ratio':>6s}")
    for name in names:
        b = out[name][args.base]["best_s"]
        g = out[name][args.big]["best_s"]
        print(f"{name:28s} {b:7.2f} {g:7.2f} {g / b:6.2f}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"base": args.base, "big": args.big, "results": out}, f, indent=1)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
