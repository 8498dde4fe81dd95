"""Dump `.explain("formatted")` output for named queries to files.

Usage: python tools/dump_plans.py SUFFIX QUERY [QUERY ...] [--sf SF_DIR] [-o DIR]

Writes DIR/<query>_<SUFFIX>.txt for each query — the before/after plan
evidence the optimization rounds commit under plans/r<N>/.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix", help="file suffix, e.g. 'before' or 'after'")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-o", "--outdir", default="plans/r14")
    args = ap.parse_args()

    from datafusion_datasource_orc_spark.operators import QUERIES
    from datafusion_datasource_orc_spark.plans.pushdown import explain_formatted
    from datafusion_datasource_orc_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.queries:
        plan = explain_formatted(QUERIES[name](spark, args.sf))
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
