"""Benchmark harness — the tpcds_bench.rs equivalent (SURVEY.md §2A-A21).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], N iterations each (reference default 3,
src/bin/tpcds_bench.rs:277-279; we use best-of to factor out JIT/session
warmup like criterion's sampling does), and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Query timing = full execution to collect() (driver-side materialization,
matching the reference's collect at src/bin/tpcds_bench.rs:543-574).
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# best-of-N absorbs codegen warm-up AND the shared-host load spikes observed
# on this box (same query: 3.6s-90s wall clock under external load)
ITERATIONS = int(os.environ.get("BENCH_ITERATIONS", "3"))

# Headline set: the reference's demonstrated core (scan/filter/agg/groupby via
# the ORC path), the join/window/TPC-H analytical surface, and one of each
# beyond-reference pipeline family.
HEADLINE = [
    "orc_groupby_count",
    "orc_filter_range",
    "orc_count_star",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q8",
    "tpch_q9",
    "tpch_q18",
    "tpch_q21",
    "tpcds_q1",
    "tpcds_q7",
    "tpcds_q12",
    "tpcds_q36",
    "tpcds_q59",
    "tpcds_q65",
    "tpcds_q98",
    "tpcds_q14",
    "tpcds_q64",
    "window_rank",
    "window_ntile",
    "rollup_agg",
    "dedup_exact_norm",
    "dedup_minhash_lsh",
    "simsearch_bruteforce",
    "text_token_count",
    "text_repetition",
    "contamination_eval_overlap",
    "pipeline_filter_funnel",
    "training_mix_sample",
    "text_char_entropy",
    "events_tumbling_window",
    "events_session_window",
    "events_zscore_anomaly",
    "asof_join_last_order",
    "basket_part_pairs",
    "multimodal_batch_packing",
    # round 5 additions
    "multimodal_decode",
    "simsearch_pq",
    "text_ngram_novelty",
    "training_pack_sequences",
    "text_vocab_coverage",
    # round 6 additions
    "ingest_incremental_bloom",
    "orc_column_stats",
    "embedding_power_iteration",
    "multimodal_resize",
    # round 7 additions
    "orc_rowgroup_stats",
    "orc_bloom_prune",
    "text_bigram_commonness",
    "simsearch_ivfpq",
    "embedding_kmeans",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_datasource_orc_spark.session import get_spark
    from datafusion_datasource_orc_spark.operators import QUERIES
    from datafusion_datasource_orc_spark.sources.tables import orc_dir_for

    spark = get_spark(app_name="bench")

    # Pre-materialize ORC tables outside the timed region (the reference's
    # data-prep step, scripts/convert_tpcds_to_orc.py, is likewise untimed).
    for t in ("region", "part", "lineitem", "documents"):
        orc_dir_for(spark, sf_dir, t)
    # Same for the derived TPC-DS star schema: the reference materializes all
    # 24 tables before benchmarking, so the first tpcds query's cold time
    # should measure the query, not the one-time table writes.
    from datafusion_datasource_orc_spark.operators.tpcds import _register_tpcds_views

    _register_tpcds_views(spark, sf_dir)

    results: dict[str, float] = {}
    iterations: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        times: list[float] = []
        rows = -1
        for _ in range(ITERATIONS):
            t0 = time.perf_counter()
            rows = len(fn(spark, sf_dir).collect())
            times.append(round(time.perf_counter() - t0, 4))
        # headline value stays best-of-N (absorbs codegen warm-up), but every
        # iteration is recorded so host-load spikes are separable from real
        # regressions when BENCH artifacts are compared across rounds
        results[name] = min(times)
        iterations[name] = times
        print(f"# {name}: {min(times):.3f}s rows={rows} iters={times}", file=sys.stderr)

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Cold/warm split (judge r04 task 4): iteration 0 carries codegen +
    # session warm-up; the warm median is the steady-state signal a repeated
    # production query sees. `queries` stays best-of-N for cross-round
    # comparability with BENCH_r01-r04.
    cold = {n: its[0] for n, its in iterations.items()}
    warm = {
        n: round(statistics.median(its[1:]), 4) if len(its) > 1 else its[0]
        for n, its in iterations.items()
    }

    # The driver records only the LAST 2000 chars of stdout and parses the
    # JSON line out of that window (BENCH_r02/r04 carried per-query
    # iteration dicts, overflowed it, and recorded parsed=null). The stdout
    # line therefore stays compact — per-query cold/warm/iteration detail
    # and the full regression ratio table go to a committed sidecar.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )

    # Tolerance-checked regression table vs the previous committed BENCH
    # artifact: a real plan regression is a per-query outlier (>1.5x AND
    # >0.5s absolute on best-basis); uniform host drift moves the geometric
    # mean ratio of ALL common queries without tripping per-query flags.
    # sort by NUMERIC round (not lexicographic) so an unpadded BENCH_r9.json
    # or round >= 100 still picks the true newest artifact as baseline
    def _round_no(path: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    prev_art = sorted(
        glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")
        ),
        key=_round_no,
    )
    regression: dict[str, object] = {}
    ratios: dict[str, float] = {}
    if prev_art:
        try:
            # newest artifact whose JSON actually parsed: the driver artifact
            # shape is {"parsed": {...the one-line JSON...}, ...} with
            # parsed=null when the line overflowed its 2000-char stdout tail
            # (BENCH_r02/r04); a bare local run is the line itself
            prev_q: dict[str, float] = {}
            baseline_name = None  # stays None unless a same-sf baseline parses
            for path in reversed(prev_art):
                with open(path) as f:
                    prev = json.load(f)
                parsed = prev.get("parsed") or prev
                # only compare same-scale runs: a cross-sf baseline would
                # flag pure data-size effects as plan regressions
                prev_sf = parsed.get("sf", prev.get("sf"))
                if str(prev_sf) != str(sf_val):
                    continue
                prev_q = parsed.get("queries") or {}
                if prev_q:
                    baseline_name = os.path.basename(path)
                    break
            common = sorted(set(prev_q) & set(results))
            ratios = {
                n: round(results[n] / prev_q[n], 3) for n in common if prev_q[n] > 0
            }
            # flag = likely plan regression. Thresholds sized to this host's
            # observed noise: back-to-back identical-code runs swing
            # sub-second queries by 1.5-1.8x (+/-0.4s), so both a large
            # ratio AND a >0.5s absolute delta are required.
            flagged = {
                n: r
                for n, r in ratios.items()
                if r > 1.5 and results[n] - prev_q[n] > 0.5
            }
            geomean = (
                round(statistics.geometric_mean(ratios.values()), 3) if ratios else None
            )
            regression = {
                "vs": baseline_name,
                "n": len(common),
                "geomean": geomean,
                "flagged": flagged,
            }
            # self-annotate: when the WHOLE common set drifted, per-query
            # flags are most likely load artifacts, not plan regressions —
            # a real plan regression is an outlier against a stable field
            if geomean and geomean > 1.25 and flagged:
                regression["note"] = (
                    "geomean ratio is uniformly elevated; flags are likely "
                    "host-load artifacts — re-run on an idle box before "
                    "treating them as plan regressions"
                )
            print(
                f"# regression vs {regression['vs']}: geomean ratio {geomean} over "
                f"{len(common)} common queries, {len(flagged)} flagged"
                + (
                    " (uniform drift = host load, flagged outlier = plan regression)"
                    if common
                    else ""
                ),
                file=sys.stderr,
            )
        except (OSError, ValueError, KeyError, AttributeError) as exc:
            regression = {"error": f"{type(exc).__name__}: {exc}"}

    with open(detail_path, "w") as f:
        json.dump(
            {
                "sf": sf_val,
                "iterations": iterations,
                "queries_cold": cold,
                "queries_warm_median": warm,
                "cold_total": round(sum(cold.values()), 4),
                "warm_total": round(sum(warm.values()), 4),
                "regression_ratios_vs_prev": ratios,
                "regression_summary": regression,
            },
            f,
            indent=1,
        )

    # Stdout line carries SCALARS ONLY for the regression block: the driver
    # parses the JSON out of the last 2000 chars of stdout, and an unbounded
    # flagged-query dict + note can overflow that window (the BENCH_r02/r04
    # parsed=null failure). The full flagged table and note live in
    # bench_detail.json.
    regression_compact = {
        k: regression[k] for k in ("vs", "n", "geomean", "error") if k in regression
    }
    if "flagged" in regression:
        regression_compact["n_flagged"] = len(regression["flagged"])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_best_of_%d" % ITERATIONS,
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "cold_total": round(sum(cold.values()), 4),
                "warm_total": round(sum(warm.values()), 4),
                "regression_vs_prev": regression_compact,
                "detail": "bench_detail.json",
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
