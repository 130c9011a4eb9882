#!/usr/bin/env python
"""Benchmark driver: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Per-query time is wall-clock for plan + execution to a count/collect
action (results are not retained). Caches are cleared between queries
so each measures its own full pipeline.

Median-of-N protocol: this machine's ambient swing is large (15-43 s
totals on identical code, BASELINE.md), so a single run is noise.
Each query is timed ``--repeat`` times (default 3, round-robin across
the whole suite so repeats of one query never ride the same transient)
and the reported per-query number is the MEDIAN; ``value`` is the sum
of medians. ``spread`` carries per-query min/max for honesty.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_REPEAT", "3")),
        help="timed passes per query; reported time is the median",
    )
    args = parser.parse_args()
    repeat = max(1, args.repeat)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from query_refinement_dsit_databases_2021_spark.session import get_spark
    from query_refinement_dsit_databases_2021_spark.workloads import workloads

    spark = get_spark(
        app_name="qr_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    all_w = workloads()
    # non-headline workloads benched anyway: regression tripwires for
    # paths with no other recorded throughput number (the Arrow
    # applyInPandas escape hatch behind strategy P)
    extra_bench = (
        "cp_ext_median_pandas",  # applyInPandas strategy-P kernel
        "ts_anomaly_mad",  # exact-median sort aggregate
        "pipe_unigram_segment",  # mapInPandas Viterbi DP (Arrow path)
        "graph_pagerank",  # iterative driver loop (r04 verdict item 7)
    )
    names = [n for n, w in all_w.items() if w.headline] + [
        n for n in extra_bench if not all_w[n].headline
    ]

    # untimed warm-up: session/JIT/codegen init and parquet footer reads
    # are one-time costs, not part of any query's steady-state time
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_views(spark, sf_dir)
    spark.table("lineitem").limit(1000).count()
    all_w["cp_filter_avg"].fn(spark, sf_dir).count()
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    for rep in range(repeat):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.time()
            df = all_w[name].fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            samples[name].append(dt)
            rows[name] = n
            print(
                f"# pass {rep + 1}/{repeat} {name}: {dt:.3f}s ({n} rows)",
                file=sys.stderr,
            )

    times = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    spread = {
        n: [round(min(ts), 3), round(max(ts), 3)] for n, ts in samples.items()
    }
    total = round(sum(times.values()), 3)
    # Detail (spread/rows) goes on a PRECEDING line: the driver tails
    # stdout for ONE machine-readable JSON line, and the r04 combined
    # payload (~2.9 KB) overflowed its capture -> BENCH_r04 parsed:null
    # (r04 verdict item 2). The LAST line stays compact.
    print(
        json.dumps(
            {
                "detail": "per_query_spread_and_rows",
                "spread": spread,
                "rows": rows,
                "repeat": repeat,
                "aggregation": "median",
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_workloads_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,  # per-query MEDIAN over `repeat` passes
                "sf": sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
