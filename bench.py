#!/usr/bin/env python
"""Benchmark driver: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Per-query time is wall-clock for plan + execution to a count/collect
action (results are not retained). Caches are cleared between queries
so each measures its own full pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
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
    names = [n for n, w in all_w.items() if w.headline]

    # untimed warm-up: session/JIT/codegen init and parquet footer reads
    # are one-time costs, not part of any query's steady-state time
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_views(spark, sf_dir)
    spark.table("lineitem").limit(1000).count()
    all_w["cp_filter_avg"].fn(spark, sf_dir).count()
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        df = all_w[name].fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_workloads_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
