"""One-rep wall-clock sweep of the FULL workload registry.

Straggler finder for optimization rounds: times every registered
workload once (bench.py's count() action, cache cleared per workload)
and prints a sorted table. Not a benchmark — a triage instrument.

Usage:
    python tools/registry_sweep.py [--sf-dir /root/testdata/sf0.1]
                                   [--out /tmp/sweep.json] [--skip a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PREBUILD_NAMES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip", default="")
    ap.add_argument("--names", default=None)
    args = ap.parse_args()

    from query_refinement_dsit_databases_2021_spark.session import get_spark
    from query_refinement_dsit_databases_2021_spark.workloads import (
        register_views,
        workloads,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="qr_registry_sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    all_w = workloads()
    skip = {s for s in args.skip.split(",") if s}
    names = (
        args.names.split(",") if args.names else [n for n in all_w if n not in skip]
    )

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_views(spark, args.sf_dir)
    spark.table("lineitem").limit(1000).count()
    for name in PREBUILD_NAMES:
        if name in names:
            spark.catalog.clearCache()
            all_w[name].fn(spark, args.sf_dir).count()

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.time()
        try:
            all_w[name].fn(spark, args.sf_dir).count()
            results[name] = round(time.time() - t0, 3)
        except Exception:
            errors[name] = traceback.format_exc(limit=3)
            results[name] = round(time.time() - t0, 3)
        print(f"[{i + 1}/{len(names)}] {name}: {results[name]:.2f}s"
              + ("  ERROR" if name in errors else ""), flush=True)

    print("\n=== slowest 40 ===")
    for name, sec in sorted(results.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{sec:8.2f}  {name}")
    if errors:
        print(f"\n=== {len(errors)} errors ===")
        for name, tb in errors.items():
            print(name, tb.splitlines()[-1])
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "cpus": cpus, "sec": results,
                       "errors": list(errors)}, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
