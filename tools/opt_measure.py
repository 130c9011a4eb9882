"""Round-9 optimization measurement harness.

Times workloads exactly as bench.py does (count() action, caches
cleared per pass, median+min of --repeat) AND captures
``explain('formatted')`` per workload into plans/r09/<name>_<tag>.txt
so before/after plan shapes are committed evidence.

Usage:
    python tools/opt_measure.py --tag before [--names a,b,c] [--repeat 3]
                                [--sf-dir /root/testdata/sf0.1] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import FROZEN_24, PREBUILD_NAMES  # noqa: E402


def explain_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="plan file suffix (before/after)")
    ap.add_argument("--names", default=None)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--plans-dir", default="r10", help="plans/<dir> for captures")
    ap.add_argument("--out", default=None, help="optional json output path")
    args = ap.parse_args()

    from query_refinement_dsit_databases_2021_spark.session import get_spark
    from query_refinement_dsit_databases_2021_spark.workloads import (
        register_views,
        workloads,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="qr_opt_measure", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    all_w = workloads()
    names = args.names.split(",") if args.names else list(FROZEN_24)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.plans_dir,
    )
    os.makedirs(plans_dir, exist_ok=True)

    # same warm-up discipline as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_views(spark, args.sf_dir)
    spark.table("lineitem").limit(1000).count()
    all_w["cp_filter_avg"].fn(spark, args.sf_dir).count()
    spark.catalog.clearCache()
    for name in PREBUILD_NAMES:
        if name in names and name in all_w:
            spark.catalog.clearCache()
            all_w[name].fn(spark, args.sf_dir).count()
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.repeat):
        for name in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"opt_measure:{name}")
            t0 = time.time()
            df = all_w[name].fn(spark, args.sf_dir)
            n = df.count()
            dt = time.time() - t0
            samples[name].append(dt)
            print(f"# pass {rep+1}/{args.repeat} {name}: {dt:.3f}s ({n} rows)",
                  file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
            if rep == 0 and not args.no_plans:
                try:
                    plan = explain_str(df)
                except Exception as exc:  # plan capture must never fail the run
                    plan = f"<explain failed: {exc}>"
                with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)

    med = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    mn = {n: round(min(ts), 3) for n, ts in samples.items()}
    out = {
        "tag": args.tag,
        "repeat": args.repeat,
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "median": med,
        "min": mn,
        "total_median": round(sum(med.values()), 3),
        "total_min": round(sum(mn.values()), 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
