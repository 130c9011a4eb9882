#!/usr/bin/env python
"""Timing worker for tools/bench_ab.py — hosts ONE SparkSession over
ONE checkout of the repo and times workloads on command.

Protocol (line-oriented, stdin → stdout, one response per command):

    WARM                 → ``READY`` after session + view warm-up
    PREBUILD <name>      → ``OK <name> <secs> <rows>`` (untimed-channel
                           one-time artifact build, same role as the
                           prebuild loop in bench.py)
    TIME <name>          → ``OK <name> <secs> <rows>``
    EXIT                 → ``BYE`` and exit

The workload registry is imported from ``--repo`` (sys.path), so the
SAME worker script can drive two different checkouts — the A/B parent
runs one worker per commit and alternates TIME commands between them,
which is what cancels ambient load. Any per-command exception returns
``ERR <name> <message>`` instead of killing the worker.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True, help="checkout to import from")
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--label", default="worker")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    os.chdir(args.repo)

    from query_refinement_dsit_databases_2021_spark.session import get_spark
    from query_refinement_dsit_databases_2021_spark.workloads import (
        register_views,
        workloads,
    )

    spark = get_spark(
        app_name=f"qr_bench_ab_{args.label}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    all_w = workloads()

    def emit(line: str) -> None:
        sys.stdout.write(line + "\n")
        sys.stdout.flush()

    for raw in sys.stdin:
        cmd, _, name = raw.strip().partition(" ")
        if cmd == "EXIT":
            emit("BYE")
            break
        if cmd == "WARM":
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            register_views(spark, args.sf_dir)
            spark.table("lineitem").limit(1000).count()
            all_w["cp_filter_avg"].fn(spark, args.sf_dir).count()
            spark.catalog.clearCache()
            emit("READY")
            continue
        if cmd in ("TIME", "PREBUILD"):
            try:
                spark.catalog.clearCache()
                t0 = time.time()
                n = all_w[name].fn(spark, args.sf_dir).count()
                dt = time.time() - t0
                emit(f"OK {name} {dt:.3f} {n}")
            except Exception as exc:  # keep the session alive for the rest
                emit(f"ERR {name} {type(exc).__name__}: {exc}".replace("\n", " "))
            continue
        emit(f"ERR _ unknown command {cmd!r}")


if __name__ == "__main__":
    main()
