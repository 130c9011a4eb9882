#!/usr/bin/env python
"""Scalability harness — the Spark analogue of the reference's
scalability experiment (reference:src/scalability_experiment_scipt.py:11-53).

Methodology reproduced: parse the 3-constraint query once, then loop —
execute, record per-stage wall times and ``udf_size`` (the candidate
count, reference:src/server.py:37), grow one domain's upper bound by
+20 alternating between the time_id and offset domains, stop at the
series edge or --max-iters. Emits one CSV row per iteration (the
reference writes one timer CSV per run; one file with an iter column
is the same data).

Usage::

    python scalability.py [--rows 20000] [--max-iters 12] \
        [--out scalability.csv] [--cpus 8]
"""

from __future__ import annotations

import argparse
import csv
import sys
import time

sys.path.insert(0, ".")

from query_refinement_dsit_databases_2021_spark import Engine, get_spark
from query_refinement_dsit_databases_2021_spark.plans.spec import (
    ConstraintSpec,
    QuerySpec,
)


def base_spec(x_hi: int, lx_hi: int, measure: str = "native") -> QuerySpec:
    # reference:src/scalability_experiment_scipt.py:12-19 shape, on the
    # synthetic series (values ~N(50,...)-ish sine blend).
    # measure="median" swaps the constraint set for a single median_amp
    # constraint — the non-native measure that forces strategy P (the
    # Arrow applyInPandas escape hatch), so its per-candidate cost can
    # be curved against the native strategies on identical domains.
    if measure == "median":
        constraints = (
            ConstraintSpec("median_amp", (), 40.0, 60.0, "maximization"),
        )
    else:
        constraints = (
            ConstraintSpec("avg_amp", (), 40.0, 60.0, "maximization"),
            ConstraintSpec("max_amp_excess_left", (4,), -2.0, 0.0, "maximization"),
            ConstraintSpec("max_amp_excess_right", (4,), -2.0, 0.0, "maximization"),
        )
    return QuerySpec(
        table="series",
        column="y",
        x_domain=(1, x_hi),
        lx_domain=(5, lx_hi),
        constraints=constraints,
        cardinality=50,
        refined=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--max-iters", type=int, default=12)
    ap.add_argument("--out", default="scalability.csv")
    ap.add_argument("--cpus", type=int, default=8)
    # reference methodology grows both domains +20/iteration; at large
    # --rows that keeps the candidate count trivial and fixed planning
    # cost dominates (the committed 20k curve is flat for this reason).
    # These steps let a big-N run push udf_size into the regime where
    # data cost is visible without changing the default methodology.
    ap.add_argument("--grow-x", type=int, default=20)
    ap.add_argument("--grow-lx", type=int, default=20)
    ap.add_argument(
        "--measure",
        choices=("native", "median"),
        default="native",
        help="'median' runs a median_amp constraint (non-native -> "
        "strategy P, the Arrow applyInPandas path) on the same domains",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="qr-scalability",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # generate distributed (spark.range + JVM sin), NOT a driver-side
    # python list: at --rows 20M the list is multi-GB on the driver —
    # the exact anti-pattern the engine exists to avoid. Same formula
    # as the original harness (values ~N(50,...)-ish sine blend).
    from pyspark.sql import functions as F

    i = F.col("id").cast("double")
    series = spark.range(1, args.rows + 1).select(
        F.col("id").alias("time_id"),
        (
            F.lit(50.0)
            + F.lit(30.0) * F.sin(i / F.lit(11.0))
            + F.lit(10.0) * F.sin(i / F.lit(3.0))
        ).alias("y"),
    )
    engine = Engine(spark)
    engine.register_series("series", series)

    # warm-up (not recorded)
    engine.execute(base_spec(10, 10, args.measure))

    x_hi, lx_hi = 10, 10
    out_rows = []
    # write incrementally: a crash mid-curve (e.g. disk-full on a
    # 194M-candidate shuffle spill, r08) must not lose finished iters
    fields = [
        "iter", "x_hi", "lx_hi", "udf_size", "strategy", "action",
        "n_results", "seconds",
    ]
    f_out = open(args.out, "w", newline="")
    w = csv.DictWriter(f_out, fieldnames=fields)
    w.writeheader()
    for it in range(args.max_iters):
        spec = base_spec(x_hi, lx_hi, args.measure)
        t0 = time.time()
        n = engine.execute(spec).count()
        wall = time.time() - t0
        info = engine.last_info
        out_rows.append(
            {
                "iter": it,
                "x_hi": x_hi,
                "lx_hi": lx_hi,
                "udf_size": info.udf_size,
                "strategy": info.strategy,
                "action": info.action,
                "n_results": n,
                "seconds": round(wall, 3),
            }
        )
        w.writerow(out_rows[-1])
        f_out.flush()
        print(
            f"iter={it} udf_size={info.udf_size} strategy={info.strategy} "
            f"action={info.action} n={n} t={wall:.2f}s",
            file=sys.stderr,
        )
        # grow domains alternating (reference:...scipt.py:44-51; step
        # sizes configurable, default +20/+20 = the reference's)
        if it % 2 == 0:
            x_hi = min(x_hi + args.grow_x, args.rows)
        else:
            lx_hi += args.grow_lx
        if x_hi >= args.rows:
            break

    f_out.close()
    print(f"wrote {args.out} ({len(out_rows)} iterations)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
