#!/usr/bin/env python
"""Benchmark driver: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Per-query time is wall-clock for plan + execution to a count/collect
action (results are not retained). Caches are cleared between queries
so each measures its own full pipeline.

Min+median-of-N protocol (r06 verdict item 2): this machine's ambient
swing is large (15-43 s totals on identical code, BASELINE.md), so a
single run is noise and even a median-of-3 left three >30% per-query
swings unadjudicable in r06. Each query is timed ``--repeat`` times
(default 5, round-robin across the whole suite so repeats of one query
never ride the same transient); the reported per-query number is the
MEDIAN and the final line ALSO carries the per-query MIN ("queries_min"
/ "value_min") — with caches cleared per pass the min is the
low-ambient estimate and is far more comparable across rounds.
``spread`` carries per-query min/max for honesty. For code-change
adjudication, ``tools/bench_ab.py`` interleaves this HEAD against a
reference commit query-by-query in one session (ambient cancels); its
committed summary is echoed on the final line as ``ab`` when present.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The COMPARABLE set is FROZEN at its r06 composition (r05 verdict
# item 10): exactly these 24 names feed "queries"/"value" so
# successive rounds diff totals directly. New tripwires join
# EXTRA_BENCH below — timed identically but reported on the
# separate extras channel, never in the frozen total. Module-level so
# tools/bench_ab.py drives the IDENTICAL set on both sides.
FROZEN_24 = (
    # 20 headline workloads (flag-derived set as of r06, pinned)
    "cp_filter_avg",
    "cp_refined_tighten",
    "cp_refined_relax",
    "cp_three_constraints",
    "cp_scale_avg_tighten",
    "cp_scale_three",
    "sql_q1_pricing",
    "sql_q3_topk_join",
    "sql_q5_local_supplier",
    "sql_window_running",
    "sql_events_rollup",
    "pipe_dedup_minhash_lsh",
    "pipe_dedup_ngram_jaccard",
    "pipe_dsir_importance",
    "pipe_ann_cosine_topk",
    "pipe_ann_ivfpq",
    "pipe_ann_ivfpq_serve",
    "pipe_search_tfidf",
    "stream_windowed_rollup",
    "ops_sessionize",
    # 4 r05 tripwires (paths with no other throughput number)
    "cp_ext_median_pandas",  # applyInPandas strategy-P kernel
    "ts_anomaly_mad",  # exact-median sort aggregate
    "pipe_unigram_segment",  # mapInPandas Viterbi DP (Arrow path)
    "graph_pagerank",  # iterative driver loop (r04 verdict item 7)
)

# one-time artifacts forced before any timed pass (see prebuild below)
PREBUILD_NAMES = ("pipe_ann_ivfpq_serve", "pipe_dedup_minhash_index")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_REPEAT", "5")),
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
    frozen_24 = FROZEN_24
    # drift tripwire: a headline-flag change that is NOT a deliberate
    # re-freeze of the comparable set must fail here, loudly
    flagged = {n for n, w in all_w.items() if w.headline}
    assert flagged <= set(frozen_24), (
        f"headline flags drifted outside the frozen r06 set: "
        f"{sorted(flagged - set(frozen_24))} — either drop the flag or "
        f"deliberately re-freeze frozen_24 AND note it in BASELINE.md"
    )
    # new tripwires (r06+): timed the same way, reported separately
    extra_bench = tuple(
        n
        for n in ("pipe_dedup_minhash_index",)
        if n in all_w and n not in frozen_24
    )
    names = list(frozen_24) + list(extra_bench)

    # untimed warm-up: session/JIT/codegen init and parquet footer reads
    # are one-time costs, not part of any query's steady-state time
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_views(spark, sf_dir)
    spark.table("lineitem").limit(1000).count()
    all_w["cp_filter_avg"].fn(spark, sf_dir).count()
    spark.catalog.clearCache()

    # One-time artifact builds (IVF-PQ layout, standing MinHash index)
    # are forced HERE, before any timed pass, and timed on their own
    # channel (r05 verdict item 6: the ivfpq_serve build leaking into
    # rep 1 made median 3.09 s / max 16.29 s — a phantom-regression
    # trap). After this loop every timed rep measures the pure serving
    # path; `prebuild_first_call` on the detail line carries the
    # build+first-serve cost (≈serve when the artifact already existed
    # from a prior run of the same data).
    prebuild: dict[str, float] = {}
    for name in PREBUILD_NAMES:
        if name not in all_w:
            continue
        spark.catalog.clearCache()
        t0 = time.time()
        all_w[name].fn(spark, sf_dir).count()
        prebuild[name] = round(time.time() - t0, 3)
        print(
            f"# prebuild {name}: {prebuild[name]:.3f}s", file=sys.stderr
        )
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
    mins = {n: round(min(ts), 3) for n, ts in samples.items()}
    spread = {
        n: [round(min(ts), 3), round(max(ts), 3)] for n, ts in samples.items()
    }
    extras = {n: times.pop(n) for n in extra_bench}
    extras_min = {n: mins.pop(n) for n in extra_bench}
    total = round(sum(times.values()), 3)
    total_min = round(sum(mins.values()), 3)

    # Echo the committed same-session A/B adjudication (tools/
    # bench_ab.py writes bench_ab_summary.json) so the recorded bench
    # line carries the code-vs-ambient verdict for this HEAD. The
    # object names both commits and the run date — it is a record of
    # the interleaved A/B session, not of this timing run.
    ab = None
    ab_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_ab_summary.json"
    )
    if os.path.exists(ab_path):
        try:
            with open(ab_path) as fh:
                ab = json.load(fh)
        except (OSError, ValueError):
            ab = None
    # A committed summary from an EARLIER commit must not ride along
    # as if it adjudicated this HEAD: mark it stale when its cur sha
    # is not the sha being benchmarked (r07 advice item).
    if ab is not None:
        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        except (OSError, subprocess.CalledProcessError):
            head = None
        # prefix match, not equality: --short abbreviation length can
        # grow with the object count between when the A/B summary was
        # written and now, which would falsely mark the same commit
        # stale
        cur = ab.get("cur")
        same = bool(
            head
            and isinstance(cur, str)
            and cur
            and (cur.startswith(head) or head.startswith(cur))
        )
        if head and not same:
            ab["stale"] = True
            ab["stale_note"] = f"ab ran at {cur}, HEAD is {head}"
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
                "extras": extras,  # new tripwires, NOT in the frozen total
                "extras_min": extras_min,
                "prebuild_first_call": prebuild,
            }
        )
    )
    final = {
        "metric": "headline_workloads_total_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,  # per-query MEDIAN over `repeat` passes
        "value_min": total_min,
        "queries_min": mins,  # per-query MIN — the low-ambient estimate
        "sf": sf,
        "cpus": cpus,
    }
    if ab is not None:
        final["ab"] = ab
    print(json.dumps(final))


if __name__ == "__main__":
    main()
