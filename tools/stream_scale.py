#!/usr/bin/env python
"""Streaming scale evidence (r06 verdict item 6): drive the two
stateful streaming workloads with a rate-limited file source at 1M+
events and RECORD state-store size and trigger latency vs watermark
delay — turning the batch-parity-certified `stream_*` plans into
measured streaming behavior.

What runs (real `readStream` file source, `maxFilesPerTrigger`-rate-
limited, noop sink, metrics from `query.recentProgress`):
  * `windowed_rollup` — event-time windowed agg; state = open
    (window, type) groups. Watermark delay sweep shows the state
    plateau: a longer delay keeps more windows open.
  * `dedup_within_watermark` — streaming dedup; state = first-seen
    keys inside the watermark horizon; the sweep shows state tracking
    the distinct-key count vs being reclaimed.

Corpus: N events over SPAN_HOURS of event time, K event types,
U users, with up to JITTER_MIN minutes of out-of-order arrival
(late data is the point of a watermark). Files are written in
event-time block order so the watermark advances realistically.

Output: stream_scale.csv rows:
  workload,n_events,watermark,triggers,trigger_p50_ms,trigger_max_ms,
  state_rows_final,state_rows_max,rows_dropped_late,out_rows

Usage:
  python tools/stream_scale.py [--events 2000000] [--files 100]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPAN_HOURS = 24
N_TYPES = 8
N_USERS = 100_000
JITTER_MIN = 30


def gen_corpus(spark, path: str, n_events: int, n_files: int) -> None:
    from pyspark.sql import functions as F

    per = n_events // n_files
    span_s = SPAN_HOURS * 3600
    block_s = span_s / n_files
    for b in range(n_files):
        base = b * block_s
        (
            spark.range(per)
            .select(
                F.to_timestamp(
                    F.lit("2026-01-01 00:00:00").cast("timestamp")
                    + F.make_dt_interval(
                        F.lit(0), F.lit(0), F.lit(0),
                        F.lit(base)
                        + F.rand(b) * F.lit(block_s)
                        - F.rand(b + 1000) * F.lit(JITTER_MIN * 60.0),
                    )
                ).alias("ts"),
                (F.col("id") + b * per).alias("event_id"),
                F.floor(F.rand(b + 2000) * N_USERS).cast("long").alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(f"type{i}") for i in range(N_TYPES)]),
                    (F.floor(F.rand(b + 3000) * N_TYPES) + 1).cast("int"),
                ).alias("event_type"),
                F.round(F.rand(b + 4000) * 100, 2).alias("value"),
                F.lit("{}").alias("props"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )


def drive(spark, stream_df, name: str, files_per_trigger: int):
    """Run a streaming frame to completion on the file source and
    return (per-trigger metrics list, total output rows)."""
    q = (
        stream_df.writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/stream_scale/chk_{name}_{time.time():.0f}")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    prog = [p for p in (q.recentProgress or []) if p is not None]
    q.stop()
    return prog


def summarize(prog):
    trig = [
        p["durationMs"].get("triggerExecution", 0)
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    state_rows = [
        (p["stateOperators"][0].get("numRowsTotal", 0) if p.get("stateOperators") else 0)
        for p in prog
    ]
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in prog
        if p.get("stateOperators")
    )
    out_rows = sum(
        p["sink"].get("numOutputRows", 0) for p in prog if p.get("sink")
    )
    return {
        "triggers": len(trig),
        "trigger_p50_ms": int(statistics.median(trig)) if trig else 0,
        "trigger_max_ms": max(trig) if trig else 0,
        "state_rows_final": state_rows[-1] if state_rows else 0,
        "state_rows_max": max(state_rows) if state_rows else 0,
        "rows_dropped_late": dropped,
        "out_rows": out_rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--files-per-trigger", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "stream_scale.csv"))
    args = ap.parse_args()

    from query_refinement_dsit_databases_2021_spark.session import get_spark
    from query_refinement_dsit_databases_2021_spark.streaming import windows as W

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="stream_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    path = f"/tmp/stream_scale/events_{args.events}"
    if not os.path.exists(path):
        t0 = time.time()
        gen_corpus(spark, path, args.events, args.files)
        print(f"# corpus {args.events} events in {time.time() - t0:.1f}s",
              flush=True)

    header = not os.path.exists(args.out)
    out = open(args.out, "a")
    if header:
        out.write(
            "workload,n_events,watermark,triggers,trigger_p50_ms,"
            "trigger_max_ms,state_rows_final,state_rows_max,"
            "rows_dropped_late,out_rows\n"
        )

    def run(name, mk, watermark):
        src = W.read_event_stream(
            spark, path, max_files_per_trigger=args.files_per_trigger
        )
        prog = drive(spark, mk(src), f"{name}_{watermark.replace(' ', '')}",
                     args.files_per_trigger)
        s = summarize(prog)
        line = (
            f"{name},{args.events},{watermark},{s['triggers']},"
            f"{s['trigger_p50_ms']},{s['trigger_max_ms']},"
            f"{s['state_rows_final']},{s['state_rows_max']},"
            f"{s['rows_dropped_late']},{s['out_rows']}"
        )
        out.write(line + "\n")
        out.flush()
        print("RESULT " + line, flush=True)

    for wm in ("10 minutes", "2 hours", "48 hours"):
        run("windowed_rollup", lambda s, w=wm: W.windowed_rollup(s, watermark=w), wm)
    for wm in ("1 hour", "48 hours"):
        run(
            "dedup_keys",
            lambda s, w=wm: W.dedup_within_watermark(s, watermark=w),
            wm,
        )

    out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
