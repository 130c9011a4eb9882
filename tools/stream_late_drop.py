#!/usr/bin/env python
"""Watermark DROP-semantics measurement (r07 verdict item 3): the
other half of the watermark contract. tools/stream_scale.py measured
state and latency but recorded rows_dropped_late = 0 at every delay —
its 72-min-of-event-time triggers swallow the 30-min arrival jitter
inside one batch, and a row is only dropped when its WINDOW END falls
below the watermark (jitter must exceed window + delay). Here the
triggers are FINE (one file = 1 minute of event time, >= 100
triggers), so the jitter crosses many batch boundaries and a tight
delay actually drops rows — and the run then PROVES the drop
semantics: the append-mode (finalized-window) output must equal a
batch aggregation over exactly the rows the stream ADMITTED.

The admitted subset is reconstructed exactly, not approximated:
  * the file-source checkpoint log (<chk>/sources/0/<batch>) maps
    every input file to the trigger that consumed it;
  * query.recentProgress maps every trigger to the watermark that was
    in force while it ran;
  * a row is admitted iff window_end(ts) > watermark(trigger(file)).
Batch-aggregating the admitted rows per (window, type) and comparing
to the memory-sink append output (restricted to windows finalized
before end-of-stream) is a bit-level parity statement about WHAT the
watermark dropped, per delay.

Also runs the windowed_alerts append path (the r07 verdict's named
harness): same admitted-subset reconstruction, plus the stream-static
baseline join and threshold filter.

Output rows -> stream_late_drop.csv:
  workload,n_events,window,watermark,triggers,rows_total,
  rows_dropped_late,emitted_rows,finalized_batch_rows,parity_ok

Usage:
  python tools/stream_late_drop.py [--events 2000000] [--files 120]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPAN_MINUTES = 120  # 120 one-minute files: jitter spans ~30 triggers
N_TYPES = 8
N_USERS = 100_000
JITTER_MIN = 30


def gen_corpus(spark, path: str, n_events: int, n_files: int) -> None:
    from pyspark.sql import functions as F

    per = n_events // n_files
    block_s = SPAN_MINUTES * 60.0 / n_files
    for b in range(n_files):
        base = b * block_s
        (
            spark.range(per)
            .select(
                F.to_timestamp(
                    F.lit("2026-01-01 06:00:00").cast("timestamp")
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
        # the file source orders new files by modification time; set
        # mtimes to an explicit strictly increasing sequence so
        # trigger order == event-time block order even on filesystems
        # with coarse (1 s) mtime granularity, where a sleep-based
        # ordering ties arbitrarily and silently breaks the
        # alerts-vs-rollup same-admitted-subset assumption
        stamp = 1_700_000_000.0 + b
        for f in glob.glob(os.path.join(path, "*.parquet")):
            if os.path.getmtime(f) > stamp:
                os.utime(f, (stamp, stamp))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=SPAN_MINUTES)
    ap.add_argument("--out", default=os.path.join(REPO, "stream_late_drop.csv"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from query_refinement_dsit_databases_2021_spark.session import get_spark
    from query_refinement_dsit_databases_2021_spark.streaming import windows as W

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="stream_late_drop",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    path = f"/tmp/stream_late_drop/events_{args.events}_{args.files}"
    if not os.path.exists(path):
        t0 = time.time()
        gen_corpus(spark, path, args.events, args.files)
        print(f"# corpus {args.events} events in {time.time() - t0:.1f}s",
              flush=True)

    batch_all = spark.read.parquet(path)

    header = not os.path.exists(args.out)
    out = open(args.out, "a")
    if header:
        out.write(
            "workload,n_events,window,watermark,triggers,rows_total,"
            "rows_dropped_metric,rows_dropped_recon,emitted_rows,"
            "finalized_batch_rows,parity_ok\n"
        )

    def admitted_frame(chk: str, delay_ms: int):
        """Rows the stream admitted — the library operator
        `streaming.windows.admitted_events` (r08 verdict item 8 lifted
        this harness's reconstruction — file->batch log, L=1 watermark
        shift, offsets-log self-check — into the package; the harness
        now exercises the productized path)."""
        return W.admitted_events(
            batch_all, chk, delay_ms, "10 minutes", time_col="ts"
        )

    def run(name, mk, batch_from_admitted, watermark):
        chk = f"/tmp/stream_late_drop/chk_{name}_{watermark.replace(' ', '')}"
        shutil.rmtree(chk, ignore_errors=True)
        src = W.read_event_stream(spark, path, max_files_per_trigger=1)
        qname = f"sink_{name}_{watermark.replace(' ', '')}"
        q = (
            mk(src)
            .writeStream.format("memory")
            .queryName(qname)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        progress = [
            json.loads(p.json) if hasattr(p, "json") else p
            for p in (q.recentProgress or [])
        ]
        q.stop()
        # recentProgress caps at ~100 entries, so both numbers below
        # UNDERCOUNT on long runs; the reconstruction is authoritative
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in progress
            if p.get("stateOperators")
        )
        triggers = len(set(W.checkpoint_file_batches(chk).values()))
        final_wm_ms = max(
            W.checkpoint_batch_watermarks_ms(chk).values() or [0]
        )
        emitted = spark.table(qname)
        delay_ms = int(watermark.split()[0]) * 60_000
        # finalized windows only: append emits once window_end <= wm
        adm = admitted_frame(chk, delay_ms)
        # the RECONSTRUCTED drop count is the real one: the map-side
        # late filter (pre-shuffle twin of the state operator's) drops
        # most late rows WITHOUT incrementing
        # numRowsDroppedByWatermark — at the 100k smoke the metric
        # read 1,024 while the bit-exact reconstruction (and the
        # parity below) proves 54,830 rows were dropped. Both numbers
        # are recorded; trust the reconstruction.
        dropped_recon = args.events - adm.count()
        want = batch_from_admitted(adm).where(
            F.col("window_end") <= F.timestamp_millis(F.lit(final_wm_ms))
        )
        got_rows = sorted(tuple(r) for r in emitted.collect())
        want_rows = sorted(tuple(r) for r in want.collect())
        parity = got_rows == want_rows
        line = (
            f"{name},{args.events},10 minutes,{watermark},{triggers},"
            f"{args.events},{dropped},{dropped_recon},{len(got_rows)},"
            f"{len(want_rows)},{parity}"
        )
        out.write(line + "\n")
        out.flush()
        print("RESULT " + line, flush=True)
        if not parity:
            only_got = [r for r in got_rows if r not in want_rows][:5]
            only_want = [r for r in want_rows if r not in got_rows][:5]
            print(f"# PARITY FAIL got-only={only_got} want-only={only_want}",
                  flush=True)

    def rollup_batch(adm):
        return (
            adm.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "event_type",
                "n",
                "total_value",
            )
        )

    for wm in ("1 minutes", "5 minutes", "31 minutes"):
        run(
            "windowed_rollup_append",
            lambda s, w=wm: W.windowed_rollup(s, watermark=w),
            rollup_batch,
            wm,
        )

    # the alerts append path (r07 verdict's named harness). The
    # baseline must come from ADMITTED-scale history, not the full
    # corpus: at a 5-min watermark the stream drops ~55% of this
    # corpus's rows (30-min jitter), so full-corpus thresholds sit
    # far above every admitted total and no alert can ever fire —
    # vacuous parity. Production detectors refresh thresholds from
    # what the pipeline actually INGESTED; here that history is the
    # reconstructed admitted frame of the 5-min rollup run (its
    # checkpoint is still on disk), with z10=0 (threshold = per-type
    # mean — partial edge windows blow up sigma at this corpus size).
    # The trigger order (file mtimes) and watermark sequence are
    # deterministic, so the alerts run admits the SAME subset.
    rollup_chk = "/tmp/stream_late_drop/chk_windowed_rollup_append_5minutes"
    baseline = W.type_baseline(
        admitted_frame(rollup_chk, 5 * 60_000).select(
            "ts", "event_type", "value"
        ),
        z10=0,
    ).persist()
    baseline.count()

    def alerts_batch(adm):
        win = F.window("ts", W.ALERT_WINDOW)
        totals = adm.groupBy(win.alias("w"), "event_type").agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents")
        )
        return (
            totals.join(F.broadcast(baseline), "event_type")
            .where(F.col("total_cents") > F.col("thr_cents"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "total_cents",
                "thr_cents",
            )
        )

    def alerts_stream(s):
        win = F.window("ts", W.ALERT_WINDOW)
        totals = (
            s.withWatermark("ts", "5 minutes")
            .groupBy(win.alias("w"), "event_type")
            .agg(
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("total_cents")
            )
        )
        return totals.join(F.broadcast(baseline), "event_type").where(
            F.col("total_cents") > F.col("thr_cents")
        ).select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "total_cents",
            "thr_cents",
        )

    run("windowed_alerts_append", alerts_stream, alerts_batch, "5 minutes")

    out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
