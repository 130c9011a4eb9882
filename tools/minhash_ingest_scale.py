#!/usr/bin/env python
"""Steady-state MinHash ingest at scale: build the standing index ONCE
over the 10M-doc synthetic corpus (tools/dedup_scale.py's data), then
measure a 100k-doc shard ingest through the partition-pruned artifact
(`incremental_dedup_from_index`) vs the inline form that re-shingles
the whole base corpus (`incremental_minhash_dedup`). The gap between
those two numbers is the case for the standing artifact — at 100 TB
the inline form is a full-corpus job per shard, the artifact form is
shard-sized.

Usage: python tools/minhash_ingest_scale.py [--base-n 10000000]
       [--shard-n 100000] [--cpus 24] [--data-root /tmp/dedup_scale]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from query_refinement_dsit_databases_2021_spark.session import get_spark  # noqa: E402
from query_refinement_dsit_databases_2021_spark.operators import dedup  # noqa: E402
from tools.dedup_scale import synthesize  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-n", type=int, default=10_000_000)
    ap.add_argument("--shard-n", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--data-root", default="/tmp/dedup_scale")
    args = ap.parse_args()

    spark = get_spark(
        app_name="qr-minhash-ingest",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")

    base_path = os.path.join(
        args.data_root, f"n{args.base_n}", "documents.parquet"
    )
    if not os.path.isdir(base_path):
        synthesize(spark, args.base_n).write.mode("overwrite").parquet(
            base_path
        )
    base = spark.read.parquet(base_path)

    # shard: fresh doc ids above the base range, texts from the same
    # generator keyed at 0..shard_n — so every shard doc exactly
    # duplicates base doc (id − base_n): a worst-case 100%-dup shard,
    # which maximizes the verify-join work while staying shard-sized
    # (each shard doc matches ~1 partner, never a fan-out).
    shard_ids = synthesize(spark, args.shard_n).selectExpr(
        f"doc_id + {args.base_n} AS doc_id", "text", "lang", "source",
        "n_chars",
    )
    shard_path = os.path.join(
        args.data_root, f"shard{args.shard_n}", "documents.parquet"
    )
    if not os.path.isdir(shard_path):
        shard_ids.write.mode("overwrite").parquet(shard_path)
    shard = spark.read.parquet(shard_path)

    index_path = os.path.join(args.data_root, f"mh_index_n{args.base_n}")
    t0 = time.time()
    if not os.path.isdir(index_path):
        dedup.write_minhash_index(base, index_path)
    build_s = time.time() - t0
    print(f"index build (once): {build_s:.1f}s", flush=True)

    # force FULL evaluation: count() on the one-row-per-shard-doc
    # left join lets Catalyst eliminate the dedup work entirely
    # (unique-key outer-join elimination), so aggregate the VALUES
    from pyspark.sql import functions as F

    def checksum(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_dup").alias("dups"),
            F.sum("dup_of").alias("chk"),
        ).collect()[0]

    t0 = time.time()
    r_served = checksum(
        dedup.incremental_dedup_from_index(spark, index_path, shard)
    )
    served_s = time.time() - t0
    print(f"artifact-served shard ingest: {served_s:.1f}s "
          f"({r_served['n']} rows, {r_served['dups']} dups)", flush=True)

    t0 = time.time()
    r_inline = checksum(dedup.incremental_minhash_dedup(base, shard))
    inline_s = time.time() - t0
    print(f"inline (re-shingle base) ingest: {inline_s:.1f}s "
          f"({r_inline['n']} rows, {r_inline['dups']} dups)", flush=True)
    n_served, n_inline = tuple(r_served), tuple(r_inline)
    print(
        f"SUMMARY base={args.base_n} shard={args.shard_n} "
        f"build={build_s:.1f} served={served_s:.1f} inline={inline_s:.1f} "
        f"speedup={inline_s / served_s:.1f}x rows_match={n_served == n_inline}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
