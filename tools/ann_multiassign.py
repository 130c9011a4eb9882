#!/usr/bin/env python
"""IVF multi-assignment trade measurement (r07 verdict item 4).

BASELINE.md's IVFADC-R diagnosis measured that multi-assignment a=2
would lift the nprobe=16 PROBE-SET recall 0.963 -> 0.988 but didn't
build it. For plain-IVF layout serving the probe set IS the recall
ceiling (probed cells are rescored EXACTLY), so a=2 converts directly
into served recall. This tool measures the full trade at one or more
SFs: for a in (1, 2) x nprobe in (12, 16):

  * served recall@5 vs the exact cosine top-5 (brute force);
  * build size: layout rows + bytes on disk (a=2 doubles rows; bytes
    grow slightly less - parquet compresses the duplicated vectors);
  * serve wall time (median of 3, layout prebuilt off the clock).

Appends rows to ann_multiassign.csv:
  sf_dir,n_vectors,a,nprobe,recall_at5,layout_rows,layout_bytes,
  serve_s_median

Usage: python tools/ann_multiassign.py [--sf-dirs ...] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402

from query_refinement_dsit_databases_2021_spark.session import get_spark  # noqa: E402
from query_refinement_dsit_databases_2021_spark.operators.simsearch import (  # noqa: E402
    N_QUERIES,
    TOP_K,
    _as_double,
    _fold_sum,
    ivf_topk_from_layout,
    write_ivf_layout,
)


def exact_top5(emb):
    v = _as_double(F.col("embedding"))
    vb = emb.select("vec_id", v.alias("v"))
    q = vb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cos = F.round(
        _fold_sum(F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y))
        / (
            F.sqrt(_fold_sum(F.transform(F.col("qv"), lambda x: x * x)))
            * F.sqrt(_fold_sum(F.transform(F.col("v"), lambda x: x * x)))
        ),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return {
        (r["q_id"], r["vec_id"])
        for r in F.broadcast(q)
        .crossJoin(vb)
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .collect()
    }


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "ann_multiassign.csv"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="ann_multiassign",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    header = not os.path.exists(args.out)
    out = open(args.out, "a")
    if header:
        out.write(
            "sf_dir,n_vectors,a,nprobe,recall_at5,layout_rows,"
            "layout_bytes,serve_s_median\n"
        )

    for sf_dir in args.sf_dirs.split(","):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n_vec = emb.count()
        exact = exact_top5(emb)
        queries = emb.where(F.col("vec_id") < N_QUERIES)
        for a in (1, 2):
            path = f"/tmp/ann_multiassign/ivf_a{a}_{os.path.basename(sf_dir)}"
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(f"{path}__centroids", ignore_errors=True)
            write_ivf_layout(emb, path, assignments=a)
            rows = spark.read.parquet(path).count()
            nbytes = du(path)
            for nprobe in (12, 16):
                served = None
                times = []
                for _ in range(args.reps):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    served = {
                        (r["q_id"], r["vec_id"])
                        for r in ivf_topk_from_layout(
                            spark, path, queries, nprobe=nprobe
                        ).collect()
                    }
                    times.append(time.time() - t0)
                recall = len(served & exact) / len(exact)
                line = (
                    f"{sf_dir},{n_vec},{a},{nprobe},{recall:.4f},"
                    f"{rows},{nbytes},{statistics.median(times):.3f}"
                )
                out.write(line + "\n")
                out.flush()
                print("RESULT " + line, flush=True)

    out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
