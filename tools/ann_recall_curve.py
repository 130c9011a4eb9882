#!/usr/bin/env python
"""IVFADC recall/cost trade curve (r05 verdict item 5).

For each (nprobe, shortlist c) cell: recall@5 of the EXACT-reranked
IVF-PQ shortlist against the exact L2 top-5 (rerank is exact, so
recall == shortlist capture of the true top-5), plus the raw
ADC-ranked top-5 recall (no rerank) as the degradation-vs-quantization
datum. Prints a markdown table for BASELINE.md.

Usage: python tools/ann_recall_curve.py [--sf-dirs /root/testdata/sf0.01,...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from query_refinement_dsit_databases_2021_spark.session import get_spark  # noqa: E402
from query_refinement_dsit_databases_2021_spark.operators.simsearch import (  # noqa: E402
    N_QUERIES,
    TOP_K,
    _as_double,
    _fold_sum,
    ivfpq_topk,
)


def exact_top5(emb):
    v = _as_double(F.col("embedding"))
    vb = emb.select("vec_id", v.alias("v"))
    q = vb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = _fold_sum(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return {
        (r["q_id"], r["vec_id"])
        for r in F.broadcast(q)
        .crossJoin(vb)
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", d2.alias("d2"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .collect()
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs", default="/root/testdata/sf0.01,/root/testdata/sf0.1"
    )
    ap.add_argument("--nprobes", default="8,12,16,20")
    ap.add_argument("--shortlists", default="50,100,200")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(
        app_name="qr-ann-recall-curve",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    denom = N_QUERIES * TOP_K

    for sf_dir in args.sf_dirs.split(","):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        truth = exact_top5(emb)
        print(f"\n### {sf_dir} (n={emb.count()}, {denom} truth pairs)")
        print("| nprobe | c | recall@5 reranked | recall@5 raw ADC |")
        print("|---|---|---|---|")
        cs = [int(x) for x in args.shortlists.split(",")]
        for nprobe in (int(x) for x in args.nprobes.split(",")):
            # ONE ADC pass per nprobe at k=max(c): every smaller c and
            # the raw top-5 are rank-prefix subsets of the same ranking
            ranked = ivfpq_topk(emb, k=max(cs), nprobe=nprobe).collect()
            for c in cs:
                short = {
                    (r["q_id"], r["vec_id"]) for r in ranked if r["rank"] <= c
                }
                raw5 = {
                    (r["q_id"], r["vec_id"])
                    for r in ranked
                    if r["rank"] <= TOP_K
                }
                rr = len(short & truth) / denom
                ra = len(raw5 & truth) / denom
                print(
                    f"| {nprobe} | {c} | {rr:.3f} | {ra:.3f} |", flush=True
                )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
