#!/usr/bin/env python
"""Dedup data-bound-regime harness (r05 verdict item 3).

The committed SF-scaling table (BASELINE.md) shows the pipeline
operators still fixed-cost-dominated at sf0.1 (5k docs), so the 100 TB
argument for the dedup family rested on plan shape alone. This script
pushes `minhash_lsh_pairs` and `ngram_jaccard_pairs` into their
data-bound regime the same way the CP engine was (34.4 M-candidate
curve): synthesize a 1 M -> 10 M-doc corpus, run both operators, and
record the wall-clock curve plus the LSH band-bucket skew profile
(bucket-size distribution and the implied candidate-pair mass
sum C(n,2) — the quantity that decides whether the band equi-join
explodes).

Corpus: deterministic, JVM-side synthesis (no driver loop):
- each doc is 20-60 "words"; ~30 % of positions draw from a 32-word
  head vocabulary and the rest from a 65 536-word tail, so shingle
  document-frequency is realistically skewed (head 3-grams are
  stop-shingles that exercise `max_posting`; tail shingles are rare);
- ~5.9 % of docs (doc_id % 17 == 3) are near-duplicates of doc_id-3
  (same word sequence + one extra token -> shingle Jaccard ~0.9),
  giving a known dup population at every scale.

Usage::

    python tools/dedup_scale.py [--sizes 1000000,3000000,10000000]
        [--cpus 32] [--out dedup_scale.csv] [--data-root /tmp/dedup_scale]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from query_refinement_dsit_databases_2021_spark.session import get_spark  # noqa: E402
from query_refinement_dsit_databases_2021_spark.operators import dedup  # noqa: E402

HEAD_VOCAB = 32
TAIL_VOCAB = 65536
JACCARD_MAX_POSTING = 64  # mirrors pipelines.JACCARD_MAX_POSTING


def synthesize(spark, n_docs: int):
    """(doc_id, text, lang, source, n_chars) — same schema as the
    testdata documents table, entirely JVM-side column algebra."""
    base = spark.range(0, n_docs, 1, spark.sparkContext.defaultParallelism)
    content_id = F.when(
        (F.col("id") % 17 == 3) & (F.col("id") >= 3), F.col("id") - 3
    ).otherwise(F.col("id"))
    # pmod keeps the draw non-negative (xxhash64 % 41 can be negative)
    n_words = F.pmod(F.xxhash64(content_id, F.lit("len")), F.lit(41)) + 20
    pos_hash = lambda p: F.xxhash64(content_id * 1000003 + p)  # noqa: E731
    word = lambda p: F.concat(  # noqa: E731
        F.lit("w"),
        F.when(
            F.pmod(pos_hash(p), F.lit(100)) < 30,
            F.pmod(pos_hash(p), F.lit(HEAD_VOCAB)),
        )
        .otherwise(F.pmod(pos_hash(p), F.lit(TAIL_VOCAB)))
        .cast("string"),
    )
    ws = F.transform(
        F.sequence(F.lit(0), n_words.cast("int") - 1), lambda p: word(p)
    )
    text = F.concat_ws(" ", ws)
    # near-dups get one extra token so they are NEAR, not exact, dups
    text = F.when(
        (F.col("id") % 17 == 3) & (F.col("id") >= 3),
        F.concat(text, F.lit(" zz"), (F.col("id") % 7).cast("string")),
    ).otherwise(text)
    return base.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
        F.length(text).alias("n_chars"),
    )


def band_skew_profile(docs) -> dict:
    """Band-bucket skew for the LSH join: bucket-size distribution and
    the candidate-pair mass sum n*(n-1)/2 over (band, sig) buckets —
    computed as ONE aggregation over the bucket counts (the
    `ops_selfjoin_profile` methodology applied to the band keys)."""
    wide = dedup.minhash_signatures_wide(docs.select("doc_id", "text"))
    bsig = dedup.lsh_band_signatures(wide, dedup.LSH_ROWS, dedup.N_HASHES)
    counts = bsig.groupBy("band", "sig").agg(F.count("*").alias("n"))
    row = counts.agg(
        F.count("*").alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_bucket"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pair_mass"),
    ).collect()[0]
    return {
        "n_buckets": int(row["n_buckets"]),
        "max_bucket": int(row["max_bucket"]),
        "p99_bucket": int(row["p99_bucket"]),
        "pair_mass": int(row["pair_mass"]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,3000000,10000000")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="dedup_scale.csv")
    ap.add_argument("--data-root", default="/tmp/dedup_scale")
    ap.add_argument(
        "--skip-jaccard-above",
        type=int,
        default=0,
        help="skip the exact-jaccard op above this corpus size (0 = never)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark(
        app_name="qr-dedup-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_rows = []
    for n in sizes:
        path = os.path.join(args.data_root, f"n{n}", "documents.parquet")
        if not os.path.isdir(path):
            t0 = time.time()
            synthesize(spark, n).write.mode("overwrite").parquet(path)
            print(
                f"# synthesized n={n} in {time.time() - t0:.1f}s",
                file=sys.stderr,
            )
        docs = spark.read.parquet(path)

        skew = band_skew_profile(docs)

        t0 = time.time()
        n_mh = dedup.minhash_lsh_pairs(docs).count()
        t_mh = time.time() - t0
        spark.catalog.clearCache()

        t_j, n_j = None, None
        if not (args.skip_jaccard_above and n > args.skip_jaccard_above):
            t0 = time.time()
            n_j = dedup.ngram_jaccard_pairs(
                docs, max_posting=JACCARD_MAX_POSTING
            ).count()
            t_j = time.time() - t0
            spark.catalog.clearCache()

        row = {
            "n_docs": n,
            "minhash_pairs": n_mh,
            "minhash_s": round(t_mh, 1),
            "jaccard_pairs": n_j,
            "jaccard_s": round(t_j, 1) if t_j is not None else None,
            **skew,
        }
        out_rows.append(row)
        print(f"# {row}", file=sys.stderr)

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(out_rows[0].keys()))
        w.writeheader()
        w.writerows(out_rows)
    print(f"wrote {args.out} ({len(out_rows)} sizes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
