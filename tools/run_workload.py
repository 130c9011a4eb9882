"""Run any registered workload by name; optionally cross-check it
against its DuckDB oracle on the same parquet.

Usage:
    python tools/run_workload.py NAME [--sf-dir DIR] [--show N] [--check]
    python tools/run_workload.py --list
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("name", nargs="?", help="workload name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--show", type=int, default=20, help="rows to print")
    p.add_argument(
        "--check", action="store_true", help="diff against the DuckDB oracle"
    )
    p.add_argument("--list", action="store_true", help="list workload names")
    args = p.parse_args()

    from query_refinement_dsit_databases_2021_spark.workloads import (
        TABLES,
        workloads,
    )

    ws = workloads()
    if args.list or not args.name:
        for n, w in ws.items():
            print(f"{n}{'  [headline]' if w.headline else ''}")
        return 0
    if args.name not in ws:
        print(f"unknown workload {args.name!r}; --list shows all", file=sys.stderr)
        return 2

    from query_refinement_dsit_databases_2021_spark import get_spark

    spark = get_spark(app_name=f"workload:{args.name}")
    df = ws[args.name].fn(spark, args.sf_dir)
    df.show(args.show, truncate=False)
    n = df.count()
    print(f"{args.name}: {n} rows")

    if args.check:
        import duckdb

        oracle = ws[args.name].oracle
        if oracle is None:
            print("no SQL oracle for this workload (rows-only contract)")
            return 0
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{t}.parquet')"
            )

        def norm(v):
            return round(v, 9) if isinstance(v, float) else v

        s = sorted(tuple(norm(v) for v in r) for r in df.collect())
        o = sorted(tuple(norm(v) for v in r) for r in con.execute(oracle).fetchall())
        ok = s == o
        print(f"oracle check: {'MATCH' if ok else 'MISMATCH'} ({len(o)} oracle rows)")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
