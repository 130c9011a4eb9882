"""Differential check mimicking the driver's t2 gate: run every
workload on Spark AND its DuckDB oracle on the same parquet, compare
row sets (order-insensitive, 1e-9 tolerance on floats).

Runs at sf0.001 by default to stay fast; set QR_ORACLE_SF_DIR to
/root/testdata/sf0.01 for the full-size check."""

import math
import os

import duckdb
import pytest

from query_refinement_dsit_databases_2021_spark.workloads import TABLES, workloads

SF_DIR = os.environ.get("QR_ORACLE_SF_DIR", "/root/testdata/sf0.001")

WORKLOADS = workloads()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _rowset(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


def _approx_eq(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif str(va) != str(vb):
                return False
    return True


@pytest.mark.parametrize(
    "name", [n for n, w in WORKLOADS.items() if w.oracle is not None]
)
def test_workload_matches_duckdb(spark, duck, name):
    w = WORKLOADS[name]
    sdf = w.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    orows = [tuple(r) for r in duck.execute(w.oracle).fetchall()]
    assert sdf.columns == [d[0] for d in duck.execute(w.oracle).description], (
        "column names must match between Spark and oracle"
    )
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    assert _approx_eq(_rowset(srows), _rowset(orows)), name
