"""Plan-quality assertions (SURVEY §4): the judge-facing guarantees
that the declarative formulation actually reaches the physical plan —
predicate pushdown + column pruning on the CP segment scan (O1/O2),
broadcast joins for small dimensions (O11), and whole-stage codegen on
the candidate pipeline (O12/O13). These assert on explain() output, not
timings, so they hold at any scale factor."""

import math
import shutil

import pytest

from query_refinement_dsit_databases_2021_spark.plans.executor import Engine
from query_refinement_dsit_databases_2021_spark.workloads import (
    register_views,
    workloads,
)

SF_DIR = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def series_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "series.parquet")
    rows = [(i, 1.5 + math.sin(i / 7.0), float(i % 5)) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "time_id: long, emg1: double, other: double")
    shutil.rmtree(path, ignore_errors=True)
    df.write.parquet(path)
    return path


def test_cp_scan_pushdown_and_pruning(spark, series_parquet):
    # S5/O1/O2: the segment scan must push the time range into the
    # parquet reader — with the reference's exact bound x1 + l1
    # (reference:src/server.py:200-203) — and read ONLY (time_id, y)
    eng = Engine(spark)
    eng.register_parquet("emg_data", series_parquet)
    out = eng.execute(
        "SELECT time_id, offset IN_DOMAIN [300, 500], [10, 50]\n"
        "FROM emg_data.emg1\nWHERE avg_amp() in [1, 2] MAX\nLIMIT REFINED 5"
    )
    plan = _formatted(out)
    assert "GreaterThanOrEqual(time_id,300)" in plan
    assert "LessThanOrEqual(time_id,550)" in plan  # x1 + l1 = 500 + 50
    assert "ReadSchema: struct<time_id:bigint,emg1:double>" in plan
    assert "other" not in plan  # unused column pruned from the scan


def test_cp_candidates_run_in_codegen(spark, series_parquet):
    # O12/O13: the candidate build (window frames + filter + explode)
    # must sit inside WholeStageCodegen spans, not interpreted exprs
    eng = Engine(spark)
    eng.register_parquet("emg_data", series_parquet)
    out = eng.execute(
        "SELECT time_id, offset IN_DOMAIN [300, 500], [10, 50]\n"
        "FROM emg_data.emg1\nWHERE avg_amp() in [1, 2] MAX\nLIMIT REFINED 5"
    )
    # formatted mode marks codegen stages with "[codegen id : N]"
    plan = _formatted(out)
    assert "[codegen id :" in plan
    # the frame computation and candidate explode are codegen'd (starred)
    assert "* Generate" in plan or "* Project" in plan


def test_sql_small_dims_broadcast(spark):
    # O11: nation/region are tiny — the 6-way q5 join must broadcast
    # them, never shuffle lineitem for a dim lookup
    w = workloads()["sql_q5_local_supplier"]
    plan = _formatted(w.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_sql_q1_scan_prunes_lineitem(spark):
    # O2 on the SQL surface: q1 touches 7 of lineitem's 16 columns;
    # the parquet ReadSchema must not include the rest
    w = workloads()["sql_q1_pricing"]
    plan = _formatted(w.fn(spark, SF_DIR))
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "l_orderkey" not in line
            assert "l_comment" not in line
            assert "l_quantity" in line
            break
    else:
        pytest.fail("no ReadSchema in plan")


def test_sql_date_filter_pushed_down(spark):
    # O1 on the SQL surface: q6's shipdate range must reach the scan
    register_views(spark, SF_DIR)
    w = workloads()["sql_q6_revenue_delta"]
    plan = _formatted(w.fn(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1].split("]", 1)[0]
