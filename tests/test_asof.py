"""Unit tests for the as-of join operator (operators/asof.py) on
hand-built frames: inclusive boundary match, per-group isolation,
left-outer nulls, tie-break, and forward direction. The differential
oracle (DuckDB ASOF JOIN) in test_workloads_oracle.py covers the
events-table workload."""

import pytest

from query_refinement_dsit_databases_2021_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 10),
            (2, "u1", 20),
            (3, "u1", 35),
            (4, "u2", 15),
            (5, "u2", 5),
        ],
        "id long, grp string, t long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, 100, 1.0),  # equal-ts boundary for left id=1
            ("u1", 25, 101, 2.0),
            ("u2", 12, 200, 3.0),
        ],
        "grp string, t long, rid long, val double",
    )
    return left, right


def _collect(df):
    return {r["id"]: (r["rid_matched"], r["val_matched"]) for r in df.collect()}


def test_backward_inclusive_and_outer(frames):
    left, right = frames
    got = _collect(
        asof_join(left, right, ts="t", by=["grp"], value_cols=["rid", "val"])
    )
    assert got == {
        1: (100, 1.0),  # boundary t=10 matches inclusively
        2: (100, 1.0),  # most recent <= 20 is t=10
        3: (101, 2.0),  # t=25 wins over t=10
        4: (200, 3.0),
        5: (None, None),  # no right row <= 5 -> left-outer null
    }


def test_forward_direction(frames):
    left, right = frames
    got = _collect(
        asof_join(
            left, right, ts="t", by=["grp"], value_cols=["rid", "val"],
            direction="forward",
        )
    )
    assert got == {
        1: (100, 1.0),  # inclusive at equal ts
        2: (101, 2.0),  # nearest >= 20 is t=25
        3: (None, None),  # nothing at-or-after 35
        4: (None, None),
        5: (200, 3.0),
    }


def test_tie_break_largest_wins(spark):
    left = spark.createDataFrame([(1, "g", 10)], "id long, grp string, t long")
    right = spark.createDataFrame(
        [("g", 10, 7), ("g", 10, 9), ("g", 10, 8)], "grp string, t long, rid long"
    )
    back = asof_join(left, right, ts="t", by=["grp"], value_cols=["rid"]).collect()
    fwd = asof_join(
        left, right, ts="t", by=["grp"], value_cols=["rid"], direction="forward"
    ).collect()
    assert back[0]["rid_matched"] == 9
    assert fwd[0]["rid_matched"] == 9


def test_bad_direction_rejected(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, ts="t", by=["grp"], value_cols=["rid"], direction="nearest")


def test_range_bucket_join_edges_and_plan(spark):
    from query_refinement_dsit_databases_2021_spark.operators.asof import (
        range_bucket_join,
    )

    pts = spark.createDataFrame(
        [
            (1, "u", 10),   # inside A
            (2, "u", 20),   # boundary: end of A (inclusive), start of B
            (3, "u", 45),   # inside B only
            (4, "u", 100),  # outside everything
            (5, "v", 10),   # right ts, wrong key
        ],
        "pid long, user string, ts long",
    )
    ivals = spark.createDataFrame(
        [("A", "u", 5, 20), ("B", "u", 20, 60)],
        "iid string, user string, start long, end long",
    )
    out = range_bucket_join(
        pts, ivals, by=["user"], ts="ts", bucket_width=7
    ).select("pid", "iid")
    got = sorted((r.pid, r.iid) for r in out.collect())
    # inclusive both ends; multi-bucket intervals (A spans buckets 0-2,
    # B spans 2-8 with width 7) produce each pair exactly ONCE
    assert got == [(1, "A"), (2, "A"), (2, "B"), (3, "B")]
    # the plan must be an EQUI-join (hash/sort-merge on key+bucket),
    # never the BroadcastNestedLoopJoin a raw range predicate yields
    plan = (
        range_bucket_join(pts, ivals, by=["user"], ts="ts", bucket_width=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
