"""Unit tests for batch sessionization (operators/sessions.py) on
hand-checked event sequences; the differential oracle in
test_workloads_oracle.py covers the full events table.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from query_refinement_dsit_databases_2021_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s), u, v)
            for eid, s, u, v in rows
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_gap_splits_sessions(spark):
    # user 1: events at t=0, 10, 10000 with gap=100 -> sessions 1,1,2
    ev = _ev(spark, [(1, 0, 1, 1.0), (2, 10, 1, 1.0), (3, 10000, 1, 1.0)])
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev, gap_seconds=100).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_gap_is_strict(spark):
    # gap exactly equal to the threshold does NOT split
    ev = _ev(spark, [(1, 0, 1, 1.0), (2, 100, 1, 1.0), (3, 201, 1, 1.0)])
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev, gap_seconds=100).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}  # 100 keeps, 101 splits


def test_users_independent(spark):
    ev = _ev(spark, [(1, 0, 1, 1.0), (2, 0, 2, 1.0), (3, 500, 2, 1.0)])
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(ev, gap_seconds=100).collect()
    }
    assert got == {(1, 1): 1, (2, 2): 1, (2, 3): 2}


def test_tie_order_by_event_id(spark):
    # same timestamp: event_id orders the lag chain deterministically
    ev = _ev(spark, [(2, 0, 1, 1.0), (1, 0, 1, 1.0)])
    out = sessionize(ev, gap_seconds=100).collect()
    assert {r["session_id"] for r in out} == {1}


def test_session_stats_rollup(spark):
    ev = _ev(
        spark,
        [(1, 0, 1, 1.5), (2, 60, 1, 2.5), (3, 10000, 1, 4.0)],
    )
    rows = session_stats(ev, gap_seconds=100).collect()
    assert [
        (r["user_id"], r["session_id"], r["n_events"], r["duration_s"], r["total_value"])
        for r in rows
    ] == [(1, 1, 2, 60, 4.0), (1, 2, 1, 0, 4.0)]


def test_single_exchange_plan(spark):
    ev = _ev(spark, [(1, 0, 1, 1.0), (2, 10, 2, 1.0)])
    plan = session_stats(ev)._jdf.queryExecution().executedPlan().toString()
    # lag + running sum + per-session agg must share ONE hash
    # partitioning on user_id; orderBy adds the final range exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_batch_matches_streaming_session_window(spark):
    # the batch gap-split must agree with Spark's session_window
    # semantics (merge at diff <= gap, split at diff > gap), including
    # the boundary: events exactly `gap` apart share a session
    ev = _ev(
        spark,
        [
            (1, 0, 1, 1.0),
            (2, 100, 1, 1.0),     # == gap: merges
            (3, 201, 1, 1.0),     # > gap from 2: splits
            (4, 0, 2, 1.0),
            (5, 500, 2, 1.0),
        ],
    )
    gap = 100
    batch = (
        sessionize(ev, gap_seconds=gap)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )
    got_batch = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    )
    sw = (
        ev.groupBy(F.session_window("ts", f"{gap} seconds").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("user_id"), F.col("sw.start").alias("session_start"), "n_events")
    )
    got_sw = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in sw.collect()
    )
    assert got_batch == got_sw


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=2000), min_size=1, max_size=30
    ),
    gap=st.integers(min_value=1, max_value=500),
)
def test_sessionize_properties(spark, offsets, gap):
    # invariants for any event sequence and any gap:
    #  (1) sessions partition the events (no loss, no duplication)
    #  (2) within a session, consecutive gaps are all <= gap
    #  (3) across a session boundary, the gap is > gap
    ev = _ev(spark, [(i, s, 1, 1.0) for i, s in enumerate(sorted(set(offsets)))])
    rows = sorted(
        (r["ts"], r["session_id"])
        for r in sessionize(ev, gap_seconds=gap).collect()
    )
    assert len(rows) == len(set(offsets))  # (1)
    for (t_prev, s_prev), (t_cur, s_cur) in zip(rows, rows[1:]):
        d = (t_cur - t_prev).total_seconds()
        if s_cur == s_prev:
            assert d <= gap  # (2)
        else:
            assert s_cur == s_prev + 1
            assert d > gap  # (3)


def test_session_funnel_ordering_and_gaps(spark):
    from datetime import datetime, timedelta

    from query_refinement_dsit_databases_2021_spark.operators.sessions import (
        session_funnel,
    )

    base = datetime(2024, 3, 1, 12)
    s = timedelta(seconds=1)
    rows = [
        # u1: full ordered funnel in one session
        (1, base, 1, "view", 0.0, "{}"),
        (2, base + 10 * s, 1, "click", 0.0, "{}"),
        (3, base + 20 * s, 1, "purchase", 0.0, "{}"),
        # u2: click BEFORE the first view -> stage 2 not reached
        (4, base, 2, "click", 0.0, "{}"),
        (5, base + 10 * s, 2, "view", 0.0, "{}"),
        # u3: purchase before the qualifying click -> stage 3 not reached
        (6, base, 3, "view", 0.0, "{}"),
        (7, base + 5 * s, 3, "purchase", 0.0, "{}"),
        (8, base + 10 * s, 3, "click", 0.0, "{}"),
        # u4: two sessions (9h gap > the 8h default): view-only, then
        # view+click
        (9, base, 4, "view", 0.0, "{}"),
        (10, base + timedelta(hours=9), 4, "view", 0.0, "{}"),
        (11, base + timedelta(hours=9) + 5 * s, 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    r = session_funnel(df).collect()[0]
    assert (r["n_sessions"], r["reached_1"], r["reached_2"], r["reached_3"]) \
        == (5, 5, 3, 1)


def test_retention_cohorts_hand_case(spark):
    from datetime import datetime

    from query_refinement_dsit_databases_2021_spark.operators.sessions import (
        retention_cohorts,
    )

    # week boundaries are epoch-week (1970-01-01 was a Thursday); pick
    # timestamps far enough apart that week arithmetic is unambiguous
    def t(day):
        return datetime(2024, 1, day)

    rows = [
        # user 1: weeks w, w+1, w+2; user 2: w only; user 3: w+1, w+2
        (1, 1, t(4), "click", 0.0, ""),
        (2, 1, t(11), "click", 0.0, ""),
        (3, 1, t(18), "click", 0.0, ""),
        (4, 2, t(4), "click", 0.0, ""),
        (5, 3, t(11), "click", 0.0, ""),
        (6, 3, t(18), "click", 0.0, ""),
        (7, 3, t(18), "view", 0.0, ""),  # same week dup must not double-count
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    out = {
        (r["cohort_week"] - 2818, r["week_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention_ppm"],
        )
        for r in retention_cohorts(df).collect()
    }
    # cohort A (users 1, 2): offsets 0 (both), 1 (user 1), 2 (user 1)
    # cohort B (user 3): offsets 0, 1
    assert out == {
        (0, 0): (2, 2, 1000000),
        (0, 1): (1, 2, 500000),
        (0, 2): (1, 2, 500000),
        (1, 0): (1, 1, 1000000),
        (1, 1): (1, 1, 1000000),
    }
