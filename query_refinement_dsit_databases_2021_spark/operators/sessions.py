"""Batch sessionization of the event stream: gap-based session ids
and per-session rollups.

The streaming side already has native session windows
(``streaming/windows.py:sessionized_counts`` — Spark
``session_window`` with a watermark); this module is the BATCH
counterpart a training-data pipeline runs over historical logs. The
two legs intentionally share the gap-split semantics so a backfill
and the live stream produce the same session boundaries.

Spark-first plan shape: ONE shuffle (hash partition by ``user_id``),
then two window functions over the same partitioning — ``lag`` to
detect a gap, running ``sum`` of the gap flags to number sessions —
and the per-session ``groupBy`` reuses that partitioning, so AQE
collapses it into the same exchange. No joins, no Python.

Determinism contract: event times are compared in MICROSECONDS as
int64 (``unix_micros`` / DuckDB ``epoch_us``) — never float epoch
seconds — and the intra-user order is ``(ts, event_id)`` so ties
cannot reorder between engines. The per-session value sum is rounded
(doubles; addition order differs across engines) while counts and
durations are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_SECONDS = 8 * 3600  # default split gap: see TESTDATA.md event density
ROUND_DIGITS = 6


def sessionize(
    events: DataFrame, gap_seconds: int = GAP_SECONDS
) -> DataFrame:
    """Assign a per-user ``session_id`` (1-based, in time order): a new
    session starts when the gap to the previous event exceeds
    ``gap_seconds`` (strictly).

    Returns the input columns plus ``session_id``.
    """
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ-safe: session tz is UTC
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | (us - prev > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("_new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .drop("_new_session")
    )


def session_stats(
    events: DataFrame, gap_seconds: int = GAP_SECONDS
) -> DataFrame:
    """Per-session rollup: ``(user_id, session_id, n_events,
    duration_s, total_value)`` ordered by user and session.

    ``duration_s`` is the exact integer ``(last - first) div 1e6`` on
    microsecond epochs; ``total_value`` is the rounded double sum.
    """
    s = sessionize(events, gap_seconds)
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ-safe: session tz is UTC
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ((F.max(us) - F.min(us)) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_s"),
            F.round(F.sum("value"), ROUND_DIGITS).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Workload registry entry (DuckDB oracle)
# ---------------------------------------------------------------------------


def oracle_session_stats(gap_seconds: int = GAP_SECONDS) -> str:
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT user_id, event_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS BIGINT)
         AS duration_s,
       round(sum(value), {ROUND_DIGITS}) AS total_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id"""


FUNNEL_STAGES = ("view", "click", "purchase")


def session_funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = FUNNEL_STAGES,
    gap_seconds: int = GAP_SECONDS,
) -> DataFrame:
    """Ordered three-stage funnel over gap-sessions: a session
    "reaches" stage 2 only with a stage-2 event at-or-after its first
    stage-1 event, and stage 3 only at-or-after that stage-2 event —
    the product-analytics conversion query, exact on microsecond
    int64s.

    Plan shape: the sessionize window exchange (hash by user) is
    reused by three chained min-over-session windows (the stage-k
    anchor is a window result consumed by the stage-k+1 window — same
    partitioning, no new shuffle) and the final per-session groupBy.
    Returns ONE row: ``(n_sessions, reached_1, reached_2,
    reached_3)``.
    """
    s1, s2, s3 = stages
    s = sessionize(events, gap_seconds)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "session_id")
    df = s.withColumn(
        "v1", F.min(F.when(F.col("event_type") == s1, us)).over(w)
    )
    df = df.withColumn(
        "v2",
        F.min(
            F.when((F.col("event_type") == s2) & (us >= F.col("v1")), us)
        ).over(w),
    )
    df = df.withColumn(
        "v3",
        F.min(
            F.when((F.col("event_type") == s3) & (us >= F.col("v2")), us)
        ).over(w),
    )
    per_sess = df.groupBy("user_id", "session_id").agg(
        F.max("v1").alias("v1"), F.max("v2").alias("v2"), F.max("v3").alias("v3")
    )
    return per_sess.groupBy().agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("v1").isNotNull().cast("long")).alias("reached_1"),
        F.sum(F.col("v2").isNotNull().cast("long")).alias("reached_2"),
        F.sum(F.col("v3").isNotNull().cast("long")).alias("reached_3"),
    )


def oracle_session_funnel(
    stages: tuple[str, str, str] = FUNNEL_STAGES,
    gap_seconds: int = GAP_SECONDS,
) -> str:
    s1, s2, s3 = stages
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged),
w1 AS (
  SELECT *, min(CASE WHEN event_type = '{s1}' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id, session_id) AS v1
  FROM numbered),
w2 AS (
  SELECT *, min(CASE WHEN event_type = '{s2}' AND epoch_us(ts) >= v1
                     THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id, session_id) AS v2
  FROM w1),
w3 AS (
  SELECT *, min(CASE WHEN event_type = '{s3}' AND epoch_us(ts) >= v2
                     THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id, session_id) AS v3
  FROM w2),
per_sess AS (
  SELECT user_id, session_id, max(v1) AS v1, max(v2) AS v2, max(v3) AS v3
  FROM w3 GROUP BY user_id, session_id)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_1,
       CAST(sum(CASE WHEN v2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_2,
       CAST(sum(CASE WHEN v3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS reached_3
FROM per_sess"""


WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week
    (epoch-week, ``epoch_us DIV WEEK_US`` — an arbitrary but
    engine-identical boundary), then for each (cohort_week,
    week_offset) the count of cohort members active that week and the
    retention rate in ppm. The standard growth-analytics readout, and
    for a training platform the user-activity drift monitor.

    All-integer: weeks are int64 floor-divisions of epoch-µs, activity
    is a distinct (user, week) set so ``count(*)`` IS distinct users,
    and the rate is ``(1e6 * n) DIV size`` on positives (floor ==
    truncate on both engines).

    Plan: ONE distinct over (user, week) — map-combinable; cohort =
    min-week per user reuses the user partitioning; the offset groupBy
    is output-sized (weeks²/2 rows); cohort sizes broadcast back. At
    100 TB the distinct is the only corpus-scale shuffle and it
    partial-aggregates; everything downstream is triangle-sized.

    Returns ``(cohort_week, week_offset, n_active, cohort_size,
    retention_ppm)`` ordered by (cohort_week, week_offset).
    """
    wk = F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {WEEK_US}")
    uw = events.select(F.col("user_id"), wk.alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.expr("(1000000 * n_active) DIV cohort_size").alias(
                "retention_ppm"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


ORACLE_RETENTION = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM cohort GROUP BY cohort_week),
ret AS (
  SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM uw JOIN cohort c USING (user_id)
  GROUP BY c.cohort_week, uw.week - c.cohort_week)
SELECT ret.cohort_week, ret.week_offset, ret.n_active, s.cohort_size,
       CAST((1000000 * ret.n_active) // s.cohort_size AS BIGINT)
         AS retention_ppm
FROM ret JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_offset"""


def _wl_retention(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return retention_cohorts(spark.table("events"))


def _wl_funnel(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return session_funnel(spark.table("events"))


def _wl_sessionize(spark, sf_dir):
    from query_refinement_dsit_databases_2021_spark.workloads import register_views

    register_views(spark, sf_dir)
    return session_stats(spark.table("events"))


def sessions_workloads():
    from query_refinement_dsit_databases_2021_spark.workloads import Workload

    return [
        Workload(
            "ops_sessionize", _wl_sessionize, oracle_session_stats(), True
        ),
        Workload("ops_session_funnel", _wl_funnel, oracle_session_funnel()),
        Workload("ops_retention_cohorts", _wl_retention, ORACLE_RETENTION),
    ]
