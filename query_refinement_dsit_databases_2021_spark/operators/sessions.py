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
    ]
