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
    ]
